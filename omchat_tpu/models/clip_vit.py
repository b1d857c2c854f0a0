"""CLIP and SigLIP vision towers — the reference's fallback encoder dispatch
(/root/reference/omchat/model/multimodal_encoder/builder.py:11-16 routes
non-InternViT names to CLIPVisionTower; siglip_encoder.py exists unreached).

Functional JAX re-implementations of HF ``CLIPVisionModel`` /
``SiglipVisionModel`` transformer trunks:

- CLIP: CLS + learned position embeddings, pre-LayerNorm blocks, quick-GELU,
  ``pre_layrnorm`` before the encoder (HF's spelling), post-LN unused for
  feature extraction (feature_select picks hidden_states[k]).
- SigLIP: no CLS token, exact-GELU(tanh) MLP, post-LN applied to the last
  hidden state; the attention-pooling head is not needed for feature use.

Both run the same stacked-scan execution and the same Pallas/XLA attention
dispatch as InternViT.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from omchat_tpu.ops.attention import attention
from omchat_tpu.ops.linear import dense
from omchat_tpu.ops.norms import layer_norm


@dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"  # siglip: "gelu_pytorch_tanh"
    use_class_token: bool = True  # siglip: False
    post_layernorm: bool = False  # siglip applies final LN to hidden states
    # CLIP-SMoE (legacy v1 clip_smoe knob, omchat_llama.py:62-63,104-111):
    # each layer's MLP becomes a top-k routed bank of num_experts MLPs
    clip_smoe: bool = False
    num_experts: int = 4
    num_selected: int = 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def siglip_so400m() -> "ClipVisionConfig":
        return ClipVisionConfig(
            hidden_size=1152,
            intermediate_size=4304,
            num_hidden_layers=27,
            num_attention_heads=16,
            image_size=384,
            patch_size=14,
            layer_norm_eps=1e-6,
            hidden_act="gelu_pytorch_tanh",
            use_class_token=False,
            post_layernorm=True,
        )


def _act(x: jax.Array, name: str) -> jax.Array:
    if name == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu_pytorch_tanh", "gelu_new"):
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _layer(cfg: ClipVisionConfig, x: jax.Array, p: dict, attn_impl: Optional[str]) -> jax.Array:
    b, n, d = x.shape
    h, hd = cfg.num_attention_heads, cfg.head_dim

    y = layer_norm(x, p["layer_norm1"]["scale"], p["layer_norm1"]["bias"], cfg.layer_norm_eps)
    q = dense(y, p["attn"]["q_proj"]).reshape(b, n, h, hd)
    k = dense(y, p["attn"]["k_proj"]).reshape(b, n, h, hd)
    v = dense(y, p["attn"]["v_proj"]).reshape(b, n, h, hd)
    # HF CLIP scales q by head_dim^-0.5 before QK^T; attention() applies the
    # same scale internally, so plain dispatch matches.
    o = attention(q, k, v, causal=False, impl=attn_impl).reshape(b, n, d)
    x = x + dense(o, p["attn"]["out_proj"])

    y = layer_norm(x, p["layer_norm2"]["scale"], p["layer_norm2"]["bias"], cfg.layer_norm_eps)
    if cfg.clip_smoe:
        from omchat_tpu.models.smoe import expert_bank, smoe_route

        combine, _ = smoe_route(p["router"], y, cfg.num_selected)
        x = x + expert_bank(
            p["experts"], y, combine,
            lambda ep, xx: dense(_act(dense(xx, ep["fc1"]), cfg.hidden_act), ep["fc2"]),
        )
    else:
        y = _act(dense(y, p["mlp"]["fc1"]), cfg.hidden_act)
        x = x + dense(y, p["mlp"]["fc2"])
    return x


def clip_vit_forward(
    params: dict,
    cfg: ClipVisionConfig,
    pixel_values: jax.Array,
    *,
    feature_layer: int = -2,
    attn_impl: Optional[str] = None,
) -> jax.Array:
    """[B, 3, H, W] → hidden states after layer ``feature_layer`` (HF
    hidden_states indexing: -1 = last layer output, like InternViT)."""
    x = jnp.transpose(pixel_values, (0, 2, 3, 1))
    kernel = params["patch_embedding"]["kernel"]
    x = jax.lax.conv_general_dilated(
        x.astype(kernel.dtype),
        kernel,
        (cfg.patch_size, cfg.patch_size),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params["patch_embedding"]:
        x = x + params["patch_embedding"]["bias"]
    b, gh, gw, d = x.shape
    x = x.reshape(b, gh * gw, d)
    if cfg.use_class_token:
        cls = jnp.broadcast_to(params["class_embedding"].astype(x.dtype), (b, 1, d))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][None].astype(x.dtype)

    if "pre_layernorm" in params:
        x = layer_norm(
            x, params["pre_layernorm"]["scale"], params["pre_layernorm"]["bias"], cfg.layer_norm_eps
        )

    num_layers = cfg.num_hidden_layers
    n_run = num_layers + 1 + feature_layer if feature_layer < 0 else feature_layer
    n_run = max(0, min(num_layers, n_run))
    layers = params["layers"]
    if n_run < num_layers:
        layers = jax.tree.map(lambda a: a[:n_run], layers)

    def body(carry, layer):
        return _layer(cfg, carry, layer, attn_impl), None

    x, _ = jax.lax.scan(body, x, layers)

    if cfg.post_layernorm and n_run == num_layers and "post_layernorm" in params:
        x = layer_norm(
            x, params["post_layernorm"]["scale"], params["post_layernorm"]["bias"], cfg.layer_norm_eps
        )
    return x


def convert_hf_clip_vision(state: dict, cfg: ClipVisionConfig, dtype=jnp.bfloat16, prefix: str = "vision_model.") -> dict:
    """HF CLIPVisionModel / SiglipVisionModel state dict → pytree."""
    import numpy as np

    from omchat_tpu.checkpoint.loader import _np

    g = lambda k: _np(state[prefix + k])
    l = cfg.num_hidden_layers
    T = lambda a: a.T

    def stack(fmt, transform=None):
        arrs = [g(fmt.format(i)) for i in range(l)]
        if transform:
            arrs = [transform(a) for a in arrs]
        return jnp.asarray(np.stack(arrs), dtype)

    def proj(name):
        return {
            "kernel": stack("encoder.layers.{}." + name + ".weight", T),
            "bias": stack("encoder.layers.{}." + name + ".bias"),
        }

    params = {
        "patch_embedding": {
            "kernel": jnp.asarray(g("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0), dtype)
        },
        "position_embedding": jnp.asarray(g("embeddings.position_embedding.weight"), dtype),
        "layers": {
            "layer_norm1": {
                "scale": stack("encoder.layers.{}.layer_norm1.weight"),
                "bias": stack("encoder.layers.{}.layer_norm1.bias"),
            },
            "layer_norm2": {
                "scale": stack("encoder.layers.{}.layer_norm2.weight"),
                "bias": stack("encoder.layers.{}.layer_norm2.bias"),
            },
            "attn": {
                "q_proj": proj("self_attn.q_proj"),
                "k_proj": proj("self_attn.k_proj"),
                "v_proj": proj("self_attn.v_proj"),
                "out_proj": proj("self_attn.out_proj"),
            },
            "mlp": {"fc1": proj("mlp.fc1"), "fc2": proj("mlp.fc2")},
        },
    }
    if prefix + "embeddings.patch_embedding.bias" in state:
        params["patch_embedding"]["bias"] = jnp.asarray(g("embeddings.patch_embedding.bias"), dtype)
    if cfg.use_class_token:
        params["class_embedding"] = jnp.asarray(g("embeddings.class_embedding").reshape(-1), dtype)
    if cfg.clip_smoe:
        # CLIP-SMoE expert keys (the reference rewrites
        # ``...layers.{i}.experts.{e}.fc*`` from the dense ``mlp.fc*``,
        # omchat_llama.py:104-111).  Missing experts replicate the dense MLP
        # (the reference's init); a missing router starts uniform (zeros).
        e_n, d = cfg.num_experts, cfg.hidden_size

        def expert_proj(name):
            def one(i, e):
                k = f"encoder.layers.{i}.experts.{e}.{name}.weight"
                if prefix + k in state:
                    return _np(state[prefix + k]).T, _np(
                        state[prefix + f"encoder.layers.{i}.experts.{e}.{name}.bias"]
                    )
                return (
                    g(f"encoder.layers.{i}.mlp.{name}.weight").T,
                    g(f"encoder.layers.{i}.mlp.{name}.bias"),
                )

            ws, bs = zip(*[tuple(zip(*[one(i, e) for e in range(e_n)])) for i in range(l)])
            return {
                "kernel": jnp.asarray(np.stack([np.stack(w) for w in ws]), dtype),
                "bias": jnp.asarray(np.stack([np.stack(b) for b in bs]), dtype),
            }

        params["layers"]["experts"] = {"fc1": expert_proj("fc1"), "fc2": expert_proj("fc2")}
        rk = prefix + "encoder.layers.0.router.weight"
        if rk in state:
            params["layers"]["router"] = {
                "kernel": stack("encoder.layers.{}.router.weight", T),
                "bias": stack("encoder.layers.{}.router.bias"),
            }
        else:
            params["layers"]["router"] = {
                "kernel": jnp.zeros((l, d, e_n), dtype),
                "bias": jnp.zeros((l, e_n), dtype),
            }
        del params["layers"]["mlp"]
    if prefix + "pre_layrnorm.weight" in state:  # HF CLIP's spelling
        params["pre_layernorm"] = {
            "scale": jnp.asarray(g("pre_layrnorm.weight"), dtype),
            "bias": jnp.asarray(g("pre_layrnorm.bias"), dtype),
        }
    if prefix + "post_layernorm.weight" in state:
        params["post_layernorm"] = {
            "scale": jnp.asarray(g("post_layernorm.weight"), dtype),
            "bias": jnp.asarray(g("post_layernorm.bias"), dtype),
        }
    return params
