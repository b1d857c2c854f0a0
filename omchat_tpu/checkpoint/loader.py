"""Checkpoint loading: safetensors → JAX param pytree.

Implements the weight-name contract of the reference's converter
(/root/reference/convert_omchat_to_hf.py:26-59) in both directions:

- HF-bundle layout: ``vision_tower.*``, ``multi_modal_projector.linear_N.*``,
  ``language_model.model.*``, ``language_model.lm_head.weight``
- repo-native layout: ``model.vision_tower.vision_tower.*``,
  ``model.mm_projector.{0,2}.*``, ``model.*``, ``lm_head.weight``

Torch linear weights are [out, in] and transposed to JAX's [in, out]; conv
patchify kernels go OIHW → HWIO; per-layer tensors are stacked on a leading
layer axis for ``lax.scan`` execution.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from omchat_tpu.config import OmChatConfig, TextConfig, VisionConfig


def _np(t) -> np.ndarray:
    """torch tensor / np array → np array (upcasting bf16 via float32)."""
    if isinstance(t, np.ndarray):
        return t
    t = t.detach().cpu()
    import torch

    if t.dtype == torch.bfloat16:
        t = t.float()
    return t.numpy()


def load_safetensors_dir(directory: str) -> Dict[str, np.ndarray]:
    """Read all ``*.safetensors`` in a directory into one flat dict
    (reference: convert_omchat_to_hf.py:38-46)."""
    from safetensors import safe_open

    out: Dict[str, np.ndarray] = {}
    paths = sorted(glob.glob(os.path.join(directory, "*.safetensors")))
    if not paths:
        raise FileNotFoundError(f"no .safetensors under {directory}")
    for path in paths:
        with safe_open(path, framework="np") as f:
            for key in f.keys():
                out[key] = f.get_tensor(key)
    return out


def normalize_key_layout(state: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Map repo-native key names onto the HF-bundle layout (the canonical one).

    Mirrors KEYS_TO_MODIFY_MAPPING (convert_omchat_to_hf.py:26-35)."""
    out = {}
    for key, val in state.items():
        if key.endswith(".inv_freq"):
            continue
        if key.startswith("model.vision_tower."):
            key = key[len("model.vision_tower.") :]
            # repo-native wraps InternVisionModel in a tower: vision_tower.vision_tower.*
        elif key.startswith("model.mm_projector."):
            rest = key[len("model.mm_projector.") :]
            m = re.match(r"^(\d+)\.(.*)$", rest)
            if m:
                idx = int(m.group(1))
                rest = f"linear_{idx // 2 + 1}.{m.group(2)}"
            else:
                rest = f"linear_1.{rest}"
            key = f"multi_modal_projector.{rest}"
        elif key.startswith("model."):
            key = "language_model." + key
        elif key.startswith("lm_head."):
            key = "language_model." + key
        out[key] = val
    return out


# ---------------------------------------------------------------------------
# Sub-tree converters (keys relative to each module root)
# ---------------------------------------------------------------------------


def convert_vision_tower(state: Dict[str, np.ndarray], cfg: VisionConfig, dtype=jnp.bfloat16) -> dict:
    """Keys like ``embeddings.class_embedding``, ``encoder.layers.N...`` → pytree."""
    g = lambda k: _np(state[k])
    l = cfg.num_hidden_layers

    def stack(fmt, transform=None):
        arrs = [g(fmt.format(i)) for i in range(l)]
        if transform:
            arrs = [transform(a) for a in arrs]
        return jnp.asarray(np.stack(arrs), dtype)

    T = lambda a: a.T
    params = {
        "class_embedding": jnp.asarray(g("embeddings.class_embedding").reshape(-1), dtype),
        "position_embedding": jnp.asarray(g("embeddings.position_embedding")[0], dtype),
        "patch_embedding": {
            "kernel": jnp.asarray(g("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0), dtype),
            "bias": jnp.asarray(g("embeddings.patch_embedding.bias"), dtype),
        },
        "layers": {
            "norm1": {"scale": stack("encoder.layers.{}.norm1.weight")},
            "norm2": {"scale": stack("encoder.layers.{}.norm2.weight")},
            "ls1": stack("encoder.layers.{}.ls1"),
            "ls2": stack("encoder.layers.{}.ls2"),
            "attn": {
                "qkv": {"kernel": stack("encoder.layers.{}.attn.qkv.weight", T)},
                "proj": {
                    "kernel": stack("encoder.layers.{}.attn.proj.weight", T),
                    "bias": stack("encoder.layers.{}.attn.proj.bias"),
                },
            },
            "mlp": {
                "fc1": {
                    "kernel": stack("encoder.layers.{}.mlp.fc1.weight", T),
                    "bias": stack("encoder.layers.{}.mlp.fc1.bias"),
                },
                "fc2": {
                    "kernel": stack("encoder.layers.{}.mlp.fc2.weight", T),
                    "bias": stack("encoder.layers.{}.mlp.fc2.bias"),
                },
            },
        },
    }
    if "encoder.layers.0.attn.qkv.bias" in state:
        params["layers"]["attn"]["qkv"]["bias"] = stack("encoder.layers.{}.attn.qkv.bias")
    if cfg.qk_normalization:
        params["layers"]["attn"]["q_norm"] = {"scale": stack("encoder.layers.{}.attn.q_norm.weight")}
        params["layers"]["attn"]["k_norm"] = {"scale": stack("encoder.layers.{}.attn.k_norm.weight")}
    if cfg.norm_type == "layer_norm":
        params["layers"]["norm1"]["bias"] = stack("encoder.layers.{}.norm1.bias")
        params["layers"]["norm2"]["bias"] = stack("encoder.layers.{}.norm2.bias")
    return params


def convert_qwen2(state: Dict[str, np.ndarray], cfg: TextConfig, dtype=jnp.bfloat16) -> dict:
    """Keys like ``model.embed_tokens.weight``, ``model.layers.N...``,
    ``lm_head.weight`` → pytree."""
    g = lambda k: _np(state[k])
    l = cfg.num_hidden_layers
    T = lambda a: a.T

    def stack(fmt, transform=None):
        arrs = [g(fmt.format(i)) for i in range(l)]
        if transform:
            arrs = [transform(a) for a in arrs]
        return jnp.asarray(np.stack(arrs), dtype)

    def proj(name, bias):
        p = {"kernel": stack("model.layers.{}." + name + ".weight", T)}
        if bias:
            p["bias"] = stack("model.layers.{}." + name + ".bias")
        return p

    params = {
        "embed_tokens": jnp.asarray(g("model.embed_tokens.weight"), dtype),
        "layers": {
            "input_layernorm": {"scale": stack("model.layers.{}.input_layernorm.weight")},
            "post_attention_layernorm": {"scale": stack("model.layers.{}.post_attention_layernorm.weight")},
            "self_attn": {
                "q_proj": proj("self_attn.q_proj", cfg.attention_bias),
                "k_proj": proj("self_attn.k_proj", cfg.attention_bias),
                "v_proj": proj("self_attn.v_proj", cfg.attention_bias),
                "o_proj": proj("self_attn.o_proj", False),
            },
            "mlp": None,  # filled below (dense SwiGLU or MoE)
        },
        "norm": {"scale": jnp.asarray(g("model.norm.weight"), dtype)},
    }
    if cfg.is_moe:
        from omchat_tpu.models.qwen2_moe import convert_hf_moe_layers

        params["layers"]["mlp"] = convert_hf_moe_layers(state, cfg, dtype)
    else:
        params["layers"]["mlp"] = {
            "gate_proj": proj("mlp.gate_proj", False),
            "up_proj": proj("mlp.up_proj", False),
            "down_proj": proj("mlp.down_proj", False),
        }
    if not cfg.tie_word_embeddings and "lm_head.weight" in state:
        params["lm_head"] = {"kernel": jnp.asarray(g("lm_head.weight").T, dtype)}
    return params


def convert_projector(state: Dict[str, np.ndarray], dtype=jnp.bfloat16) -> dict:
    """Keys like ``linear_1.weight`` → pytree."""
    params: dict = {}
    for key, val in state.items():
        m = re.match(r"^(linear_\d+)\.(weight|bias)$", key)
        if not m:
            continue
        name, kind = m.group(1), m.group(2)
        arr = _np(val)
        params.setdefault(name, {})["kernel" if kind == "weight" else "bias"] = jnp.asarray(
            arr.T if kind == "weight" else arr, dtype
        )
    return params


def _subdict(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix) :]: v for k, v in state.items() if k.startswith(prefix)}


def convert_omchat_state_dict(
    state: Dict[str, np.ndarray], cfg: OmChatConfig, dtype=jnp.bfloat16
) -> dict:
    """Full OmChat checkpoint (HF-bundle or repo-native key layout) → pytree
    with top-level {vision_tower, projector, language_model}."""
    if any(k.startswith("model.") for k in state):
        state = normalize_key_layout(state)
    # Repo-native wraps InternVisionModel one level deeper.
    vt_prefix = (
        "vision_tower.vision_tower." if any(k.startswith("vision_tower.vision_tower.") for k in state) else "vision_tower."
    )
    out = {
        "vision_tower": convert_vision_tower(_subdict(state, vt_prefix), cfg.vision, dtype),
        "projector": convert_projector(_subdict(state, "multi_modal_projector."), dtype),
        "language_model": convert_qwen2(_subdict(state, "language_model."), cfg.text, dtype),
    }
    # OmChat-v1 spatial_unpad newline embedding (omchat_llama.py:443-446):
    # repo-native key model.image_newline → language_model.model.image_newline
    # after normalization; HF-bundle exports write the bare key.
    for key in ("image_newline", "language_model.model.image_newline"):
        if key in state:
            out["image_newline"] = jnp.asarray(state[key], dtype)
            break
    return out


def load_mm_projector(path: str, dtype=jnp.bfloat16) -> dict:
    """Load a projector-only checkpoint (the ``pretrain_mm_mlp_adapter`` of
    LLaVA/OmChat stage-1; reference omchat_arch.py:238-247) → projector pytree.

    Accepts a directory (looks for ``mm_projector.safetensors`` then the
    reference's ``mm_projector.bin``) or a file.  Three key layouts load:

    - ``multi_modal_projector.linear_N.{weight,bias}`` (our save_mm_projector
      / the HF bundle),
    - ``model.mm_projector.I.{weight,bias}`` (the reference's HF-Trainer
      artifact — nn.Sequential indices, I//2+1 = linear_N),
    - dotted native ``projector.<path>`` keys (non-linear projector types).
    """
    if os.path.isdir(path):
        for name in ("mm_projector.safetensors", "mm_projector.bin"):
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no mm_projector.safetensors/.bin in {path}")
    if path.endswith(".bin"):
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        # the reference's get_w: keep keys containing 'mm_projector'
        state = {
            k.split("mm_projector.")[1]: _np(v)
            for k, v in raw.items()
            if "mm_projector" in k
        }
    else:
        from safetensors.numpy import load_file

        state = load_file(path)
        if any(k.startswith("projector.") for k in state):  # native dotted
            out: dict = {}
            for k, v in state.items():
                node, parts = out, k.split(".")[1:]
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = jnp.asarray(v, dtype)
            return out
        if any(k.startswith("multi_modal_projector.") for k in state):
            return convert_projector(_subdict(state, "multi_modal_projector."), dtype)
        state = {k.split("mm_projector.")[-1]: v for k, v in state.items()}
    # sequential-index keys: 0.weight → linear_1.weight, 2.bias → linear_2.bias
    remapped = {}
    for k, v in state.items():
        m = re.match(r"^(\d+)\.(weight|bias)$", k)
        if m:
            remapped[f"linear_{int(m.group(1)) // 2 + 1}.{m.group(2)}"] = v
    if not remapped:
        raise ValueError(f"unrecognized projector checkpoint key layout in {path}")
    return convert_projector(remapped, dtype)


def load_lora_adapter(directory: str, dtype=jnp.bfloat16) -> dict:
    """Read an adapter written by :func:`checkpoint.save.save_lora_adapter`
    back into the training/lora.py tree layout."""
    import json

    from safetensors.numpy import load_file

    with open(os.path.join(directory, "adapter_config.json")) as f:
        meta = json.load(f)
    if meta.get("format") != "omchat-tpu-lora":
        raise ValueError(f"not an omchat-tpu LoRA adapter: {directory}")
    flat = load_file(os.path.join(directory, "adapter_model.safetensors"))
    layers: dict = {}
    for key, arr in flat.items():
        prefix, group, name, leaf = key.split(".")
        assert prefix == "layers" and leaf in ("a", "b"), key
        layers.setdefault(group, {}).setdefault(name, {})[leaf] = jnp.asarray(arr, dtype)
    return {"layers": layers, "scale": float(meta["scale"])}


def load_omchat_checkpoint(
    model_path: str, dtype=jnp.bfloat16, config: Optional[OmChatConfig] = None
):
    """Load config + weights from a checkpoint directory → (cfg, params).

    The delay-load analogue (SURVEY.md §3.5): use ``OmChatConfig.from_json``
    alone when only shapes are needed (pairs with ``jax.eval_shape``)."""
    if config is None:
        config = OmChatConfig.from_json(os.path.join(model_path, "config.json"))
    state = load_safetensors_dir(model_path)
    params = convert_omchat_state_dict(state, config, dtype)
    return config, params
