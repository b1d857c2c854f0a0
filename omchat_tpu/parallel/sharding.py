"""Parameter / cache partition specs — Megatron-style TP over the ``model`` axis.

This is the north-star requirement from SURVEY.md §2.3: first-class tensor
parallelism for the ViT + Qwen2 stack via pjit ``NamedSharding`` (the reference
only has vestigial TP: a vocab-parallel fused CE and HF ``pretraining_tp``
emulation).  Column-parallel: qkv / gate / up / fc1 (shard the output dim);
row-parallel: o_proj / down / fc2 (shard the input dim; GSPMD inserts the
psum).  The lm_head is vocab-sharded; the KV cache shards over kv heads.

``fsdp=True`` additionally shards the non-TP dimension of large kernels over
the ``data`` axis (ZeRO-3-style fully-sharded parameters — the TPU-native
equivalent of the reference's deepspeed hooks, SURVEY.md §2.2).

Specs are pytrees mirroring the param trees produced by
:mod:`omchat_tpu.checkpoint.loader` / the models' ``init_params``.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from omchat_tpu.config import OmChatConfig, TextConfig, VisionConfig


def _maybe(axis: Optional[str], cond: bool):
    return axis if cond else None


def qwen2_param_specs(cfg: TextConfig, *, fsdp: bool = False) -> dict:
    """Partition specs matching the qwen2 param pytree."""
    d_axis = "data" if fsdp else None
    specs = {
        "embed_tokens": P("model", None),
        "layers": {
            "input_layernorm": {"scale": P()},
            "post_attention_layernorm": {"scale": P()},
            "self_attn": {
                "q_proj": {"kernel": P(None, d_axis, "model")},
                "k_proj": {"kernel": P(None, d_axis, "model")},
                "v_proj": {"kernel": P(None, d_axis, "model")},
                "o_proj": {"kernel": P(None, "model", d_axis)},
            },
            "mlp": {
                "gate_proj": {"kernel": P(None, d_axis, "model")},
                "up_proj": {"kernel": P(None, d_axis, "model")},
                "down_proj": {"kernel": P(None, "model", d_axis)},
            },
        },
        "norm": {"scale": P()},
    }
    if cfg.is_moe:
        # Expert parallelism: the expert axis shards over `model` (SURVEY.md
        # §2.3 EP); router + shared expert replicate/column-split.  GSPMD
        # inserts the psum combining per-device expert outputs.
        specs["layers"]["mlp"] = {
            "gate": {"kernel": P()},
            "experts": {
                "gate_proj": P(None, "model", None, None),
                "up_proj": P(None, "model", None, None),
                "down_proj": P(None, "model", None, None),
            },
            "shared_expert": {
                "gate_proj": {"kernel": P(None, d_axis, "model")},
                "up_proj": {"kernel": P(None, d_axis, "model")},
                "down_proj": {"kernel": P(None, "model", d_axis)},
            },
            "shared_expert_gate": {"kernel": P()},
        }
    if cfg.attention_bias:
        for name in ("q_proj", "k_proj", "v_proj"):
            specs["layers"]["self_attn"][name]["bias"] = P(None, "model")
    if not cfg.tie_word_embeddings:
        specs["lm_head"] = {"kernel": P(None, "model")}
    return specs


def vision_param_specs(cfg: VisionConfig, *, fsdp: bool = False) -> dict:
    """Partition specs for the InternViT param pytree.

    Note: InternViT-6B has 25 heads; GSPMD pads non-divisible shard dims, so
    the qkv column split stays correct for any tp (at a small padding cost).
    """
    d_axis = "data" if fsdp else None
    specs = {
        "class_embedding": P(),
        "position_embedding": P(),
        "patch_embedding": {"kernel": P(), "bias": P()},
        "layers": {
            "norm1": {"scale": P()},
            "norm2": {"scale": P()},
            "ls1": P(),
            "ls2": P(),
            "attn": {
                "qkv": {"kernel": P(None, d_axis, "model")},
                "proj": {"kernel": P(None, "model", d_axis), "bias": P()},
            },
            "mlp": {
                "fc1": {"kernel": P(None, d_axis, "model"), "bias": P(None, "model")},
                "fc2": {"kernel": P(None, "model", d_axis), "bias": P()},
            },
        },
    }
    if cfg.qkv_bias:
        specs["layers"]["attn"]["qkv"]["bias"] = P(None, "model")
    if cfg.qk_normalization:
        specs["layers"]["attn"]["q_norm"] = {"scale": P()}
        specs["layers"]["attn"]["k_norm"] = {"scale": P()}
    if cfg.norm_type == "layer_norm":
        specs["layers"]["norm1"]["bias"] = P()
        specs["layers"]["norm2"]["bias"] = P()
    return specs


def projector_specs(params: dict) -> dict:
    """mlpNx_gelu / linear projector: first linear column-parallel, the rest
    row-parallel into replicated output.  The smoe expert bank (stacked
    [E, in, out], models/smoe.py) shards the same way along its trailing
    matmul dims with the router replicated; any other projector structure
    (cabstract convs) replicates — correct, if not bandwidth-optimal."""
    out = {}
    names = sorted(k for k in params if k.startswith("linear_"))
    for i, name in enumerate(names):
        if i == 0 and len(names) > 1:
            out[name] = {"kernel": P(None, "model"), "bias": P("model")}
        elif i == 0:
            out[name] = {"kernel": P(), "bias": P()}
        else:
            out[name] = {"kernel": P("model", None), "bias": P()}
    if "experts" in params:
        enames = sorted(params["experts"])
        eout = {}
        for i, name in enumerate(enames):
            if i == 0 and len(enames) > 1:
                eout[name] = {"kernel": P(None, None, "model"), "bias": P(None, "model")}
            elif i == 0:
                eout[name] = {"kernel": P(), "bias": P()}
            else:
                eout[name] = {"kernel": P(None, "model", None), "bias": P()}
        out["experts"] = eout
    for k in params:
        if k not in out:
            out[k] = jax.tree.map(lambda _: P(), params[k])
    return out


def specs_without_axis(specs, axis: str):
    """Replace references to ``axis`` with None (replicate) in a spec tree —
    e.g. reuse the Megatron TP specs on a (data, context) CP mesh, where the
    ``model`` axis does not exist."""

    def fix(spec):
        if not isinstance(spec, P):
            return spec
        return P(*[
            None
            if a == axis
            else (tuple(x for x in a if x != axis) if isinstance(a, tuple) else a)
            for a in spec
        ])

    return jax.tree.map(fix, specs, is_leaf=lambda x: isinstance(x, P))


def omchat_param_specs(cfg: OmChatConfig, params: dict, *, fsdp: bool = False) -> dict:
    specs = {
        "vision_tower": vision_param_specs(cfg.vision, fsdp=fsdp),
        "projector": projector_specs(params.get("projector", {})),
        "language_model": qwen2_param_specs(cfg.text, fsdp=fsdp),
    }
    if "image_newline" in params:  # v1 spatial_unpad newline (replicated)
        specs["image_newline"] = P()
    return specs


def kv_cache_specs(cfg: TextConfig, mesh: Mesh, batch: Optional[int] = None):
    """Cache [L, B, KVH, T, D]: batch over data, kv heads over model — each
    axis only when it divides evenly (otherwise that axis replicates; e.g.
    Qwen2-7B's 4 kv heads replicate at tp=8, at 2× cache HBM per chip)."""
    from omchat_tpu.models.qwen2 import KVCache

    tp = mesh.shape["model"]
    dp = mesh.shape["data"]
    head_axis = "model" if cfg.num_key_value_heads % tp == 0 else None
    batch_axis = "data" if (batch is None or batch % dp == 0) else None
    spec = P(None, batch_axis, head_axis, None, None)
    return KVCache(k=spec, v=spec)


def adapt_specs_to_quantized(specs, params):
    """Rewrite a spec tree for an int8-quantized param tree.

    ``quantize_tree`` replaces {"kernel"} leaves with {"kernel_q", "scale"}:
    kernel_q keeps the kernel's spec; the per-output-channel scale drops the
    contraction (second-to-last) axis of the kernel spec."""
    if isinstance(specs, dict) and isinstance(params, dict):
        if "kernel" in specs and "kernel_q" in params:
            kspec = specs["kernel"]
            out = dict(specs)
            out.pop("kernel")
            out["kernel_q"] = kspec
            out["scale"] = P(*(kspec[:-2] + kspec[-1:])) if len(kspec) >= 2 else P()
            if "bias" in out and "bias" not in params:
                out.pop("bias")
            return out
        return {k: adapt_specs_to_quantized(v, params.get(k, {})) for k, v in specs.items()}
    return specs


def shard_params(params: dict, mesh: Mesh, specs: dict) -> dict:
    """Place a param pytree onto the mesh per the spec pytree."""
    specs = adapt_specs_to_quantized(specs, params)
    # Traverse the spec tree (PartitionSpec is a tuple subclass, so it must be
    # the first tree with an is_leaf guard, or tree.map would descend into it).
    return jax.tree.map(
        lambda s, p: jax.device_put(p, NamedSharding(mesh, s)),
        specs,
        params,
        is_leaf=lambda x: isinstance(x, P),
    )
