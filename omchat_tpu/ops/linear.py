"""Linear layer helper with optional int8 weight-only quantization.

Serving feature the reference lacks (it relies on fp16 + ``device_map="auto"``
to fit 13B on GPUs, builder.py:22-28): per-output-channel int8 weights halve
HBM footprint and bandwidth; the int8→bf16 convert fuses into the matmul so
the MXU still runs its native bf16 path.  This is what lets the full 13B
flagship (ViT-6B + Qwen2-7B) serve on a single 16GB TPU chip.

A param dict is either
  {"kernel": [in, out], "bias"?}                          — dense
  {"kernel_q": int8 [in, out], "scale": [out], "bias"?}   — quantized
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dense(x: jax.Array, p: dict) -> jax.Array:
    """y = x @ W (+ bias), transparently dequantizing int8 weights."""
    if "kernel_q" in p:
        w = p["kernel_q"].astype(x.dtype)
        y = (x @ w) * p["scale"].astype(x.dtype)
    else:
        y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def quantize_linear(p: dict) -> dict:
    """Per-output-channel symmetric int8 quantization of a linear param dict.

    Stacked per-layer kernels [L, in, out] get per-(layer, out) scales [L, out]
    — the reduction is over the contraction (in) axis only."""
    if "kernel" not in p:
        return p
    w = p["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=-2) / 127.0  # [..., out]
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale[..., None, :]), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "scale": scale.astype(jnp.bfloat16)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_tree(params):
    """Quantize every linear param dict in a pytree (dicts holding 'kernel')."""
    if isinstance(params, dict):
        if "kernel" in params and getattr(params["kernel"], "ndim", 0) in (2, 3):
            return quantize_linear(params)
        return {k: quantize_tree(v) for k, v in params.items()}
    return params
