"""Normalization ops.

RMSNorm matches the reference semantics exactly: statistics in float32, output
cast back to the input dtype (reference: modeling_intern_vit.py:33-44 InternRMSNorm,
HF Qwen2RMSNorm).  XLA fuses these into neighboring ops — the TPU-native
equivalent of the reference's apex/flash-attn FusedRMSNorm (SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm over the last axis; fp32 statistics, output in x.dtype."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (scale.astype(jnp.float32) * xf).astype(dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm over the last axis; fp32 statistics (InternViT-300M norm_type)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def apply_norm(x: jax.Array, params: dict, eps: float = 1e-6) -> jax.Array:
    """Dispatch on the param dict: {'scale'} → RMSNorm, {'scale','bias'} → LayerNorm."""
    if "bias" in params:
        return layer_norm(x, params["scale"], params["bias"], eps)
    return rms_norm(x, params["scale"], eps)
