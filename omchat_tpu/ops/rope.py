"""Rotary position embeddings, including the reference's long-context scaling.

The reference's long-context mechanisms are linear RoPE scaling
(modeling_llama.py:156-172) and dynamic-NTK scaling (modeling_llama.py:175-198);
the fused-rotary CUDA kernel (modeling_llama.py:508-516) is replaced by a plain
jitted elementwise op — XLA fuses it into the surrounding attention computation
(SURVEY.md §2.2).

Convention: HF "rotate_half" layout (first/second half pairing), matching
Qwen2/Llama checkpoints.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from omchat_tpu.config import RopeScalingConfig


def rope_frequencies(
    head_dim: int,
    theta: float = 1_000_000.0,
    scaling: Optional[RopeScalingConfig] = None,
    seq_len: Optional[jax.Array] = None,
    max_position_embeddings: int = 32768,
) -> jax.Array:
    """Inverse frequencies [head_dim/2] (float32), with optional NTK rescaling.

    Dynamic-NTK recomputes theta when seq_len exceeds max_position_embeddings
    (reference: modeling_llama.py:184-196).  ``seq_len`` may be traced — the
    rescale is expressed in jnp so it works inside jit (it grows with the
    decode position, matching HF's cache-length-driven update).
    """
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    if scaling is not None and scaling.rope_type == "dynamic" and seq_len is not None:
        seq_len = jnp.asarray(seq_len, jnp.float32)
        rescale = (scaling.factor * seq_len / max_position_embeddings) - (scaling.factor - 1)
        theta_eff = jnp.where(
            seq_len > max_position_embeddings,
            theta * jnp.maximum(rescale, 1.0) ** (head_dim / (head_dim - 2)),
            theta,
        )
        return 1.0 / (theta_eff**exponent)
    return 1.0 / (theta**exponent)


def rope_cos_sin(
    positions: jax.Array,
    head_dim: int,
    theta: float = 1_000_000.0,
    scaling: Optional[RopeScalingConfig] = None,
    max_position_embeddings: int = 32768,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for integer ``positions`` [...,], each [..., head_dim].

    Linear scaling divides positions by the factor (modeling_llama.py:168-170).
    """
    # Dynamic-NTK trigger must be per sequence (last axis), not batch-global —
    # one long (or parked) row must not rescale other rows' frequencies.
    seq_len = jnp.max(positions, axis=-1, keepdims=True) + 1  # [..., 1], traced
    inv_freq = rope_frequencies(
        head_dim, theta, scaling, seq_len=seq_len[..., None], max_position_embeddings=max_position_embeddings
    )  # [..., 1, head_dim/2] when scaled, [head_dim/2] otherwise
    pos = positions.astype(jnp.float32)
    if scaling is not None and scaling.rope_type == "linear":
        pos = pos / scaling.factor
    freqs = pos[..., None] * inv_freq  # [..., S, head_dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Apply rotary embedding.  q/k: [B, S, H, D]; cos/sin: [B, S, D] or [S, D]."""
    if cos.ndim == q.ndim - 1:
        cos = cos[..., None, :]  # broadcast over heads
        sin = sin[..., None, :]
    cos = cos.astype(q.dtype)
    sin = sin.astype(q.dtype)
    q_out = q * cos + rotate_half(q) * sin
    k_out = k * cos + rotate_half(k) * sin
    return q_out, k_out
