"""The online-softmax accumulation step shared by the decode/paged kernels.

One flash-attention bookkeeping implementation (m/l running statistics,
rescaled accumulator, self-column fold, final normalize) used from inside
every Pallas decode-path kernel — :mod:`omchat_tpu.ops.decode_attention`
(contiguous stacked cache) and :mod:`omchat_tpu.ops.paged_attention` (paged
pool, auto-pipelined and manual-DMA variants).  Pallas kernels share plain
Python helpers, so a fix to the fold lands in every kernel at once.

Shapes are rank-generic over the leading dims: the contiguous kernels run
2-D tiles ``[G, K]`` (one kv-head group per grid step), the paged kernels
3-D ``[KVH, G, K]`` (all heads per page fetch).  ``m``/``l`` carry a
lane-width (128) last axis with replicated values — the TPU-friendly scratch
layout — so reductions keep ``keepdims`` and consumers slice ``[..., :1]``.

The XLA oracle (:func:`omchat_tpu.ops.attention.self_column_reference`)
deliberately does NOT use these helpers: it is the independently-derived
reference the parity tests pin the kernels against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omchat_tpu.ops.flash_attention import DEFAULT_MASK_VALUE


def qk_dot(q: jax.Array, k: jax.Array) -> jax.Array:
    """fp32 scores: ``[G, D] @ [K, D] -> [G, K]`` or batched over a leading
    kv-head axis (``[KVH, G, D] x [KVH, K, D] -> [KVH, G, K]``)."""
    if q.ndim == 2:
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    return jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def _pv_dot(p: jax.Array, v: jax.Array) -> jax.Array:
    if p.ndim == 2:
        return jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def online_update(s, v, m_prev, l_prev, acc_prev):
    """Fold one masked fp32 score block ``s`` ([..., K]) and its values ``v``
    ([..., K, D]) into the running (m, l, acc); returns the updated triple.

    Callers assign the results back to their VMEM scratch refs (or, on the
    last block, hand l/acc to :func:`normalize_output`)."""
    m_next = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[..., :1])
    l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    acc_next = acc_prev * alpha[..., : acc_prev.shape[-1]] + _pv_dot(p, v)
    return m_next, l_next, acc_next


def fold_self_column(q, k_new, v_new, sm_scale, m, l, acc):
    """Fold the in-flight token's K/V in as one 8-wide score block (row 0
    valid, the rest masked) — the decode kernels' self-column: the token
    attends to itself without its row ever being written to the cache/pool
    before the dispatch (the commit happens after the layer scan)."""
    k = k_new.astype(q.dtype)
    sn = qk_dot(q, k) * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, sn.shape, sn.ndim - 1)
    sn = jnp.where(col == 0, sn, DEFAULT_MASK_VALUE)
    return online_update(sn, v_new.astype(q.dtype), m, l, acc)


def normalize_output(l, acc, dtype):
    """Final flash normalize: ``acc / l`` with the all-masked guard (a row
    that saw no valid column has l == 0 and must emit zeros, not NaN)."""
    l = l[..., :1]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    return (acc * l_inv).astype(dtype)
