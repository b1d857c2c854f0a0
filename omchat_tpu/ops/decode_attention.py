"""Pallas TPU flash-decode: one new token's GQA attention against the HBM KV cache.

TPU-native replacement for the reference's decode-step flash-attn call
(SURVEY.md §2.2 "Pallas flash-decode kernel against an HBM-resident ...
KV cache").  Shapes follow the head-major cache layout used by
:mod:`omchat_tpu.models.qwen2` — k/v: [B, KVH, T_max, D] — so each
(batch, kv-head) tile streams contiguously from HBM.

Design:
- grid (B, KVH, T/block_k), KV tiles innermost; per-(b,g) online softmax in
  VMEM scratch;
- all G = H/KVH query heads of a kv group ride one MXU matmul
  ([G_pad, D] @ [D, block_k]);
- per-batch cache lengths via scalar prefetch; tiles past the length are
  compute-skipped AND their index map clamps to the last valid tile, so no
  dead HBM traffic for the (bucketed-cache − actual-length) tail.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omchat_tpu.ops.flash_attention import DEFAULT_MASK_VALUE
from omchat_tpu.ops.online_softmax import (
    fold_self_column,
    normalize_output,
    online_update,
    qk_dot,
)


def _decode_kernel(
    lengths_ref,  # scalar prefetch: [B] int32 valid cache lengths
    q_ref,  # [G_pad, D]
    k_ref,  # [block_k, D]
    v_ref,  # [block_k, D]
    o_ref,  # [G_pad, D]
    m_scratch,  # [G_pad, 128] fp32
    l_scratch,  # [G_pad, 128] fp32
    acc_scratch,  # [G_pad, D] fp32
    *,
    sm_scale: float,
    block_k: int,
    num_kv_blocks: int,
):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    length = lengths_ref[b]

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    @pl.when(ki * block_k < length)
    def _run():
        g_pad = q_ref.shape[0]
        q = q_ref[...]
        k = k_ref[...].astype(q.dtype)  # cache may be fp8
        s = qk_dot(q, k) * sm_scale  # [G_pad, block_k]

        col_ids = jax.lax.broadcasted_iota(jnp.int32, (g_pad, block_k), 1) + ki * block_k
        s = jnp.where(col_ids < length, s, DEFAULT_MASK_VALUE)

        v = v_ref[...].astype(q_ref.dtype)
        m_scratch[...], l_scratch[...], acc_scratch[...] = online_update(
            s, v, m_scratch[...], l_scratch[...], acc_scratch[...]
        )

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        o_ref[...] = normalize_output(l_scratch[...], acc_scratch[...], o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _decode_kernel_stacked(lengths_ref, li_ref, q_ref, k_ref, v_ref,
                           k_new_ref, v_new_ref, o_ref,
                           m_scratch, l_scratch, acc_scratch, *,
                           sm_scale, block_k, num_kv_blocks):
    # li_ref is consumed by the kv index map only; the in-flight token's K/V
    # ride k_new_ref/v_new_ref (row 0 of [8, D]) and fold in at the last step
    _decode_kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref,
                   m_scratch, l_scratch, acc_scratch,
                   sm_scale=sm_scale, block_k=block_k, num_kv_blocks=num_kv_blocks)
    ki = pl.program_id(2)

    @pl.when(ki == num_kv_blocks - 1)
    def _self_and_renorm():
        # _decode_kernel's store already normalized o_ref by l; undo is messy,
        # so recompute the final output here from the scratches + self column
        _, l_next, acc = fold_self_column(
            q_ref[...], k_new_ref[...], v_new_ref[...], sm_scale,
            m_scratch[...], l_scratch[...], acc_scratch[...],
        )
        o_ref[...] = normalize_output(l_next, acc, o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def flash_decode_stacked(
    q: jax.Array,
    k_cache: jax.Array,  # [L, B, KVH, T, D] — the WHOLE per-layer cache stack
    v_cache: jax.Array,
    cache_len: jax.Array,  # [B] valid tokens ALREADY in the cache (excl. new)
    layer: jax.Array,  # scalar int32 layer index
    k_new: jax.Array,  # [B, KVH, D] the in-flight token's K/V (self-column)
    v_new: jax.Array,
    *,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention against one layer of a stacked READ-ONLY cache.

    Same contract as :func:`flash_decode` except (a) the cache keeps its
    leading layer axis and the layer is selected inside the kernel's index
    maps (scalar-prefetched) — the caller never materializes a per-layer
    slice — and (b) the in-flight token's K/V arrive as a self-column
    (``cache_len`` EXCLUDES it) instead of being read back from the cache.
    Together these keep the cache loop-invariant through the decode layer
    scan: scanning it as xs/ys re-materializes every layer's slice to stack
    the updated ys (~2 ms of a 13 ms single-stream step), and carrying a
    per-layer-mutated cache makes XLA copy it to feed the Pallas operand
    (measured 4x worse; dev/exp_decode_anatomy.py, round 4).

    T must be a multiple of 128 (the cache-bucket contract) — padding here
    would copy all L layers."""
    L, B, KVH, T, D = k_cache.shape
    H = q.shape[2]
    assert q.shape[1] == 1, "flash_decode handles a single query position"
    assert T % 128 == 0, "stacked decode requires 128-aligned cache buckets"
    group = H // KVH
    g_pad = max(8, _round_up(group, 8))
    block_k = min(block_k, T)
    while T % block_k:
        block_k //= 2
    num_kv_blocks = T // block_k

    qg = q[:, 0].reshape(B, KVH, group, D)
    if g_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))
    lengths = jnp.broadcast_to(jnp.asarray(cache_len, jnp.int32), (B,))
    li = jnp.asarray(layer, jnp.int32).reshape(1)
    kn = jnp.pad(k_new[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, 0)))
    vn = jnp.pad(v_new[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, 0)))

    def q_index(b, g, ki, lens, li_):
        return (b, g, 0, 0)

    def kv_index(b, g, ki, lens, li_):
        last = jnp.maximum(pl.cdiv(lens[b], block_k) - 1, 0)
        return (li_[0], b, g, jnp.minimum(ki, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KVH, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((None, None, g_pad, D), q_index),
            pl.BlockSpec((None, None, None, block_k, D), kv_index),
            pl.BlockSpec((None, None, None, block_k, D), kv_index),
            pl.BlockSpec((None, None, 8, D), q_index),
            pl.BlockSpec((None, None, 8, D), q_index),
        ],
        out_specs=pl.BlockSpec((None, None, g_pad, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel_stacked,
        sm_scale=D**-0.5,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, g_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, li, qg, k_cache, v_cache, kn, vn)
    return out[:, :, :group].reshape(B, 1, H, D)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def flash_decode(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_len: jax.Array,
    *,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention.  q: [B, 1, H, D]; k/v cache: [B, KVH, T, D];
    cache_len: [B] valid lengths.  Returns [B, 1, H, D]."""
    B, S, H, D = q.shape
    assert S == 1, "flash_decode handles a single query position"
    KVH, T = k_cache.shape[1], k_cache.shape[2]
    group = H // KVH
    g_pad = max(8, _round_up(group, 8))

    block_k = min(block_k, _round_up(T, 128))
    t_pad = _round_up(T, block_k)
    if t_pad != T:
        pad = ((0, 0), (0, 0), (0, t_pad - T), (0, 0))
        k_cache = jnp.pad(k_cache, pad)
        v_cache = jnp.pad(v_cache, pad)
    num_kv_blocks = t_pad // block_k

    # [B, 1, H, D] → [B, KVH, G_pad, D] (group-major heads, padded sublanes)
    qg = q[:, 0].reshape(B, KVH, group, D)
    if g_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))

    lengths = jnp.broadcast_to(jnp.asarray(cache_len, jnp.int32), (B,))

    def q_index(b, g, ki, lens):
        return (b, g, 0, 0)

    def kv_index(b, g, ki, lens):
        last = jnp.maximum(pl.cdiv(lens[b], block_k) - 1, 0)
        return (b, g, jnp.minimum(ki, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KVH, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((None, None, g_pad, D), q_index),
            pl.BlockSpec((None, None, block_k, D), kv_index),
            pl.BlockSpec((None, None, block_k, D), kv_index),
        ],
        out_specs=pl.BlockSpec((None, None, g_pad, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, D), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _decode_kernel,
        sm_scale=D**-0.5,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, g_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, qg, k_cache, v_cache)

    return out[:, :, :group].reshape(B, 1, H, D)
