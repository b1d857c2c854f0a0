"""Paged flash-decode: GQA decode attention over a paged KV pool.

Virtual memory for KV caches (guide: ragged paged attention): physical pages
``[KVH, num_pages, page_size, D]`` shared by all requests; each request maps
logical blocks to pages via a page table.  Unlike the contiguous-slot cache
(models/qwen2.KVCache), memory is allocated per page as sequences grow, so
many variable-length requests share the pool without per-slot max-length
reservations.

Kernel design: same online-softmax decode loop as
:mod:`omchat_tpu.ops.decode_attention`, but the KV BlockSpec index map reads
the page table (scalar-prefetched) — the auto-pipeline's DMA engine gathers
non-contiguous pages while compute proceeds, with out-of-range blocks clamped
to the last valid page (no dead HBM traffic).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omchat_tpu.ops.flash_attention import DEFAULT_MASK_VALUE


def _paged_decode_kernel(
    lengths_ref,  # [B] int32 valid lengths
    tables_ref,  # [B, max_pages] int32 page tables
    q_ref,  # [G_pad, D]
    k_pages_ref,  # [page_size, D] (gathered page)
    v_pages_ref,  # [page_size, D]
    o_ref,  # [G_pad, D]
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    sm_scale: float,
    page_size: int,
    num_blocks: int,
):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    length = lengths_ref[b]

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    @pl.when(ki * page_size < length)
    def _run():
        g_pad = q_ref.shape[0]
        q = q_ref[...]
        k = k_pages_ref[...].astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * sm_scale
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (g_pad, page_size), 1) + ki * page_size
        s = jnp.where(col_ids < length, s, DEFAULT_MASK_VALUE)

        m_prev, l_prev = m_scratch[...], l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scratch[...] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next
        v = v_pages_ref[...].astype(q.dtype)
        acc_scratch[...] = acc_scratch[...] * alpha[:, : acc_scratch.shape[1]] + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == num_blocks - 1)
    def _store():
        l = l_scratch[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[...] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_flash_decode(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_tables: jax.Array,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention over paged KV.

    q: [B, 1, H, D]; k/v_pages: [KVH, P, page_size, D]; lengths: [B];
    page_tables: [B, max_pages] physical page per logical block.
    Returns [B, 1, H, D].
    """
    B, S, H, D = q.shape
    assert S == 1
    KVH, _, page_size, _ = k_pages.shape
    group = H // KVH
    g_pad = max(8, _round_up(group, 8))
    max_pages = page_tables.shape[1]

    qg = q[:, 0].reshape(B, KVH, group, D)
    if g_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))

    lengths = jnp.asarray(lengths, jnp.int32)
    page_tables = jnp.asarray(page_tables, jnp.int32)

    def q_index(b, g, ki, lens, tables):
        return (b, g, 0, 0)

    def kv_index(b, g, ki, lens, tables):
        last = jnp.maximum(pl.cdiv(lens[b], page_size) - 1, 0)
        return (g, tables[b, jnp.minimum(ki, last)], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KVH, max_pages),
        in_specs=[
            pl.BlockSpec((None, None, g_pad, D), q_index),
            pl.BlockSpec((None, None, page_size, D), kv_index),
            pl.BlockSpec((None, None, page_size, D), kv_index),
        ],
        out_specs=pl.BlockSpec((None, None, g_pad, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, 128), jnp.float32),
            pltpu.VMEM((g_pad, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_decode_kernel, sm_scale=D**-0.5, page_size=page_size, num_blocks=max_pages
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, g_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, page_tables, qg, k_pages, v_pages)
    return out[:, :, :group].reshape(B, 1, H, D)


def paged_decode_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_tables: jax.Array,
    *,
    impl: Optional[str] = None,
) -> jax.Array:
    """Dispatcher: Pallas paged kernel on TPU, gather + dense attention as the
    cross-backend reference (and CPU test oracle)."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if isinstance(impl, tuple):
        # pallas_tp (see parallel.tp_attention): paged decode is HBM-bound and
        # the gather+dense path partitions cleanly under GSPMD.
        impl = "xla"
    if impl == "pallas":
        return paged_flash_decode(q, k_pages, v_pages, lengths, page_tables)

    from omchat_tpu.ops.attention import _xla_attention

    # gather the logical KV per request: [B, KVH, max_pages*page_size, D]
    k = jnp.take(k_pages, page_tables, axis=1)  # [KVH, B, max_pages, ps, D]
    v = jnp.take(v_pages, page_tables, axis=1)
    kvh, b, mp, ps, d = k.shape
    k = k.transpose(1, 0, 2, 3, 4).reshape(b, kvh, mp * ps, d)
    v = v.transpose(1, 0, 2, 3, 4).reshape(b, kvh, mp * ps, d)
    return _xla_attention(
        q,
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=False,
        q_offset=None,
        kv_len=lengths,
    )


class PageAllocator:
    """Host-side free-list allocator for the shared page pool."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self.free: List[int] = list(range(num_pages - 1, -1, -1))

    def alloc(self, n: int = 1) -> List[int]:
        if len(self.free) < n:
            raise MemoryError(f"page pool exhausted (need {n}, have {len(self.free)})")
        return [self.free.pop() for _ in range(n)]

    def release(self, pages: List[int]) -> None:
        self.free.extend(pages)

    @property
    def available(self) -> int:
        return len(self.free)
