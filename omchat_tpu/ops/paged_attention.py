"""Paged flash-decode: GQA decode attention over a paged KV pool.

Virtual memory for KV caches (guide: ragged paged attention): physical pages
``[num_pages, KVH, page_size, D]`` shared by all requests (page-major: one page
holds every kv head's slice contiguously, so a page fetch is ONE contiguous DMA); each request maps
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
from omchat_tpu.ops.online_softmax import (
    fold_self_column,
    normalize_output,
    online_update,
    qk_dot,
)


def _paged_decode_kernel(
    lengths_ref,  # [B] int32 valid lengths
    tables_ref,  # [B, max_pages] int32 page tables
    q_ref,  # [KVH, G_pad, D]
    k_pages_ref,  # [KVH, page_size, D] (one gathered page, every kv head)
    v_pages_ref,  # [KVH, page_size, D]
    *rest,  # [k_new_ref, v_new_ref (if self_col),] o_ref, m, l, acc
    sm_scale: float,
    page_size: int,
    num_blocks: int,
    self_col: bool = False,
):
    """One grid step = one (request, page): ALL kv heads of the page ride a
    single CONTIGUOUS block fetch (page-major pool layout).  Decode is
    DMA-issue-bound, not bandwidth-bound — at B=16/fill=2048 the
    per-(head, page) variant measured ~24 us per 32 KB fetch
    (dev/exp_decode_b.py), so fetch count and contiguity, not bandwidth, are
    the levers here.

    ``self_col``: the pool holds only tokens 0..length-1 and the in-flight
    token's K/V arrive as a tiny VMEM block (row 0 of [KVH, 8, D]), folded
    into the online softmax at the last grid step — this keeps the pool
    READ-ONLY through the serving engine's layer scan (see
    paged_engine._decode_step_core for the measured write-path anatomy)."""
    if self_col:
        k_new_ref, v_new_ref, o_ref, m_scratch, l_scratch, acc_scratch = rest
    else:
        o_ref, m_scratch, l_scratch, acc_scratch = rest
    b = pl.program_id(0)
    ki = pl.program_id(1)
    length = lengths_ref[b]

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    @pl.when(ki * page_size < length)
    def _run():
        kvh, g_pad, _ = q_ref.shape
        # Batched-head update: one dot_general over the kv-head batch dim and
        # one flattened online-softmax instead of a KVH-unrolled loop — fewer
        # VPU instruction streams per page (measured 1.68 -> 1.11 ms on a
        # 512-step grid, dev/exp_decode_anatomy.py round 4).
        q = q_ref[...]  # [KVH, G, D]
        k = k_pages_ref[...].astype(q.dtype)  # [KVH, ps, D]
        s = qk_dot(q, k) * sm_scale  # [KVH, G, ps]
        col = jax.lax.broadcasted_iota(jnp.int32, (kvh, g_pad, page_size), 2) + ki * page_size
        s = jnp.where(col < length, s, DEFAULT_MASK_VALUE)
        v = v_pages_ref[...].astype(q.dtype)  # [KVH, ps, D]
        m_scratch[...], l_scratch[...], acc_scratch[...] = online_update(
            s, v, m_scratch[...], l_scratch[...], acc_scratch[...]
        )

    @pl.when(ki == num_blocks - 1)
    def _store():
        if self_col:
            # fold the in-flight token in before normalizing: one [KVH, G, 8]
            # score block (row 0 valid), standard online-softmax update
            _, l_scratch[...], acc_scratch[...] = fold_self_column(
                q_ref[...], k_new_ref[...], v_new_ref[...], sm_scale,
                m_scratch[...], l_scratch[...], acc_scratch[...],
            )
        o_ref[...] = normalize_output(l_scratch[...], acc_scratch[...], o_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_flash_decode(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_tables: jax.Array,
    k_new: Optional[jax.Array] = None,
    v_new: Optional[jax.Array] = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention over paged KV.

    q: [B, 1, H, D]; k/v_pages: [P, KVH, page_size, D] (page-major); lengths:
    [B]; page_tables: [B, max_pages] physical page per logical block.
    ``k_new``/``v_new`` [B, KVH, D]: optional self-column — the in-flight
    token's K/V, not yet in the pool (``lengths`` then EXCLUDES it).
    Returns [B, 1, H, D].
    """
    B, S, H, D = q.shape
    assert S == 1
    _, KVH, page_size, _ = k_pages.shape
    group = H // KVH
    g_pad = max(8, _round_up(group, 8))
    max_pages = page_tables.shape[1]
    self_col = k_new is not None

    qg = q[:, 0].reshape(B, KVH, group, D)
    if g_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))

    lengths = jnp.asarray(lengths, jnp.int32)
    page_tables = jnp.asarray(page_tables, jnp.int32)

    def q_index(b, ki, lens, tables):
        return (b, 0, 0, 0)

    def kv_index(b, ki, lens, tables):
        last = jnp.maximum(pl.cdiv(lens[b], page_size) - 1, 0)
        return (tables[b, jnp.minimum(ki, last)], 0, 0, 0)

    in_specs = [
        pl.BlockSpec((None, KVH, g_pad, D), q_index),
        pl.BlockSpec((None, KVH, page_size, D), kv_index),
        pl.BlockSpec((None, KVH, page_size, D), kv_index),
    ]
    operands = [qg, k_pages, v_pages]
    if self_col:
        kn = jnp.pad(k_new[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, 0)))
        vn = jnp.pad(v_new[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, 0)))
        in_specs += [
            pl.BlockSpec((None, KVH, 8, D), q_index),
            pl.BlockSpec((None, KVH, 8, D), q_index),
        ]
        operands += [kn, vn]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, KVH, g_pad, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((KVH, g_pad, 128), jnp.float32),
            pltpu.VMEM((KVH, g_pad, 128), jnp.float32),
            pltpu.VMEM((KVH, g_pad, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_decode_kernel, sm_scale=D**-0.5, page_size=page_size,
        num_blocks=max_pages, self_col=self_col,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, g_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, page_tables, *operands)
    return out[:, :, :group].reshape(B, 1, H, D)


NBUF = 4  # pages in flight per request in the manual-DMA decode kernel


def _paged_decode_manual_kernel(
    lengths_ref,  # [B] int32 (scalar prefetch)
    tables_ref,  # [B, max_pages] int32
    q_ref,  # [KVH, G_pad, D] (VMEM block)
    k_hbm,  # [P, KVH, page_size, D] (stays in HBM)
    v_hbm,
    *rest,  # [k_new_ref, v_new_ref (if self_col),] o_ref, kbuf, vbuf, m, l, acc, sems
    page_size: int,
    sm_scale: float,
    self_col: bool = False,
):
    """Grid (B,): each request walks its own page list with an NBUF-deep ring
    of manual async copies — pages stream while the previous page's online
    softmax runs.  This replaces the auto-pipelined per-page grid, whose
    per-step issue overhead capped KV streaming at ~56-66 GB/s
    (BENCH.md decode anatomy; dev/exp_manual_decode.py is the measured A/B)."""
    if self_col:
        k_new_ref, v_new_ref, o_ref, kbuf, vbuf, m_s, l_s, acc_s, sems = rest
    else:
        o_ref, kbuf, vbuf, m_s, l_s, acc_s, sems = rest
    b = pl.program_id(0)
    length = lengths_ref[b]
    n_pages = pl.cdiv(length, page_size)
    kvh, g_pad, _ = q_ref.shape

    m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
    l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
    acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    def start(slot, pi):
        page = tables_ref[b, pi]
        pltpu.make_async_copy(k_hbm.at[page], kbuf.at[slot], sems.at[slot, 0]).start()
        pltpu.make_async_copy(v_hbm.at[page], vbuf.at[slot], sems.at[slot, 1]).start()

    def wait(slot, pi):
        page = tables_ref[b, pi]
        pltpu.make_async_copy(k_hbm.at[page], kbuf.at[slot], sems.at[slot, 0]).wait()
        pltpu.make_async_copy(v_hbm.at[page], vbuf.at[slot], sems.at[slot, 1]).wait()

    for i in range(NBUF):  # warmup: up to NBUF pages in flight
        @pl.when(i < n_pages)
        def _(i=i):
            start(i, i)

    def body(pi, _):
        slot = jax.lax.rem(pi, NBUF)
        wait(slot, pi)
        col = jax.lax.broadcasted_iota(jnp.int32, (g_pad, page_size), 1) + pi * page_size
        mask = col < length
        for h in range(kvh):
            q = q_ref[h]
            k = kbuf[slot, h].astype(q.dtype)
            s = qk_dot(q, k) * sm_scale
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            v = vbuf[slot, h].astype(q.dtype)
            m_s[h], l_s[h], acc_s[h] = online_update(s, v, m_s[h], l_s[h], acc_s[h])

        @pl.when(pi + NBUF < n_pages)  # refill this slot NBUF pages ahead
        def _():
            start(slot, pi + NBUF)
        return _

    jax.lax.fori_loop(0, n_pages, body, None)

    if self_col:
        _, l_s[...], acc_s[...] = fold_self_column(
            q_ref[...], k_new_ref[...], v_new_ref[...], sm_scale,
            m_s[...], l_s[...], acc_s[...],
        )

    o_ref[...] = normalize_output(l_s[...], acc_s[...], o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_flash_decode_manual(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_tables: jax.Array,
    k_new: Optional[jax.Array] = None,
    v_new: Optional[jax.Array] = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Manual-DMA variant of :func:`paged_flash_decode` (same contract)."""
    B, S, H, D = q.shape
    assert S == 1
    _, KVH, page_size, _ = k_pages.shape
    group = H // KVH
    g_pad = max(8, _round_up(group, 8))
    self_col = k_new is not None

    qg = q[:, 0].reshape(B, KVH, group, D)
    if g_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))
    lengths = jnp.asarray(lengths, jnp.int32)
    page_tables = jnp.asarray(page_tables, jnp.int32)

    def blk(b, lens, tabs):
        return (b, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((None, KVH, g_pad, D), blk),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [qg, k_pages, v_pages]
    if self_col:
        kn = jnp.pad(k_new[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, 0)))
        vn = jnp.pad(v_new[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, 0)))
        in_specs += [
            pl.BlockSpec((None, KVH, 8, D), blk),
            pl.BlockSpec((None, KVH, 8, D), blk),
        ]
        operands += [kn, vn]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, KVH, g_pad, D), blk),
        scratch_shapes=[
            pltpu.VMEM((NBUF, KVH, page_size, D), k_pages.dtype),
            pltpu.VMEM((NBUF, KVH, page_size, D), v_pages.dtype),
            pltpu.VMEM((KVH, g_pad, 128), jnp.float32),
            pltpu.VMEM((KVH, g_pad, 128), jnp.float32),
            pltpu.VMEM((KVH, g_pad, D), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_paged_decode_manual_kernel, page_size=page_size,
                          sm_scale=D**-0.5, self_col=self_col),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, g_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lengths, page_tables, *operands)
    return out[:, :, :group].reshape(B, 1, H, D)


def paged_decode_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    lengths: jax.Array,
    page_tables: jax.Array,
    *,
    impl: Optional[str] = None,
    k_new: Optional[jax.Array] = None,
    v_new: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatcher: Pallas paged kernel on TPU, gather + dense attention as the
    cross-backend reference (and CPU test oracle).

    ``k_new``/``v_new`` [B, KVH, D]: self-column mode — the in-flight token's
    K/V are folded into the softmax by the kernel instead of being read back
    from the pool, and ``lengths`` EXCLUDES that token.  This lets the serving
    engine keep the pool read-only across its layer scan (one commit scatter
    per step, see paged_engine._decode_step_core)."""
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if isinstance(impl, tuple):
        # pallas_tp (see parallel.tp_attention): paged decode is HBM-bound and
        # the gather+dense path partitions cleanly under GSPMD.
        impl = "xla"
    if impl == "pallas":
        return paged_flash_decode(q, k_pages, v_pages, lengths, page_tables, k_new, v_new)
    if impl == "pallas_manual":
        return paged_flash_decode_manual(q, k_pages, v_pages, lengths, page_tables, k_new, v_new)

    from omchat_tpu.ops.attention import _xla_attention, self_column_reference

    # gather the logical KV per request: [B, KVH, max_pages*page_size, D]
    k, v = _gather_pages(k_pages, v_pages, page_tables)
    k, v = k.astype(q.dtype), v.astype(q.dtype)  # pool may be fp8
    if k_new is not None:
        return self_column_reference(q, k, v, lengths, k_new, v_new)
    return _xla_attention(
        q,
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=False,
        q_offset=None,
        kv_len=lengths,
    )


def _paged_prefill_kernel(
    kv_lens_ref,  # [B] int32 (scalar prefetch)
    q_offsets_ref,  # [B] int32
    tables_ref,  # [B, max_pages] int32
    q_ref,  # [G, bq, D]
    k_page_ref,  # [page_size, D]
    v_page_ref,  # [page_size, D]
    o_ref,  # [G, bq, D]
    m_scratch,  # [G*bq, 128] f32
    l_scratch,
    acc_scratch,  # [G*bq, D] f32
    *,
    sm_scale: float,
    page_size: int,
    block_q: int,
    num_blocks: int,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    kv_len = kv_lens_ref[b]
    q_offset = q_offsets_ref[b]

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    # a kv page is live iff it holds cached tokens (< kv_len) and is not
    # strictly in this q block's causal future
    q_last = q_offset + (qi + 1) * block_q - 1

    @pl.when((ki * page_size < kv_len) & (ki * page_size <= q_last))
    def _run():
        g, bq, d = q_ref.shape
        r = g * bq
        q = q_ref[...].reshape(r, d)
        k = k_page_ref[...].astype(q.dtype)
        s = qk_dot(q, k) * sm_scale
        row_pos = q_offset + qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (r, page_size), 0) % bq
        col_pos = ki * page_size + jax.lax.broadcasted_iota(jnp.int32, (r, page_size), 1)
        s = jnp.where((col_pos <= row_pos) & (col_pos < kv_len), s, DEFAULT_MASK_VALUE)

        v = v_page_ref[...].astype(q.dtype)
        m_scratch[...], l_scratch[...], acc_scratch[...] = online_update(
            s, v, m_scratch[...], l_scratch[...], acc_scratch[...]
        )

    @pl.when(ki == num_blocks - 1)
    def _store():
        g, bq, d = o_ref.shape
        out = normalize_output(l_scratch[...], acc_scratch[...], o_ref.dtype)
        o_ref[...] = out.reshape(g, bq, d)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def paged_flash_prefill(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    kv_len: jax.Array,
    page_tables: jax.Array,
    q_offset: jax.Array,
    *,
    block_q: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Pallas chunked-prefill attention over paged KV (see
    :func:`paged_prefill_attention` for semantics).

    Grid (B, KVH, C/bq, max_pages): q blocks are group-stacked ([G, bq, D] per
    kv head — one page fetch serves the whole GQA group), the kv index map
    reads the page table via scalar prefetch, and out-of-range steps clamp to
    the previous page so the pipeline skips the re-fetch (no dead HBM traffic
    past ``kv_len``).

    NOT the serving default (select with ``impl='pallas_paged'``): the grid
    repeats the page walk per (kv head, q block), so every live page is
    fetched KVH x (C/bq) times and the per-step issue overhead dominates long
    chunks — the gather+flash path in :func:`paged_prefill_attention` measured
    ~2.5x faster on the serving workload's multimodal chunks (round 4)."""
    B, C, H, D = q.shape
    _, KVH, page_size, _ = k_pages.shape
    import math

    group = H // KVH
    max_pages = page_tables.shape[1]
    # largest block ≤ block_q that divides C (chunk widths are bucketed
    # multiples of 128, so this lands on 128/256 in practice)
    bq = math.gcd(min(block_q, C), C)
    assert C % bq == 0 and bq >= 8

    # [B, C, H, D] → [B, KVH, G, C, D]
    qg = q.reshape(B, C, KVH, group, D).transpose(0, 2, 3, 1, 4)

    kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))
    q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    page_tables = jnp.asarray(page_tables, jnp.int32)

    def q_index(b, n, qi, ki, lens, offs, tables):
        return (b, n, 0, qi, 0)

    def kv_index(b, n, qi, ki, lens, offs, tables):
        last = jnp.maximum(pl.cdiv(lens[b], page_size) - 1, 0)
        return (tables[b, jnp.minimum(ki, last)], n, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, KVH, C // bq, max_pages),
        in_specs=[
            pl.BlockSpec((None, None, group, bq, D), q_index),
            pl.BlockSpec((None, None, page_size, D), kv_index),
            pl.BlockSpec((None, None, page_size, D), kv_index),
        ],
        out_specs=pl.BlockSpec((None, None, group, bq, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((group * bq, 128), jnp.float32),
            pltpu.VMEM((group * bq, 128), jnp.float32),
            pltpu.VMEM((group * bq, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_prefill_kernel,
        sm_scale=D**-0.5,
        page_size=page_size,
        block_q=bq,
        num_blocks=max_pages,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, group, C, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_len, q_offset, page_tables, qg, k_pages, v_pages)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, C, H, D)


def _gather_pages(k_pages, v_pages, page_tables):
    """[P, KVH, ps, D] pools + [B, MP] tables → contiguous [B, KVH, MP*ps, D]."""
    k = jnp.take(k_pages, page_tables, axis=0)  # [B, MP, KVH, ps, D]
    v = jnp.take(v_pages, page_tables, axis=0)
    b, mp, kvh, ps, d = k.shape
    k = k.transpose(0, 2, 1, 3, 4).reshape(b, kvh, mp * ps, d)
    v = v.transpose(0, 2, 1, 3, 4).reshape(b, kvh, mp * ps, d)
    return k, v


def paged_prefill_attention(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    kv_len: jax.Array,
    page_tables: jax.Array,
    q_offset: jax.Array,
    *,
    impl: Optional[str] = None,
) -> jax.Array:
    """Chunked-prefill attention over paged KV.

    One chunk of queries (its K/V already scattered into the request's pages)
    attends to the first ``kv_len`` positions of the page-mapped sequence,
    causal at absolute positions (query row i sits at ``q_offset + i``).  This
    is what makes the paged engine's prefill length-oblivious: every chunk is
    one fixed-shape program regardless of how long the prompt is.

    q: [B, C, H, D]; k/v_pages: [P, KVH, page_size, D] (page-major);
    kv_len, q_offset: [B] or scalar; page_tables: [B, max_pages].
    Returns [B, C, H, D].
    """
    if impl is None:
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if isinstance(impl, tuple):
        # pallas_tp shard_map wrapper not wired for the paged pool layout; the
        # gather+flash path partitions under GSPMD (kv-head axis sharded).
        impl = "xla"
    if impl in ("pallas", "pallas_manual"):  # manual ring is a decode-only variant
        # Gather the page-mapped prefix to contiguous KV, then run the tuned
        # causal flash kernel.  The page-walk kernel below re-fetches every
        # page KVH x (C/bq) times (its grid repeats the page dimension per kv
        # head and per q block), so a 2048-token chunk over ~20 live pages
        # pays ~1000 grid steps/layer at ~4 us each — ~3x the chunk's whole
        # matmul floor (round-4 profile; BENCH.md serving section).  One
        # jnp.take per layer (a few MB) + big-block flash is far cheaper;
        # 2048 queries amortize the gather, unlike decode where S=1 makes the
        # same trade lose (BENCH.md decode anatomy: gather+dense 99-130 ms).
        from omchat_tpu.ops.flash_attention import flash_attention

        k, v = _gather_pages(k_pages, v_pages, page_tables)
        return flash_attention(
            q, k.astype(q.dtype), v.astype(q.dtype), causal=True,
            q_offset=q_offset, kv_len=kv_len, kv_format="bntd",
        )
    if impl == "pallas_paged":  # the page-walk grid kernel (kept for A/B)
        return paged_flash_prefill(q, k_pages, v_pages, kv_len, page_tables, q_offset)

    from omchat_tpu.ops.attention import _xla_attention

    k, v = _gather_pages(k_pages, v_pages, page_tables)
    k, v = k.astype(q.dtype), v.astype(q.dtype)  # pool may be fp8
    return _xla_attention(
        q,
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=True,
        q_offset=q_offset,
        kv_len=kv_len,
    )


def _commit_rows_kernel(pages_ref, offsets_ref, krow_ref, vrow_ref,
                        kwin_ref, vwin_ref, ko_ref, vo_ref):
    # Each grid step's block is the 8-row-aligned WINDOW holding the target
    # row (Mosaic requires sublane blocks in multiples of 8): copy the old
    # window, overwrite the one row, write back.  input_output_aliases pins
    # the outputs to the input pools, so every untouched byte survives.
    i = pl.program_id(0)
    sub = offsets_ref[i] % 8
    kvh, w, d = ko_ref.shape
    row_sel = jax.lax.broadcasted_iota(jnp.int32, (kvh, w, d), 1) == sub
    ko_ref[...] = jnp.where(
        row_sel, jnp.broadcast_to(krow_ref[:, :1], (kvh, w, d)).astype(ko_ref.dtype),
        kwin_ref[...],
    )
    vo_ref[...] = jnp.where(
        row_sel, jnp.broadcast_to(vrow_ref[:, :1], (kvh, w, d)).astype(vo_ref.dtype),
        vwin_ref[...],
    )


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnames=("k_pool", "v_pool"))
def commit_rows(
    k_pool: jax.Array,  # [P_flat, KVH, ps, D] (flat page-major pool)
    v_pool: jax.Array,
    pages: jax.Array,  # [N] int32 flat page per row
    offsets: jax.Array,  # [N] int32 in-page position per row
    k_rows: jax.Array,  # [N, KVH, D]
    v_rows: jax.Array,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Scatter N single-token K/V rows into the paged pool IN PLACE.

    The jnp scatter equivalent (``pool.at[pages, :, offsets].set(rows)``)
    lowers to a full-operand rematerialization on TPU (measured ~5-7 ms/step
    at the serving pool size, dev/exp_decode_anatomy.py round 4); here each
    grid step reads/writes only the 8-row-aligned page WINDOW holding its
    target row (Mosaic's minimum sublane block), with
    ``input_output_aliases`` pinning the outputs to the input pools, so the
    commit moves ~N x KVH x 8 x D elements of HBM and touches nothing else.

    Two rows sharing a (page, window) would race through the pipeline's
    read-ahead; the engine's layout makes that impossible for real pages
    (one row per slot per layer, distinct pages per slot, distinct layers at
    distinct flat pages) — only parking-page rows collide, and parking
    content is garbage by contract."""
    n = pages.shape[0]
    kr = jnp.pad(k_rows[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, 0)))
    vr = jnp.pad(v_rows[:, :, None, :], ((0, 0), (0, 0), (0, 7), (0, 0)))
    pages = jnp.asarray(pages, jnp.int32)
    offsets = jnp.asarray(offsets, jnp.int32)
    kvh, ps, d = k_pool.shape[1:]

    def row_index(i, pages_, offsets_):
        return (i, 0, 0, 0)

    def pool_index(i, pages_, offsets_):
        # window block: (page, 0, 8-row window holding the offset, 0)
        return (pages_[i], 0, offsets_[i] // 8, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, kvh, 8, d), row_index),
            pl.BlockSpec((None, kvh, 8, d), row_index),
            pl.BlockSpec((None, kvh, 8, d), pool_index),
            pl.BlockSpec((None, kvh, 8, d), pool_index),
        ],
        out_specs=[
            pl.BlockSpec((None, kvh, 8, d), pool_index),
            pl.BlockSpec((None, kvh, 8, d), pool_index),
        ],
    )
    # input order: [pages, offsets (prefetch), kr, vr, k_pool, v_pool];
    # aliases count ALL inputs including the scalar-prefetch operands
    ko, vo = pl.pallas_call(
        _commit_rows_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pages, offsets, kr, vr, k_pool, v_pool)
    return ko, vo


def _commit_pages_kernel(pages_ref, kc_ref, vc_ref, kin_ref, vin_ref, ko_ref, vo_ref):
    # whole-page overwrite: no window merge needed (the full block is new)
    ko_ref[...] = kc_ref[...]
    vo_ref[...] = vc_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnames=("k_pool", "v_pool"))
def commit_pages(
    k_pool: jax.Array,  # [P_flat, KVH, ps, D] (flat page-major pool)
    v_pool: jax.Array,
    pages: jax.Array,  # [M] int32 flat destination page per chunk
    k_chunks: jax.Array,  # [M, KVH, ps, D]
    v_chunks: jax.Array,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Write M whole pages into the pool IN PLACE — the prefill page commit.

    The jnp whole-page scatter (``pool.at[:, pages].set(chunks)``) measured
    ~35 ms per batched-prefill commit at the serving pool size
    (dev/exp_tick_anatomy.py round 5 — the same operand rematerialization
    the row commit hit in round 4); here each grid step's output block IS
    one destination page, ``input_output_aliases`` pins the pool, so the
    commit moves only the committed pages' bytes.

    Duplicate page ids (parking-page spill) write garbage over garbage in
    grid order — same contract as the scatter's undefined duplicate
    resolution."""
    m = pages.shape[0]
    kvh, ps, d = k_pool.shape[1:]
    pages = jnp.asarray(pages, jnp.int32)

    def chunk_index(i, pages_):
        return (i, 0, 0, 0)

    def pool_index(i, pages_):
        return (pages_[i], 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((None, kvh, ps, d), chunk_index),
            pl.BlockSpec((None, kvh, ps, d), chunk_index),
            pl.BlockSpec((None, kvh, ps, d), pool_index),
            pl.BlockSpec((None, kvh, ps, d), pool_index),
        ],
        out_specs=[
            pl.BlockSpec((None, kvh, ps, d), pool_index),
            pl.BlockSpec((None, kvh, ps, d), pool_index),
        ],
    )
    # input order: [pages (prefetch), kc, vc, k_pool, v_pool]
    ko, vo = pl.pallas_call(
        _commit_pages_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pages, k_chunks.astype(k_pool.dtype), v_chunks.astype(v_pool.dtype), k_pool, v_pool)
    return ko, vo


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
