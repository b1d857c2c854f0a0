"""Pallas TPU flash attention (forward, inference).

TPU-native replacement for the reference's external flash-attn CUDA kernels
(SURVEY.md §2.2):

- non-causal packed-QKV ViT attention (`flash_attn_varlen_qkvpacked_func`,
  intern_vit_6b/flash_attention.py:51-73),
- causal GQA prefill (`flash_attn_func`, modeling_llama.py:604-621 / HF Qwen2).

Design:
- grid (B, H, Sq/block_q, T/block_k) with the KV dimension innermost
  ("arbitrary" semantics) so the online-softmax scratch (m, l, acc) persists
  across KV tiles of one Q tile;
- GQA handled in the BlockSpec index map (q head h reads kv head h // group)
  — no materialized ``repeat_kv``;
- per-batch causal offset and valid-kv-length arrive via scalar prefetch; the
  KV index map clamps out-of-range tiles to the last needed tile so the
  auto-pipeline never DMAs data the kernel will not use (ragged-length aware);
- fp32 softmax statistics; bf16 inputs hit the MXU with fp32 accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _attn_core(
    scalars_ref,  # [2, B] int32 — row 0: causal q offsets, row 1: kv valid lengths
    segb_ref,  # [2, B, num_q_blocks] int32 kv-block range per q block, or None
    q_ref,  # [G, block_q, D] — all q heads of one kv-head group, stacked
    k_ref,  # [block_k, D]
    v_ref,  # [block_k, D]
    sq_ref,  # [block_q, 1] int32 q segment ids, or None
    sk_ref,  # [block_k, 1] int32 kv segment ids, or None
    o_ref,  # [G, block_q, D]
    m_scratch,  # [G, block_q, 128] fp32
    l_scratch,  # [G, block_q, 128] fp32
    acc_scratch,  # [G, block_q, D] fp32
    *,
    causal: bool,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    anchored: bool = False,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    g = q_ref.shape[0]

    q_off = scalars_ref[0, b]
    kv_len = scalars_ref[1, b]

    if anchored:
        # Diagonal-anchored softmax (causal only): kv tiles are processed in
        # DESCENDING order (the index map mirrors this), so the first ``span``
        # tiles cover every row's causal diagonal.  The online-softmax update
        # runs only on those; after that the per-row max is FROZEN and later
        # (earlier-key) tiles run exp2(s - m) with no max reduce, no alpha,
        # and no acc/l rescale — the m/l bookkeeping was the largest
        # non-matmul cost of the online kernel (0.49 of 2.48 ms/layer,
        # dev/exp_causal_ablate.py).  Exact by softmax shift invariance; the
        # frozen anchor includes each valid row's self-attention logit, so
        # l >= 1 and overflow would need an early key to beat the anchor by
        # >127 in the exp2 domain (~88 natural units) — far beyond trained
        # models.  (Rows whose diagonal exceeds kv_len — padding in every
        # production caller — carry the same headroom argument.)
        row_max = qi * block_q + block_q - 1 + q_off
        last = jnp.minimum(
            jnp.maximum(pl.cdiv(kv_len, block_k) - 1, 0), jax.lax.div(row_max, block_k)
        )
        ki_eff = last - ki
        needed = ki_eff >= 0
    else:
        ki_eff = ki
        # Tile-level skip: causal tiles fully above the diagonal, tiles fully
        # past the valid kv length, and (packed mode) tiles whose segments
        # cannot overlap this q block's segments contribute nothing.
        row_max = qi * block_q + block_q - 1 + (q_off if causal else 0)
        in_range = (ki * block_k) < kv_len
        needed = in_range & ((ki * block_k) <= row_max) if causal else in_range
        if segb_ref is not None:
            needed &= (ki >= segb_ref[0, b, qi]) & (ki <= segb_ref[1, b, qi])

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    # Interior tiles (fully inside the causal triangle and the valid kv range)
    # skip the iota/compare/select masking passes entirely — at prefill scale
    # most tiles are interior and the VPU mask construction rivals the exp cost.
    col_end = ki_eff * block_k + block_k - 1
    full = col_end < kv_len
    if causal:
        row_min = qi * block_q + q_off
        full &= col_end <= row_min
    if sq_ref is not None:
        full &= False  # segment boundaries can cut through any tile

    def _tile(masked: bool, frozen: bool = False):
        # One kv fetch serves the whole GQA group; the per-head math below is
        # the proven 2D kernel, statically unrolled over the group.
        k = k_ref[...]
        v = v_ref[...]

        if masked:
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ki_eff * block_k
            mask = col_ids < kv_len
            if causal:
                row_ids = (
                    jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                    + qi * block_q
                    + q_off
                )
                mask = mask & (col_ids <= row_ids)
            if sq_ref is not None:
                # multi-document packing: attend only within the own segment
                # (the flash-attn cu_seqlens varlen contract, SURVEY.md §2.2)
                mask = mask & (sq_ref[...] == sk_ref[...].reshape(1, block_k))

        for gi in range(g):
            q = q_ref[gi]  # [block_q, D], pre-scaled by sm_scale*log2e
            s = jax.lax.dot_general(
                q, k.astype(q.dtype), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [block_q, block_k]
            if masked:
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            if frozen:
                # anchored mode, past the span: fixed per-row shift, no max
                # reduce, no rescale
                p = jnp.exp2(s - m_scratch[gi][:, :1])
                l_scratch[gi] = l_scratch[gi] + jnp.sum(p, axis=1, keepdims=True)
                o_curr = jax.lax.dot(
                    p.astype(v.dtype), v.astype(q.dtype), preferred_element_type=jnp.float32
                )
                acc_scratch[gi] = acc_scratch[gi] + o_curr
                continue

            m_prev = m_scratch[gi]  # [block_q, 128]
            l_prev = l_scratch[gi]
            m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
            m_next = jnp.maximum(m_prev, m_curr)  # broadcast → [block_q, 128]
            alpha = jnp.exp2(m_prev - m_next)
            p = jnp.exp2(s - m_next[:, :1])
            l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

            m_scratch[gi] = m_next
            l_scratch[gi] = l_next

            o_curr = jax.lax.dot(
                p.astype(v.dtype), v.astype(q.dtype), preferred_element_type=jnp.float32
            )
            acc_scratch[gi] = acc_scratch[gi] * alpha[:, : acc_scratch.shape[2]] + o_curr

    if anchored:
        # The first ``span`` descending tiles (covering every row's diagonal)
        # run the full online update; the rest run with the frozen anchor.
        span = min(num_kv_blocks, (block_q + block_k - 1) // block_k + 1)
        in_span = ki < span

        @pl.when(in_span & needed & full)
        def _run_span_full():
            _tile(False)

        @pl.when(in_span & needed & jnp.logical_not(full))
        def _run_span_masked():
            _tile(True)

        @pl.when(jnp.logical_not(in_span) & needed & full)
        def _run_frozen_full():
            _tile(False, frozen=True)

        @pl.when(jnp.logical_not(in_span) & needed & jnp.logical_not(full))
        def _run_frozen_masked():
            _tile(True, frozen=True)
    else:
        @pl.when(needed & full)
        def _run_full():
            _tile(False)

        @pl.when(needed & jnp.logical_not(full))
        def _run_masked():
            _tile(True)

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        for gi in range(g):
            l = l_scratch[gi][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[gi] = (acc_scratch[gi] * l_inv).astype(o_ref.dtype)


def _attn_kernel(scalars_ref, q_ref, k_ref, v_ref, o_ref, m, l, acc, **kw):
    _attn_core(scalars_ref, None, q_ref, k_ref, v_ref, None, None, o_ref, m, l, acc, **kw)


def _attn_kernel_seg(scalars_ref, segb_ref, q_ref, k_ref, v_ref, sq_ref, sk_ref, o_ref, m, l, acc, **kw):
    _attn_core(scalars_ref, segb_ref, q_ref, k_ref, v_ref, sq_ref, sk_ref, o_ref, m, l, acc, **kw)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


@functools.lru_cache(maxsize=256)
def pick_block(seq_len: int, target: int) -> int:
    """Choose a block size minimizing pad waste, biased toward ``target``.

    Rounding the sequence to a multiple of a power-of-two block can waste up
    to 50% compute (the ViT's 1025 = 1024 patches + CLS rounds to 1536 with
    512-blocks).  Candidate blocks are multiples of 64 (Mosaic compiles these
    reliably; odd multiples of 8 have been observed to hang its scheduler),
    searched over a few padded lengths for the lowest (waste, |d−target|)."""
    import math

    base = _round_up(seq_len, 64)
    # Mosaic compile time grows sharply with block area (observed minutes at
    # 1088×1088); cap blocks at 640 — within ~5% of the best-measured config
    # on the ViT shape with seconds-long compiles.
    if base <= min(2 * target, 640):
        return base  # single block
    best_d, best_score = 128, float("inf")
    for d in range(128, 641, 64):
        waste = _round_up(seq_len, d) / seq_len - 1.0
        score = waste + 0.05 * abs(math.log2(d / target))
        if score < best_score:
            best_score, best_d = score, d
    return best_d


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "kv_format", "interpret", "softmax"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    q_offset: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    kv_format: str = "btnd",
    interpret: bool = False,
    softmax: str = "auto",
) -> jax.Array:
    """Flash attention forward.

    q: [B, S, H, D]; k/v: [B, T, KVH, D] ("btnd") or [B, KVH, T, D] ("bntd").
    Returns [B, S, H, D] in q.dtype.  Semantics match
    :func:`omchat_tpu.ops.attention._xla_attention`.

    ``segment_ids`` [B, S] int32 enables multi-document packing (self-attention
    only, S == T): tokens attend within their own segment.  Negative ids mark
    padding.  Per-q-block kv ranges ride the scalar prefetch so tiles between
    documents are skipped, not just masked — the TPU equivalent of flash-attn's
    cu_seqlens varlen entry point (intern_vit_6b/flash_attention.py:51-73).

    ``softmax``: "auto" (anchored for causal unpacked attention, online
    otherwise), "anchored" or "online".  The anchored variant walks kv tiles
    diagonal-first and fixes each row's softmax shift at the diagonal tile's
    max — mathematically exact (shift invariance) with no running-max/rescale
    bookkeeping; see _attn_core.
    """
    B, S, H, D = q.shape
    if kv_format == "btnd":
        T, KVH = k.shape[1], k.shape[2]
        # Kernel-native layout is head-major (Mosaic tiles the last two dims).
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
    else:
        KVH, T = k.shape[1], k.shape[2]
    group = H // KVH
    q = q.transpose(0, 2, 1, 3)  # [B, H, S, D]

    import os as _os

    if (
        block_q is None
        and block_k is None
        and _os.environ.get("OMCHAT_ATTN_BQ")
        and _os.environ.get("OMCHAT_ATTN_BK")
    ):
        # Experiment override (dev/exp_causal.py) — honored only when the
        # caller passed no explicit blocks, so a stale env var in a long-lived
        # process can't silently retile callers that chose their own.  NOTE:
        # read at trace time — the jit cache keys on shapes, not env, so
        # sweeps must use one process per configuration.
        block_q = int(_os.environ["OMCHAT_ATTN_BQ"])
        block_k = int(_os.environ["OMCHAT_ATTN_BK"])
    elif block_q is not None or block_k is not None:
        # Caller-chosen blocks (tests exercising multi-tile paths; tuning).
        block_q = pick_block(S, block_q or 1024)
        block_k = pick_block(T, block_k or 512)
    else:
        # Large kv blocks amortize the online-softmax m/l bookkeeping (each kv
        # revisit is ~5 VPU passes over [G*block_q, 128]); the q block then
        # shrinks to keep the fp32 scores tile [group, block_q, block_k] in
        # VMEM.  Swept on v5e at the Qwen2-7B prefill shape
        # (dev/exp_causal.py): (448, 1024) = 2.27 ms/layer vs 3.17 for the
        # per-head streaming layout and 4.4 for small-bk grouped configs.
        block_k = _round_up(min(T, 1024), 64)
        bq_budget = (13 << 20) // (4 * group * block_k)
        while bq_budget < 128 and block_k > 128:
            # MQA-like groups: shrink kv blocks until a >=128 q block fits.
            block_k = max(128, (block_k - 128) // 64 * 64)
            bq_budget = (13 << 20) // (4 * group * block_k)
        block_q = min(pick_block(S, 1024), max(128, bq_budget // 64 * 64))
    s_pad = _round_up(S, block_q)
    t_pad = _round_up(T, block_k)

    if s_pad != S:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    if t_pad != T:
        pad_t = ((0, 0), (0, 0), (0, t_pad - T), (0, 0))
        k = jnp.pad(k, pad_t)
        v = jnp.pad(v, pad_t)

    if segment_ids is not None:
        if S != T:
            raise ValueError("segment_ids packing requires self-attention (S == T)")
        if kv_len is None:
            kv_len = jnp.sum(segment_ids >= 0, axis=1).astype(jnp.int32)
    if q_offset is None:
        q_offset = jnp.full((B,), T - S, jnp.int32)
    else:
        q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    if kv_len is None:
        kv_len = jnp.full((B,), T, jnp.int32)
    else:
        kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))
    scalars = jnp.stack([q_offset, kv_len])  # [2, B]

    if softmax not in ("auto", "anchored", "online"):
        raise ValueError(f"unknown softmax mode: {softmax!r}")
    anchored = causal and segment_ids is None and softmax != "online"
    if softmax == "anchored" and not anchored:
        raise ValueError("anchored softmax requires causal attention without segment_ids")

    num_q_blocks = s_pad // block_q
    num_kv_blocks = t_pad // block_k

    seg_args = ()
    seg_in_specs = []
    if segment_ids is not None:
        seg = jnp.asarray(segment_ids, jnp.int32)
        # q and kv tilings may pad the sequence differently (block_q !=
        # block_k); pad a copy to each extent.
        seg_q = jnp.pad(seg, ((0, 0), (0, s_pad - S)), constant_values=-1)
        seg_k = jnp.pad(seg, ((0, 0), (0, t_pad - S)), constant_values=-1)
        # Per-block segment ranges (pads excluded via ±sentinels) → the
        # contiguous kv-block window each q block can touch.
        qmin = jnp.where(seg_q >= 0, seg_q, 2**30).reshape(B, num_q_blocks, block_q).min(-1)
        qmax = jnp.where(seg_q >= 0, seg_q, -(2**30)).reshape(B, num_q_blocks, block_q).max(-1)
        kmin = jnp.where(seg_k >= 0, seg_k, 2**30).reshape(B, num_kv_blocks, block_k).min(-1)
        kmax = jnp.where(seg_k >= 0, seg_k, -(2**30)).reshape(B, num_kv_blocks, block_k).max(-1)
        overlap = (kmax[:, None, :] >= qmin[:, :, None]) & (
            kmin[:, None, :] <= qmax[:, :, None]
        )  # [B, nqb, nkb]
        any_overlap = overlap.any(axis=2)
        lo = jnp.argmax(overlap, axis=2).astype(jnp.int32)
        hi = (num_kv_blocks - 1 - jnp.argmax(overlap[:, :, ::-1], axis=2)).astype(jnp.int32)
        hi = jnp.where(any_overlap, hi, -1)
        seg_blocks = jnp.stack([lo, hi])  # [2, B, nqb]
        # [B, pad, 1] — 1-lane layout satisfies Mosaic tiling
        seg_args = (seg_q[:, :, None], seg_k[:, :, None])

    def q_index(b, kvh, qi, ki, *scal):
        return (b, kvh, 0, qi, 0)

    def kv_index(b, kvh, qi, ki, *scal):
        # Clamp the kv tile to the tile range this (b, qi) actually needs, so
        # skipped tiles re-fetch an already-needed tile instead of streaming
        # dead data from HBM.
        scalars = scal[0]
        last_len = jnp.maximum(pl.cdiv(scalars[1, b], block_k) - 1, 0)
        if causal:
            row_max = qi * block_q + block_q - 1 + scalars[0, b]
            last_causal = jax.lax.div(row_max, block_k)
            last = jnp.minimum(last_len, last_causal)
        else:
            last = last_len
        if anchored:
            # descending walk: grid step 0 fetches the diagonal (anchor) tile
            ki = jnp.maximum(last - ki, 0)
        else:
            ki = jnp.minimum(ki, last)
        if len(scal) > 1:  # segment mode: window to the needed kv-block range
            segb = scal[1]
            lo = segb[0, b, qi]
            hi = jnp.maximum(segb[1, b, qi], lo)
            ki = jnp.clip(ki, lo, jnp.minimum(hi, jnp.maximum(last, lo)))
        return (b, kvh, ki, 0)

    def sq_index(b, kvh, qi, ki, *scal):
        return (b, qi, 0)

    def sk_index(b, kvh, qi, ki, *scal):
        idx = kv_index(b, kvh, qi, ki, *scal)
        return (b, idx[2], 0)

    kv_block = (None, None, block_k, D)

    if segment_ids is not None:
        seg_in_specs = [
            pl.BlockSpec((None, block_q, 1), sq_index),
            pl.BlockSpec((None, block_k, 1), sk_index),
        ]

    # One grid step covers a whole GQA group: the q heads sharing a kv head
    # ride the same kernel invocation as a [group, block_q, D] stack, so each
    # kv tile is streamed from HBM once per group instead of once per q head
    # (28-head/4-kv-head Qwen2: 7x less kv traffic — the prefill kernel is
    # DMA-bound without this).
    q = q.reshape(B, KVH, group, s_pad, D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if segment_ids is None else 2,
        grid=(B, KVH, num_q_blocks, num_kv_blocks),
        in_specs=[
            pl.BlockSpec((None, None, group, block_q, D), q_index),
            pl.BlockSpec(kv_block, kv_index),
            pl.BlockSpec(kv_block, kv_index),
        ]
        + seg_in_specs,
        out_specs=pl.BlockSpec((None, None, group, block_q, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((group, block_q, 128), jnp.float32),
            pltpu.VMEM((group, block_q, 128), jnp.float32),
            pltpu.VMEM((group, block_q, D), jnp.float32),
        ],
    )

    # Fold sm_scale and the exp→exp2 domain change into q: one pass over q
    # instead of one pass per scores tile.
    q = q * jnp.asarray(D**-0.5 * _LOG2E, q.dtype)

    kernel = functools.partial(
        _attn_kernel if segment_ids is None else _attn_kernel_seg,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        anchored=anchored,
    )

    prefetch = (scalars,) if segment_ids is None else (scalars, seg_blocks)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, group, s_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*prefetch, q, k, v, *seg_args)

    return out.reshape(B, H, s_pad, D)[:, :, :S].transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Packed-layout ViT attention (non-causal, single kv block, full softmax)
# ---------------------------------------------------------------------------


_LOG2E = 1.4426950408889634


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, *, valid_len: int, scale: Optional[float]):
    """One (batch, head): full-row softmax attention with the entire sequence
    in VMEM.  Refs are [1, SP, D] lane slices of the packed [B, SP, H*D]
    arrays.

    The softmax runs in the exp2 domain (log2(e) folded into the q prescale;
    ``scale=None`` means the caller already folded ``head_dim**-0.5 * log2(e)``
    into q, e.g. into the qk-norm epilogue where the multiply is free).  Row
    sums run on the VPU: measured at the ViT shape (SP≈1k) the cross-lane
    reduce beats the p @ ones MXU dot, which costs a third PV-sized matmul
    (dev/exp_attn.py: 0.66 vs 0.84 ms/layer)."""
    sp = q_ref.shape[1]
    if scale is not None:
        qv = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    else:
        qv = q_ref[0]
    s = jax.lax.dot_general(
        qv, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [SP, SP]
    if valid_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l_inv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o * l_inv).astype(o_ref.dtype)


# VMEM budget for the fp32 score matrix (plus q/k/v/o blocks); SP beyond this
# must use the blocked online-softmax kernel above.
_PACKED_MAX_SEQ = 1600


def packed_seq_supported(seq_len: int, head_dim: int) -> bool:
    return head_dim % 128 == 0 and seq_len <= _PACKED_MAX_SEQ


def packed_prescale(head_dim: int) -> float:
    """Fold this into q before calling packed_self_attention(prescaled=True):
    the softmax scale and the exp→exp2 domain change in one multiply."""
    return head_dim**-0.5 * _LOG2E


def _packed_qkv_norm_kernel(
    qkv_q_ref, qkv_k_ref, qkv_v_ref, rq_ref, rk_ref, gq_ref, gk_ref, o_ref,
    *, valid_len: int
):
    """One (batch, head) of :func:`packed_qkv_norm_attention`: the q/k refs are
    lane slices of the *unsplit* qkv array; the flattened-axis RMS statistics
    arrive precomputed ([SP, 1] rstd columns) and the norm is applied on the
    fly — normalized q/k never round-trip HBM."""
    sp = qkv_q_ref.shape[1]
    rq = rq_ref[0]  # [SP, 1] fp32
    rk = rk_ref[0]
    q = (qkv_q_ref[0].astype(jnp.float32) * rq * gq_ref[0].astype(jnp.float32)).astype(
        qkv_q_ref.dtype
    )
    k = (qkv_k_ref[0].astype(jnp.float32) * rk * gk_ref[0].astype(jnp.float32)).astype(
        qkv_k_ref.dtype
    )
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if valid_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l_inv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(
        p.astype(qkv_v_ref.dtype), qkv_v_ref[0], preferred_element_type=jnp.float32
    )
    o_ref[0] = (o * l_inv).astype(o_ref.dtype)


def packed_qkv_norm_attention(
    qkv: jax.Array,
    *,
    num_heads: int,
    q_gamma: jax.Array,
    k_gamma: jax.Array,
    eps: float,
    valid_len: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """qk-RMSNorm + packed non-causal self-attention over unsplit qkv.

    The InternViT-6B attention path (reference: qk_normalization at
    modeling_intern_vit.py:143-146 followed by the flash shim).  The RMS
    reduction runs over the *flattened* (heads × head_dim) axis, so it cannot
    live per-head inside the kernel — but only the [B, SP, 1] rstd statistics
    need materializing.  The expensive part (applying the norm to q and k) is
    folded into the attention kernel per head-slice, which removes the
    normalized-q/k HBM round trip and the v copy that the split-then-norm
    path pays (~130 MB/layer at the 5-tile 6B shape; dev/exp_attn_qknorm.py).

    qkv: [B, SP, 3*H*D] as produced by the fused qkv matmul; q_gamma must
    already include ``packed_prescale(head_dim)`` (softmax scale × log2 e).
    Returns [B, SP, H*D]; rows ≥ valid_len are garbage, as in
    :func:`packed_self_attention`.
    """
    B, SP, HD3 = qkv.shape
    HD = HD3 // 3
    D = HD // num_heads
    if D % 128 != 0:
        raise ValueError(f"packed attention requires head_dim % 128 == 0, got {D}")
    if SP % 8 != 0 or SP > _PACKED_MAX_SEQ:
        raise ValueError(f"padded seq len {SP} unsupported (mult of 8, <= {_PACKED_MAX_SEQ})")
    valid_len = SP if valid_len is None else valid_len

    qf = qkv[..., :HD].astype(jnp.float32)
    kf = qkv[..., HD : 2 * HD].astype(jnp.float32)
    rq = jax.lax.rsqrt(jnp.mean(qf * qf, axis=-1, keepdims=True) + eps)  # [B, SP, 1]
    rk = jax.lax.rsqrt(jnp.mean(kf * kf, axis=-1, keepdims=True) + eps)
    gq = q_gamma.astype(jnp.float32)[None]  # [1, H*D]
    gk = k_gamma.astype(jnp.float32)[None]

    H = num_heads
    kernel = functools.partial(_packed_qkv_norm_kernel, valid_len=valid_len)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h)),          # q slice
            pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, H + h)),      # k slice
            pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, 2 * H + h)),  # v slice
            pl.BlockSpec((1, SP, 1), lambda b, h: (b, 0, 0)),          # rstd_q
            pl.BlockSpec((1, SP, 1), lambda b, h: (b, 0, 0)),          # rstd_k
            pl.BlockSpec((1, D), lambda b, h: (0, h)),                 # gamma_q slice
            pl.BlockSpec((1, D), lambda b, h: (0, h)),                 # gamma_k slice
        ],
        out_specs=pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, SP, HD), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, rq, rk, gq, gk)


def packed_self_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int,
    valid_len: Optional[int] = None,
    prescaled: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Non-causal self-attention over packed head-layout activations.

    The ViT fast path (reference hot loop: intern_vit flash shim,
    intern_vit_6b/flash_attention.py:51-73).  q/k/v stay in the layout the qkv
    matmul produces — [B, SP, H*D] with heads as 128-wide lane slices — so no
    transpose/reshape materializes between the matmul and the kernel.  Each
    grid step (b, h) holds the whole (padded) sequence in VMEM and runs a
    single full-row softmax: at ViT scale (S≈1k) this beats online-softmax
    tiling because the QK^T/PV matmuls (K=D thin contractions) dominate and
    tile-level revisits of the m/l statistics only add VPU passes.

    Args:
      q, k, v: [B, SP, H*D]; SP must be a multiple of 8 (pad before calling;
        run the whole encoder stack padded — pad rows are masked here and
        row-local everywhere else).
      num_heads: H; head_dim = (H*D)/H must be a multiple of 128.
      valid_len: true sequence length; kv columns ≥ valid_len are masked.
        Output rows ≥ valid_len are garbage (slice them off at the end).
      prescaled: the caller already multiplied q by ``packed_prescale(D)``
        (softmax scale × log2(e)); skips the in-kernel prescale pass.

    Returns [B, SP, H*D] in q.dtype.
    """
    B, SP, HD = q.shape
    D = HD // num_heads
    if D % 128 != 0:
        raise ValueError(f"packed_self_attention requires head_dim % 128 == 0, got {D}")
    if SP % 8 != 0:
        raise ValueError(f"padded seq len must be a multiple of 8, got {SP}")
    if SP > _PACKED_MAX_SEQ:
        raise ValueError(f"seq len {SP} exceeds the VMEM budget; use flash_attention")
    valid_len = SP if valid_len is None else valid_len

    kernel = functools.partial(
        _packed_kernel, valid_len=valid_len, scale=None if prescaled else D**-0.5
    )
    return pl.pallas_call(
        kernel,
        grid=(B, num_heads),
        in_specs=[pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h))] * 3,
        out_specs=pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, SP, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)
