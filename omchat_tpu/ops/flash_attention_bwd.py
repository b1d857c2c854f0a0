"""Trainable Pallas flash attention: forward with residuals + custom-VJP backward.

Forward saves (out, lse) per row; backward runs two kernels over the same
tiling as the forward (guide pattern: dKV iterates q tiles per kv tile, dQ
iterates kv tiles per q tile):

    di = rowsum(dO ∘ O)
    P  = exp(S − lse)
    dV = Pᵀ dO
    dS = P ∘ (dP − di),   dP = dO Vᵀ
    dQ = dS K · scale,    dK = dSᵀ Q · scale

GQA: all q heads sharing a kv head ride one grid step as a stacked
[group, block_q, D] block (same layout as the inference kernel), so each
kv tile streams from HBM once per group instead of once per q head, and the
dKV kernel accumulates directly into per-kv-head dK/dV (no per-q-head
buffers or group-sum postpass).  Blocks here are multiples of 128 — training
shapes are bucketed — because the lse/di rows are tiled on their last dim.

Multi-document packing (``segment_ids``, the flash-attn varlen cu_seqlens
contract — reference intern_vit_6b/flash_attention.py:51-73 wraps the CUDA
varlen kernel): all three kernels take per-block segment-id tiles plus
scalar-prefetched per-block windows (the contiguous range of opposing blocks
a tile's segments can overlap), so cross-document tiles are *skipped* — the
index maps clamp the fetch into the window, same design as the forward-only
kernel in flash_attention.py.  This is what makes packed SFT differentiable
on the Pallas path (previously forward-only; the grad path fell back to XLA
masked attention).

Exposed as ``attention(..., impl="pallas_vjp")``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from omchat_tpu.ops.flash_attention import DEFAULT_MASK_VALUE, _round_up


def _mask_for(block_q, block_k, qi, ki, q_off, kv_len, causal, sq=None, sk=None):
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ki * block_k
    mask = col_ids < kv_len
    if causal:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q + q_off
        mask = mask & (col_ids <= row_ids)
    if sq is not None:
        # multi-document packing: attend only within the own segment
        mask = mask & (sq == sk.reshape(1, block_k))
    return mask


def _seg_tables(segment_ids, s_pad, t_pad, block_q, block_k):
    """Per-block segment-id tiles + block windows for tile skipping.

    Returns (seg_q [B, s_pad, 1], seg_k [B, t_pad, 1],
             segb_q [2, B, nq] — the kv-block range each q block can touch,
             segb_k [2, B, nk] — the q-block range each kv block can touch);
    hi = -1 marks an empty window (all-padding block).  Padding rows carry
    id −1 and are excluded from the ranges via ±sentinels."""
    B, S = segment_ids.shape
    seg = jnp.asarray(segment_ids, jnp.int32)
    seg_q = jnp.pad(seg, ((0, 0), (0, s_pad - S)), constant_values=-1)
    seg_k = jnp.pad(seg, ((0, 0), (0, t_pad - S)), constant_values=-1)
    nq, nk = s_pad // block_q, t_pad // block_k
    qmin = jnp.where(seg_q >= 0, seg_q, 2**30).reshape(B, nq, block_q).min(-1)
    qmax = jnp.where(seg_q >= 0, seg_q, -(2**30)).reshape(B, nq, block_q).max(-1)
    kmin = jnp.where(seg_k >= 0, seg_k, 2**30).reshape(B, nk, block_k).min(-1)
    kmax = jnp.where(seg_k >= 0, seg_k, -(2**30)).reshape(B, nk, block_k).max(-1)
    ovl = (kmax[:, None, :] >= qmin[:, :, None]) & (kmin[:, None, :] <= qmax[:, :, None])

    def _win(o, n):  # o: [B, rows, n] → [2, B, rows]
        any_o = o.any(-1)
        lo = jnp.argmax(o, -1).astype(jnp.int32)
        hi = (n - 1 - jnp.argmax(o[..., ::-1], -1)).astype(jnp.int32)
        return jnp.stack([lo, jnp.where(any_o, hi, -1)])

    return seg_q[:, :, None], seg_k[:, :, None], _win(ovl, nk), _win(ovl.swapaxes(1, 2), nq)


# ---------------------------------------------------------------------------
# Forward with residuals
# ---------------------------------------------------------------------------


def _fwd_kernel(
    scalars_ref, segb_ref, q_ref, k_ref, v_ref, sq_ref, sk_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, causal, block_q, block_k, num_kv_blocks,
):
    # q/o/lse refs are [G, block_q, *] — the whole GQA group per grid step;
    # kv refs [block_k, D] are fetched once and reused across the group.
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    g = q_ref.shape[0]

    @pl.when(ki == 0)
    def _init():
        m_scratch[...] = jnp.full(m_scratch.shape, -jnp.inf, jnp.float32)
        l_scratch[...] = jnp.zeros(l_scratch.shape, jnp.float32)
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q_off = scalars_ref[0, b]
    kv_len = scalars_ref[1, b]
    row_max = qi * block_q + block_q - 1 + (q_off if causal else 0)
    needed = ((ki * block_k) < kv_len) & ((ki * block_k) <= row_max) if causal else ((ki * block_k) < kv_len)
    if segb_ref is not None:
        # packed mode: kv tiles outside this q block's segment window are dead
        needed &= (ki >= segb_ref[0, b, qi]) & (ki <= segb_ref[1, b, qi])

    @pl.when(needed)
    def _run():
        sq = sq_ref[...] if sq_ref is not None else None
        sk = sk_ref[...] if sk_ref is not None else None
        mask = _mask_for(block_q, block_k, qi, ki, q_off, kv_len, causal, sq, sk)
        k = k_ref[...]
        v = v_ref[...]
        for gi in range(g):
            s = jax.lax.dot_general(q_ref[gi], k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            m_prev, l_prev = m_scratch[gi], l_scratch[gi]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_scratch[gi] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_scratch[gi] = m_next
            o_curr = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            acc_scratch[gi] = acc_scratch[gi] * alpha[:, : acc_scratch.shape[2]] + o_curr

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        for gi in range(g):
            l = l_scratch[gi][:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[gi] = (acc_scratch[gi] * l_inv).astype(o_ref.dtype)
            m = m_scratch[gi][:, :1]
            lse = jnp.where(l == 0.0, -jnp.inf, m + jnp.log(l))
            lse_ref[gi] = jnp.broadcast_to(lse, lse_ref.shape[1:])


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    scalars_ref, segb_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, sq_ref, sk_ref, dq_ref,
    acc_scratch,
    *, causal, block_q, block_k, num_kv_blocks,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)

    g = q_ref.shape[0]

    @pl.when(ki == 0)
    def _init():
        acc_scratch[...] = jnp.zeros(acc_scratch.shape, jnp.float32)

    q_off = scalars_ref[0, b]
    kv_len = scalars_ref[1, b]
    row_max = qi * block_q + block_q - 1 + (q_off if causal else 0)
    needed = ((ki * block_k) < kv_len) & ((ki * block_k) <= row_max) if causal else ((ki * block_k) < kv_len)
    if segb_ref is not None:
        needed &= (ki >= segb_ref[0, b, qi]) & (ki <= segb_ref[1, b, qi])

    @pl.when(needed)
    def _run():
        sq = sq_ref[...] if sq_ref is not None else None
        sk = sk_ref[...] if sk_ref is not None else None
        mask = _mask_for(block_q, block_k, qi, ki, q_off, kv_len, causal, sq, sk)
        k = k_ref[...]
        v = v_ref[...]
        for gi in range(g):
            s = jax.lax.dot_general(q_ref[gi], k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            lse = lse_ref[gi][:, :1]
            p = jnp.where(mask & jnp.isfinite(lse), jnp.exp(s - jnp.where(jnp.isfinite(lse), lse, 0.0)), 0.0)
            dp = jax.lax.dot_general(
                do_ref[gi], v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - di_ref[gi][:, :1])
            acc_scratch[gi] += jax.lax.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        dq_ref[...] = acc_scratch[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    scalars_ref, segb_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, sq_ref, sk_ref, dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, causal, block_q, block_k, num_q_blocks,
):
    b = pl.program_id(0)
    ki = pl.program_id(2)
    qi = pl.program_id(3)

    g = q_ref.shape[0]

    @pl.when(qi == 0)
    def _init():
        dk_scratch[...] = jnp.zeros(dk_scratch.shape, jnp.float32)
        dv_scratch[...] = jnp.zeros(dv_scratch.shape, jnp.float32)

    q_off = scalars_ref[0, b]
    kv_len = scalars_ref[1, b]
    # this kv tile is dead past the valid length; a q tile is dead (causal)
    # when even its last row precedes the kv tile start
    row_max = qi * block_q + block_q - 1 + (q_off if causal else 0)
    needed = ((ki * block_k) < kv_len) & ((ki * block_k) <= row_max) if causal else ((ki * block_k) < kv_len)
    if segb_ref is not None:
        # packed mode: here the window is the q-block range per KV block
        needed &= (qi >= segb_ref[0, b, ki]) & (qi <= segb_ref[1, b, ki])

    @pl.when(needed)
    def _run():
        # The group's contributions accumulate straight into per-kv-head
        # dK/dV — no per-q-head buffers or group-sum postpass.
        sq = sq_ref[...] if sq_ref is not None else None
        sk = sk_ref[...] if sk_ref is not None else None
        mask = _mask_for(block_q, block_k, qi, ki, q_off, kv_len, causal, sq, sk)
        k = k_ref[...]
        v = v_ref[...]
        for gi in range(g):
            s = jax.lax.dot_general(q_ref[gi], k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            lse = lse_ref[gi][:, :1]
            p = jnp.where(mask & jnp.isfinite(lse), jnp.exp(s - jnp.where(jnp.isfinite(lse), lse, 0.0)), 0.0)
            # dV += P^T dO
            dv_scratch[...] += jax.lax.dot_general(
                p.astype(do_ref.dtype), do_ref[gi], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dp = jax.lax.dot_general(
                do_ref[gi], v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - di_ref[gi][:, :1])
            # dK += dS^T Q
            dk_scratch[...] += jax.lax.dot_general(
                ds.astype(q_ref.dtype), q_ref[gi], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

    @pl.when(qi == num_q_blocks - 1)
    def _store():
        dk_ref[...] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_scratch[...].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host wrappers
# ---------------------------------------------------------------------------


def _prep(q, k, v, q_offset, kv_len, block_q, block_k):
    """Common padding/layout: head-major, 128-multiple blocks."""
    B, S, H, D = q.shape
    T, KVH = k.shape[1], k.shape[2]
    group = H // KVH
    qh = q.transpose(0, 2, 1, 3)
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)

    block_q = min(block_q, _round_up(S, 128))
    block_k = min(block_k, _round_up(T, 128))
    # The whole GQA group rides one grid step ([group, block_q, *] q/do/lse/di
    # blocks + group-sized scratch); shrink block_q until the working set fits
    # scoped VMEM (double-buffered blocks + scratch, empirically ≲7MB of
    # group-proportional state on v5e at bf16 — the budget scales inversely
    # with the activation itemsize: f32 inputs double the block/stack
    # footprint and overflow the 16MB scoped limit at the bf16-tuned blocks
    # (measured: fwd at group=5, f32, 512x512 needs 16.64MB).  If block_q
    # bottoms out (MQA-sized groups), slice the group: each grid step carries
    # g_eff heads, with group//g_eff grid steps per kv head.
    budget = (7 << 20) * 2 // jnp.dtype(q.dtype).itemsize

    def _state(g, bq):
        return g * bq * (3 * 128 + 2 * D) * 4

    while _state(group, block_q) > budget and block_q > 128:
        block_q -= 128
    g_eff = group
    while g_eff > 1 and _state(g_eff, block_q) > budget:
        g_eff = max(d for d in range(1, g_eff) if group % d == 0)
    s_pad = _round_up(S, block_q)
    t_pad = _round_up(T, block_k)
    if s_pad != S:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    if t_pad != T:
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))

    if q_offset is None:
        q_offset = jnp.full((B,), T - S, jnp.int32)
    else:
        q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    if kv_len is None:
        kv_len = jnp.full((B,), T, jnp.int32)
    else:
        kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))
    scalars = jnp.stack([q_offset, kv_len])
    return qh, kh, vh, scalars, block_q, block_k, s_pad, t_pad, g_eff


def _fwd_plain_kernel(scalars, q, k, v, o, lse, m, l, acc, **kw):
    _fwd_kernel(scalars, None, q, k, v, None, None, o, lse, m, l, acc, **kw)


def _fwd_seg_kernel(scalars, segb, q, k, v, sq, sk, o, lse, m, l, acc, **kw):
    _fwd_kernel(scalars, segb, q, k, v, sq, sk, o, lse, m, l, acc, **kw)


def _seg_kv_window(segb, b, qi, ki):
    """Clamp a kv-block fetch into the q block's window — identity whenever the
    tile is needed, and a re-fetch of an already-needed tile otherwise (no dead
    HBM streaming for skipped cross-document tiles)."""
    lo = segb[0, b, qi]
    hi = jnp.maximum(segb[1, b, qi], lo)
    return jnp.clip(ki, lo, hi)


def _fwd(q, k, v, causal, q_offset, kv_len, block_q, block_k, interpret, segment_ids=None):
    B, S, H, D = q.shape
    if segment_ids is not None and kv_len is None:
        kv_len = jnp.sum(segment_ids >= 0, axis=1).astype(jnp.int32)
    qh, kh, vh, scalars, block_q, block_k, s_pad, t_pad, group = _prep(
        q * jnp.asarray(D**-0.5, q.dtype), k, v, q_offset, kv_len, block_q, block_k
    )
    nq, nk = s_pad // block_q, t_pad // block_k
    qh = qh.reshape(B, H // group, group, s_pad, D)
    # group may be a slice (g_eff) of the full GQA group (VMEM limit, MQA);
    # kv_div grid steps then share each kv head.
    kv_div = (H // k.shape[2]) // group

    def q_index(b, sb, qi, ki, *scal):
        return (b, sb, 0, qi, 0)

    def kv_index(b, sb, qi, ki, *scal):
        if len(scal) > 1:  # packed mode: window the fetch to the segment range
            ki = _seg_kv_window(scal[1], b, qi, ki)
        return (b, sb // kv_div, ki, 0)

    seg_in_specs, seg_args, prefetch = [], (), (scalars,)
    if segment_ids is not None:
        seg_q, seg_k, segb_q, _ = _seg_tables(segment_ids, s_pad, t_pad, block_q, block_k)

        def sq_index(b, sb, qi, ki, *scal):
            return (b, qi, 0)

        def sk_index(b, sb, qi, ki, *scal):
            return (b, _seg_kv_window(scal[1], b, qi, ki), 0)

        seg_in_specs = [
            pl.BlockSpec((None, block_q, 1), sq_index),
            pl.BlockSpec((None, block_k, 1), sk_index),
        ]
        seg_args = (seg_q, seg_k)
        prefetch = (scalars, segb_q)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(B, H // group, nq, nk),
        in_specs=[
            pl.BlockSpec((None, None, group, block_q, D), q_index),
            pl.BlockSpec((None, None, block_k, D), kv_index),
            pl.BlockSpec((None, None, block_k, D), kv_index),
        ]
        + seg_in_specs,
        out_specs=[
            pl.BlockSpec((None, None, group, block_q, D), q_index),
            pl.BlockSpec((None, None, group, block_q, 128), q_index),
        ],
        scratch_shapes=[
            pltpu.VMEM((group, block_q, 128), jnp.float32),
            pltpu.VMEM((group, block_q, 128), jnp.float32),
            pltpu.VMEM((group, block_q, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _fwd_plain_kernel if segment_ids is None else _fwd_seg_kernel,
        causal=causal, block_q=block_q, block_k=block_k, num_kv_blocks=nk,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H // group, group, s_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, H // group, group, s_pad, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(*prefetch, qh, kh, vh, *seg_args)
    out = out.reshape(B, H, s_pad, D)
    lse = lse.reshape(B, H, s_pad, 128)
    return out[:, :, :S].transpose(0, 2, 1, 3), lse[:, :, :S, 0]


def _bwd_dq_plain_kernel(scalars, q, k, v, do, lse, di, dq, acc, **kw):
    _bwd_dq_kernel(scalars, None, q, k, v, do, lse, di, None, None, dq, acc, **kw)


def _bwd_dq_seg_kernel(scalars, segb, q, k, v, do, lse, di, sq, sk, dq, acc, **kw):
    _bwd_dq_kernel(scalars, segb, q, k, v, do, lse, di, sq, sk, dq, acc, **kw)


def _bwd_dkv_plain_kernel(scalars, q, k, v, do, lse, di, dk, dv, dks, dvs, **kw):
    _bwd_dkv_kernel(scalars, None, q, k, v, do, lse, di, None, None, dk, dv, dks, dvs, **kw)


def _bwd_dkv_seg_kernel(scalars, segb, q, k, v, do, lse, di, sq, sk, dk, dv, dks, dvs, **kw):
    _bwd_dkv_kernel(scalars, segb, q, k, v, do, lse, di, sq, sk, dk, dv, dks, dvs, **kw)


def _bwd(causal, block_q, block_k, interpret, res, g):
    q, k, v, out, lse, q_offset, kv_len, segment_ids = res
    B, S, H, D = q.shape
    T, KVH = k.shape[1], k.shape[2]
    scale = D**-0.5
    if segment_ids is not None and kv_len is None:
        kv_len = jnp.sum(segment_ids >= 0, axis=1).astype(jnp.int32)

    # di = rowsum(dO * O)  [B, S, H] → head-major padded [B, H, S_pad, 128]
    di = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # [B, S, H]

    qh, kh, vh, scalars, block_q, block_k, s_pad, t_pad, group = _prep(
        q * jnp.asarray(scale, q.dtype), k, v, q_offset, kv_len, block_q, block_k
    )
    nq, nk = s_pad // block_q, t_pad // block_k
    seg_q = seg_k = segb_q = segb_k = None
    if segment_ids is not None:
        seg_q, seg_k, segb_q, segb_k = _seg_tables(segment_ids, s_pad, t_pad, block_q, block_k)

    doh = g.transpose(0, 2, 1, 3)
    if s_pad != S:
        doh = jnp.pad(doh, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, s_pad - S)), constant_values=-jnp.inf)
        di = jnp.pad(di.transpose(0, 2, 1), ((0, 0), (0, 0), (0, s_pad - S)))
    else:
        di = di.transpose(0, 2, 1)
    n_super = H // group  # group may be a g_eff slice of the full GQA group
    kv_div = n_super // KVH
    lse_b = jnp.broadcast_to(lse[..., None], (B, H, s_pad, 128)).reshape(B, n_super, group, s_pad, 128)
    di_b = jnp.broadcast_to(di[..., None], (B, H, s_pad, 128)).reshape(B, n_super, group, s_pad, 128)
    qh = qh.reshape(B, n_super, group, s_pad, D)
    doh = doh.reshape(B, n_super, group, s_pad, D)

    def q_index(b, sb, qi, ki, *scal):
        return (b, sb, 0, qi, 0)

    def kv_index(b, sb, qi, ki, *scal):
        if len(scal) > 1:
            ki = _seg_kv_window(scal[1], b, qi, ki)
        return (b, sb // kv_div, ki, 0)

    seg_in_specs, seg_args, prefetch = [], (), (scalars,)
    if segment_ids is not None:

        def sq_index(b, sb, qi, ki, *scal):
            return (b, qi, 0)

        def sk_index(b, sb, qi, ki, *scal):
            return (b, _seg_kv_window(scal[1], b, qi, ki), 0)

        seg_in_specs = [
            pl.BlockSpec((None, block_q, 1), sq_index),
            pl.BlockSpec((None, block_k, 1), sk_index),
        ]
        seg_args = (seg_q, seg_k)
        prefetch = (scalars, segb_q)

    # ---- dQ ----
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(B, n_super, nq, nk),
        in_specs=[
            pl.BlockSpec((None, None, group, block_q, D), q_index),
            pl.BlockSpec((None, None, block_k, D), kv_index),
            pl.BlockSpec((None, None, block_k, D), kv_index),
            pl.BlockSpec((None, None, group, block_q, D), q_index),
            pl.BlockSpec((None, None, group, block_q, 128), q_index),
            pl.BlockSpec((None, None, group, block_q, 128), q_index),
        ]
        + seg_in_specs,
        out_specs=pl.BlockSpec((None, None, group, block_q, D), q_index),
        scratch_shapes=[pltpu.VMEM((group, block_q, D), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_plain_kernel if segment_ids is None else _bwd_dq_seg_kernel,
            causal=causal, block_q=block_q, block_k=block_k, num_kv_blocks=nk,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_super, group, s_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(*prefetch, qh, kh, vh, doh, lse_b, di_b, *seg_args)
    dq = dq.reshape(B, H, s_pad, D)
    dq = (dq[:, :, :S] * scale).transpose(0, 2, 1, 3).astype(q.dtype)

    # ---- dK, dV (kv tiles outer / q tiles inner; the group's contributions
    # accumulate in-kernel; outputs are per super-block — per kv head when the
    # full group fits one step (kv_div == 1), group-summed outside otherwise) ----
    def _seg_q_window(segb, b, ki, qi):
        lo = segb[0, b, ki]
        hi = jnp.maximum(segb[1, b, ki], lo)
        return jnp.clip(qi, lo, hi)

    def q_index2(b, sb, ki, qi, *scal):
        if len(scal) > 1:  # packed mode: window q fetches to the kv block's range
            qi = _seg_q_window(scal[1], b, ki, qi)
        return (b, sb, 0, qi, 0)

    def kv_index2(b, sb, ki, qi, *scal):
        return (b, sb // kv_div, ki, 0)

    def dkv_index2(b, sb, ki, qi, *scal):
        return (b, sb, ki, 0)

    seg_in_specs2, prefetch2 = [], (scalars,)
    if segment_ids is not None:

        def sq_index2(b, sb, ki, qi, *scal):
            return (b, _seg_q_window(scal[1], b, ki, qi), 0)

        def sk_index2(b, sb, ki, qi, *scal):
            return (b, ki, 0)

        seg_in_specs2 = [
            pl.BlockSpec((None, block_q, 1), sq_index2),
            pl.BlockSpec((None, block_k, 1), sk_index2),
        ]
        prefetch2 = (scalars, segb_k)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch2),
        grid=(B, n_super, nk, nq),
        in_specs=[
            pl.BlockSpec((None, None, group, block_q, D), q_index2),
            pl.BlockSpec((None, None, block_k, D), kv_index2),
            pl.BlockSpec((None, None, block_k, D), kv_index2),
            pl.BlockSpec((None, None, group, block_q, D), q_index2),
            pl.BlockSpec((None, None, group, block_q, 128), q_index2),
            pl.BlockSpec((None, None, group, block_q, 128), q_index2),
        ]
        + seg_in_specs2,
        out_specs=[
            pl.BlockSpec((None, None, block_k, D), dkv_index2),
            pl.BlockSpec((None, None, block_k, D), dkv_index2),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )
    dk_h, dv_h = pl.pallas_call(
        functools.partial(
            _bwd_dkv_plain_kernel if segment_ids is None else _bwd_dkv_seg_kernel,
            causal=causal, block_q=block_q, block_k=block_k, num_q_blocks=nq,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, n_super, t_pad, D), q.dtype),
            jax.ShapeDtypeStruct((B, n_super, t_pad, D), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(*prefetch2, qh, kh, vh, doh, lse_b, di_b, *seg_args)

    # undo padding + layout.  dK needs no extra scale: the kernel's q_ref is
    # already q·scale.  With a sliced group, sum the kv_div super-block
    # contributions per kv head.
    if kv_div > 1:
        dk_h = dk_h.reshape(B, KVH, kv_div, t_pad, D).sum(axis=2).astype(q.dtype)
        dv_h = dv_h.reshape(B, KVH, kv_div, t_pad, D).sum(axis=2).astype(q.dtype)
    dk = dk_h[:, :, :T].transpose(0, 2, 1, 3).astype(k.dtype)
    dv = dv_h[:, :, :T].transpose(0, 2, 1, 3).astype(v.dtype)
    return dq, dk, dv, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_trainable(
    q,
    k,
    v,
    causal: bool = True,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
    segment_ids=None,
):
    """Differentiable Pallas flash attention over the full (padded) sequence —
    the training path (no KV cache, no per-batch offsets; padding rows attend
    like the XLA no-cache path, and the loss masks them).

    q: [B, S, H, D]; k/v: [B, S, KVH, D].

    ``segment_ids`` [B, S] int32 enables multi-document packing (``--pack``
    SFT): tokens attend only within their own segment, negative ids mark tail
    padding.  Padding rows get zero grads, but their *outputs* are only zero
    when the whole block is padding — a padding row sharing a block with valid
    rows sees the finite mask value uniformly and emits the mean of v (the
    loss must mask padding rows, same contract as the XLA path).  Cross-document
    tiles are skipped in all three kernels, so fwd+bwd FLOPs scale with the
    packed documents' own lengths, not the pack width.  Call positionally
    (custom_vjp forbids keyword args for differentiable operands)."""
    out, _ = _fwd(q, k, v, causal, None, None, block_q, block_k, interpret, segment_ids)
    return out


def _vjp_fwd(q, k, v, causal, block_q, block_k, interpret, segment_ids=None):
    out, lse = _fwd(q, k, v, causal, None, None, block_q, block_k, interpret, segment_ids)
    return out, (q, k, v, out, lse, None, None, segment_ids)


def _vjp_bwd(causal, block_q, block_k, interpret, res, g):
    import numpy as np

    dq, dk, dv, _, _ = _bwd(causal, block_q, block_k, interpret, res, g)
    segment_ids = res[7]
    ct_seg = None if segment_ids is None else np.zeros(segment_ids.shape, jax.dtypes.float0)
    return dq, dk, dv, ct_seg


flash_attention_trainable.defvjp(_vjp_fwd, _vjp_bwd)
