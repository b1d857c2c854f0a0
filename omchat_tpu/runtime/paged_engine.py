"""Paged continuous-batching engine — ragged KV memory for serving.

The slot engine (:mod:`omchat_tpu.runtime.batch_engine`) reserves
``max_len`` cache rows per slot; with mixed-length traffic most of that HBM
sits idle.  Here KV lives in a shared page pool ([L, P, KVH, page, D],
page-major so a page fetch is one contiguous DMA) and each request maps logical blocks to physical pages — the
ragged-paged-attention serving design, sized by *actual* tokens:

- **prefill**: short prompts run once through a contiguous scratch cache (the
  same jitted bucket programs as the single-request engine) followed by one
  jitted scatter that commits the request's K/V into freshly allocated pages;
  prompts longer than ``prefill_chunk`` stream through fixed-shape paged
  chunks — each chunk scatters its K/V into the request's pages and attends
  to the cached prefix through the page table (one compiled program per
  chunk width, no length-dependent buckets), with decode rolls interleaved
  between chunks;
- **decode** is one jitted step over all active requests: per layer, the new
  token's K/V scatter into each request's current page/offset and attention
  runs over the page pool (Pallas paged kernel on TPU, gather+dense on CPU);
- pages are allocated up front for prompt+max_new (no mid-decode OOM) and
  returned to the free list on completion.

The reference has no serving runtime at all (SURVEY.md §5); this goes beyond
the contiguous-slot engine for memory efficiency under many variable-length
requests.
"""

from __future__ import annotations

import functools
import itertools
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omchat_tpu.config import OmChatConfig
from omchat_tpu.models.qwen2 import (
    _dense_mlp,
    decoder_layer,
    embed_tokens,
    lm_head,
    quant_glue_ok,
)
from omchat_tpu.ops.norms import rms_norm
from omchat_tpu.ops.paged_attention import PageAllocator, paged_decode_attention
from omchat_tpu.ops.rope import rope_cos_sin
from omchat_tpu.ops.sampling import greedy, sample_batch


def _mlp_fn(tc, moe_impl: str):
    """Dense SwiGLU or the MoE block, per config — the paged engine serves
    both decoders through the one shared layer body
    (:func:`omchat_tpu.models.qwen2.decoder_layer`)."""
    if tc.is_moe:
        from omchat_tpu.models.qwen2_moe import moe_mlp

        return moe_mlp(tc, moe_impl)
    return _dense_mlp


@functools.partial(
    jax.jit, static_argnames=("page_size", "use_kernel"), donate_argnames=("k_pool", "v_pool")
)
def _commit_pages_jit(slot_k, slot_v, k_pool, v_pool, tables, n_pages, page_size: int,
                      use_kernel: bool = False):
    """Scatter B requests' contiguous K/V ([L, B, KVH, T, D]) into their pages
    with one batched whole-page commit.

    tables: [B, max_pages]; n_pages: [B].  T is a multiple of page_size
    (prompt buckets are).  Chunks beyond a request's valid page count land on
    the parking page (the pool's last index) — never attended, so the
    undefined duplicate-scatter resolution there is harmless.

    ``use_kernel`` (TPU) routes through the aliased Pallas whole-page commit
    (ops/paged_attention.commit_pages): the jnp scatter rematerializes the
    pool operand — ~35 ms per batched-prefill commit, 10% of the standard
    serving workload's wall (dev/exp_tick_anatomy.py round 5).
    """
    l, b, kvh, t, d = slot_k.shape
    c = t // page_size
    max_pages = tables.shape[1]
    # [L, B, KVH, T, D] -> [L, B*C, KVH, page, D] (page-major pool)
    chunks_k = (
        slot_k.reshape(l, b, kvh, c, page_size, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(l, b * c, kvh, page_size, d)
    )
    chunks_v = (
        slot_v.reshape(l, b, kvh, c, page_size, d)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(l, b * c, kvh, page_size, d)
    )
    idx = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32), (b, c))
    valid = (idx < n_pages[:, None]) & (idx < max_pages)
    parked = k_pool.shape[1] - 1
    pages = jnp.where(
        valid,
        jnp.take_along_axis(
            tables, jnp.minimum(idx, max_pages - 1), axis=1
        ),
        parked,
    ).reshape(b * c)
    if use_kernel:
        from omchat_tpu.ops.paged_attention import commit_pages

        p_total = k_pool.shape[1]
        flat_pages = (
            jnp.arange(l, dtype=jnp.int32)[:, None] * p_total + pages[None, :]
        ).reshape(-1)
        kf, vf = commit_pages(
            k_pool.reshape(l * p_total, kvh, page_size, d),
            v_pool.reshape(l * p_total, kvh, page_size, d),
            flat_pages,
            chunks_k.reshape(l * b * c, kvh, page_size, d),
            chunks_v.reshape(l * b * c, kvh, page_size, d),
        )
        return kf.reshape(k_pool.shape), vf.reshape(v_pool.shape)
    k_pool = k_pool.at[:, pages].set(chunks_k.astype(k_pool.dtype))
    v_pool = v_pool.at[:, pages].set(chunks_v.astype(v_pool.dtype))
    return k_pool, v_pool


def _decode_step_core(
    params,
    cfg: OmChatConfig,
    tokens,  # [S] int32
    lengths,  # [S] int32 valid tokens already in pages
    active,  # [S] bool
    tables,  # [S, max_pages] int32
    k_pool,  # [L, P, KVH, page, D] (page-major)
    v_pool,
    page_size: int,
    attn_impl: Optional[str] = None,
    moe_impl: str = "dense",
    *,
    kv_write: str = "auto",
    any_sampled: bool = False,
    logprobs: bool = False,
    rng_key=None,
    do_sample=None,
    temperature=None,
    top_k=None,
    top_p=None,
):
    """One decode step over all active requests against the page pool.

    The layer body is the shared :func:`~omchat_tpu.models.qwen2.decoder_layer`
    (one decoder implementation serves every engine); only ``attend`` differs —
    K/V scatter at (page, offset) plus paged attention over the pool — so the
    MoE trunk serves through ``--paged`` unchanged.

    Pool plumbing: the pools are READ-ONLY and loop-invariant through the
    layer scan (a flat ``[L*(P+1), KVH, ps, D]`` view, layer l's pages at
    ``l*(P+1) + page``); each layer emits only its new K/V rows as scan
    outputs, ONE scatter after the scan commits all layers' rows, and the
    attention kernel folds the in-flight token in as a self-column.  The two
    obvious structures both lose (dev/exp_decode_anatomy.py, round 4):
    scanning pools as xs/ys re-materializes every layer's pool slice to stack
    the updated ys (~6.7 ms of a 17.3 ms attention-stubbed step at the
    serving pool size, vs 10.6 ms pure weight stream); carrying them and
    scattering per layer makes each freshly-scattered pool a new value that
    XLA copies to feed the Pallas operand (measured 78 ms/step)."""
    tc = cfg.text
    s = tokens.shape[0]
    hd = tc.attn_head_dim

    x = embed_tokens(params["language_model"], tokens[:, None])  # [S, 1, D]
    positions = lengths[:, None]
    cos, sin = rope_cos_sin(
        positions, hd, theta=tc.rope_theta, scaling=tc.rope_scaling,
        max_position_embeddings=tc.max_position_embeddings, dtype=x.dtype,
    )
    # inactive slots hold parked tables (every entry = the reserved parking
    # page), so their writes land on scratch no request owns
    page_idx = jnp.take_along_axis(
        tables, (lengths // page_size)[:, None], axis=1
    )[:, 0]
    offsets = lengths % page_size
    mlp_fn = _mlp_fn(tc, moe_impl)

    n_layers, n_slots = k_pool.shape[0], k_pool.shape[1]  # P+1 incl. parking
    pool_shape = k_pool.shape
    kflat = k_pool.reshape(n_layers * n_slots, *pool_shape[2:])
    vflat = v_pool.reshape(n_layers * n_slots, *pool_shape[2:])

    def attend(q, k, v, st):
        loff = st  # layer_index * n_slots (flat-pool offset)
        # pools read-only here: the pool holds tokens 0..length-1; the token
        # being decoded rides the kernel's self-column and its K/V rows are
        # emitted as scan outputs, committed after the scan.
        out = paged_decode_attention(
            q, kflat, vflat, jnp.where(active, lengths, 0), tables + loff,
            impl=attn_impl, k_new=k[:, 0], v_new=v[:, 0],
        )
        return out, (st, k[:, 0], v[:, 0])

    def layer(carry, xs):
        xx = carry
        li, lp = xs
        xx, (_, k_row, v_row) = decoder_layer(
            tc, xx, lp, cos, sin, attend, mlp_fn, li * n_slots,
            quant_glue=quant_glue_ok(attn_impl),
        )
        return xx, (k_row, v_row)

    xf, (k_rows, v_rows) = jax.lax.scan(
        layer,
        x,
        (jnp.arange(n_layers, dtype=jnp.int32), params["language_model"]["layers"]),
    )  # k_rows: [L, S, KVH, D]
    # ONE commit for all layers' rows.  kv_write variants are measurement
    # modes (dev/exp_decode_anatomy.py): "none" prices the write out entirely;
    # "dus_loop" is the serialized per-row alternative.
    flat_pages = jnp.arange(n_layers, dtype=jnp.int32)[:, None] * n_slots + page_idx[None, :]
    if kv_write == "auto":
        # row-commit Pallas kernel on TPU Pallas paths (the jnp scatter
        # rematerializes the pool operand, ~7 ms/step at the serving pool
        # size — dev/exp_commit.py); the scatter is the portable fallback
        kv_write = (
            "kernel" if attn_impl in (None, "pallas", "pallas_manual")
            and jax.default_backend() == "tpu" else "scatter"
        )
    if kv_write == "kernel":
        from omchat_tpu.ops.paged_attention import commit_rows

        off_all = jnp.broadcast_to(offsets[None, :], flat_pages.shape).reshape(-1)
        kflat, vflat = commit_rows(
            kflat, vflat, flat_pages.reshape(-1), off_all,
            k_rows.reshape(n_layers * s, *k_rows.shape[2:]),
            v_rows.reshape(n_layers * s, *v_rows.shape[2:]),
        )
    elif kv_write == "scatter":
        off_b = jnp.broadcast_to(offsets[None, :], flat_pages.shape)
        kflat = kflat.at[flat_pages, :, off_b].set(k_rows.astype(kflat.dtype))
        vflat = vflat.at[flat_pages, :, off_b].set(v_rows.astype(vflat.dtype))
    elif kv_write == "dus_loop":

        def write(i, pools_):
            kpp, vpp = pools_
            li, si = i // s, i % s
            upd_k = k_rows[li, si].astype(kpp.dtype)[None, :, None]  # [1,KVH,1,D]
            upd_v = v_rows[li, si].astype(vpp.dtype)[None, :, None]
            kpp = jax.lax.dynamic_update_slice(kpp, upd_k, (flat_pages[li, si], 0, offsets[si], 0))
            vpp = jax.lax.dynamic_update_slice(vpp, upd_v, (flat_pages[li, si], 0, offsets[si], 0))
            return kpp, vpp

        kflat, vflat = jax.lax.fori_loop(0, n_layers * s, write, (kflat, vflat))
    k_pool = kflat.reshape(pool_shape)
    v_pool = vflat.reshape(pool_shape)
    xf = rms_norm(xf, params["language_model"]["norm"]["scale"], tc.rms_norm_eps)
    logits = lm_head(params["language_model"], tc, xf)[:, 0]
    if any_sampled:
        next_tokens = sample_batch(logits, rng_key, do_sample, temperature, top_k, top_p)
    else:
        next_tokens = greedy(logits)
    if logprobs:
        # OpenAI logprobs WITHOUT leaving the continuous batch: the chosen
        # token's logprob + a fixed top-5 (the OpenAI surface caps
        # top_logprobs there; one static K bounds program count — hosts
        # slice per-request).
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        chosen = jnp.take_along_axis(lp, next_tokens[:, None], axis=1)[:, 0]
        top_v, top_i = jax.lax.top_k(lp, LOGPROBS_K)
        return (next_tokens, chosen, top_v, top_i), k_pool, v_pool
    return next_tokens, k_pool, v_pool


LOGPROBS_K = 5  # OpenAI caps top_logprobs at 5; one static K bounds compiles

_paged_decode_step_jit = functools.partial(
    jax.jit,
    static_argnames=("cfg", "page_size", "attn_impl", "moe_impl", "kv_write",
                     "any_sampled", "logprobs"),
    donate_argnames=("k_pool", "v_pool"),
)(_decode_step_core)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "page_size", "attn_impl", "moe_impl", "steps",
                     "any_sampled", "logprobs"),
    donate_argnames=("k_pool", "v_pool"),
)
def _paged_decode_roll_jit(
    params,
    cfg: OmChatConfig,
    tokens,
    lengths,
    active,
    tables,
    k_pool,
    v_pool,
    page_size: int,
    attn_impl: Optional[str],
    steps: int,
    moe_impl: str = "dense",
    *,
    any_sampled: bool = False,
    logprobs: bool = False,
    rng_key=None,
    do_sample=None,
    temperature=None,
    top_k=None,
    top_p=None,
):
    """``steps`` decode iterations in one dispatch (multi-step scheduling).

    The host sees one upload/readback per roll instead of per token — on a
    remote/tunneled backend the per-step round trip dominates the serving
    loop.  Requests that hit EOS or their budget mid-roll keep decoding into
    their own allocated headroom pages (the engine allocates ``decode_roll``
    extra positions); the host discards the surplus tokens.

    Returns ([steps, S] tokens, k_pool, v_pool) — with ``logprobs``, tokens
    is the tuple ([steps, S], [steps, S] chosen-lp, [steps, S, K] top-lp,
    [steps, S, K] top-id).
    """
    if rng_key is None:
        rng_key = jax.random.PRNGKey(0)

    def body(carry, _):
        toks, lens, kp, vp, key = carry
        key, sub = jax.random.split(key)
        out, kp, vp = _decode_step_core(
            params, cfg, toks, lens, active, tables, kp, vp, page_size, attn_impl,
            moe_impl, any_sampled=any_sampled, logprobs=logprobs, rng_key=sub,
            do_sample=do_sample, temperature=temperature, top_k=top_k, top_p=top_p,
        )
        nt = out[0] if logprobs else out
        lens = jnp.where(active, lens + 1, lens)
        return (nt, lens, kp, vp, key), out

    (_, _, k_pool, v_pool, _), toks = jax.lax.scan(
        body, (tokens, lengths, k_pool, v_pool, rng_key), None, length=steps
    )
    return toks, k_pool, v_pool


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "page_size", "attn_impl", "moe_impl"),
    donate_argnames=("k_pool", "v_pool"),
)
def _paged_verify_jit(
    params,
    cfg: OmChatConfig,
    tokens,  # [S, T] int32: [last_token, draft_0 .. draft_{T-2}] per slot
    lengths,  # [S] valid tokens already in pages
    active,  # [S] bool
    tables,  # [S, W] int32 (parked rows for inactive slots)
    k_pool,
    v_pool,
    page_size: int,
    attn_impl=None,
    moe_impl: str = "dense",
):
    """Speculative verify step: T candidate tokens per slot in ONE dispatch
    against the page pool, returning the greedy continuation at every
    position ([S, T] int32).

    This is the continuous-batching counterpart of
    runtime/speculative._verify_step_jit (single-request engine), built on
    the DECODE step's memory structure, not the prefill chunk's: the pools
    stay READ-ONLY and loop-invariant through the layer scan (scanning them
    as xs/ys needs a second pool-sized buffer to stack the ys — measured
    ResourceExhausted at the 13B serving footprint), each layer gathers the
    slot's live pages to a small contiguous [S, KVH, W*ps, D] block, attends
    over [cached ; causal self-chunk] with an explicit mask (T is tiny, so
    plain einsum attention costs ~nothing next to the weight stream), emits
    its T K/V rows as scan outputs, and ONE aliased ``commit_rows`` call
    writes all L*S*T rows after the scan.  Rejected candidates leave stale
    rows beyond the accepted length; the next dispatch's writes overlap
    exactly those positions and attention masks at the host-advanced length,
    so they are never read (same cache discipline as speculative.py:11-15).
    Decode-step economics: the dispatch pays the weight stream once for T
    positions, so at acceptance a the per-token cost divides by (1+a)
    (BENCH.md "machinery ceiling").
    """
    tc = cfg.text
    s, t = tokens.shape
    hd = tc.attn_head_dim
    kvh = tc.num_key_value_heads
    max_pages = tables.shape[1]
    n_layers, n_slots = k_pool.shape[0], k_pool.shape[1]
    parked = n_slots - 1

    x = embed_tokens(params["language_model"], tokens)  # [S, T, D]
    positions = lengths[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    cos, sin = rope_cos_sin(
        positions, hd, theta=tc.rope_theta, scaling=tc.rope_scaling,
        max_position_embeddings=tc.max_position_embeddings, dtype=x.dtype,
    )
    idx = positions // page_size
    page_rows = jnp.where(
        idx < max_pages,
        jnp.take_along_axis(tables, jnp.minimum(idx, max_pages - 1), axis=1),
        parked,
    )  # [S, T]
    offs = positions % page_size
    mlp_fn = _mlp_fn(tc, moe_impl)

    pool_shape = k_pool.shape
    kflat = k_pool.reshape(n_layers * n_slots, *pool_shape[2:])
    vflat = v_pool.reshape(n_layers * n_slots, *pool_shape[2:])
    kv_len = jnp.where(active, lengths + t, 0)
    q_off = jnp.where(active, lengths, 0)
    b_idx = jnp.arange(s, dtype=jnp.int32)[:, None]
    attn_route = "pallas" if attn_impl == "pallas_manual" else attn_impl

    def attend(q, k, v, st):
        from omchat_tpu.ops.attention import attention
        from omchat_tpu.ops.paged_attention import _gather_pages

        # q: [S, T, H, D]; k/v: [S, T, KVH, D]; pools read-only, layer at st.
        # Gather the slot's live pages to a contiguous [S, KVH, W*ps, D]
        # block, splice the in-flight chunk rows at their absolute positions
        # (tiny: [S, T] rows into a few-MB block), and run the tuned causal
        # flash path (same gather+flash trade the chunked prefill makes —
        # BENCH.md; a hand-written einsum attention here measured ~10x the
        # whole step's budget).
        kg, vg = _gather_pages(kflat, vflat, tables + st)
        kg = kg.astype(q.dtype).at[b_idx, :, positions].set(k)
        vg = vg.astype(q.dtype).at[b_idx, :, positions].set(v)
        out = attention(
            q, kg, vg, causal=True, q_offset=q_off, kv_len=kv_len,
            impl=attn_route, kv_format="bntd",
        )
        return out, (st, k, v)

    def layer(carry, xs):
        xx = carry
        li, lp = xs
        xx, (_, k_rows, v_rows) = decoder_layer(
            tc, xx, lp, cos, sin, attend, mlp_fn, li * n_slots,
            quant_glue=quant_glue_ok(attn_impl),
        )
        return xx, (k_rows, v_rows)

    xf, (k_rows, v_rows) = jax.lax.scan(
        layer, x,
        (jnp.arange(n_layers, dtype=jnp.int32), params["language_model"]["layers"]),
    )  # k_rows: [L, S, T, KVH, D]
    flat_pages = (
        jnp.arange(n_layers, dtype=jnp.int32)[:, None, None] * n_slots + page_rows[None]
    )  # [L, S, T]
    off_all = jnp.broadcast_to(offs[None], flat_pages.shape).reshape(-1)
    kr = k_rows.reshape(n_layers * s * t, kvh, hd)
    vr = v_rows.reshape(n_layers * s * t, kvh, hd)
    if (
        attn_impl in (None, "pallas", "pallas_manual")
        and jax.default_backend() == "tpu"
    ):
        from omchat_tpu.ops.paged_attention import commit_rows

        kflat, vflat = commit_rows(kflat, vflat, flat_pages.reshape(-1), off_all, kr, vr)
    else:  # portable row scatter (CPU / sharded paths)
        fp = flat_pages.reshape(-1)
        kflat = kflat.at[fp, :, off_all].set(kr.astype(kflat.dtype))
        vflat = vflat.at[fp, :, off_all].set(vr.astype(vflat.dtype))
    k_pool = kflat.reshape(pool_shape)
    v_pool = vflat.reshape(pool_shape)
    xf = rms_norm(xf, params["language_model"]["norm"]["scale"], tc.rms_norm_eps)
    logits = lm_head(params["language_model"], tc, xf)  # [S, T, V]
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), k_pool, v_pool


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "page_size", "attn_impl", "moe_impl"),
    donate_argnames=("k_pool", "v_pool"),
)
def _paged_prefill_chunk_jit(
    params,
    cfg: OmChatConfig,
    token_ids,  # [B, C]
    is_image,
    image_index,
    image_features,
    positions,
    chunk_start,  # [B] int32, page-aligned per request
    chunk_len,  # [B] int32 valid tokens of each row's chunk
    tables,  # [B, max_pages] int32
    k_pool,
    v_pool,
    page_size: int,
    attn_impl=None,
    moe_impl: str = "dense",
):
    """One chunk of a paged prefill for B requests at once: scatter each
    row's K/V into its own pages and attend to everything cached so far
    *through the page tables* (per-row ``chunk_start``/``chunk_len``, so the
    rows need not be at the same progress point).

    Unlike the contiguous chunked prefill (generate.py:_prefill_chunk_jit,
    whose donated cache shape varies with prompt length), every operand here
    has a fixed shape — one compiled program serves any prompt length, so a
    32k video prompt admits without compiling a 32k-token bucket
    (VERDICT r2 #1).  Padded tail rows write into decode headroom pages (or
    the parking page past the allocation) and are never attended: attention
    masks at ``kv_len`` and decode overwrites position L before reading it.

    Batching matters for throughput, not just latency: a chunk dispatch pays
    the full int8 weight stream regardless of B, so prefix-cache suffix
    prefills that used to run one-per-request amortize it.
    """
    from omchat_tpu.models.omchat import fuse_embeddings
    from omchat_tpu.ops.paged_attention import paged_prefill_attention

    tc = cfg.text
    b, c = token_ids.shape
    n_chunk_pages = c // page_size
    max_pages = tables.shape[1]
    kvh, hd = tc.num_key_value_heads, tc.attn_head_dim

    x = fuse_embeddings(params, token_ids, is_image, image_index, image_features)  # [B, C, D]
    cos, sin = rope_cos_sin(
        positions, hd, theta=tc.rope_theta, scaling=tc.rope_scaling,
        max_position_embeddings=tc.max_position_embeddings, dtype=x.dtype,
    )
    kv_len = chunk_start + chunk_len  # [B]
    start_page = chunk_start // page_size  # [B]
    mlp_fn = _mlp_fn(tc, moe_impl)

    def attend(q, k, v, pools):
        kp, vp = pools
        # [B, C, KVH, hd] -> [B*C/ps, KVH, ps, hd] (page-major pool)
        kc = k.reshape(b * n_chunk_pages, page_size, kvh, hd).transpose(0, 2, 1, 3)
        vc = v.reshape(b * n_chunk_pages, page_size, kvh, hd).transpose(0, 2, 1, 3)
        # one batched scatter over whole pages (vs a chunk_pages-long chain of
        # dependent updates).  Rows past the table width go to the parking
        # page (pool's last index) directly — clamping onto table[-1] would
        # collide with a full-allocation request's real last page, and
        # scatter duplicate-index resolution is undefined.  (Multiple padded
        # rows scattering to the parking page is fine: its contents are never
        # attended, so the undefined pick is between two garbage values.)
        idx = start_page[:, None] + jnp.arange(n_chunk_pages)[None, :]  # [B, n]
        pages = jnp.where(
            idx < max_pages,
            jnp.take_along_axis(tables, jnp.minimum(idx, max_pages - 1), axis=1),
            kp.shape[0] - 1,
        ).reshape(-1)
        kp = kp.at[pages].set(kc.astype(kp.dtype))
        vp = vp.at[pages].set(vc.astype(vp.dtype))
        out = paged_prefill_attention(
            q, kp, vp, kv_len, tables, chunk_start, impl=attn_impl
        )
        return out, (kp, vp)

    def layer(carry, xs):
        xx = carry
        lp, kp, vp = xs
        xx, (kp, vp) = decoder_layer(
            tc, xx, lp, cos, sin, attend, mlp_fn, (kp, vp),
            quant_glue=quant_glue_ok(attn_impl),
        )
        return xx, (kp, vp)

    xf, (k_pool, v_pool) = jax.lax.scan(
        layer, x, (params["language_model"]["layers"], k_pool, v_pool)
    )
    xf = rms_norm(xf, params["language_model"]["norm"]["scale"], tc.rms_norm_eps)
    idx = jnp.maximum(chunk_len - 1, 0)  # [B]
    last = jnp.take_along_axis(xf, idx[:, None, None], axis=1)  # [B,1,D]
    logits = lm_head(params["language_model"], tc, last)[:, 0]  # [B, V]
    return logits, k_pool, v_pool


@dataclass
class _PagedRequest:
    request_id: int
    input_ids: List[int]
    image_features: Optional[jax.Array]
    max_new_tokens: int
    eos_token_id: int
    generation: Optional[object] = None
    pages: List[int] = field(default_factory=list)
    slot: Optional[int] = None
    plan: Optional[object] = None
    prefilled: bool = False
    generated: List[int] = field(default_factory=list)
    done: bool = False
    last_token: Optional[int] = None
    prompt_len: int = 0
    n_pages_needed: int = 0
    chunk_pos: int = 0  # next chunk start for in-progress paged prefill
    page_hashes: List[bytes] = field(default_factory=list)  # prefix-cache digests
    cache_refs: List[int] = field(default_factory=list)  # pages held via the cache
    cancelled: bool = False  # cooperative: swept by the scheduler at tick start
    pending_pixels: Optional[object] = None  # tiles awaiting the batched ViT tick
    image_cache_key: Optional[str] = None
    submit_t: float = 0.0  # perf_counter at submit (latency accounting)
    ttft: Optional[float] = None  # first-token latency (s)
    token_times: List[float] = field(default_factory=list)  # observation time per token
    logprobs: bool = False  # OpenAI logprobs: chosen-token logprob per token
    top_logprobs: int = 0  # 0..LOGPROBS_K alternatives per token
    lp_list: List[float] = field(default_factory=list)  # aligned with generated
    top_list: List[list] = field(default_factory=list)  # [(token_id, lp), ...] per token
    streaming: bool = False  # SSE consumer attached → adaptive (small) rolls
    lookup_base: List[int] = field(default_factory=list)  # true prompt ids for prompt-lookup drafts

    @property
    def samples(self) -> bool:
        return self.generation is not None and self.generation.do_sample


class PagedBatchEngine:
    """Continuous batching over a shared page pool (API mirrors BatchEngine)."""

    def __init__(
        self,
        cfg: OmChatConfig,
        params: dict,
        *,
        max_slots: int = 4,
        num_pages: int = 256,
        # 128 measured best on v5e across fills (dev/exp_decode_b.py + the
        # ps sweep: B16/fill2048 ps64=50.5, ps128=45.9, ps256=47.4 ms/step;
        # the decode kernel is DMA-issue/grid-bound, so fewer bigger pages
        # win until block latency hiding saturates)
        page_size: int = 128,
        attn_impl: Optional[str] = None,
        prompt_bucket: int = 128,
        rng_seed: int = 0,
        max_len: int = 8192,
        mesh=None,
        decode_roll: int = 1,
        moe_impl: str = "dense",
        prefill_chunk: int = 1024,
        prefix_cache: bool = False,
        cache_dtype=None,
        decode_kernel: str = "auto",
        prefill_batch_tokens: int = 8192,
        image_cache_size: int = 8,
        prefill_priority: bool = False,
        streaming_roll: Optional[int] = None,
        speculative: bool = False,
        draft_len: int = 4,
        draft_ngram: int = 2,
        draft_fn=None,
        pipeline_rolls: bool = False,
    ):
        """``max_len`` caps one request's prompt+generation (it sets the page
        TABLE width, so per-step attention cost scales with the request cap,
        not the pool size); ``mesh`` shards the page pools' kv-head axis for
        tensor-parallel serving (replicated when KVH % tp != 0).

        ``decode_roll`` > 1 batches that many decode steps into one dispatch
        every tick (multi-step scheduling): one host round trip per roll
        instead of per token, at the cost of up to ``decode_roll - 1`` wasted
        positions per finished request and one roll of admission latency for
        queued requests (throughput mode; keep 1 for lowest per-token
        latency).  ``prefill_chunk`` bounds any single prefill dispatch —
        longer prompts advance one chunk per tick with rolls in between.

        ``prefix_cache`` enables automatic prefix caching: immutable prompt
        KV pages are published under a content digest and requests sharing a
        token prefix (the system-prompt pattern) skip prefilling the matched
        pages entirely (see runtime/prefix_cache.py).

        ``cache_dtype`` overrides the page-pool storage dtype — e.g.
        ``jnp.float8_e4m3fn`` halves page bytes (double the resident KV per
        HBM byte, and at a fixed page byte size double the tokens per DMA);
        all scatter paths quantize on write and the attention kernels
        dequantize on load (same contract as OmChatEngine's ``cache_dtype``).

        ``decode_kernel``: "auto" uses the auto-pipelined paged decode kernel;
        "manual" uses the manual-DMA ring variant (grid (B,), NBUF pages in
        flight per request — see ops/paged_attention.paged_flash_decode_manual).
        TPU + single-device only; ignored elsewhere.

        ``prefill_priority``: skip the decode roll while any admitted slot is
        still mid-prefill.  Every decode step streams the full weight set
        whatever the occupancy, so rolls issued while stragglers prefill run
        at partial occupancy and the laggards' tokens re-pay the stream later
        — batching all starts together trades a small TTFT/inter-token bump
        for aggregate throughput (throughput mode).

        ``streaming_roll``: adaptive roll width — while any decoding request
        was submitted with ``streaming=True`` (an SSE consumer is attached),
        rolls shrink to this width so tokens surface every streaming_roll
        steps instead of every decode_roll; with no streams attached the full
        decode_roll amortizes host round trips.  A roll is one dispatch, so
        the observation granularity (inter-token p99 a streaming client sees)
        is roll × step-time.

        ``speculative``: prompt-lookup speculative decoding INSIDE the
        continuous batch (greedy slots only): each tick where any decoding
        slot's tail n-gram matches earlier content, a batched verify dispatch
        scores ``draft_len`` candidates per slot in one forward — accepted
        tokens cost one weight stream for up to draft_len+1 positions.
        Greedy tokens are bit-identical to the non-speculative engine
        (tests/test_paged_engine.py).  Ticks with no draft anywhere, or with
        any sampled/logprobs member, fall back to the normal decode roll.
        ``draft_fn(context) -> List[int]`` overrides the proposer (oracle
        drafts in dev/bench_speculative.py).

        ``pipeline_rolls``: async roll scheduling — while the scheduler has
        nothing that would change the decoding set (no queued admissions, no
        mid-prefill slot), the next roll dispatches from the in-flight roll's
        DEVICE-side final tokens before its results are read back, so the
        per-roll host gap (tunnel readback + bookkeeping, measured ~4 ms)
        overlaps device work instead of idling the chip.  Costs: up to one
        extra roll of discarded positions per finished request (allocation
        headroom is doubled accordingly) and one roll of added admission
        latency when traffic resumes.  Tokens are identical."""
        assert prompt_bucket % page_size == 0, "prompt buckets must align to pages"
        assert prefill_chunk % page_size == 0, "prefill chunks must align to pages"
        self.prefill_chunk = prefill_chunk
        self._prompt_bucket = prompt_bucket
        self.prefill_batch_tokens = prefill_batch_tokens
        import math

        self._chunk_bucket = math.lcm(prompt_bucket, page_size)
        self.prefill_priority = prefill_priority
        self.cfg = cfg
        self.params = params
        self.page_size = page_size
        self.max_slots = max_slots
        self.max_len = max_len
        if attn_impl is None and mesh is not None and getattr(mesh, "size", 1) > 1:
            # Multi-device mesh: GSPMD would replicate an opaque pallas_call's
            # operands (all-gathering sharded q/k/v), so plain "pallas" is
            # never the default here.  When whole GQA groups land on each
            # model-axis shard, run the kernels per shard via shard_map
            # (attn_impl tuple, see parallel.tp_attention); otherwise XLA's
            # fused attention partitions cleanly.
            from omchat_tpu.ops.attention import default_impl
            from omchat_tpu.parallel.tp_attention import tp_shardable

            tc = cfg.text
            if default_impl() == "pallas" and tp_shardable(
                mesh, tc.num_attention_heads, tc.num_key_value_heads
            ):
                attn_impl = ("pallas_tp", mesh)
            else:
                attn_impl = "xla"
        if (
            decode_kernel == "manual"
            and attn_impl in (None, "pallas")
            and jax.default_backend() == "tpu"
        ):
            # decode-only variant: paged_prefill_attention and quant_glue_ok
            # treat "pallas_manual" exactly like "pallas"
            attn_impl = "pallas_manual"
        self.attn_impl = attn_impl
        # aliased whole-page prefill commit on single-device TPU (the jnp
        # scatter rematerializes the pool; see _commit_pages_jit docstring)
        self._page_commit_kernel = (
            attn_impl in (None, "pallas", "pallas_manual")
            and jax.default_backend() == "tpu"
        )
        self.decode_roll = max(1, int(decode_roll))
        self.streaming_roll = max(1, int(streaming_roll)) if streaming_roll else None
        self.speculative = bool(speculative)
        self.draft_len = max(1, int(draft_len))
        self.draft_ngram = max(1, int(draft_ngram))
        self.draft_fn = draft_fn
        self.pipeline_rolls = bool(pipeline_rolls)
        self._inflight = None  # dispatched-but-unprocessed roll (pipeline_rolls)
        # allocation/table headroom must cover whichever roll width runs —
        # or the verify chunk (draft_len + 1 positions per dispatch); with
        # pipelined rolls a finished request can over-decode up to one MORE
        # roll before the host learns it finished
        self._max_roll = max(
            self.decode_roll,
            self.streaming_roll or 1,
            (self.draft_len + 1) if self.speculative else 1,
        ) * (2 if self.pipeline_rolls else 1)
        self.moe_impl = moe_impl

        from omchat_tpu.runtime.generate import OmChatEngine

        # contiguous prefill reuses the single-request engine's jitted buckets
        self._prefiller = OmChatEngine(
            cfg, params,
            attn_impl=None if attn_impl == "pallas_manual" else attn_impl,
            prompt_bucket=prompt_bucket,
            image_cache_size=image_cache_size,
        )

        tc = cfg.text
        dtype = cache_dtype or params["language_model"]["embed_tokens"].dtype
        # one extra physical page parks writes from inactive slots (their
        # table rows point at it, so a freed/reassigned page is never touched)
        # page-major pool: one page holds every kv head's slice contiguously,
        # so the decode kernel's per-page fetch is one contiguous DMA
        shape = (tc.num_hidden_layers, num_pages + 1, tc.num_key_value_heads, page_size, tc.attn_head_dim)
        self.k_pool = jnp.zeros(shape, dtype)
        self.v_pool = jnp.zeros(shape, dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            tp = mesh.shape["model"]
            head_axis = "model" if cfg.text.num_key_value_heads % tp == 0 else None
            sh = NamedSharding(mesh, P(None, None, head_axis, None, None))
            self.k_pool = jax.device_put(self.k_pool, sh)
            self.v_pool = jax.device_put(self.v_pool, sh)
        self.allocator = PageAllocator(num_pages)
        self._parking = num_pages
        if prefix_cache:
            from omchat_tpu.runtime.prefix_cache import PrefixPageCache

            self.prefix_cache: Optional[PrefixPageCache] = PrefixPageCache()
        else:
            self.prefix_cache = None
        # max pages one request may map — the fixed table width per compile;
        # per-step attention spans max_len, not the whole pool.  The table is
        # widened by the roll headroom so decode_roll does not shrink the
        # documented prompt+generation capacity.
        self.max_pages = -(-(max_len + self._max_roll - 1) // page_size)

        self._ids = itertools.count()
        self.queue: List[_PagedRequest] = []
        self.slots: List[Optional[_PagedRequest]] = [None] * max_slots
        self.requests: Dict[int, _PagedRequest] = {}
        # rolling latency windows (latency_stats / serve.py /metrics)
        from collections import deque

        self._ttfts: "deque[float]" = deque(maxlen=1024)
        self._gaps: "deque[float]" = deque(maxlen=8192)
        self._tokens = np.zeros(max_slots, np.int32)
        self._lengths = np.zeros(max_slots, np.int32)
        # speculative accounting (stats() / bench): dispatches and the tokens
        # they produced — tokens/dispatch is the realized acceptance rate + 1
        self.spec_dispatches = 0
        self.spec_tokens = 0
        # acceptance EMA gate: a verify dispatch costs ~1.3 decode steps but
        # supplants a decode_roll-step roll, so it only pays while drafts
        # actually accept.  Start optimistic; when the realized mean accepted
        # tokens/slot falls below ~0.5 the engine reverts to rolls and
        # re-probes every 32nd draft-bearing tick (workloads drift).
        self._spec_ema = float(self.draft_len)
        self._spec_probe = 0
        self._tables = np.full((max_slots, self.max_pages), self._parking, np.int32)
        self._key = jax.random.PRNGKey(rng_seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def precompile(self, batch_sizes=(1, 2, 4, 8, 16), widths=(128, 256, 512),
                   roll_widths=(4, 8, 16, 32),
                   variants=((False, False), (True, False), (False, True), (True, True))):
        """Compile the program menu ahead of traffic.

        Live traffic walks program shapes the first requests otherwise pay
        for one by one — the bucketed shorts prefill at every (pow2 batch,
        pow2 width) combination the scheduler can form, the page-commit
        scatter per batch, and the decode roll at every live-width bucket as
        occupancy/fills evolve.  Each first compile costs seconds (20-200 s
        on a tunneled backend), which lands as multi-second TTFT/inter-token
        outliers in steady-state serving.  Long-prompt chunk widths are NOT
        covered (they depend on actual prompt lengths); the fixed-shape
        chunked path bounds those to bucketed multiples of the prompt bucket.

        ``variants`` lists the (any_sampled, logprobs) decode programs to
        compile per roll width — both are STATIC jit args, so the first
        sampled (temperature>0) or logprobs request would otherwise trigger
        the same mid-traffic compile this method exists to prevent.  Trim it
        to ``((False, False),)`` for a greedy-only deployment's faster start.
        """
        cap = 1
        while cap < self.max_slots:
            cap *= 2
        for w in widths:
            for b in batch_sizes:
                if b > cap or (b * w > self.prefill_batch_tokens and b > 1):
                    continue
                plan = self._prefiller.plan([[9] * (w - 1)] * b, pad_to=w)
                logits, cache = self._prefiller.prefill(plan, None, 0)
                tables = jnp.full((b, self.max_pages), self._parking, jnp.int32)
                self.k_pool, self.v_pool = _commit_pages_jit(
                    cache.k, cache.v, self.k_pool, self.v_pool, tables,
                    jnp.zeros((b,), jnp.int32), self.page_size,
                    use_kernel=self._page_commit_kernel,
                )
                jax.block_until_ready(logits)
        tokens = jnp.zeros((self.max_slots,), jnp.int32)
        lengths = jnp.zeros((self.max_slots,), jnp.int32)
        active = jnp.zeros((self.max_slots,), bool)
        neutral_sample_args = dict(
            rng_key=jax.random.PRNGKey(0),
            do_sample=jnp.zeros((self.max_slots,), bool),
            temperature=jnp.ones((self.max_slots,), jnp.float32),
            top_k=jnp.zeros((self.max_slots,), jnp.int32),
            top_p=jnp.ones((self.max_slots,), jnp.float32),
        )
        rolls = sorted({self.decode_roll, self.streaming_roll or self.decode_roll})
        for w in roll_widths:
            if w > self.max_pages:
                continue
            tables = jnp.full((self.max_slots, w), self._parking, jnp.int32)
            for roll in rolls:
                for any_sampled, logprobs in variants:
                    sample_args = neutral_sample_args if any_sampled else {}
                    if roll == 1:
                        out, self.k_pool, self.v_pool = _paged_decode_step_jit(
                            self.params, self.cfg, tokens, lengths, active, tables,
                            self.k_pool, self.v_pool, self.page_size, self.attn_impl,
                            self.moe_impl, any_sampled=any_sampled,
                            logprobs=logprobs, **sample_args,
                        )
                    else:
                        out, self.k_pool, self.v_pool = _paged_decode_roll_jit(
                            self.params, self.cfg, tokens, lengths, active, tables,
                            self.k_pool, self.v_pool, self.page_size, self.attn_impl,
                            roll, self.moe_impl, any_sampled=any_sampled,
                            logprobs=logprobs, **sample_args,
                        )
                    jax.block_until_ready(out[0] if logprobs else out)
        if self.speculative:
            toks_v = jnp.zeros((self.max_slots, self.draft_len + 1), jnp.int32)
            for w in roll_widths:
                if w > self.max_pages:
                    continue
                tables = jnp.full((self.max_slots, w), self._parking, jnp.int32)
                out, self.k_pool, self.v_pool = _paged_verify_jit(
                    self.params, self.cfg, toks_v, lengths, active, tables,
                    self.k_pool, self.v_pool, self.page_size, self.attn_impl,
                    self.moe_impl,
                )
                jax.block_until_ready(out)

    # -- client API ---------------------------------------------------------

    def submit(
        self,
        input_ids: Sequence[int],
        images: Optional[np.ndarray] = None,
        max_new_tokens: int = 256,
        eos_token_id: int = 151645,
        generation=None,
        image_cache_key: Optional[str] = None,
        logprobs: bool = False,
        top_logprobs: int = 0,
        streaming: bool = False,
    ) -> int:
        req = _PagedRequest(next(self._ids), list(input_ids), None, max_new_tokens, eos_token_id, generation)
        req.logprobs = logprobs or top_logprobs > 0
        req.top_logprobs = max(0, min(int(top_logprobs), LOGPROBS_K))
        req.streaming = streaming
        if self.speculative:
            # prompt-lookup context = true (unexpanded) prompt ids + generated
            req.lookup_base = [t for t in input_ids if t >= 0]
        req.submit_t = time.perf_counter()
        # plan + feasibility first (both need only input_ids): reject requests
        # no allocation could ever satisfy before paying the ViT encode.
        # roll - 1 extra positions of headroom absorb mid-roll writes
        # past a finished request's budget.
        req.plan = self._prefiller.plan([req.input_ids])
        need = self._n_pages_for(int(req.plan.lengths[0]) + max_new_tokens + self._max_roll - 1)
        if need > min(self.max_pages, self.allocator.num_pages):
            raise ValueError(
                f"request needs {need} pages (> cap {self.max_pages} / pool {self.allocator.num_pages}); "
                "raise max_len/num_pages or shorten the request"
            )
        req.n_pages_needed = need
        if images is not None and image_cache_key is None and isinstance(images, np.ndarray):
            # one content identity for BOTH caches: the encoded-image LRU and
            # image-aware prefix-page hashing below
            from omchat_tpu.runtime.feature_cache import pixel_digest

            image_cache_key = pixel_digest(images)
        if self.prefix_cache is not None:
            from omchat_tpu.runtime.prefix_cache import page_hashes

            tids = np.asarray(req.plan.token_ids[0])
            isimg = np.asarray(req.plan.is_image[0])
            first_img = int(np.argmax(isimg)) if isimg.any() else None
            req.page_hashes = page_hashes(
                tids, int(req.plan.lengths[0]), self.page_size, first_img,
                image_key=image_cache_key if images is not None else None,
                is_image=isimg,
                image_index=np.asarray(req.plan.image_index[0]),
            )
        if images is not None:
            # feature LRU (feature_cache.py): repeated images skip the ViT.
            # Misses DEFER to the batched encode tick — all requests' tiles
            # waiting at a tick ride ONE ViT dispatch (a 2-tile dispatch
            # leaves the MXU mostly idle; batching across requests runs at
            # the full-encode rate, bench.py vit_images_per_sec_batched).
            cache = self._prefiller.image_cache
            feats = cache.peek(image_cache_key) if cache is not None else None
            if feats is not None:
                cache.get(image_cache_key)  # official hit accounting
                req.image_features = feats
            else:
                req.pending_pixels = images
                req.image_cache_key = image_cache_key
        self.queue.append(req)
        self.requests[req.request_id] = req
        return req.request_id

    # ViT dispatch tile buckets: one compiled encode program per bucket; the
    # ladder keeps padding waste ≤ 1/3 while bounding compiles.
    _TILE_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32)

    def _tile_bucket(self, n: int) -> int:
        for b in self._TILE_BUCKETS:
            if n <= b:
                return b
        return -(-n // 8) * 8

    def _encode_pending(self):
        """Batch every waiting ViT encode into one padded dispatch.

        Requests whose images missed the feature LRU at submit hold raw
        tiles; here their tile stacks concatenate into one [bucket, 3, H, W]
        encode (padding tiles are zeros, their features dropped), the result
        splits back per request, and each entry lands in the LRU."""
        pend = [
            r
            for r in itertools.chain(self.queue, (s for s in self.slots if s is not None))
            if r.pending_pixels is not None
        ]
        if not pend:
            return
        from omchat_tpu.runtime.generate import _encode_images_jit

        pre = self._prefiller
        cache = pre.image_cache
        entries = []  # (key, tiles, [reqs]) — one encode per distinct image
        by_key: dict = {}
        for r in pend:
            key = r.image_cache_key
            if key is not None and key in by_key:
                by_key[key][2].append(r)  # same image twice in one tick
                r.pending_pixels = None
                continue
            if cache is not None and key is not None:
                feats = cache.get(key)  # filled since submit (earlier tick)
                if feats is not None:
                    r.image_features = feats
                    r.pending_pixels = None
                    continue
            e = (key, jnp.asarray(r.pending_pixels), [r])
            entries.append(e)
            if key is not None:
                by_key[key] = e
            r.pending_pixels = None
        if not entries:
            return
        counts = [int(e[1].shape[0]) for e in entries]
        total = sum(counts)
        bucket = self._tile_bucket(total)
        cat = (
            jnp.concatenate([e[1] for e in entries], axis=0)
            if len(entries) > 1
            else entries[0][1]
        )
        if bucket > total:
            pad = jnp.zeros((bucket - total, *cat.shape[1:]), cat.dtype)
            cat = jnp.concatenate([cat, pad], axis=0)
        feats = _encode_images_jit(pre.params, self.cfg, cat, pre.attn_impl)  # [bucket*L, D]
        per_tile = feats.shape[0] // bucket
        feats = feats.reshape(bucket, per_tile, feats.shape[-1])
        off = 0
        for (key, _, reqs), n in zip(entries, counts):
            f = feats[off : off + n].reshape(n * per_tile, -1)
            off += n
            if cache is not None:
                cache.put(key, f)
            reqs[0].image_features = f
            for r in reqs[1:]:  # duplicates register as cache hits
                r.image_features = cache.get(key) if cache is not None and key is not None else f

    def finished(self, request_id: int) -> bool:
        return self.requests[request_id].done

    def result(self, request_id: int) -> List[int]:
        return list(self.requests[request_id].generated)

    def snapshot(self, request_id: int):
        """Thread-safe progress view: (tokens generated so far, finished) —
        same contract as :meth:`BatchEngine.snapshot`."""
        req = self.requests[request_id]
        return list(req.generated), req.done

    def pop_result(self, request_id: int):
        req = self.requests.pop(request_id)
        return list(req.generated), req.prompt_len

    def request_logprobs(self, request_id: int):
        """OpenAI logprobs surface: (chosen-token logprobs, top alternatives),
        both aligned with the generated tokens — read BEFORE
        :meth:`pop_result`.  Top entries are ``[(token_id, logprob), ...]``
        sliced to the request's ``top_logprobs``; (None, None) when the
        request didn't ask.  Unlike the single-request fallback the tokens
        never leave the continuous batch — the decode dispatch computes the
        chosen logprob + a static top-LOGPROBS_K when any active request
        wants them (one extra program variant)."""
        req = self.requests[request_id]
        if not req.logprobs:
            return None, None
        tops = [t[: req.top_logprobs] for t in req.top_list] if req.top_logprobs else None
        return list(req.lp_list), tops

    def cancel(self, request_id: int) -> None:
        """Request early termination (client disconnect, stop string hit).
        Safe to call from any thread: only a flag is set here; the scheduler
        thread releases the slot/pages at the start of its next tick."""
        self.requests[request_id].cancelled = True

    def _sweep_cancelled(self):
        for req in list(self.slots):
            if req is not None and req.cancelled and not req.done:
                self._release(req)
        if any(r.cancelled for r in self.queue):
            for req in [r for r in self.queue if r.cancelled]:
                req.done = True
            self.queue = [r for r in self.queue if not r.cancelled]

    def has_work(self) -> bool:
        return (
            bool(self.queue)
            or any(r is not None for r in self.slots)
            or self._inflight is not None
        )

    def stats(self) -> dict:
        """Scheduler gauges for observability surfaces (serve.py /metrics)."""
        out = {
            "slots_busy": sum(r is not None for r in self.slots),
            "slots_total": self.max_slots,
            "queue_depth": len(self.queue),
            "pages_free": self.allocator.available,
            "pages_total": self.allocator.num_pages,
        }
        if self.speculative:
            out["spec_dispatches"] = self.spec_dispatches
            out["spec_tokens"] = self.spec_tokens
        if self.prefix_cache is not None:
            out.update({f"prefix_cache_{k}": v for k, v in self.prefix_cache.stats().items()})
        if self._prefiller.image_cache is not None:
            out.update(
                {f"image_cache_{k}": v for k, v in self._prefiller.image_cache.stats().items()}
            )
        out.update(
            {k: round(v, 4) for k, v in self.latency_stats().items() if k != "requests_measured"}
        )
        return out

    def reset_latency_stats(self) -> None:
        """Clear the rolling windows — call after warmup so compile-time
        TTFTs don't pollute steady-state percentiles."""
        self._ttfts.clear()
        self._gaps.clear()

    def latency_stats(self) -> dict:
        """Per-request latency distribution (rolling windows — survives
        pop_result): TTFT p50/p99/max and inter-token p50/p99, seconds.
        Inter-token deltas are observation gaps at roll granularity — a
        decode roll delivers its tokens together, so the p99 reflects what a
        streaming client actually sees between flushes."""
        ttfts = list(self._ttfts)
        gaps = list(self._gaps)
        out: dict = {"requests_measured": len(ttfts)}
        if ttfts:
            out["ttft_p50_s"] = float(np.percentile(ttfts, 50))
            out["ttft_p99_s"] = float(np.percentile(ttfts, 99))
            out["ttft_max_s"] = float(max(ttfts))
        if gaps:
            out["intertoken_p50_s"] = float(np.percentile(gaps, 50))
            out["intertoken_p99_s"] = float(np.percentile(gaps, 99))
        return out

    # -- scheduler ----------------------------------------------------------

    def _n_pages_for(self, total_tokens: int) -> int:
        return -(-total_tokens // self.page_size)

    def _alloc(self, n: int) -> List[int]:
        """Allocate, reclaiming refcount-0 prefix-cache pages under pressure."""
        short = n - self.allocator.available
        if short > 0 and self.prefix_cache is not None:
            self.allocator.release(self.prefix_cache.evict(short))
        return self.allocator.alloc(n)

    def _admit(self):
        for i in range(self.max_slots):
            if self.slots[i] is not None or not self.queue:
                continue
            req = self.queue[0]
            hit: List[int] = []
            if self.prefix_cache is not None and req.page_hashes:
                # cap the hit so at least one prompt token remains to prefill
                # (the final-position logits come from the prefill dispatch)
                usable = (int(req.plan.lengths[0]) - 1) // self.page_size
                hit = self.prefix_cache.lookup(req.page_hashes[:usable])
            evictable = self.prefix_cache.evictable if self.prefix_cache else 0
            if req.n_pages_needed - len(hit) > self.allocator.available + evictable:
                for p in hit:  # head-of-line waits; drop the taken references
                    self.prefix_cache.unref(p)
                break
            self.queue.pop(0)
            req.cache_refs = hit
            req.chunk_pos = len(hit) * self.page_size
            req.pages = self._alloc(req.n_pages_needed - len(hit))
            req.slot = i
            self.slots[i] = req
            self._tables[i, :] = self._parking
            self._tables[i, : len(hit)] = hit
            self._tables[i, len(hit) : len(hit) + len(req.pages)] = req.pages

    def _release(self, req: _PagedRequest):
        if self.prefix_cache is not None:
            for p in req.cache_refs:
                self.prefix_cache.unref(p)
            req.cache_refs = []
        self.allocator.release(req.pages)
        req.pages = []
        # park the slot's table so post-release decode writes never touch a
        # freed (possibly reassigned) page
        self._tables[req.slot, :] = self._parking
        self._lengths[req.slot] = 0
        self.slots[req.slot] = None
        req.slot = None
        req.done = True
        req.image_features = None

    def _prefill_tick(self, req: _PagedRequest):
        """Advance one request's prefill by at most one dispatch.

        Short prompts (≤ prefill_chunk) run the contiguous one-shot prefill +
        page commit; longer prompts advance one fixed-shape paged chunk per
        tick, so decoding slots interleave a roll between chunks instead of
        stalling behind the whole prompt (VERDICT r2 #1).

        Returns the final-position logits when the prompt is fully prefilled
        (caller finishes via :meth:`_finish_prefill` AFTER dispatching the
        other pending prefills — the first-token readback blocks, and doing it
        inline would serialize dispatch→readback per request), else None."""
        plan = req.plan
        total = int(plan.lengths[0])
        req.prompt_len = total
        # a prefix-cache hit (chunk_pos > 0) always takes the chunked path —
        # the one-shot contiguous prefill cannot start mid-prompt
        if total <= self.prefill_chunk and req.chunk_pos == 0:
            logits, cache = self._prefiller.prefill(plan, req.image_features, 0)
            n_pages = self._n_pages_for(total)
            # commit the scratch cache's valid rows into the request's pages;
            # the scratch cache length is a prompt-bucket multiple (page-aligned)
            self.k_pool, self.v_pool = _commit_pages_jit(
                cache.k,
                cache.v,
                self.k_pool,
                self.v_pool,
                jnp.asarray(self._tables[req.slot])[None],
                jnp.asarray([n_pages], jnp.int32),
                self.page_size,
                use_kernel=self._page_commit_kernel,
            )
            return logits

        c0 = req.chunk_pos
        # Final-chunk width buckets down to the prompt bucket instead of
        # padding to prefill_chunk: a 2148-token prompt runs 1024+1024+128
        # (same FLOPs as the one-shot bucket) rather than 3×1024.  Program
        # count stays bounded: one per bucketed width ≤ prefill_chunk.
        remaining = max(1, total - c0)
        chunk = min(
            self.prefill_chunk,
            -(-remaining // self._chunk_bucket) * self._chunk_bucket,
        )
        m = plan.token_ids.shape[1]
        csize = max(0, min(chunk, m - c0))
        pad = chunk - csize

        def cut(a, fill=0):
            part = a[:, c0 : c0 + csize]
            if pad:
                part = np.pad(part, ((0, 0), (0, pad)), constant_values=fill)
            return jnp.asarray(part)

        feats = req.image_features
        if feats is None:
            d = self.params["language_model"]["embed_tokens"].shape[1]
            feats = jnp.zeros((1, d), self.params["language_model"]["embed_tokens"].dtype)
        logits, self.k_pool, self.v_pool = _paged_prefill_chunk_jit(
            self.params,
            self.cfg,
            cut(plan.token_ids),
            cut(plan.is_image),
            cut(plan.image_index),
            feats,
            cut(plan.positions),
            jnp.asarray([c0], jnp.int32),
            jnp.asarray([min(total - c0, chunk)], jnp.int32),
            jnp.asarray(self._tables[req.slot])[None],
            self.k_pool,
            self.v_pool,
            self.page_size,
            self.attn_impl,
            self.moe_impl,
        )
        req.chunk_pos = c0 + chunk
        if req.chunk_pos >= total:
            return logits
        return None

    def _chunk_width(self, req) -> int:
        """Next paged-prefill chunk width for ``req``: remaining prompt
        bucketed up to ``_chunk_bucket`` multiples, capped at prefill_chunk
        (the final-chunk bucketing rule of _prefill_tick)."""
        total = int(req.plan.lengths[0])
        remaining = max(1, total - req.chunk_pos)
        return min(
            self.prefill_chunk,
            -(-remaining // self._chunk_bucket) * self._chunk_bucket,
        )

    def _prefill_chunk_group(self, reqs):
        """Advance B chunked prefills (equal next-chunk width) one chunk each
        in ONE batched dispatch — text AND multimodal rows mix freely.

        This is what makes prefix-cache hits profitable: a hit resumes
        mid-prompt (chunk_pos > 0), which the contiguous batched-shorts path
        cannot do, and per-request chunk dispatches each pay the full int8
        weight stream — measured 2× slower end-to-end than no cache at all on
        the shared-system-prompt workload.  Batch pads to a power of two with
        replica rows committed to the parking page.

        Multimodal rows: each request's projected features concatenate into
        one [R, D] matrix and its plan's (globally-indexed) ``image_index``
        shifts by the rows before it; R pads to a 2048-row bucket so the
        program count stays (B, width, R-bucket), not per tile-count combo.
        Returns [(req, logits_row)] for rows whose prompt completed."""
        width = self._chunk_width(reqs[0])
        bb = 1
        while bb < len(reqs):
            bb *= 2
        rows = list(reqs) + [reqs[0]] * (bb - len(reqs))

        def cut(plan, c0, a, fill=0):
            m = a.shape[1]
            csize = max(0, min(width, m - c0))
            part = a[:, c0 : c0 + csize]
            if width - csize:
                part = np.pad(part, ((0, 0), (0, width - csize)), constant_values=fill)
            return part

        offsets, parts, off = {}, [], 0
        for r in reqs:
            if r.image_features is not None:
                offsets[r.request_id] = off
                parts.append(r.image_features)
                off += int(r.image_features.shape[0])

        tok, isi, idx, pos, starts, lens, tables = [], [], [], [], [], [], []
        for i, r in enumerate(rows):
            plan, c0 = r.plan, r.chunk_pos
            total = int(plan.lengths[0])
            tok.append(cut(plan, c0, plan.token_ids))
            isi.append(cut(plan, c0, plan.is_image))
            idx.append(cut(plan, c0, plan.image_index) + offsets.get(r.request_id, 0))
            pos.append(cut(plan, c0, plan.positions))
            starts.append(c0)
            lens.append(min(total - c0, width))
            if i < len(reqs):
                tables.append(self._tables[r.slot])
            else:  # replica pad row: all writes land on the parking page
                tables.append(np.full(self.max_pages, self._parking, np.int32))

        d = self.params["language_model"]["embed_tokens"].shape[1]
        fdtype = self.params["language_model"]["embed_tokens"].dtype
        if parts:
            feats = jnp.concatenate([jnp.asarray(p, fdtype) for p in parts], axis=0)
            rb = -(-int(feats.shape[0]) // 2048) * 2048  # R-bucket: bound program count
            if rb > feats.shape[0]:
                feats = jnp.concatenate([feats, jnp.zeros((rb - feats.shape[0], d), fdtype)])
        else:
            feats = jnp.zeros((1, d), fdtype)
        logits, self.k_pool, self.v_pool = _paged_prefill_chunk_jit(
            self.params,
            self.cfg,
            jnp.asarray(np.concatenate(tok)),
            jnp.asarray(np.concatenate(isi)),
            jnp.asarray(np.concatenate(idx)),
            feats,
            jnp.asarray(np.concatenate(pos)),
            jnp.asarray(np.asarray(starts, np.int32)),
            jnp.asarray(np.asarray(lens, np.int32)),
            jnp.asarray(np.stack(tables)),
            self.k_pool,
            self.v_pool,
            self.page_size,
            self.attn_impl,
            self.moe_impl,
        )
        finished = []
        for i, r in enumerate(reqs):
            total = int(r.plan.lengths[0])
            r.prompt_len = total
            r.chunk_pos += width
            if r.chunk_pos >= total:
                finished.append((r, logits[i : i + 1]))
        return finished

    def _bucket_shorts(self, reqs):
        """Group pending short prompts by power-of-two length bucket.

        Grouping key = prompt length rounded up to a power-of-two multiple of
        the prompt bucket (128, 256, 512, …, prefill_chunk), so a 71-token
        prompt never pads to a 499-token peer's width.  Program count stays
        bounded: ≤ log2(prefill_chunk/bucket)+1 widths × log2(max_slots)+1
        batch sizes.  Each group is further split so B × width stays under
        ``prefill_batch_tokens`` — the batched dispatch materializes a
        [B, width] scratch KV cache, and an unbounded group (16 × 2048 ≈ 2 GB
        at the 13B geometry) OOMs a chip that holds the weights + page pool."""
        groups = {}
        for r in reqs:
            n = int(r.plan.lengths[0])
            b = self._prompt_bucket
            while b < n:
                b *= 2
            groups.setdefault(min(b, self.prefill_chunk), []).append(r)
        out = []
        for width in sorted(groups):
            g = groups[width]
            cap = max(1, self.prefill_batch_tokens // width)
            out.extend(g[i : i + cap] for i in range(0, len(g), cap))
        return out

    def _prefill_shorts(self, reqs):
        """ONE batched contiguous prefill + page commit for several short
        text-only prompts.

        A lone short prompt underfills the MXU and its dispatch pays the full
        int8 weight stream; stacking the pending shorts into a [B, bucket]
        prefill amortizes both (the dominant serving cost after the decode
        roll — see BENCH.md).  B pads to a power of two (bounded program
        count) with replica rows committed to the parking page; lengths pad
        to the longest request's prompt bucket.  Returns logits [B, V]
        (device; caller reads back after queueing the other dispatches).
        """
        bb = 1
        while bb < len(reqs):
            bb *= 2
        n_pad = bb - len(reqs)
        batch_ids = [r.input_ids for r in reqs] + [reqs[0].input_ids] * n_pad
        # pin the width to the group's power-of-two bucket (the same key
        # _bucket_shorts grouped on) so program count stays bounded by
        # pow2-width × pow2-batch combinations
        width = self._prompt_bucket
        while width < max(int(r.plan.lengths[0]) for r in reqs):
            width *= 2
        plan = self._prefiller.plan(batch_ids, pad_to=min(width, self.prefill_chunk))
        logits, cache = self._prefiller.prefill(plan, None, 0)
        tables = np.concatenate(
            [
                np.stack([self._tables[r.slot] for r in reqs]),
                np.full((n_pad, self.max_pages), self._parking, np.int32),
            ]
            if n_pad
            else [np.stack([self._tables[r.slot] for r in reqs])]
        )
        n_pages = np.zeros((bb,), np.int32)
        for i, r in enumerate(reqs):
            r.prompt_len = int(plan.lengths[i])
            n_pages[i] = self._n_pages_for(r.prompt_len)
        self.k_pool, self.v_pool = _commit_pages_jit(
            cache.k,
            cache.v,
            self.k_pool,
            self.v_pool,
            jnp.asarray(tables),
            jnp.asarray(n_pages),
            self.page_size,
            use_kernel=self._page_commit_kernel,
        )
        return logits

    def _finish_prefill(self, req: _PagedRequest, logits):
        if req.samples:
            from omchat_tpu.ops.sampling import sample

            first = int(np.asarray(sample(logits, self._next_key(), req.generation))[0])
        else:
            first = int(np.asarray(greedy(logits))[0])
        self._finish_with_token(req, first, logits)

    def _publish_prefix_pages(self, req: _PagedRequest):
        """After a completed prefill, publish the freshly written immutable
        prompt pages (everything page_hashes addresses beyond the admission
        hit) to the prefix cache; published pages transfer ownership to the
        cache and become held references instead."""
        n_hit = len(req.cache_refs)
        moved = set()
        for j in range(n_hit, len(req.page_hashes)):
            p = req.pages[j - n_hit]
            if self.prefix_cache.publish(req.page_hashes[j], p):
                req.cache_refs.append(p)
                moved.add(j - n_hit)
        if moved:
            req.pages = [p for k, p in enumerate(req.pages) if k not in moved]

    def _finish_with_token(self, req: _PagedRequest, first: int, logits_row=None):
        req.prefilled = True
        req.last_token = first
        now = time.perf_counter()
        req.ttft = now - req.submit_t
        self._ttfts.append(req.ttft)
        if self.prefix_cache is not None and req.page_hashes:
            self._publish_prefix_pages(req)
        self._lengths[req.slot] = req.prompt_len
        if first == req.eos_token_id:
            self._release(req)
        else:
            req.generated.append(first)
            if req.logprobs and logits_row is not None:
                from omchat_tpu.runtime.generate import _chosen_logprob_jit, _top_logprobs_jit

                row = logits_row if logits_row.ndim == 2 else logits_row[None]
                req.lp_list.append(
                    float(np.asarray(_chosen_logprob_jit(row, jnp.asarray([first])))[0])
                )
                tl, ti = _top_logprobs_jit(row, LOGPROBS_K)
                req.top_list.append(
                    [(int(t), float(v)) for t, v in zip(np.asarray(ti)[0], np.asarray(tl)[0])]
                )
            req.token_times.append(now)
            if len(req.generated) >= req.max_new_tokens:
                self._release(req)

    def step(self):
        self._sweep_cancelled()
        self._encode_pending()
        self._admit()
        # Advance EVERY pending prefill per tick, then roll.  Pending short
        # text-only prompts ride ONE batched prefill dispatch; long/multimodal
        # prompts advance one chunk each (prefill/decode interleave).  Serving
        # throughput is dominated by slot occupancy: prefilling one slot per
        # tick while rolling decode_roll tokens desynchronizes the batch
        # (early slots finish before late ones start — measured ~4/8 average
        # occupancy).  Decode stall per tick stays bounded at one batched
        # prefill + n_pending × one chunk.
        pending = [r for r in self.slots if r is not None and not r.prefilled]
        shorts = [
            r
            for r in pending
            if r.image_features is None
            and r.chunk_pos == 0
            and int(r.plan.lengths[0]) <= self.prefill_chunk
        ]
        batches = []
        if len(shorts) >= 2:
            # Length-bucketed groups, one batched dispatch each: padding every
            # prompt to the longest member's bucket costs more than the extra
            # per-group weight streams (measured [16,512] 367 ms vs bucketed
            # groups 225 ms at the mixed workload's length spread —
            # dev/exp_prefill_phase.py).
            for group in self._bucket_shorts(shorts):
                batches.append((group, self._prefill_shorts(group)))
            pending = [r for r in pending if r not in shorts]
        finished_prefills = []
        # CHUNKED prefills (prefix-cache resumes, long prompts, multimodal)
        # with the same next-chunk width advance together in one dispatch —
        # per-request chunk dispatches each pay the full weight stream.
        chunked = list(pending)
        if len(chunked) >= 2:
            groups = {}
            for r in chunked:
                groups.setdefault(self._chunk_width(r), []).append(r)
            taken = []
            for w in sorted(groups):
                g = groups[w]
                if len(g) < 2:
                    continue
                budget = self.prefill_batch_tokens
                if any(r.image_features is not None for r in g):
                    # multimodal rows add the concatenated feature matrix and
                    # fatter fusion temporaries to the dispatch's peak; on a
                    # 13B chip at ~95% HBM even [2, 2048] OOMs, so cap these
                    # groups at the per-request chunk's own footprint — full-
                    # width first chunks stay per-request, the narrower tail
                    # chunks (and prefix-resume suffixes) still batch
                    budget = min(budget, self.prefill_chunk)
                cap = max(1, budget // w)
                if cap < 2:
                    continue  # batching one row buys nothing over _prefill_tick
                for i in range(0, len(g), cap):
                    sub = g[i : i + cap]
                    if len(sub) < 2:
                        continue  # remainder row rides the per-request path
                    finished_prefills.extend(self._prefill_chunk_group(sub))
                    taken.extend(sub)
            pending = [r for r in pending if r not in taken]
        for req in pending:
            logits = self._prefill_tick(req)
            if logits is not None:
                finished_prefills.append((req, logits))
        # first-token readbacks AFTER every dispatch is queued: the device
        # works on prefill i+1 while the host reads prefill i's logits
        for breqs, blogits in batches:
            greedy_toks = None
            for i, r in enumerate(breqs):
                if r.samples:
                    from omchat_tpu.ops.sampling import sample

                    first = int(
                        np.asarray(sample(blogits[i : i + 1], self._next_key(), r.generation))[0]
                    )
                else:
                    if greedy_toks is None:  # ONE readback for the whole batch
                        greedy_toks = np.asarray(greedy(blogits))
                    first = int(greedy_toks[i])
                self._finish_with_token(r, first, blogits[i : i + 1])
        for req, logits in finished_prefills:
            self._finish_prefill(req, logits)

        if self._inflight is not None:
            # Pipelined rolls: dispatch the successor from device-side tokens
            # BEFORE reading this roll back (keeps the chip busy through the
            # readback + bookkeeping below), unless the scheduler state
            # changed (new admissions, cancels) — then just drain.
            h, self._inflight = self._inflight, None
            nxt = None
            if (
                self._can_extend(h["decoding"])
                and all(not r.done for r in h["decoding"])
                # the in-flight roll advances each request by up to its roll;
                # extending when every member will already be at budget after
                # it would burn a full roll of pure garbage (measured ~5% of
                # the burst workload's wall when all requests finish together)
                and any(
                    len(r.generated) + h["roll"] < r.max_new_tokens
                    for r in h["decoding"]
                )
            ):
                nxt = self._extend_roll(h)
            self._process_roll(h)
            self._inflight = nxt
            return
        decoding = [r for r in self.slots if r is not None and r.prefilled and r.last_token is not None]
        if not decoding:
            return
        # throughput mode: roll only when every ADMITTED start is in the
        # batch (queued-but-unadmitted requests wait on slots/pages that only
        # decode progress frees — stalling on them would deadlock)
        if self.prefill_priority and any(
            r is not None and not r.prefilled for r in self.slots
        ):
            return
        # speculative verify (greedy-only): when any slot's prompt-lookup
        # proposes a draft, one batched verify dispatch advances slots by up
        # to draft_len+1 tokens; draft-less ticks run the normal roll
        if self.speculative and not any(r.samples or r.logprobs for r in decoding):
            if self._speculative_tick(decoding):
                return
        active = np.zeros(self.max_slots, bool)
        for r in decoding:
            self._tokens[r.slot] = r.last_token
            active[r.slot] = True
        # Inactive slots' decode writes must land on the parking page.  A slot
        # mid-chunked-prefill has real pages in its table row (set at
        # admission) — pass it parked, or the roll would scribble K/V over the
        # chunks already committed.
        tables_dec = np.where(active[:, None], self._tables, self._parking)
        # Adaptive roll: shrink to streaming_roll while any decoding request
        # has a streaming consumer attached (tokens surface per roll), else
        # run the full throughput roll.
        roll = (
            self.streaming_roll
            if self.streaming_roll and any(r.streaming for r in decoding)
            else self.decode_roll
        )
        # Slice the table width to the pages reachable THIS dispatch: the
        # decode kernel's grid is (S, table_width) per layer, so at low fill
        # a full-width table is mostly dead grid steps (a 4096-cap table is
        # 32 pages while a fresh request sits at 2-5).  Width is bucketed
        # (powers of two) so compiles stay bounded; +roll covers the
        # tokens written during the dispatch.
        max_need = int(max(self._lengths[r.slot] for r in decoding)) + roll
        need_pages = -(-max_need // self.page_size)
        width = 4
        while width < need_pages:
            width *= 2
        width = min(width, tables_dec.shape[1])
        tables_dec = tables_dec[:, :width]
        # Multi-step roll every tick: long prompts advance one chunk per tick
        # (above), so a roll between chunks is exactly the prefill/decode
        # interleave — decoding slots never stall behind a whole prompt, and a
        # waiting request's admission is delayed by at most one chunk + one
        # roll (the documented throughput/latency trade).
        handle = self._dispatch_roll(
            decoding, roll, active, tables_dec,
            jnp.asarray(self._tokens), np.array(self._lengths),
        )
        if self.pipeline_rolls and self._can_extend(decoding):
            # pipelined rolls: leave this dispatch in flight; the NEXT tick
            # dispatches its successor from device-side tokens BEFORE reading
            # these results, so the readback/bookkeeping gap overlaps device
            # work instead of idling the chip
            self._inflight = handle
            return
        self._process_roll(handle)

    def _can_extend(self, decoding) -> bool:
        """A roll may stay in flight (and its successor dispatch from device
        tokens) only while the scheduler has nothing that would change the
        decoding set: no queued admissions, no mid-prefill slot, no
        cancellations, and no speculative drafts wanting host context."""
        return (
            not self.queue
            and not any(r is not None and not r.prefilled for r in self.slots)
            and not any(r.cancelled for r in decoding)
            and not self.speculative
        )

    def _dispatch_roll(self, decoding, roll, active, tables_dec, tokens_dev, lengths_np):
        """Issue one decode roll WITHOUT reading results back.  Returns the
        in-flight handle consumed by :meth:`_process_roll` (or extended by
        :meth:`_extend_roll`)."""
        any_sampled = any(r.samples for r in decoding)
        sample_args = {}
        if any_sampled:
            do_sample = np.zeros(self.max_slots, bool)
            temperature = np.ones(self.max_slots, np.float32)
            top_k = np.zeros(self.max_slots, np.int32)
            top_p = np.ones(self.max_slots, np.float32)
            for r in decoding:
                if r.samples:
                    g = r.generation
                    do_sample[r.slot] = True
                    temperature[r.slot] = g.temperature
                    top_k[r.slot] = g.top_k
                    top_p[r.slot] = g.top_p
            sample_args = dict(
                rng_key=self._next_key(),
                do_sample=jnp.asarray(do_sample),
                temperature=jnp.asarray(temperature),
                top_k=jnp.asarray(top_k),
                top_p=jnp.asarray(top_p),
            )
        any_lp = any(r.logprobs for r in decoding)
        if roll == 1:
            out, self.k_pool, self.v_pool = _paged_decode_step_jit(
                self.params, self.cfg, tokens_dev,
                jnp.asarray(lengths_np), jnp.asarray(active), jnp.asarray(tables_dec),
                self.k_pool, self.v_pool, self.page_size, self.attn_impl,
                self.moe_impl, any_sampled=any_sampled, logprobs=any_lp,
                **sample_args,
            )
            toks_dev = (out[0] if any_lp else out)[None]  # [1, S]
            lp_dev = (out[1][None], out[2][None], out[3][None]) if any_lp else None
        else:
            toks, self.k_pool, self.v_pool = _paged_decode_roll_jit(
                self.params, self.cfg, tokens_dev,
                jnp.asarray(lengths_np), jnp.asarray(active), jnp.asarray(tables_dec),
                self.k_pool, self.v_pool, self.page_size, self.attn_impl,
                roll, self.moe_impl, any_sampled=any_sampled, logprobs=any_lp,
                **sample_args,
            )
            if any_lp:
                toks, chosen, top_v, top_i = toks
                lp_dev = (chosen, top_v, top_i)
            else:
                lp_dev = None
            toks_dev = toks  # [roll, S]
        return {
            "decoding": list(decoding),
            "slots": [r.slot for r in decoding],
            "roll": roll,
            "active": active,
            "toks_dev": toks_dev,
            "lp_dev": lp_dev,
            "lengths_next": lengths_np + roll * active.astype(np.int32),
        }

    def _extend_roll(self, h):
        """Dispatch the successor of an in-flight roll from its device-side
        final tokens (no host round trip), using lengths advanced by the full
        roll for every active slot — finished requests keep decoding into
        their allocated headroom and the surplus is discarded at processing."""
        roll = h["roll"]
        lengths_np = h["lengths_next"]
        decoding = h["decoding"]
        # table width may need the next power-of-two bucket as fills grow
        active = h["active"]
        tables_full = np.where(active[:, None], self._tables, self._parking)
        max_need = int(max(lengths_np[s] for s in h["slots"])) + roll
        need_pages = -(-max_need // self.page_size)
        width = 4
        while width < need_pages:
            width *= 2
        width = min(width, tables_full.shape[1])
        return self._dispatch_roll(
            decoding, roll, active, tables_full[:, :width],
            h["toks_dev"][-1], lengths_np,
        )

    def _process_roll(self, h):
        """Read an in-flight roll's tokens back and run the per-request
        bookkeeping (EOS/budget releases, latency windows, logprobs)."""
        toks_np = np.asarray(h["toks_dev"])  # [roll, S]
        lp_np = tl_np = ti_np = None
        if h["lp_dev"] is not None:
            lp_np = np.asarray(h["lp_dev"][0])
            tl_np = np.asarray(h["lp_dev"][1])
            ti_np = np.asarray(h["lp_dev"][2])
        tick_now = time.perf_counter()  # tokens in a roll arrive together
        for r, slot in zip(h["decoding"], h["slots"]):
            if r.done:
                continue  # released while this roll was in flight (cancel)
            for i in range(toks_np.shape[0]):
                tok = int(toks_np[i, slot])
                # device-side lengths advanced by the full roll for active
                # slots; continuing requests consume every step, finished ones
                # are released (pages freed), so host lengths stay in sync
                self._lengths[slot] += 1
                r.last_token = tok
                if tok == r.eos_token_id:
                    self._release(r)
                    break
                r.generated.append(tok)
                if r.logprobs and lp_np is not None:
                    r.lp_list.append(float(lp_np[i, slot]))
                    r.top_list.append(
                        [
                            (int(t), float(v))
                            for t, v in zip(ti_np[i, slot], tl_np[i, slot])
                        ]
                    )
                if r.token_times and tick_now > r.token_times[-1]:
                    self._gaps.append(tick_now - r.token_times[-1])
                r.token_times.append(tick_now)
                if len(r.generated) >= r.max_new_tokens:
                    self._release(r)
                    break

    def _speculative_tick(self, decoding) -> bool:
        """One batched verify dispatch for the decoding slots; returns False
        (caller falls back to the roll) when no slot proposes a draft."""
        from omchat_tpu.runtime.speculative import propose_draft

        t_chunk = self.draft_len + 1
        propose = self.draft_fn or (
            lambda ctx: propose_draft(ctx, ngram=self.draft_ngram, k=self.draft_len)
        )
        drafts: Dict[int, List[int]] = {}
        any_draft = False
        for r in decoding:
            d = [int(x) for x in propose(r.lookup_base + r.generated)[: self.draft_len]]
            drafts[r.slot] = d
            any_draft = any_draft or bool(d)
        if not any_draft:
            return False
        self._spec_probe += 1
        if self._spec_ema < 0.5 and self._spec_probe % 32 != 0:
            return False  # drafts aren't accepting; keep the throughput roll
        toks = np.zeros((self.max_slots, t_chunk), np.int32)
        active = np.zeros(self.max_slots, bool)
        for r in decoding:
            toks[r.slot, 0] = r.last_token
            d = drafts[r.slot]
            if d:
                toks[r.slot, 1 : 1 + len(d)] = d
            active[r.slot] = True
        tables_full = np.where(active[:, None], self._tables, self._parking)
        max_need = int(max(self._lengths[r.slot] for r in decoding)) + t_chunk
        need_pages = -(-max_need // self.page_size)
        width = 4
        while width < need_pages:
            width *= 2
        width = min(width, tables_full.shape[1])
        out, self.k_pool, self.v_pool = _paged_verify_jit(
            self.params,
            self.cfg,
            jnp.asarray(toks),
            jnp.asarray(self._lengths),
            jnp.asarray(active),
            jnp.asarray(tables_full[:, :width]),
            self.k_pool,
            self.v_pool,
            self.page_size,
            self.attn_impl,
            self.moe_impl,
        )
        out_np = np.asarray(out)  # [S, T] greedy continuation per position
        tick_now = time.perf_counter()
        self.spec_dispatches += 1
        delivered_before = self.spec_tokens
        for r in decoding:
            g = out_np[r.slot]
            d = drafts[r.slot]
            n_acc = 0
            while n_acc < len(d) and d[n_acc] == int(g[n_acc]):
                n_acc += 1
            # accepted draft prefix + the model's own token at the first
            # disagreement (the "bonus" token on full acceptance)
            for tok in d[:n_acc] + [int(g[n_acc])]:
                self.spec_tokens += 1
                self._lengths[r.slot] += 1
                r.last_token = tok
                if tok == r.eos_token_id:
                    self._release(r)
                    break
                r.generated.append(tok)
                if r.token_times and tick_now > r.token_times[-1]:
                    self._gaps.append(tick_now - r.token_times[-1])
                r.token_times.append(tick_now)
                if len(r.generated) >= r.max_new_tokens:
                    self._release(r)
                    break
        a_mean = (self.spec_tokens - delivered_before) / max(len(decoding), 1) - 1.0
        self._spec_ema = 0.7 * self._spec_ema + 0.3 * a_mean
        return True

    def run_to_completion(self, max_ticks: int = 100000):
        ticks = 0
        while self.has_work() and ticks < max_ticks:
            self.step()
            ticks += 1
        return ticks
