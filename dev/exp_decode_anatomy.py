"""Decompose the paged decode step and A/B two kernel revisions.

BENCH.md's decode anatomy stops at "issue/grid-bound per page (~3.9 us at
ps=128)".  This harness splits a B=16 decode step into (a) everything but
attention (weight stream + matmuls + scatter + sampling: run the step with
paged attention stubbed to identity), (b) the standalone attention kernel at
the same shapes, and A/Bs two kernel revisions against the shipped one:

- ``pair``: two pages per grid step (two scalar-prefetched KV blocks, one
  softmax update over [G, 2*ps]) — halves the per-step grid/pipeline
  overhead that dominates at ps=128;
- ``bh``: batched-head softmax (one dot_general over the kv-head batch dim,
  one flattened online-softmax update instead of a KVH-unrolled loop) —
  fewer VPU instruction streams per page.

    python dev/exp_decode_anatomy.py            # kernel A/Bs + full step
    python dev/exp_decode_anatomy.py --skip-attn  # step with attention stubbed
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from omchat_tpu.ops.flash_attention import DEFAULT_MASK_VALUE  # noqa: E402

N_REP = 30
PS = 128


def _round_up(n, m):
    return (n + m - 1) // m * m


# -- variant "pair": two pages per grid step ---------------------------------


def _pair_kernel(
    lengths_ref, tables_ref, q_ref, k0_ref, v0_ref, k1_ref, v1_ref, o_ref,
    m_s, l_s, acc_s, *, sm_scale, page_size, num_steps,
):
    b = pl.program_id(0)
    ki = pl.program_id(1)
    length = lengths_ref[b]

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    @pl.when(2 * ki * page_size < length)
    def _run():
        kvh, g_pad, _ = q_ref.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (g_pad, 2 * page_size), 1) + 2 * ki * page_size
        mask = col < length
        for h in range(kvh):
            q = q_ref[h]
            s0 = jax.lax.dot_general(
                q, k0_ref[h].astype(q.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s1 = jax.lax.dot_general(
                q, k1_ref[h].astype(q.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = jnp.concatenate([s0, s1], axis=1) * sm_scale
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            m_prev, l_prev = m_s[h], l_s[h]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_s[h] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_s[h] = m_next
            v = jnp.concatenate(
                [v0_ref[h].astype(q.dtype), v1_ref[h].astype(q.dtype)], axis=0
            )
            acc_s[h] = acc_s[h] * alpha[:, : acc_s.shape[2]] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

    @pl.when(ki == num_steps - 1)
    def _store():
        l = l_s[...][:, :, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[...] = (acc_s[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def paged_decode_pair(q, k_pages, v_pages, lengths, page_tables):
    B, S, H, D = q.shape
    _, KVH, page_size, _ = k_pages.shape
    group = H // KVH
    g_pad = max(8, _round_up(group, 8))
    max_pages = page_tables.shape[1]
    n_steps = -(-max_pages // 2)

    qg = q[:, 0].reshape(B, KVH, group, D)
    if g_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))
    lengths = jnp.asarray(lengths, jnp.int32)
    page_tables = jnp.asarray(page_tables, jnp.int32)

    def q_index(b, ki, lens, tables):
        return (b, 0, 0, 0)

    def kv_index(j):
        def f(b, ki, lens, tables):
            last = jnp.maximum(pl.cdiv(lens[b], page_size) - 1, 0)
            return (tables[b, jnp.minimum(2 * ki + j, last)], 0, 0, 0)

        return f

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_steps),
        in_specs=[
            pl.BlockSpec((None, KVH, g_pad, D), q_index),
            pl.BlockSpec((None, KVH, page_size, D), kv_index(0)),
            pl.BlockSpec((None, KVH, page_size, D), kv_index(0)),
            pl.BlockSpec((None, KVH, page_size, D), kv_index(1)),
            pl.BlockSpec((None, KVH, page_size, D), kv_index(1)),
        ],
        out_specs=pl.BlockSpec((None, KVH, g_pad, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((KVH, g_pad, 128), jnp.float32),
            pltpu.VMEM((KVH, g_pad, 128), jnp.float32),
            pltpu.VMEM((KVH, g_pad, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _pair_kernel, sm_scale=D**-0.5, page_size=page_size, num_steps=n_steps
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, g_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(lengths, page_tables, qg, k_pages, v_pages, k_pages, v_pages)
    return out[:, :, :group].reshape(B, 1, H, D)


# -- variant "bh": batched-head softmax ---------------------------------------


def _bh_kernel(
    lengths_ref, tables_ref, q_ref, k_ref, v_ref, o_ref, m_s, l_s, acc_s,
    *, sm_scale, page_size, num_blocks,
):
    b = pl.program_id(0)
    ki = pl.program_id(1)
    length = lengths_ref[b]

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full(m_s.shape, -jnp.inf, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    @pl.when(ki * page_size < length)
    def _run():
        kvh, g_pad, d = q_ref.shape
        q = q_ref[...]  # [KVH, G, D]
        k = k_ref[...].astype(q.dtype)  # [KVH, ps, D]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # [KVH, G, ps]
        s = s * sm_scale
        col = jax.lax.broadcasted_iota(jnp.int32, (kvh, g_pad, page_size), 2) + ki * page_size
        s = jnp.where(col < length, s, DEFAULT_MASK_VALUE)
        m_prev, l_prev = m_s[...], l_s[...]
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :, :1])
        l_s[...] = alpha * l_prev + jnp.sum(p, axis=2, keepdims=True)
        m_s[...] = m_next
        v = v_ref[...].astype(q.dtype)  # [KVH, ps, D]
        acc_s[...] = acc_s[...] * alpha[:, :, : acc_s.shape[2]] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == num_blocks - 1)
    def _store():
        l = l_s[...][:, :, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[...] = (acc_s[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def paged_decode_bh(q, k_pages, v_pages, lengths, page_tables):
    B, S, H, D = q.shape
    _, KVH, page_size, _ = k_pages.shape
    group = H // KVH
    g_pad = max(8, _round_up(group, 8))
    max_pages = page_tables.shape[1]

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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, max_pages),
        in_specs=[
            pl.BlockSpec((None, KVH, g_pad, D), q_index),
            pl.BlockSpec((None, KVH, page_size, D), kv_index),
            pl.BlockSpec((None, KVH, page_size, D), kv_index),
        ],
        out_specs=pl.BlockSpec((None, KVH, g_pad, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((KVH, g_pad, 128), jnp.float32),
            pltpu.VMEM((KVH, g_pad, 128), jnp.float32),
            pltpu.VMEM((KVH, g_pad, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _bh_kernel, sm_scale=D**-0.5, page_size=page_size, num_blocks=max_pages
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, g_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(lengths, page_tables, qg, k_pages, v_pages)
    return out[:, :, :group].reshape(B, 1, H, D)


def timeit(fn, n=N_REP):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def kernel_ab(rng):
    """Standalone attention kernel timings at the serving shapes."""
    from omchat_tpu.ops.paged_attention import paged_decode_attention, paged_flash_decode

    B, H, KVH, D = 16, 28, 4, 128
    res = {}
    for fills, tag in [
        ([512] * B, "fill512"),
        ([2048] * B, "fill2048"),
        # the bench_serving mix: 12 text 64-512, 4 multimodal ~2300
        ([2300, 300, 180, 460, 2300, 90, 400, 250, 2300, 510, 70, 330, 2300, 200, 450, 120], "mixed"),
    ]:
        max_fill = max(fills)
        width = 4
        while width * PS < max_fill + 16:
            width *= 2
        num_pages = sum(-(-f // PS) for f in fills) + 2
        pool = (num_pages + 1, KVH, PS, D)
        kp = jnp.asarray(rng.standard_normal(pool), jnp.bfloat16)
        vp = jnp.asarray(rng.standard_normal(pool), jnp.bfloat16)
        tables = np.full((B, width), num_pages, np.int32)
        nxt = 0
        for i, f in enumerate(fills):
            n = -(-f // PS)
            tables[i, :n] = np.arange(nxt, nxt + n)
            nxt += n
        tables = jnp.asarray(tables)
        lengths = jnp.asarray(fills, jnp.int32)
        q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)

        ref = paged_decode_attention(q, kp, vp, lengths, tables, impl="xla")
        base = paged_flash_decode(q, kp, vp, lengths, tables)
        pair = paged_decode_pair(q, kp, vp, lengths, tables)
        bh = paged_decode_bh(q, kp, vp, lengths, tables)
        for name, o in [("base", base), ("pair", pair), ("bh", bh)]:
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))
            assert err < 0.05, (tag, name, err)

        res[f"{tag}_base_ms"] = round(timeit(lambda: paged_flash_decode(q, kp, vp, lengths, tables)), 3)
        res[f"{tag}_pair_ms"] = round(timeit(lambda: paged_decode_pair(q, kp, vp, lengths, tables)), 3)
        res[f"{tag}_bh_ms"] = round(timeit(lambda: paged_decode_bh(q, kp, vp, lengths, tables)), 3)
        live = sum(-(-f // PS) for f in fills)
        res[f"{tag}_live_pages"] = live
        print(f"[exp] {tag}: base {res[f'{tag}_base_ms']} pair {res[f'{tag}_pair_ms']} "
              f"bh {res[f'{tag}_bh_ms']} ms ({live} live pages, width {width})", flush=True)
    return res


def full_step(rng, skip_attn: bool, skip_write: bool = False, batches=(16,),
              kv_write_mode: str = "scatter"):
    """One full decode step (28-layer scan) — optionally with attention
    stubbed to identity, isolating the weight-stream + scatter + lm_head
    share."""
    import dataclasses

    import bench
    from omchat_tpu.config import OmChatConfig

    if skip_attn:
        import omchat_tpu.runtime.paged_engine as pe

        def stub(q, kp, vp, lengths, tables, impl=None, k_new=None, v_new=None):
            return q

        pe.paged_decode_attention = stub

    from omchat_tpu.runtime.paged_engine import _paged_decode_step_jit

    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    tc = cfg.text
    res = {}
    kv_write = "none" if skip_write else kv_write_mode
    # fill capped at 1024: B=16 x fill2048 needs a 289-page pool (4.3 GB both
    # pools) on top of the 14 GB weights — past one v5e chip (the engine's
    # own pool is 192 pages for the same reason)
    for fill, B in [(512, b) for b in batches] + ([(1024, 16)] if batches == (16,) else []):
        per = -(-fill // PS) + 2
        num_pages = B * per + 1
        shape = (tc.num_hidden_layers, num_pages + 1, tc.num_key_value_heads, PS, tc.attn_head_dim)
        kp, vp = jnp.zeros(shape, jnp.bfloat16), jnp.zeros(shape, jnp.bfloat16)
        width = 4
        while width * PS < fill + 16:
            width *= 2
        tables = np.full((B, width), num_pages, np.int32)
        nxt = 0
        for i in range(B):
            tables[i, :per] = np.arange(nxt, nxt + per)
            nxt += per
        tables = jnp.asarray(tables)
        tokens = jnp.asarray(rng.integers(2000, 20000, B), jnp.int32)
        lengths = jnp.full((B,), fill, jnp.int32)
        active = jnp.ones((B,), bool)

        def step(kp, vp):
            return _paged_decode_step_jit(
                params, cfg, tokens, lengths, active, tables, kp, vp, PS, "pallas", "dense",
                kv_write=kv_write,
            )

        toks, kp, vp = step(kp, vp)
        jax.block_until_ready(toks)
        t0 = time.perf_counter()
        for _ in range(N_REP):
            toks, kp, vp = step(kp, vp)
        jax.block_until_ready(toks)
        ms = (time.perf_counter() - t0) / N_REP * 1e3
        tag = "full" if not skip_attn else ("weightsonly" if skip_write else "noattn")
        if kv_write != "scatter" and not skip_write:
            tag += f"_{kv_write}"
        key = f"step_B{B}_fill{fill}_{tag}_ms"
        res[key] = round(ms, 2)
        print(f"[exp] {key}: {ms:.2f}", flush=True)
        del kp, vp
    return res


def single_stream(rng, batches=(1, 8)):
    """Contiguous-engine decode loop tok/s (the bench.py headline path):
    on-device while_loop over a bucketed cache, greedy."""
    import bench
    from omchat_tpu.config import OmChatConfig
    from omchat_tpu.models.qwen2 import init_kv_cache
    from omchat_tpu.runtime.generate import _decode_loop_jit

    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    jax.block_until_ready(params["language_model"]["norm"]["scale"])
    res = {}
    for B, T, fill, n_new in [(1, 5504, 5188, 128), (8, 384, 320, 48)]:
        if B not in batches:
            continue
        cache = init_kv_cache(cfg.text, B, T, jnp.bfloat16)
        first = jnp.asarray(rng.integers(2000, 20000, B), jnp.int32)
        kv_len = jnp.full((B,), fill, jnp.int32)
        out, n = _decode_loop_jit(params, cfg, first, kv_len, cache, n_new, -1, None)
        int(np.asarray(out)[0, -1])  # readback sync (block_until_ready is
        # unreliable over the axon tunnel for loop results)
        cache = init_kv_cache(cfg.text, B, T, jnp.bfloat16)
        int(np.asarray(cache.k[0, 0, 0, 0, 0] * 0))  # cache resident before t0
        t0 = time.perf_counter()
        out, n = _decode_loop_jit(params, cfg, first, kv_len, cache, n_new, -1, None)
        int(np.asarray(out)[0, -1])
        dt = time.perf_counter() - t0
        toks = B * (n_new - 1) / dt
        res[f"single_stream_B{B}_tok_s"] = round(toks, 2)
        print(f"[exp] contiguous decode B={B} fill={fill}: {toks:.2f} tok/s "
              f"({dt/ (n_new-1) * 1e3:.2f} ms/step)", flush=True)
        del cache
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-attn", action="store_true")
    ap.add_argument("--skip-write", action="store_true")
    ap.add_argument("--kv-write", default="scatter", choices=["scatter", "dus_loop", "kernel"])
    ap.add_argument("--batches", default=None, help="comma list of B for fill512, e.g. 1,4,16")
    ap.add_argument("--kernels-only", action="store_true")
    ap.add_argument("--single-stream", action="store_true")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    res = {}
    if args.single_stream:
        res.update(single_stream(rng))
    elif args.skip_attn:
        batches = tuple(int(b) for b in args.batches.split(",")) if args.batches else (16,)
        res.update(full_step(rng, skip_attn=True, skip_write=args.skip_write, batches=batches,
                             kv_write_mode=args.kv_write))
    elif args.kernels_only:
        res.update(kernel_ab(rng))
    else:
        res.update(kernel_ab(rng))
        res.update(full_step(rng, skip_attn=False))
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
