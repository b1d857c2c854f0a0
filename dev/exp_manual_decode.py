"""Manual-DMA paged decode kernel prototype vs the production auto-pipelined one.

The production kernel (ops/paged_attention.py) lets the Mosaic auto-pipeline
fetch one [KVH, ps, D] page per grid step; measured ~56-66 GB/s effective KV
streaming (grid/issue-bound, BENCH.md decode anatomy).  This prototype takes
manual control: grid (B,), each request walks its page list with an N-deep
ring of async copies (pages in flight while compute runs), all kv heads per
page, online softmax identical to production.

    python dev/exp_manual_decode.py
"""

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

NBUF = 4


def _kernel(lengths_ref, tables_ref, q_ref, k_hbm, v_hbm, o_ref,
            kbuf, vbuf, m_s, l_s, acc_s, sems, *, page_size, sm_scale):
    b = pl.program_id(0)
    length = lengths_ref[b]
    n_pages = pl.cdiv(length, page_size)
    kvh, g_pad, d = q_ref.shape

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

    # warmup: up to NBUF pages in flight
    for i in range(NBUF):
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
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * sm_scale
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            m_prev, l_prev = m_s[h], l_s[h]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])
            l_s[h] = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
            m_s[h] = m_next
            v = vbuf[slot, h].astype(q.dtype)
            acc_s[h] = acc_s[h] * alpha[:, : acc_s.shape[2]] + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        # refill this slot with the page NBUF ahead
        @pl.when(pi + NBUF < n_pages)
        def _():
            start(slot, pi + NBUF)
        return _

    jax.lax.fori_loop(0, n_pages, body, None)

    l = l_s[...][:, :, :1]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[...] = (acc_s[...] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def manual_paged_decode(q, k_pages, v_pages, lengths, tables, *, interpret=False):
    B, S, H, D = q.shape
    _, KVH, page_size, _ = k_pages.shape
    group = H // KVH
    g_pad = max(8, -(-group // 8) * 8)
    qg = q[:, 0].reshape(B, KVH, group, D)
    if g_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))
    lengths = jnp.asarray(lengths, jnp.int32)
    tables = jnp.asarray(tables, jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, KVH, g_pad, D), lambda b, lens, tabs: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, KVH, g_pad, D), lambda b, lens, tabs: (b, 0, 0, 0)),
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
        functools.partial(_kernel, page_size=page_size, sm_scale=D**-0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, g_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(lengths, tables, qg, k_pages, v_pages)
    return out[:, :, :group].reshape(B, 1, H, D)


def main():
    from omchat_tpu.ops.paged_attention import paged_flash_decode

    rng = np.random.default_rng(0)
    interpret = jax.default_backend() != "tpu"

    # correctness first (small)
    B, H, KVH, D, ps, P = 2, 28, 4, 128, 128, 40
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
    kp = jnp.asarray(rng.standard_normal((P, KVH, ps, D)), jnp.bfloat16)
    vp = jnp.asarray(rng.standard_normal((P, KVH, ps, D)), jnp.bfloat16)
    tables = jnp.asarray(np.stack([rng.permutation(P)[:16] for _ in range(B)]), jnp.int32)
    lengths = jnp.asarray([1500, 700], jnp.int32)
    ref = paged_flash_decode(q, kp, vp, lengths, tables, interpret=interpret)
    out = manual_paged_decode(q, kp, vp, lengths, tables, interpret=interpret)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"[exp] max abs err vs production kernel: {err:.5f}", flush=True)
    assert err < 0.05

    if interpret:
        print("[exp] CPU interpret mode: correctness only")
        return

    # perf at the painful geometry
    results = {}
    for S_, fill in ((16, 2048), (16, 512), (8, 2048)):
        per = -(-fill // ps) + 2
        P_ = S_ * per + 1
        mp = -(-4096 // ps) + 1
        kpp = jnp.zeros((P_, KVH, ps, D), jnp.bfloat16)
        vpp = jnp.zeros((P_, KVH, ps, D), jnp.bfloat16)
        tb = np.full((S_, mp), P_ - 1, np.int32)
        nxt = 0
        for s_ in range(S_):
            tb[s_, :per] = np.arange(nxt, nxt + per)
            nxt += per
        tb = jnp.asarray(tb)
        qq = jnp.asarray(rng.standard_normal((S_, 1, H, D)), jnp.bfloat16)
        ln = jnp.full((S_,), fill, jnp.int32)

        for name, fn in (("production", paged_flash_decode), ("manual", manual_paged_decode)):
            o = fn(qq, kpp, vpp, ln, tb)
            float(jnp.ravel(o)[0])
            t0 = time.perf_counter()
            for _ in range(30):
                o = fn(qq, kpp, vpp, ln, tb)
            float(jnp.ravel(o)[0])
            ms = (time.perf_counter() - t0) / 30 * 1000
            results[f"{name}_B{S_}_fill{fill}"] = round(ms, 3)
            print(f"[exp] {name} B{S_} fill{fill}: {ms:.3f} ms", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
