"""Where does the causal-kernel overhead go?  Pass-level ablation.

The production kernel (ops/flash_attention.py) measures 2.27 ms/layer at the
Qwen2-7B prefill shape vs a ~1.35 ms bare-matmul floor.  This harness runs a
self-contained copy of the kernel with individual softmax passes disabled
(numerically wrong on purpose) to price each component:

- full        : the production algorithm
- no_mask     : masked tiles run the interior fast path (prices the mask
                construction on diagonal/edge tiles)
- no_max      : fixed m=0 (prices the row-max reduce + m/l bookkeeping)
- no_sum      : skip the row-sum/l accounting (prices the sum reduce)
- no_alpha    : skip the acc rescale between kv tiles (prices the revisit)
- dots_only   : QK^T and PV only (the in-grid matmul floor)

    python dev/exp_causal_ablate.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LOG2E = 1.4426950408889634

B, S, H, KVH, D = 1, 5248, 28, 4, 128
T = 5504
KV_LEN = 5188
LAYERS = 28
BQ, BK = 448, 1024


def _kernel(scalars_ref, q_ref, k_ref, v_ref, o_ref, m_scratch, l_scratch, acc_scratch,
            *, num_kv_blocks, mode):
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
    row_max = qi * BQ + BQ - 1 + q_off
    needed = ((ki * BK) < kv_len) & ((ki * BK) <= row_max)
    col_end = ki * BK + BK - 1
    full = (col_end < kv_len) & (col_end <= qi * BQ + q_off)
    if mode == "no_mask":
        full = needed

    def _tile(masked):
        k = k_ref[...]
        v = v_ref[...]
        if masked:
            col_ids = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1) + ki * BK
            row_ids = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0) + qi * BQ + q_off
            mask = (col_ids < kv_len) & (col_ids <= row_ids)
        for gi in range(g):
            q = q_ref[gi]
            s = jax.lax.dot_general(q, k.astype(q.dtype), (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if masked:
                s = jnp.where(mask, s, MASK_VALUE)
            if mode == "dots_only":
                p = s
            else:
                if mode == "no_max":
                    p = jnp.exp2(s)
                    if mode != "no_sum":
                        l_scratch[gi] = l_scratch[gi] + jnp.sum(p, axis=1, keepdims=True)
                else:
                    m_prev = m_scratch[gi]
                    m_curr = jnp.max(s, axis=1, keepdims=True)
                    m_next = jnp.maximum(m_prev, m_curr)
                    alpha = jnp.exp2(m_prev - m_next)
                    p = jnp.exp2(s - m_next[:, :1])
                    if mode != "no_sum":
                        l_scratch[gi] = alpha * l_scratch[gi] + jnp.sum(p, axis=1, keepdims=True)
                    m_scratch[gi] = m_next
            o_curr = jax.lax.dot(p.astype(v.dtype), v.astype(q.dtype),
                                 preferred_element_type=jnp.float32)
            if mode in ("dots_only", "no_max", "no_alpha"):
                acc_scratch[gi] = acc_scratch[gi] + o_curr
            else:
                acc_scratch[gi] = acc_scratch[gi] * alpha[:, :D] + o_curr

    @pl.when(needed & full)
    def _run_full():
        _tile(False)

    @pl.when(needed & jnp.logical_not(full))
    def _run_masked():
        _tile(True)

    @pl.when(ki == num_kv_blocks - 1)
    def _store():
        for gi in range(g):
            if mode in ("dots_only", "no_sum"):
                o_ref[gi] = acc_scratch[gi].astype(o_ref.dtype)
            else:
                l = l_scratch[gi][:, :1]
                l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                o_ref[gi] = (acc_scratch[gi] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode",))
def attn(q, k, v, mode):
    group = H // KVH
    q = q.transpose(0, 2, 1, 3).reshape(B, KVH, group, S, D)
    scalars = jnp.stack([jnp.zeros((B,), jnp.int32), jnp.full((B,), KV_LEN, jnp.int32)])
    nq, nk = S // BQ + (S % BQ > 0), T // BK + (T % BK > 0)
    s_pad, t_pad = nq * BQ, nk * BK
    if s_pad != S:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    if t_pad != T:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))

    def q_index(b, kvh, qi, ki, scal):
        return (b, kvh, 0, qi, 0)

    def kv_index(b, kvh, qi, ki, scal):
        last_len = jnp.maximum(pl.cdiv(scal[1, b], BK) - 1, 0)
        row_maxi = qi * BQ + BQ - 1 + scal[0, b]
        last = jnp.minimum(last_len, jax.lax.div(row_maxi, BK))
        return (b, kvh, jnp.minimum(ki, last), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KVH, s_pad // BQ, t_pad // BK),
        in_specs=[
            pl.BlockSpec((None, None, group, BQ, D), q_index),
            pl.BlockSpec((None, None, BK, D), kv_index),
            pl.BlockSpec((None, None, BK, D), kv_index),
        ],
        out_specs=pl.BlockSpec((None, None, group, BQ, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((group, BQ, 128), jnp.float32),
            pltpu.VMEM((group, BQ, 128), jnp.float32),
            pltpu.VMEM((group, BQ, D), jnp.float32),
        ],
    )
    q = q * jnp.asarray(D**-0.5 * LOG2E, q.dtype)
    out = pl.pallas_call(
        functools.partial(_kernel, num_kv_blocks=t_pad // BK, mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, group, s_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # the 16 MB scoped-vmem default OOMs by 100K at this shape; v5e has
            # 128 MiB VMEM
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(scalars, q, k, v)
    return out.reshape(B, H, s_pad, D)[:, :, :S].transpose(0, 2, 1, 3)


def _sync(x):
    return float(jnp.ravel(x)[0])


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, KVH, T, D), jnp.bfloat16)
    v = jax.random.normal(kv_, (B, KVH, T, D), jnp.bfloat16)

    results = {}
    for mode in ("full", "no_mask", "no_max", "no_sum", "no_alpha", "dots_only"):
        f = jax.jit(lambda q, k, v, m=mode: jax.lax.fori_loop(
            0, LAYERS, lambda i, x: attn(x, k, v, m).astype(x.dtype), q))
        out = f(q, k, v)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = f(q, k, v)
        _sync(out)
        dt = (time.perf_counter() - t0) / 3 / LAYERS * 1000
        results[mode] = round(dt, 3)
        print(f"[exp] {mode}: {dt:.3f} ms/layer", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
