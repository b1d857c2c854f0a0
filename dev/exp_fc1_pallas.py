"""Hand-fused fc1 epilogue: Pallas int8 matmul + dequant+GELU+requant writeback.

dev/exp_fc1.py showed the static-scale epilogue chain
(dense_prequant_gelu_quant) promises ~0.27 ms/layer over the dynamic glue but
XLA recovers only ~1/3 of it in the full ViT graph — the wide bf16 fc1
intermediate still round-trips HBM.  This kernel writes int8 codes straight
from the matmul accumulator: acc(int32) -> *row_scale*col_scale (+bias) ->
tanh GELU -> /out_scale -> int8.  The question is whether a Pallas int8
matmul can hold XLA's measured 359 TOP/s while paying the epilogue in-kernel
(it must stay >= ~340 TOP/s to be net-positive at the ViT-6B fc1 shape).

    python dev/exp_fc1_pallas.py             # TPU timing
    JAX_PLATFORMS=cpu python ... --check     # interpret-mode correctness
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

from omchat_tpu.ops.linear import dense_prequant, dense_prequant_gelu_quant

M, K, N = 5160, 3200, 12800
BM, BN = 512, 1280  # BN must divide N; grid is (N/BN outer, M/BM inner) so the
N_REP = 30          # [K, BN] weight tile stays VMEM-resident across the M sweep


def _fc1_kernel(x_ref, w_ref, rs_ref, cs_ref, b_ref, os_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = acc.astype(jnp.float32) * rs_ref[...] * cs_ref[...].astype(jnp.float32)
    h = h + b_ref[...].astype(jnp.float32)
    h = jax.nn.gelu(h, approximate=True)
    inv = 1.0 / os_ref[0, 0]
    o_ref[...] = jnp.clip(jnp.round(h * inv), -127, 127).astype(jnp.int8)


def fc1_pallas(xq, rs, wq, cs, bias, out_scale, *, interpret=False):
    m = xq.shape[0]
    m_pad = (m + BM - 1) // BM * BM
    if m_pad != m:
        xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
        rs = jnp.pad(rs, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _fc1_kernel,
        grid=(N // BN, m_pad // BM),
        in_specs=[
            pl.BlockSpec((BM, K), lambda j, i: (i, 0)),
            pl.BlockSpec((K, BN), lambda j, i: (0, j)),
            pl.BlockSpec((BM, 1), lambda j, i: (i, 0)),
            pl.BlockSpec((1, BN), lambda j, i: (0, j)),
            pl.BlockSpec((1, BN), lambda j, i: (0, j)),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, N), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xq, wq, rs, cs[None], bias[None], jnp.asarray(out_scale, jnp.float32)[None, None])
    return out[:m]


def _sync(x):
    return float(jnp.ravel(x)[0].astype(jnp.float32))


def main():
    check = "--check" in sys.argv
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    rs = jnp.asarray(rng.random((M, 1)) * 0.01 + 0.001, jnp.float32)
    p = {
        "kernel_q": jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8),
        "scale": jnp.full((N,), 0.02 / 127, jnp.bfloat16),
        "bias": jnp.zeros((N,), jnp.bfloat16),
    }
    out_scale = jnp.float32(0.01)

    if check:
        ref = dense_prequant_gelu_quant(xq[:64], rs[:64], p, out_scale)
        got = fc1_pallas(xq[:64], rs[:64], p["kernel_q"], p["scale"], p["bias"],
                         out_scale, interpret=True)
        diff = np.abs(np.asarray(ref, np.int32) - np.asarray(got, np.int32))
        frac = float((diff > 1).mean())
        print(json.dumps({"max_code_diff": int(diff.max()), "frac_gt1": frac}))
        assert diff.max() <= 1, "kernel diverges from the XLA chain by >1 code"
        return

    variants = {
        "xla_static_epilogue": jax.jit(
            lambda: dense_prequant_gelu_quant(xq, rs, p, out_scale)
        ),
        "pallas_fused": jax.jit(
            lambda: fc1_pallas(xq, rs, p["kernel_q"], p["scale"], p["bias"], out_scale)
        ),
        "xla_matmul_bf16_out": jax.jit(lambda: dense_prequant(xq, rs, p)),
    }
    results = {}
    for name, fn in variants.items():
        out = fn()
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(N_REP):
            out = fn()
        _sync(out)
        ms = (time.perf_counter() - t0) / N_REP * 1000
        tops = 2 * M * K * N / ms / 1e9
        results[name] = {"ms": round(ms, 3), "tops": round(tops, 1)}
        print(f"[exp] {name}: {ms:.3f} ms ({tops:.0f} TOP/s)", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
