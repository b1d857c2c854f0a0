"""fc1 epilogue anatomy at the ViT-6B glue shape ([5160,3200]x[3200,12800]).

Did the static-scale quantizing epilogue (dense_prequant_gelu_quant) actually
fuse into the int8 matmul writeback?  bench.py showed no encode win (4.42 vs
4.46 img/s), so measure the chain members directly:

    python dev/exp_fc1.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omchat_tpu.ops.linear import dense_prequant, dense_prequant_gelu_quant, quantize_activations

M, K, N = 5160, 3200, 12800
N_REP = 30


def _sync(x):
    return float(jnp.ravel(x)[0].astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    rs = jnp.asarray(rng.random((M, 1)) * 0.01 + 0.001, jnp.float32)
    p = {
        "kernel_q": jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8),
        "scale": jnp.full((N,), 0.02 / 127, jnp.bfloat16),
        "bias": jnp.zeros((N,), jnp.bfloat16),
    }
    out_scale = jnp.float32(0.01)

    variants = {
        # bare int8 matmul, bf16 out (the MXU floor + one wide write)
        "matmul_bf16_out": jax.jit(lambda xq, rs, p: dense_prequant(xq, rs, p)),
        # current dynamic glue chain: matmul -> tanh gelu -> dynamic quantize
        "dynamic_chain": jax.jit(
            lambda xq, rs, p: quantize_activations(
                jax.nn.gelu(dense_prequant(xq, rs, p), approximate=True)
            )[0]
        ),
        # static epilogue (should be int8-out only if XLA fuses)
        "static_epilogue": jax.jit(
            lambda xq, rs, p: dense_prequant_gelu_quant(xq, rs, p, out_scale)
        ),
        # matmul with int8 cast only (no gelu): the ideal fused write volume
        "matmul_int8_out": jax.jit(
            lambda xq, rs, p: dense_prequant(xq, rs, p).astype(jnp.int8)
        ),
    }

    results = {}
    for name, fn in variants.items():
        out = fn(xq, rs, p)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(N_REP):
            out = fn(xq, rs, p)
        _sync(out)
        ms = (time.perf_counter() - t0) / N_REP * 1000
        tops = 2 * M * K * N / ms / 1e9
        results[name] = {"ms": round(ms, 3), "tops": round(tops, 1)}
        print(f"[exp] {name}: {ms:.3f} ms ({tops:.0f} TOP/s)", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
