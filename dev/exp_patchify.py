"""Patchify experiment: XLA strided conv vs reshape+matmul at the ViT-6B
input shape ([5, 3, 448, 448], 14x14 patches, 3200 channels)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def _sync(x):
    return float(jnp.ravel(x)[0])


B, P, D = 5, 14, 3200
HW = 448


def conv_patchify(px, kernel, bias):
    x = jnp.transpose(px, (0, 2, 3, 1))
    x = jax.lax.conv_general_dilated(
        x.astype(kernel.dtype), kernel, window_strides=(P, P), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x + bias
    b, h, w, d = x.shape
    return x.reshape(b, h * w, d)


def matmul_patchify(px, kernel, bias):
    # [B,3,H,W] -> [B, 32, 14, 32, 14, 3] -> [B, 1024, 14*14*3] @ [588, D]
    g = HW // P
    x = jnp.transpose(px, (0, 2, 3, 1))  # NHWC
    x = x.reshape(B, g, P, g, P, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, g * g, P * P * 3)
    w = kernel.reshape(P * P * 3, D)
    return x.astype(w.dtype) @ w + bias


def main():
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((B, 3, HW, HW)), jnp.bfloat16)
    kernel = jnp.asarray(rng.standard_normal((P, P, 3, D)) * 0.02, jnp.bfloat16)
    bias = jnp.zeros((D,), jnp.bfloat16)

    ref = None
    for name, fn in [("conv", conv_patchify), ("reshape+matmul", matmul_patchify)]:
        f = jax.jit(fn)
        out = f(px, kernel, bias)
        _sync(out)
        if ref is None:
            ref = np.asarray(out, np.float32)
            err = 0.0
        else:
            err = float(np.abs(np.asarray(out, np.float32) - ref).max())
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(px, kernel, bias)
        _sync(out)
        dt = (time.perf_counter() - t0) / 20 * 1000
        print(f"{name:16s} {dt:7.3f} ms   max abs diff {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
