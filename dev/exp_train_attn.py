"""Training attention fwd+bwd timing: grouped pallas_vjp vs XLA, Qwen2-7B
geometry (H=28, KVH=4, D=128), grads wrt q,k,v."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omchat_tpu.ops.attention import attention


def _sync(x):
    return float(jnp.ravel(x)[0])


def run(B, S, impl):
    H, KVH, D = 28, 4, 128
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, KVH, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, S, KVH, D), jnp.bfloat16)

    def loss(q, k, v):
        out = attention(q, k, v, causal=True, impl=impl)
        return jnp.sum(out.astype(jnp.float32) * 1e-3)

    f = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    g = f(q, k, v)
    _sync(g[0])
    t0 = time.perf_counter()
    for _ in range(5):
        g = f(q, k, v)
    _sync(g[0])
    dt = (time.perf_counter() - t0) / 5 * 1000
    flops = 2 * 2 * S * S * D * H / 2 * 3.5  # fwd 1x + bwd 2.5x, causal
    print(f"B={B} S={S} {impl:12s} {dt:7.2f} ms  ({B * flops / dt / 1e9:.1f} TF/s)", flush=True)


def main():
    for B, S in [(1, 4096), (4, 2048)]:
        for impl in ("xla", "pallas_vjp"):
            run(B, S, impl)


if __name__ == "__main__":
    main()
