"""Causal GQA flash kernel microbench at the Qwen2-7B prefill shape.

Chains 28 applications (output feeds back as q) — [1, 5248, 28, 128] against a
[1, 4, 5504, 128] bntd cache, causal, kv_len=5188.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omchat_tpu.ops.flash_attention import flash_attention

B, S, H, KVH, D = 1, 5248, 28, 4, 128
T = 5504
KV_LEN = 5188
LAYERS = 28


def _sync(x):
    return float(jnp.ravel(x)[0])


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, KVH, T, D), jnp.bfloat16)
    v = jax.random.normal(kv_, (B, KVH, T, D), jnp.bfloat16)

    import os

    softmax = os.environ.get("OMCHAT_EXP_SOFTMAX", "auto")

    def chain(q, k, v):
        def body(i, q):
            o = flash_attention(
                q, k, v, causal=True, q_offset=jnp.zeros((B,), jnp.int32),
                kv_len=jnp.full((B,), KV_LEN, jnp.int32), kv_format="bntd",
                softmax=softmax,
            )
            return o.astype(q.dtype)

        return jax.lax.fori_loop(0, LAYERS, body, q)

    if os.environ.get("OMCHAT_EXP_MHA"):
        k = jnp.repeat(k, H // KVH, axis=1)  # group=1 path (old per-head streaming)
        v = jnp.repeat(v, H // KVH, axis=1)

    f = jax.jit(chain)
    out = f(q, k, v)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(q, k, v)
    _sync(out)
    dt = (time.perf_counter() - t0) / 3 / LAYERS * 1000
    print(f"causal flash: {dt:.3f} ms/layer ({dt * LAYERS:.1f} ms / 28 layers)", flush=True)


if __name__ == "__main__":
    main()
