"""Price the batched prefill page commit at the serving shape (round 5).

dev/exp_tick_anatomy.py measured the whole-page commit at ~35 ms/call (jnp
scatter) and ~25 ms/call (aliased kernel) — far above the ~2 ms the moved
bytes predict.  This isolates the pieces at the 13B serving geometry
([8, 512] shorts batch into the 193-page pool):

- ``scatter``: the jnp whole-page `.at[:, pages].set` path
- ``kernel``: the aliased Pallas commit (commit_pages)
- ``kernel_raw``: the pallas_call alone, chunks pre-transposed (prices the
  [L, B, KVH, T, D] -> [L, B*C, KVH, ps, D] transpose separately)
- ``transpose``: just the chunk reshape/transpose materialization

    python dev/exp_page_commit.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench

L, B, KVH, T, D, PS, P = 28, 8, 4, 512, 128, 128, 193
REPS = 20


@functools.partial(jax.jit, donate_argnames=("k_pool", "v_pool"))
def scatter(slot_k, slot_v, k_pool, v_pool, pages):
    c = T // PS
    ck = slot_k.reshape(L, B, KVH, c, PS, D).transpose(0, 1, 3, 2, 4, 5).reshape(L, B * c, KVH, PS, D)
    cv = slot_v.reshape(L, B, KVH, c, PS, D).transpose(0, 1, 3, 2, 4, 5).reshape(L, B * c, KVH, PS, D)
    return k_pool.at[:, pages].set(ck), v_pool.at[:, pages].set(cv)


@functools.partial(jax.jit, donate_argnames=("k_pool", "v_pool"))
def kernel(slot_k, slot_v, k_pool, v_pool, pages):
    from omchat_tpu.ops.paged_attention import commit_pages

    c = T // PS
    ck = slot_k.reshape(L, B, KVH, c, PS, D).transpose(0, 1, 3, 2, 4, 5).reshape(L * B * c, KVH, PS, D)
    cv = slot_v.reshape(L, B, KVH, c, PS, D).transpose(0, 1, 3, 2, 4, 5).reshape(L * B * c, KVH, PS, D)
    flat = (jnp.arange(L, dtype=jnp.int32)[:, None] * P + pages[None, :]).reshape(-1)
    kf, vf = commit_pages(
        k_pool.reshape(L * P, KVH, PS, D), v_pool.reshape(L * P, KVH, PS, D), flat, ck, cv
    )
    return kf.reshape(L, P, KVH, PS, D), vf.reshape(L, P, KVH, PS, D)


@functools.partial(jax.jit, donate_argnames=("k_pool", "v_pool"))
def kernel_raw(ck, cv, k_pool, v_pool, flat):
    from omchat_tpu.ops.paged_attention import commit_pages

    kf, vf = commit_pages(
        k_pool.reshape(L * P, KVH, PS, D), v_pool.reshape(L * P, KVH, PS, D), flat, ck, cv
    )
    return kf.reshape(L, P, KVH, PS, D), vf.reshape(L, P, KVH, PS, D)


@jax.jit
def transpose_only(slot_k, slot_v):
    c = T // PS
    ck = slot_k.reshape(L, B, KVH, c, PS, D).transpose(0, 1, 3, 2, 4, 5).reshape(L, B * c, KVH, PS, D)
    cv = slot_v.reshape(L, B, KVH, c, PS, D).transpose(0, 1, 3, 2, 4, 5).reshape(L, B * c, KVH, PS, D)
    return ck + 0, cv + 0


def pool():
    z = jnp.zeros((L, P, KVH, PS, D), jnp.bfloat16)
    return z, jnp.zeros_like(z)


def main():
    rng = np.random.default_rng(0)
    slot_k = jnp.asarray(rng.standard_normal((L, B, KVH, T, D)), jnp.bfloat16)
    slot_v = jnp.asarray(rng.standard_normal((L, B, KVH, T, D)), jnp.bfloat16)
    pages = jnp.asarray(rng.choice(P - 1, B * (T // PS), replace=False).astype(np.int32))
    flat = (jnp.arange(L, dtype=jnp.int32)[:, None] * P + pages[None, :]).reshape(-1)
    c = T // PS
    ck = jnp.asarray(rng.standard_normal((L * B * c, KVH, PS, D)), jnp.bfloat16)
    cv = jnp.asarray(rng.standard_normal((L * B * c, KVH, PS, D)), jnp.bfloat16)

    res = {}

    def timeit(name, fn, fresh_pool=True):
        kp, vp = pool()
        out = fn(kp, vp)
        bench._sync(out[0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(out[0], out[1])
        bench._sync(out[0])
        res[name] = round((time.perf_counter() - t0) / REPS * 1e3, 3)
        bench._log(f"{name}: {res[name]} ms")

    timeit("scatter", lambda kp, vp: scatter(slot_k, slot_v, kp, vp, pages))
    timeit("kernel", lambda kp, vp: kernel(slot_k, slot_v, kp, vp, pages))
    timeit("kernel_raw", lambda kp, vp: kernel_raw(ck, cv, kp, vp, flat))
    t = transpose_only(slot_k, slot_v)
    bench._sync(t[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        t = transpose_only(slot_k, slot_v)
    bench._sync(t[0])
    res["transpose_only"] = round((time.perf_counter() - t0) / REPS * 1e3, 3)
    bench._log(f"transpose_only: {res['transpose_only']} ms")
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
