"""Validate + price the Pallas row-commit kernel vs the jnp scatter.

The decode step's post-scan commit writes L x S single-token K/V rows into
the flat page pool.  ``pool.at[pages, :, offsets].set(rows)`` measured ~7 ms
at the serving pool size; `commit_rows` writes only the target rows through
aliased output blocks.  Correctness of the aliasing (untouched pages
preserved) can only be checked on the real backend — interpret mode does not
simulate input/output aliasing.

    python dev/exp_commit.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omchat_tpu.ops.paged_attention import commit_rows  # noqa: E402


def _sync(x):
    return float(jnp.asarray(x).ravel()[0])


def main():
    rng = np.random.default_rng(0)
    res = {}

    # -- correctness on the live backend (small pool) -------------------------
    L, S, KVH, PS, D = 4, 3, 4, 128, 128
    P = L * 8
    pool0 = rng.standard_normal((P, KVH, PS, D)).astype(np.float32)
    pages = rng.permutation(P)[: L * S].astype(np.int32)
    offsets = rng.integers(0, PS, L * S).astype(np.int32)
    k_rows = rng.standard_normal((L * S, KVH, D)).astype(np.float32)
    v_rows = rng.standard_normal((L * S, KVH, D)).astype(np.float32)

    ko, vo = commit_rows(
        jnp.asarray(pool0), jnp.asarray(pool0.copy()),
        jnp.asarray(pages), jnp.asarray(offsets),
        jnp.asarray(k_rows), jnp.asarray(v_rows),
    )
    ko = np.asarray(ko)
    expect = pool0.copy()
    for i in range(L * S):
        expect[pages[i], :, offsets[i]] = k_rows[i]
    ok = np.allclose(ko, expect, atol=1e-6)
    res["aliasing_correct"] = bool(ok)
    print(f"[exp] commit_rows aliasing correct: {ok} "
          f"(maxdiff {np.abs(ko - expect).max():.2e})", flush=True)
    assert ok, "aliased commit incorrect on this backend"

    # -- timing at the serving shape ------------------------------------------
    L, S, KVH, PS, D = 28, 16, 4, 128, 128
    P_flat = L * 193
    shape = (P_flat, KVH, PS, D)
    pages = jnp.asarray(
        (np.arange(L)[:, None] * 193 + rng.permutation(192)[:S][None, :]).reshape(-1),
        jnp.int32,
    )
    offsets = jnp.asarray(np.tile(rng.integers(0, PS, S), L), jnp.int32)
    k_rows = jnp.asarray(rng.standard_normal((L * S, KVH, D)), jnp.bfloat16)
    v_rows = jnp.asarray(rng.standard_normal((L * S, KVH, D)), jnp.bfloat16)

    N_REP = 50
    kp = jnp.zeros(shape, jnp.bfloat16)
    vp = jnp.zeros(shape, jnp.bfloat16)
    kp, vp = commit_rows(kp, vp, pages, offsets, k_rows, v_rows)
    _sync(kp[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(N_REP):
        kp, vp = commit_rows(kp, vp, pages, offsets, k_rows, v_rows)
    _sync(kp[0, 0, 0, 0])
    res["commit_rows_ms"] = round((time.perf_counter() - t0) / N_REP * 1e3, 3)
    del kp, vp

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def scatter(kp, vp):
        pg = pages.reshape(L, S)
        off = jnp.broadcast_to(offsets.reshape(L, S)[0][None, :], (L, S))
        kp = kp.at[pg, :, off].set(k_rows.reshape(L, S, KVH, D))
        vp = vp.at[pg, :, off].set(v_rows.reshape(L, S, KVH, D))
        return kp, vp

    kp = jnp.zeros(shape, jnp.bfloat16)
    vp = jnp.zeros(shape, jnp.bfloat16)
    kp, vp = scatter(kp, vp)
    _sync(kp[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(N_REP):
        kp, vp = scatter(kp, vp)
    _sync(kp[0, 0, 0, 0])
    res["jnp_scatter_ms"] = round((time.perf_counter() - t0) / N_REP * 1e3, 3)

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
