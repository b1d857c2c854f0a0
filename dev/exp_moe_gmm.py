"""MoE expert execution on TPU: megablox gmm vs dense-all-experts.

Measures the Qwen1.5-MoE-A2.7B-class geometry (60 experts, top-4, the
many-expert regime `models/qwen2_moe.py` calls gmm "the production path"
for) and checks numeric agreement on-chip.  Run on the real TPU:

    python dev/exp_moe_gmm.py
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omchat_tpu.config import TextConfig
from omchat_tpu.models.qwen2_moe import _experts_dense, _experts_gmm, _router


def _sync(x):
    return float(jnp.ravel(x)[0])


def run_one(rng, T, D, E, K, F):
    cfg = TextConfig(
        hidden_size=D, num_experts=E, num_experts_per_tok=K,
        moe_intermediate_size=F, norm_topk_prob=False,
    )

    x = jnp.asarray(rng.standard_normal((T, D)), jnp.bfloat16) * 0.5
    gate_kernel = jnp.asarray(rng.standard_normal((D, E)), jnp.float32) * 0.02
    p = {
        "gate_proj": jnp.asarray(rng.standard_normal((E, D, F)), jnp.bfloat16) * 0.02,
        "up_proj": jnp.asarray(rng.standard_normal((E, D, F)), jnp.bfloat16) * 0.02,
        "down_proj": jnp.asarray(rng.standard_normal((E, F, D)), jnp.bfloat16) * 0.02,
    }
    topk_w, topk_idx = jax.jit(functools.partial(_router, cfg=cfg))(x, gate_kernel)

    dense_fn = jax.jit(lambda x, p, w, i: _experts_dense(x, p, w, i, cfg))
    gmm_fn = jax.jit(lambda x, p, w, i: _experts_gmm(x, p, w, i, cfg))

    out_d = dense_fn(x, p, topk_w, topk_idx)
    _sync(out_d)
    out_g = gmm_fn(x, p, topk_w, topk_idx)
    _sync(out_g)

    # correctness on-chip
    d_np = np.asarray(out_d, np.float32)
    g_np = np.asarray(out_g, np.float32)
    denom = np.abs(d_np).max() + 1e-6
    rel = np.abs(d_np - g_np).max() / denom
    assert rel < 3e-2, f"gmm diverges from dense: rel={rel}"

    def bench_fn(fn, n=20):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(x, p, topk_w, topk_idx)
        _sync(out)
        return (time.perf_counter() - t0) / n * 1000

    ms_dense = bench_fn(dense_fn)
    ms_gmm = bench_fn(gmm_fn)
    # useful FLOPs: only routed token-replicas do work in gmm
    flops_routed = 2 * T * K * (2 * D * F + F * D)
    flops_dense = 2 * T * E * (2 * D * F + F * D)
    out = {
        "geometry": f"T={T} D={D} E={E} K={K} F={F}",
        "rows_per_expert": round(T * K / E, 1),
        "dense_ms": round(ms_dense, 2),
        "gmm_ms": round(ms_gmm, 2),
        "speedup": round(ms_dense / ms_gmm, 2),
        "gmm_tflops_routed": round(flops_routed / ms_gmm / 1e9, 1),
        "dense_tflops_all": round(flops_dense / ms_dense / 1e9, 1),
        "max_rel_err": float(rel),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    # Sweep token count: gmm's per-expert group matmuls need enough rows per
    # expert to fill the MXU (T*K/E rows on average) — the crossover vs the
    # dense-all-experts path is the number that matters for serving.
    for T in (1024, 4096, 16384):
        run_one(rng, T, D=2048, E=60, K=4, F=1408)


if __name__ == "__main__":
    main()
