"""Fold the qk-RMSNorm into the packed ViT attention kernel.

Current glue path (intern_vit._attention_fused): rms_norm(q), rms_norm(k)
materialize normalized copies ([5,1032,3200] bf16 each: ~66 MB of writes +
re-reads per layer) and the kernel reads v as a slice of qkv (another copy).
Variant: compute only the row rstd stats outside ([B,SP] fp32, the reduction
is over the flattened 3200-dim head axis so it cannot live per-head inside
the kernel), then pass the *unsplit* qkv to the kernel three times with
per-head lane offsets and apply rstd*gamma on the fly.

    python dev/exp_attn_qknorm.py

Chains 45 applications of the full attention subgraph (norm + kernel) at the
13B 5-tile shape; reports ms/layer for both variants + max rel err.
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

from omchat_tpu.ops.flash_attention import packed_prescale, packed_self_attention
from omchat_tpu.ops.norms import rms_norm

B, SP, H, D = 5, 1032, 25, 128
HD = H * D
VALID = 1025
LAYERS = 45
EPS = 1e-6


def _sync(x):
    return float(jnp.ravel(x)[0])


# --- baseline: today's glue path (norms materialize, kernel reads slices) ---


def attn_baseline(qkv, q_gamma, k_gamma):
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = rms_norm(q, q_gamma * packed_prescale(D), EPS)
    k = rms_norm(k, k_gamma, EPS)
    return packed_self_attention(q, k, v, num_heads=H, valid_len=VALID, prescaled=True)


# --- fused: stats outside, norm applied per-head inside the kernel ----------


def _kernel_fused(q_ref, k_ref, v_ref, rq_ref, rk_ref, gq_ref, gk_ref, o_ref,
                  *, valid_len: int):
    sp = q_ref.shape[1]
    rq = rq_ref[0]  # [SP, 1] fp32 (1-lane layout satisfies Mosaic tiling)
    rk = rk_ref[0]
    q = (q_ref[0].astype(jnp.float32) * rq * gq_ref[0].astype(jnp.float32)).astype(q_ref.dtype)
    k = (k_ref[0].astype(jnp.float32) * rk * gk_ref[0].astype(jnp.float32)).astype(k_ref.dtype)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if valid_len < sp:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < valid_len, s, -jnp.inf)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l_inv = 1.0 / jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32)
    o_ref[0] = (o * l_inv).astype(o_ref.dtype)


def attn_fused(qkv, q_gamma, k_gamma):
    qf = qkv[..., :HD].astype(jnp.float32)
    kf = qkv[..., HD:2 * HD].astype(jnp.float32)
    rq = jax.lax.rsqrt(jnp.mean(qf * qf, axis=-1, keepdims=True) + EPS)  # [B, SP, 1]
    rk = jax.lax.rsqrt(jnp.mean(kf * kf, axis=-1, keepdims=True) + EPS)
    gq = (q_gamma * packed_prescale(D)).astype(jnp.float32)[None]  # [1, HD]
    gk = k_gamma.astype(jnp.float32)[None]

    kernel = functools.partial(_kernel_fused, valid_len=VALID)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h)),          # q slice
            pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, H + h)),      # k slice
            pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, 2 * H + h)),  # v slice
            pl.BlockSpec((1, SP, 1), lambda b, h: (b, 0, 0)),          # rstd_q
            pl.BlockSpec((1, SP, 1), lambda b, h: (b, 0, 0)),          # rstd_k
            pl.BlockSpec((1, D), lambda b, h: (0, h)),                 # gamma_q slice
            pl.BlockSpec((1, D), lambda b, h: (0, h)),                 # gamma_k slice
        ],
        out_specs=pl.BlockSpec((1, SP, D), lambda b, h: (b, 0, h)),
        out_shape=jax.ShapeDtypeStruct((B, SP, HD), qkv.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(qkv, qkv, qkv, rq, rk, gq, gk)


def chain(fn, q_gamma, k_gamma):
    def run(qkv):
        def body(i, x):
            o = fn(x, q_gamma, k_gamma)
            # feed back as the q third so the chain has a data dependency
            return jnp.concatenate([o, x[..., HD:]], axis=-1)

        return jax.lax.fori_loop(0, LAYERS, body, qkv)

    return run


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    qkv = jax.random.normal(k1, (B, SP, 3 * HD), jnp.bfloat16)
    q_gamma = (jax.random.normal(k2, (HD,), jnp.float32) * 0.1 + 1.0).astype(jnp.bfloat16)
    k_gamma = (jax.random.normal(k3, (HD,), jnp.float32) * 0.1 + 1.0).astype(jnp.bfloat16)

    results = {}
    ref = None
    for name, fn in (("baseline_norm_then_kernel", attn_baseline),
                     ("fused_norm_in_kernel", attn_fused)):
        one = jax.jit(fn)(qkv, q_gamma, k_gamma)
        _sync(one)
        cur = np.asarray(one[:, :VALID]).astype(np.float32)
        if ref is None:
            ref, err = cur, 0.0
        else:
            err = float(np.abs(cur - ref).max() / (np.abs(ref).max() + 1e-9))
        f = jax.jit(chain(fn, q_gamma, k_gamma))
        out = f(qkv)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = f(qkv)
        _sync(out)
        dt = (time.perf_counter() - t0) / 5 / LAYERS * 1000
        results[name] = {"ms_per_layer": round(dt, 3), "max_rel_err": round(err, 5)}
        print(f"[exp] {name}: {dt:.3f} ms/layer (err {err:.2e})", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
