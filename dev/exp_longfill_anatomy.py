"""Decompose the contiguous-engine decode step at long fills (VERDICT r4 #5).

BENCH.md's five-config table shows 33.98 tok/s at the 32k video fill vs 89 at
2k — ~29 ms/step where the measured weight stream (~10.6 ms) plus a bf16 32k
KV read (~1.9 GB at ~500 GB/s ≈ 4 ms) predicts ~16.  This harness applies the
exp_decode_anatomy method to the CONTIGUOUS engine (runtime/generate.py
decode path): a single-token step is re-built with pieces stubbed so the
per-fill cost splits into

- ``weights``: attention read stubbed out AND no cache commit (pure weight
  stream + matmuls + lm_head),
- ``commit``: attention stubbed, commit kept (adds the one post-scan
  scatter into the [L, B, KVH, T, D] cache),
- ``full``: the production step (adds the stacked flash-decode kernel read),

at fills {2k, 8k, 16k, 32k}, each with its own production-sized cache
(fill + 128, like bench_full's plan-sized allocation).  The standalone
kernel is also timed at each fill, and the fp8 cache pool (capacity mode,
BENCH.md) is measured at the one fill where KV bytes rival the weights.

    python dev/exp_longfill_anatomy.py
    python dev/exp_longfill_anatomy.py --fills 32768 --modes full fp8
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench
from omchat_tpu.config import OmChatConfig, VisionConfig
from omchat_tpu.models.qwen2 import (
    KVCache,
    _dense_mlp,
    cache_attend_stacked,
    commit_decode_rows,
    decoder_layer,
    embed_tokens,
    lm_head,
    quant_glue_ok,
)
from omchat_tpu.ops.norms import rms_norm
from omchat_tpu.ops.rope import rope_cos_sin

REPS = 30


@functools.partial(
    jax.jit, static_argnames=("cfg", "mode", "attn_impl"), donate_argnames=("cache",)
)
def step(params, cfg, tokens, kv_len, cache, mode="full", attn_impl=None):
    """One decode step with pieces stubbed per ``mode`` (see module doc)."""
    tc = cfg.text
    x = embed_tokens(params["language_model"], tokens[:, None])
    cos, sin = rope_cos_sin(
        kv_len[:, None], tc.attn_head_dim, theta=tc.rope_theta,
        scaling=tc.rope_scaling,
        max_position_embeddings=tc.max_position_embeddings, dtype=x.dtype,
    )
    n_layers = params["language_model"]["layers"]["input_layernorm"]["scale"].shape[0]
    kvl = kv_len + 1  # includes the in-flight token (self-column)

    if mode in ("full", "fp8", "full_kernel"):
        attend = functools.partial(cache_attend_stacked, tc, attn_impl, kvl, cache.k, cache.v)
    else:  # attention stubbed to identity; rows still emitted for the commit

        def attend(q, k, v, li):
            return q, (li, k[:, 0], v[:, 0])

    def body(carry, xs_):
        xx, cos_, sin_ = carry
        li, layer = xs_
        xx, (_, kr, vr) = decoder_layer(
            tc, xx, layer, cos_, sin_, attend, _dense_mlp, li,
            quant_glue=quant_glue_ok(attn_impl),
        )
        return (xx, cos_, sin_), (kr, vr)

    (xf, _, _), (k_rows, v_rows) = jax.lax.scan(
        body, (x, cos, sin),
        (jnp.arange(n_layers, dtype=jnp.int32), params["language_model"]["layers"]),
    )
    if mode == "weights":
        # keep the rows alive without touching the cache
        xf = xf + 0 * (jnp.sum(k_rows) + jnp.sum(v_rows)).astype(xf.dtype)
    else:
        # *_kernel modes A/B the aliased Pallas row-commit against the jnp
        # scatter (whose cost grows with the cache length)
        cache = commit_decode_rows(
            cache, kv_len, k_rows, v_rows,
            use_kernel=mode.endswith("_kernel") and jax.default_backend() == "tpu",
        )
    xf = rms_norm(xf, params["language_model"]["norm"]["scale"], tc.rms_norm_eps)
    logits = lm_head(params["language_model"], tc, xf)[:, 0]
    return jnp.argmax(logits, -1).astype(jnp.int32), cache


@functools.partial(jax.jit, static_argnames=("shape", "dtype"))
def _device_fill(salt, shape, dtype):
    """Pseudo-random cache fill generated ON DEVICE — a [L, B, KVH, 32k, D]
    cache is ~1 GB; host RNG + tunnel upload per mode call is minutes of
    wall (and has hung the axon tunnel mid-transfer)."""
    h = jnp.uint32(2166136261) * jnp.uint32(salt)
    for axis in range(len(shape)):
        h = h ^ (jax.lax.broadcasted_iota(jnp.uint32, shape, axis) * jnp.uint32(16777619 + axis * 101))
        h = h * jnp.uint32(2654435761)
    return ((h % jnp.uint32(2048)).astype(jnp.float32) / 1024.0 - 1.0).astype(dtype)


def make_cache(tc, b, max_len, rng, dtype=jnp.bfloat16):
    shape = (tc.num_hidden_layers, b, tc.num_key_value_heads, max_len, tc.attn_head_dim)
    k = _device_fill(int(rng.integers(1, 1 << 30)), shape, dtype)
    v = _device_fill(int(rng.integers(1, 1 << 30)), shape, dtype)
    return KVCache(k=k, v=v)


def time_step(params, cfg, fill, mode, rng, b=1, dtype=jnp.bfloat16, reps=REPS):
    tc = cfg.text
    cache = make_cache(tc, b, fill + 128, rng, dtype)
    tokens = jnp.asarray(np.full((b,), 17), jnp.int32)
    kv_len = jnp.asarray(np.full((b,), fill), jnp.int32)
    out, cache = step(params, cfg, tokens, kv_len, cache, mode)  # compile+warm
    bench._sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out, cache = step(params, cfg, tokens, kv_len, cache, mode)
    bench._sync(out)
    del cache
    return (time.perf_counter() - t0) / reps * 1000.0


@jax.jit
def _kernel_call(q, k_cache, v_cache, kv_len, li, krow):
    from omchat_tpu.ops.attention import decode_attention

    return decode_attention(q, k_cache, v_cache, kv_len, layer=li, k_new=krow, v_new=krow)


@functools.partial(jax.jit, static_argnames=("block_k",))
def _kernel_call_bk(q, k_cache, v_cache, kv_len, li, krow, block_k):
    from omchat_tpu.ops.decode_attention import flash_decode_stacked

    return flash_decode_stacked(q, k_cache, v_cache, kv_len, li, krow, krow,
                                block_k=block_k)


def time_kernel_blocks(params, cfg, fill, rng, blocks, b=1, reps=REPS):
    """Sweep the stacked decode kernel's KV block width at one fill — the
    grid is (B, KVH, T/block_k); at 32k fill the default 512 runs 64
    sequential tiles per (b, kv-head) and the per-tile fetch overhead
    dominates (same issue-bound failure mode as the paged kernel's small
    pages, BENCH.md round-3 decode table)."""
    tc = cfg.text
    cache = make_cache(tc, b, fill + 128, rng)
    q = jnp.asarray(
        rng.standard_normal((b, 1, tc.num_attention_heads, tc.attn_head_dim)), jnp.bfloat16
    )
    krow = jnp.asarray(
        rng.standard_normal((b, tc.num_key_value_heads, tc.attn_head_dim)), jnp.bfloat16
    )
    kv_len = jnp.asarray(np.full((b,), fill), jnp.int32)
    li = jnp.int32(0)
    out = {}
    for bk in blocks:
        if bk > fill + 128:
            continue
        o = _kernel_call_bk(q, cache.k, cache.v, kv_len, li, krow, bk)
        bench._sync(o)
        t0 = time.perf_counter()
        for _ in range(reps):
            o = _kernel_call_bk(q, cache.k, cache.v, kv_len, li, krow, bk)
        bench._sync(o)
        out[bk] = round((time.perf_counter() - t0) / reps * 1000.0, 4)
        bench._log(f"fill={fill} block_k={bk}: {out[bk]} ms/layer")
    del cache
    return out


def time_kernel(params, cfg, fill, rng, b=1, dtype=jnp.bfloat16, reps=REPS):
    """Standalone stacked flash-decode kernel at the step's exact shapes.
    The cache rides as an ARGUMENT (a closed-over array would pin each
    fill's multi-GB cache in the jit cache as a constant — HBM accumulates
    across fills until the chip thrashes)."""
    tc = cfg.text
    cache = make_cache(tc, b, fill + 128, rng, dtype)
    q = jnp.asarray(
        rng.standard_normal((b, 1, tc.num_attention_heads, tc.attn_head_dim)), jnp.bfloat16
    )
    krow = jnp.asarray(
        rng.standard_normal((b, tc.num_key_value_heads, tc.attn_head_dim)), jnp.bfloat16
    )
    kv_len = jnp.asarray(np.full((b,), fill), jnp.int32)

    li = jnp.int32(0)
    out = _kernel_call(q, cache.k, cache.v, kv_len, li, krow)
    bench._sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _kernel_call(q, cache.k, cache.v, kv_len, li, krow)
    bench._sync(out)
    per_layer = (time.perf_counter() - t0) / reps * 1000.0
    del cache
    return per_layer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fills", type=int, nargs="*", default=[2048, 8192, 16384, 32768])
    ap.add_argument("--modes", nargs="*",
                    default=["weights", "commit", "commit_kernel", "full",
                             "full_kernel", "kernel", "fp8"])
    ap.add_argument("--reps", type=int, default=REPS)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # the video config's text decoder (bench_full.py:98: default text geometry
    # + InternViT-300M tower, w8a8) — the tower is irrelevant to decode but
    # keeps the param tree identical to the benched engine's
    cfg = OmChatConfig(vision=VisionConfig.internvit_300m()).with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    bench._log("params built")

    results = {}
    for fill in args.fills:
        row = {}
        for mode in args.modes:
            if mode == "kernel_blocks":
                row["kernel_blocks"] = time_kernel_blocks(
                    params, cfg, fill, rng, blocks=(512, 1024, 2048, 4096),
                    reps=args.reps)
            elif mode == "kernel":
                per_layer = time_kernel(params, cfg, fill, rng, reps=args.reps)
                row["kernel_ms_per_layer"] = round(per_layer, 4)
                row["kernel_ms_step_est"] = round(per_layer * cfg.text.num_hidden_layers, 2)
            elif mode == "fp8":
                if fill < 16384:
                    continue  # only where KV bytes rival the weight stream
                row["fp8_full_ms"] = round(
                    time_step(params, cfg, fill, "fp8", rng,
                              dtype=jnp.float8_e4m3fn, reps=args.reps), 2)
            else:
                row[f"{mode}_ms"] = round(
                    time_step(params, cfg, fill, mode, rng, reps=args.reps), 2)
            bench._log(f"fill={fill} {mode}: {row}")
        results[fill] = row
        print(json.dumps({"fill": fill, **row}), flush=True)
    print(json.dumps({"anatomy": results}), flush=True)


if __name__ == "__main__":
    main()
