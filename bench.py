"""Benchmark: flagship OmChat-v2.0-13B single-image inference on one TPU chip.

Measures the BASELINE.json metrics on the real flagship geometry
(InternViT-6B, 45 layers, hidden 3200 + Qwen2-7B, 28 layers, hidden 3584):

- ViT encode throughput (images/s, 5-tile anyres batch → 5×1025-token ViT fwd)
- prefill TTFT (5×1024 image tokens + text ≈ 5.2k-token prefill)
- decode tokens/sec/chip (on-device lax.while_loop greedy decode, no per-token
  host sync)

Weights are synthetic (the published checkpoint is not available offline) with
int8 weight-only quantization, which is how a 13B model serves on a single
16GB chip; matmuls run bf16 on the MXU with fp32 softmax statistics — the
throughput is representative of the quantized serving configuration.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md: "published: {}"); the build target is >2× the A100
reference stack.  Baseline constant below = 30 tok/s, an estimate for the
reference's actual serving path on A100 (HF transformers 4.41 ``generate``
with the legacy tuple KV cache, fp16, flash-attn2 — single-stream Qwen2-7B
decode; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.constants import IMAGE_TOKEN_INDEX
from omchat_tpu.runtime.generate import (
    OmChatEngine,
    _decode_loop_jit,
    _encode_images_jit,
)
from omchat_tpu.ops.sampling import greedy

A100_REFERENCE_DECODE_TOKS = 30.0  # see module docstring
ARRIVAL_RATE_REQ_S = 6.0  # Poisson offered load for the arrival-mode sample

N_TILES = 5  # 896×896 anyres: thumbnail + 4 tiles
TEXT_TOKENS = 64
DECODE_TOKENS = 256


def _sync(x) -> float:
    """Force completion on the axon tunnel backend (block_until_ready does not
    wait for remote execution): read back one element."""
    return float(jnp.ravel(x)[0])


def _synth_params(cfg: OmChatConfig, rng: np.random.Generator) -> dict:
    """Build the flagship param tree directly in serving dtypes (int8 kernels +
    bf16 scales/bias/embeds), generated ON DEVICE — 13.6GB of synthetic weights
    must not cross the host↔device link."""
    # Pseudo-random weight fill via a fused iota hash: a jitted elementwise
    # program writes int8/bf16 directly with no full-size int32/fp32
    # intermediate in HBM (jax.random would OOM generating 13.6GB of weights).
    _salt = iter(range(1, 1024))

    @functools.partial(jax.jit, static_argnames=("shape", "dtype"))
    def _hash_fill(salt, shape, dtype):
        h = jnp.uint32(2166136261) * jnp.uint32(salt)
        for axis in range(len(shape)):
            h = h ^ (jax.lax.broadcasted_iota(jnp.uint32, shape, axis) * jnp.uint32(16777619 + axis * 101))
            h = h * jnp.uint32(2654435761)
        if dtype == jnp.int8:
            return (h % jnp.uint32(255)).astype(jnp.int32).astype(jnp.int8) - 127
        return ((h % jnp.uint32(2048)).astype(jnp.float32) / 1024.0 - 1.0).astype(dtype)

    def lin(i, o, bias=True, layers=None):
        shape_k = (layers, i, o) if layers else (i, o)
        shape_s = (layers, o) if layers else (o,)
        p = {
            "kernel_q": _hash_fill(next(_salt), shape_k, jnp.int8),
            "scale": jnp.full(shape_s, 0.02 / 127, jnp.bfloat16),
        }
        if bias:
            p["bias"] = jnp.zeros(shape_s, jnp.bfloat16)
        return p

    def bf16(shape, scale=0.02):
        return _hash_fill(next(_salt), shape, jnp.bfloat16) * scale

    v, t = cfg.vision, cfg.text
    lv, d, f = v.num_hidden_layers, v.hidden_size, v.intermediate_size
    norm1 = {"scale": jnp.ones((lv, d), jnp.bfloat16)}
    norm2 = {"scale": jnp.ones((lv, d), jnp.bfloat16)}
    if v.norm_type == "layer_norm":
        norm1["bias"] = jnp.zeros((lv, d), jnp.bfloat16)
        norm2["bias"] = jnp.zeros((lv, d), jnp.bfloat16)
    attn = {
        "qkv": lin(d, 3 * d, bias=v.qkv_bias, layers=lv),
        "proj": lin(d, d, layers=lv),
    }
    if v.qk_normalization:
        attn["q_norm"] = {"scale": jnp.ones((lv, d), jnp.bfloat16)}
        attn["k_norm"] = {"scale": jnp.ones((lv, d), jnp.bfloat16)}
    vision = {
        "class_embedding": bf16((d,), 1.0),
        "position_embedding": bf16((v.num_patch_tokens + 1, d)),
        "patch_embedding": {"kernel": bf16((v.patch_size, v.patch_size, 3, d)), "bias": jnp.zeros((d,), jnp.bfloat16)},
        "layers": {
            "norm1": norm1,
            "norm2": norm2,
            "ls1": jnp.full((lv, d), 0.1, jnp.bfloat16),
            "ls2": jnp.full((lv, d), 0.1, jnp.bfloat16),
            "attn": attn,
            "mlp": {"fc1": lin(d, f, layers=lv), "fc2": lin(f, d, layers=lv)},
        },
    }
    lt, dt, ft = t.num_hidden_layers, t.hidden_size, t.intermediate_size
    hd, h, kvh = t.attn_head_dim, t.num_attention_heads, t.num_key_value_heads
    text = {
        "embed_tokens": bf16((t.vocab_size, dt)),
        "layers": {
            "input_layernorm": {"scale": jnp.ones((lt, dt), jnp.bfloat16)},
            "post_attention_layernorm": {"scale": jnp.ones((lt, dt), jnp.bfloat16)},
            "self_attn": {
                "q_proj": lin(dt, h * hd, layers=lt),
                "k_proj": lin(dt, kvh * hd, layers=lt),
                "v_proj": lin(dt, kvh * hd, layers=lt),
                "o_proj": lin(h * hd, dt, bias=False, layers=lt),
            },
            "mlp": {
                "gate_proj": lin(dt, ft, bias=False, layers=lt),
                "up_proj": lin(dt, ft, bias=False, layers=lt),
                "down_proj": lin(ft, dt, bias=False, layers=lt),
            },
        },
        "norm": {"scale": jnp.ones((dt,), jnp.bfloat16)},
        "lm_head": lin(dt, t.vocab_size, bias=False),
    }
    projector = {
        "linear_1": lin(cfg.vision.hidden_size, dt),
        "linear_2": lin(dt, dt),
    }
    return {"vision_tower": vision, "projector": projector, "language_model": text}


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _build_engine():
    """Build the largest config that fits the chip's *currently available* HBM.

    The tunneled TPU service has been observed to leak HBM from killed client
    sessions until a server-side timeout; degrade 13B → 8B (InternViT-300M +
    Qwen2-7B, the OmChat-2.1 geometry) rather than crash the round's bench."""
    from omchat_tpu.config import VisionConfig

    rng = np.random.default_rng(0)
    candidates = [
        ("omchat-v2.0-13B geometry (InternViT-6B + Qwen2-7B), int8 w8a8", OmChatConfig.omchat_v2_13b().with_w8a8()),
        ("omchat-2.1-8B geometry (InternViT-300M + Qwen2-7B), int8 w8a8", OmChatConfig(vision=VisionConfig.internvit_300m()).with_w8a8()),
    ]
    for name, cfg in candidates:
        try:
            params = _synth_params(cfg, rng)
            _sync(params["language_model"]["norm"]["scale"])  # force allocation
            return name, cfg, params
        except Exception as e:  # RESOURCE_EXHAUSTED etc.
            _log(f"{name} does not fit ({type(e).__name__}); trying smaller")
    raise RuntimeError("no benchmark config fits on this chip")


def main():
    rng = np.random.default_rng(0)
    model_name, cfg, params = _build_engine()
    _log("params built")
    engine = OmChatEngine(cfg, params)

    pixels = jnp.asarray(rng.standard_normal((N_TILES, 3, 448, 448)).astype(np.float32), dtype=jnp.bfloat16)
    ids = [151644] * 3 + [IMAGE_TOKEN_INDEX] * N_TILES + list(range(1000, 1000 + TEXT_TOKENS)) + [151645]

    if cfg.vision.w8a8:
        # Static fc1-output scales let the quantizing GELU epilogue fold into
        # the fc1 matmul writeback (no wide bf16 intermediate round trip);
        # offline calibration on the measurement distribution.
        from omchat_tpu.models.intern_vit import calibrate_fc1_scales

        _log("calibrating ViT fc1 static scales")
        params["vision_tower"] = calibrate_fc1_scales(params["vision_tower"], cfg.vision, pixels)
        engine = OmChatEngine(cfg, params)

    # --- ViT encode ---
    _log("compiling ViT encode")
    feats = engine.encode_images(pixels)
    _sync(feats)  # compile + settle
    _log("ViT compiled")
    t0 = time.perf_counter()
    n_rep = 5
    for _ in range(n_rep):
        feats = engine.encode_images(pixels)
    _sync(feats)  # queued back-to-back; one readback drains the stream
    vit_time = (time.perf_counter() - t0) / n_rep
    vit_images_per_sec = 1.0 / vit_time  # one anyres image (= N_TILES tiles) per call

    # --- Batched multi-image encode (the serving engine's dispatch shape:
    # several requests' anyres images ride ONE ViT call) ---
    n_imgs = 4
    pixels_b = jnp.asarray(
        rng.standard_normal((n_imgs * N_TILES, 3, 448, 448)).astype(np.float32),
        dtype=jnp.bfloat16,
    )
    _log("compiling batched ViT encode")
    feats_b = engine.encode_images(pixels_b)
    _sync(feats_b)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        feats_b = engine.encode_images(pixels_b)
    _sync(feats_b)
    vit_batched_time = (time.perf_counter() - t0) / n_rep
    vit_images_per_sec_batched = n_imgs / vit_batched_time

    # --- Prefill (TTFT) ---
    plan = engine.plan([ids])
    # NOTE: no calibrate_swiglu_scales here — the static SwiGLU epilogue is a
    # measured negative at the Qwen2-7B geometry (dev/exp_llm_glue.py: static
    # 279.2/278.3 ms vs dynamic glue 276.8; the [M,K] activation re-stream per
    # N-block outweighs the saved bf16 intermediate, unlike the ViT fc1 case).
    _log("compiling prefill")
    logits, cache = engine.prefill(plan, feats, DECODE_TOKENS)
    _sync(logits)  # compile
    _log("prefill compiled")
    t0 = time.perf_counter()
    logits, cache = engine.prefill(plan, feats, DECODE_TOKENS)
    _sync(logits)
    prefill_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    feats2 = engine.encode_images(pixels)
    logits, cache = engine.prefill(plan, feats2, DECODE_TOKENS)
    _sync(logits)
    ttft = time.perf_counter() - t0  # encode + prefill = time to first token

    # --- Decode (on-device loop) ---
    first = greedy(logits)
    _log("compiling decode loop")
    out, steps = _decode_loop_jit(
        params, cfg, first, jnp.asarray(plan.lengths), cache, DECODE_TOKENS, -1, None
    )
    _sync(out)  # compile
    _log("decode loop compiled")
    logits, cache = engine.prefill(plan, feats2, DECODE_TOKENS)
    first = greedy(logits)
    _sync(first)
    t0 = time.perf_counter()
    out, steps = _decode_loop_jit(
        params, cfg, first, jnp.asarray(plan.lengths), cache, DECODE_TOKENS, -1, None
    )
    _sync(out)
    decode_time = time.perf_counter() - t0
    decode_toks = (DECODE_TOKENS - 1) / decode_time  # first token came from prefill

    # --- Batched decode throughput (serving mode, short text prompts) ---
    batch_decode = {}
    for bsz in (4, 8):
        bids = [[151644] + list(range(2000, 2127))] * bsz
        bplan = engine.plan(bids)
        blogits, bcache = engine.prefill(bplan, None, DECODE_TOKENS)
        bfirst = greedy(blogits)
        bout, _ = _decode_loop_jit(
            params, cfg, bfirst, jnp.asarray(bplan.lengths), bcache, DECODE_TOKENS, -1, None
        )
        _sync(bout)  # compile
        blogits, bcache = engine.prefill(bplan, None, DECODE_TOKENS)
        bfirst = greedy(blogits)
        _sync(bfirst)
        t0 = time.perf_counter()
        bout, _ = _decode_loop_jit(
            params, cfg, bfirst, jnp.asarray(bplan.lengths), bcache, DECODE_TOKENS, -1, None
        )
        _sync(bout)
        batch_decode[bsz] = bsz * (DECODE_TOKENS - 1) / (time.perf_counter() - t0)
        _log(f"batched decode B={bsz} done")
    batch_decode_toks = batch_decode[4]

    # --- Paged continuous-batching serving (mixed text+image workload) ---
    serving_toks = None
    serving_latency = None
    try:
        del cache, bcache, blogits, bfirst, bout  # free scratch KV before the page pool
        from dev.bench_serving import MAX_NEW, build_workload
        from omchat_tpu.runtime.paged_engine import PagedBatchEngine

        _log("compiling paged serving engine")
        pengine = PagedBatchEngine(
            cfg, params, max_slots=16, num_pages=192, page_size=128,
            # round-4 sweep winner (BENCH.md serving section): chunk=4096 lets
            # the ~2.3k-token multimodal prompts prefill in ONE chunk (cheap
            # now that chunk attention is gather+flash), and with the decode
            # step at ~12.4 ms prefill_priority measured neutral-to-negative
            prompt_bucket=128, max_len=4096, decode_roll=16, prefill_chunk=4096,
        )
        sreqs, simages, _ = build_workload(np.random.default_rng(0))
        wids = [pengine.submit(list(r), im, max_new_tokens=4, eos_token_id=-1)
                for r, im in zip(sreqs, simages)]
        pengine.run_to_completion()
        for w in wids:
            pengine.pop_result(w)
        _log("serving warmup done")
        pengine.reset_latency_stats()  # drop compile-time TTFTs
        t0 = time.perf_counter()
        rids = [pengine.submit(list(r), im, max_new_tokens=MAX_NEW, eos_token_id=-1)
                for r, im in zip(sreqs, simages)]
        pengine.run_to_completion()
        serving_wall = time.perf_counter() - t0
        serving_latency = {
            k: round(v, 4) if isinstance(v, float) else v
            for k, v in pengine.latency_stats().items()
        }
        n_gen = sum(len(pengine.pop_result(r)[0]) for r in rids)
        serving_toks = round(n_gen / serving_wall, 2)
        _log(f"serving: {serving_toks} tok/s {serving_latency}")

        # Arrival-mode counterpart (VERDICT r4 #1): the burst number excludes
        # queueing delay; a serving engine's honest number is sustained tok/s
        # + TTFT under Poisson offered load.  One rate below the measured
        # saturation knee (see BENCH.md rate sweep) keeps this a steady-state
        # sample, not a stress test.
        try:
            from dev.bench_serving import run_arrivals

            pengine.precompile(variants=((False, False),))
            _log("arrival precompile done")
            areqs, aimages, _ = build_workload(np.random.default_rng(3), 32)
            wids = run_arrivals(pengine, areqs, aimages, ARRIVAL_RATE_REQ_S)
            for w in wids:
                pengine.pop_result(w)
            # Two measured passes, both reported: the tunneled chip shows
            # occasional one-off multi-second stalls (allocation/defrag —
            # BENCH.md rate-sweep methodology note) that a single pass
            # cannot distinguish from engine behavior.
            runs = []
            for _ in range(2):
                pengine.reset_latency_stats()
                ticks = []
                t0 = time.perf_counter()
                wids = run_arrivals(pengine, areqs, aimages, ARRIVAL_RATE_REQ_S, tick_log=ticks)
                awall = time.perf_counter() - t0
                a_gen = sum(len(pengine.pop_result(w)[0]) for w in wids)
                alat = {k: round(v, 4) if isinstance(v, float) else v
                        for k, v in pengine.latency_stats().items()}
                runs.append({
                    "sustained_tokens_per_sec": round(a_gen / awall, 2),
                    "queue_depth_max": max((t[3] for t in ticks), default=0),
                    **alat,
                })
            serving_latency["arrival_mode"] = {
                "rate_req_s": ARRIVAL_RATE_REQ_S,
                "offered_load_tok_s": round(ARRIVAL_RATE_REQ_S * MAX_NEW, 1),
                "runs": runs,
            }
            _log(f"arrival-mode: {serving_latency['arrival_mode']}")
        except Exception as e:
            _log(f"arrival-mode serving skipped: {type(e).__name__}: {e}")
        del pengine
    except Exception as e:  # never lose the core metrics to the serving add-on
        _log(f"serving bench skipped: {type(e).__name__}: {e}")

    # Effective FLOP rates (model-geometry FLOPs / measured time).
    v, t = cfg.vision, cfg.text
    s_vit = v.num_patch_tokens + 1
    per_layer = 2 * s_vit * v.hidden_size * (
        3 * v.hidden_size + v.hidden_size + 2 * v.intermediate_size
    ) + 4 * s_vit * s_vit * v.hidden_size
    vit_flops = N_TILES * v.num_hidden_layers * per_layer
    n_prefill = int(plan.lengths[0])
    hd, h, kvh = t.attn_head_dim, t.num_attention_heads, t.num_key_value_heads
    llm_layer = 2 * n_prefill * t.hidden_size * (
        (h + 2 * kvh) * hd + h * hd + 3 * t.intermediate_size
    ) + 4 * n_prefill * n_prefill * h * hd // 2
    prefill_flops = t.num_hidden_layers * llm_layer

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_chip",
                "value": round(decode_toks, 2),
                "unit": "tokens/s",
                "vs_baseline": round(decode_toks / A100_REFERENCE_DECODE_TOKS, 2),
                "extra": {
                    "model": model_name,
                    "ttft_ms": round(ttft * 1000, 1),
                    "vit_images_per_sec": round(vit_images_per_sec, 2),
                    "vit_images_per_sec_batched": round(vit_images_per_sec_batched, 2),
                    "vit_batched_tflops": round(n_imgs * vit_flops / vit_batched_time / 1e12, 1),
                    "vit_tflops": round(vit_flops / vit_time / 1e12, 1),
                    "prefill_ms": round(prefill_time * 1000, 1),
                    "prefill_tflops": round(prefill_flops / prefill_time / 1e12, 1),
                    "prefill_tokens": int(plan.lengths[0]),
                    "anyres_tiles": N_TILES,
                    "decode_tokens": DECODE_TOKENS,
                    "batch4_decode_tokens_per_sec": round(batch_decode_toks, 2),
                    "batch8_decode_tokens_per_sec": round(batch_decode[8], 2),
                    "serving_tokens_per_sec": serving_toks,
                    "serving_latency": serving_latency,
                    "serving_note": "paged continuous batching, 16 mixed requests (64-512 prompt tokens, 2-tile image every 4th), 64 generated each (dev/bench_serving.py workload)",
                    "baseline_assumption": "30 tok/s: A100 fp16 HF-4.41 generate (reference stack)",
                    "bf16_decode_note": "13B bf16 weights (26GB) exceed one 16GB v5e chip; int8 weight-only is the single-chip serving dtype (bf16 needs TP>=2). Decode is HBM-bound, so bf16 at TP=2 ~= the same tok/s as int8 at TP=1.",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
