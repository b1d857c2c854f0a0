"""Paged decode step anatomy on TPU: where the 334-vs-644 tok/s gap lives.

Times the jitted paged decode step at B=8 slots (13B w8a8 geometry, LLM only)
across: KV-write strategy (batched scatter vs per-slot DUS chain), attention
impl (Pallas paged kernel vs XLA gather), page size (64 vs 256), and the
contiguous slot-engine decode step as the reference ceiling.

    python dev/exp_paged_decode.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dev.profile_llm import _sync, build_text_params  # noqa: E402

from omchat_tpu.config import OmChatConfig  # noqa: E402

S = 8  # slots
FILL = 512  # tokens already in each request
N_REP = 20


def full_lm_params(rng):
    cfg, layer_params = build_text_params()
    v, d = cfg.vocab_size, cfg.hidden_size
    embed = jnp.asarray(rng.standard_normal((v, d)) * 0.02, jnp.bfloat16)
    lm = dict(layer_params)
    lm["embed_tokens"] = embed
    lm["norm"] = {"scale": jnp.ones((d,), jnp.bfloat16)}
    from omchat_tpu.ops.linear import quantize_linear

    lm["lm_head"] = quantize_linear(
        {"kernel": jnp.asarray(rng.standard_normal((d, v)) * 0.02, jnp.bfloat16)}
    )
    _sync(lm["norm"]["scale"])
    return cfg, {"language_model": lm}


def bench_step(fn, args_builder, n=N_REP):
    toks, kp, vp = fn(*args_builder(None, None))
    _sync(toks)  # compile
    kp2 = vp2 = None
    t0 = time.perf_counter()
    for _ in range(n):
        toks, kp2, vp2 = fn(*args_builder(kp2, vp2))
    _sync(toks)
    return (time.perf_counter() - t0) / n * 1000


def main():
    import dataclasses

    rng = np.random.default_rng(0)
    tcfg, params = full_lm_params(rng)
    cfg = dataclasses.replace(OmChatConfig.omchat_v2_13b().with_w8a8(), text=tcfg)
    print("[exp] params built", flush=True)

    from omchat_tpu.runtime.paged_engine import _paged_decode_step_jit

    results = {}
    tokens = jnp.asarray(rng.integers(2000, 20000, S), jnp.int32)
    lengths = jnp.full((S,), FILL, jnp.int32)
    active = jnp.ones((S,), bool)

    for page_size in (64, 256):
        max_pages = -(-4096 // page_size) + 1
        num_pages = S * (-(-FILL // page_size) + 8) + 1
        shape = (tcfg.num_hidden_layers, num_pages + 1, tcfg.num_key_value_heads, page_size, tcfg.attn_head_dim)
        k_pool0 = jnp.zeros(shape, jnp.bfloat16)
        v_pool0 = jnp.zeros(shape, jnp.bfloat16)
        tables = np.full((S, max_pages), num_pages, np.int32)
        nxt = 0
        for s_ in range(S):
            need = -(-FILL // page_size) + 8
            tables[s_, :need] = np.arange(nxt, nxt + need)
            nxt += need
        tables = jnp.asarray(tables)

        for kv_write in ("scatter", "dus_loop"):
            for impl in ("pallas", "xla"):
                label = f"ps{page_size}_{kv_write}_{impl}"
                pools = {"k": k_pool0, "v": v_pool0}

                def build(kp, vp, _pools=pools):
                    if kp is None:
                        kp, vp = jnp.copy(_pools["k"]), jnp.copy(_pools["v"])
                    return (
                        params, cfg, tokens, lengths, active, tables, kp, vp,
                        page_size, impl, "dense",
                    )

                fn = lambda *a: _paged_decode_step_jit(*a, kv_write=kv_write)
                try:
                    ms = bench_step(fn, build)
                    results[label] = round(ms, 2)
                    print(f"[exp] {label}: {ms:.2f} ms", flush=True)
                except Exception as e:
                    results[label] = f"error: {type(e).__name__}"
                    print(f"[exp] {label}: {type(e).__name__}: {e}", flush=True)
        del k_pool0, v_pool0

    # contiguous slot-engine decode step (the ceiling)
    from omchat_tpu.models.qwen2 import init_kv_cache
    from omchat_tpu.runtime.generate import _decode_step_jit

    cache0 = init_kv_cache(tcfg, S, 4096, dtype=jnp.bfloat16)
    kv_len = jnp.full((S,), FILL, jnp.int32)

    def bench_slot(impl):
        cache = jax.tree.map(jnp.copy, cache0)
        logits, cache = _decode_step_jit(params, cfg, tokens, kv_len, cache, impl)
        _sync(logits)
        t0 = time.perf_counter()
        for _ in range(N_REP):
            logits, cache = _decode_step_jit(params, cfg, tokens, kv_len, cache, impl)
        _sync(logits)
        return (time.perf_counter() - t0) / N_REP * 1000

    for impl in ("pallas", "xla"):
        ms = bench_slot(impl)
        results[f"slot_{impl}"] = round(ms, 2)
        print(f"[exp] slot_{impl}: {ms:.2f} ms", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
