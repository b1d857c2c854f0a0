"""Paged decode matrix: kernel (auto-pipelined vs manual-DMA ring) × pool
dtype (bf16 vs fp8 e4m3) × page size, at the painful serving geometry
(B=16, fill=2048; 13B w8a8).

Decode is DMA-issue-bound (BENCH.md decode anatomy): the auto kernel pays
per-grid-step issue overhead per page, the manual kernel keeps NBUF pages in
flight per request; fp8 halves page bytes, and fp8@ps256 moves the same bytes
per fetch as bf16@ps128 with half the fetches.

    python dev/exp_decode_kv.py
"""

import dataclasses
import json
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dev.profile_llm import _sync  # noqa: E402
from dev.exp_paged_decode import full_lm_params  # noqa: E402

from omchat_tpu.config import OmChatConfig  # noqa: E402

N_REP = 20
B = 16
FILL = 2048


def one(params, cfg, rng, page, impl, dtype):
    from omchat_tpu.runtime.paged_engine import _paged_decode_step_jit

    tc = cfg.text
    tokens = jnp.asarray(rng.integers(2000, 20000, B), jnp.int32)
    lengths = jnp.full((B,), FILL, jnp.int32)
    active = jnp.ones((B,), bool)
    max_pages = -(-4096 // page) + 1
    per = -(-FILL // page) + 2
    num_pages = B * per + 1
    shape = (tc.num_hidden_layers, num_pages + 1, tc.num_key_value_heads, page, tc.attn_head_dim)
    kp = jnp.zeros(shape, dtype)
    vp = jnp.zeros(shape, dtype)
    tables = np.full((B, max_pages), num_pages, np.int32)
    nxt = 0
    for s_ in range(B):
        tables[s_, :per] = np.arange(nxt, nxt + per)
        nxt += per
    tables = jnp.asarray(tables)

    toks, kp, vp = _paged_decode_step_jit(
        params, cfg, tokens, lengths, active, tables, kp, vp, page, impl, "dense"
    )
    _sync(toks)
    t0 = time.perf_counter()
    for _ in range(N_REP):
        toks, kp, vp = _paged_decode_step_jit(
            params, cfg, tokens, lengths, active, tables, kp, vp, page, impl, "dense"
        )
    _sync(toks)
    return (time.perf_counter() - t0) / N_REP * 1000


def main():
    rng = np.random.default_rng(0)
    tcfg, params = full_lm_params(rng)
    cfg = dataclasses.replace(OmChatConfig.omchat_v2_13b().with_w8a8(), text=tcfg)
    print("[exp] params built", flush=True)

    results = {}
    for name, page, impl, dtype in (
        ("auto_bf16_ps128", 128, "pallas", jnp.bfloat16),
        ("manual_bf16_ps128", 128, "pallas_manual", jnp.bfloat16),
        ("auto_fp8_ps128", 128, "pallas", jnp.float8_e4m3fn),
        ("auto_fp8_ps256", 256, "pallas", jnp.float8_e4m3fn),
        ("manual_fp8_ps256", 256, "pallas_manual", jnp.float8_e4m3fn),
    ):
        try:
            ms = one(params, cfg, rng, page, impl, dtype)
        except Exception as e:  # noqa: BLE001
            print(f"[exp] {name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            results[name] = None
            continue
        results[name] = round(ms, 2)
        print(f"[exp] {name}: {ms:.2f} ms/step (B{B} fill{FILL})", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
