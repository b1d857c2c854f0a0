"""Paged decode scaling: per-step cost vs slot count, fill, and roll width.

The serving bench at 16 slots implies ~34 ms per decode step (475 tok/s
aggregate) while exp_paged_decode measured 22.9 ms at B=8 — this harness
separates the three candidate causes: per-slot KV streaming (fill), per-slot
compute (B), and per-dispatch host overhead (roll amortization).

    python dev/exp_decode_b.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dev.profile_llm import _sync  # noqa: E402
from dev.exp_paged_decode import full_lm_params  # noqa: E402

from omchat_tpu.config import OmChatConfig  # noqa: E402

N_REP = 20
PAGE = 64


def main():
    import dataclasses

    rng = np.random.default_rng(0)
    tcfg, params = full_lm_params(rng)
    cfg = dataclasses.replace(OmChatConfig.omchat_v2_13b().with_w8a8(), text=tcfg)
    print("[exp] params built", flush=True)

    from omchat_tpu.runtime.paged_engine import (
        _paged_decode_roll_jit,
        _paged_decode_step_jit,
    )

    results = {}
    for S in (8, 16):
        for fill in (512, 2048):
            tokens = jnp.asarray(rng.integers(2000, 20000, S), jnp.int32)
            lengths = jnp.full((S,), fill, jnp.int32)
            active = jnp.ones((S,), bool)
            max_pages = -(-4096 // PAGE) + 1
            per = -(-fill // PAGE) + 10
            num_pages = S * per + 1
            shape = (tcfg.num_hidden_layers, num_pages + 1, tcfg.num_key_value_heads, PAGE, tcfg.attn_head_dim)
            k0 = jnp.zeros(shape, jnp.bfloat16)
            v0 = jnp.zeros(shape, jnp.bfloat16)
            tables = np.full((S, max_pages), num_pages, np.int32)
            nxt = 0
            for s_ in range(S):
                tables[s_, :per] = np.arange(nxt, nxt + per)
                nxt += per
            tables = jnp.asarray(tables)

            # single step
            kp, vp = jnp.copy(k0), jnp.copy(v0)
            toks, kp, vp = _paged_decode_step_jit(
                params, cfg, tokens, lengths, active, tables, kp, vp, PAGE, "pallas", "dense"
            )
            _sync(toks)
            t0 = time.perf_counter()
            for _ in range(N_REP):
                toks, kp, vp = _paged_decode_step_jit(
                    params, cfg, tokens, lengths, active, tables, kp, vp, PAGE, "pallas", "dense"
                )
            _sync(toks)
            ms = (time.perf_counter() - t0) / N_REP * 1000
            results[f"B{S}_fill{fill}_step"] = round(ms, 2)
            print(f"[exp] B{S} fill{fill} step: {ms:.2f} ms", flush=True)

            # roll of 8 (one dispatch, 8 sequential steps in-graph)
            kp, vp = jnp.copy(k0), jnp.copy(v0)
            toks8, kp, vp = _paged_decode_roll_jit(
                params, cfg, tokens, lengths, active, tables, kp, vp, PAGE, "pallas", 8, "dense"
            )
            _sync(toks8)
            t0 = time.perf_counter()
            for _ in range(max(4, N_REP // 4)):
                toks8, kp, vp = _paged_decode_roll_jit(
                    params, cfg, tokens, lengths, active, tables, kp, vp, PAGE, "pallas", 8, "dense"
                )
            _sync(toks8)
            per_step = (time.perf_counter() - t0) / max(4, N_REP // 4) / 8 * 1000
            results[f"B{S}_fill{fill}_roll8_per_step"] = round(per_step, 2)
            print(f"[exp] B{S} fill{fill} roll8/step: {per_step:.2f} ms", flush=True)
            del kp, vp, k0, v0

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
