"""Price the paged speculative verify dispatch against a decode step/roll.

The verify's economics: one dispatch scores draft_len+1 positions per slot
for ~one weight stream, so at mean acceptance a the per-token cost divides
by (1+a) — but only if the dispatch itself stays near one decode step.  This
measures, at the standard serving shapes (13B w8a8, 16 slots, fill ~512,
ps=128):

- one decode step (roll=1),
- one decode roll of 16,
- one verify dispatch at draft_len {4, 8},

and prints the break-even acceptance (verify_ms / step_ms - 1).

    python dev/exp_verify_cost.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench
from omchat_tpu.config import OmChatConfig
from omchat_tpu.runtime.paged_engine import (
    _paged_decode_roll_jit,
    _paged_decode_step_jit,
    _paged_verify_jit,
)

REPS = 20
S, PS, PAGES, FILL, WIDTH = 16, 128, 192, 512, 8


def main():
    rng = np.random.default_rng(0)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    bench._log("params built")

    tc = cfg.text
    shape = (tc.num_hidden_layers, PAGES + 1, tc.num_key_value_heads, PS, tc.attn_head_dim)
    k_pool = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    v_pool = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    lengths = jnp.full((S,), FILL, jnp.int32)
    active = jnp.ones((S,), bool)
    # distinct pages per (slot, page-index) row
    tables = jnp.asarray(
        (np.arange(S)[:, None] * WIDTH + np.arange(WIDTH)[None, :]) % PAGES, jnp.int32
    )
    tokens = jnp.full((S,), 17, jnp.int32)

    def timed(fn, *args, **kw):
        out = fn(*args, **kw)
        bench._sync(out[0])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args, **kw)
        bench._sync(out[0])
        return (time.perf_counter() - t0) / REPS * 1000.0

    nonlocal_pool = {"k": k_pool, "v": v_pool}

    def step():
        o, nonlocal_pool["k"], nonlocal_pool["v"] = _paged_decode_step_jit(
            params, cfg, tokens, lengths, active, tables,
            nonlocal_pool["k"], nonlocal_pool["v"], PS, None, "dense",
        )
        return (o,)

    def roll16():
        o, nonlocal_pool["k"], nonlocal_pool["v"] = _paged_decode_roll_jit(
            params, cfg, tokens, lengths, active, tables,
            nonlocal_pool["k"], nonlocal_pool["v"], PS, None, 16, "dense",
        )
        return (o,)

    def verify(t_chunk):
        toks = jnp.full((S, t_chunk), 23, jnp.int32)

        def call():
            o, nonlocal_pool["k"], nonlocal_pool["v"] = _paged_verify_jit(
                params, cfg, toks, lengths, active, tables,
                nonlocal_pool["k"], nonlocal_pool["v"], PS, None, "dense",
            )
            return (o,)

        return call

    step_ms = timed(step)
    bench._log(f"decode step: {step_ms:.2f} ms")
    roll_ms = timed(roll16)
    bench._log(f"roll16: {roll_ms:.2f} ms ({roll_ms / 16:.2f} ms/step)")
    out = {"decode_step_ms": round(step_ms, 2), "roll16_ms": round(roll_ms, 2)}
    for t in (5, 9):
        v_ms = timed(verify(t))
        out[f"verify_t{t}_ms"] = round(v_ms, 2)
        out[f"verify_t{t}_break_even_accept"] = round(v_ms / (roll_ms / 16) - 1, 2)
        bench._log(f"verify T={t}: {v_ms:.2f} ms")
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
