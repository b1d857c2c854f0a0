"""Speculative decoding on TPU: tok/s + acceptance vs step-by-step greedy.

Workload: an echo-heavy continuation (the summarization/extraction shape where
prompt lookup pays) constructed model-agnostically — the prompt embeds the
model's own greedy continuation, so the tail n-gram matches earlier content
and drafts verify.  Also measures a non-echoing prompt (the honest downside
case: every verify step proposes nothing or gets rejected).

    python dev/bench_speculative.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench
from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.runtime.generate import OmChatEngine
from omchat_tpu.runtime.speculative import generate_speculative

MAX_NEW = 64


def main():
    rng = np.random.default_rng(0)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    bench._log("params built")

    engine = OmChatEngine(cfg, params, prompt_bucket=128)
    gen = GenerationConfig(max_new_tokens=MAX_NEW, eos_token_id=-1)

    seed_ids = [151644] + [int(t) for t in rng.integers(2000, 20000, 199)]
    base = engine.generate([seed_ids], None, gen).token_ids[0]
    # echo prompt: the model's own continuation appears verbatim mid-prompt,
    # then the seed repeats — greedy decode re-derives `base`, and prompt
    # lookup drafts it from the earlier occurrence
    echo_ids = seed_ids + base + seed_ids
    cold_ids = [151644] + [int(t) for t in rng.integers(20000, 40000, 498)]

    results = {}
    for name, ids in (("echo", echo_ids), ("cold", cold_ids)):
        # warmup/compile both paths on this bucket
        engine.generate([ids], None, GenerationConfig(max_new_tokens=4, eos_token_id=-1))
        generate_speculative(engine, ids, None, GenerationConfig(max_new_tokens=4, eos_token_id=-1))

        t0 = time.perf_counter()
        ref = engine.generate([ids], None, gen).token_ids[0]
        t_base = time.perf_counter() - t0

        t0 = time.perf_counter()
        out, steps = generate_speculative(engine, ids, None, gen, ngram=2, draft_len=8)
        t_spec = time.perf_counter() - t0

        assert out == ref, f"{name}: speculative output diverged"
        results[name] = {
            "baseline_tok_s": round(len(ref) / t_base, 1),
            "speculative_tok_s": round(len(out) / t_spec, 1),
            "speedup": round(t_base / t_spec, 2),
            "tokens": len(out),
            "verify_steps": steps,
            "tokens_per_step": round(len(out) / max(steps, 1), 2),
        }
        bench._log(f"{name}: {results[name]}")

    print(json.dumps({"metric": "speculative_decode", "extra": results}), flush=True)


if __name__ == "__main__":
    main()
