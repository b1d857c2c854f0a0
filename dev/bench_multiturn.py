"""Multi-turn VQA turn-2 latency: image-aware prefix cache + encoded-image LRU.

Turn 1 sends an image + question; turn 2 resends the full history (OpenAI
chat contract) plus a new question.  With both caches the second turn skips
the ViT encode (feature LRU hit via the shared image key) AND the whole
turn-1 KV prefill (prefix pages now address image rows through the image
key), leaving only the new suffix to prefill.

    python dev/bench_multiturn.py
"""

import json
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench
from omchat_tpu.config import OmChatConfig
from omchat_tpu.constants import IMAGE_TOKEN_INDEX
from omchat_tpu.runtime.paged_engine import PagedBatchEngine

MAX_NEW = 1  # TTFT proxy: submit -> first (only) token


def turn_ids(rng, n_hist_text):
    ids = [151644, 8948] + [int(t) for t in rng.integers(2000, 20000, 30)]
    ids += [IMAGE_TOKEN_INDEX, IMAGE_TOKEN_INDEX]  # thumbnail + 1 anyres tile
    ids += [int(t) for t in rng.integers(2000, 20000, n_hist_text)]
    return ids


def run(prefix_cache, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    engine = PagedBatchEngine(
        cfg, params, max_slots=4, num_pages=96, page_size=128, prompt_bucket=128,
        max_len=8192, decode_roll=4, prefill_chunk=2048, prefix_cache=prefix_cache,
    )
    img = jnp.asarray(rng.standard_normal((2, 3, 448, 448)), jnp.bfloat16)
    key = "turn-image"
    t1 = turn_ids(rng, 400)
    t2 = t1 + [int(t) for t in rng.integers(2000, 20000, 64)]

    # warmup/compile: run BOTH turn shapes once (cold cache paths + resumed
    # paths compile here), then flush every cache and measure
    for ids in (t1, t2):
        rid = engine.submit(list(ids), img, max_new_tokens=MAX_NEW, eos_token_id=-1,
                            image_cache_key=key)
        engine.run_to_completion(max_ticks=300)
        engine.pop_result(rid)
    if engine.prefix_cache is not None:
        engine.allocator.release(engine.prefix_cache.flush())
    bench._log(f"warmup done (prefix_cache={prefix_cache})")

    t0 = time.perf_counter()
    rid = engine.submit(list(t1), img, max_new_tokens=MAX_NEW, eos_token_id=-1,
                        image_cache_key=key)
    engine.run_to_completion(max_ticks=300)
    engine.pop_result(rid)
    turn1_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    rid = engine.submit(list(t2), img, max_new_tokens=MAX_NEW, eos_token_id=-1,
                        image_cache_key=key)
    engine.run_to_completion(max_ticks=300)
    engine.pop_result(rid)
    turn2_s = time.perf_counter() - t0
    stats = engine.prefix_cache.stats() if engine.prefix_cache else None
    del engine
    return turn1_s, turn2_s, stats


def main():
    t1_off, t2_off, _ = run(prefix_cache=False)
    bench._log(f"no cache: turn1 {t1_off*1000:.0f} ms, turn2 {t2_off*1000:.0f} ms")
    t1_on, t2_on, stats = run(prefix_cache=True)
    bench._log(f"cached:   turn1 {t1_on*1000:.0f} ms, turn2 {t2_on*1000:.0f} ms")
    print(
        json.dumps(
            {
                "metric": "multiturn_vqa_turn2_ttft_ms",
                "value": round(t2_on * 1000, 1),
                "unit": "ms",
                "extra": {
                    "turn2_uncached_ms": round(t2_off * 1000, 1),
                    "turn1_ms": round(t1_on * 1000, 1),
                    "speedup_turn2": round(t2_off / t2_on, 2),
                    "prefix_cache_stats": stats,
                    "note": "turn2 resends turn1 (2-tile image + 432 text tokens) plus a 64-token question; caches: image-aware prefix pages + encoded-image LRU",
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
