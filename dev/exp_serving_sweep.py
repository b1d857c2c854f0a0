"""Serving config sweep on one params build: decode_roll / prefill_chunk
variants of the mixed workload, plus the paged engine's PURE decode rate at
full occupancy (the number the mixed workload should approach).

    python dev/exp_serving_sweep.py
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

N_REQUESTS = 16
MAX_NEW = 64


def build_workload(rng):
    lengths = [int(rng.integers(64, 513)) for _ in range(N_REQUESTS)]
    reqs, images = [], []
    for i, n in enumerate(lengths):
        ids = [151644] + [int(t) for t in rng.integers(2000, 20000, n - 1)]
        if i % 4 == 0:
            ids = ids[:2] + [IMAGE_TOKEN_INDEX, IMAGE_TOKEN_INDEX] + ids[2:]
            images.append(jnp.asarray(rng.standard_normal((2, 3, 448, 448)), jnp.bfloat16))
        else:
            images.append(None)
        reqs.append(ids)
    return reqs, images


def make_engine(cfg, params, decode_roll, prefill_chunk, max_slots=8, num_pages=224):
    return PagedBatchEngine(
        cfg, params, max_slots=max_slots, num_pages=num_pages, page_size=64,
        prompt_bucket=128, max_len=4096, decode_roll=decode_roll,
        prefill_chunk=prefill_chunk,
    )


def warmup(engine, rng, reqs, images):
    mm_buckets = set()
    for ids, img in zip(reqs, images):
        if img is not None:
            mm_buckets.add(-(-int(engine._prefiller.plan([ids]).lengths[0]) // 128) * 128)
    wids = []
    for n in (100, 200, 380, 500):
        ids = [151644] + [int(t) for t in rng.integers(2000, 20000, n - 1)]
        wids.append(engine.submit(ids, max_new_tokens=4, eos_token_id=-1))
    for bucket in sorted(mm_buckets):
        ids = [151644, IMAGE_TOKEN_INDEX, IMAGE_TOKEN_INDEX] + [
            int(t) for t in rng.integers(2000, 20000, bucket - 2100)
        ]
        img = jnp.asarray(rng.standard_normal((2, 3, 448, 448)), jnp.bfloat16)
        wids.append(engine.submit(ids, img, max_new_tokens=4, eos_token_id=-1))
    engine.run_to_completion()
    for wid in wids:
        engine.pop_result(wid)


def measure(engine, reqs, images):
    t0 = time.perf_counter()
    ids = [engine.submit(r, img, max_new_tokens=MAX_NEW, eos_token_id=-1)
           for r, img in zip(reqs, images)]
    engine.run_to_completion()
    dt = time.perf_counter() - t0
    n_out = sum(len(engine.pop_result(rid)[0]) for rid in ids)
    assert n_out == N_REQUESTS * MAX_NEW, n_out
    return round(n_out / dt, 1), round(dt, 2)


def pure_decode_rate(engine, rng, steps=96, max_new=1500):
    """Fill every slot with short prompts and a large budget, then time
    decode-only ticks."""
    s = engine.max_slots
    rids = [
        engine.submit([151644] + [int(t) for t in rng.integers(2000, 20000, 63)],
                      max_new_tokens=max_new, eos_token_id=-1)
        for _ in range(s)
    ]
    engine.step()  # prefills all slots + first roll
    t0 = time.perf_counter()
    n_ticks = max(1, steps // engine.decode_roll)
    for _ in range(n_ticks):
        engine.step()
    dt = time.perf_counter() - t0
    for rid in rids:
        engine.requests.pop(rid)  # abandon; fresh engine per config anyway
    return round(n_ticks * engine.decode_roll * s / dt, 1)


def main():
    rng = np.random.default_rng(0)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    bench._log("params built")

    results = {}

    # pure decode rate at full occupancy: B=8 vs B=16 (weights amortize over
    # the batch — the decode step is weight+KV streaming bound)
    for slots, pages, max_new in ((8, 224, 1500), (16, 384, 1400)):
        eng = make_engine(cfg, params, 8, 2048, max_slots=slots, num_pages=pages)
        warm_reqs, warm_images = build_workload(np.random.default_rng(1))
        warmup(eng, np.random.default_rng(2), warm_reqs, warm_images)
        r = pure_decode_rate(eng, np.random.default_rng(3), max_new=max_new)
        results[f"pure_decode_tok_s_b{slots}"] = r
        bench._log(f"pure decode B={slots}: {r}")
        del eng

    for roll, chunk, slots, pages in ((16, 2048, 8, 224), (8, 2048, 16, 384), (16, 2048, 16, 384)):
        eng = make_engine(cfg, params, roll, chunk, max_slots=slots, num_pages=pages)
        rng_w = np.random.default_rng(0)
        reqs, images = build_workload(rng_w)
        warmup(eng, rng_w, reqs, images)
        tok_s, wall = measure(eng, reqs, images)
        results[f"mixed_roll{roll}_chunk{chunk}_b{slots}"] = {"tok_s": tok_s, "wall_s": wall}
        bench._log(f"roll={roll} chunk={chunk} slots={slots}: {tok_s} tok/s ({wall}s)")
        del eng

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
