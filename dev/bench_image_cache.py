"""Encoded-image LRU: what a repeated image saves at the 13B geometry.

Times one 5-tile anyres encode (the bench.py TTFT configuration) uncached vs
a cache hit under both keying modes (content-hashed numpy pixels / explicit
key as serve.py passes).  The hit replaces the whole ViT+projector stage
with a host-side hash, so this is the per-turn TTFT saving for multi-turn
VQA on the same image.

    python dev/bench_image_cache.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench
from omchat_tpu.config import OmChatConfig
from omchat_tpu.runtime.feature_cache import pixel_digest
from omchat_tpu.runtime.generate import OmChatEngine

N_TILES = 5
REPS = 5


def main():
    rng = np.random.default_rng(0)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    engine = OmChatEngine(cfg, params, image_cache_size=8)

    img = rng.standard_normal((N_TILES, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(
        np.float32
    )

    t0 = time.perf_counter()
    bench._sync(engine.encode_images(img))
    compile_s = time.perf_counter() - t0
    bench._log(f"encode compiled in {compile_s:.1f}s")

    def timed(fn):
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            bench._sync(fn())
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000

    t0 = time.perf_counter()
    for _ in range(REPS):
        pixel_digest(img)
    digest_ms = (time.perf_counter() - t0) / REPS * 1000

    engine.image_cache.clear()
    uncached = OmChatEngine(cfg, params, image_cache_size=0)
    ms_encode = timed(lambda: uncached.encode_images(img))
    engine.encode_images(img)  # seed
    ms_hit_hash = timed(lambda: engine.encode_images(img))
    engine.encode_images(img, cache_key="fixed")  # seed
    ms_hit_key = timed(lambda: engine.encode_images(img, cache_key="fixed"))

    print(
        json.dumps(
            {
                "metric": "image_cache_hit_ms",
                "value": round(ms_hit_key, 2),
                "unit": "ms",
                "extra": {
                    "encode_uncached_ms": round(ms_encode, 2),
                    "hit_content_hash_ms": round(ms_hit_hash, 2),
                    "hit_explicit_key_ms": round(ms_hit_key, 2),
                    "pixel_digest_ms": round(digest_ms, 2),
                    "tiles": N_TILES,
                    "speedup_vs_encode": round(ms_encode / max(ms_hit_key, 1e-3), 1),
                    "stats": engine.image_cache.stats(),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
