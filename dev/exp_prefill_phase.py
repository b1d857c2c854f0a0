"""Price the serving prefill phase's two padding/batching inefficiencies.

(a) ViT encode: 4 separate 2-tile dispatches (one per multimodal request,
    as `submit` does today) vs ONE stacked 8-tile dispatch.
(b) Batched short-prompt prefill: one [16, 512] dispatch (every prompt padded
    to the longest bucket, B padded to a power of two) vs length-bucketed
    groups ([B1,128]+[B2,256]+[B3,512]) vs per-request dispatches.

    python dev/exp_prefill_phase.py
"""

import json
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench
from omchat_tpu.config import OmChatConfig
from omchat_tpu.runtime.generate import OmChatEngine

N_REP = 10


def timeit(fn):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_REP):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / N_REP * 1e3


import jax  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    eng = OmChatEngine(cfg, params)

    res = {}

    # (a) ViT encode batching
    tiles2 = [jnp.asarray(rng.standard_normal((2, 3, 448, 448)), jnp.bfloat16) for _ in range(4)]
    tiles8 = jnp.concatenate(tiles2, axis=0)

    res["encode_4x2tiles_ms"] = timeit(lambda: [eng.encode_images(t) for t in tiles2])
    res["encode_1x8tiles_ms"] = timeit(lambda: eng.encode_images(tiles8))
    print(f"[exp] encode 4x2: {res['encode_4x2tiles_ms']:.1f} ms   1x8: {res['encode_1x8tiles_ms']:.1f} ms")

    # (b) shorts prefill batching, 12 text prompts, lengths as in bench_serving
    lengths = sorted(int(rng.integers(64, 513)) for _ in range(12))
    prompts = [[int(t) for t in rng.integers(2000, 20000, n)] for n in lengths]

    def one_batch(group):
        bb = 1
        while bb < len(group):
            bb *= 2
        ids = group + [group[0]] * (bb - len(group))
        plan = eng.plan(ids)
        return eng.prefill(plan, None, 0)[0]

    res["shorts_one_16x512_ms"] = timeit(lambda: one_batch(prompts))

    def bucketed():
        groups = {}
        for p in prompts:
            b = 128
            while b < len(p):
                b *= 2
            groups.setdefault(b, []).append(p)
        return [one_batch(g) for g in groups.values()]

    res["shorts_bucketed_ms"] = timeit(bucketed)
    res["shorts_per_request_ms"] = timeit(lambda: [one_batch([p]) for p in prompts])
    print(
        f"[exp] shorts one[16,512]: {res['shorts_one_16x512_ms']:.1f} ms   "
        f"bucketed: {res['shorts_bucketed_ms']:.1f} ms   per-req: {res['shorts_per_request_ms']:.1f} ms"
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
