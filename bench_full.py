"""Full benchmark sweep: the five BASELINE.json configs on the 13B flagship.

1. single_inference.py: one 448px image + question, greedy decode
2. cli.py multi-turn chat (second turn with history)
3. high-res dynamic tiling (1344×1344 → 10 tiles, long prefill)
4. multi-image interleave (Mantis-style, 2 images)
5. video QA: 32-frame batched frame encode + long prefill

Writes BENCH.md and prints one JSON line per config.  Synthetic int8 weights
(no published checkpoint offline); timing methodology as bench.py (queued
dispatch + readback sync for the axon tunnel).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from bench import _synth_params, _sync, DECODE_TOKENS
from omchat_tpu.config import OmChatConfig, VisionConfig
from omchat_tpu.constants import IMAGE_TOKEN_INDEX
from omchat_tpu.ops.sampling import greedy
from omchat_tpu.runtime.generate import OmChatEngine, _decode_loop_jit

DECODE = 128


def measure(engine, params, cfg, name, n_tiles, text_tokens, history_tokens=0, decode=DECODE, chunked=False):
    rng = np.random.default_rng(0)
    pixels = (
        jnp.asarray(rng.standard_normal((n_tiles, 3, 448, 448)).astype(np.float32), dtype=jnp.bfloat16)
        if n_tiles
        else None
    )
    ids = [151644] * 3 + list(range(3000, 3000 + history_tokens))
    ids += [IMAGE_TOKEN_INDEX] * n_tiles + list(range(1000, 1000 + text_tokens)) + [151645]

    plan = engine.plan([ids])
    feats = engine.encode_images(pixels) if pixels is not None else None

    def prefill(f):
        # long-context configs prefill in chunks to bound activation memory
        if chunked:
            return engine.prefill_chunked(plan, f, decode, chunk_size=2048)
        return engine.prefill(plan, f, decode)

    # compile pass
    logits, cache = prefill(feats)
    _sync(logits)
    first = greedy(logits)
    out, _ = _decode_loop_jit(params, cfg, first, jnp.asarray(plan.lengths), cache, decode, -1, None)
    _sync(out)

    # timed TTFT (encode + prefill)
    t0 = time.perf_counter()
    feats2 = engine.encode_images(pixels) if pixels is not None else None
    logits, cache = prefill(feats2)
    _sync(logits)
    ttft = time.perf_counter() - t0

    # timed decode
    first = greedy(logits)
    _sync(first)
    t0 = time.perf_counter()
    out, _ = _decode_loop_jit(params, cfg, first, jnp.asarray(plan.lengths), cache, decode, -1, None)
    _sync(out)
    toks = (decode - 1) / (time.perf_counter() - t0)

    row = {
        "config": name,
        "prefill_tokens": int(plan.lengths[0]),
        "tiles": n_tiles,
        "ttft_ms": round(ttft * 1000, 1),
        "decode_tokens_per_sec": round(toks, 2),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    rng = np.random.default_rng(0)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = _synth_params(cfg, rng)
    engine = OmChatEngine(cfg, params)

    rows = [
        measure(engine, params, cfg, "13B_single_image_448px", n_tiles=2, text_tokens=32),
        measure(engine, params, cfg, "13B_chat_second_turn_with_history", n_tiles=2, text_tokens=32, history_tokens=256),
        measure(engine, params, cfg, "13B_highres_anyres_10tiles", n_tiles=10, text_tokens=32),
        measure(engine, params, cfg, "13B_multi_image_interleave_2x5tiles", n_tiles=10, text_tokens=64),
    ]
    # Video is the OmChat-2.1-8B configuration (InternViT-300M + Qwen2-7B,
    # README.md:187-200); the 13B + 33k-token cache exceeds one 16GB chip.
    del params, engine
    cfg8 = OmChatConfig(vision=VisionConfig.internvit_300m()).with_w8a8()
    params8 = _synth_params(cfg8, rng)
    engine8 = OmChatEngine(cfg8, params8)
    rows.append(
        measure(engine8, params8, cfg8, "8B_video_32frames_chunked_prefill", n_tiles=32, text_tokens=32, chunked=True)
    )

    # Refresh only the table at the top of BENCH.md — the hand-written
    # roofline/analysis sections below the table must survive re-runs.
    header = (
        "# BENCH.md — measured on one TPU chip (v5e-class via axon), "
        "omchat-v2.0-13B geometry, int8 weights (w8a8 serving mode)\n\n"
        "Five BASELINE.json configs; TTFT = image encode + prefill to first-token logits;\n"
        "decode via the on-device while_loop (greedy). Synthetic weights (no published\n"
        "checkpoint offline); see bench.py for methodology + the vs_baseline assumption.\n\n"
        "| config | prefill tokens | tiles | TTFT (ms) | decode tok/s |\n|---|---|---|---|---|\n"
    )
    table = "".join(
        f"| {r['config']} | {r['prefill_tokens']} | {r['tiles']} | {r['ttft_ms']} | {r['decode_tokens_per_sec']} |\n"
        for r in rows
    )
    tail = ""
    try:
        old = open("BENCH.md").read()
        lines = old.splitlines(keepends=True)
        rest = []
        past_table = False
        for i, line in enumerate(lines):
            if line.startswith("|"):
                past_table = True
            elif past_table:
                rest = lines[i:]
                break
        if not rest:
            # No table found (hand-edited file): preserve everything from the
            # first analysis heading rather than silently dropping it.
            for i, line in enumerate(lines):
                if line.startswith("## "):
                    rest = lines[i:]
                    break
        tail = "".join(rest)
    except FileNotFoundError:
        pass
    with open("BENCH.md", "w") as f:
        f.write(header + table + tail)
    print("wrote BENCH.md", flush=True)


if __name__ == "__main__":
    main()
