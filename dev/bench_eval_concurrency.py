"""Measure eval throughput: serial model.chat loop vs run_eval_concurrent.

The eval drivers used to loop one request at a time through the
single-request engine (VERDICT r4: a real MMBench-Video pass would be
multi-day); `--concurrency N` routes greedy generation through the paged
continuous-batching engine instead.  This measures questions/min both ways
at the 13B w8a8 geometry on a 32-question mixed fixture (24 text + 8
single-image questions, 128 generated tokens each — the decode share real
evals have; answers are identical by construction, pinned on CPU in
tests/test_eval_harness.py).

    python dev/bench_eval_concurrency.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench
from omchat_tpu.api import OmChatModel
from omchat_tpu.config import OmChatConfig
from omchat_tpu.eval.harness import EvalSample, run_eval, run_eval_concurrent
from omchat_tpu.processing.image_processor import OmChatImageProcessor
from omchat_tpu.processing.processor import OmChatProcessor
from omchat_tpu.runtime.generate import OmChatEngine

N_TEXT, N_IMAGE, MAX_NEW = 24, 8, 128


def main():
    from PIL import Image

    from omchat_tpu.utils.testing import MockTokenizer

    rng = np.random.default_rng(0)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    bench._log("params built")

    tok = MockTokenizer()
    engine = OmChatEngine(cfg, params)
    ip = OmChatImageProcessor(
        crop_size=cfg.vision.image_size, shortest_edge=cfg.vision.image_size,
        image_grid_pinpoints=cfg.image_grid_pinpoints,
    )
    model = OmChatModel(tok, engine, ip, OmChatProcessor(tok, ip), cfg)

    img_path = "/tmp/bench_eval_img.png"
    Image.fromarray(rng.integers(0, 255, (360, 480, 3), dtype=np.uint8)).save(img_path)
    samples = [
        EvalSample(question_id=str(i), text=f"question number {i} about topic {i * 7}")
        for i in range(N_TEXT)
    ] + [
        EvalSample(question_id=str(N_TEXT + i), text="what does the image show?",
                   image_path=img_path)
        for i in range(N_IMAGE)
    ]
    # distinct pixels per image question (no feature-cache shortcut)
    paths = []
    for i in range(N_IMAGE):
        p = f"/tmp/bench_eval_img{i}.png"
        Image.fromarray(rng.integers(0, 255, (360, 480, 3), dtype=np.uint8)).save(p)
        samples[N_TEXT + i].image_path = p
        paths.append(p)

    # ONE shared engine for warmup + measurement: a second pool can
    # transiently coexist with the first (server-side reclaim lag) and OOM
    # the 95%-full 13B chip.  max_len=4096 (not the 8192 default): the
    # default 520-page pool (~3.8 GB) never fit beside the 13.6 GB weights.
    from omchat_tpu.runtime.paged_engine import PagedBatchEngine

    # 200 pages (not slots*(max_len/ps)+8=264): the 13.6 GB weights leave
    # <2 GB for the pool on a 16 GB chip; page-admission throttles the rare
    # all-slots-at-max-length case instead of OOMing at construction
    pengine = PagedBatchEngine(
        cfg, params, max_slots=8, num_pages=200,
        page_size=128, max_len=4096, decode_roll=8, prefill_chunk=4096,
    )
    # warmup both paths (compiles)
    run_eval(model, samples[:2] + samples[-1:], "/tmp/eval_warm.jsonl",
             max_new_tokens=4, progress=False)
    run_eval_concurrent(model, samples[:4] + samples[-2:], "/tmp/eval_warm2.jsonl",
                        max_new_tokens=4, progress=False, concurrency=8,
                        max_len=4096, engine=pengine)
    bench._log("warmup done")

    t0 = time.perf_counter()
    run_eval(model, samples, "/tmp/eval_serial.jsonl", max_new_tokens=MAX_NEW, progress=False)
    serial_s = time.perf_counter() - t0
    bench._log(f"serial: {serial_s:.2f}s")

    t0 = time.perf_counter()
    run_eval_concurrent(model, samples, "/tmp/eval_conc.jsonl",
                        max_new_tokens=MAX_NEW, progress=False, concurrency=8,
                        max_len=4096, engine=pengine)
    conc_s = time.perf_counter() - t0
    bench._log(f"concurrent: {conc_s:.2f}s")

    n = len(samples)
    print(json.dumps({
        "metric": "eval_questions_per_min_concurrent",
        "value": round(n / conc_s * 60, 1),
        "unit": "questions/min",
        "extra": {
            "questions": n,
            "image_questions": N_IMAGE,
            "max_new_tokens": MAX_NEW,
            "serial_questions_per_min": round(n / serial_s * 60, 1),
            "speedup": round(serial_s / conc_s, 2),
            "serial_wall_s": round(serial_s, 2),
            "concurrent_wall_s": round(conc_s, 2),
            "concurrency": 8,
        },
    }), flush=True)


if __name__ == "__main__":
    main()
