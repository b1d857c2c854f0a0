"""Anatomy of a serving tick — where the 458-vs-690 tok/s gap lives (VERDICT r4 #3).

Round 4's exp_decode_anatomy decomposed one decode *step*; this applies the
same method one level up, to the steady-state serving *window* of the
standard mixed workload (dev/bench_serving.py: 16 requests, 64 new tokens
each, a 2-tile anyres image on every 4th).  Two passes over the identical
workload:

1. **clean** — the production engine untouched: the honest wall / tok/s.
2. **instrumented** — every dispatch site is wrapped with a device sync so
   its wall time is attributable: ViT encode, batched-shorts prefill,
   per-request chunk prefill, grouped chunk prefill, decode-roll dispatch
   (with the decoding occupancy at dispatch), roll readback+bookkeeping,
   and first-token finishes.  The residual (instrumented wall − components)
   is host scheduling.  Per-dispatch syncs serialize the device queue, so
   the instrumented wall is an upper bound — the *shares* are the result.

The decomposition names the binding resource: tokens generated / device-work
seconds is the zero-host-overhead ceiling of this workload shape on this
chip; the decode rows give ms/step × occupancy vs the pure-decode 690.

    python dev/exp_tick_anatomy.py
    python dev/exp_tick_anatomy.py --pipeline-rolls --decode-roll 16
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "dev")

import bench
from bench_serving import MAX_NEW, build_workload


def _timed(prof, key, fn, sync=None):
    """Wrap ``fn`` so each call's wall (through an optional device sync on
    its result) accumulates under ``prof[key]``."""

    def wrapped(*a, **kw):
        t = time.perf_counter()
        out = fn(*a, **kw)
        if sync is not None:
            sync(out)
        prof[key][0] += time.perf_counter() - t
        prof[key][1] += 1
        return out

    return wrapped


def run_window(engine, reqs, images, max_new):
    ids = [
        engine.submit(list(r), img, max_new_tokens=max_new, eos_token_id=-1)
        for r, img in zip(reqs, images)
    ]
    engine.run_to_completion()
    n = 0
    for rid in ids:
        out, _ = engine.pop_result(rid)
        n += len(out)
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--decode-roll", type=int, default=16)
    ap.add_argument("--prefill-chunk", type=int, default=4096)
    ap.add_argument("--pipeline-rolls", action="store_true")
    ap.add_argument("--max-slots", type=int, default=16)
    args = ap.parse_args()

    from omchat_tpu.config import OmChatConfig
    from omchat_tpu.runtime.paged_engine import PagedBatchEngine

    rng = np.random.default_rng(0)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    bench._log("params built")

    engine = PagedBatchEngine(
        cfg, params, max_slots=args.max_slots, num_pages=192, page_size=128,
        prompt_bucket=128, max_len=4096, decode_roll=args.decode_roll,
        prefill_chunk=args.prefill_chunk, pipeline_rolls=args.pipeline_rolls,
    )
    wl_rng = np.random.default_rng(1)
    reqs, images, _ = build_workload(wl_rng)

    # warmup compiles every program the measurement hits
    run_window(engine, reqs, images, 4)
    engine.reset_latency_stats()
    bench._log("warmup done")

    # ---- pass 1: clean (production) wall ----
    t0 = time.perf_counter()
    n_tok = run_window(engine, reqs, images, MAX_NEW)
    clean_wall = time.perf_counter() - t0
    clean_tps = n_tok / clean_wall
    bench._log(f"clean: {clean_tps:.1f} tok/s over {clean_wall:.2f} s")

    # ---- pass 2: instrumented (per-dispatch syncs) ----
    prof = {k: [0.0, 0] for k in (
        "vit_encode", "shorts_prefill", "chunk_prefill", "chunk_group",
        "roll_dispatch", "roll_process", "first_token",
        # sub-components (counted INSIDE the rows above, not additive):
        "sub_prefill_core", "sub_page_commit", "sub_chunk_core",
    )}
    rolls = []  # (occupancy, roll_width)

    def sync_pool(_out):
        jax.block_until_ready(engine.k_pool)

    # fine-grained: the contiguous prefill dispatch vs the page commit vs the
    # paged chunk program (each synced, so the parents attribute cleanly)
    import omchat_tpu.runtime.paged_engine as pe

    engine._prefiller.prefill = _timed(
        prof, "sub_prefill_core", engine._prefiller.prefill,
        lambda out: jax.block_until_ready(out[1].k))
    orig_commit = pe._commit_pages_jit
    pe._commit_pages_jit = _timed(
        prof, "sub_page_commit", orig_commit,
        lambda out: jax.block_until_ready(out[0]))
    orig_chunk = pe._paged_prefill_chunk_jit
    pe._paged_prefill_chunk_jit = _timed(
        prof, "sub_chunk_core", orig_chunk,
        lambda out: jax.block_until_ready(out[0]))

    engine._encode_pending = _timed(prof, "vit_encode", engine._encode_pending, sync_pool)
    engine._prefill_shorts = _timed(prof, "shorts_prefill", engine._prefill_shorts, sync_pool)
    engine._prefill_tick = _timed(prof, "chunk_prefill", engine._prefill_tick, sync_pool)
    engine._prefill_chunk_group = _timed(prof, "chunk_group", engine._prefill_chunk_group, sync_pool)
    engine._process_roll = _timed(prof, "roll_process", engine._process_roll)
    engine._finish_with_token = _timed(prof, "first_token", engine._finish_with_token)
    engine._finish_prefill = _timed(prof, "first_token", engine._finish_prefill)

    orig_dispatch = engine._dispatch_roll

    def timed_dispatch(decoding, roll, *a, **kw):
        t = time.perf_counter()
        h = orig_dispatch(decoding, roll, *a, **kw)
        jax.block_until_ready(h["toks_dev"])
        prof["roll_dispatch"][0] += time.perf_counter() - t
        prof["roll_dispatch"][1] += 1
        rolls.append((len(decoding), roll))
        return h

    engine._dispatch_roll = timed_dispatch

    t0 = time.perf_counter()
    n_tok2 = run_window(engine, reqs, images, MAX_NEW)
    inst_wall = time.perf_counter() - t0
    assert n_tok2 == n_tok

    comp_sum = sum(v[0] for v in prof.values())
    host_resid = inst_wall - comp_sum
    steps = sum(o * r for o, r in rolls)
    occ = steps / max(sum(r for _, r in rolls), 1)
    roll_s = prof["roll_dispatch"][0]
    device_work = sum(prof[k][0] for k in (
        "vit_encode", "shorts_prefill", "chunk_prefill", "chunk_group", "roll_dispatch"))

    report = {
        "workload": {"requests": len(reqs), "new_tokens": n_tok,
                     "config": f"roll={args.decode_roll} chunk={args.prefill_chunk} "
                               f"slots={args.max_slots} pipeline={args.pipeline_rolls}"},
        "clean": {"wall_s": round(clean_wall, 3), "tok_s": round(clean_tps, 1)},
        "instrumented": {
            "wall_s": round(inst_wall, 3),
            "components_s": {k: [round(v[0], 3), v[1]] for k, v in prof.items()},
            "host_residual_s": round(host_resid, 3),
        },
        "decode": {
            "rolls": len(rolls),
            "steps_weighted": steps,
            "mean_decoding_occupancy": round(occ, 2),
            "ms_per_roll_step": round(roll_s / max(sum(r for _, r in rolls), 1) * 1e3, 2),
            "decode_only_tok_s": round(steps / roll_s, 1) if roll_s else None,
        },
        "ceiling_tok_s_device_work_only": round(n_tok / device_work, 1),
    }
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
