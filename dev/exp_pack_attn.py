"""Packed-SFT grad-path attention: XLA masked vs the varlen Pallas VJP kernel.

The varlen (segment_ids) flash kernel used to be forward-only, so packed
training fell back to XLA masked attention for fwd+bwd.  The custom-VJP
kernels now take segment tiles + block windows (cross-document tiles are
skipped in all three kernels); this measures the full train_step at packed
widths where attention matters.

XLA masked attention materializes [B, H, S, S] scores — quadratic in the
pack width — while the flash kernels' working set is block-sized and the
segment windows cut the tile count to ~sum(doc_i^2)/2 instead of S^2/2.

    python dev/exp_pack_attn.py [SEQ ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "cli")

import jax
import jax.numpy as jnp
import optax

import bench
from bench_packing import small_cfg, synth_samples
from omchat_tpu.training.train_step import init_train_state, train_step
from train import pack_rows

STEPS = 6


def packed_batches(rng, seq, batch, n_batches):
    samples = synth_samples(rng, 6000)
    out, rows, row, row_len = [], [], [], 0
    for ids, tlen in samples:
        if len(ids) > seq:  # oversized sample can't fit any row of width seq
            continue
        if row_len + len(ids) > seq:
            rows.append(row)
            row, row_len = [], 0
            if len(rows) == batch:
                out.append(pack_rows(rows, seq))
                rows = []
                if len(out) == n_batches:
                    return out
        row.append((ids, tlen))
        row_len += len(ids)
    raise AssertionError(
        f"sample stream exhausted: built {len(out)}/{n_batches} batches (seq={seq}, B={batch})"
    )


def main():
    seqs = [int(a) for a in sys.argv[1:]] or [2048, 8192]
    cfg = small_cfg()
    from omchat_tpu.models import intern_vit, projector as projector_model, qwen2 as qwen2_model

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "vision_tower": intern_vit.init_params(k1, cfg.vision),
        "projector": projector_model.init_params(
            k2, cfg.projector, cfg.vision.hidden_size, cfg.text.hidden_size
        ),
        "language_model": qwen2_model.init_params(k3, cfg.text, dtype=jnp.bfloat16),
    }
    opt = optax.sgd(1e-4)

    for seq in seqs:
        batch = max(1, 16384 // seq)  # constant token budget per step
        rng = np.random.default_rng(0)
        batches = packed_batches(rng, seq, batch, STEPS + 1)
        for impl in ("xla", "pallas_vjp"):
            state = init_train_state(params, opt)
            step = jax.jit(
                lambda s, c, b: train_step(s, c, b, opt, attn_impl=impl),
                static_argnames=("c",),
            )
            s, loss = step(state, cfg, batches[0])
            bench._sync(loss)
            t0 = time.perf_counter()
            toks = 0
            for bt in batches[1:]:
                s, loss = step(s, cfg, bt)
                toks += int((np.asarray(bt["segment_ids"]) >= 0).sum())
            bench._sync(loss)
            dt = time.perf_counter() - t0
            bench._log(
                f"seq={seq} B={batch} {impl}: {dt/len(batches[1:])*1e3:.1f} ms/step, "
                f"{toks/dt:.0f} packed-tokens/s, loss={float(loss):.4f}"
            )


if __name__ == "__main__":
    main()
