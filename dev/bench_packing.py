"""Packed vs unpacked SFT throughput on one chip.

Short-conversation SFT (real datasets average a few hundred tokens) wastes
most of an unpacked step on padding: each sample pads to its 128-bucket and
the batch pads to the longest member.  Packing concatenates samples into
fixed [B, L] rows with segment-isolated attention, so the step does work
proportional to fill rate.  This measures real train_step wall time for the
same SAMPLE stream both ways and reports effective loss-tokens/s.

Geometry: ~0.5B text-only decoder (bf16 + SGD so params+grads fit easily);
the ratio transfers to bigger models since both paths run the same kernels.

    python dev/bench_packing.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "cli")

import jax
import jax.numpy as jnp
import optax

import bench
from omchat_tpu.config import OmChatConfig, TextConfig, VisionConfig
from omchat_tpu.constants import IGNORE_INDEX
from omchat_tpu.training.train_step import init_train_state, train_step
from train import pack_rows

SEQ = 2048
BATCH = 8
STEPS = 8


def small_cfg():
    return OmChatConfig(
        vision=VisionConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=1,
                            num_attention_heads=4, image_size=56, patch_size=14),
        text=TextConfig(vocab_size=32000, hidden_size=1280, intermediate_size=5120,
                        num_hidden_layers=20, num_attention_heads=10, num_key_value_heads=2,
                        max_position_embeddings=4096),
    )


def synth_samples(rng, n):
    """Short-SFT length profile: 60-300 token conversations, ~25% target."""
    out = []
    for _ in range(n):
        ln = int(rng.integers(60, 300))
        ids = rng.integers(5, 30000, ln).tolist()
        out.append((ids, max(8, ln // 4)))
    return out


def unpacked_batch(samples):
    """The jsonl_batches shape contract: per-sample 128-bucketed, batch pads
    to the longest member (plan_multimodal_merge(bucket=128))."""
    width = max(-(-len(ids) // 128) * 128 for ids, _ in samples)
    b = len(samples)
    tok = np.zeros((b, width), np.int32)
    pos = np.zeros((b, width), np.int32)
    lab = np.full((b, width), IGNORE_INDEX, np.int32)
    for i, (ids, tlen) in enumerate(samples):
        n = len(ids)
        tok[i, :n] = ids
        pos[i, :n] = np.arange(n)
        lab[i, n - tlen : n] = ids[n - tlen :]
    return {
        "token_ids": jnp.asarray(tok),
        "is_image": jnp.zeros((b, width), bool),
        "image_index": jnp.zeros((b, width), np.int32),
        "positions": jnp.asarray(pos),
        "labels": jnp.asarray(lab),
    }


def main():
    rng = np.random.default_rng(0)
    cfg = small_cfg()
    from omchat_tpu.models import intern_vit, projector as projector_model, qwen2 as qwen2_model

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "vision_tower": intern_vit.init_params(k1, cfg.vision),
        "projector": projector_model.init_params(k2, cfg.projector, cfg.vision.hidden_size, cfg.text.hidden_size),
        "language_model": qwen2_model.init_params(k3, cfg.text),
    }
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    opt = optax.sgd(1e-4)
    state = init_train_state(params, opt)
    step = jax.jit(
        lambda s, c, b: train_step(s, c, b, opt), static_argnames=("c",)
    )
    bench._log(f"{n_params/1e9:.2f}B params")

    samples = synth_samples(rng, 4000)

    def timed(batches, label):
        s = state
        s, _ = step(s, cfg, batches[0])  # compile
        bench._sync(jax.tree.leaves(s.params)[0])
        t0 = time.perf_counter()
        loss_tokens = 0
        for bt in batches[1 : STEPS + 1]:
            s, loss = step(s, cfg, bt)
            loss_tokens += int(np.asarray(bt["labels"] != IGNORE_INDEX).sum())
        bench._sync(loss)
        dt = time.perf_counter() - t0
        bench._log(f"{label}: {loss_tokens/dt:.0f} loss-tokens/s over {STEPS} steps ({dt:.2f}s)")
        return loss_tokens / dt, dt

    # packed: greedy first-fit rows of SEQ
    it = iter(samples)
    packed_batches, rows, row, row_len = [], [], [], 0
    for ids, tlen in samples:
        if row_len + len(ids) > SEQ:
            rows.append(row)
            row, row_len = [], 0
            if len(rows) == BATCH:
                packed_batches.append(pack_rows(rows, SEQ))
                rows = []
        row.append((ids, tlen))
        row_len += len(ids)
    fill = float(np.mean([(np.asarray(b["segment_ids"]) >= 0).mean() for b in packed_batches]))

    # unpacked: same stream, BATCH*? samples per step — equal SAMPLES per step
    # as one packed batch carries, so both paths train the same data per step
    per_packed = int(np.mean([
        sum((np.asarray(b["segment_ids"])[i].max() + 1) for i in range(BATCH))
        for b in packed_batches[:4]
    ]))
    unpacked_batches = [
        unpacked_batch(samples[i : i + BATCH]) for i in range(0, len(samples) - BATCH, BATCH)
    ]
    bench._log(f"packed fill {fill:.2f}, ~{per_packed} samples per packed step")

    tps_u, _ = timed(unpacked_batches, f"unpacked [{BATCH}x~256]")
    tps_p, _ = timed(packed_batches, f"packed [{BATCH}x{SEQ}]")

    print(json.dumps({
        "metric": "packed_train_loss_tokens_per_sec",
        "value": round(tps_p, 1),
        "unit": "loss-tokens/s",
        "extra": {
            "unpacked_loss_tokens_per_sec": round(tps_u, 1),
            "speedup": round(tps_p / tps_u, 2),
            "pack_fill_rate": round(fill, 3),
            "seq_len": SEQ,
            "batch": BATCH,
            "params_b": round(n_params / 1e9, 2),
            "note": "same sample stream; unpacked = per-sample 128-bucket + batch-max width (jsonl_batches contract)",
        },
    }), flush=True)


if __name__ == "__main__":
    main()
