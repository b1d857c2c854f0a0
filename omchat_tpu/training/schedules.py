"""LR schedules — the reference's cosine scheduler with linear warmup
(multimodal_encoder/utils.py:419-441, dead) on optax."""

from __future__ import annotations

import optax


def warmup_cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    min_lr: float = 0.0,
    warmup_init_lr: float = 1e-6,
) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        init_value=warmup_init_lr if warmup_steps else base_lr,
        peak_value=base_lr,
        warmup_steps=warmup_steps,
        decay_steps=total_steps,
        end_value=min_lr,
    )
