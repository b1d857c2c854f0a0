"""Token sampling ops (greedy / temperature / top-k / top-p).

The reference's live entry points decode greedily (single_inference.py:52-62,
``do_sample=False``); the sampled paths cover HF ``generate``'s common knobs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from omchat_tpu.config import GenerationConfig


def greedy(logits: jax.Array) -> jax.Array:
    """[B, V] → [B] argmax token ids."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep the smallest prefix with cumulative prob >= p (always keep top-1)
    keep = cum - probs < p
    threshold = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < threshold, -jnp.inf, logits)


def sample(
    logits: jax.Array,
    key: jax.Array,
    cfg: GenerationConfig,
) -> jax.Array:
    """[B, V] → [B] next tokens per the generation config."""
    if not cfg.do_sample:
        return greedy(logits)
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    logits = apply_top_k(logits, cfg.top_k)
    logits = apply_top_p(logits, cfg.top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def sample_batch(
    logits: jax.Array,
    key: jax.Array,
    do_sample: jax.Array,
    temperature: jax.Array,
    top_k: jax.Array,
    top_p: jax.Array,
) -> jax.Array:
    """Per-row mixed greedy/sampled decoding for continuous batching.

    Every slot of a serving batch can carry its own request's generation
    params: do_sample [B] bool, temperature/top_p [B] fp32, top_k [B] int32
    (<=0 disables).  One descending sort serves both top-k (k-th value as the
    threshold) and top-p (smallest prefix with cumulative prob >= p); greedy
    rows take the plain argmax.
    """
    b, v = logits.shape
    g = greedy(logits)
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]

    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    # top-k threshold: value at rank k-1 (k<=0 -> keep everything)
    k_idx = jnp.clip(top_k - 1, 0, v - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    kth = jnp.where(top_k[:, None] > 0, kth, -jnp.inf)
    # top-p threshold on the same sort
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum - probs < top_p[:, None]  # always keeps rank 0
    pth = jnp.min(jnp.where(keep, sorted_desc, jnp.inf), axis=-1, keepdims=True)

    masked = jnp.where(scaled < jnp.maximum(kth, pth), -jnp.inf, scaled)
    keys = jax.random.split(key, b)
    sampled = jax.vmap(lambda k, l: jax.random.categorical(k, l))(keys, masked).astype(jnp.int32)
    return jnp.where(do_sample, sampled, g)
