"""Multimodal projector variants — functional JAX.

Reference: /root/reference/omchat/model/multimodal_projector/builder.py:39-66
(types: linear, mlpNx_gelu, cabstract, identity) and the HF bundle's
Linear→GELU→Linear (hf/modeling_omchat.py:523-535), which is the flagship
checkpoint's projector (``linear_1``/``linear_2`` naming kept for loader parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omchat_tpu.config import ProjectorConfig
from omchat_tpu.ops.linear import dense


def projector_forward(params: dict, cfg: ProjectorConfig, features: jax.Array) -> jax.Array:
    """[..., mm_hidden] → [..., hidden] (cabstract also compresses tokens)."""
    t = cfg.projector_type
    if t == "identity":
        return features
    if t == "linear":
        return dense(features, params["linear_1"])
    if t == "cabstract":
        from omchat_tpu.models.cabstractor import cabstractor_forward

        return cabstractor_forward(params, cfg, features)
    # mlpNx_gelu
    x = dense(features, params["linear_1"])
    for i in range(2, cfg.mlp_depth + 1):
        x = jax.nn.gelu(x, approximate=False)
        x = dense(x, params[f"linear_{i}"])
    return x


def init_params(key: jax.Array, cfg: ProjectorConfig, mm_hidden: int, hidden: int, dtype=jnp.float32) -> dict:
    if cfg.projector_type == "identity":
        return {}
    if cfg.projector_type == "cabstract":
        from omchat_tpu.models.cabstractor import init_params as cab_init

        return cab_init(key, cfg, mm_hidden, hidden, dtype)
    keys = jax.random.split(key, max(cfg.mlp_depth, 1))

    def lin(k, i, o):
        return {
            "kernel": (jax.random.normal(k, (i, o), jnp.float32) * 0.02).astype(dtype),
            "bias": jnp.zeros((o,), dtype),
        }

    params = {"linear_1": lin(keys[0], mm_hidden, hidden)}
    if cfg.projector_type == "linear":
        return params
    for i in range(2, cfg.mlp_depth + 1):
        params[f"linear_{i}"] = lin(keys[i - 1], hidden, hidden)
    return params
