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


def _mlp(params: dict, x: jax.Array, mlp_depth: int) -> jax.Array:
    x = dense(x, params["linear_1"])
    for i in range(2, mlp_depth + 1):
        x = jax.nn.gelu(x, approximate=False)
        x = dense(x, params[f"linear_{i}"])
    return x


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
    if cfg.mlp_smoe:
        # MoE-LLaVA sparse projector: the legacy path's mlp_smoe /
        # num_experts / num_selected knobs (omchat_llama.py:58-63) — router
        # + top-k weighted sum over an expert bank of mlpNx_gelu projectors
        # (params stacked [E, ...] under "experts").
        from omchat_tpu.models.smoe import expert_bank, smoe_route

        combine, _ = smoe_route(params["router"], features, cfg.num_selected)
        return expert_bank(
            params["experts"], features, combine,
            lambda p, x: _mlp(p, x, cfg.mlp_depth),
        )
    # mlpNx_gelu
    return _mlp(params, features, cfg.mlp_depth)


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
    if cfg.mlp_smoe:
        from omchat_tpu.models.smoe import init_router, replicate_expert_params

        rkey, *ekeys = jax.random.split(key, cfg.num_experts + 1)
        experts = jax.tree.map(
            lambda *leaves: jnp.stack(leaves),
            *[
                {
                    name: lin(jax.random.fold_in(ekeys[e], j), p["kernel"].shape[0], p["kernel"].shape[1])
                    for j, (name, p) in enumerate(params.items())
                }
                for e in range(cfg.num_experts)
            ],
        )
        return {"router": init_router(rkey, mm_hidden, cfg.num_experts, dtype), "experts": experts}
    return params
