"""Sparse mixture-of-expert MLP banks — the MoE-LLaVA-style projector/CLIP
expert options of the reference's legacy v1 path.

Reference surface: ``num_experts`` / ``num_selected`` / ``mlp_smoe`` /
``clip_smoe`` config plumbing in
/root/reference/omchat/model/language_model/omchat_llama.py:58-63 (knobs),
:79-82 (``mm_projector.experts[i]`` — the pretrain adapter replicates into
every expert) and :104-111 (CLIP tower ``...experts....mlp...`` state-dict
keys).  The expert modules themselves are NOT importable upstream (the smoe
builders were never released), so this is a from-scratch TPU-native
implementation of the MoE-LLaVA semantics those knobs configure: a linear
router per token, softmax over ``num_experts``, top-``num_selected``
selection with renormalized weights, and a weighted sum of the selected
experts' MLP outputs.

TPU-first design: expert parameters are STACKED ([E, in, out]) and every
expert runs on every token with the routing weights applied as a dense mask
— the dense-masked strategy the repo measured faster than grouped matmuls at
small expert counts (BENCH.md "MoE grouped matmul"; skinny per-expert
matmuls cannot fill the MXU).  E is small here (MoE-LLaVA uses 4), so the
E× FLOP multiplier is cheap next to sort/scatter dispatch.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from omchat_tpu.ops.linear import dense


def smoe_route(router: dict, x: jax.Array, num_selected: int) -> Tuple[jax.Array, jax.Array]:
    """Per-token routing weights.

    Returns ``(combine, probs)`` where ``combine`` is [..., E] with the
    top-``num_selected`` softmax probabilities renormalized to sum to 1 and
    zeros elsewhere (MoE-LLaVA's soft routing over the selected experts),
    and ``probs`` is the full softmax (for the load-balancing loss).
    Routing runs in fp32 — near-tie expert logits are argsort-sensitive.
    """
    logits = dense(x.astype(jnp.float32), jax.tree.map(lambda a: a.astype(jnp.float32), router))
    probs = jax.nn.softmax(logits, axis=-1)
    e = probs.shape[-1]
    top_v, top_i = jax.lax.top_k(probs, num_selected)
    combine = jnp.sum(
        jax.nn.one_hot(top_i, e, dtype=probs.dtype) * top_v[..., None], axis=-2
    )
    combine = combine / jnp.maximum(
        jnp.sum(combine, axis=-1, keepdims=True), jnp.finfo(probs.dtype).tiny
    )
    return combine, probs


def expert_bank(
    params: dict,
    x: jax.Array,
    combine: jax.Array,
    mlp: Callable[[dict, jax.Array], jax.Array],
) -> jax.Array:
    """Dense-masked expert evaluation: run ``mlp`` for every expert on every
    token (params stacked over the leading E axis) and combine with the
    routing weights.  [..., D_in] → [..., D_out]."""
    outs = jax.vmap(mlp, in_axes=(0, None), out_axes=-2)(params, x)  # [..., E, D_out]
    return jnp.sum(outs * combine[..., None].astype(outs.dtype), axis=-2)


def load_balancing_loss(probs: jax.Array, combine: jax.Array) -> jax.Array:
    """Switch-style auxiliary loss: E · Σ_e f_e · P_e where f_e is the
    fraction of tokens routed to expert e and P_e the mean router
    probability.  Equals 1.0 under perfectly uniform routing — the training
    regularizer MoE-LLaVA applies to its projector/CLIP experts."""
    e = probs.shape[-1]
    flat_p = probs.reshape(-1, e)
    flat_c = (combine > 0).astype(jnp.float32).reshape(-1, e)
    f = jnp.mean(flat_c / jnp.maximum(jnp.sum(flat_c, -1, keepdims=True), 1.0), axis=0)
    p = jnp.mean(flat_p, axis=0)
    return e * jnp.sum(f * p)


def replicate_expert_params(params: dict, num_experts: int) -> dict:
    """Stack one dense module's params into an E-way expert bank with
    identical experts — the reference's pretrain-adapter load semantics
    (omchat_llama.py:79-82 loads the SAME ``mm_projector`` weights into
    ``experts[i]`` for every i)."""
    return jax.tree.map(lambda a: jnp.broadcast_to(a[None], (num_experts, *a.shape)), params)


def init_router(key: jax.Array, d_in: int, num_experts: int, dtype=jnp.float32) -> dict:
    return {
        "kernel": (jax.random.normal(key, (d_in, num_experts), jnp.float32) * 0.02).astype(dtype),
        "bias": jnp.zeros((num_experts,), dtype),
    }
