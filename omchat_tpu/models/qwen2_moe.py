"""Qwen2-MoE decoder — the reference's alternate LLM
(/root/reference/omchat/model/language_model/omchat_qwen2_moe.py wraps HF
``Qwen2MoeForCausalLM``; HF executes routing densely per device — SURVEY.md §2.3 EP).

Architecture per layer: Qwen2 GQA attention + sparse MoE block =
top-k softmax router over E experts (SwiGLU, ``moe_intermediate_size``) plus a
shared expert (SwiGLU, ``shared_expert_intermediate_size``) gated by a sigmoid.

TPU execution modes:
- ``moe_impl="dense"``: every expert runs on every token, masked by routing
  weight — exact, compile-friendly, right for few-expert configs and tests;
- ``moe_impl="gmm"``: tokens sorted by expert, grouped matmul via the Pallas
  megablox ``gmm`` kernel.  Measured on v5e at the Qwen2-MoE-A14B geometry
  (E=60, K=4) it *loses* to the dense-masked path at every prefill size
  swept — 0.5×/0.75×/0.91× at T=1024/4096/16384 (dev/exp_moe_gmm.py,
  BENCH.md): with K/E = 1/15 of rows routed per expert, the per-group
  matmuls are too skinny for the MXU until T is huge.  Dense-masked is the
  measured production default on TPU; gmm stays for expert-parallel meshes
  (expert axis sharded over ``model``), where each shard sees only its own
  experts and dense-masked would multiply FLOPs by the EP degree.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from omchat_tpu.config import TextConfig
from omchat_tpu.models.qwen2 import KVCache, cache_attend, decoder_layer
from omchat_tpu.ops.linear import dense
from omchat_tpu.ops.norms import rms_norm
from omchat_tpu.ops.rope import rope_cos_sin


def _router(x: jax.Array, gate_kernel: jax.Array, cfg: TextConfig) -> Tuple[jax.Array, jax.Array]:
    """x: [T, D] → (topk_weights [T, K], topk_idx [T, K]).  fp32 softmax over
    all experts, then top-k (HF Qwen2MoeSparseMoeBlock semantics)."""
    logits = (x.astype(jnp.float32) @ gate_kernel.astype(jnp.float32))  # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    topk_w, topk_idx = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topk_w = topk_w / jnp.sum(topk_w, axis=-1, keepdims=True)
    return topk_w, topk_idx


def _experts_dense(x: jax.Array, p: dict, topk_w: jax.Array, topk_idx: jax.Array, cfg: TextConfig) -> jax.Array:
    """All-experts einsum, masked by per-token routing weight.  x: [T, D]."""
    e = cfg.num_experts
    # combine weights: [T, E] — routing weight if selected else 0
    combine = jnp.zeros((x.shape[0], e), jnp.float32)
    combine = jax.vmap(lambda c, w, i: c.at[i].add(w))(combine, topk_w, topk_idx)
    combine = combine.astype(x.dtype)

    gate = jnp.einsum("td,edf->etf", x, p["gate_proj"])  # [E, T, F]
    up = jnp.einsum("td,edf->etf", x, p["up_proj"])
    h = jax.nn.silu(gate) * up
    out = jnp.einsum("etf,efd->etd", h, p["down_proj"])  # [E, T, D]
    return jnp.einsum("etd,te->td", out, combine)


def _experts_gmm(x: jax.Array, p: dict, topk_w: jax.Array, topk_idx: jax.Array, cfg: TextConfig) -> jax.Array:
    """Grouped-matmul path: sort token-replicas by expert, run megablox gmm."""
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    t, d = x.shape
    k = cfg.num_experts_per_tok
    e = cfg.num_experts

    flat_idx = topk_idx.reshape(-1)  # [T*K]
    order = jnp.argsort(flat_idx)
    sorted_expert = flat_idx[order]
    token_of = order // k  # source token per sorted replica
    xs = x[token_of]  # [T*K, D] gathered replicas in expert order
    group_sizes = jnp.bincount(sorted_expert, length=e).astype(jnp.int32)

    gate = gmm(xs, p["gate_proj"], group_sizes)
    up = gmm(xs, p["up_proj"], group_sizes)
    h = jax.nn.silu(gate) * up
    out = gmm(h, p["down_proj"], group_sizes)  # [T*K, D]

    w = topk_w.reshape(-1)[order].astype(out.dtype)  # [T*K]
    return jax.ops.segment_sum(out * w[:, None], token_of, num_segments=t)


def _moe_block(x: jax.Array, p: dict, cfg: TextConfig, moe_impl: str) -> jax.Array:
    """x: [B, S, D] → [B, S, D]."""
    b, s, d = x.shape
    xt = x.reshape(b * s, d)
    topk_w, topk_idx = _router(xt, p["gate"]["kernel"], cfg)
    experts = _experts_gmm if moe_impl == "gmm" else _experts_dense
    out = experts(xt, p["experts"], topk_w, topk_idx, cfg)

    shared = dense(jax.nn.silu(dense(xt, p["shared_expert"]["gate_proj"])) * dense(xt, p["shared_expert"]["up_proj"]), p["shared_expert"]["down_proj"])
    shared_gate = jax.nn.sigmoid(dense(xt, p["shared_expert_gate"]).astype(jnp.float32)).astype(x.dtype)
    out = out + shared * shared_gate
    return out.reshape(b, s, d)


def moe_mlp(cfg: TextConfig, moe_impl: str):
    """mlp_fn for :func:`omchat_tpu.models.qwen2.decoder_layer` (a8 is ignored:
    expert matmuls stay bf16 — routing scatters defeat static per-tensor
    activation scales; mlp-side LoRA likewise doesn't apply to expert
    layouts, so only attention-target adapters serve on MoE trunks)."""
    return lambda y, p, a8, lora=None, adapter_ids=None: _moe_block(y, p, cfg, moe_impl)


def _layer_forward(cfg, attn_impl, moe_impl, adapter_ids, carry, xs):
    x, cos, sin, write_pos, kv_len = carry
    layer, lora_layer, k_cache, v_cache = xs
    attend = functools.partial(cache_attend, cfg, attn_impl, write_pos, kv_len)
    x, (k_cache, v_cache) = decoder_layer(
        cfg, x, layer, cos, sin, attend, moe_mlp(cfg, moe_impl), (k_cache, v_cache),
        lora=lora_layer, adapter_ids=adapter_ids,
    )
    return (x, cos, sin, write_pos, kv_len), (k_cache, v_cache)


def qwen2_moe_forward(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    cache: Optional[KVCache] = None,
    write_pos: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,
    *,
    attn_impl: Optional[str] = None,
    moe_impl: str = "dense",
    remat: bool = False,
    lora_bank: Optional[dict] = None,
    adapter_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Same contract as :func:`omchat_tpu.models.qwen2.qwen2_forward`.

    Requires a homogeneous stack (``decoder_sparse_step=1`` and no
    ``mlp_only_layers``), which covers the released Qwen2-MoE checkpoints."""
    assert cfg.is_moe
    cos, sin = rope_cos_sin(
        positions,
        cfg.attn_head_dim,
        theta=cfg.rope_theta,
        scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings,
        dtype=inputs_embeds.dtype,
    )
    write_pos = jnp.int32(0) if write_pos is None else jnp.asarray(write_pos, jnp.int32)

    if lora_bank is not None and adapter_ids is not None:
        lora_xs = lora_bank["layers"]
        adapter_ids = jnp.asarray(adapter_ids, jnp.int32)
    else:
        lora_xs, adapter_ids = None, None
    body = functools.partial(_layer_forward, cfg, attn_impl, moe_impl, adapter_ids)
    if remat:
        body = jax.checkpoint(body)

    if cache is not None and inputs_embeds.shape[1] == 1:
        # Decode step: read-only cache + self-column + one post-scan row
        # commit — see qwen2.decode_scan for the measured rationale.
        from omchat_tpu.models.qwen2 import decode_scan

        x, new_cache = decode_scan(
            cfg, attn_impl, params, inputs_embeds, cos, sin, cache, kv_len,
            write_pos, moe_mlp(cfg, moe_impl), lora_xs, adapter_ids,
        )
    elif cache is not None:
        xs = (params["layers"], lora_xs, cache.k, cache.v)
        (x, *_), (new_k, new_v) = jax.lax.scan(body, (inputs_embeds, cos, sin, write_pos, kv_len), xs)
        new_cache = KVCache(k=new_k, v=new_v)
    else:
        def body_nocache(carry, layer_and_lora):
            layer, lora_layer = layer_and_lora
            c, _ = body(carry, (layer, lora_layer, None, None))
            return c, None

        (x, *_), _ = jax.lax.scan(
            body_nocache, (inputs_embeds, cos, sin, write_pos, kv_len), (params["layers"], lora_xs)
        )
        new_cache = None

    x = rms_norm(x, params["norm"]["scale"], cfg.rms_norm_eps)
    return x, new_cache


# ---------------------------------------------------------------------------
# Init / loader
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: TextConfig, dtype=jnp.float32) -> dict:
    from omchat_tpu.models.qwen2 import init_params as dense_init

    params = dense_init(key, cfg, dtype)
    l, d = cfg.num_hidden_layers, cfg.hidden_size
    e, fm, fs = cfg.num_experts, cfg.moe_intermediate_size, cfg.shared_expert_intermediate_size
    keys = jax.random.split(jax.random.fold_in(key, 1), 8)

    def nrm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    params["layers"]["mlp"] = {
        "gate": {"kernel": nrm(keys[0], (l, d, e))},
        "experts": {
            "gate_proj": nrm(keys[1], (l, e, d, fm)),
            "up_proj": nrm(keys[2], (l, e, d, fm)),
            "down_proj": nrm(keys[3], (l, e, fm, d)),
        },
        "shared_expert": {
            "gate_proj": {"kernel": nrm(keys[4], (l, d, fs))},
            "up_proj": {"kernel": nrm(keys[5], (l, d, fs))},
            "down_proj": {"kernel": nrm(keys[6], (l, fs, d))},
        },
        "shared_expert_gate": {"kernel": nrm(keys[7], (l, d, 1))},
    }
    return params


def convert_hf_moe_layers(state: dict, cfg: TextConfig, dtype=jnp.bfloat16) -> dict:
    """HF Qwen2Moe mlp weights → pytree (keys relative to ``model.``)."""
    import numpy as np

    from omchat_tpu.checkpoint.loader import _np

    l, e = cfg.num_hidden_layers, cfg.num_experts
    T = lambda a: a.T

    def stack(fmt, transform=None):
        arrs = [_np(state[fmt.format(i)]) for i in range(l)]
        if transform:
            arrs = [transform(a) for a in arrs]
        return jnp.asarray(np.stack(arrs), dtype)

    def stack_experts(proj):
        per_layer = []
        for i in range(l):
            per_layer.append(
                np.stack([_np(state[f"model.layers.{i}.mlp.experts.{j}.{proj}.weight"]).T for j in range(e)])
            )
        return jnp.asarray(np.stack(per_layer), dtype)  # [L, E, in, out]

    return {
        "gate": {"kernel": stack("model.layers.{}.mlp.gate.weight", T)},
        "experts": {
            "gate_proj": stack_experts("gate_proj"),
            "up_proj": stack_experts("up_proj"),
            "down_proj": stack_experts("down_proj"),
        },
        "shared_expert": {
            "gate_proj": {"kernel": stack("model.layers.{}.mlp.shared_expert.gate_proj.weight", T)},
            "up_proj": {"kernel": stack("model.layers.{}.mlp.shared_expert.up_proj.weight", T)},
            "down_proj": {"kernel": stack("model.layers.{}.mlp.shared_expert.down_proj.weight", T)},
        },
        "shared_expert_gate": {"kernel": stack("model.layers.{}.mlp.shared_expert_gate.weight", T)},
    }
