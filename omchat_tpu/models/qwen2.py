"""Qwen2 decoder — functional JAX with an HBM-resident KV cache.

Re-implements the HF Qwen2 architecture the reference drives through
``OmChatQwen2ForCausalLM`` (/root/reference/omchat/model/language_model/
omchat_qwen2.py): GQA attention with qkv bias / o-proj without bias, RoPE
(incl. the reference's linear / dynamic-NTK long-context scaling,
modeling_llama.py:156-198), RMSNorm, SwiGLU MLP, optional tied lm_head.

TPU-first design decisions:
- layers stacked on a leading axis, executed with ``lax.scan`` — one compiled
  layer body; the KV cache rides the scan as per-layer xs/ys so XLA can alias
  the buffers in place,
- a single forward covers prefill (S tokens at write offset) and decode
  (S=1), replacing HF's legacy per-step tuple-cache concat
  (SURVEY.md §6 "KV cache: legacy tuple cache, per-step concat"),
- static max-length head-major cache: [L, B, KVH, S_max, Dh].
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from omchat_tpu.config import TextConfig
from omchat_tpu.ops.attention import attention
from omchat_tpu.ops.linear import dense, dense_prequant
from omchat_tpu.ops.norms import rms_norm, rmsnorm_quant
from omchat_tpu.ops.rope import apply_rope, rope_cos_sin


class KVCache(NamedTuple):
    """Per-layer stacked, head-major KV cache. k/v: [L, B, KVH, S_max, Dh].

    Head-major layout keeps each (batch, kv-head) sequence contiguous in HBM —
    the unit the flash-decode kernel streams — and makes the KVH axis the
    natural tensor-parallel shard dimension."""

    k: jax.Array
    v: jax.Array

    @property
    def max_len(self) -> int:
        return self.k.shape[3]


def init_kv_cache(cfg: TextConfig, batch: int, max_len: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads, max_len, cfg.attn_head_dim)
    return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))


def lora_delta(y: jax.Array, ab: dict, ids: jax.Array) -> jax.Array:
    """Per-row low-rank delta for multi-LoRA serving: each batch row applies
    ITS adapter from a stacked bank (training/lora.py ``build_lora_bank``;
    bank row 0 is all-zero = the base model, so id 0 needs no special case).

    y: [B, S, in]; ab: {"a": [N, in, r], "b": [N, r, out]} (scale pre-folded
    into b); ids: [B] int32 bank indices.  Gather-per-row beats an
    all-adapters einsum when B > N and costs 2*B*S*r*(in+out) FLOPs — ~r/out
    of the base matmul, noise at serving ranks."""
    a = jnp.take(ab["a"], ids, axis=0).astype(y.dtype)  # [B, in, r]
    b = jnp.take(ab["b"], ids, axis=0).astype(y.dtype)  # [B, r, out]
    return jnp.einsum("bsr,bro->bso", jnp.einsum("bsi,bir->bsr", y, a), b)


def _maybe_lora(out: jax.Array, y: jax.Array, lora: Optional[dict], name: str, ids) -> jax.Array:
    if lora is not None and name in lora:
        return out + lora_delta(y, lora[name], ids)
    return out


def _mlp(y: jax.Array, p: dict, a8: bool = False, lora=None, adapter_ids=None) -> jax.Array:
    """SwiGLU: down(silu(gate(y)) * up(y)); per-row LoRA deltas when serving
    a multi-adapter bank."""
    g = _maybe_lora(dense(y, p["gate_proj"], a8=a8), y, lora, "gate_proj", adapter_ids)
    u = _maybe_lora(dense(y, p["up_proj"], a8=a8), y, lora, "up_proj", adapter_ids)
    h = jax.nn.silu(g) * u
    return _maybe_lora(dense(h, p["down_proj"], a8=a8), h, lora, "down_proj", adapter_ids)


def attention_inputs(
    cfg: TextConfig, y: jax.Array, p: dict, cos: jax.Array, sin: jax.Array, a8: bool,
    lora=None, adapter_ids=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """q/k/v projections + RoPE.  y: [B, S, D] (already normed).

    Returns q [B, S, H, hd] and k, v [B, S, KVH, hd]."""
    b, s, _ = y.shape
    h, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.attn_head_dim
    q = _maybe_lora(dense(y, p["q_proj"], a8=a8), y, lora, "q_proj", adapter_ids).reshape(b, s, h, hd)
    k = _maybe_lora(dense(y, p["k_proj"], a8=a8), y, lora, "k_proj", adapter_ids).reshape(b, s, kvh, hd)
    v = _maybe_lora(dense(y, p["v_proj"], a8=a8), y, lora, "v_proj", adapter_ids).reshape(b, s, kvh, hd)
    q, k = apply_rope(q, k, cos, sin)
    return q, k, v


def decoder_layer(cfg, x, layer, cos, sin, attend, mlp_fn, cache_state, *,
                  quant_glue=False, lora=None, adapter_ids=None):
    """One decoder layer with pluggable KV handling — the single layer body
    shared by the dense and MoE trunks and by every serving engine (the
    contiguous-slot cache, the paged pool, and the cache-free training path all
    differ only in ``attend``).

    attend(q, k, v, cache_state) -> (ctx [B, S, H, hd], new_cache_state) owns
    writing this call's K/V into its cache layout and running attention
    against it.  mlp_fn(y, mlp_params, a8) is the dense SwiGLU or MoE block.

    ``quant_glue=True`` (single-device Pallas serving; resolved from attn_impl
    by callers — the opaque kernels don't shard under GSPMD) routes the w8a8
    prefill through fused quantization-glue kernels: norm+quantize writes only
    int8 codes, the o_proj matmul rides the residual/norm/quantize pass, and
    — when ``mlp.swiglu_out_scale`` is calibrated — the SwiGLU intermediate
    is re-quantized in the matmul epilogue so the wide bf16 tensor never
    round-trips HBM (same design as the ViT glue scan, intern_vit.py).
    """
    b, s, _ = x.shape
    # w8a8 serves the compute-bound prefill; the single-token decode step is
    # HBM-bound and keeps the weight-only int8 path (quantizing one row of
    # activations would add passes without MXU benefit).
    a8 = cfg.w8a8 and s > 1
    glue = (
        quant_glue
        and a8
        and lora is None
        and getattr(mlp_fn, "prequant", None) is not None
        and "kernel_q" in layer["self_attn"]["q_proj"]
        and "kernel_q" in layer["self_attn"]["o_proj"]
    )
    if glue:
        return _decoder_layer_glue(cfg, x, layer, cos, sin, attend, mlp_fn, cache_state)
    attn_lora = lora.get("self_attn") if lora is not None else None
    mlp_lora = lora.get("mlp") if lora is not None else None
    y = rms_norm(x, layer["input_layernorm"]["scale"], cfg.rms_norm_eps)
    q, k, v = attention_inputs(cfg, y, layer["self_attn"], cos, sin, a8,
                               lora=attn_lora, adapter_ids=adapter_ids)
    ctx, cache_state = attend(q, k, v, cache_state)
    o = ctx.reshape(b, s, -1)
    x = x + _maybe_lora(dense(o, layer["self_attn"]["o_proj"], a8=a8),
                        o, attn_lora, "o_proj", adapter_ids)
    y = rms_norm(x, layer["post_attention_layernorm"]["scale"], cfg.rms_norm_eps)
    x = x + mlp_fn(y, layer["mlp"], a8, lora=mlp_lora, adapter_ids=adapter_ids)
    return x, cache_state


def _decoder_layer_glue(cfg, x, layer, cos, sin, attend, mlp_fn, cache_state):
    """w8a8 prefill fast path: quantization glue runs as fused Pallas passes.

    Matches the unfused w8a8 layer up to ±1 int8 code per quantization point
    (the kernels skip the chain's bf16 intermediate roundings; see
    ops/norms.py and ops/quant_matmul.py for the per-kernel contracts).
    """
    from omchat_tpu.ops.quant_matmul import attn_proj_glue_quant, proj_glue_supported

    b, s, d = x.shape
    interpret = jax.default_backend() != "tpu"
    attn_p = layer["self_attn"]
    xq, xrs = rmsnorm_quant(
        x, layer["input_layernorm"]["scale"], cfg.rms_norm_eps, interpret=interpret
    )
    h, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.attn_head_dim
    q = dense_prequant(xq, xrs, attn_p["q_proj"], dtype=x.dtype).reshape(b, s, h, hd)
    k = dense_prequant(xq, xrs, attn_p["k_proj"], dtype=x.dtype).reshape(b, s, kvh, hd)
    v = dense_prequant(xq, xrs, attn_p["v_proj"], dtype=x.dtype).reshape(b, s, kvh, hd)
    q, k = apply_rope(q, k, cos, sin)
    ctx, cache_state = attend(q, k, v, cache_state)
    o = ctx.reshape(b, s, -1)
    post_gamma = layer["post_attention_layernorm"]["scale"]
    if proj_glue_supported(*attn_p["o_proj"]["kernel_q"].shape):
        x, yq, yrs = attn_proj_glue_quant(
            o,
            x,
            attn_p["o_proj"],
            jnp.ones((d,), x.dtype),
            post_gamma,
            cfg.rms_norm_eps,
            interpret=interpret,
        )
    else:
        x = x + dense(o, attn_p["o_proj"], a8=True)
        yq, yrs = rmsnorm_quant(x, post_gamma, cfg.rms_norm_eps, interpret=interpret)
    x = x + mlp_fn.prequant(yq, yrs, layer["mlp"], x.dtype, interpret)
    return x, cache_state


def cache_attend(cfg, attn_impl, write_pos, kv_len, q, k, v, cache_state, *, segment_ids=None):
    """Contiguous-slot cache handler: write K/V at ``write_pos`` into the
    head-major [B, KVH, T, Dh] cache (or no cache) and attend.

    ``segment_ids`` [B, S] enables multi-document packing on the CACHELESS
    (training) path — tokens attend only within their segment (the varlen
    flash kernel / XLA mask, ops/attention.py); incompatible with a cache."""
    k_cache, v_cache = cache_state
    if segment_ids is not None and k_cache is not None:
        raise ValueError("segment_ids packing is a cacheless (training) feature")
    b, s = q.shape[0], q.shape[1]
    if k_cache is not None:
        # vmapped dynamic_update_slice over batch at each sequence's offset
        upd = jax.vmap(lambda c, new, p: jax.lax.dynamic_update_slice(c, new, (0, p, 0)))
        wp = jnp.broadcast_to(write_pos, (b,))
        k_cache = upd(k_cache, k.astype(k_cache.dtype).transpose(0, 2, 1, 3), wp)
        v_cache = upd(v_cache, v.astype(v_cache.dtype).transpose(0, 2, 1, 3), wp)
        if s == 1:
            from omchat_tpu.ops.attention import decode_attention

            out = decode_attention(q, k_cache, v_cache, kv_len, impl=attn_impl)
        else:
            out = attention(
                q,
                k_cache,
                v_cache,
                causal=True,
                q_offset=write_pos,
                kv_len=kv_len,
                impl=attn_impl,
                kv_format="bntd",
            )
    else:
        out = attention(q, k, v, causal=True, impl=attn_impl, segment_ids=segment_ids)
    return out, (k_cache, v_cache)


def commit_decode_rows(cache: "KVCache", write_pos, k_rows, v_rows,
                       use_kernel: bool = False) -> "KVCache":
    """Commit the decode layer scan's staged K/V rows ([L, B, KVH, D]) into
    the stacked cache at ``write_pos`` — the one write of the read-only-cache
    decode step (see :func:`qwen2_forward`).

    ``use_kernel`` routes through the aliased Pallas row-commit
    (ops/paged_attention.commit_rows, each (layer, batch) cache row treated
    as one "page" of width T): the jnp scatter's cost GROWS with cache
    length — XLA rematerializes the operand — measured +0.4 ms/step at a 2k
    fill but +2.8 ms at 8k and worse beyond (dev/exp_longfill_anatomy.py);
    the aliased kernel writes only the touched 8-row windows at any fill.
    TPU single-device paths only (the opaque pallas_call would not shard)."""
    n_layers, b = k_rows.shape[0], k_rows.shape[1]
    wp = jnp.broadcast_to(jnp.asarray(write_pos, jnp.int32), (b,))
    rows = (
        jnp.arange(n_layers, dtype=jnp.int32)[:, None] * b
        + jnp.arange(b, dtype=jnp.int32)[None, :]
    )
    wp_b = jnp.broadcast_to(wp[None, :], rows.shape)
    cshape = cache.k.shape
    kf = cache.k.reshape(n_layers * b, *cshape[2:])
    vf = cache.v.reshape(n_layers * b, *cshape[2:])
    if use_kernel and cshape[3] % 8 == 0:
        from omchat_tpu.ops.paged_attention import commit_rows

        kf, vf = commit_rows(
            kf, vf, rows.reshape(-1), wp_b.reshape(-1),
            k_rows.reshape(n_layers * b, *k_rows.shape[2:]),
            v_rows.reshape(n_layers * b, *v_rows.shape[2:]),
        )
    else:
        kf = kf.at[rows, :, wp_b].set(k_rows.astype(kf.dtype))
        vf = vf.at[rows, :, wp_b].set(v_rows.astype(vf.dtype))
    return KVCache(k=kf.reshape(cshape), v=vf.reshape(cshape))


def cache_attend_stacked(cfg, attn_impl, kv_len, k_cache, v_cache, q, k, v, li):
    """Decode-step (S == 1) cache handler over the FULL stacked READ-ONLY
    cache (closed over; [L, B, KVH, T, D]).

    Attention selects the layer inside the kernel's index maps and folds the
    in-flight token in as a self-column (``kv_len`` here INCLUDES it, so the
    cache part masks at kv_len - 1); the token's K/V rows are returned for
    the caller to commit in ONE post-scan scatter — see :func:`qwen2_forward`
    for why the cache is neither scanned as xs/ys nor mutated per layer."""
    from omchat_tpu.ops.attention import decode_attention

    out = decode_attention(
        q, k_cache, v_cache, jnp.asarray(kv_len, jnp.int32) - 1,
        impl=attn_impl, layer=li, k_new=k[:, 0], v_new=v[:, 0],
    )
    return out, (li, k[:, 0], v[:, 0])


def decode_scan(cfg, attn_impl, params, inputs_embeds, cos, sin, cache, kv_len,
                write_pos, mlp_fn, lora_xs, adapter_ids, *, quant_glue=False):
    """Single-token decode over the layer stack, shared by the dense and MoE
    trunks (``mlp_fn`` is the only difference).

    The cache is READ-ONLY and loop-invariant through the layer scan —
    attention selects the layer inside the kernel's index maps and handles
    the in-flight token as a self-column; each layer emits only its new K/V
    rows as scan outputs and ONE scatter commits them.  Scanning the cache
    as xs/ys (the prefill structure) makes XLA re-materialize every layer's
    slice to stack the updated ys (~2 ms of a 13 ms single-stream step);
    carrying a per-layer-mutated cache makes XLA copy it to feed the Pallas
    operand (4x worse; dev/exp_decode_anatomy.py, round 4).  Prefill keeps
    xs/ys: its copy cost amortizes over the whole chunk."""
    n_layers = params["layers"]["input_layernorm"]["scale"].shape[0]
    attend = functools.partial(
        cache_attend_stacked, cfg, attn_impl, kv_len, cache.k, cache.v
    )

    def body_dec(carry, xs_):
        x, cos_, sin_ = carry
        li, layer, lora_layer = xs_
        x, (_, k_row, v_row) = decoder_layer(
            cfg, x, layer, cos_, sin_, attend, mlp_fn, li,
            quant_glue=quant_glue, lora=lora_layer, adapter_ids=adapter_ids,
        )
        return (x, cos_, sin_), (k_row, v_row)

    (x, _, _), (k_rows, v_rows) = jax.lax.scan(
        body_dec,
        (inputs_embeds, cos, sin),
        (jnp.arange(n_layers, dtype=jnp.int32), params["layers"], lora_xs),
    )  # k_rows: [L, B, KVH, D]
    use_kernel = quant_glue_ok(attn_impl) and jax.default_backend() == "tpu"
    return x, commit_decode_rows(cache, write_pos, k_rows, v_rows, use_kernel=use_kernel)


def _dense_mlp(y, p, a8, lora=None, adapter_ids=None):
    return _mlp(y, p, a8=a8, lora=lora, adapter_ids=adapter_ids)


def _dense_mlp_prequant(yq, yrs, p, dtype, interpret=False):
    """SwiGLU over pre-quantized activations (the glue fast path).  With a
    calibrated ``swiglu_out_scale`` the silu·mul re-quantizes in the matmul
    epilogue (ops/quant_matmul.py) and down_proj consumes int8 codes; without
    it the intermediate falls back to bf16 with a dynamic down_proj quantize."""
    from omchat_tpu.ops.quant_matmul import swiglu_quant

    if "swiglu_out_scale" in p:
        codes = swiglu_quant(
            yq, yrs, p["gate_proj"], p["up_proj"], p["swiglu_out_scale"],
            interpret=interpret,
        )
        return dense_prequant(codes, p["swiglu_out_scale"], p["down_proj"], dtype=dtype)
    g = dense_prequant(yq, yrs, p["gate_proj"], dtype=dtype)
    u = dense_prequant(yq, yrs, p["up_proj"], dtype=dtype)
    return dense(jax.nn.silu(g) * u, p["down_proj"], a8=True)


_dense_mlp.prequant = _dense_mlp_prequant


def quant_glue_ok(attn_impl) -> bool:
    """Glue kernels engage only for single-device Pallas-path serving: the
    multi-device engines force attn_impl to "xla" or the ("pallas_tp", mesh)
    tuple, under which the opaque pallas_calls would not shard."""
    return attn_impl is None or attn_impl in ("pallas", "pallas_manual")


def _layer_forward(cfg, attn_impl, segment_ids, adapter_ids, carry, xs):
    x, cos, sin, write_pos, kv_len = carry
    layer, lora_layer, k_cache, v_cache = xs
    attend = functools.partial(
        cache_attend, cfg, attn_impl, write_pos, kv_len, segment_ids=segment_ids
    )
    x, (k_cache, v_cache) = decoder_layer(
        cfg, x, layer, cos, sin, attend, _dense_mlp, (k_cache, v_cache),
        quant_glue=quant_glue_ok(attn_impl),
        lora=lora_layer, adapter_ids=adapter_ids,
    )
    return (x, cos, sin, write_pos, kv_len), (k_cache, v_cache)


def qwen2_forward(
    params: dict,
    cfg: TextConfig,
    inputs_embeds: jax.Array,
    positions: jax.Array,
    cache: Optional[KVCache] = None,
    write_pos: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,
    *,
    attn_impl: Optional[str] = None,
    remat: bool = False,
    segment_ids: Optional[jax.Array] = None,
    lora_bank: Optional[dict] = None,
    adapter_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder trunk (no lm_head).

    Args:
      inputs_embeds: [B, S, D] (callers embed tokens / splice image features).
      positions: [B, S] integer positions for RoPE.
      cache: optional KVCache; when given, K/V of this call are written at
        ``write_pos`` and attention runs against the cache with valid length
        ``kv_len`` (per-batch [B] or scalar).
      write_pos: int32 write offset into the cache (scalar or per-batch [B];
        0 for prefill).
      kv_len: valid cache length *after* this call's tokens are written.
      segment_ids: [B, S] int32 — multi-document training packing: tokens
        attend only within their segment, negative marks padding (cacheless
        path only; ops/attention.py routes to the varlen flash kernel).
      lora_bank: stacked multi-adapter bank (training/lora.py
        ``build_lora_bank``: leaves [L, N, in, r] / [L, N, r, out], bank row
        0 = base); with ``adapter_ids`` [B], each batch row applies its own
        adapter — per-request LoRA in a mixed serving batch.

    Returns (hidden_states [B, S, D], updated cache or None).
    """
    cos, sin = rope_cos_sin(
        positions,
        cfg.attn_head_dim,
        theta=cfg.rope_theta,
        scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings,
        dtype=inputs_embeds.dtype,
    )

    if write_pos is None:
        write_pos = jnp.int32(0)
    else:
        write_pos = jnp.asarray(write_pos, jnp.int32)

    if lora_bank is not None and adapter_ids is not None:
        lora_xs = lora_bank["layers"]
        adapter_ids = jnp.asarray(adapter_ids, jnp.int32)
    else:
        lora_xs, adapter_ids = None, None
    body = functools.partial(_layer_forward, cfg, attn_impl, segment_ids, adapter_ids)
    if remat:
        body = jax.checkpoint(body)

    if cache is not None and inputs_embeds.shape[1] == 1:
        x, new_cache = decode_scan(
            cfg, attn_impl, params, inputs_embeds, cos, sin, cache, kv_len,
            write_pos, _dense_mlp, lora_xs, adapter_ids,
            quant_glue=quant_glue_ok(attn_impl),
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


@functools.partial(jax.jit, static_argnames=("cfg",))
def _calibrate_swiglu_amax(params, cfg: TextConfig, inputs_embeds, positions):
    cos, sin = rope_cos_sin(
        positions,
        cfg.attn_head_dim,
        theta=cfg.rope_theta,
        scaling=cfg.rope_scaling,
        max_position_embeddings=cfg.max_position_embeddings,
        dtype=inputs_embeds.dtype,
    )
    b, s, _ = inputs_embeds.shape

    def body(x, layer):
        y = rms_norm(x, layer["input_layernorm"]["scale"], cfg.rms_norm_eps)
        q, k, v = attention_inputs(cfg, y, layer["self_attn"], cos, sin, True)
        ctx = attention(q, k, v, causal=True, impl="xla").reshape(b, s, -1)
        x = x + dense(ctx, layer["self_attn"]["o_proj"], a8=True)
        y = rms_norm(x, layer["post_attention_layernorm"]["scale"], cfg.rms_norm_eps)
        p = layer["mlp"]
        h = jax.nn.silu(dense(y, p["gate_proj"], a8=True)) * dense(y, p["up_proj"], a8=True)
        x = x + dense(h, p["down_proj"], a8=True)
        return x, jnp.max(jnp.abs(h.astype(jnp.float32)))

    _, amax = jax.lax.scan(body, inputs_embeds, params["layers"])
    return amax


def calibrate_swiglu_scales(params: dict, cfg: TextConfig, inputs_embeds, positions) -> dict:
    """Per-layer static SwiGLU-output scales for the quantizing MLP epilogue
    (the LLM analogue of :func:`~omchat_tpu.models.intern_vit.
    calibrate_fc1_scales`).  Runs the w8a8 trunk on a calibration batch,
    records each layer's amax of ``silu(gate(y)) * up(y)``, and returns a new
    params dict with ``layers.mlp.swiglu_out_scale`` [L] fp32 set — the
    quant-glue layer body picks it up automatically."""
    import numpy as np

    amax = np.asarray(_calibrate_swiglu_amax(params, cfg, inputs_embeds, positions))
    scales = np.maximum(amax, 1e-6).astype(np.float32) / 127.0
    out = dict(params)
    out["layers"] = dict(params["layers"])
    out["layers"]["mlp"] = dict(params["layers"]["mlp"])
    out["layers"]["mlp"]["swiglu_out_scale"] = jnp.asarray(scales)
    return out


def lm_head(params: dict, cfg: TextConfig, hidden: jax.Array) -> jax.Array:
    """Project to vocab logits (fp32)."""
    if cfg.tie_word_embeddings or "lm_head" not in params:
        return (hidden @ params["embed_tokens"].T.astype(hidden.dtype)).astype(jnp.float32)
    return dense(hidden, params["lm_head"]).astype(jnp.float32)


def embed_tokens(params: dict, input_ids: jax.Array) -> jax.Array:
    """Token embedding lookup; sentinel ids (-200) map to row 0 and ids beyond
    the vocab clamp (jnp.take's default fill mode would produce NaN rows)."""
    safe = jnp.where(input_ids < 0, 0, input_ids)
    return jnp.take(params["embed_tokens"], safe, axis=0, mode="clip")


# ---------------------------------------------------------------------------
# Init (tests / dryrun)
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: TextConfig, dtype=jnp.float32) -> dict:
    d, f, l, v = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers, cfg.vocab_size
    h, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.attn_head_dim
    keys = jax.random.split(key, 10)

    def nrm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    def proj(k, i, o, bias):
        p = {"kernel": nrm(k, (l, i, o))}
        if bias:
            p["bias"] = jnp.zeros((l, o), dtype)
        return p

    params = {
        "embed_tokens": nrm(keys[0], (v, d)),
        "layers": {
            "input_layernorm": {"scale": jnp.ones((l, d), dtype)},
            "post_attention_layernorm": {"scale": jnp.ones((l, d), dtype)},
            "self_attn": {
                "q_proj": proj(keys[1], d, h * hd, cfg.attention_bias),
                "k_proj": proj(keys[2], d, kvh * hd, cfg.attention_bias),
                "v_proj": proj(keys[3], d, kvh * hd, cfg.attention_bias),
                "o_proj": proj(keys[4], h * hd, d, False),
            },
            "mlp": {
                "gate_proj": proj(keys[5], d, f, False),
                "up_proj": proj(keys[6], d, f, False),
                "down_proj": proj(keys[7], f, d, False),
            },
        },
        "norm": {"scale": jnp.ones((d,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": nrm(keys[8], (d, v))}
    return params
