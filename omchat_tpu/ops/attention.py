"""Attention dispatcher.

Replaces the reference's external flash-attn CUDA kernels (SURVEY.md §2.2):

- ViT: non-causal packed-QKV flash (``flash_attn_varlen_qkvpacked_func``,
  intern_vit_6b/flash_attention.py:51-73) → :func:`attention` with
  ``causal=False``.
- LLM prefill: causal GQA flash → ``causal=True``.
- LLM decode: flash-decode over the HBM KV cache → :func:`decode_attention`.

``impl='xla'`` is the reference implementation (einsum + fp32 softmax, fully
fused by XLA and correct on any backend); ``impl='pallas'`` selects the Pallas
TPU kernels in :mod:`omchat_tpu.ops.flash_attention` /
:mod:`omchat_tpu.ops.decode_attention`.  Default: pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def default_impl() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _repeat_kv(k: jax.Array, num_q_heads: int) -> jax.Array:
    """[B, T, KVH, D] → [B, T, H, D] by repeating each kv head H/KVH times."""
    kvh = k.shape[2]
    if kvh == num_q_heads:
        return k
    return jnp.repeat(k, num_q_heads // kvh, axis=2)


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    q_offset: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,
    impl: Optional[str] = None,
    kv_format: str = "btnd",
    segment_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head (optionally grouped-query) attention.

    Args:
      q: [B, S, H, D]
      k, v: [B, T, KVH, D] ("btnd", default) or the head-major KV-cache layout
        [B, KVH, T, D] ("bntd"); KVH divides H (GQA).
      causal: apply a causal mask where query i attends to kv j iff
        ``j <= i + q_offset`` (q_offset defaults to T - S, the standard
        "suffix" alignment used during chunked prefill).
      q_offset: optional per-batch [B] or scalar offset of the first query row
        within the kv sequence.
      kv_len: optional [B] valid kv length; kv positions >= kv_len are masked.
      impl: 'xla' | 'pallas' | 'pallas_vjp' | None (auto).
      segment_ids: optional [B, S] int32 — multi-document packing (the TPU
        equivalent of flash-attn varlen cu_seqlens, SURVEY.md §2.2): tokens
        attend only within their segment; negative ids mark padding.
        Requires S == T (self-attention).  Runs on the Pallas kernel (per-block
        kv windows ride the scalar prefetch) or the XLA fallback.

    Returns [B, S, H, D] in q.dtype.
    """
    impl = impl or default_impl()
    if isinstance(impl, tuple) and impl[0] == "ring":
        # Context parallelism: q/k/v sequence-sharded over a mesh axis; block
        # attention + ppermute KV rotation + online-softmax merge
        # (parallel/ring_attention.py).  Differentiable (shard_map + scan) —
        # this is the --cp training path.  Decode/cache/packed shapes fall
        # back to XLA (GSPMD gathers the sequence axis there).
        mesh, ring_axis = impl[1], impl[2]
        if (
            segment_ids is None
            and q_offset is None
            and kv_len is None
            and kv_format == "btnd"
            and q.shape[1] == k.shape[1]
        ):
            from omchat_tpu.parallel.ring_attention import ring_attention

            batch_axis = "data" if "data" in mesh.axis_names else None
            return ring_attention(
                q, k, v, mesh, axis=ring_axis, causal=causal, batch_axis=batch_axis
            )
        impl = "xla"
    if isinstance(impl, tuple) and impl[0] == "ulysses":
        # Ulysses sequence parallelism: q/k/v sequence-sharded over a mesh
        # axis; one all-to-all re-shards head-wise so each device runs
        # full-sequence attention on H/P heads, a second all-to-all restores
        # sequence sharding (parallel/ulysses.py).  Differentiable — this is
        # the --ulysses training path.  Decode/cache/packed shapes and
        # non-divisible heads/seq fall back to XLA.
        mesh, seq_axis = impl[1], impl[2]
        p = mesh.shape[seq_axis]
        if (
            segment_ids is None
            and q_offset is None
            and kv_len is None
            and kv_format == "btnd"
            and q.shape[1] == k.shape[1]
            and q.shape[2] % p == 0
            and q.shape[1] % p == 0
        ):
            from omchat_tpu.parallel.ulysses import ulysses_attention

            batch_axis = "data" if "data" in mesh.axis_names else None
            return ulysses_attention(
                q, k, v, mesh, axis=seq_axis, causal=causal, batch_axis=batch_axis
            )
        impl = "xla"
    if isinstance(impl, tuple) and impl[0] == "pallas_tp":
        # Tensor-parallel Pallas: the kernel runs per shard under shard_map
        # (heads Megatron-sharded over the mesh's model axis).  The tuple
        # (name, mesh) is hashable, so it rides the static attn_impl plumbing.
        mesh = impl[1]
        kvh = k.shape[2] if kv_format == "btnd" else k.shape[1]
        from omchat_tpu.parallel.tp_attention import tp_flash_attention, tp_shardable

        if segment_ids is None and tp_shardable(mesh, q.shape[2], kvh):
            return tp_flash_attention(
                q, k, v, mesh, causal=causal, q_offset=q_offset, kv_len=kv_len,
                kv_format=kv_format, interpret=default_impl() != "pallas",
            )
        impl = "xla"  # packed/segment batches or non-divisible heads
    if segment_ids is not None:
        assert kv_format == "btnd" and q.shape[1] == k.shape[1]
        if impl == "pallas_vjp":
            # Differentiable packed path (--pack SFT): the custom-VJP kernels
            # take per-block segment tiles + block windows, so cross-document
            # tiles are skipped in fwd AND bwd (previously the grad path fell
            # back to XLA masked attention).
            from omchat_tpu.ops.flash_attention_bwd import flash_attention_trainable

            assert q_offset is None and kv_len is None
            return flash_attention_trainable(q, k, v, causal, 512, 512, False, segment_ids)
        if impl == "pallas":
            from omchat_tpu.ops.flash_attention import flash_attention

            return flash_attention(
                q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len, segment_ids=segment_ids
            )
        return _xla_attention(
            q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len, segment_ids=segment_ids
        )
    if impl == "pallas_vjp":
        # Differentiable Pallas path (training): full-sequence, no cache args.
        from omchat_tpu.ops.flash_attention_bwd import flash_attention_trainable

        assert q_offset is None and kv_len is None and kv_format == "btnd"
        return flash_attention_trainable(q, k, v, causal)
    if impl == "pallas":
        from omchat_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len, kv_format=kv_format
        )
    if kv_format == "bntd":
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
    return _xla_attention(q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len)


def _xla_attention(q, k, v, *, causal, q_offset, kv_len, segment_ids=None):
    B, S, H, D = q.shape
    T = k.shape[1]
    k = _repeat_kv(k, H)
    v = _repeat_kv(v, H)

    scale = D**-0.5
    # [B, H, S, T] scores in fp32.
    scores = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32) * scale, k.astype(jnp.float32))

    mask = None
    if causal:
        if q_offset is None:
            offset = jnp.full((B,), T - S, dtype=jnp.int32)
        else:
            offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
        q_pos = jnp.arange(S, dtype=jnp.int32)[None, :, None] + offset[:, None, None]  # [B,S,1]
        kv_pos = jnp.arange(T, dtype=jnp.int32)[None, None, :]  # [1,1,T]
        mask = kv_pos <= q_pos  # [B,S,T]
    if kv_len is not None:
        valid = jnp.arange(T, dtype=jnp.int32)[None, None, :] < jnp.broadcast_to(
            jnp.asarray(kv_len, jnp.int32), (B,)
        )[:, None, None]
        mask = valid if mask is None else (mask & valid)
    if segment_ids is not None:
        seg = segment_ids[:, :, None] == segment_ids[:, None, :]  # [B, S, T]
        mask = seg if mask is None else (mask & seg)

    if mask is not None:
        scores = jnp.where(mask[:, None, :, :], scores, jnp.float32(-1e30))

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", probs, v.astype(jnp.float32))
    return out.astype(q.dtype)


def self_column_reference(q, k_cache, v_cache, cache_len, k_new, v_new):
    """Reference (XLA) decode attention with the in-flight token as a
    self-column: k/v_cache [B, KVH, T, D] hold the first ``cache_len``
    tokens; ``k_new``/``v_new`` [B, KVH, D] are appended as one extra valid
    column.  Shared by the contiguous and paged dispatchers' fallbacks."""
    k = jnp.concatenate([k_cache, k_new.astype(k_cache.dtype)[:, :, None, :]], axis=2)
    v = jnp.concatenate([v_cache, v_new.astype(v_cache.dtype)[:, :, None, :]], axis=2)
    B, _, H, D = q.shape
    t = k.shape[2]
    kr = _repeat_kv(k.transpose(0, 2, 1, 3), H).transpose(0, 2, 1, 3)
    vr = _repeat_kv(v.transpose(0, 2, 1, 3), H).transpose(0, 2, 1, 3)
    idx = jnp.arange(t)[None, :]
    valid = (
        idx < jnp.broadcast_to(jnp.asarray(cache_len, jnp.int32), (B,))[:, None]
    ) | (idx == t - 1)
    scores = jnp.einsum(
        "bshd,bhtd->bhst", q.astype(jnp.float32) * (D**-0.5), kr.astype(jnp.float32)
    )
    scores = jnp.where(valid[:, None, None, :], scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhst,bhtd->bshd", probs, vr.astype(jnp.float32))
    return out.astype(q.dtype)


def decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    cache_len: jax.Array,
    *,
    impl: Optional[str] = None,
    layer: Optional[jax.Array] = None,
    k_new: Optional[jax.Array] = None,
    v_new: Optional[jax.Array] = None,
) -> jax.Array:
    """Single-step decode attention against a padded KV cache.

    Args:
      q: [B, 1, H, D] — the new token's queries.
      k_cache, v_cache: [B, KVH, S_max, D] head-major HBM-resident cache (new
        token already written at position cache_len - 1) — or the full
        stacked per-layer cache [L, B, KVH, S_max, D] with ``layer`` giving
        the layer index (the read-only-cache decode scan; the layer slice is
        selected inside the Pallas kernel's index maps, never materialized).
      cache_len: [B] current valid cache length (including the new token) —
        or, when ``k_new``/``v_new`` [B, KVH, D] carry the in-flight token as
        a self-column, the length EXCLUDING it (see
        qwen2.cache_attend_stacked for why the cache stays read-only).

    Returns [B, 1, H, D].
    """
    impl = impl or default_impl()
    if isinstance(impl, tuple):
        # pallas_tp: decode is HBM-bound and the XLA einsum path partitions
        # cleanly under GSPMD — no per-shard kernel needed at S=1.
        impl = "xla"
    if impl == "pallas":
        if k_cache.ndim == 5:
            from omchat_tpu.ops.decode_attention import flash_decode_stacked

            return flash_decode_stacked(q, k_cache, v_cache, cache_len, layer, k_new, v_new)
        from omchat_tpu.ops.decode_attention import flash_decode

        return flash_decode(q, k_cache, v_cache, cache_len)
    if k_cache.ndim == 5:
        k_cache = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
        v_cache = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    if k_new is not None:
        return self_column_reference(q, k_cache, v_cache, cache_len, k_new, v_new)
    return _xla_attention(
        q,
        k_cache.transpose(0, 2, 1, 3),
        v_cache.transpose(0, 2, 1, 3),
        causal=False,
        q_offset=None,
        kv_len=cache_len,
    )
