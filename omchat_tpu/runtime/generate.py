"""Generation runtime: jitted prefill + jitted decode step + host streaming loop.

Replaces the reference's HF ``GenerationMixin.generate`` host loop with its
legacy tuple KV cache (SURVEY.md L0/§6): here prefill is one jitted call that
fills a static-max-length HBM cache and returns the first-token logits, and
each decode step is one jitted call (no per-step cache concatenation, no
Python-side tensor surgery).  A fully on-device ``lax.while_loop`` decode is
also provided for benchmarking / batch completion without per-token host sync.

Shape discipline: merged prompt lengths are bucketed (multiples of 128) and the
cache length is ``prompt_bucket + max_new_tokens``; distinct buckets compile
once and are cached by jit.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.models.omchat import (
    MergePlan,
    encode_images,
    fuse_embeddings,
    plan_multimodal_merge,
    round_up_to_bucket,
)
from omchat_tpu.models.decoder import decoder_forward
from omchat_tpu.models.qwen2 import KVCache, embed_tokens, init_kv_cache, lm_head
from omchat_tpu.ops.sampling import greedy, sample


# ---------------------------------------------------------------------------
# Jitted stages (closed over config via static args)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"))
def _encode_images_jit(params, cfg: OmChatConfig, pixel_values, attn_impl=None):
    feats = encode_images(params, cfg, pixel_values, attn_impl=attn_impl)
    return feats.reshape(-1, feats.shape[-1])  # [N*L, D]


@functools.partial(jax.jit, static_argnames=("cfg", "cache_len", "attn_impl", "cache_dtype"))
def _prefill_jit(
    params,
    cfg: OmChatConfig,
    token_ids,
    is_image,
    image_index,
    image_features,
    positions,
    lengths,
    cache_len: int,
    attn_impl=None,
    cache_dtype=None,
    lora_bank=None,
    adapter_ids=None,
):
    """Prefill: fuse embeddings, run the trunk, return last-valid-token logits
    and the filled cache."""
    b = token_ids.shape[0]
    embeds = fuse_embeddings(params, token_ids, is_image, image_index, image_features)
    cache = init_kv_cache(cfg.text, b, cache_len, dtype=cache_dtype or embeds.dtype)
    write_pos = jnp.zeros((b,), jnp.int32)
    hidden, cache = decoder_forward(
        params["language_model"],
        cfg.text,
        embeds,
        positions,
        cache,
        write_pos=write_pos,
        kv_len=lengths,
        attn_impl=attn_impl,
        lora_bank=lora_bank,
        adapter_ids=adapter_ids,
    )
    # hidden at the last valid position of each sequence (right padding).
    idx = jnp.maximum(lengths - 1, 0)
    last = jnp.take_along_axis(hidden, idx[:, None, None].astype(jnp.int32), axis=1)  # [B,1,D]
    logits = lm_head(params["language_model"], cfg.text, last)[:, 0]  # [B, V]
    return logits, cache


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"), donate_argnames=("cache",))
def _prefill_chunk_jit(
    params,
    cfg: OmChatConfig,
    token_ids,
    is_image,
    image_index,
    image_features,
    positions,
    chunk_start,
    chunk_lengths,
    cache: KVCache,
    attn_impl=None,
    lora_bank=None,
    adapter_ids=None,
):
    """One chunk of an incremental prefill: write this chunk's K/V at
    ``chunk_start`` [B] and attend against everything cached so far.

    Enables prompts longer than any single compiled bucket and the
    encode→prefill pipelining for multi-image/video streams (tiles of image i
    can prefill while image i+1 is still encoding)."""
    embeds = fuse_embeddings(params, token_ids, is_image, image_index, image_features)
    hidden, cache = decoder_forward(
        params["language_model"],
        cfg.text,
        embeds,
        positions,
        cache,
        write_pos=chunk_start,
        kv_len=chunk_start + chunk_lengths,
        attn_impl=attn_impl,
        lora_bank=lora_bank,
        adapter_ids=adapter_ids,
    )
    idx = jnp.maximum(chunk_lengths - 1, 0)
    last = jnp.take_along_axis(hidden, idx[:, None, None].astype(jnp.int32), axis=1)
    logits = lm_head(params["language_model"], cfg.text, last)[:, 0]
    return logits, cache


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"), donate_argnames=("cache",))
def _decode_step_jit(params, cfg: OmChatConfig, tokens, kv_len, cache: KVCache, attn_impl=None,
                     lora_bank=None, adapter_ids=None):
    """One decode step.  tokens: [B], kv_len: [B] current length (pre-write)."""
    embeds = embed_tokens(params["language_model"], tokens[:, None])
    positions = kv_len[:, None]
    hidden, cache = decoder_forward(
        params["language_model"],
        cfg.text,
        embeds,
        positions,
        cache,
        write_pos=kv_len,
        kv_len=kv_len + 1,
        attn_impl=attn_impl,
        lora_bank=lora_bank,
        adapter_ids=adapter_ids,
    )
    logits = lm_head(params["language_model"], cfg.text, hidden)[:, 0]
    return logits, cache


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "eos_token_id", "attn_impl", "gen"),
    donate_argnames=("cache",),
)
def _decode_loop_jit(
    params,
    cfg: OmChatConfig,
    first_tokens,
    kv_len,
    cache: KVCache,
    max_new_tokens: int,
    eos_token_id: int,
    attn_impl=None,
    gen: Optional[GenerationConfig] = None,
    rng_key=None,
    lora_bank=None,
    adapter_ids=None,
):
    """Fully on-device decode via lax.while_loop (no per-token host sync) —
    greedy by default, or sampled per ``gen`` (temperature / top-k / top-p)
    with the PRNG key split inside the loop.

    Returns (tokens [B, max_new_tokens] padded with eos, num_generated [B])."""
    b = first_tokens.shape[0]
    out = jnp.full((b, max_new_tokens), eos_token_id, jnp.int32)
    out = out.at[:, 0].set(first_tokens)
    done = first_tokens == eos_token_id
    key0 = rng_key if rng_key is not None else jax.random.PRNGKey(0)

    def cond(state):
        step, _, _, _, done, _, _ = state
        return (step < max_new_tokens) & ~jnp.all(done)

    def body(state):
        step, tokens, kv_len, cache, done, out, key = state
        logits, cache = _decode_step_inner(params, cfg, tokens, kv_len, cache, attn_impl,
                                           lora_bank, adapter_ids)
        if gen is not None and gen.do_sample:
            key, sub = jax.random.split(key)
            picked = sample(logits, sub, gen)
        else:
            picked = greedy(logits)
        next_tokens = jnp.where(done, jnp.int32(eos_token_id), picked)
        out = out.at[:, step].set(next_tokens)
        done = done | (next_tokens == eos_token_id)
        return step + 1, next_tokens, kv_len + 1, cache, done, out, key

    step, _, kv_len, _, done, out, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(1), first_tokens, kv_len, cache, done, out, key0)
    )
    return out, step


def _decode_step_inner(params, cfg, tokens, kv_len, cache, attn_impl,
                       lora_bank=None, adapter_ids=None):
    embeds = embed_tokens(params["language_model"], tokens[:, None])
    hidden, cache = decoder_forward(
        params["language_model"],
        cfg.text,
        embeds,
        kv_len[:, None],
        cache,
        write_pos=kv_len,
        kv_len=kv_len + 1,
        attn_impl=attn_impl,
        lora_bank=lora_bank,
        adapter_ids=adapter_ids,
    )
    logits = lm_head(params["language_model"], cfg.text, hidden)[:, 0]
    return logits, cache


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------


def make_stdout_streamer(tokenizer, window: int = 24):
    """Incremental token→stdout streamer with a bounded decode window
    (full-prefix re-decode per token is O(n²)); shared by the CLIs."""
    printed = []

    def stream(token_id: int):
        printed.append(token_id)
        tail = printed[-window:]
        text = tokenizer.decode(tail, skip_special_tokens=True)
        prev = tokenizer.decode(tail[:-1], skip_special_tokens=True)
        print(text[len(prev):], end="", flush=True)

    return stream


class KeywordStopper:
    """Host-side keyword stopping — the reference's KeywordsStoppingCriteria
    (mm_utils.py:242-274) recast for the streaming loop."""

    def __init__(self, keywords: Sequence[str], tokenizer):
        self.keywords = list(keywords)
        self.tokenizer = tokenizer

    def should_stop(self, generated_ids: List[int]) -> bool:
        if not self.keywords:
            return False
        # bounded-tail check (the reference decodes only a max-keyword-length
        # window, mm_utils.py:258): avoids O(n²) full-prefix re-decodes
        tail = generated_ids[-64:]
        text = self.tokenizer.decode(tail, skip_special_tokens=True)
        return any(k in text for k in self.keywords)


@dataclass
class GenerateOutput:
    token_ids: List[List[int]]  # generated tokens per sequence (eos excluded)
    prompt_len: np.ndarray
    # per-token log p(token | prefix) for each sequence, aligned with
    # token_ids; only populated when generate(return_logprobs=True)
    logprobs: Optional[List[List[float]]] = None
    # per-token top-k alternatives [(token_id, logprob), ...] per sequence,
    # aligned with token_ids; populated when generate(top_logprobs=k > 0)
    top_logprobs: Optional[List[List[List[tuple]]]] = None


@jax.jit
def _chosen_logprob_jit(logits, tokens):
    """log softmax of the selected token per row: [B, V], [B] -> [B] f32."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, tokens[:, None], axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("k",))
def _top_logprobs_jit(logits, k: int):
    """Top-k (logprob, token id) per row: [B, V] -> ([B, k] f32, [B, k] i32)."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jax.lax.top_k(lp, k)


class OmChatEngine:
    """Host-side driver around the jitted stages.

    Mirrors the reference inference contract: prompts arrive as input_ids with
    ``-200`` sentinels plus a stack of image tiles (single_inference.py:43-62).
    """

    def __init__(
        self,
        cfg: OmChatConfig,
        params: dict,
        *,
        attn_impl: Optional[str] = None,
        prompt_bucket: int = 128,
        cache_dtype=None,
        mesh=None,
        image_cache_size: int = 8,
        lora_bank: Optional[dict] = None,
    ):
        """lora_bank: stacked multi-adapter bank (training/lora.py
        ``build_lora_bank``) for per-request LoRA — requests pick an adapter
        via ``generate(adapter_id=...)``; id 0 is the base model.

        cache_dtype: override the KV-cache storage dtype — e.g.
        ``jnp.float8_e4m3fn`` halves cache HBM (long-context serving); kernels
        dequantize on load.

        image_cache_size: entries in the encoded-image LRU (feature_cache.py);
        0 disables.  Multi-turn chat resends the same image every turn — a hit
        skips the whole ViT+projector stage (~224 ms/turn at the 13B geometry).

        mesh: the device mesh the params are sharded over (tensor parallel);
        recorded so serving layers (BatchEngine, serve.py) can shard their
        long-lived caches consistently — the jitted stages themselves follow
        the param shardings via GSPMD propagation."""
        self.cfg = cfg
        self.params = params
        if attn_impl is None and mesh is not None and getattr(mesh, "size", 1) > 1:
            # Multi-device mesh: GSPMD would replicate an opaque pallas_call's
            # operands (all-gathering sharded q/k/v), so plain "pallas" is
            # never the default here.  When whole GQA groups land on each
            # model-axis shard, run the kernels per shard via shard_map
            # (attn_impl tuple, see parallel.tp_attention); otherwise XLA's
            # fused attention partitions cleanly.
            from omchat_tpu.ops.attention import default_impl
            from omchat_tpu.parallel.tp_attention import tp_shardable

            tc = cfg.text
            if default_impl() == "pallas" and tp_shardable(
                mesh, tc.num_attention_heads, tc.num_key_value_heads
            ):
                attn_impl = ("pallas_tp", mesh)
            else:
                attn_impl = "xla"
        self.attn_impl = attn_impl
        self.prompt_bucket = prompt_bucket
        self.cache_dtype = cache_dtype
        self.mesh = mesh
        self.lora_bank = lora_bank
        if image_cache_size:
            from omchat_tpu.runtime.feature_cache import ImageFeatureCache

            self.image_cache = ImageFeatureCache(image_cache_size)
        else:
            self.image_cache = None

    # -- stages ------------------------------------------------------------

    def encode_images(self, pixel_values: np.ndarray, cache_key=None) -> jax.Array:
        """[N, 3, H, W] tiles → flattened [N*L, D] projected features.

        ``cache_key``: caller-supplied identity for the image-feature LRU
        (feature_cache.py) — e.g. a hash of the compressed image bytes.  When
        absent, host-side numpy inputs are content-hashed; device arrays are
        encoded uncached (hashing them would pull pixels back to the host)."""
        from omchat_tpu.runtime.feature_cache import cached_encode

        return cached_encode(
            self.image_cache,
            pixel_values,
            cache_key,
            lambda pv: _encode_images_jit(self.params, self.cfg, jnp.asarray(pv), self.attn_impl),
        )

    def plan(self, batch_input_ids, pad_to=None, tokens_per_sentinel=None) -> MergePlan:
        return plan_multimodal_merge(
            batch_input_ids,
            self.cfg.image_seq_len,
            tokens_per_sentinel=tokens_per_sentinel,
            pad_to=pad_to,
            bucket=self.prompt_bucket,
            max_length=self.cfg.tokenizer_model_max_length,
        )

    def merge_spatial_features(self, feats, num_patches, image_sizes):
        """OmChat-v1 fusion (cfg.mm_patch_merge_type 'spatial'/'spatial_unpad',
        reference omchat_llama.py:421-459): arrange each image's projected tile
        features into the anyres grid, crop the aspect padding, append the
        learned image_newline per row, prepend the thumbnail.

        feats: flattened [ΣN·L, D] tile features (sentinel order);
        num_patches: tiles per image; image_sizes: (width, height) originals.
        Returns (flat [ΣT, D] merged features, tokens-per-sentinel list)."""
        from omchat_tpu.models.spatial_merge import spatial_unpad_merge

        newline = self.params.get("image_newline")
        if newline is None:
            raise ValueError(
                "mm_patch_merge_type spatial needs the checkpoint's image_newline embedding"
            )
        per_tile = self.cfg.image_seq_len
        feats = feats.reshape(-1, per_tile, feats.shape[-1])  # [ΣN, L, D]
        outs, counts, off = [], [], 0
        for n, size in zip(num_patches, image_sizes):
            merged = spatial_unpad_merge(
                feats[off : off + int(n)],
                tuple(size),
                self.cfg.image_grid_pinpoints,
                self.cfg.vision.image_size,
                newline,
                patch_merge_type=self.cfg.mm_patch_merge_type,
            )
            off += int(n)
            outs.append(merged)
            counts.append(int(merged.shape[0]))
        import jax.numpy as _jnp

        return _jnp.concatenate(outs, axis=0), counts

    def _adapter_ids(self, b: int, adapter_id) -> Optional[jax.Array]:
        """[B] bank indices for this dispatch, or None when no bank is loaded.
        ``adapter_id`` is an int (whole batch) or a per-row sequence."""
        if self.lora_bank is None:
            return None
        ids = np.full((b,), adapter_id, np.int32) if np.isscalar(adapter_id) else np.asarray(adapter_id, np.int32)
        n = self.lora_bank["layers"]  # any leaf carries the bank size
        n = next(iter(next(iter(n.values())).values()))["a"].shape[1]
        if ids.shape != (b,) or (ids < 0).any() or (ids >= n).any():
            raise ValueError(f"adapter ids {ids} out of range for bank of {n - 1} adapters")
        return jnp.asarray(ids)

    def prefill(self, plan: MergePlan, image_features: Optional[jax.Array], max_new_tokens: int,
                adapter_ids: Optional[jax.Array] = None):
        cache_len = plan.max_len + round_up_to_bucket(max_new_tokens, self.prompt_bucket)
        if image_features is None:
            d = self.params["language_model"]["embed_tokens"].shape[1]
            image_features = jnp.zeros((1, d), self.params["language_model"]["embed_tokens"].dtype)
        logits, cache = _prefill_jit(
            self.params,
            self.cfg,
            jnp.asarray(plan.token_ids),
            jnp.asarray(plan.is_image),
            jnp.asarray(plan.image_index),
            image_features,
            jnp.asarray(plan.positions),
            jnp.asarray(plan.lengths),
            cache_len,
            self.attn_impl,
            self.cache_dtype,
            lora_bank=self.lora_bank if adapter_ids is not None else None,
            adapter_ids=adapter_ids,
        )
        return logits, cache

    def prefill_chunked(
        self,
        plan: MergePlan,
        image_features: Optional[jax.Array],
        max_new_tokens: int,
        chunk_size: int = 1024,
    ):
        """Incremental prefill in fixed-size chunks against the cache.

        One compiled program per chunk_size regardless of prompt length —
        prompts longer than any bucket stream through, and image features can
        arrive per-chunk (encode/prefill pipelining for video).  Returns
        (last-token logits [B, V], cache)."""
        cfg = self.cfg
        b, m = plan.token_ids.shape
        dtype = self.params["language_model"]["embed_tokens"].dtype
        cache_dtype = self.cache_dtype or dtype
        if image_features is None:
            d = self.params["language_model"]["embed_tokens"].shape[1]
            image_features = jnp.zeros((1, d), dtype)

        # The final chunk is padded to chunk_size; the cache must cover the
        # padded write extent or dynamic_update_slice clamps the write start
        # backward and corrupts earlier rows.
        padded_m = round_up_to_bucket(plan.max_len, chunk_size)
        cache_len = round_up_to_bucket(padded_m + max_new_tokens, self.prompt_bucket)
        cache = init_kv_cache(cfg.text, b, cache_len, dtype=cache_dtype)

        final_logits = np.zeros((b, cfg.text.vocab_size), np.float32)
        lengths = plan.lengths
        for c0 in range(0, m, chunk_size):
            csize = min(chunk_size, m - c0)
            pad = chunk_size - csize

            def cut(a, fill=0):
                part = a[:, c0 : c0 + csize]
                if pad:
                    part = np.pad(part, ((0, 0), (0, pad)), constant_values=fill)
                return jnp.asarray(part)

            chunk_lengths = np.clip(lengths - c0, 0, chunk_size).astype(np.int32)
            if (chunk_lengths == 0).all():
                break
            logits, cache = _prefill_chunk_jit(
                self.params,
                cfg,
                cut(plan.token_ids),
                cut(plan.is_image),
                cut(plan.image_index),
                image_features,
                cut(plan.positions),
                jnp.full((b,), c0, jnp.int32),
                jnp.asarray(chunk_lengths),
                cache,
                self.attn_impl,
            )
            ends_here = (lengths > c0) & (lengths <= c0 + chunk_size)
            if ends_here.any():
                logits_np = np.asarray(logits)
                final_logits[ends_here] = logits_np[ends_here]
        return jnp.asarray(final_logits), cache

    # -- full generation ----------------------------------------------------

    def generate(
        self,
        batch_input_ids: Sequence[Sequence[int]],
        images: Optional[np.ndarray] = None,
        generation: Optional[GenerationConfig] = None,
        *,
        stream_callback: Optional[Callable[[int], None]] = None,
        stop_keywords: Sequence[str] = (),
        tokenizer=None,
        rng_key: Optional[jax.Array] = None,
        return_logprobs: bool = False,
        top_logprobs: int = 0,
        allowed_tokens_fn: Optional[Callable[[List[int]], Optional[List[int]]]] = None,
        logit_bias: Optional[dict] = None,
        adapter_id=0,
        num_patches: Optional[Sequence[int]] = None,
        image_sizes: Optional[Sequence] = None,
    ) -> GenerateOutput:
        """Greedy/sampled decode with host streaming.

        images: [N_total_tiles, 3, H, W] across the batch's sentinels, in
        sentinel order (the reference's cur_image_idx contract).

        num_patches / image_sizes: required when cfg.mm_patch_merge_type is
        'spatial'/'spatial_unpad' (the OmChat-v1 assembly) — tiles per image
        and original (width, height) per image; one sentinel per IMAGE then
        expands to that image's spatial-merged token count.

        logit_bias: OpenAI-style {token_id: bias} added to every step's
        logits (clamped upstream to ±100 by the server).  Presence/frequency
        penalties ride GenerationConfig and are applied per batch row from
        the tokens generated so far."""
        gen = generation or GenerationConfig()
        stopper = KeywordStopper(stop_keywords, tokenizer) if stop_keywords else None
        if allowed_tokens_fn is not None and len(batch_input_ids) != 1:
            raise ValueError("constrained decoding is single-request (b == 1)")

        from omchat_tpu.utils.profiling import trace_span

        self.spans: dict = {}
        with trace_span("encode_images", self.spans):
            feats = self.encode_images(images) if images is not None else None
        tokens_per_sentinel = None
        if feats is not None and self.cfg.mm_patch_merge_type.startswith("spatial"):
            if num_patches is None or image_sizes is None:
                raise ValueError(
                    "spatial patch merge needs num_patches and image_sizes per image"
                )
            feats, tokens_per_sentinel = self.merge_spatial_features(
                feats, num_patches, image_sizes
            )
        plan = self.plan(batch_input_ids, tokens_per_sentinel=tokens_per_sentinel)
        adapter_ids = self._adapter_ids(plan.token_ids.shape[0], adapter_id)
        with trace_span("prefill", self.spans):
            logits, cache = self.prefill(plan, feats, gen.max_new_tokens, adapter_ids=adapter_ids)

        b = plan.token_ids.shape[0]
        kv_len = jnp.asarray(plan.lengths)
        key = rng_key if rng_key is not None else jax.random.PRNGKey(0)

        generated: List[List[int]] = [[] for _ in range(b)]
        logprobs: List[List[float]] = [[] for _ in range(b)]
        tops: List[List[List[tuple]]] = [[] for _ in range(b)]
        done = np.zeros(b, bool)
        tokens = None
        bias_vec = None
        if logit_bias:
            v = int(logits.shape[-1])
            bias_vec = np.zeros((v,), np.float32)
            for tid, bv in logit_bias.items():
                if 0 <= int(tid) < v:  # out-of-vocab ids are inert, not fatal
                    bias_vec[int(tid)] = float(bv)
            bias_vec = jnp.asarray(bias_vec)
        penalized = gen.presence_penalty != 0.0 or gen.frequency_penalty != 0.0
        decode_t0 = time.perf_counter()
        for step in range(gen.max_new_tokens):
            step_logits = logits
            if bias_vec is not None:
                step_logits = step_logits + bias_vec
            if penalized and any(generated):
                pen = np.zeros((b, int(logits.shape[-1])), np.float32)
                for i in range(b):
                    if generated[i]:
                        ids, counts = np.unique(np.asarray(generated[i]), return_counts=True)
                        pen[i, ids] = gen.presence_penalty + gen.frequency_penalty * counts
                step_logits = step_logits - jnp.asarray(pen)
            if allowed_tokens_fn is not None:
                # constrained decoding (runtime/constrained.py): additively
                # mask the logits to the tokens extending some candidate;
                # None means the generated path IS a complete candidate
                allowed = allowed_tokens_fn(generated[0])
                if allowed is None:
                    break
                bias = np.full((int(logits.shape[-1]),), -np.inf, np.float32)
                bias[np.asarray(allowed, np.int64)] = 0.0
                step_logits = logits + jnp.asarray(bias)
            if gen.do_sample:
                key, sub = jax.random.split(key)
                tokens = sample(step_logits, sub, gen)
            else:
                tokens = greedy(step_logits)
            toks = np.asarray(tokens)
            lps = np.asarray(_chosen_logprob_jit(step_logits, tokens)) if return_logprobs else None
            top_lp = top_id = None
            if top_logprobs > 0:
                tl, ti = _top_logprobs_jit(step_logits, top_logprobs)
                top_lp, top_id = np.asarray(tl), np.asarray(ti)
            for i in range(b):
                if not done[i]:
                    if int(toks[i]) == gen.eos_token_id:
                        done[i] = True
                    else:
                        generated[i].append(int(toks[i]))
                        if lps is not None:
                            logprobs[i].append(float(lps[i]))
                        if top_lp is not None:
                            tops[i].append(
                                [(int(t), float(l)) for t, l in zip(top_id[i], top_lp[i])]
                            )
                        if stream_callback is not None and b == 1:
                            stream_callback(int(toks[i]))
                        if stopper is not None and stopper.should_stop(generated[i]):
                            done[i] = True
            if done.all() or step == gen.max_new_tokens - 1:
                break
            logits, cache = _decode_step_jit(
                self.params, self.cfg, tokens, kv_len, cache, self.attn_impl,
                lora_bank=self.lora_bank if adapter_ids is not None else None,
                adapter_ids=adapter_ids,
            )
            kv_len = kv_len + 1

        self.spans["decode"] = time.perf_counter() - decode_t0
        return GenerateOutput(
            token_ids=generated, prompt_len=plan.lengths,
            logprobs=logprobs if return_logprobs else None,
            top_logprobs=tops if top_logprobs > 0 else None,
        )

    def generate_ondevice(
        self,
        batch_input_ids: Sequence[Sequence[int]],
        images: Optional[np.ndarray] = None,
        generation: Optional[GenerationConfig] = None,
        rng_key: Optional[jax.Array] = None,
    ):
        """Fully on-device decode loop (no per-token host sync); greedy or
        sampled per the generation config."""
        gen = generation or GenerationConfig()
        feats = self.encode_images(images) if images is not None else None
        plan = self.plan(batch_input_ids)
        logits, cache = self.prefill(plan, feats, gen.max_new_tokens)
        if gen.do_sample:
            key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
            key, sub = jax.random.split(key)
            first = sample(logits, sub, gen)
        else:
            key = rng_key
            first = greedy(logits)
        out, num = _decode_loop_jit(
            self.params,
            self.cfg,
            first,
            jnp.asarray(plan.lengths),
            cache,
            gen.max_new_tokens,
            gen.eos_token_id,
            self.attn_impl,
            gen,
            key,
        )
        out_np = np.asarray(out)
        result = []
        for i in range(out_np.shape[0]):
            row = out_np[i].tolist()
            row = row[: row.index(gen.eos_token_id)] if gen.eos_token_id in row else row
            result.append(row)
        return GenerateOutput(token_ids=result, prompt_len=plan.lengths)
