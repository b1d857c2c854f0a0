"""Continuous-batching serving engine.

Slot-based scheduler over one shared KV cache: requests join a free slot via
incremental (chunked) prefill and leave on EOS/length, while the remaining
slots keep decoding — no global pause, no recompilation (all programs are
fixed-shape in ``max_slots`` / ``chunk_size``).  This is the serving-side
realization of "image encode and token decode overlap for multi-image and
video workloads" (BASELINE.json north star): a joining request's ViT encode +
prefill chunks interleave with other requests' decode steps.

The reference has no serving runtime at all (its gradio stack was stripped;
SURVEY.md §5) and HF ``generate`` is single-request; this is a new capability.

Memory: cache is [L, max_slots, KVH, max_len, D] — slot-contiguous, the layout
the flash-decode kernel streams; per-slot admission cost is zero (no paging
tables).  Weight streaming per decode step amortizes across all active slots
(measured 4.8× aggregate throughput at B=4 on the 13B int8 flagship).
"""

from __future__ import annotations

import functools
import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.models.omchat import fuse_embeddings, plan_multimodal_merge
from omchat_tpu.models.decoder import decoder_forward
from omchat_tpu.models.qwen2 import KVCache, embed_tokens, init_kv_cache, lm_head
from omchat_tpu.ops.sampling import greedy, sample_batch


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"), donate_argnames=("cache",))
def _slot_prefill_chunk_jit(
    params,
    cfg: OmChatConfig,
    slot,
    token_ids,  # [1, chunk]
    is_image,
    image_index,
    image_features,
    positions,
    chunk_start,  # scalar int32
    chunk_len,  # scalar int32
    cache: KVCache,
    attn_impl=None,
    lora_bank=None,
    adapter_ids=None,  # [1] bank index of this request
):
    """Prefill one chunk of one request into its slot of the shared cache."""
    embeds = fuse_embeddings(params, token_ids, is_image, image_index, image_features)
    kc = jax.lax.dynamic_slice_in_dim(cache.k, slot, 1, axis=1)
    vc = jax.lax.dynamic_slice_in_dim(cache.v, slot, 1, axis=1)
    hidden, slot_cache = decoder_forward(
        params["language_model"],
        cfg.text,
        embeds,
        positions,
        KVCache(kc, vc),
        write_pos=jnp.full((1,), chunk_start, jnp.int32),
        kv_len=jnp.full((1,), chunk_start + chunk_len, jnp.int32),
        attn_impl=attn_impl,
        lora_bank=lora_bank,
        adapter_ids=adapter_ids,
    )
    k = jax.lax.dynamic_update_slice_in_dim(cache.k, slot_cache.k, slot, axis=1)
    v = jax.lax.dynamic_update_slice_in_dim(cache.v, slot_cache.v, slot, axis=1)
    idx = jnp.maximum(chunk_len - 1, 0)
    last = jax.lax.dynamic_slice_in_dim(hidden, idx, 1, axis=1)
    logits = lm_head(params["language_model"], cfg.text, last)[:, 0]
    return logits[0], KVCache(k, v)


@functools.partial(
    jax.jit, static_argnames=("cfg", "attn_impl", "any_sampled"), donate_argnames=("cache",)
)
def _batch_decode_step_jit(
    params,
    cfg: OmChatConfig,
    tokens,
    kv_len,
    active,
    cache: KVCache,
    attn_impl=None,
    lora_bank=None,
    adapter_ids=None,  # [max_slots] bank index per slot (inactive rows inert)
    *,
    any_sampled: bool = False,
    rng_key=None,
    do_sample=None,
    temperature=None,
    top_k=None,
    top_p=None,
):
    """One decode step over all slots.  Inactive slots (free / mid-prefill)
    must not corrupt cache content: their write position parks at the last
    cache row (overwritten by a real write before it could ever be read) and
    their outputs are ignored host-side.

    Each slot carries its own request's generation params (per-slot arrays);
    ``any_sampled=False`` compiles the pure-greedy program with no sort in the
    step."""
    max_len = cache.max_len
    wp = jnp.where(active, kv_len, max_len - 1)
    embeds = embed_tokens(params["language_model"], tokens[:, None])
    hidden, cache = decoder_forward(
        params["language_model"],
        cfg.text,
        embeds,
        wp[:, None],
        cache,
        write_pos=wp,
        kv_len=jnp.where(active, kv_len + 1, 1),
        attn_impl=attn_impl,
        lora_bank=lora_bank,
        adapter_ids=adapter_ids,
    )
    logits = lm_head(params["language_model"], cfg.text, hidden)[:, 0]
    if any_sampled:
        next_tokens = sample_batch(logits, rng_key, do_sample, temperature, top_k, top_p)
    else:
        next_tokens = greedy(logits)
    return next_tokens, cache


@dataclass
class _Request:
    request_id: int
    input_ids: List[int]
    image_features: Optional[jax.Array]
    max_new_tokens: int
    eos_token_id: int
    generation: Optional[GenerationConfig] = None
    # runtime state
    slot: Optional[int] = None
    prefill_pos: int = 0
    plan: Optional[object] = None
    generated: List[int] = field(default_factory=list)
    done: bool = False
    last_token: Optional[int] = None
    cancelled: bool = False  # cooperative: swept by the scheduler at tick start
    adapter_id: int = 0  # multi-LoRA bank index (0 = base model)

    @property
    def samples(self) -> bool:
        return self.generation is not None and self.generation.do_sample


class BatchEngine:
    """Continuous batching over a fixed slot pool.

    Usage:
        be = BatchEngine(cfg, params, max_slots=4, max_len=4096)
        rid = be.submit(input_ids, images=tiles)
        while not be.finished(rid):
            be.step()
        tokens = be.result(rid)
    """

    def __init__(
        self,
        cfg: OmChatConfig,
        params: dict,
        *,
        max_slots: int = 4,
        max_len: int = 4096,
        chunk_size: int = 512,
        attn_impl: Optional[str] = None,
        rng_seed: int = 0,
        mesh=None,
        cache_dtype=None,
        image_cache_size: int = 8,
        lora_bank: Optional[dict] = None,
    ):
        """lora_bank: stacked multi-adapter bank (training/lora.py
        ``build_lora_bank``) — requests pick an adapter per
        ``submit(adapter_id=...)`` and a mixed batch decodes each slot under
        its own adapter; id 0 is the base model.

        mesh: optional device mesh — shards the shared KV cache per
        kv_cache_specs (kv heads over `model` when divisible, replicated
        otherwise) so TP serving keeps the cache distributed across chips.

        cache_dtype: KV-cache storage override (e.g. ``jnp.float8_e4m3fn``
        halves the shared cache's HBM; kernels dequantize on load — same
        contract as OmChatEngine/PagedBatchEngine)."""
        self.cfg = cfg
        self.params = params
        self.max_slots = max_slots
        self.max_len = max_len
        # plans bucket to chunk_size; a chunk larger than the cache would make
        # every request "exceed max_len"
        self.chunk_size = min(chunk_size, max_len)
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

        dtype = params["language_model"]["embed_tokens"].dtype
        self.cache = init_kv_cache(cfg.text, max_slots, max_len, dtype=cache_dtype or dtype)
        if mesh is not None:
            from jax.sharding import NamedSharding

            from omchat_tpu.parallel.sharding import kv_cache_specs

            cache_spec = kv_cache_specs(cfg.text, mesh, batch=max_slots)
            self.cache = jax.tree.map(
                lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), self.cache, cache_spec
            )
        self._dtype = dtype
        self._ids = itertools.count()
        self.queue: List[_Request] = []
        self.slots: List[Optional[_Request]] = [None] * max_slots
        self.requests: Dict[int, _Request] = {}
        # per-slot decode state (host mirrors)
        self._tokens = np.zeros(max_slots, np.int32)
        self._lengths = np.zeros(max_slots, np.int32)
        self._key = jax.random.PRNGKey(rng_seed)
        self.lora_bank = lora_bank
        self.n_adapters = 0
        if lora_bank is not None:
            leaf = next(iter(next(iter(lora_bank["layers"].values())).values()))
            self.n_adapters = int(leaf["a"].shape[1]) - 1
        self._adapter_ids = np.zeros(max_slots, np.int32)
        if image_cache_size:
            from omchat_tpu.runtime.feature_cache import ImageFeatureCache

            self.image_cache = ImageFeatureCache(image_cache_size)
        else:
            self.image_cache = None

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- client API ---------------------------------------------------------

    def submit(
        self,
        input_ids: Sequence[int],
        images: Optional[np.ndarray] = None,
        max_new_tokens: int = 256,
        eos_token_id: int = 151645,
        generation: Optional[GenerationConfig] = None,
        image_cache_key: Optional[str] = None,
        adapter_id: int = 0,
    ) -> int:
        """``generation`` carries per-request sampling knobs (temperature /
        top-k / top-p); None or do_sample=False decodes greedily.

        ``image_cache_key``: identity for the encoded-image LRU (e.g. a hash
        of the compressed image bytes); host numpy images are content-hashed
        when no key is given (feature_cache.py).

        ``adapter_id``: multi-LoRA bank index (0 = base); needs a bank."""
        from omchat_tpu.runtime.feature_cache import cached_encode
        from omchat_tpu.runtime.generate import _encode_images_jit

        if not 0 <= adapter_id <= self.n_adapters:
            raise ValueError(f"adapter_id {adapter_id} out of range (bank has {self.n_adapters} adapters)")
        feats = None
        if images is not None:
            feats = cached_encode(
                self.image_cache,
                images,
                image_cache_key,
                lambda pv: _encode_images_jit(self.params, self.cfg, jnp.asarray(pv), self.attn_impl),
            )
        req = _Request(next(self._ids), list(input_ids), feats, max_new_tokens, eos_token_id, generation,
                       adapter_id=adapter_id)
        plan = plan_multimodal_merge([req.input_ids], self.cfg.image_seq_len, bucket=self.chunk_size)
        # prefill writes cover the chunk-padded plan length; decode extends to
        # true_len + max_new — both extents must fit the slot cache
        if max(plan.max_len, int(plan.lengths[0]) + max_new_tokens) > self.max_len:
            raise ValueError("request exceeds max_len")
        req.plan = plan
        self.queue.append(req)
        self.requests[req.request_id] = req
        return req.request_id

    def finished(self, request_id: int) -> bool:
        return self.requests[request_id].done

    def result(self, request_id: int) -> List[int]:
        return list(self.requests[request_id].generated)

    def snapshot(self, request_id: int):
        """Thread-safe progress view: (tokens generated so far, finished).

        The declared cross-thread contract for streaming handlers polling a
        request the scheduler thread is advancing — ``list(...)`` under the
        GIL copies a consistent prefix of the append-only token list; callers
        must not reach into ``engine.requests`` internals."""
        req = self.requests[request_id]
        return list(req.generated), req.done

    def pop_result(self, request_id: int):
        """Return (generated_ids, merged_prompt_len) and evict the request —
        long-running servers must evict or per-request state accumulates."""
        req = self.requests.pop(request_id)
        return list(req.generated), int(req.plan.lengths[0])

    def cancel(self, request_id: int) -> None:
        """Request early termination (client disconnect, stop string hit).
        Safe to call from any thread: only a flag is set here; the scheduler
        thread releases the slot at the start of its next tick."""
        self.requests[request_id].cancelled = True

    def _sweep_cancelled(self):
        for req in list(self.slots):
            if req is not None and req.cancelled and not req.done:
                self._release(req)
        if any(r.cancelled for r in self.queue):
            for req in [r for r in self.queue if r.cancelled]:
                req.done = True
            self.queue = [r for r in self.queue if not r.cancelled]

    def has_work(self) -> bool:
        return bool(self.queue) or any(r is not None for r in self.slots)

    def stats(self) -> dict:
        """Scheduler gauges for observability surfaces (serve.py /metrics)."""
        out = {
            "slots_busy": sum(r is not None for r in self.slots),
            "slots_total": self.max_slots,
            "queue_depth": len(self.queue),
        }
        if self.image_cache is not None:
            out.update({f"image_cache_{k}": v for k, v in self.image_cache.stats().items()})
        return out

    # -- scheduler ----------------------------------------------------------

    def _admit(self):
        for i in range(self.max_slots):
            if self.slots[i] is None and self.queue:
                req = self.queue.pop(0)
                req.slot = i
                req.prefill_pos = 0
                self._adapter_ids[i] = req.adapter_id
                self.slots[i] = req

    def _release(self, req: _Request):
        self.slots[req.slot] = None
        req.slot = None
        req.done = True
        req.image_features = None  # free the projected-feature HBM reference

    def step(self):
        """One scheduler tick: advance at most one prefill chunk for a joining
        request, then one decode step for every slot in decode phase."""
        self._sweep_cancelled()
        self._admit()

        d = self.params["language_model"]["embed_tokens"].shape[1]
        # 1. advance the first slot still prefilling by one chunk
        for req in [r for r in self.slots if r is not None]:
            total = int(req.plan.lengths[0])
            if req.prefill_pos >= total:
                continue
            c0 = req.prefill_pos
            csize = min(self.chunk_size, req.plan.max_len - c0)
            cut = lambda a: jnp.asarray(
                np.pad(a[:, c0 : c0 + csize], ((0, 0), (0, self.chunk_size - csize)))
            )
            feats = req.image_features
            if feats is None:
                feats = jnp.zeros((1, d), self._dtype)
            chunk_len = min(self.chunk_size, total - c0)
            logits, self.cache = _slot_prefill_chunk_jit(
                self.params,
                self.cfg,
                jnp.int32(req.slot),
                cut(req.plan.token_ids),
                cut(req.plan.is_image),
                cut(req.plan.image_index),
                feats,
                cut(req.plan.positions),
                jnp.int32(c0),
                jnp.int32(chunk_len),
                self.cache,
                self.attn_impl,
                lora_bank=self.lora_bank,
                adapter_ids=jnp.full((1,), req.adapter_id, jnp.int32) if self.lora_bank is not None else None,
            )
            req.prefill_pos += chunk_len
            if req.prefill_pos >= total:
                if req.samples:
                    from omchat_tpu.ops.sampling import sample

                    first = int(np.asarray(sample(logits[None], self._next_key(), req.generation))[0])
                else:
                    first = int(np.asarray(greedy(logits[None]))[0])
                req.last_token = first
                self._lengths[req.slot] = total
                if first == req.eos_token_id:
                    self._release(req)
                else:
                    req.generated.append(first)
                    if len(req.generated) >= req.max_new_tokens:
                        self._release(req)
            break  # one chunk per tick bounds decode-latency impact

        # 2. one decode step over slots in decode phase
        decoding = [
            r
            for r in self.slots
            if r is not None and r.prefill_pos >= int(r.plan.lengths[0]) and r.last_token is not None
        ]
        if not decoding:
            return
        for r in decoding:
            self._tokens[r.slot] = r.last_token
        active = np.zeros(self.max_slots, bool)
        for r in decoding:
            active[r.slot] = True
        any_sampled = any(r.samples for r in decoding)
        sample_args = {}
        if any_sampled:
            do_sample = np.zeros(self.max_slots, bool)
            temperature = np.ones(self.max_slots, np.float32)
            top_k = np.zeros(self.max_slots, np.int32)
            top_p = np.ones(self.max_slots, np.float32)
            for r in decoding:
                if r.samples:
                    g = r.generation
                    do_sample[r.slot] = True
                    temperature[r.slot] = g.temperature
                    top_k[r.slot] = g.top_k
                    top_p[r.slot] = g.top_p
            sample_args = dict(
                rng_key=self._next_key(),
                do_sample=jnp.asarray(do_sample),
                temperature=jnp.asarray(temperature),
                top_k=jnp.asarray(top_k),
                top_p=jnp.asarray(top_p),
            )
        next_tokens, self.cache = _batch_decode_step_jit(
            self.params,
            self.cfg,
            jnp.asarray(self._tokens),
            jnp.asarray(self._lengths),
            jnp.asarray(active),
            self.cache,
            self.attn_impl,
            lora_bank=self.lora_bank,
            adapter_ids=jnp.asarray(self._adapter_ids) if self.lora_bank is not None else None,
            any_sampled=any_sampled,
            **sample_args,
        )
        next_np = np.asarray(next_tokens)
        for r in decoding:
            tok = int(next_np[r.slot])
            self._lengths[r.slot] += 1
            r.last_token = tok
            if tok == r.eos_token_id:
                self._release(r)
                continue
            r.generated.append(tok)
            if len(r.generated) >= r.max_new_tokens:
                self._release(r)

    def run_to_completion(self, max_ticks: int = 100000):
        ticks = 0
        while self.has_work() and ticks < max_ticks:
            self.step()
            ticks += 1
        return ticks
