"""Prompt-lookup speculative decoding — exact greedy, fewer decode steps.

A serving capability beyond the reference (its decode is HF ``generate``'s
one-token-per-step loop, SURVEY.md L0): draft tokens are proposed by matching
the tail n-gram of the sequence against its own earlier content (prompt
lookup — no draft model), then verified in ONE forward over the KV cache.
Greedy outputs are bit-identical to step-by-step decoding; the win is fewer
sequential device round trips on inputs whose continuations echo the prompt
(summarization, extraction, code edits, multi-turn chat).

Cache discipline: the verify forward writes all K+1 candidate entries at
``write_pos = kv_len``; rejected entries are garbage beyond the accepted
length and are simply overwritten by the next step's writes (the cache is
addressed by explicit write_pos / masked by kv_len everywhere).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.models.decoder import decoder_forward
from omchat_tpu.models.qwen2 import KVCache, embed_tokens, lm_head


def propose_draft(token_ids: Sequence[int], ngram: int = 2, k: int = 8) -> List[int]:
    """Propose up to ``k`` draft tokens by matching the trailing ``ngram``
    against the most recent earlier occurrence in ``token_ids``."""
    n = len(token_ids)
    if n <= ngram:
        return []
    tail = tuple(token_ids[-ngram:])
    # scan backwards for the most recent earlier match
    for start in range(n - ngram - 1, -1, -1):
        if tuple(token_ids[start : start + ngram]) == tail:
            cont = token_ids[start + ngram : start + ngram + k]
            return list(cont)
    return []


@functools.partial(jax.jit, static_argnames=("cfg", "attn_impl"), donate_argnames=("cache",))
def _verify_step_jit(params, cfg: OmChatConfig, tokens, write_pos, cache: KVCache, attn_impl=None):
    """Run [B, S] candidate tokens against the cache at ``write_pos`` and
    return greedy next-tokens for every position ([B, S]) plus the cache."""
    b, s = tokens.shape
    embeds = embed_tokens(params["language_model"], tokens)
    positions = write_pos[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]
    hidden, cache = decoder_forward(
        params["language_model"],
        cfg.text,
        embeds,
        positions,
        cache,
        write_pos=write_pos,
        kv_len=write_pos + s,
        attn_impl=attn_impl,
    )
    logits = lm_head(params["language_model"], cfg.text, hidden)  # [B, S, V]
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


def generate_speculative(
    engine,
    input_ids: Sequence[int],
    images: Optional[np.ndarray] = None,
    generation: Optional[GenerationConfig] = None,
    *,
    ngram: int = 2,
    draft_len: int = 8,
    stream_callback=None,
    draft_fn=None,
):
    """Greedy generation with prompt-lookup speculation (single sequence).

    Returns (generated_ids, num_device_steps) — the ids are identical to
    ``engine.generate``'s greedy output; num_device_steps shows the speedup.
    ``stream_callback`` receives each accepted token id (tokens arrive in
    bursts of 1 + n_accepted rather than one per step).
    ``draft_fn(context) -> List[int]`` overrides the prompt-lookup proposer
    (``context`` is prompt + generated so far); used by dev/bench_speculative
    to measure the verify machinery's ceiling with an oracle draft.
    """
    gen = generation or GenerationConfig()
    assert not gen.do_sample, "speculative decoding is greedy-only"

    feats = engine.encode_images(images) if images is not None else None
    plan = engine.plan([input_ids])
    logits, cache = engine.prefill(plan, feats, gen.max_new_tokens + draft_len + 1)

    from omchat_tpu.ops.sampling import greedy

    last = int(np.asarray(greedy(logits))[0])
    kv_len = int(plan.lengths[0])
    # context for lookup: the true (unexpanded) prompt ids + generated so far
    context = [t for t in input_ids if t >= 0]
    generated: List[int] = []
    steps = 0

    if last == gen.eos_token_id:
        return generated, steps
    generated.append(last)
    context.append(last)
    if stream_callback is not None:
        stream_callback(last)

    propose = draft_fn or (lambda ctx: propose_draft(ctx, ngram=ngram, k=draft_len))
    while len(generated) < gen.max_new_tokens:
        draft = propose(context)[:draft_len]
        budget = gen.max_new_tokens - len(generated)
        draft = draft[: max(0, min(len(draft), budget))]
        # fixed [1, 1+draft_len] shape → one compiled verify program; padded
        # positions are never accepted (acceptance is bounded by len(draft))
        padded = [last] + draft + [0] * (draft_len - len(draft))
        tokens = np.asarray([padded], np.int32)
        g, cache = _verify_step_jit(
            engine.params,
            engine.cfg,
            jnp.asarray(tokens),
            jnp.asarray([kv_len], jnp.int32),
            cache,
            engine.attn_impl,
        )
        steps += 1
        g = np.asarray(g)[0]  # greedy continuation after each input position
        # accept the longest draft prefix the model agrees with, then take the
        # model's own next token (the "bonus" token on full acceptance)
        n_acc = 0
        while n_acc < len(draft) and draft[n_acc] == int(g[n_acc]):
            n_acc += 1
        new_tokens = [int(t) for t in draft[:n_acc]] + [int(g[n_acc])]

        done = False
        for t in new_tokens:
            if t == gen.eos_token_id:
                done = True
                break
            generated.append(t)
            context.append(t)
            if stream_callback is not None:
                stream_callback(t)
            if len(generated) >= gen.max_new_tokens:
                done = True
                break
        if done:
            break
        kv_len += 1 + n_acc  # entries actually consumed (last + accepted draft)
        last = generated[-1]
    return generated, steps
