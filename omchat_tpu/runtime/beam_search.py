"""Beam-search decoding.

The reference's beam machinery (``BeamHypotheses``,
multimodal_encoder/utils.py:756-913, dead) and HF ``generate(num_beams=...)``
equivalent, recast for the static-cache engine: beams ride the batch dimension
of one shared KV cache, each step re-gathers the cache rows of surviving beams
(length-penalized, eos-finalized)."""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.models.qwen2 import KVCache
from omchat_tpu.runtime.generate import OmChatEngine, _decode_step_jit


@dataclass
class BeamHypotheses:
    """Running best-finished-hypotheses pool (length-penalized)."""

    num_beams: int
    length_penalty: float = 1.0
    beams: List[Tuple[float, List[int]]] = None

    def __post_init__(self):
        self.beams = []

    def add(self, tokens: List[int], sum_logprob: float):
        score = sum_logprob / (max(len(tokens), 1) ** self.length_penalty)
        self.beams.append((score, tokens))
        self.beams.sort(key=lambda x: -x[0])
        del self.beams[self.num_beams :]

    def worst_score(self) -> float:
        return self.beams[-1][0] if len(self.beams) >= self.num_beams else -1e18

    def is_done(self, best_possible: float) -> bool:
        return len(self.beams) >= self.num_beams and best_possible <= self.worst_score()


@functools.partial(jax.jit, donate_argnames=("cache",))
def _gather_beams(cache: KVCache, parent: jax.Array) -> KVCache:
    """Reorder the cache batch dim to surviving beams' parents."""
    return KVCache(k=cache.k[:, parent], v=cache.v[:, parent])


def beam_search(
    engine: OmChatEngine,
    input_ids: Sequence[int],
    images: Optional[np.ndarray] = None,
    *,
    num_beams: int = 4,
    max_new_tokens: int = 128,
    eos_token_id: int = 151645,
    length_penalty: float = 1.0,
) -> List[int]:
    """Beam-search one prompt; returns the best hypothesis' generated ids."""
    feats = engine.encode_images(images) if images is not None else None
    # replicate the prompt over the beam dimension (prefill once per beam —
    # simple and correct; a broadcast prefill is a later optimization)
    plan = engine.plan([list(input_ids)] * num_beams)
    logits, cache = engine.prefill(plan, None if feats is None else jnp.tile(feats, (num_beams, 1)), max_new_tokens)

    # plan replicated the prompt, so image features repeat per beam: rebuild
    # image_index offsets are already global per-sentinel; tiling feats matches.
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    vocab = logprobs.shape[-1]

    # beam state
    beam_scores = np.full(num_beams, -1e18, np.float64)
    beam_scores[0] = 0.0  # all beams start identical; keep one alive
    beam_tokens: List[List[int]] = [[] for _ in range(num_beams)]
    hyps = BeamHypotheses(num_beams, length_penalty)
    kv_len = jnp.asarray(plan.lengths)

    lp = np.asarray(logprobs)
    for step in range(max_new_tokens):
        total = beam_scores[:, None] + lp  # [beams, V]
        flat = total.reshape(-1)
        # 2*num_beams candidates so eos picks don't starve the frontier
        top = np.argpartition(-flat, 2 * num_beams)[: 2 * num_beams]
        top = top[np.argsort(-flat[top])]

        next_parents, next_tokens, next_scores = [], [], []
        for cand in top:
            parent, tok = divmod(int(cand), vocab)
            score = float(flat[cand])
            if tok == eos_token_id:
                hyps.add(list(beam_tokens[parent]), score)
            else:
                next_parents.append(parent)
                next_tokens.append(tok)
                next_scores.append(score)
            if len(next_parents) == num_beams:
                break

        best_possible = float(np.max(next_scores)) / (max(step + 1, 1) ** length_penalty)
        if hyps.is_done(best_possible) or not next_parents or step == max_new_tokens - 1:
            for parent, tok, score in zip(next_parents, next_tokens, next_scores):
                hyps.add(beam_tokens[parent] + [tok], score)
            break

        beam_tokens = [beam_tokens[p] + [t] for p, t in zip(next_parents, next_tokens)]
        beam_scores = np.asarray(next_scores)

        cache = _gather_beams(cache, jnp.asarray(next_parents, jnp.int32))
        step_logits, cache = _decode_step_jit(
            engine.params, engine.cfg, jnp.asarray(next_tokens, jnp.int32), kv_len, cache, engine.attn_impl
        )
        kv_len = kv_len + 1
        lp = np.asarray(jax.nn.log_softmax(step_logits.astype(jnp.float32), axis=-1))

    return hyps.beams[0][1] if hyps.beams else beam_tokens[0]
