"""Chunked prefill == one-shot prefill (logits and subsequent decode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.constants import IMAGE_TOKEN_INDEX
from omchat_tpu.runtime.generate import OmChatEngine, _decode_step_jit
from omchat_tpu.ops.sampling import greedy


def test_chunked_prefill_matches_oneshot(rng):
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)

    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    ids = [5, 6, IMAGE_TOKEN_INDEX] + list(range(10, 40))  # 16 img tokens + 32 text

    feats = engine.encode_images(pixels)
    plan = engine.plan([ids])

    ref_logits, ref_cache = engine.prefill(plan, feats, max_new_tokens=8)
    chk_logits, chk_cache = engine.prefill_chunked(plan, feats, max_new_tokens=8, chunk_size=16)

    np.testing.assert_allclose(np.asarray(chk_logits), np.asarray(ref_logits), atol=2e-5, rtol=1e-4)

    # Decode continues identically from either cache.
    tok = greedy(ref_logits)
    kv = jnp.asarray(plan.lengths)
    l1, _ = _decode_step_jit(params, cfg, tok, kv, ref_cache, "xla")
    l2, _ = _decode_step_jit(params, cfg, tok, kv, chk_cache, "xla")
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), atol=2e-5, rtol=1e-4)


def test_chunked_prefill_batch_varied_lengths(rng):
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)

    a = list(range(10, 22))  # len 12
    b = list(range(30, 65))  # len 35
    plan = engine.plan([a, b])
    ref_logits, _ = engine.prefill(plan, None, max_new_tokens=8)
    chk_logits, _ = engine.prefill_chunked(plan, None, max_new_tokens=8, chunk_size=16)
    np.testing.assert_allclose(np.asarray(chk_logits), np.asarray(ref_logits), atol=2e-5, rtol=1e-4)


def test_chunked_prefill_nonmultiple_cache(rng):
    """Regression: the padded final chunk's write must not clamp backward and
    corrupt earlier cache rows (found when cache_len < round_up(M, chunk))."""
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)

    ids = list(range(10, 50))  # merged len 40
    plan = engine.plan([ids])
    ref_logits, _ = engine.prefill(plan, None, max_new_tokens=8)
    # chunk 32: second chunk pads to [32, 64) while 40+8 only needs 48 rows
    chk_logits, _ = engine.prefill_chunked(plan, None, max_new_tokens=8, chunk_size=32)
    np.testing.assert_allclose(np.asarray(chk_logits), np.asarray(ref_logits), atol=2e-5, rtol=1e-4)
