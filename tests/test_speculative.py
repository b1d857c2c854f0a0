"""Prompt-lookup speculative decoding: exact greedy equivalence + step savings."""

import numpy as np

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.runtime.generate import OmChatEngine
from omchat_tpu.runtime.speculative import generate_speculative, propose_draft


def test_propose_draft_matches_recent_ngram():
    ids = [1, 2, 3, 9, 9, 1, 2, 3, 7, 8, 5, 1, 2, 3]
    # tail (2,3) last occurred at index 6..7 -> continuation 7, 8, 5, 1, ...
    assert propose_draft(ids, ngram=2, k=3) == [7, 8, 5]
    assert propose_draft([1, 2], ngram=3) == []
    assert propose_draft([4, 5, 6, 7], ngram=2) == []  # no earlier match


def test_speculative_greedy_equivalence(rng):
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)
    gen = GenerationConfig(max_new_tokens=12, eos_token_id=-1)

    for ids in ([5, 6, 7, 8, 9, 10], [3, 4, 3, 4, 3, 4, 3], list(range(20, 35))):
        ref = engine.generate([ids], None, gen).token_ids[0]
        out, steps = generate_speculative(engine, ids, None, gen, ngram=2, draft_len=4)
        assert out == ref, (ids, out, ref)
        assert steps >= 1


def test_speculative_saves_steps_on_repetitive_output(rng):
    """When the model's greedy output repeats content present in the context,
    verification accepts multi-token drafts — fewer device steps than tokens."""
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)
    gen = GenerationConfig(max_new_tokens=10, eos_token_id=-1)

    base = engine.generate([[5, 6, 7]], None, gen).token_ids[0]
    # craft a prompt whose continuation the model will (greedily) repeat:
    # prompt = [5,6,7] + first greedy tokens + [5,6,7] again — the tail n-gram
    # then matches the earlier region and drafts the already-seen continuation.
    ids = [5, 6, 7] + base[:6] + [5, 6, 7]
    ref = engine.generate([ids], None, gen).token_ids[0]
    out, steps = generate_speculative(engine, ids, None, gen, ngram=3, draft_len=4)
    assert out == ref
    if out[:6] == base[:6]:  # the model did echo -> speculation must have won
        assert steps < len(out)


def test_speculative_stream_callback_order(rng):
    """stream_callback receives exactly the accepted tokens, in order."""
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)
    gen = GenerationConfig(max_new_tokens=8, eos_token_id=-1)

    streamed = []
    out, _ = generate_speculative(
        engine, [3, 4, 3, 4, 3], None, gen, ngram=2, draft_len=4,
        stream_callback=streamed.append,
    )
    assert streamed == out
