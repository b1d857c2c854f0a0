"""Constrained (guided-choice) decoding: trie masking forces generation onto
one of the candidate strings, greedy or sampled."""

import numpy as np
import pytest

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.runtime.constrained import ChoiceTrie, choice_mask_fn
from omchat_tpu.runtime.generate import OmChatEngine


def test_choice_trie():
    trie = ChoiceTrie([[1, 2, 3], [1, 2, 4], [7]])
    assert sorted(trie.allowed([])) == [1, 7]
    assert sorted(trie.allowed([1])) == [2]
    assert sorted(trie.allowed([1, 2])) == [3, 4]
    assert trie.allowed([1, 2, 3]) is None  # complete
    assert trie.allowed([7]) is None
    with pytest.raises(ValueError):
        trie.allowed([9])
    with pytest.raises(ValueError):
        ChoiceTrie([])
    with pytest.raises(ValueError):
        ChoiceTrie([[]])


def test_prefix_choice_stops_at_shorter():
    trie = ChoiceTrie([[5], [5, 6]])  # "a", "ab": first match wins
    assert trie.allowed([5]) is None


@pytest.mark.parametrize("do_sample", [False, True])
def test_guided_generation_lands_on_a_choice(do_sample):
    from tests.conftest import MockTokenizer
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16)
    tok = MockTokenizer()
    choices = ["cat", "wolf"]
    fn = choice_mask_fn(tok, choices)
    out = engine.generate(
        [[5, 6, 7, 8]], None,
        GenerationConfig(max_new_tokens=16, eos_token_id=-1,
                         do_sample=do_sample, temperature=1.0),
        allowed_tokens_fn=fn,
    )
    text = tok.decode(out.token_ids[0])
    assert text in choices  # the random model is FORCED onto a candidate


def test_guided_requires_single_request():
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16)
    with pytest.raises(ValueError):
        engine.generate(
            [[1, 2], [3, 4]], None, GenerationConfig(max_new_tokens=2),
            allowed_tokens_fn=lambda p: [1],
        )


def test_api_chat_guided_choices():
    """OmChatModel.chat(guided_choices=...) returns exactly one candidate."""
    import sys

    sys.path.insert(0, "cli")
    from tests.test_serve import _tiny_model

    model = _tiny_model()
    out = model.chat("Is this a cat or a wolf?", guided_choices=["cat", "wolf"])
    assert out in ("cat", "wolf")
