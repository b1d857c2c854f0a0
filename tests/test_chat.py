"""Golden-parity tests for ChatML prompt construction and sentinel tokenization."""

import numpy as np
import pytest

from omchat_tpu.constants import IM_END_TOKEN_ID, IM_START_TOKEN_ID, IMAGE_TOKEN_INDEX
from omchat_tpu.processing.chat import (
    image_prompt,
    interleave_image_prompt,
    make_context,
    tokenizer_image_token,
)


def test_tokenizer_image_token_matches_reference(reference_path, mock_tokenizer):
    from omchat.mm_utils import tokenizer_image_token as ref_tit

    prompts = [
        "<image>\nWhat is this?",
        "<image>\npatch:<image>\npatch:<image>\ndescribe",
        "no image here",
        "<image>",
        "a<image>b<image>c",
    ]
    for p in prompts:
        assert tokenizer_image_token(p, mock_tokenizer) == ref_tit(p, mock_tokenizer)


def test_tokenizer_image_token_indexed_form(reference_path, mock_tokenizer):
    from omchat.mm_utils import tokenizer_image_token as ref_tit

    p = "<image_0> then <image_1> end"
    assert tokenizer_image_token(p, mock_tokenizer) == ref_tit(p, mock_tokenizer)


def test_make_context_matches_reference(reference_path, mock_tokenizer):
    from omchat.make_context import make_context as ref_mc

    cases = [
        ("What is this?", None, "You are a helpful assistant."),
        ("<image>\npatch:<image>\nDescribe the image", None, "You are a helpful assistant."),
        ("follow-up", [("hi", "hello!"), ("how are you", "fine")], "sys"),
        ("q", [], ""),
    ]
    for query, history, system in cases:
        ours = make_context(mock_tokenizer, query, history, system)
        ref = ref_mc(mock_tokenizer, query, list(history) if history else None, system)
        assert ours[0] == ref[0]  # raw text
        assert ours[1] == ref[1]  # token ids


def test_make_context_history_budget(reference_path, mock_tokenizer):
    """History is inserted newest-first under the 6144-token budget."""
    from omchat.make_context import make_context as ref_mc

    long_turn = ("x" * 3100, "y" * 3000)  # newest turn ~6.1k byte-tokens: fills the budget
    history = [("old q", "old a"), long_turn]
    ours = make_context(mock_tokenizer, "q", history, "s")
    ref = ref_mc(mock_tokenizer, "q", history, "s")
    assert ours == (ref[0], ref[1])
    # Oldest turn must have been dropped.
    assert "old q" not in ours[0]


def test_make_context_structure(mock_tokenizer):
    raw, toks = make_context(mock_tokenizer, "<image>\nq", None, "sys")
    assert toks[0] == IM_START_TOKEN_ID
    assert toks.count(IMAGE_TOKEN_INDEX) == 1
    assert IM_END_TOKEN_ID in toks
    assert raw.endswith("<|im_start|>assistant\n")


def test_image_prompt_template():
    assert image_prompt("describe", 3) == "<image>\npatch:<image>\npatch:<image>\ndescribe"
    assert image_prompt("q", 1) == "<image>\n\nq"  # n=1: empty patch block, reference-exact


def test_interleave_matches_reference_logic():
    """Multi-image interleave per processing_omchat.py:237-244."""
    text = "first <image> second <image> end"
    out = interleave_image_prompt(text, [2, 3])
    assert out == (
        "first <image>\npatch:<image> second <image>\npatch:<image>\npatch:<image> end"
    )


def test_get_context_text_only(mock_tokenizer):
    from omchat_tpu.processing.chat import get_context

    raw, toks, img = get_context("hello <image> world", mock_tokenizer)
    assert img is None
    assert IMAGE_TOKEN_INDEX not in toks
