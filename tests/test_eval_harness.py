"""Eval harness scorers + answer-file plumbing."""

import json

from omchat_tpu.eval.harness import (
    extract_choice,
    read_question_file,
    score_exact_match,
    score_multiple_choice,
    score_vqa,
    vqa_accuracy,
)


def test_extract_choice():
    assert extract_choice("The answer is B.") == "B"
    assert extract_choice("(C)") == "C"
    assert extract_choice("maybe") is None


def test_multiple_choice_scoring():
    answers = {"1": "A", "2": "The answer is B", "3": "D."}
    truths = {"1": "A", "2": "B", "3": "C"}
    assert abs(score_multiple_choice(answers, truths) - 2 / 3) < 1e-9


def test_exact_match_scoring():
    answers = {"1": "Yes.", "2": "blue"}
    truths = {"1": "yes", "2": "red"}
    assert score_exact_match(answers, truths) == 0.5


def test_vqa_consensus():
    assert vqa_accuracy("cat", ["cat", "cat", "cat", "dog"]) == 1.0
    assert vqa_accuracy("cat", ["cat", "dog", "bird"]) == 1 / 3
    assert score_vqa({"1": "cat"}, {"1": ["cat"] * 10}) == 1.0


def test_read_question_file(tmp_path):
    p = tmp_path / "q.jsonl"
    p.write_text(
        json.dumps({"question_id": 7, "text": "what?", "image": "a.jpg"})
        + "\n"
        + json.dumps({"question_id": 8, "question": "why?"})
        + "\n"
    )
    samples = read_question_file(str(p), image_root="/imgs")
    assert samples[0].image_path == "/imgs/a.jpg"
    assert samples[1].image_path is None and samples[1].text == "why?"


def test_perplexity_matches_manual(rng):
    """harness.perplexity == exp(mean -log p(next token)) computed manually
    from the trunk's logits (tiny model, xla attention)."""
    import jax.numpy as jnp

    from omchat_tpu.api import OmChatModel
    from omchat_tpu.config import OmChatConfig
    from omchat_tpu.eval.harness import perplexity
    from omchat_tpu.models.qwen2 import embed_tokens, lm_head, qwen2_forward
    from omchat_tpu.processing.image_processor import OmChatImageProcessor
    from omchat_tpu.processing.processor import OmChatProcessor
    from omchat_tpu.runtime.generate import OmChatEngine
    from tests.conftest import MockTokenizer
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    tok = MockTokenizer()
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16)
    ip = OmChatImageProcessor(crop_size=56, shortest_edge=56,
                              image_grid_pinpoints=cfg.image_grid_pinpoints)
    model = OmChatModel(tok, engine, ip, OmChatProcessor(tok, ip), cfg)

    text = "the quick brown fox jumps over the lazy dog"
    out = perplexity(model, text, window=16)  # forces >= 2 windows
    assert out["windows"] >= 2

    # manual: per-window teacher-forced NLL from raw logits
    import numpy as np

    ids = tok.encode(text)
    total, count = 0.0, 0
    for w0 in range(0, len(ids) - 1, 16):
        chunk = ids[w0 : w0 + 17]
        if len(chunk) < 2:
            break
        x = embed_tokens(params["language_model"], jnp.asarray([chunk]))
        pos = jnp.arange(len(chunk))[None]
        h, _ = qwen2_forward(params["language_model"], cfg.text, x, pos, attn_impl="xla")
        logits = np.asarray(lm_head(params["language_model"], cfg.text, h), np.float64)[0]
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        for i in range(len(chunk) - 1):
            total -= logp[i, chunk[i + 1]]
            count += 1
    manual_ppl = float(np.exp(total / count))
    assert out["tokens"] == count
    np.testing.assert_allclose(out["perplexity"], manual_ppl, rtol=2e-2)
