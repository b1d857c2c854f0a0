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
