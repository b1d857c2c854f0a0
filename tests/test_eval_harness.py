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


def _tiny_model(attn_impl="xla"):
    from omchat_tpu.api import OmChatModel
    from omchat_tpu.config import OmChatConfig
    from omchat_tpu.processing.image_processor import OmChatImageProcessor
    from omchat_tpu.processing.processor import OmChatProcessor
    from omchat_tpu.runtime.generate import OmChatEngine
    from tests.conftest import MockTokenizer
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    tok = MockTokenizer()
    engine = OmChatEngine(cfg, params, attn_impl=attn_impl, prompt_bucket=16)
    ip = OmChatImageProcessor(crop_size=56, shortest_edge=56,
                              image_grid_pinpoints=cfg.image_grid_pinpoints)
    return OmChatModel(tok, engine, ip, OmChatProcessor(tok, ip), cfg)


# ---------------------------------------------------------------------------
# Mantis-Eval (multi-image)
# ---------------------------------------------------------------------------


def test_read_mantis_file(tmp_path):
    """Marker prepending + option letter formatting + instruction suffixes."""
    from omchat_tpu.eval.harness import MC_INSTRUCTION, SA_INSTRUCTION, read_mantis_file

    p = tmp_path / "mantis.jsonl"
    p.write_text(
        json.dumps({"id": "m1", "question": "Which is bigger?",
                    "images": ["a.jpg", "b.jpg"],
                    "question_type": "multi-choice",
                    "options": ["the first", "the second"], "answer": "A"}) + "\n"
        + json.dumps({"id": "m2", "question": "<image> then <image>: what changed?",
                      "images": ["c.jpg", "d.jpg"],
                      "question_type": "short-answer", "answer": "the color"}) + "\n"
    )
    samples = read_mantis_file(str(p), image_root="/imgs")
    s0, s1 = samples
    # two markers prepended (question had none), lettered options, MC suffix
    assert s0.text.count("<image>") == 2
    assert "A. the first" in s0.text and "B. the second" in s0.text
    assert s0.text.endswith(MC_INSTRUCTION)
    assert s0.image_paths == ["/imgs/a.jpg", "/imgs/b.jpg"]
    # existing markers kept in place, short-answer suffix
    assert s1.text.count("<image>") == 2
    assert s1.text.startswith("<image> then <image>")
    assert s1.text.endswith(SA_INSTRUCTION)
    assert s1.extra["question_type"] == "short-answer"


def test_score_mantis():
    from omchat_tpu.eval.harness import score_mantis

    answers = {"1": "The answer is B.", "2": "A", "3": "Blue.", "4": "a dog"}
    truths = {
        "1": {"answer": "B", "question_type": "multi-choice"},
        "2": {"answer": "C", "question_type": "multi-choice"},
        "3": {"answer": "blue", "question_type": "short-answer"},
        "4": {"answer": "cat", "question_type": "short-answer"},
    }
    out = score_mantis(answers, truths)
    assert out["multi-choice"] == 0.5
    assert out["short-answer"] == 0.5
    assert out["overall"] == 0.5


def test_mantis_end_to_end(tmp_path):
    """run_eval_mantis drives the tiny model over a 2-question multi-image
    fixture dump and the scorer consumes the answers file."""
    import numpy as np
    from PIL import Image as PILImage

    from omchat_tpu.eval.harness import (
        read_answers_file,
        read_mantis_file,
        run_eval_mantis,
        score_mantis,
    )

    rng = np.random.default_rng(0)
    for name in ("a.png", "b.png", "c.png"):
        PILImage.fromarray(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)).save(
            tmp_path / name
        )
    q = tmp_path / "q.jsonl"
    q.write_text(
        json.dumps({"id": "m1", "question": "Which image is brighter?",
                    "images": ["a.png", "b.png"], "question_type": "multi-choice",
                    "options": ["left", "right"], "answer": "A"}) + "\n"
        + json.dumps({"id": "m2", "question": "<image> What is shown?",
                      "images": ["c.png"], "question_type": "short-answer",
                      "answer": "noise"}) + "\n"
    )
    model = _tiny_model()
    samples = read_mantis_file(str(q), image_root=str(tmp_path))
    answers_file = str(tmp_path / "ans.jsonl")
    run_eval_mantis(model, samples, answers_file, max_new_tokens=4, progress=False)
    answers = read_answers_file(answers_file)
    assert set(answers) == {"m1", "m2"}
    truths = {s.question_id: {"answer": s.answer, **(s.extra or {})} for s in samples}
    out = score_mantis(answers, truths)
    assert 0.0 <= out["overall"] <= 1.0


# ---------------------------------------------------------------------------
# MMBench-Video
# ---------------------------------------------------------------------------


def test_judge_answer_heuristic():
    from omchat_tpu.eval.harness import judge_answer_heuristic

    assert judge_answer_heuristic("A red car.", "red car") == 3  # containment
    assert judge_answer_heuristic("the car was red and moving", "red car") == 2
    assert judge_answer_heuristic("something red", "red car") == 1
    assert judge_answer_heuristic("a blue bike", "red car") == 0


def test_score_mmbench_video_three_level_mean():
    """Level-2 means, L1 = mean of member L2 means, overall = mean of all L2
    means — pinned with explicit external scores (no judge involved)."""
    from omchat_tpu.eval.harness import EvalSample, score_mmbench_video

    samples = [
        EvalSample("1", "q", extra={"l2": "CP"}),
        EvalSample("2", "q", extra={"l2": "CP"}),
        EvalSample("3", "q", extra={"l2": "TR"}),
    ]
    answers = {"1": "x", "2": "y", "3": "z"}
    scores = {"1": 3, "2": 1, "3": 2}
    out = score_mmbench_video(answers, samples, scores)
    assert out["CP"] == 2.0  # (3+1)/2
    assert out["TR"] == 2.0
    assert out["Perception"] == 2.0  # only CP populated
    assert out["Reasoning"] == 2.0  # only TR populated
    assert out["overall"] == 2.0  # mean of L2 means
    assert out["question_mean"] == 2.0  # (3+1+2)/3


def test_score_mmbench_video_unbalanced():
    """Overall is the mean of L2 means, not of raw question scores."""
    from omchat_tpu.eval.harness import EvalSample, score_mmbench_video

    samples = [
        EvalSample("1", "q", extra={"l2": "CP"}),
        EvalSample("2", "q", extra={"l2": "CP"}),
        EvalSample("3", "q", extra={"l2": "CP"}),
        EvalSample("4", "q", extra={"l2": "LR"}),
    ]
    answers = {q: "x" for q in "1234"}
    scores = {"1": 3, "2": 3, "3": 3, "4": 1}
    out = score_mmbench_video(answers, samples, scores)
    assert out["CP"] == 3.0 and out["LR"] == 1.0
    assert out["overall"] == 2.0  # (3+1)/2, while question mean is 2.5
    assert out["question_mean"] == 2.5


def test_mmbench_video_end_to_end(tmp_path):
    """run_eval_video drives the tiny model over a frame-directory video
    fixture (the MMBench-Video 32-frame protocol at 4 frames)."""
    import numpy as np
    from PIL import Image as PILImage

    from omchat_tpu.eval.harness import (
        read_answers_file,
        read_video_question_file,
        run_eval_video,
        score_mmbench_video,
    )

    vdir = tmp_path / "vid1"
    vdir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(6):
        PILImage.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(
            vdir / f"frame_{i:03d}.png"
        )
    q = tmp_path / "vq.jsonl"
    q.write_text(
        json.dumps({"question_id": "v1", "video": "vid1",
                    "question": "What happens in the video?",
                    "answer": "noise", "l2": "TR"}) + "\n"
    )
    model = _tiny_model()
    samples = read_video_question_file(str(q), video_root=str(tmp_path))
    answers_file = str(tmp_path / "vans.jsonl")
    run_eval_video(model, samples, answers_file, num_frames=4, max_new_tokens=4,
                   progress=False)
    answers = read_answers_file(answers_file)
    assert set(answers) == {"v1"}
    out = score_mmbench_video(answers, samples)
    assert "overall" in out and "TR" in out


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


# ---------------------------------------------------------------------------
# COCO caption metrics (BLEU-4 / CIDEr-D)
# ---------------------------------------------------------------------------


def test_bleu4_exact_match():
    from omchat_tpu.eval.harness import score_bleu4

    answers = {"1": "a dog runs across the green field"}
    truths = {"1": ["a dog runs across the green field"]}
    assert abs(score_bleu4(answers, truths) - 1.0) < 1e-9


def test_bleu4_hand_computed():
    """Single-pair corpus, worked by hand:
    cand 'the cat sat on the mat' vs ref 'the cat sat on a mat'
    p1=5/6, p2=3/5, p3=2/4, p4=1/3, BP=1 (equal lengths)
    BLEU-4 = (5/6 * 3/5 * 1/2 * 1/3)^(1/4) ≈ 0.53728."""
    from omchat_tpu.eval.harness import score_bleu4

    got = score_bleu4({"1": "the cat sat on the mat"}, {"1": ["the cat sat on a mat"]})
    assert abs(got - (5 / 6 * 3 / 5 * 0.5 * (1 / 3)) ** 0.25) < 1e-9


def test_bleu4_zero_when_no_4gram_overlap():
    from omchat_tpu.eval.harness import score_bleu4

    assert score_bleu4({"1": "red blue green"}, {"1": ["a dog runs fast today"]}) == 0.0


def test_cider_d_perfect_and_disjoint():
    from omchat_tpu.eval.harness import score_cider_d

    truths = {
        "1": ["a brown dog chases the ball"],
        "2": ["two children ride red bicycles downhill"],
        "3": ["an old boat floats near the rocky shore"],
        "4": ["fresh bread cools on the wooden table"],
    }
    # candidate == reference per image → tf-idf cosine 1 at every n, zero
    # length delta → the metric's ceiling of 10.0 exactly
    perfect = {qid: refs[0] for qid, refs in truths.items()}
    assert abs(score_cider_d(perfect, truths) - 10.0) < 1e-9
    # disjoint vocabulary → zero numerator everywhere
    wrong = {qid: "purple elephants juggle quietly" for qid in truths}
    assert score_cider_d(wrong, truths) < 1e-9


def test_cider_d_idf_downweights_corpus_common_ngrams():
    """An n-gram shared by every image's references carries zero idf, so a
    candidate matching only that phrase scores ~0 while a candidate matching
    the image's distinctive phrase scores high."""
    from omchat_tpu.eval.harness import score_cider_d

    truths = {
        "1": ["in the park a brown dog barks"],
        "2": ["in the park children fly kites"],
        "3": ["in the park an old man reads"],
    }
    common = score_cider_d({"1": "in the park"}, truths)
    distinctive = score_cider_d({"1": "a brown dog barks"}, truths)
    assert distinctive > common * 5


def test_score_coco_captions_registered():
    from omchat_tpu.eval.harness import SCORERS, score_coco_captions

    assert SCORERS["coco_caption"] is score_coco_captions
    out = score_coco_captions({"1": "a cat"}, {"1": ["a cat"]})
    assert set(out) == {"CIDEr-D", "BLEU-4"}


# ---------------------------------------------------------------------------
# MMBench-Video heuristic judge: agreement vs a hand-labeled fixture
# ---------------------------------------------------------------------------

# (model answer, ground truth, human 0-3 label) — labeled by hand following
# the MMBench-Video judge rubric (3 = fully correct/equivalent, 2 = mostly
# correct with minor omission, 1 = partially relevant, 0 = wrong).  The
# fixture is the validation set for judge_answer_heuristic; scores it emits
# are NOT comparable to GPT-judge numbers (README 1.34) — the agreement
# stats below quantify how far off the offline stand-in is.
JUDGE_FIXTURE = [
    ("The man is riding a bicycle.", "riding a bicycle", 3),
    ("He rides a red bicycle down the street.", "riding a bicycle", 3),
    ("A bicycle.", "riding a bicycle", 1),
    ("He is walking his dog.", "riding a bicycle", 0),
    ("Yes.", "yes", 3),
    ("No, it does not.", "yes", 0),
    ("The woman pours coffee into a white mug.", "pouring coffee", 3),
    ("She is drinking tea.", "pouring coffee", 0),
    ("There are three people in the video.", "three people", 3),
    ("I can see several people.", "three people", 1),
    ("Two people.", "three people", 0),
    ("The car is blue.", "blue", 3),
    ("It looks dark blue or maybe navy.", "blue", 2),
    ("The car is red.", "blue", 0),
    ("A chef chopping vegetables in a kitchen.", "chopping vegetables", 3),
    ("Someone is cooking.", "chopping vegetables", 1),
    ("The dog catches the frisbee in mid-air.", "the dog catches a frisbee", 3),
    ("The dog jumps.", "the dog catches a frisbee", 1),
    ("A cat sleeps on the sofa.", "the dog catches a frisbee", 0),
    ("They are playing basketball on an outdoor court.", "playing basketball", 3),
    ("They are playing a sport.", "playing basketball", 1),
    ("They play football.", "playing basketball", 1),
    ("The video shows a sunset over the ocean.", "sunset over the ocean", 3),
    ("It shows the ocean during the day.", "sunset over the ocean", 1),
]


def test_judge_heuristic_agreement_vs_hand_labels():
    """Pin the offline judge's measured agreement with human labels
    (measured: exact 18/24 = 0.75, within-±1 24/24 = 1.00; every miss is a
    rubric-boundary full-recall paraphrase scored 2 vs human 3).  If a judge
    change trips this, re-validate against the fixture rather than loosening
    the bound."""
    from omchat_tpu.eval.harness import judge_answer_heuristic

    exact = within1 = 0
    for ans, truth, human in JUDGE_FIXTURE:
        got = judge_answer_heuristic(ans, truth)
        exact += got == human
        within1 += abs(got - human) <= 1
    n = len(JUDGE_FIXTURE)
    assert exact / n >= 0.70, f"exact agreement {exact}/{n}"
    assert within1 / n >= 0.95, f"±1 agreement {within1}/{n}"


# ---------------------------------------------------------------------------
# Concurrent eval through the paged engine: answers identical to serial
# ---------------------------------------------------------------------------


def test_run_eval_concurrent_matches_serial(tmp_path):
    """run_eval_concurrent (PagedBatchEngine, 3 slots) produces byte-identical
    answer files to the serial run_eval loop — greedy argmax through the same
    kernels, so batching may not change a single token."""
    import numpy as np
    from PIL import Image as PILImage

    from omchat_tpu.eval.harness import (
        EvalSample,
        run_eval,
        run_eval_concurrent,
    )

    rng = np.random.default_rng(3)
    img = tmp_path / "x.png"
    PILImage.fromarray(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)).save(img)
    samples = [
        EvalSample(question_id="1", text="what is shown?", image_path=str(img)),
        EvalSample(question_id="2", text="describe the weather today"),
        EvalSample(question_id="3", text="is this a photo?", image_path=str(img)),
        EvalSample(question_id="4", text="count the objects please"),
        EvalSample(question_id="5", text="name one color"),
    ]
    model = _tiny_model()
    serial = str(tmp_path / "serial.jsonl")
    conc = str(tmp_path / "conc.jsonl")
    run_eval(model, samples, serial, max_new_tokens=6, progress=False)
    run_eval_concurrent(
        model, samples, conc, max_new_tokens=6, progress=False,
        concurrency=3, max_len=512, page_size=64,
    )
    assert open(serial).read() == open(conc).read()


def test_run_eval_concurrent_mantis_matches_serial(tmp_path):
    """Multi-image interleave rides the concurrent path too (mode="mantis")."""
    import numpy as np
    from PIL import Image as PILImage

    from omchat_tpu.eval.harness import (
        read_answers_file,
        read_mantis_file,
        run_eval_concurrent,
        run_eval_mantis,
    )

    rng = np.random.default_rng(0)
    for name in ("a.png", "b.png", "c.png"):
        PILImage.fromarray(rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)).save(
            tmp_path / name
        )
    q = tmp_path / "q.jsonl"
    q.write_text(
        json.dumps({"id": "m1", "question": "Which image is brighter?",
                    "images": ["a.png", "b.png"], "question_type": "multi-choice",
                    "options": ["left", "right"], "answer": "A"}) + "\n"
        + json.dumps({"id": "m2", "question": "<image> What is shown?",
                      "images": ["c.png"], "question_type": "short-answer",
                      "answer": "noise"}) + "\n"
    )
    model = _tiny_model()
    samples = read_mantis_file(str(q), image_root=str(tmp_path))
    serial = str(tmp_path / "serial.jsonl")
    conc = str(tmp_path / "conc.jsonl")
    run_eval_mantis(model, samples, serial, max_new_tokens=4, progress=False)
    run_eval_concurrent(
        model, samples, conc, max_new_tokens=4, progress=False,
        mode="mantis", concurrency=2, max_len=512, page_size=64,
    )
    assert read_answers_file(serial) == read_answers_file(conc)
