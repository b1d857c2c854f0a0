"""Benchmark-eval harness — the working replacement for the reference's
``eval_q.sh`` (it drives ``omchat.eval.{scienceqa,textvqa,gqa,seed_bench,ai2d,
okvqa}`` modules that were never shipped; SURVEY.md §4).

Each workload is an (eval → score) pair over a local dataset dump, exactly the
shape eval_q.sh scripts expect: a JSONL of questions with image paths, model
answers written to JSONL, then a scorer.  Dataset files are the common public
dump formats (LLaVA-style ``question_file`` JSONL).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass
from typing import Callable, Dict, Iterable, List, Optional

from PIL import Image


@dataclass
class EvalSample:
    question_id: str
    text: str
    image_path: Optional[str] = None
    answer: Optional[str] = None  # ground truth (scorers may use other fields)
    extra: Optional[dict] = None
    image_paths: Optional[List[str]] = None  # multi-image (Mantis-Eval)
    video_path: Optional[str] = None  # video (MMBench-Video)


def read_question_file(path: str, image_root: str = "") -> List[EvalSample]:
    """LLaVA-style JSONL: {question_id, text, image, ...}."""
    samples = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            img = d.get("image")
            samples.append(
                EvalSample(
                    question_id=str(d.get("question_id", len(samples))),
                    text=d.get("text") or d.get("question") or "",
                    image_path=os.path.join(image_root, img) if img else None,
                    answer=d.get("answer"),
                    extra=d,
                )
            )
    return samples


def run_eval(
    model,
    samples: Iterable[EvalSample],
    answers_file: str,
    *,
    max_new_tokens: int = 128,
    progress: bool = True,
    guided_choices: Optional[List[str]] = None,
) -> None:
    """Generate an answer per sample and write the answers JSONL.

    ``model`` is an :class:`omchat_tpu.api.OmChatModel`.

    ``guided_choices`` constrains every answer to one of the given strings
    (trie-masked decoding) — for MC protocols this removes the free-form
    letter-extraction failure mode entirely."""
    from omchat_tpu.config import GenerationConfig

    gen = GenerationConfig(max_new_tokens=max_new_tokens)
    os.makedirs(os.path.dirname(os.path.abspath(answers_file)), exist_ok=True)
    with open(answers_file, "w") as out:
        for i, s in enumerate(samples):
            image = Image.open(s.image_path).convert("RGB") if s.image_path else None
            answer = model.chat(s.text, image=image, generation=gen, guided_choices=guided_choices)
            out.write(json.dumps({"question_id": s.question_id, "text": answer}) + "\n")
            if progress and i % 20 == 0:
                print(f"[eval] {i} done", flush=True)


def perplexity(model, text: str, *, window: int = 2048) -> dict:
    """Teacher-forced perplexity of ``text`` under the loaded model.

    Non-overlapping windows of ``window`` tokens (the simple protocol; each
    window conditions only on itself, so the number is slightly pessimistic
    vs a sliding window — stated in the result).  Reuses the training loss
    path (train_step.loss_fn), so w8a8/int8-quantized params evaluate
    through the same kernels they serve with.

    Returns {"perplexity", "nll", "tokens", "windows", "protocol"}.
    """
    import jax.numpy as jnp
    import numpy as np

    from omchat_tpu.constants import IGNORE_INDEX
    from omchat_tpu.models.omchat import plan_multimodal_merge
    from omchat_tpu.training.train_step import loss_fn

    ids = model.tokenizer.encode(text)
    if len(ids) < 2:
        raise ValueError("need at least 2 tokens for perplexity")
    engine = model.engine
    total_nll, total_tokens, windows = 0.0, 0, 0
    for w0 in range(0, len(ids) - 1, window):
        chunk = ids[w0 : w0 + window + 1]
        if len(chunk) < 2:
            break
        plan = plan_multimodal_merge([chunk], model.config.image_seq_len, bucket=128)
        labels = np.full_like(plan.token_ids, IGNORE_INDEX)
        n = len(chunk)
        # loss_fn shifts labels left internally; expose every next-token
        # target except the window's first token (unconditioned)
        labels[0, 1:n] = plan.token_ids[0, 1:n]
        batch = {
            "token_ids": jnp.asarray(plan.token_ids),
            "is_image": jnp.asarray(plan.is_image),
            "image_index": jnp.asarray(plan.image_index),
            "positions": jnp.asarray(plan.positions),
            "labels": jnp.asarray(labels),
        }
        loss, n_valid = loss_fn(
            engine.params, model.config, batch, attn_impl=engine.attn_impl, remat=False
        )
        total_nll += float(loss) * int(n_valid)
        total_tokens += int(n_valid)
        windows += 1
    nll = total_nll / max(1, total_tokens)
    import math

    return {
        "perplexity": math.exp(nll),
        "nll": nll,
        "tokens": total_tokens,
        "windows": windows,
        "protocol": f"non-overlapping {window}-token windows, teacher-forced",
    }


# ---------------------------------------------------------------------------
# Scorers (answer-matching protocols of the eval_q.sh workloads)
# ---------------------------------------------------------------------------


def _norm(s: str) -> str:
    return re.sub(r"[^a-z0-9 ]", "", s.lower()).strip()


def extract_choice(answer: str) -> Optional[str]:
    """Pull a multiple-choice letter (A-E) out of a free-form answer."""
    m = re.search(r"\b([A-E])\b", answer.strip().upper())
    return m.group(1) if m else None


def score_multiple_choice(answers: Dict[str, str], truths: Dict[str, str]) -> float:
    """ScienceQA / SEED-Bench / AI2D protocol: exact choice-letter match."""
    correct = sum(
        1 for qid, ans in answers.items() if extract_choice(ans) == str(truths.get(qid, "")).upper()
    )
    return correct / max(len(answers), 1)


def score_exact_match(answers: Dict[str, str], truths: Dict[str, str]) -> float:
    """GQA protocol: normalized exact match."""
    correct = sum(1 for qid, ans in answers.items() if _norm(ans) == _norm(str(truths.get(qid, ""))))
    return correct / max(len(answers), 1)


def vqa_accuracy(answer: str, gt_answers: List[str]) -> float:
    """VQA-v2 consensus metric (TextVQA / OKVQA): min(#matches/3, 1)."""
    a = _norm(answer)
    matches = sum(1 for gt in gt_answers if _norm(gt) == a)
    return min(matches / 3.0, 1.0)


def score_vqa(answers: Dict[str, str], truths: Dict[str, List[str]]) -> float:
    scores = [vqa_accuracy(ans, truths.get(qid, [])) for qid, ans in answers.items()]
    return sum(scores) / max(len(scores), 1)


# ---------------------------------------------------------------------------
# Mantis-Eval (multi-image interleave) — the reference's headline multi-image
# benchmark (/root/reference/README.md:105-107; OmChat-2.1-8B scores 67.28).
# ---------------------------------------------------------------------------

MC_INSTRUCTION = "Answer with the option's letter from the given choices directly."
SA_INSTRUCTION = "Answer the question using a single word or phrase."


def read_mantis_file(path: str, image_root: str = "") -> List[EvalSample]:
    """Mantis-Eval local dump (one JSON object per line, the TIGER-Lab/
    Mantis-Eval record shape): ``{question_id, question, images: [paths],
    question_type: "multi-choice"|"short-answer", options: [...], answer}``.

    ``question`` may carry explicit ``<image>`` interleave markers; when it
    has fewer markers than images, the missing ones are prepended (the
    standard Mantis harness behavior)."""
    from omchat_tpu.constants import DEFAULT_IMAGE_TOKEN

    samples = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            q = d.get("question") or d.get("text") or ""
            imgs = d.get("images") or ([d["image"]] if d.get("image") else [])
            missing = len(imgs) - q.count(DEFAULT_IMAGE_TOKEN)
            if missing > 0:
                q = "\n".join([DEFAULT_IMAGE_TOKEN] * missing + [q])
            qtype = d.get("question_type", "multi-choice")
            options = d.get("options") or []
            if qtype.startswith("multi") and options:
                # options may already carry "A. ..." prefixes; add when absent
                lines = [
                    o if re.match(r"^\s*\(?[A-E][.):]", o) else f"{chr(65 + i)}. {o}"
                    for i, o in enumerate(options)
                ]
                q = q + "\n" + "\n".join(lines) + "\n" + MC_INSTRUCTION
            elif not qtype.startswith("multi"):
                q = q + "\n" + SA_INSTRUCTION
            samples.append(
                EvalSample(
                    question_id=str(d.get("question_id", d.get("id", len(samples)))),
                    text=q,
                    image_paths=[os.path.join(image_root, p) for p in imgs],
                    answer=str(d.get("answer", "")),
                    extra={"question_type": qtype},
                )
            )
    return samples


def run_eval_mantis(
    model,
    samples: Iterable[EvalSample],
    answers_file: str,
    *,
    max_new_tokens: int = 64,
    progress: bool = True,
    guided_mc: bool = False,
) -> None:
    """Multi-image interleaved generation per Mantis-Eval sample.

    Each sample's images feed the anyres processor; the prompt interleaves
    per-image tile expansions at the ``<image>`` markers
    (processing/chat.py::interleave_image_prompt).  ``guided_mc`` constrains
    multi-choice answers to the option letters via trie-masked decoding."""
    from omchat_tpu.config import GenerationConfig

    gen = GenerationConfig(max_new_tokens=max_new_tokens)
    os.makedirs(os.path.dirname(os.path.abspath(answers_file)), exist_ok=True)
    with open(answers_file, "w") as out:
        for i, s in enumerate(samples):
            images = [Image.open(p).convert("RGB") for p in (s.image_paths or [])]
            qtype = (s.extra or {}).get("question_type", "multi-choice")
            guided = list("ABCDE") if (guided_mc and qtype.startswith("multi")) else None
            answer = model.chat(s.text, image=images or None, generation=gen,
                                guided_choices=guided)
            out.write(json.dumps({"question_id": s.question_id, "text": answer,
                                  "question_type": qtype}) + "\n")
            if progress and i % 20 == 0:
                print(f"[mantis] {i} done", flush=True)


def score_mantis(answers: Dict[str, str], truths: Dict[str, dict]) -> Dict[str, float]:
    """Mantis-Eval accuracy: choice-letter match for multi-choice questions,
    normalized exact match for short-answer.  ``truths[qid]`` is
    ``{"answer": str, "question_type": str}``.  Returns overall + per-type."""
    per_type: Dict[str, List[float]] = {"multi-choice": [], "short-answer": []}
    for qid, ans in answers.items():
        t = truths.get(qid)
        if t is None:
            continue
        qtype = "multi-choice" if t.get("question_type", "").startswith("multi") else "short-answer"
        if qtype == "multi-choice":
            ok = extract_choice(ans) == str(t["answer"]).strip().upper()
        else:
            ok = _norm(ans) == _norm(str(t["answer"]))
        per_type[qtype].append(1.0 if ok else 0.0)
    scored = [v for vs in per_type.values() for v in vs]
    out = {"overall": sum(scored) / max(len(scored), 1)}
    for k, vs in per_type.items():
        if vs:
            out[k] = sum(vs) / len(vs)
    return out


# ---------------------------------------------------------------------------
# MMBench-Video (32-frame video QA) — the reference's headline video benchmark
# (/root/reference/README.md:187-200; OmChat-2.1-8B overall mean 1.34 @ 32f).
# ---------------------------------------------------------------------------

# L2 capability dimensions → L1 groups, exactly the README table's columns
# (Perception: CP, FP-S, FP-C, HL; Reasoning: LR, AR, RR, CSR, TR).
MMBENCH_VIDEO_L1: Dict[str, str] = {
    "CP": "Perception", "FP-S": "Perception", "FP-C": "Perception", "HL": "Perception",
    "LR": "Reasoning", "AR": "Reasoning", "RR": "Reasoning", "CSR": "Reasoning",
    "TR": "Reasoning",
}


def read_video_question_file(path: str, video_root: str = "") -> List[EvalSample]:
    """MMBench-Video local dump JSONL: ``{question_id, video, question,
    answer, dimensions: ["<L3 name>", ...], l2: "CP"|...}``.  ``video`` is a
    path readable by processing/video.py::load_video_frames (frame directory,
    animated image, or container)."""
    samples = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            samples.append(
                EvalSample(
                    question_id=str(d.get("question_id", d.get("index", len(samples)))),
                    text=d.get("question") or d.get("text") or "",
                    video_path=os.path.join(video_root, d["video"]) if d.get("video") else None,
                    answer=str(d.get("answer", "")),
                    extra={"dimensions": d.get("dimensions") or [], "l2": d.get("l2")},
                )
            )
    return samples


def run_eval_video(
    model,
    samples: Iterable[EvalSample],
    answers_file: str,
    *,
    num_frames: int = 32,
    max_new_tokens: int = 128,
    progress: bool = True,
) -> None:
    """MMBench-Video generation: uniform ``num_frames`` sampling per video
    (the reference's 32-frame configuration), one ViT tile + sentinel per
    frame through OmChatModel.chat_video."""
    from omchat_tpu.config import GenerationConfig
    from omchat_tpu.processing.video import load_video_frames

    gen = GenerationConfig(max_new_tokens=max_new_tokens)
    os.makedirs(os.path.dirname(os.path.abspath(answers_file)), exist_ok=True)
    with open(answers_file, "w") as out:
        for i, s in enumerate(samples):
            frames = load_video_frames(s.video_path, num_samples=num_frames)
            answer = model.chat_video(s.text, frames, num_samples=num_frames, generation=gen)
            out.write(json.dumps({"question_id": s.question_id, "text": answer}) + "\n")
            if progress and i % 5 == 0:
                print(f"[mmbench_video] {i} done", flush=True)


def judge_answer_heuristic(answer: str, truth: str) -> int:
    """Offline 0-3 judge standing in for MMBench-Video's GPT judge (this
    environment has no egress).  Content-word recall against the ground
    truth: 3 = exact/containment match, 2 = full recall, 1 = ≥half recall,
    0 otherwise.  For official numbers pass GPT-judge scores via
    ``score_mmbench_video(..., scores=...)`` instead."""
    a, t = _norm(answer), _norm(truth)
    if not t:
        return 0
    if a == t or (len(t) > 3 and t in a):
        return 3
    words = [w for w in t.split() if len(w) > 2]
    if not words:
        return 3 if t in a.split() else 0
    recall = sum(1 for w in words if w in a) / len(words)
    if recall >= 1.0:
        return 2
    if recall >= 0.5:
        return 1
    return 0


def score_mmbench_video(
    answers: Dict[str, str],
    samples: List[EvalSample],
    scores: Optional[Dict[str, float]] = None,
) -> Dict[str, float]:
    """The MMBench-Video 3-level mean protocol over 0-3 question scores:

    1. per-question score (external GPT-judge ``scores`` if given, else the
       offline heuristic judge),
    2. mean per L2 capability dimension (CP/FP-S/FP-C/HL/LR/AR/RR/CSR/TR),
    3. L1 means (Perception, Reasoning) as the mean of their member L2 means,
       and the overall mean as the mean of all L2 means — the README table's
       column structure (README.md:187-200).

    Questions without an L2 tag contribute only to a flat ``question_mean``.
    Returns {"overall", "Perception", "Reasoning", <each L2>, "question_mean"}.
    """
    by_qid = {s.question_id: s for s in samples}
    q_scores: List[float] = []
    l2_scores: Dict[str, List[float]] = {}
    for qid, ans in answers.items():
        s = by_qid.get(qid)
        if s is None:
            continue
        val = float(scores[qid]) if scores and qid in scores else float(
            judge_answer_heuristic(ans, s.answer or "")
        )
        q_scores.append(val)
        l2 = (s.extra or {}).get("l2")
        if l2 in MMBENCH_VIDEO_L1:
            l2_scores.setdefault(l2, []).append(val)
    out: Dict[str, float] = {"question_mean": sum(q_scores) / max(len(q_scores), 1)}
    l1_members: Dict[str, List[float]] = {"Perception": [], "Reasoning": []}
    for l2, vals in sorted(l2_scores.items()):
        mean = sum(vals) / len(vals)
        out[l2] = mean
        l1_members[MMBENCH_VIDEO_L1[l2]].append(mean)
    for l1, means in l1_members.items():
        if means:
            out[l1] = sum(means) / len(means)
    all_l2 = [out[k] for k in l2_scores]
    out["overall"] = sum(all_l2) / len(all_l2) if all_l2 else out["question_mean"]
    return out


SCORERS: Dict[str, Callable] = {
    "scienceqa": score_multiple_choice,
    "seed_bench": score_multiple_choice,
    "ai2d": score_multiple_choice,
    "gqa": score_exact_match,
    "textvqa": score_vqa,
    "okvqa": score_vqa,
    "mantis": score_mantis,
    "mmbench_video": score_mmbench_video,
}


def read_answers_file(path: str) -> Dict[str, str]:
    out = {}
    with open(path) as f:
        for line in f:
            if line.strip():
                d = json.loads(line)
                out[str(d["question_id"])] = d["text"]
    return out


def score(benchmark: str, answers_file: str, truths: Dict) -> float:
    return SCORERS[benchmark](read_answers_file(answers_file), truths)
