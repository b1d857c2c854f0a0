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


SCORERS: Dict[str, Callable] = {
    "scienceqa": score_multiple_choice,
    "seed_bench": score_multiple_choice,
    "ai2d": score_multiple_choice,
    "gqa": score_exact_match,
    "textvqa": score_vqa,
    "okvqa": score_vqa,
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
