"""Eval driver — the working eval_q.sh: `python cli/eval.py --benchmark gqa ...`."""

import argparse
import os
import sys

# runnable from a checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

from omchat_tpu.api import load_pretrained_model
from omchat_tpu.eval.harness import SCORERS, read_question_file, run_eval, score


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--perplexity", default=None, metavar="TEXT_FILE",
                        help="teacher-forced perplexity over a UTF-8 text file "
                        "(non-overlapping windows; prints one JSON line and exits)")
    parser.add_argument("--ppl-window", type=int, default=2048)
    parser.add_argument("--benchmark", default=None, choices=sorted(SCORERS))
    parser.add_argument("--question-file", default=None)
    parser.add_argument("--image-folder", default="")
    parser.add_argument("--video-folder", default="",
                        help="root for mmbench_video video paths (frame dirs / GIFs / containers)")
    parser.add_argument("--num-frames", type=int, default=32,
                        help="frames sampled per video (mmbench_video; reference runs 32)")
    parser.add_argument("--scores-file", default=None,
                        help="JSON mapping question_id -> 0-3 score from the official external "
                        "GPT judge, e.g. {\"42\": 3, \"43\": 1} (mmbench_video).  Without it "
                        "the offline heuristic judge scores answers — validated at exact 0.75 / "
                        "±1 1.00 agreement on a hand-labeled fixture (test_eval_harness.py), "
                        "NOT comparable to published GPT-judge numbers")
    parser.add_argument("--concurrency", type=int, default=1,
                        help="N>1 runs greedy generation with N requests in flight through "
                        "the continuous-batching PagedBatchEngine (identical answers to "
                        "serial; incompatible with --guided-mc, whose per-prefix token "
                        "masks are host-side)")
    parser.add_argument("--max-len", type=int, default=8192,
                        help="per-request prompt+generation cap for --concurrency "
                        "(raise for video workloads beyond 8k tokens)")
    parser.add_argument("--answers-file", default=None)
    parser.add_argument("--truths-file", default=None, help="JSON {question_id: answer(s)}")
    parser.add_argument("--max-new-tokens", type=int, default=128)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--w8a8", action="store_true", help="w8a8 serving mode (implies --int8)")
    parser.add_argument("--guided-mc", action="store_true",
                        help="constrain answers to the choice letters A-E via trie-masked decoding (MC protocols only)")
    args = parser.parse_args()

    if args.perplexity is None and not (args.benchmark and args.question_file and args.answers_file):
        parser.error("pass --perplexity TEXT_FILE, or --benchmark + --question-file + --answers-file")

    if args.concurrency > 1 and args.guided_mc:
        parser.error("--concurrency is greedy-only; --guided-mc runs serial by design")

    guided = list("ABCDE") if args.guided_mc else None
    model = load_pretrained_model(args.model_path, quantize_int8=args.int8, w8a8=args.w8a8)
    if args.perplexity is not None:
        from omchat_tpu.eval.harness import perplexity

        with open(args.perplexity) as f:
            text = f.read()
        out = perplexity(model, text, window=args.ppl_window)
        print(json.dumps({"metric": "perplexity", "value": round(out["perplexity"], 4), **out}))
        return
    if args.benchmark == "mantis":
        # multi-image interleave workload (reference README.md:105-107)
        from omchat_tpu.eval.harness import read_answers_file, read_mantis_file, run_eval_mantis, score_mantis

        samples = read_mantis_file(args.question_file, args.image_folder)
        if args.concurrency > 1:
            from omchat_tpu.eval.harness import run_eval_concurrent

            run_eval_concurrent(model, samples, args.answers_file, mode="mantis",
                                max_new_tokens=args.max_new_tokens,
                                concurrency=args.concurrency, max_len=args.max_len)
        else:
            run_eval_mantis(model, samples, args.answers_file,
                            max_new_tokens=args.max_new_tokens, guided_mc=args.guided_mc)
        truths = {s.question_id: {"answer": s.answer, **(s.extra or {})} for s in samples}
        if args.truths_file:
            with open(args.truths_file) as f:
                truths = json.load(f)
        result = score_mantis(read_answers_file(args.answers_file), truths)
        print(json.dumps({"benchmark": "mantis", **result}))
        return

    if args.benchmark == "mmbench_video":
        # 32-frame video workload (reference README.md:187-200)
        from omchat_tpu.eval.harness import (
            read_answers_file,
            read_video_question_file,
            run_eval_video,
            score_mmbench_video,
        )

        samples = read_video_question_file(args.question_file, args.video_folder)
        if args.concurrency > 1:
            from omchat_tpu.eval.harness import run_eval_concurrent

            run_eval_concurrent(model, samples, args.answers_file, mode="video",
                                num_frames=args.num_frames,
                                max_new_tokens=args.max_new_tokens,
                                concurrency=args.concurrency, max_len=args.max_len)
        else:
            run_eval_video(model, samples, args.answers_file,
                           num_frames=args.num_frames, max_new_tokens=args.max_new_tokens)
        scores = None
        if args.scores_file:
            with open(args.scores_file) as f:
                scores = json.load(f)
        result = score_mmbench_video(read_answers_file(args.answers_file), samples, scores)
        print(json.dumps({"benchmark": "mmbench_video", **result}))
        return

    samples = read_question_file(args.question_file, args.image_folder)
    if args.concurrency > 1:
        from omchat_tpu.eval.harness import run_eval_concurrent

        run_eval_concurrent(model, samples, args.answers_file,
                            max_new_tokens=args.max_new_tokens,
                            concurrency=args.concurrency, max_len=args.max_len)
    else:
        run_eval(model, samples, args.answers_file, max_new_tokens=args.max_new_tokens,
                 guided_choices=guided)

    if args.truths_file:
        with open(args.truths_file) as f:
            truths = json.load(f)
        acc = score(args.benchmark, args.answers_file, truths)
        print(json.dumps({"benchmark": args.benchmark, "accuracy": acc}))


if __name__ == "__main__":
    main()
