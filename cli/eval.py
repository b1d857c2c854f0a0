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

    guided = list("ABCDE") if args.guided_mc else None
    model = load_pretrained_model(args.model_path, quantize_int8=args.int8, w8a8=args.w8a8)
    if args.perplexity is not None:
        from omchat_tpu.eval.harness import perplexity

        with open(args.perplexity) as f:
            text = f.read()
        out = perplexity(model, text, window=args.ppl_window)
        print(json.dumps({"metric": "perplexity", "value": round(out["perplexity"], 4), **out}))
        return
    samples = read_question_file(args.question_file, args.image_folder)
    run_eval(model, samples, args.answers_file, max_new_tokens=args.max_new_tokens,
             guided_choices=guided)

    if args.truths_file:
        with open(args.truths_file) as f:
            truths = json.load(f)
        acc = score(args.benchmark, args.answers_file, truths)
        print(json.dumps({"benchmark": args.benchmark, "accuracy": acc}))


if __name__ == "__main__":
    main()
