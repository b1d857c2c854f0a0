"""One-command checkpoint parity runbook (the BASELINE.json north star).

Runs the torch CPU fp32 reference twin and the JAX engine side by side on the
same prompt/image and prints a JSON report: per-step argmax-match rate, first
divergence, max logit diff, engine-vs-torch greedy tokens; ``--per-module``
adds tower/projector deltas.

    python cli/parity.py --model-path CKPT --image img.jpg --question "What is this?"

The torch side is the checkpoint's own trust_remote_code bundle when present
(the reference contract, /root/reference/single_inference.py:52-62 /
hf_example.py), else the in-repo torch twin loaded with identical weights.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--image", default=None, help="image path (omit for text-only parity)")
    parser.add_argument("--question", default="What is shown in this image?")
    parser.add_argument("--max-new-tokens", type=int, default=32)
    parser.add_argument("--per-module", action="store_true",
                        help="also report tower/projector max deltas")
    parser.add_argument("--attn-impl", default="xla",
                        help="JAX attention impl for the comparison (default xla; "
                        "set pallas to parity-check the TPU kernels)")
    args = parser.parse_args()

    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.eval.parity import load_torch_twin, run_parity

    # fp32 both sides: the truth comparison is CPU fp32 vs CPU/TPU fp32
    model = load_pretrained_model(args.model_path, dtype=jnp.float32, attn_impl=args.attn_impl)
    torch_model, source = load_torch_twin(args.model_path, jax_params=model.engine.params)
    print(f"[parity] torch twin: {source}", file=sys.stderr)

    image = None
    if args.image:
        from PIL import Image

        image = Image.open(args.image).convert("RGB")
    inputs = model.processor(args.question, images=image)
    images = np.asarray(inputs["images"], np.float32) if "images" in inputs else None

    report = run_parity(
        model,
        torch_model,
        inputs["input_ids"][0].tolist(),
        images,
        max_new_tokens=args.max_new_tokens,
        per_module=args.per_module,
    )
    report["torch_twin"] = source
    report["torch_text"] = model.tokenizer.decode(report["torch_tokens"], skip_special_tokens=True)
    report["engine_text"] = model.tokenizer.decode(report["engine_tokens"], skip_special_tokens=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
