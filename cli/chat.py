"""Interactive multi-turn chat — behavioral equivalent of the reference's
cli.py REPL, with one fix the reference documents but does not wire up:
history is actually threaded through ``make_context`` (the reference passes
None each turn, cli.py:55; SURVEY.md §3.2).  ``--no-history`` restores the
reference-exact per-turn-independent behavior."""

import argparse
import os
import sys

# runnable from a checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image

from omchat_tpu.api import load_pretrained_model
from omchat_tpu.config import GenerationConfig


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--image-path", type=str, default=None)
    parser.add_argument("--max-new-tokens", type=int, default=1024)
    parser.add_argument("--no-history", action="store_true", help="reference-exact: drop history each turn")
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--w8a8", action="store_true", help="w8a8 serving mode: int8 activations+weights on the MXU for ViT encode and prefill (implies --int8; calibrates static fc1 scales at load)")
    parser.add_argument("--kv-cache-dtype", choices=["bf16", "fp8"], default="bf16",
                        help="KV-cache storage dtype; fp8 (e4m3) halves cache HBM, kernels dequantize on load")
    parser.add_argument("--tp", type=int, default=1, help="tensor-parallel degree")
    parser.add_argument("--speculative", action="store_true",
                        help="prompt-lookup speculative decoding (greedy; pays off in multi-turn chat where replies echo context)")
    parser.add_argument("--lora", type=str, default=None,
                        help="LoRA adapter directory to merge into the base weights at load")
    args = parser.parse_args()

    import jax.numpy as jnp

    model = load_pretrained_model(
        args.model_path, quantize_int8=args.int8, w8a8=args.w8a8, tp=args.tp,
        cache_dtype=jnp.float8_e4m3fn if args.kv_cache_dtype == "fp8" else None,
        lora_path=args.lora,
    )
    image = Image.open(args.image_path).convert("RGB") if args.image_path else None
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens)

    history = []
    print("omchat-tpu chat — empty line to exit")
    while True:
        try:
            question = input("user: ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if not question:
            break

        from omchat_tpu.runtime.generate import make_stdout_streamer

        stream = make_stdout_streamer(model.tokenizer)

        print("assistant: ", end="", flush=True)
        answer = model.chat(
            question,
            image=image,
            history=None if args.no_history else list(history),
            generation=gen,
            stream_callback=stream,
            speculative=args.speculative,
        )
        print()
        history.append((question, answer))


if __name__ == "__main__":
    main()
