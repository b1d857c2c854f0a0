"""Single-shot image Q&A — behavioral equivalent of the reference's
single_inference.py (same flags, same prompt construction, streamed greedy
decode with eos 151645, max_new_tokens 1024)."""

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
    parser.add_argument("--video-path", type=str, default=None,
                        help="video QA: a container file (imageio), animated GIF/WebP, "
                        "or a directory of frame images; uniform 32-frame sampling")
    parser.add_argument("--video-frames", type=int, default=32,
                        help="frames sampled from --video-path (MMBench-Video uses 32)")
    parser.add_argument("--question", type=str, required=True)
    parser.add_argument("--max-new-tokens", type=int, default=1024)
    parser.add_argument("--int8", action="store_true", help="int8 weight-only quantization")
    parser.add_argument("--w8a8", action="store_true", help="w8a8 serving mode: int8 activations+weights on the MXU for ViT encode and prefill (implies --int8; calibrates static fc1 scales at load)")
    parser.add_argument("--kv-cache-dtype", choices=["bf16", "fp8"], default="bf16",
                        help="KV-cache storage dtype; fp8 (e4m3) halves cache HBM, kernels dequantize on load")
    parser.add_argument("--tp", type=int, default=1, help="tensor-parallel degree")
    parser.add_argument("--speculative", action="store_true",
                        help="prompt-lookup speculative decoding (greedy; identical tokens, fewer device steps on echo-heavy outputs)")
    parser.add_argument("--num-beams", type=int, default=1,
                        help="beam search width (reference single_inference parity; >1 disables streaming)")
    parser.add_argument("--lora", type=str, default=None,
                        help="LoRA adapter directory to merge into the base weights at load")
    args = parser.parse_args()

    import jax.numpy as jnp

    if (args.image_path is None) == (args.video_path is None):
        parser.error("exactly one of --image-path / --video-path is required")

    model = load_pretrained_model(
        args.model_path, quantize_int8=args.int8, w8a8=args.w8a8, tp=args.tp,
        cache_dtype=jnp.float8_e4m3fn if args.kv_cache_dtype == "fp8" else None,
        lora_path=args.lora,
    )

    from omchat_tpu.runtime.generate import make_stdout_streamer

    stream = make_stdout_streamer(model.tokenizer)
    gen = GenerationConfig(max_new_tokens=args.max_new_tokens)

    if args.video_path is not None:
        from omchat_tpu.processing.video import load_video_frames

        frames = load_video_frames(args.video_path, num_samples=args.video_frames)
        model.chat_video(args.question, frames, num_samples=args.video_frames,
                         generation=gen, stream_callback=stream)
    elif args.num_beams > 1:
        image = Image.open(args.image_path).convert("RGB")
        print(model.chat(args.question, image=image, generation=gen,
                         num_beams=args.num_beams), end="")
    else:
        image = Image.open(args.image_path).convert("RGB")
        model.chat(args.question, image=image, generation=gen, stream_callback=stream,
                   speculative=args.speculative)
    print()


if __name__ == "__main__":
    main()
