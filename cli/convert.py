"""Checkpoint conversion — the working convert_omchat_to_hf.py equivalent.

Reads a checkpoint in either key layout (repo-native ``model.vision_tower...``
or HF-bundle ``vision_tower...``; reference key map
convert_omchat_to_hf.py:26-35) and writes the canonical HF-bundle layout as
sharded safetensors + config.json.  (int8 quantization happens at load time
via ``load_pretrained_model(quantize_int8=True)`` — quantized tensors are not
round-trippable through the HF key layout.)
"""

import argparse
import os
import sys

# runnable from a checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax.numpy as jnp

from omchat_tpu.checkpoint.loader import load_omchat_checkpoint
from omchat_tpu.checkpoint.save import export_hf_bundle


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="checkpoint dir (either key layout)")
    parser.add_argument("--output", required=True)
    parser.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float16", "float32"])
    args = parser.parse_args()

    dtype = getattr(jnp, args.dtype)
    config, params = load_omchat_checkpoint(args.input, dtype)
    export_hf_bundle(config, params, args.output, source_dir=args.input)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
