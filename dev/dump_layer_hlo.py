"""Dump the optimized HLO of one w8a8 ViT layer (13B geometry) to inspect
which elementwise passes XLA fuses and what intermediates hit HBM."""

import functools
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omchat_tpu.config import OmChatConfig
from omchat_tpu.models.intern_vit import _layer_forward


def main():
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8().vision
    d, f = cfg.hidden_size, cfg.intermediate_size
    sp = 1032
    layer = {
        "norm1": {"scale": jnp.ones((d,), jnp.bfloat16)},
        "norm2": {"scale": jnp.ones((d,), jnp.bfloat16)},
        "ls1": jnp.full((d,), 0.1, jnp.bfloat16),
        "ls2": jnp.full((d,), 0.1, jnp.bfloat16),
        "attn": {
            "qkv": {"kernel_q": jnp.ones((d, 3 * d), jnp.int8), "scale": jnp.ones((3 * d,), jnp.bfloat16),
                    "bias": jnp.zeros((3 * d,), jnp.bfloat16)},
            "proj": {"kernel_q": jnp.ones((d, d), jnp.int8), "scale": jnp.ones((d,), jnp.bfloat16),
                     "bias": jnp.zeros((d,), jnp.bfloat16)},
            "q_norm": {"scale": jnp.ones((d,), jnp.bfloat16)},
            "k_norm": {"scale": jnp.ones((d,), jnp.bfloat16)},
        },
        "mlp": {
            "fc1": {"kernel_q": jnp.ones((d, f), jnp.int8), "scale": jnp.ones((f,), jnp.bfloat16),
                    "bias": jnp.zeros((f,), jnp.bfloat16)},
            "fc2": {"kernel_q": jnp.ones((f, d), jnp.int8), "scale": jnp.ones((d,), jnp.bfloat16),
                    "bias": jnp.zeros((d,), jnp.bfloat16)},
        },
    }
    x = jnp.zeros((5, sp, d), jnp.bfloat16)
    fn = functools.partial(_layer_forward, cfg, attn_impl="pallas", fused_valid_len=1025)
    lowered = jax.jit(lambda x, layer: fn(x, layer)).lower(x, layer)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/layer_hlo.txt", "w") as fh:
        fh.write(txt)

    # Summarize: every op that produces a large buffer.
    big = []
    for line in txt.splitlines():
        m = re.match(r"\s*(%?[\w.\-]+) = (\w+)\[([\d,]*)\]", line.strip())
        if not m:
            continue
        name, dt, dims = m.groups()
        if not dims:
            continue
        shape = [int(s) for s in dims.split(",") if s]
        bytes_ = int(np.prod(shape)) * {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s8": 1, "u8": 1, "pred": 1}.get(dt, 4)
        if bytes_ >= 8 * 1024 * 1024:
            op = line.strip().split("=", 1)[1].strip()[:140]
            big.append((bytes_, name, op))
    print(f"ops producing >=8MB buffers: {len(big)}")
    for b, name, op in big:
        print(f"{b / 1e6:8.1f}MB  {name:30s} {op}")
    mems = [l for l in txt.splitlines() if "Allocation" in l or "allocation" in l][:5]
    print("\n".join(mems))
    print("full HLO at /tmp/layer_hlo.txt, ", len(txt.splitlines()), "lines")


if __name__ == "__main__":
    main()
