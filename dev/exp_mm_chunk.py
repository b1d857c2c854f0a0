"""Price ONE multimodal paged-prefill chunk dispatch.

The serving profile shows ~176 ms per [1, 2048] multimodal chunk vs a ~130 ms
matmul floor.  This times `_paged_prefill_chunk_jit` directly at the
bench_serving shapes, A/B-ing the chunk attention impl:

- pallas        — gather-to-contiguous + causal flash (the default)
- pallas_paged  — the page-walk grid kernel (pre-round-4 default)

    python dev/exp_mm_chunk.py
"""

import json
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import bench
from omchat_tpu.config import OmChatConfig
from omchat_tpu.runtime.paged_engine import _paged_prefill_chunk_jit

N_REP = 10
PS = 128


def main():
    rng = np.random.default_rng(0)
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    params = bench._synth_params(cfg, rng)
    bench._sync(params["language_model"]["norm"]["scale"])
    tc = cfg.text
    d = tc.hidden_size
    res = {}

    num_pages = 40
    shape = (tc.num_hidden_layers, num_pages + 1, tc.num_key_value_heads, PS, tc.attn_head_dim)
    max_pages = 33  # the engine's table width at max_len 4096 + roll headroom

    feats = jnp.asarray(rng.standard_normal((2048, d)), jnp.bfloat16)
    for impl in ("pallas", "pallas_paged"):
        for b, width, c0 in [(1, 2048, 0), (1, 384, 2048), (2, 2048, 0), (2, 1024, 0)]:
            kp = jnp.zeros(shape, jnp.bfloat16)
            vp = jnp.zeros(shape, jnp.bfloat16)
            tables = np.full((b, max_pages), num_pages, np.int32)
            per = min(num_pages // b, max_pages)
            for i in range(b):
                tables[i, :per] = np.arange(i * per, (i + 1) * per)
            tok = jnp.asarray(rng.integers(2000, 20000, (b, width)), jnp.int32)
            isi = jnp.zeros((b, width), bool).at[:, 4 : 4 + 1024].set(c0 == 0)
            idx = jnp.zeros((b, width), jnp.int32)
            pos = jnp.broadcast_to(jnp.arange(c0, c0 + width)[None], (b, width))

            def run(kp, vp):
                return _paged_prefill_chunk_jit(
                    params, cfg, tok, isi, idx, feats, pos,
                    jnp.full((b,), c0, jnp.int32), jnp.full((b,), width, jnp.int32),
                    jnp.asarray(tables), kp, vp, PS, impl, "dense",
                )

            logits, kp, vp = run(kp, vp)
            bench._sync(logits)
            t0 = time.perf_counter()
            for _ in range(N_REP):
                logits, kp, vp = run(kp, vp)
            bench._sync(logits)
            ms = (time.perf_counter() - t0) / N_REP * 1e3
            key = f"{impl}_B{b}_w{width}_c0_{c0}_ms"
            res[key] = round(ms, 1)
            print(f"[exp] {key}: {ms:.1f}", flush=True)
            del kp, vp

    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
