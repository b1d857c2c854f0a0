"""Same-process A/B: w8a8 LLM prefill with vs without the quant-glue kernels.

Variants (7B geometry, 5248-token prompt, cache-free trunk):
  unfused     — rms_norm + dense(a8) chains (quant_glue_ok monkeypatched off)
  glue        — rmsnorm_quant + attn_proj_glue_quant + prequant SwiGLU (dynamic
                down_proj quantize)
  glue+static — adds calibrated-style static SwiGLU scales so the wide bf16
                intermediate never round-trips HBM (the quantizing epilogue)

    python dev/exp_llm_glue.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dev.profile_llm import S, build_text_params, _sync  # noqa: E402

import omchat_tpu.models.qwen2 as qwen2  # noqa: E402


def time_fwd(cfg, params, x, pos, n=5, label=""):
    fwd = jax.jit(lambda p, xx: qwen2.qwen2_forward(p, cfg, xx, pos, attn_impl=None)[0])
    print(f"[compile] {label}", file=sys.stderr, flush=True)
    out = fwd(params, x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, x)
    _sync(out)
    ms = (time.perf_counter() - t0) / n * 1000
    print(f"[exp] {label}: {ms:.1f} ms", flush=True)
    return ms


def main():
    cfg, params = build_text_params()
    params = dict(params)
    params["norm"] = {"scale": jnp.ones((cfg.hidden_size,), jnp.bfloat16)}
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, S, cfg.hidden_size)) * 0.1,
        dtype=jnp.bfloat16,
    )
    pos = jnp.arange(S)[None, :]

    orig_gate = qwen2.quant_glue_ok
    qwen2.quant_glue_ok = lambda impl: False
    ms_unfused = time_fwd(cfg, params, x, pos, label="unfused")
    qwen2.quant_glue_ok = orig_gate

    ms_glue = time_fwd(cfg, params, x, pos, label="glue (dynamic swiglu)")

    static = dict(params)
    static["layers"] = dict(params["layers"])
    static["layers"]["mlp"] = dict(params["layers"]["mlp"])
    # synthetic static scales (perf-equivalent to calibrated ones)
    static["layers"]["mlp"]["swiglu_out_scale"] = jnp.full(
        (cfg.num_hidden_layers,), 0.02, jnp.float32
    )
    ms_static = time_fwd(cfg, static, x, pos, label="glue + static swiglu epilogue")

    # static scales through the XLA chain (the Pallas grid re-streams x once
    # per N block at bn=512 — N=18944=512*37 has no larger tileable divisor)
    import omchat_tpu.ops.quant_matmul as qm

    orig_sup = qm.pallas_supported
    qm.pallas_supported = lambda k, n: False
    ms_static_xla = time_fwd(cfg, static, x, pos, label="glue + static swiglu (xla)")
    qm.pallas_supported = orig_sup

    qwen2.quant_glue_ok = lambda impl: False
    ms_unfused2 = time_fwd(cfg, params, x, pos, label="unfused recheck")
    qwen2.quant_glue_ok = orig_gate

    print(json.dumps({
        "unfused_ms": round(ms_unfused, 1),
        "glue_ms": round(ms_glue, 1),
        "glue_static_ms": round(ms_static, 1),
        "glue_static_xla_ms": round(ms_static_xla, 1),
        "unfused_recheck_ms": round(ms_unfused2, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
