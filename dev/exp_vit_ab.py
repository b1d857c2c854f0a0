"""Same-process A/B: ViT encode with vs without static fc1 scales.

bench.py round-over-round showed no win from the quantizing fc1 epilogue
(4.46 -> 4.42 img/s across days) while the isolated fc1 chain measures
0.27 ms/layer faster (dev/exp_fc1.py) — settle it under one tunnel session.

    python dev/exp_vit_ab.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from dev.profile_vit import N_TILES, _sync, build_vision_params  # noqa: E402

from omchat_tpu.models.intern_vit import calibrate_fc1_scales, intern_vit_forward  # noqa: E402


def time_encode(cfg, params, pixels, n=10, fc1_impl=None, proj_impl=None):
    fwd = jax.jit(
        lambda p, px: intern_vit_forward(
            p, cfg, px, fc1_impl=fc1_impl, proj_impl=proj_impl
        )
    )
    out = fwd(params, pixels)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(params, pixels)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    rng = np.random.default_rng(0)
    ocfg, params = build_vision_params()
    cfg = ocfg.vision
    d = cfg.hidden_size
    params = dict(params)
    params["patch_embedding"] = {
        "kernel": jnp.asarray(rng.standard_normal((cfg.patch_size, cfg.patch_size, 3, d)) * 0.02, jnp.bfloat16),
        "bias": jnp.zeros((d,), jnp.bfloat16),
    }
    params["class_embedding"] = jnp.zeros((d,), jnp.bfloat16)
    params["position_embedding"] = jnp.asarray(
        rng.standard_normal((cfg.num_patch_tokens + 1, d)) * 0.02, jnp.bfloat16
    )
    pixels = jnp.asarray(rng.standard_normal((N_TILES, 3, 448, 448)), jnp.bfloat16)
    print("[exp] params built", flush=True)

    ms_dyn = time_encode(cfg, params, pixels, proj_impl="xla")
    print(f"[exp] dynamic glue: {ms_dyn:.1f} ms", flush=True)

    calib = calibrate_fc1_scales(params, cfg, pixels)
    ms_static = time_encode(cfg, calib, pixels, fc1_impl="xla", proj_impl="xla")
    print(f"[exp] static fc1 epilogue (xla chain): {ms_static:.1f} ms", flush=True)

    ms_pallas = time_encode(cfg, calib, pixels, fc1_impl="pallas", proj_impl="xla")
    print(f"[exp] static fc1 epilogue (pallas kernel): {ms_pallas:.1f} ms", flush=True)

    ms_projglue = time_encode(cfg, calib, pixels, fc1_impl="pallas", proj_impl="pallas")
    print(f"[exp] + fused proj glue kernel: {ms_projglue:.1f} ms", flush=True)

    ms_dyn2 = time_encode(cfg, params, pixels, proj_impl="xla")  # bound drift
    print(f"[exp] dynamic again: {ms_dyn2:.1f} ms", flush=True)

    print(json.dumps({
        "dynamic_ms": round(ms_dyn, 1),
        "static_xla_ms": round(ms_static, 1),
        "static_pallas_ms": round(ms_pallas, 1),
        "proj_glue_ms": round(ms_projglue, 1),
        "dynamic_recheck_ms": round(ms_dyn2, 1),
        "img_per_s_best": round(1000.0 / min(ms_pallas, ms_projglue), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
