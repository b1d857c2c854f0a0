"""ViT encode ablation profiler (13B geometry, w8a8, 5 tiles).

Times intern_vit_forward variants with individual components disabled to
attribute the encode wall-clock between MXU matmuls, attention, and the
elementwise/HBM passes.  Run on the real TPU chip:

    python dev/profile_vit.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omchat_tpu.config import OmChatConfig
from omchat_tpu.ops.linear import dense
from omchat_tpu.ops.norms import apply_norm, rms_norm
from omchat_tpu.ops.flash_attention import packed_self_attention

N_TILES = 5


def _sync(x):
    return float(jnp.ravel(x)[0])


def build_vision_params():
    """Vision tower only (~5.6GB int8) — don't allocate the 8GB LLM."""
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8()
    v = cfg.vision
    lv, d, f = v.num_hidden_layers, v.hidden_size, v.intermediate_size
    salt = iter(range(1, 256))

    @functools.partial(jax.jit, static_argnames=("shape", "dtype"))
    def _hash_fill(s, shape, dtype):
        h = jnp.uint32(2166136261) * jnp.uint32(s)
        for axis in range(len(shape)):
            h = h ^ (jax.lax.broadcasted_iota(jnp.uint32, shape, axis) * jnp.uint32(16777619 + axis * 101))
            h = h * jnp.uint32(2654435761)
        if dtype == jnp.int8:
            return (h % jnp.uint32(255)).astype(jnp.int32).astype(jnp.int8) - 127
        return ((h % jnp.uint32(2048)).astype(jnp.float32) / 1024.0 - 1.0).astype(dtype)

    def lin(i, o, bias=True):
        p = {"kernel_q": _hash_fill(next(salt), (lv, i, o), jnp.int8),
             "scale": jnp.full((lv, o), 0.02 / 127, jnp.bfloat16)}
        if bias:
            p["bias"] = jnp.zeros((lv, o), jnp.bfloat16)
        return p

    vp = {
        "layers": {
            "norm1": {"scale": jnp.ones((lv, d), jnp.bfloat16)},
            "norm2": {"scale": jnp.ones((lv, d), jnp.bfloat16)},
            "ls1": jnp.full((lv, d), 0.1, jnp.bfloat16),
            "ls2": jnp.full((lv, d), 0.1, jnp.bfloat16),
            "attn": {
                "qkv": lin(d, 3 * d, bias=v.qkv_bias),
                "proj": lin(d, d),
                "q_norm": {"scale": jnp.ones((lv, d), jnp.bfloat16)},
                "k_norm": {"scale": jnp.ones((lv, d), jnp.bfloat16)},
            },
            "mlp": {"fc1": lin(d, f), "fc2": lin(f, d)},
        },
    }
    _sync(vp["layers"]["ls1"])
    return cfg, vp


def layer_fwd(cfg, x, layer, *, norms=True, qknorm=True, attn=True, mlp=True,
              proj=True, gelu=True, ls=True):
    v = cfg.vision
    h = v.num_attention_heads
    a8 = v.w8a8
    s_valid = 1025

    y = apply_norm(x, layer["norm1"], v.layer_norm_eps) if norms else x
    qkv = dense(y, layer["attn"]["qkv"], a8=a8)
    q, k, vv = jnp.split(qkv, 3, axis=-1)
    if qknorm and v.qk_normalization:
        q = rms_norm(q, layer["attn"]["q_norm"]["scale"], v.layer_norm_eps)
        k = rms_norm(k, layer["attn"]["k_norm"]["scale"], v.layer_norm_eps)
    if attn:
        attn_out = packed_self_attention(q, k, vv, num_heads=h, valid_len=s_valid)
    else:
        attn_out = q
    if proj:
        attn_out = dense(attn_out, layer["attn"]["proj"], a8=a8)
    x = x + attn_out * layer["ls1"] if ls else x + attn_out

    if mlp:
        y = apply_norm(x, layer["norm2"], v.layer_norm_eps) if norms else x
        y = dense(y, layer["mlp"]["fc1"], a8=a8)
        if gelu:
            y = jax.nn.gelu(y, approximate=False)
        y = dense(y, layer["mlp"]["fc2"], a8=a8)
        x = x + y * layer["ls2"] if ls else x + y
    return x


def stack_fwd(cfg, params, x, **kw):
    body = functools.partial(layer_fwd, cfg, **kw)

    def scan_body(carry, layer):
        return body(carry, layer), None

    x, _ = jax.lax.scan(scan_body, x, params["layers"])
    return x


def time_variant(name, fn, params, x, n=8):
    print(f"[compile] {name}", file=sys.stderr, flush=True)
    f = jax.jit(fn)
    out = f(params, x)
    _sync(out)  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(params, x)
    _sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    cfg, vp = build_vision_params()
    sp = 1032
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((N_TILES, sp, cfg.vision.hidden_size)),
        dtype=jnp.bfloat16,
    )

    if "--model" in sys.argv:
        # Time the real intern_vit layer stack (glue path) vs the ablation
        # skeleton.  Uses the same pre-embedded x (skips patchify/pos-embed).
        from omchat_tpu.models.intern_vit import _layer_forward_glue
        from omchat_tpu.ops.linear import quantize_activations
        from omchat_tpu.ops.norms import rms_norm

        def model_fwd(p, x):
            layers = dict(p["layers"])
            layers["next_norm1_scale"] = jnp.roll(layers["norm1"]["scale"], -1, axis=0)
            y = rms_norm(x, layers["norm1"]["scale"][0], cfg.vision.layer_norm_eps)
            xq, rs = quantize_activations(y)

            def body(carry, layer):
                return _layer_forward_glue(cfg.vision, carry, layer, valid_len=1025), None

            (x, _, _), _ = jax.lax.scan(body, (x, xq, rs), layers)
            return x

        time_variant("glue-path model stack", model_fwd, vp, x)
        time_variant("full (ablation skeleton)", lambda p, x: stack_fwd(cfg, p, x), vp, x)
        return

    variants = [
        ("full", dict()),
        ("no-qknorm", dict(qknorm=False)),
        ("no-attention (qkv->q passthrough)", dict(attn=False)),
        ("no-attn no-qknorm", dict(attn=False, qknorm=False)),
        ("no-norms", dict(norms=False)),
        ("no-gelu", dict(gelu=False)),
        ("no-layerscale", dict(ls=False)),
        ("matmuls-only", dict(norms=False, qknorm=False, attn=False, gelu=False, ls=False)),
        ("no-mlp", dict(mlp=False)),
    ]
    results = {}
    for name, kw in variants:
        results[name] = time_variant(
            name, lambda p, x, kw=kw: stack_fwd(cfg, p, x, **kw), vp, x
        )

    full = results["full"]
    print()
    print(f"attention+qknorm cost:   {full - results['no-attn no-qknorm']:.1f} ms")
    print(f"  qknorm alone:          {full - results['no-qknorm']:.1f} ms")
    print(f"  attention alone:       {full - results['no-attention (qkv->q passthrough)']:.1f} ms")
    print(f"norms cost:              {full - results['no-norms']:.1f} ms")
    print(f"gelu cost:               {full - results['no-gelu']:.1f} ms")
    print(f"layerscale cost:         {full - results['no-layerscale']:.1f} ms")
    print(f"mlp (fc1+gelu+fc2+res):  {full - results['no-mlp']:.1f} ms")
    print(f"matmuls-only floor:      {results['matmuls-only']:.1f} ms")


if __name__ == "__main__":
    main()
