"""Qwen2 prefill ablation profiler (7B geometry, w8a8, 5188-token prompt).

Attributes the prefill wall-clock between MXU matmuls, causal flash attention,
RoPE, norms, and the silu/quantize elementwise passes.

    python dev/profile_llm.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omchat_tpu.config import OmChatConfig
from omchat_tpu.ops.attention import attention
from omchat_tpu.ops.linear import dense
from omchat_tpu.ops.norms import rms_norm
from omchat_tpu.ops.rope import apply_rope, rope_cos_sin

S = 5248  # prompt bucket for the 5-tile config


def _sync(x):
    return float(jnp.ravel(x)[0])


def build_text_params():
    cfg = OmChatConfig.omchat_v2_13b().with_w8a8().text
    l, d, f = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    h, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.attn_head_dim
    salt = iter(range(1, 256))

    @functools.partial(jax.jit, static_argnames=("shape", "dtype"))
    def _hash_fill(s, shape, dtype):
        hv = jnp.uint32(2166136261) * jnp.uint32(s)
        for axis in range(len(shape)):
            hv = hv ^ (jax.lax.broadcasted_iota(jnp.uint32, shape, axis) * jnp.uint32(16777619 + axis * 101))
            hv = hv * jnp.uint32(2654435761)
        if dtype == jnp.int8:
            return (hv % jnp.uint32(255)).astype(jnp.int32).astype(jnp.int8) - 127
        return ((hv % jnp.uint32(2048)).astype(jnp.float32) / 1024.0 - 1.0).astype(dtype)

    def lin(i, o, bias=False):
        p = {"kernel_q": _hash_fill(next(salt), (l, i, o), jnp.int8),
             "scale": jnp.full((l, o), 0.02 / 127, jnp.bfloat16)}
        if bias:
            p["bias"] = jnp.zeros((l, o), jnp.bfloat16)
        return p

    params = {
        "layers": {
            "input_layernorm": {"scale": jnp.ones((l, d), jnp.bfloat16)},
            "post_attention_layernorm": {"scale": jnp.ones((l, d), jnp.bfloat16)},
            "self_attn": {
                "q_proj": lin(d, h * hd, bias=True),
                "k_proj": lin(d, kvh * hd, bias=True),
                "v_proj": lin(d, kvh * hd, bias=True),
                "o_proj": lin(h * hd, d),
            },
            "mlp": {
                "gate_proj": lin(d, f),
                "up_proj": lin(d, f),
                "down_proj": lin(f, d),
            },
        },
    }
    _sync(params["layers"]["input_layernorm"]["scale"])
    return cfg, params


def layer_fwd(cfg, cos, sin, x, layer, *, norms=True, rope=True, attn=True,
              silu=True, a8=True):
    b, s, d = x.shape
    h, kvh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.attn_head_dim
    p = layer["self_attn"]

    y = rms_norm(x, layer["input_layernorm"]["scale"], cfg.rms_norm_eps) if norms else x
    q = dense(y, p["q_proj"], a8=a8).reshape(b, s, h, hd)
    k = dense(y, p["k_proj"], a8=a8).reshape(b, s, kvh, hd)
    v = dense(y, p["v_proj"], a8=a8).reshape(b, s, kvh, hd)
    if rope:
        q, k = apply_rope(q, k, cos, sin)
    if attn:
        out = attention(q, k, v, causal=True, impl="pallas")
    else:
        out = q
    out = dense(out.reshape(b, s, h * hd), p["o_proj"], a8=a8)
    x = x + out

    y = rms_norm(x, layer["post_attention_layernorm"]["scale"], cfg.rms_norm_eps) if norms else x
    g = dense(y, layer["mlp"]["gate_proj"], a8=a8)
    u = dense(y, layer["mlp"]["up_proj"], a8=a8)
    y = (jax.nn.silu(g) if silu else g) * u
    y = dense(y, layer["mlp"]["down_proj"], a8=a8)
    return x + y


def stack_fwd(cfg, params, x, **kw):
    pos = jnp.arange(S)[None, :]
    cos, sin = rope_cos_sin(pos, cfg.attn_head_dim, theta=cfg.rope_theta,
                            scaling=cfg.rope_scaling,
                            max_position_embeddings=cfg.max_position_embeddings,
                            dtype=x.dtype)
    body = functools.partial(layer_fwd, cfg, cos, sin, **kw)

    def scan_body(carry, layer):
        return body(carry, layer), None

    x, _ = jax.lax.scan(scan_body, x, params["layers"])
    return x


def time_variant(name, fn, params, x, n=5):
    print(f"[compile] {name}", file=sys.stderr, flush=True)
    f = jax.jit(fn)
    out = f(params, x)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(params, x)
    _sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    cfg, params = build_text_params()
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, S, cfg.hidden_size)), dtype=jnp.bfloat16
    )
    variants = [
        ("full", dict()),
        ("no-attention", dict(attn=False)),
        ("no-rope", dict(rope=False)),
        ("no-norms", dict(norms=False)),
        ("no-silu", dict(silu=False)),
        ("matmuls-only", dict(attn=False, rope=False, norms=False, silu=False)),
        ("bf16 wenabled... skip", None),
    ]
    results = {}
    for name, kw in variants:
        if kw is None:
            continue
        results[name] = time_variant(name, lambda p, x, kw=kw: stack_fwd(cfg, p, x, **kw), params, x)
    full = results["full"]
    print()
    print(f"attention cost:  {full - results['no-attention']:.1f} ms")
    print(f"rope cost:       {full - results['no-rope']:.1f} ms")
    print(f"norms cost:      {full - results['no-norms']:.1f} ms")
    print(f"silu cost:       {full - results['no-silu']:.1f} ms")
    print(f"matmul floor:    {results['matmuls-only']:.1f} ms")


if __name__ == "__main__":
    main()
