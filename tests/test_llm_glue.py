"""w8a8 LLM prefill quantization-glue tests.

The glue fast path (models/qwen2.py _decoder_layer_glue) replaces the unfused
norm/quantize/matmul chains with fused Pallas kernels: rmsnorm_quant,
attn_proj_glue_quant (o_proj rides the residual/norm/quantize pass) and — with
calibrated static scales — the quantizing SwiGLU epilogue.  These tests pin
the per-kernel contracts and the end-to-end trunk parity on CPU (interpret
mode; the same kernels compile on TPU).
"""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from omchat_tpu.config import TextConfig
from omchat_tpu.models.qwen2 import (
    calibrate_swiglu_scales,
    init_params,
    qwen2_forward,
)
from omchat_tpu.ops.linear import quantize_activations, quantize_tree


def _glue_cfg(**kw):
    # hidden 256 -> o_proj 256x256 exercises the fused proj+glue branch
    base = dict(
        vocab_size=128,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
        w8a8=True,
    )
    base.update(kw)
    return TextConfig(**base)


def _quantized(cfg, seed=0):
    # bf16 params: fp32 biases would promote the unfused path's bf16 carry
    params = init_params(jax.random.PRNGKey(seed), cfg, dtype=jnp.bfloat16)
    return {
        "layers": quantize_tree(params["layers"]),
        **{k: v for k, v in params.items() if k != "layers"},
    }


def test_rmsnorm_quant_matches_unfused():
    from omchat_tpu.ops.norms import rms_norm, rmsnorm_quant

    rng = np.random.default_rng(3)
    B, S, D = 2, 21, 256  # rows 42: pads to the 128 block
    x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.bfloat16)
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D), jnp.bfloat16)

    codes, rs = rmsnorm_quant(x, gamma, eps=1e-6, interpret=True)
    codes_ref, rs_ref = quantize_activations(rms_norm(x, gamma, 1e-6))

    assert codes.shape == x.shape and codes.dtype == jnp.int8
    dq = np.abs(np.asarray(codes, np.int32) - np.asarray(codes_ref, np.int32))
    assert dq.max() <= 1 and (dq == 0).mean() > 0.9
    np.testing.assert_allclose(np.asarray(rs), np.asarray(rs_ref), rtol=1e-2)


def test_swiglu_quant_pallas_matches_xla_chain():
    from omchat_tpu.ops.linear import dense_prequant_swiglu_quant
    from omchat_tpu.ops.quant_matmul import dense_prequant_swiglu_quant_pallas

    rng = np.random.default_rng(4)
    M, K, N = 24, 256, 384  # M pads
    xq = jnp.asarray(rng.integers(-127, 128, (2, M, K)), jnp.int8)
    rs = jnp.asarray(rng.random((2, M, 1)) * 0.01 + 1e-3, jnp.float32)

    def p(seed):
        r = np.random.default_rng(seed)
        return {
            "kernel_q": jnp.asarray(r.integers(-127, 128, (K, N)), jnp.int8),
            "scale": jnp.asarray(r.random(N) * 4e-4 + 1e-4, jnp.bfloat16),
        }

    gate_p, up_p = p(5), p(6)
    out_scale = jnp.float32(0.01)
    ref = dense_prequant_swiglu_quant(xq, rs, gate_p, up_p, out_scale)
    got = dense_prequant_swiglu_quant_pallas(xq, rs, gate_p, up_p, out_scale, interpret=True)
    assert got.shape == ref.shape and got.dtype == jnp.int8
    diff = np.abs(np.asarray(ref, np.int32) - np.asarray(got, np.int32))
    assert diff.max() <= 1, f"codes diverge by {diff.max()}"


def test_qwen2_glue_trunk_matches_unfused_w8a8():
    """attn_impl=None engages the glue fast path (quant_glue_ok); the hidden
    states must track the unfused w8a8 trunk (attn_impl='xla') within
    quantization noise."""
    rng = np.random.default_rng(5)
    cfg = _glue_cfg()
    params = _quantized(cfg)
    B, S = 2, 19
    embeds = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)) * 0.1, jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))

    ref, _ = qwen2_forward(params, cfg, embeds, pos, attn_impl="xla")
    out, _ = qwen2_forward(params, cfg, embeds, pos, attn_impl=None)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(out - ref).max() / denom < 2e-2


def test_qwen2_glue_nonsquare_oproj_fallback():
    """head_dim * heads != hidden would make o_proj non-square — with a
    rectangular o_proj the glue path must fall back to the unfused proj +
    rmsnorm_quant branch and still match."""
    rng = np.random.default_rng(6)
    cfg = _glue_cfg(head_dim=192)  # o_proj [384, 256]
    params = _quantized(cfg, seed=1)
    B, S = 1, 9
    embeds = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)) * 0.1, jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))

    ref, _ = qwen2_forward(params, cfg, embeds, pos, attn_impl="xla")
    out, _ = qwen2_forward(params, cfg, embeds, pos, attn_impl=None)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6) < 2e-2


def test_calibrate_swiglu_scales_and_static_path():
    """Calibration records per-layer SwiGLU amax; the static-scale epilogue
    path stays within quantization noise of the dynamic glue path."""
    rng = np.random.default_rng(7)
    cfg = _glue_cfg()
    params = _quantized(cfg)
    B, S = 2, 16
    embeds = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)) * 0.1, jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))

    calib = calibrate_swiglu_scales(params, cfg, embeds, pos)
    scales = calib["layers"]["mlp"]["swiglu_out_scale"]
    assert scales.shape == (cfg.num_hidden_layers,)
    assert np.all(np.asarray(scales) > 0)

    ref, _ = qwen2_forward(params, cfg, embeds, pos, attn_impl=None)
    out, _ = qwen2_forward(calib, cfg, embeds, pos, attn_impl=None)
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    assert np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6) < 3e-2


def test_glue_decode_step_unchanged():
    """The glue gate requires s > 1: a single-token decode step must take the
    weight-only path bit-for-bit (same output with and without quant_glue)."""
    from omchat_tpu.models.qwen2 import init_kv_cache

    rng = np.random.default_rng(8)
    cfg = _glue_cfg()
    params = _quantized(cfg)
    cache = init_kv_cache(cfg, 1, 16)
    embeds = jnp.asarray(rng.standard_normal((1, 1, cfg.hidden_size)) * 0.1, jnp.bfloat16)
    pos = jnp.asarray([[0]])

    a, _ = qwen2_forward(params, cfg, embeds, pos, cache, 0, jnp.asarray([1]), attn_impl="xla")
    b, _ = qwen2_forward(params, cfg, embeds, pos, cache, 0, jnp.asarray([1]), attn_impl=None)
    np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))
