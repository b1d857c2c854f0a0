"""int8 weight-only quantization tests."""

import numpy as np

import jax
import jax.numpy as jnp

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.ops.linear import dense, quantize_linear, quantize_tree
from omchat_tpu.runtime.generate import OmChatEngine


def test_quantize_linear_roundtrip(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    p = {"kernel": jnp.asarray(w), "bias": jnp.zeros((32,), jnp.float32)}
    q = quantize_linear(p)
    assert q["kernel_q"].dtype == jnp.int8
    x = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32))
    y_ref = np.asarray(dense(x, p))
    y_q = np.asarray(dense(x, q))
    # int8 per-channel: relative error well under 2%
    rel = np.abs(y_q - y_ref).max() / (np.abs(y_ref).max() + 1e-6)
    assert rel < 0.02


def test_quantize_stacked_per_layer_scales(rng):
    w = rng.standard_normal((3, 16, 8)).astype(np.float32)
    w[1] *= 100.0  # layer 1 has much larger weights
    q = quantize_linear({"kernel": jnp.asarray(w)})
    assert q["kernel_q"].shape == (3, 16, 8)
    assert q["scale"].shape == (3, 8)


def test_quantized_generation_argmax_stable(rng):
    """Greedy decode with int8 weights should match fp32 on a tiny model
    (argmax stability, not bitwise logits)."""
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    qparams = quantize_tree(params)
    # conv patchify must stay unquantized
    assert "kernel" in qparams["vision_tower"]["patch_embedding"]
    assert "kernel_q" in qparams["language_model"]["layers"]["mlp"]["gate_proj"]

    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
    ids = [5, 6, 7, 8, 9]
    ref = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8).generate([ids], None, gen)
    out = OmChatEngine(cfg, qparams, attn_impl="xla", prompt_bucket=8).generate([ids], None, gen)
    # tiny random models are logit-fragile; require the first token to agree
    assert out.token_ids[0][0] == ref.token_ids[0][0]


def test_w8a8_dense_close_to_dequant(rng):
    """Dynamic-activation int8 matmul tracks the weight-only path within the
    expected quantization error (per-token row scales ⊗ per-channel col
    scales)."""
    w = rng.standard_normal((128, 64)).astype(np.float32)
    p = quantize_linear({"kernel": jnp.asarray(w), "bias": jnp.asarray(rng.standard_normal(64, ).astype(np.float32))})
    x = jnp.asarray(rng.standard_normal((16, 128)).astype(np.float32))
    y_ref = np.asarray(dense(x, {"kernel": jnp.asarray(w), "bias": p["bias"]}))
    y_a8 = np.asarray(dense(x, p, a8=True))
    rel = np.abs(y_a8 - y_ref).max() / (np.abs(y_ref).max() + 1e-6)
    assert rel < 0.03, rel


def test_w8a8_generation_argmax_stable(rng):
    """w8a8 serving mode: first greedy token matches the fp32 reference on a
    tiny model (compute path: int8×int8 MXU matmuls on prefill)."""
    import dataclasses

    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    qparams = quantize_tree(params)
    a8cfg = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, w8a8=True),
        text=dataclasses.replace(cfg.text, w8a8=True),
    )
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
    ids = [5, 6, 7, 8, 9]
    ref = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8).generate([ids], None, gen)
    out = OmChatEngine(a8cfg, qparams, attn_impl="xla", prompt_bucket=8).generate([ids], None, gen)
    assert out.token_ids[0][0] == ref.token_ids[0][0]


def test_fp8_kv_cache(rng):
    """fp8(e4m3) KV cache: generation runs and matches bf16-cache argmax on
    the first tokens (cache dequantized on load)."""
    import jax.numpy as jnp

    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
    ids = [5, 6, 7, 8, 9, 10, 11]

    ref = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8).generate([ids], None, gen)
    f8 = OmChatEngine(
        cfg, params, attn_impl="xla", prompt_bucket=8, cache_dtype=jnp.float8_e4m3fn
    ).generate([ids], None, gen)
    assert f8.token_ids[0][0] == ref.token_ids[0][0]
    assert len(f8.token_ids[0]) == 4
