"""Logit-parity tests: JAX Qwen2 decoder vs HF transformers (tiny config, fp32 CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.config import RopeScalingConfig, TextConfig
from omchat_tpu.checkpoint.loader import convert_qwen2
from omchat_tpu.models.qwen2 import (
    embed_tokens,
    init_kv_cache,
    lm_head,
    qwen2_forward,
)

TINY = dict(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rope_theta=10000.0,
    tie_word_embeddings=False,
)


def _hf_model(**overrides):
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    cfg = Qwen2Config(**{**TINY, **overrides}, attn_implementation="eager")
    torch.manual_seed(0)
    return Qwen2ForCausalLM(cfg).eval().float()


def _jax_cfg(**overrides):
    return TextConfig(**{**TINY, **overrides})


def test_qwen2_logits_match_hf(rng):
    import torch

    model = _hf_model()
    cfg = _jax_cfg()
    params = convert_qwen2(model.state_dict(), cfg, dtype=jnp.float32)

    ids = rng.integers(0, 256, size=(2, 17), dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()

    x = embed_tokens(params, jnp.asarray(ids))
    positions = jnp.broadcast_to(jnp.arange(17), (2, 17))
    hidden, _ = qwen2_forward(params, cfg, x, positions, attn_impl="xla")
    ours = lm_head(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-4)


def test_qwen2_prefill_decode_cache_parity(rng):
    """Prefill + stepwise decode through the KV cache == full-sequence forward."""
    import torch

    model = _hf_model()
    cfg = _jax_cfg()
    params = convert_qwen2(model.state_dict(), cfg, dtype=jnp.float32)

    prompt_len, extra = 9, 4
    ids = rng.integers(0, 256, size=(1, prompt_len + extra), dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()

    cache = init_kv_cache(cfg, batch=1, max_len=32, dtype=jnp.float32)

    # prefill
    x = embed_tokens(params, jnp.asarray(ids[:, :prompt_len]))
    positions = jnp.arange(prompt_len)[None]
    hidden, cache = qwen2_forward(
        params, cfg, x, positions, cache, write_pos=0, kv_len=jnp.asarray([prompt_len]), attn_impl="xla"
    )
    logits = lm_head(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits[0]), ref[0, :prompt_len], atol=3e-5, rtol=1e-4)

    # decode steps
    for t in range(prompt_len, prompt_len + extra):
        x = embed_tokens(params, jnp.asarray(ids[:, t : t + 1]))
        hidden, cache = qwen2_forward(
            params,
            cfg,
            x,
            jnp.asarray([[t]]),
            cache,
            write_pos=t,
            kv_len=jnp.asarray([t + 1]),
            attn_impl="xla",
        )
        step_logits = lm_head(params, cfg, hidden)
        np.testing.assert_allclose(np.asarray(step_logits[0, 0]), ref[0, t], atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("rope_type,factor", [("linear", 2.0), ("dynamic", 2.0)])
def test_qwen2_rope_scaling_matches_hf(rng, rope_type, factor):
    """The reference's long-context RoPE scaling (modeling_llama.py:156-198)."""
    import torch

    scaling = {"rope_type": rope_type, "factor": factor}
    model = _hf_model(rope_scaling=scaling)
    cfg = _jax_cfg(rope_scaling=RopeScalingConfig(rope_type=rope_type, factor=factor))
    params = convert_qwen2(model.state_dict(), cfg, dtype=jnp.float32)

    ids = rng.integers(0, 256, size=(1, 24), dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()

    x = embed_tokens(params, jnp.asarray(ids))
    hidden, _ = qwen2_forward(params, cfg, x, jnp.arange(24)[None], attn_impl="xla")
    ours = lm_head(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-4)


def test_tied_embeddings(rng):
    import torch

    model = _hf_model(tie_word_embeddings=True)
    cfg = _jax_cfg(tie_word_embeddings=True)
    params = convert_qwen2(model.state_dict(), cfg, dtype=jnp.float32)
    assert "lm_head" not in params

    ids = rng.integers(0, 256, size=(1, 5), dtype=np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).logits.numpy()
    x = embed_tokens(params, jnp.asarray(ids))
    hidden, _ = qwen2_forward(params, cfg, x, jnp.arange(5)[None], attn_impl="xla")
    ours = lm_head(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-4)


def test_dynamic_ntk_activates_beyond_max_position(rng):
    """Dynamic-NTK must rescale theta once positions exceed
    max_position_embeddings (it was dead code until wired through seq_len)."""
    import jax.numpy as jnp

    from omchat_tpu.config import RopeScalingConfig
    from omchat_tpu.ops.rope import rope_cos_sin

    scaling = RopeScalingConfig(rope_type="dynamic", factor=4.0)
    pos_short = jnp.arange(16)[None]
    pos_long = jnp.arange(64)[None]
    c_short, _ = rope_cos_sin(pos_short, 64, theta=10000.0, scaling=scaling, max_position_embeddings=32)
    c_short_ref, _ = rope_cos_sin(pos_short, 64, theta=10000.0, scaling=None, max_position_embeddings=32)
    np.testing.assert_allclose(np.asarray(c_short), np.asarray(c_short_ref), atol=1e-6)

    c_long, _ = rope_cos_sin(pos_long, 64, theta=10000.0, scaling=scaling, max_position_embeddings=32)
    c_long_ref, _ = rope_cos_sin(pos_long, 64, theta=10000.0, scaling=None, max_position_embeddings=32)
    assert float(jnp.max(jnp.abs(c_long - c_long_ref))) > 1e-3  # rescale active
