"""Trainable Pallas flash attention: gradient parity vs the XLA path (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.ops.attention import _xla_attention
from omchat_tpu.ops.flash_attention_bwd import flash_attention_trainable


def _grads(fn, q, k, v):
    def loss(q, k, v):
        out = fn(q, k, v)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))

    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_grads_match_xla(rng, causal):
    B, S, H, D = 1, 256, 2, 128
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))

    ref_fn = lambda q, k, v: _xla_attention(q, k, v, causal=causal, q_offset=None, kv_len=None)
    fl_fn = lambda q, k, v: flash_attention_trainable(
        q, k, v, causal, 128, 128, True  # block_q, block_k, interpret
    )

    out_ref = ref_fn(q, k, v)
    out_fl = fl_fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out_fl), np.asarray(out_ref), atol=2e-5, rtol=1e-4)

    g_ref = _grads(ref_fn, q, k, v)
    g_fl = _grads(fl_fn, q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=f"d{name}"
        )


def test_flash_grads_gqa(rng):
    B, S, H, KVH, D = 1, 256, 4, 2, 128
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))

    ref_fn = lambda q, k, v: _xla_attention(q, k, v, causal=True, q_offset=None, kv_len=None)
    fl_fn = lambda q, k, v: flash_attention_trainable(q, k, v, True, 128, 128, True)

    g_ref = _grads(ref_fn, q, k, v)
    g_fl = _grads(fl_fn, q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=f"d{name}"
        )


def test_flash_grads_nonmultiple_seq(rng):
    """Regression: S not a multiple of block_q (lse padding double-count)."""
    B, S, H, D = 1, 200, 2, 128
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    fl_fn = lambda q, k, v: flash_attention_trainable(q, k, v, True, 128, 128, True)
    ref_fn = lambda q, k, v: _xla_attention(q, k, v, causal=True, q_offset=None, kv_len=None)
    g_ref = _grads(ref_fn, q, k, v)
    g_fl = _grads(fl_fn, q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=f"d{name}")


def test_mqa_group_slicing(rng):
    """MQA-sized group (H=24, KVH=1): the group-state VMEM budget forces the
    g_eff slice path (multiple grid steps per kv head, dK/dV group-summed
    outside); gradients still match XLA."""
    B, S, H, KVH, D = 1, 192, 24, 1, 128
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))

    def loss(fn):
        def f(q, k, v):
            out = fn(q, k, v)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))
        return f

    from omchat_tpu.ops.attention import _xla_attention
    from omchat_tpu.ops.flash_attention_bwd import flash_attention_trainable

    ref_fn = loss(lambda q, k, v: _xla_attention(q, k, v, causal=True, q_offset=None, kv_len=None))
    pl_fn = loss(lambda q, k, v: flash_attention_trainable(q, k, v, True, 128, 128, True))
    ref = jax.grad(ref_fn, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(pl_fn, argnums=(0, 1, 2))(q, k, v)
    for r, g2 in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g2), np.asarray(r), atol=2e-4, rtol=1e-3)
