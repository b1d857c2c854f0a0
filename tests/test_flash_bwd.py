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


def _seg_loss(fn, seg):
    """Sum-of-cos loss over valid (non-padding) rows only, so ref and kernel
    disagreements on padding-row outputs (which the loss always masks in
    packed SFT) don't enter the comparison."""
    valid = (seg >= 0)[:, :, None, None]

    def loss(q, k, v):
        out = fn(q, k, v)
        w = jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01)
        return jnp.sum(jnp.where(valid, out * w, 0.0))

    return loss


@pytest.mark.parametrize("causal", [True, False])
def test_flash_grads_packed_segments(rng, causal):
    """Packed (segment_ids) fwd+bwd parity vs XLA masked attention: three
    documents + tail padding in row 0, one full-width document in row 1."""
    B, S, H, KVH, D = 2, 384, 4, 2, 128
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))
    seg = jnp.asarray(
        np.stack([
            np.concatenate([np.zeros(100), np.ones(150), np.full(86, 2), np.full(48, -1)]),
            np.zeros(S),
        ]).astype(np.int32)
    )
    kv_len = jnp.sum(seg >= 0, axis=1).astype(jnp.int32)

    ref_fn = lambda q, k, v: _xla_attention(
        q, k, v, causal=causal, q_offset=jnp.zeros((B,), jnp.int32), kv_len=kv_len, segment_ids=seg
    )
    fl_fn = lambda q, k, v: flash_attention_trainable(q, k, v, causal, 128, 128, True, seg)

    out_ref = np.asarray(ref_fn(q, k, v))
    out_fl = np.asarray(fl_fn(q, k, v))
    valid = np.asarray(seg) >= 0
    np.testing.assert_allclose(out_fl[valid], out_ref[valid], atol=2e-5, rtol=1e-4)
    # padding rows are fully masked → their softmax degenerates to the mean of
    # v (finite mask value; same contract as the fwd-only kernel and the XLA
    # packed path, whose padding rows attend each other) — the loss masks
    # them; the bwd kernels re-mask so those rows contribute NO gradient,
    # which the assertions below pin.
    assert np.isfinite(out_fl[~valid]).all()

    g_ref = jax.grad(_seg_loss(ref_fn, seg), argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(_seg_loss(fl_fn, seg), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=f"d{name}"
        )
    # no gradient leaks across documents: padding k/v rows get zero grad
    np.testing.assert_array_equal(np.asarray(g_fl[1])[0, 336:], 0.0)
    np.testing.assert_array_equal(np.asarray(g_fl[2])[0, 336:], 0.0)


def test_flash_grads_packed_isolation(rng):
    """A document's gradients are bitwise independent of its packmates: pack
    doc A with doc B vs with doc C — dq/dk/dv on A's rows must match exactly
    (the packed-SFT contract, mirrors test_packing.py's forward pin)."""
    S, H, KVH, D = 256, 2, 2, 128
    la = 128  # doc A occupies rows [0, 128)
    qa = rng.standard_normal((1, S, H, D)).astype(np.float32)
    ka = rng.standard_normal((1, S, KVH, D)).astype(np.float32)
    va = rng.standard_normal((1, S, KVH, D)).astype(np.float32)
    alt = rng.standard_normal((1, S, KVH, D)).astype(np.float32)
    seg = jnp.asarray(np.concatenate([np.zeros(la), np.ones(S - la)]).astype(np.int32))[None]

    def grads(qx, kx, vx):
        fn = lambda q, k, v: flash_attention_trainable(q, k, v, True, 128, 128, True, seg)
        return jax.grad(_seg_loss(fn, seg), argnums=(0, 1, 2))(
            jnp.asarray(qx), jnp.asarray(kx), jnp.asarray(vx)
        )

    g1 = grads(qa, ka, va)
    kb, vb = ka.copy(), va.copy()
    kb[:, la:], vb[:, la:] = alt[:, la:], alt[:, ::-1][:, : S - la]
    g2 = grads(qa, kb, vb)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_array_equal(
            np.asarray(a)[:, :la], np.asarray(b)[:, :la], err_msg=f"d{name} rows of doc A"
        )
