"""Tensor-parallel Pallas attention: per-shard kernels under shard_map match
the replicated XLA reference on a virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from omchat_tpu.ops.attention import _xla_attention, attention
from omchat_tpu.parallel.tp_attention import tp_flash_attention, tp_shardable


def _mesh(tp):
    devs = jax.devices()
    if len(devs) < tp:
        pytest.skip(f"needs {tp} devices")
    return Mesh(np.array(devs[:tp]).reshape(tp), ("model",))


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_flash_matches_xla(rng, tp):
    """Causal GQA with per-batch offset/length, heads sharded over the mesh."""
    mesh = _mesh(tp)
    B, S, T, H, KVH, D = 2, 64, 128, 8, 4, 128
    q = _rand(rng, B, S, H, D)
    k = _rand(rng, B, T, KVH, D)
    v = _rand(rng, B, T, KVH, D)
    q_offset = jnp.asarray([32, 48], jnp.int32)
    kv_len = jnp.asarray([96, 112], jnp.int32)
    assert tp_shardable(mesh, H, KVH)

    ref = _xla_attention(q, k, v, causal=True, q_offset=q_offset, kv_len=kv_len)
    out = tp_flash_attention(
        q, k, v, mesh, causal=True, q_offset=q_offset, kv_len=kv_len, interpret=True
    )
    for b in range(B):
        valid = int(kv_len[b]) - int(q_offset[b])
        np.testing.assert_allclose(
            np.asarray(out)[b, :valid], np.asarray(ref)[b, :valid], atol=2e-5, rtol=1e-4
        )


def test_attention_tuple_impl_dispatch(rng):
    """attention(impl=("pallas_tp", mesh)) routes through the sharded kernel
    and falls back to XLA when heads don't divide."""
    mesh = _mesh(2)
    B, S, H, KVH, D = 1, 64, 4, 2, 128
    q = _rand(rng, B, S, H, D)
    k = _rand(rng, B, S, KVH, D)
    v = _rand(rng, B, S, KVH, D)
    ref = _xla_attention(q, k, v, causal=True, q_offset=None, kv_len=None)
    out = attention(q, k, v, causal=True, impl=("pallas_tp", mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    # 3 kv heads don't divide tp=2 -> XLA fallback, still correct
    k3 = _rand(rng, B, S, 3, D)
    v3 = _rand(rng, B, S, 3, D)
    q3 = _rand(rng, B, S, 6, D)
    ref3 = _xla_attention(q3, k3, v3, causal=True, q_offset=None, kv_len=None)
    out3 = attention(q3, k3, v3, causal=True, impl=("pallas_tp", mesh))
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3), atol=2e-5, rtol=1e-4)


def test_engine_selects_tp_impl(rng):
    """A multi-device mesh resolves attn_impl=None to the TP tuple (when the
    platform default is pallas it would shard; on CPU it picks xla) — here we
    just pin the selection logic via tp_shardable."""
    mesh = _mesh(2)
    assert tp_shardable(mesh, 28, 4)
    assert not tp_shardable(mesh, 25, 4) or 25 % 2 == 0
    assert not tp_shardable(_mesh(2), 28, 3)
