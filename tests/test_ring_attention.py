"""Ring attention (context parallelism) vs single-device attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from omchat_tpu.ops.attention import _xla_attention
from omchat_tpu.parallel.ring_attention import ring_attention


def _mesh(cp):
    devices = np.asarray(jax.devices()[:cp])
    return Mesh(devices, axis_names=("context",))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_dense(rng, causal):
    cp = 4
    B, S, H, D = 2, 64, 4, 32  # S divisible by cp
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))

    ref = _xla_attention(q, k, v, causal=causal, q_offset=None, kv_len=None)
    out = ring_attention(q, k, v, _mesh(cp), causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ring_attention_gqa(rng):
    cp = 8
    B, S, H, KVH, D = 1, 64, 8, 2, 32
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))

    ref = _xla_attention(q, k, v, causal=True, q_offset=None, kv_len=None)
    out = ring_attention(q, k, v, _mesh(cp), causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
