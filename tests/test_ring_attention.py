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


def test_cp_train_step_matches_single_device(rng):
    """--cp training: two steps on a (data=2, context=4) mesh produce the
    same losses as the unsharded step — step 2 equality certifies the ring
    kernel's gradients, not just its forward."""
    from jax.sharding import PartitionSpec as P

    from omchat_tpu.config import OmChatConfig
    from omchat_tpu.models.omchat import plan_multimodal_merge
    from omchat_tpu.parallel.mesh import create_cp_mesh
    from omchat_tpu.parallel.sharding import (
        omchat_param_specs,
        shard_params,
        specs_without_axis,
    )
    from omchat_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_sharded_train_step,
        train_step,
    )
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    optimizer = make_optimizer(lr=1e-2)  # large lr amplifies any grad mismatch

    # one image sentinel: merged len = 16 (tile) + 7 text = 23 → bucket 24 (% 4 == 0)
    ids = [5, -200, 7, 8, 9, 10, 11]
    plan = plan_multimodal_merge([ids] * 4, cfg.image_seq_len, bucket=24)
    labels = np.where(plan.is_image, -100, plan.token_ids)
    pixels = rng.standard_normal((4, 3, 56, 56)).astype(np.float32)
    batch_np = {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_index": plan.image_index,
        "positions": plan.positions,
        "labels": labels,
        "pixel_values": pixels,
    }

    # single-device truth, two steps
    state = init_train_state(params, optimizer)
    ref_losses = []
    for _ in range(2):
        state, loss = train_step(
            state, cfg, {k: jnp.asarray(v) for k, v in batch_np.items()},
            optimizer, attn_impl="xla", remat=False,
        )
        ref_losses.append(float(loss))

    mesh = create_cp_mesh(cp=4, dp=2)
    specs = specs_without_axis(omchat_param_specs(cfg, params), "model")
    step_fn, batch_shardings, _ = make_sharded_train_step(
        cfg, mesh, specs, optimizer, remat=False, context_parallel=True
    )
    sharded = shard_params(params, mesh, specs)
    state = init_train_state(sharded, optimizer)
    batch = {k: jax.device_put(jnp.asarray(v), batch_shardings[k]) for k, v in batch_np.items()}
    cp_losses = []
    for _ in range(2):
        state, loss = step_fn(state, cfg, batch)
        cp_losses.append(float(loss))
    np.testing.assert_allclose(cp_losses, ref_losses, rtol=2e-5)


def test_specs_without_axis():
    from jax.sharding import PartitionSpec as P

    from omchat_tpu.parallel.sharding import specs_without_axis

    specs = {"a": P(None, "model"), "b": P("data", ("model", "x")), "c": P()}
    out = specs_without_axis(specs, "model")
    assert out["a"] == P(None, None)
    assert out["b"] == P("data", ("x",))
    assert out["c"] == P()


def test_ring_attention_gqa(rng):
    cp = 8
    B, S, H, KVH, D = 1, 64, 8, 2, 32
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))

    ref = _xla_attention(q, k, v, causal=True, q_offset=None, kv_len=None)
    out = ring_attention(q, k, v, _mesh(cp), causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
