"""Pipeline-parallel forward + Ulysses attention on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from omchat_tpu.parallel.mesh import create_mesh
from omchat_tpu.parallel.pipeline import pipeline_forward, stage_split
from omchat_tpu.parallel.ulysses import ulysses_attention
from omchat_tpu.ops.attention import _repeat_kv, _xla_attention


def test_ulysses_matches_full_attention(rng):
    B, S, H, KVH, D = 2, 32, 8, 2, 16
    q = jnp.asarray(rng.standard_normal((B, S, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, S, KVH, D)).astype(np.float32))
    mesh = create_mesh(tp=4, dp=2)
    ref = _xla_attention(
        q, _repeat_kv(k, H), _repeat_kv(v, H), causal=True, q_offset=None, kv_len=None
    )
    out = ulysses_attention(q, k, v, mesh, axis="model", causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_ulysses_rejects_indivisible():
    mesh = create_mesh(tp=4, dp=2)
    q = jnp.zeros((1, 32, 6, 16))  # 6 heads % 4 != 0
    with pytest.raises(ValueError):
        ulysses_attention(q, q, q, mesh, axis="model")


def _mlp_stage(params, x):
    def body(c, lp):
        h = jnp.tanh(c @ lp["w1"])
        return c + h @ lp["w2"], None
    out, _ = jax.lax.scan(body, x, params)
    return out


def test_pipeline_forward_matches_sequential(rng):
    n_stages, layers_per_stage, d = 4, 2, 16
    L = n_stages * layers_per_stage
    params = {
        "w1": jnp.asarray(rng.standard_normal((L, d, 32)).astype(np.float32) * 0.3),
        "w2": jnp.asarray(rng.standard_normal((L, 32, d)).astype(np.float32) * 0.3),
    }
    micro = jnp.asarray(rng.standard_normal((5, 3, d)).astype(np.float32))  # M=5 microbatches

    # sequential reference: all layers applied to each microbatch
    ref = jax.vmap(lambda x: _mlp_stage(params, x))(micro)

    devices = jax.devices()[:n_stages]
    mesh = Mesh(np.asarray(devices), axis_names=("stage",))
    stages = stage_split(params, n_stages)
    out = pipeline_forward(_mlp_stage, stages, micro, mesh, axis="stage")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_pipeline_train_step_matches_sequential(rng):
    """GPipe training: loss AND per-layer gradients through the pipelined
    scan equal the sequential reference (backward streams through the
    stages over the inverted ppermute ring)."""
    from omchat_tpu.parallel.pipeline import pipeline_train_step

    n_stages, layers_per_stage, d = 4, 2, 16
    L = n_stages * layers_per_stage
    params = {
        "w1": jnp.asarray(rng.standard_normal((L, d, 32)).astype(np.float32) * 0.3),
        "w2": jnp.asarray(rng.standard_normal((L, 32, d)).astype(np.float32) * 0.3),
    }
    micro = jnp.asarray(rng.standard_normal((5, 3, d)).astype(np.float32))
    targets = jnp.asarray(rng.standard_normal((5, 3, d)).astype(np.float32))

    def loss_fn(outs, tgt):
        return jnp.mean((outs - tgt) ** 2)

    # sequential reference: loss + grads over the stacked [L, ...] params
    def seq_loss(p):
        outs = jax.vmap(lambda x: _mlp_stage(p, x))(micro)
        return loss_fn(outs, targets)

    ref_loss, ref_grads = jax.value_and_grad(seq_loss)(params)

    devices = jax.devices()[:n_stages]
    mesh = Mesh(np.asarray(devices), axis_names=("stage",))
    stages = stage_split(params, n_stages)
    loss, grads = pipeline_train_step(
        _mlp_stage, loss_fn, stages, micro, targets, mesh, axis="stage"
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    for k in ("w1", "w2"):
        np.testing.assert_allclose(
            np.asarray(grads[k]).reshape(L, *ref_grads[k].shape[1:]),
            np.asarray(ref_grads[k]),
            atol=1e-6,
            err_msg=k,
        )


def test_pipeline_train_optimizer_descends(rng):
    """A few GPipe steps with SGD reduce the loss (end-to-end trainability)."""
    from omchat_tpu.parallel.pipeline import pipeline_train_step

    n_stages, d = 2, 8
    L = n_stages * 2
    params = {
        "w1": jnp.asarray(rng.standard_normal((L, d, 16)).astype(np.float32) * 0.3),
        "w2": jnp.asarray(rng.standard_normal((L, 16, d)).astype(np.float32) * 0.3),
    }
    micro = jnp.asarray(rng.standard_normal((4, 2, d)).astype(np.float32))
    targets = jnp.asarray(rng.standard_normal((4, 2, d)).astype(np.float32))

    def loss_fn(outs, tgt):
        return jnp.mean((outs - tgt) ** 2)

    mesh = Mesh(np.asarray(jax.devices()[:n_stages]), axis_names=("stage",))
    stages = stage_split(params, n_stages)
    losses = []
    for _ in range(5):
        loss, grads = pipeline_train_step(
            _mlp_stage, loss_fn, stages, micro, targets, mesh, axis="stage"
        )
        stages = jax.tree.map(lambda p, g: p - 0.1 * g, stages, grads)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses


def test_pipeline_qwen2_trunk(rng):
    """PP over the actual Qwen2 layer stack (no-cache forward)."""
    from omchat_tpu.config import TextConfig
    from omchat_tpu.models.qwen2 import _layer_forward, init_params
    from omchat_tpu.ops.rope import rope_cos_sin

    cfg = TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attention_bias=False,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    B, S = 2, 8
    x = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)).astype(np.float32) * 0.1)
    pos = jnp.broadcast_to(jnp.arange(S), (B, S))
    cos, sin = rope_cos_sin(pos, cfg.attn_head_dim, theta=cfg.rope_theta,
                            max_position_embeddings=cfg.max_position_embeddings, dtype=x.dtype)

    def stage(stage_layers, h):
        def body(carry, layer):
            out, _ = _layer_forward(cfg, "xla", None, None, carry, (layer, None, None, None))
            return out, None
        (h2, *_), _ = jax.lax.scan(body, (h, cos, sin, jnp.int32(0), None), stage_layers)
        return h2

    # sequential reference
    ref = stage(params["layers"], x)

    n_stages = 2
    mesh = Mesh(np.asarray(jax.devices()[:n_stages]), axis_names=("stage",))
    stages = stage_split(params["layers"], n_stages)
    out = pipeline_forward(stage, stages, x[None], mesh, axis="stage")[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
