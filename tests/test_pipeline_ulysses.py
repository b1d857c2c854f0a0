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


def _pp_tiny_params(cfg, seed=0):
    from omchat_tpu.models import intern_vit, projector as projector_model, qwen2 as qwen2_model

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "vision_tower": intern_vit.init_params(k1, cfg.vision),
        "projector": projector_model.init_params(
            k2, cfg.projector, cfg.vision.hidden_size, cfg.text.hidden_size
        ),
        "language_model": qwen2_model.init_params(k3, cfg.text),
    }


def _pp_batch(cfg, rng, with_image=True):
    from omchat_tpu.models.omchat import plan_multimodal_merge

    ids = [5, 6, -200, 7, 8] if with_image else [5, 6, 7, 8, 9, 10]
    plan = plan_multimodal_merge([ids] * 4, cfg.image_seq_len, bucket=8)
    labels = np.where(plan.is_image, -100, plan.token_ids)
    labels[plan.positions == 0] = -100
    batch = {
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_index": jnp.asarray(plan.image_index),
        "positions": jnp.asarray(plan.positions),
        "labels": jnp.asarray(labels),
    }
    if with_image:
        batch["pixel_values"] = jnp.asarray(
            rng.standard_normal((4, 3, 56, 56)).astype(np.float32)
        )
    return batch


def test_pp_train_step_matches_sequential(rng):
    """make_pp_train_step (2 GPipe stages, 2 microbatches) produces the same
    loss as the plain single-device train step on an identical multimodal
    batch — the drivable `cli/train.py --pp` path."""
    import optax

    from omchat_tpu.config import OmChatConfig
    from omchat_tpu.training.train_step import (
        init_train_state,
        make_pp_train_step,
        make_optimizer,
        pp_param_specs,
        stage_params,
        train_step,
        unstage_params,
    )

    cfg = OmChatConfig.tiny()
    params = _pp_tiny_params(cfg)
    batch = _pp_batch(cfg, rng)
    optimizer = make_optimizer(lr=1e-4)

    # sequential reference on one device
    state_ref = init_train_state(params, optimizer)
    _, loss_ref = train_step(state_ref, cfg, batch, optimizer, attn_impl="xla", remat=False)

    n_stages, m = 2, 2
    mesh = Mesh(np.asarray(jax.devices()[:n_stages]), axis_names=("stage",))
    staged = stage_params(params, n_stages)
    # round-trip sanity: unstage inverts stage
    rt = unstage_params(staged)
    np.testing.assert_array_equal(
        np.asarray(rt["language_model"]["layers"]["input_layernorm"]["scale"]),
        np.asarray(params["language_model"]["layers"]["input_layernorm"]["scale"]),
    )

    step_fn, batch_shardings, to_sharding = make_pp_train_step(
        cfg, mesh, optimizer, microbatches=m, remat=False
    )
    param_shardings = to_sharding(pp_param_specs(staged))
    staged = jax.tree.map(lambda a, s: jax.device_put(a, s), staged, param_shardings)
    state = init_train_state(staged, optimizer)
    b = {k: jax.device_put(v, batch_shardings[k]) for k, v in batch.items()}

    state2, loss1 = step_fn(state, cfg, b)
    np.testing.assert_allclose(float(loss1), float(loss_ref), rtol=2e-5)
    state3, loss2 = step_fn(state2, cfg, b)
    assert float(loss2) < float(loss1)  # AdamW descends through the pipeline
    assert int(state3.step) == 2


def test_pp_train_step_packed_segments(rng):
    """Packed text rows (segment_ids) train through the pipeline: the segment
    mask rides the microbatch tuple, loss matches the sequential step."""
    from omchat_tpu.config import OmChatConfig
    from omchat_tpu.training.train_step import (
        init_train_state,
        make_pp_train_step,
        make_optimizer,
        pp_param_specs,
        stage_params,
        train_step,
    )

    cfg = OmChatConfig.tiny()
    params = _pp_tiny_params(cfg)
    B, S = 4, 16
    ids = rng.integers(4, 60, size=(B, S)).astype(np.int32)
    seg = np.repeat(np.array([[0] * 10 + [1] * 6]), B, axis=0).astype(np.int32)
    pos = np.concatenate([np.arange(10), np.arange(6)])[None].repeat(B, axis=0).astype(np.int32)
    labels = ids.copy()
    labels[:, :1] = -100
    batch = {
        "token_ids": jnp.asarray(ids),
        "is_image": jnp.zeros((B, S), bool),
        "image_index": jnp.zeros((B, S), jnp.int32),
        "positions": jnp.asarray(pos),
        "labels": jnp.asarray(labels),
        "segment_ids": jnp.asarray(seg),
    }
    optimizer = make_optimizer(lr=1e-4)
    state_ref = init_train_state(params, optimizer)
    _, loss_ref = train_step(state_ref, cfg, batch, optimizer, attn_impl="xla", remat=False)

    mesh = Mesh(np.asarray(jax.devices()[:2]), axis_names=("stage",))
    staged = stage_params(params, 2)
    step_fn, batch_shardings, to_sharding = make_pp_train_step(
        cfg, mesh, optimizer, microbatches=4, remat=False
    )
    staged = jax.tree.map(
        lambda a, s: jax.device_put(a, s), staged, to_sharding(pp_param_specs(staged))
    )
    state = init_train_state(staged, optimizer)
    b = {k: jax.device_put(v, batch_shardings[k]) for k, v in batch.items()}
    _, loss = step_fn(state, cfg, b)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-5)


def test_ulysses_train_step_matches_single_device(rng):
    """--ulysses training: two steps on a (data=2, context=4) mesh produce
    the same losses as the unsharded step — step 2 equality certifies the
    all-to-all path's gradients, not just its forward."""
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

    # merged len = 16 (tile) + 7 text = 23 → bucket 24 (% P == 0); heads 4 % 4 == 0
    ids = [5, -200, 7, 8, 9, 10, 11]
    plan = plan_multimodal_merge([ids] * 4, cfg.image_seq_len, bucket=24)
    labels = np.where(plan.is_image, -100, plan.token_ids)
    pixels = np.asarray(rng.standard_normal((4, 3, 56, 56)), np.float32)
    batch_np = {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_index": plan.image_index,
        "positions": plan.positions,
        "labels": labels,
        "pixel_values": pixels,
    }

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
        cfg, mesh, specs, optimizer, remat=False, ulysses=True
    )
    sharded = shard_params(params, mesh, specs)
    state = init_train_state(sharded, optimizer)
    batch = {k: jax.device_put(jnp.asarray(v), batch_shardings[k]) for k, v in batch_np.items()}
    uly_losses = []
    for _ in range(2):
        state, loss = step_fn(state, cfg, batch)
        uly_losses.append(float(loss))
    np.testing.assert_allclose(uly_losses, ref_losses, rtol=2e-5)


def test_multislice_mesh_groups_by_slice():
    """create_multislice_mesh orders the data axis by slice id (DCN-outer):
    with a synthesized 2-slice grouping over 8 CPU devices, each mesh row
    stays within one slice and slice 0's rows come first."""
    from omchat_tpu.parallel.mesh import create_multislice_mesh

    devices = jax.devices()[:8]
    mesh = create_multislice_mesh(
        tp=2, num_slices=2, devices=devices,
        slice_of=lambda d: 0 if devices.index(d) < 4 else 1,
    )
    assert mesh.axis_names == ("data", "model")
    arr = mesh.devices
    assert arr.shape == (4, 2)
    ids = [[devices.index(d) for d in row] for row in arr]
    # rows 0-1 from slice 0 (devices 0-3), rows 2-3 from slice 1 (devices 4-7)
    assert all(i < 4 for row in ids[:2] for i in row)
    assert all(i >= 4 for row in ids[2:] for i in row)

    # uneven grouping is rejected loudly
    import pytest

    with pytest.raises(ValueError):
        create_multislice_mesh(
            tp=2, num_slices=2, devices=devices,
            slice_of=lambda d: 0 if devices.index(d) < 3 else 1,
        )
