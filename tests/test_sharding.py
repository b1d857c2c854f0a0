"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.models import omchat as omchat_model
from omchat_tpu.models import qwen2 as qwen2_model
from omchat_tpu.models import intern_vit, projector as projector_model
from omchat_tpu.parallel.mesh import create_mesh
from omchat_tpu.parallel.sharding import omchat_param_specs, shard_params
from omchat_tpu.runtime.generate import OmChatEngine


def _tiny_params(cfg: OmChatConfig, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "vision_tower": intern_vit.init_params(k1, cfg.vision),
        "projector": projector_model.init_params(
            k2, cfg.projector, cfg.vision.hidden_size, cfg.text.hidden_size
        ),
        "language_model": qwen2_model.init_params(k3, cfg.text),
    }


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_generation_matches_single_device(tp, rng):
    """TP-sharded generate must produce the same tokens as unsharded."""
    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)

    ids = [5, 6, 7, -200, 8, 9]
    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1)

    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)
    ref = engine.generate([ids], pixels, gen)

    mesh = create_mesh(tp=tp)
    specs = omchat_param_specs(cfg, params)
    sharded = shard_params(params, mesh, specs)
    engine_tp = OmChatEngine(cfg, sharded, attn_impl="xla", prompt_bucket=8)
    out = engine_tp.generate([ids], pixels, gen)

    assert out.token_ids == ref.token_ids


@pytest.mark.parametrize("tp", [2])
def test_tp_chunked_prefill_matches_single_device(tp, rng):
    """The serve-path incremental prefill (prefill_chunked) under TP produces
    the same first-token logits path as the unsharded one-shot prefill."""
    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    ids = [5, 6, 7, -200, 8, 9, 10, 11, 12]
    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1)

    ref = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8).generate([ids], pixels, gen)

    mesh = create_mesh(tp=tp)
    sharded = shard_params(params, mesh, omchat_param_specs(cfg, params))
    engine = OmChatEngine(cfg, sharded, attn_impl="xla", prompt_bucket=8, mesh=mesh)
    feats = engine.encode_images(pixels)
    plan = engine.plan([ids])
    logits, cache = engine.prefill_chunked(plan, feats, gen.max_new_tokens, chunk_size=8)
    from omchat_tpu.ops.sampling import greedy
    from omchat_tpu.runtime.generate import _decode_step_jit

    toks = [int(np.asarray(greedy(logits))[0])]
    kv_len = jnp.asarray(plan.lengths)
    for _ in range(3):
        logits, cache = _decode_step_jit(sharded, cfg, jnp.asarray([toks[-1]]), kv_len, cache, "xla")
        kv_len = kv_len + 1
        toks.append(int(np.asarray(greedy(logits))[0]))
    assert toks == ref.token_ids[0]


@pytest.mark.parametrize("tp", [2, 8])
def test_tp_batch_engine_matches_single_device(tp, rng):
    """BatchEngine under TP with the kv-head-sharded shared cache == unsharded.
    tp=8 exercises the KVH % tp != 0 replication fallback (tiny cfg has 2 kv
    heads — the same situation as Qwen2-7B's 4 kv heads at tp=8)."""
    from omchat_tpu.runtime.batch_engine import BatchEngine

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    reqs = [[5, 6, 7, 8, 9], [11, 12, 13]]
    expected = []
    eng = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16)
    for ids in reqs:
        expected.append(
            eng.generate([ids], None, GenerationConfig(max_new_tokens=5, eos_token_id=-1)).token_ids[0]
        )

    mesh = create_mesh(tp=tp, devices=jax.devices()[:tp])  # pure-TP serving mesh
    from omchat_tpu.parallel.sharding import kv_cache_specs

    cache_spec = kv_cache_specs(cfg.text, mesh, batch=2)
    expected_head_axis = "model" if cfg.text.num_key_value_heads % tp == 0 else None
    assert cache_spec.k[2] == expected_head_axis

    sharded = shard_params(params, mesh, omchat_param_specs(cfg, params))
    be = BatchEngine(cfg, sharded, max_slots=2, max_len=64, chunk_size=16, attn_impl="xla", mesh=mesh)
    rids = [be.submit(ids, None, max_new_tokens=5, eos_token_id=-1) for ids in reqs]
    be.run_to_completion(max_ticks=300)
    for rid, exp in zip(rids, expected):
        assert be.result(rid) == exp


@pytest.mark.parametrize("tp", [2])
def test_tp_paged_engine_matches_single_device(tp, rng):
    """Paged engine under TP: pools sharded over kv heads; greedy parity."""
    from omchat_tpu.runtime.paged_engine import PagedBatchEngine

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    ids = [5, 6, 7, 8, 9]
    expected = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16).generate(
        [ids], None, GenerationConfig(max_new_tokens=5, eos_token_id=-1)
    ).token_ids[0]

    mesh = create_mesh(tp=tp, devices=jax.devices()[:tp])
    sharded = shard_params(params, mesh, omchat_param_specs(cfg, params))
    be = PagedBatchEngine(
        cfg, sharded, max_slots=2, num_pages=12, page_size=8, attn_impl="xla",
        prompt_bucket=16, max_len=96, mesh=mesh,
    )
    rid = be.submit(ids, None, max_new_tokens=5, eos_token_id=-1)
    be.run_to_completion(max_ticks=300)
    assert be.result(rid) == expected


def test_tp_quantized_params_shard(rng):
    """int8-quantized trees shard through the same specs (kernel_q keeps the
    kernel spec; per-channel scales drop the contraction axis)."""
    from omchat_tpu.ops.linear import quantize_tree

    cfg = OmChatConfig.tiny()
    qparams = quantize_tree(_tiny_params(cfg))
    mesh = create_mesh(tp=2)
    sharded = shard_params(qparams, mesh, omchat_param_specs(cfg, qparams))
    gate = sharded["language_model"]["layers"]["mlp"]["gate_proj"]
    assert gate["kernel_q"].sharding.spec == P(None, None, "model")
    assert gate["scale"].sharding.spec == P(None, "model")

    gen = GenerationConfig(max_new_tokens=3, eos_token_id=-1)
    ref = OmChatEngine(cfg, qparams, attn_impl="xla", prompt_bucket=8).generate([[5, 6, 7]], None, gen)
    out = OmChatEngine(cfg, sharded, attn_impl="xla", prompt_bucket=8).generate([[5, 6, 7]], None, gen)
    assert out.token_ids == ref.token_ids


def test_fsdp_param_sharding_applies(rng):
    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    mesh = create_mesh(tp=2)
    specs = omchat_param_specs(cfg, params, fsdp=True)
    sharded = shard_params(params, mesh, specs)
    k = sharded["language_model"]["layers"]["self_attn"]["q_proj"]["kernel"]
    # sharded over both data (dim 1) and model (dim 2)
    assert k.sharding.spec == P(None, "data", "model")


def test_vocab_parallel_ce_matches_dense(rng):
    from omchat_tpu.ops.cross_entropy import cross_entropy_loss, vocab_parallel_cross_entropy

    mesh = create_mesh(tp=4, dp=2)
    b, s, d, v = 2, 6, 16, 64
    hidden = jnp.asarray(rng.standard_normal((b, s, d)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((d, v)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, v, size=(b, s)))
    labels = labels.at[0, :2].set(-100)

    dense, _ = cross_entropy_loss(hidden @ kernel, labels)
    sharded = vocab_parallel_cross_entropy(hidden, kernel, labels, mesh)
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-6)


def test_train_step_runs_sharded(rng):
    import optax

    from omchat_tpu.models.omchat import plan_multimodal_merge
    from omchat_tpu.parallel.sharding import shard_params
    from omchat_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_sharded_train_step,
    )

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    mesh = create_mesh(tp=2, dp=4)
    specs = omchat_param_specs(cfg, params, fsdp=False)

    optimizer = make_optimizer(lr=1e-4)
    step_fn, batch_shardings, param_shardings = make_sharded_train_step(
        cfg, mesh, specs, optimizer
    )

    params = shard_params(params, mesh, specs)
    state = init_train_state(params, optimizer)

    # batch of 4 identical multimodal samples
    ids = [5, 6, -200, 7, 8]
    plan = plan_multimodal_merge([ids] * 4, cfg.image_seq_len, bucket=8)
    labels = np.where(plan.is_image, -100, plan.token_ids)
    labels[plan.positions == 0] = -100
    pixels = rng.standard_normal((4, 3, 56, 56)).astype(np.float32)

    batch = {
        "token_ids": jnp.asarray(plan.token_ids),
        "is_image": jnp.asarray(plan.is_image),
        "image_index": jnp.asarray(plan.image_index),
        "positions": jnp.asarray(plan.positions),
        "labels": jnp.asarray(labels),
        "pixel_values": jnp.asarray(pixels),
    }
    batch = {k: jax.device_put(v, batch_shardings[k]) for k, v in batch.items()}

    state2, loss1 = step_fn(state, cfg, batch)
    state3, loss2 = step_fn(state2, cfg, batch)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert float(loss2) < float(loss1)  # one step on same batch reduces loss
    assert int(state3.step) == 2


def test_sequence_parallel_train_step_matches(rng):
    """Megatron-SP activation sharding (sequence over `model`) produces the
    same loss as the plain TP step."""
    from omchat_tpu.models.omchat import plan_multimodal_merge
    from omchat_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_sharded_train_step,
    )

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    mesh = create_mesh(tp=2, dp=4)
    specs = omchat_param_specs(cfg, params)
    optimizer = make_optimizer(lr=1e-4)

    ids = [5, 6, 7, 8, 9, 10, 11, 12]  # merged len buckets to 8 (seq % tp == 0)
    plan = plan_multimodal_merge([ids] * 4, cfg.image_seq_len, bucket=8)
    labels = np.where(plan.is_image, -100, plan.token_ids)
    batch_np = {
        "token_ids": plan.token_ids,
        "is_image": plan.is_image,
        "image_index": plan.image_index,
        "positions": plan.positions,
        "labels": labels,
    }

    losses = []
    for sp in (False, True):
        step_fn, batch_shardings, _ = make_sharded_train_step(
            cfg, mesh, specs, optimizer, sequence_parallel=sp
        )
        sharded = shard_params(params, mesh, specs)
        state = init_train_state(sharded, optimizer)
        batch = {
            k: jax.device_put(jnp.asarray(v), batch_shardings[k]) for k, v in batch_np.items()
        }
        _, loss = step_fn(state, cfg, batch)
        losses.append(float(loss))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_moe_expert_parallel_matches_single_device(rng):
    """Expert-parallel (expert axis over `model`) MoE forward == unsharded."""
    import jax.numpy as jnp

    from omchat_tpu.config import TextConfig
    from omchat_tpu.models.qwen2 import embed_tokens, lm_head
    from omchat_tpu.models.qwen2_moe import init_params as moe_init, qwen2_moe_forward
    from omchat_tpu.parallel.sharding import qwen2_param_specs

    cfg = TextConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_experts=8,
        num_experts_per_tok=2,
        moe_intermediate_size=16,
        shared_expert_intermediate_size=32,
    )
    params = moe_init(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 12)))
    x = embed_tokens(params, ids)
    pos = jnp.arange(12)[None]

    ref, _ = qwen2_moe_forward(params, cfg, x, pos, attn_impl="xla")
    ref_logits = lm_head(params, cfg, ref)

    mesh = create_mesh(tp=4, dp=2)
    sharded = shard_params(params, mesh, qwen2_param_specs(cfg))
    out, _ = qwen2_moe_forward(sharded, cfg, x, pos, attn_impl="xla")
    out_logits = lm_head(sharded, cfg, out)
    np.testing.assert_allclose(np.asarray(out_logits), np.asarray(ref_logits), atol=1e-5, rtol=1e-4)


def test_grad_clip_and_accum():
    """grad_clip bounds the global update norm; grad_accum=k changes params
    only on every k-th step and matches the mean-gradient single step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from omchat_tpu.training.train_step import make_optimizer

    params = {"w": jnp.zeros((4,), jnp.float32)}

    # clipping: a huge gradient produces an update whose pre-adam norm is clipped
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1.0))
    st = tx.init(params)
    upd, _ = tx.update({"w": jnp.full((4,), 100.0)}, st, params)
    assert np.linalg.norm(np.asarray(upd["w"])) <= 1.0 + 1e-5

    # accumulation: k=3 micro-steps -> params move once, equal to mean grad
    k = 3
    tx = make_optimizer(lr=0.1, grad_clip=None, grad_accum=k)
    # swap adamw for sgd-like check via the real API: use adamw but only
    # verify the *timing* of updates (zero until the k-th micro-batch)
    st = tx.init(params)
    p = params
    grads = [{"w": jnp.full((4,), g)} for g in (1.0, 2.0, 3.0)]
    for i, g in enumerate(grads):
        upd, st = tx.update(g, st, p)
        moved = float(jnp.abs(upd["w"]).max())
        if i < k - 1:
            assert moved == 0.0  # accumulating
        else:
            assert moved > 0.0  # the real update fires
        p = optax.apply_updates(p, upd)
