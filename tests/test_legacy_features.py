"""Legacy-path features: beam search, spatial_unpad merge, S2 multiscale,
cosine schedule, contrastive loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.config import GenerationConfig, OmChatConfig


@pytest.fixture(scope="module")
def tiny():
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    return cfg, _tiny_params(cfg)


def test_beam1_equals_greedy(tiny):
    from omchat_tpu.runtime.beam_search import beam_search
    from omchat_tpu.runtime.generate import OmChatEngine

    cfg, params = tiny
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)
    ids = [5, 6, 7, 8, 9]
    greedy_out = engine.generate([ids], None, GenerationConfig(max_new_tokens=5, eos_token_id=-1))
    beam_out = beam_search(engine, ids, num_beams=1, max_new_tokens=5, eos_token_id=-1)
    assert beam_out == greedy_out.token_ids[0]


def test_beam_search_improves_logprob(tiny):
    from omchat_tpu.runtime.beam_search import beam_search
    from omchat_tpu.runtime.generate import OmChatEngine

    cfg, params = tiny
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)
    ids = [11, 12, 13]

    def seq_logprob(gen_tokens):
        """Total logprob of a generated continuation under the model."""
        from omchat_tpu.models.qwen2 import embed_tokens, lm_head, qwen2_forward

        full = ids + gen_tokens
        x = embed_tokens(params["language_model"], jnp.asarray([full]))
        hidden, _ = qwen2_forward(
            params["language_model"], cfg.text, x, jnp.arange(len(full))[None], attn_impl="xla"
        )
        logits = lm_head(params["language_model"], cfg.text, hidden)
        lp = jax.nn.log_softmax(logits[0, len(ids) - 1 : -1].astype(jnp.float32), axis=-1)
        return float(sum(lp[i, t] for i, t in enumerate(gen_tokens)))

    g = beam_search(engine, ids, num_beams=1, max_new_tokens=4, eos_token_id=-1)
    b = beam_search(engine, ids, num_beams=4, max_new_tokens=4, eos_token_id=-1)
    assert seq_logprob(b) >= seq_logprob(g) - 1e-4


def test_spatial_unpad_merge_shapes(rng):
    from omchat_tpu.models.spatial_merge import spatial_unpad_merge, unpad_image

    c, hw = 8, 16  # side 4
    pinpoints = [[56, 112], [112, 56], [112, 112]]
    # image 110x56 → best res 112x56 → grid 2x1 tiles
    feats = jnp.asarray(rng.standard_normal((3, hw, c)).astype(np.float32))  # thumb + 2 tiles
    newline = jnp.ones((c,), jnp.float32)
    out = spatial_unpad_merge(feats, (110, 56), pinpoints, 56, newline)
    # base hw + unpadded grid tokens (grid 4 rows × (8+1) cols minus pad crops)
    assert out.shape[-1] == c
    assert out.shape[0] > hw

    t = jnp.zeros((c, 8, 8))
    u = unpad_image(t, (200, 100))  # wide original → crop rows
    assert u.shape[1] < 8 and u.shape[2] == 8


def test_multiscale_forward_shapes(rng):
    from omchat_tpu.models.multiscale import multiscale_forward

    C = 6

    def fake_tower(x):  # [B,3,s,s] → [B, (s/14)^2, C]
        b, _, s, _ = x.shape
        l = (s // 14) ** 2
        return jnp.broadcast_to(jnp.mean(x, axis=(1, 2, 3))[:, None, None], (b, l, C))

    imgs = jnp.asarray(rng.standard_normal((2, 3, 56, 56)).astype(np.float32))
    out = multiscale_forward(fake_tower, imgs, img_sizes=(56, 112), max_split_size=56)
    assert out.shape == (2, 16, 2 * C)


def test_warmup_cosine_schedule():
    from omchat_tpu.training.schedules import warmup_cosine_schedule

    sched = warmup_cosine_schedule(1e-4, total_steps=100, warmup_steps=10, min_lr=1e-6)
    assert float(sched(0)) < float(sched(10))
    assert abs(float(sched(10)) - 1e-4) < 1e-9
    assert float(sched(100)) <= 1.1e-6


def test_clip_contrastive_loss(rng):
    from omchat_tpu.ops.contrastive import clip_contrastive_loss
    from omchat_tpu.parallel.mesh import create_mesh

    b, d = 8, 16
    img = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    txt = img + 0.01 * jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    scale = jnp.asarray(30.0)

    dense = clip_contrastive_loss(img, txt, scale)
    mesh = create_mesh(tp=1, dp=8)
    sharded = clip_contrastive_loss(img, txt, scale, mesh=mesh, axis="data")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-5)
    # matched pairs → loss far below chance (log 8)
    assert float(dense) < np.log(b) / 2
