"""Vocab extension for multimodal fine-tuning — the functional equivalent of
the reference's initialize_vision_tokenizer (omchat_arch.py:211-253)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.config import OmChatConfig
from omchat_tpu.training.vision_tokenizer import initialize_vision_tokenizer


class FakeTokenizer:
    """add_tokens/len subset of the HF tokenizer API."""

    def __init__(self, size: int):
        self.size = size
        self.added = []

    def add_tokens(self, tokens, special_tokens=False):
        new = [t for t in tokens if t not in self.added]
        self.added.extend(new)
        self.size += len(new)
        return len(new)

    def __len__(self):
        return self.size


@pytest.fixture()
def setup():
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    return cfg, _tiny_params(cfg)


def test_extend_vocab_mean_init(setup):
    cfg, params = setup
    v = cfg.text.vocab_size
    tok = FakeTokenizer(v)
    old_embed = np.asarray(params["language_model"]["embed_tokens"])
    old_head = np.asarray(params["language_model"]["lm_head"]["kernel"])

    new_params, new_tc, mask = initialize_vision_tokenizer(
        params, cfg.text, tok, mm_use_im_start_end=True
    )
    assert new_tc.vocab_size == v + 2
    emb = np.asarray(new_params["language_model"]["embed_tokens"])
    head = np.asarray(new_params["language_model"]["lm_head"]["kernel"])
    # old rows untouched
    np.testing.assert_array_equal(emb[:v], old_embed)
    np.testing.assert_array_equal(head[:, :v], old_head)
    # new rows are the mean of the old ones (omchat_arch.py:223-229)
    np.testing.assert_allclose(emb[v], old_embed.mean(axis=0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(emb[v + 1], old_embed.mean(axis=0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(head[:, v], old_head.mean(axis=1), rtol=1e-5, atol=1e-6)
    # re-adding the same tokens is a no-op
    p2, tc2, _ = initialize_vision_tokenizer(new_params, new_tc, tok, mm_use_im_start_end=True)
    assert tc2.vocab_size == v + 2


def test_pretrained_rows_splice(setup):
    cfg, params = setup
    tok = FakeTokenizer(cfg.text.vocab_size)
    d = cfg.text.hidden_size
    rows = np.full((2, d), 0.5, np.float32)
    new_params, _, _ = initialize_vision_tokenizer(
        params, cfg.text, tok, mm_use_im_start_end=True, pretrain_embed_rows=rows
    )
    emb = np.asarray(new_params["language_model"]["embed_tokens"])
    np.testing.assert_allclose(emb[-2:], rows)


def test_finetune_step_on_extended_vocab(setup):
    """A train step runs on the extended vocab; the frozen lm_head stays
    bit-identical while the (trainable) embeddings move."""
    from omchat_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        train_step,
    )

    cfg, params = setup
    tok = FakeTokenizer(cfg.text.vocab_size)
    new_params, new_tc, mask = initialize_vision_tokenizer(
        params, cfg.text, tok, mm_use_im_start_end=True, tune_mm_mlp_adapter=True
    )
    cfg2 = dataclasses.replace(cfg, text=new_tc)

    opt = make_optimizer(lr=1e-2, trainable_mask=mask)
    state = init_train_state(new_params, opt)
    b, m = 2, 8
    batch = {
        "token_ids": jnp.asarray(np.full((b, m), 5, np.int32)),
        "is_image": jnp.zeros((b, m), bool),
        "image_index": jnp.zeros((b, m), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(m), (b, m)).astype(jnp.int32),
        "labels": jnp.asarray(np.full((b, m), new_tc.vocab_size - 1, np.int32)),
    }
    state2, loss = train_step(state, cfg2, batch, opt, attn_impl="xla", remat=False)
    assert np.isfinite(float(loss))
    np.testing.assert_array_equal(
        np.asarray(state2.params["language_model"]["lm_head"]["kernel"]),
        np.asarray(state.params["language_model"]["lm_head"]["kernel"]),
    )
    emb_moved = np.abs(
        np.asarray(state2.params["language_model"]["embed_tokens"])
        - np.asarray(state.params["language_model"]["embed_tokens"])
    ).max()
    assert emb_moved > 0
