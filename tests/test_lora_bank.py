"""Multi-LoRA serving bank: per-row adapter application through the trunk
matches merging each adapter into the base weights (the single-adapter truth
path, training/lora.py merge_lora)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.config import OmChatConfig
from omchat_tpu.models.qwen2 import qwen2_forward
from omchat_tpu.training.lora import (
    ALL_TARGETS,
    build_lora_bank,
    init_lora,
    merge_lora,
)


@pytest.fixture(scope="module")
def setup():
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)

    def randomize(lora, key):
        # init_lora zeroes b (identity adapter); give every leaf signal so the
        # parity check is meaningful, with per-adapter distinct values.
        leaves, tree = jax.tree_util.tree_flatten(lora["layers"])
        keys = jax.random.split(key, len(leaves))
        leaves = [
            (jax.random.normal(k, leaf.shape) * 0.1).astype(leaf.dtype)
            for k, leaf in zip(keys, leaves)
        ]
        return {"layers": jax.tree_util.tree_unflatten(tree, leaves), "scale": lora["scale"]}

    k = jax.random.PRNGKey(0)
    lora1 = randomize(init_lora(k, params, rank=4, alpha=8.0), jax.random.fold_in(k, 1))
    lora2 = randomize(
        init_lora(k, params, rank=2, targets=ALL_TARGETS), jax.random.fold_in(k, 2)
    )
    return cfg, params, [lora1, lora2]


def _trunk(cfg, params, embeds, lora_bank=None, adapter_ids=None):
    positions = jnp.broadcast_to(jnp.arange(embeds.shape[1]), embeds.shape[:2])
    hidden, _ = qwen2_forward(
        params["language_model"],
        cfg.text,
        embeds,
        positions,
        attn_impl="xla",
        lora_bank=lora_bank,
        adapter_ids=adapter_ids,
    )
    return hidden


def test_bank_row0_is_base(setup):
    cfg, params, adapters = setup
    bank = build_lora_bank(adapters, dtype=jnp.float32)
    embeds = jax.random.normal(jax.random.PRNGKey(3), (2, 8, cfg.text.hidden_size))
    base = _trunk(cfg, params, embeds)
    banked = _trunk(cfg, params, embeds, bank, jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(banked), np.asarray(base), atol=1e-5)


def test_bank_matches_merged_weights(setup):
    """Each bank row reproduces merge_lora(base, adapter) — incl. differing
    ranks (4 vs 2, zero-padded) and target sets (attn-only vs all)."""
    cfg, params, adapters = setup
    bank = build_lora_bank(adapters, dtype=jnp.float32)
    embeds = jax.random.normal(jax.random.PRNGKey(4), (1, 8, cfg.text.hidden_size))
    for i, lora in enumerate(adapters):
        merged = merge_lora(params, lora)
        truth = _trunk(cfg, merged, embeds)
        banked = _trunk(cfg, params, embeds, bank, jnp.full((1,), i + 1, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(banked), np.asarray(truth), atol=2e-2, rtol=1e-2
        )


def test_mixed_batch_rows_independent(setup):
    """A [base, adapter1, adapter2] batch: every row equals its own
    single-adapter run — adapters don't leak across batch rows."""
    cfg, params, adapters = setup
    bank = build_lora_bank(adapters, dtype=jnp.float32)
    embeds = jax.random.normal(jax.random.PRNGKey(5), (3, 8, cfg.text.hidden_size))
    mixed = _trunk(cfg, params, embeds, bank, jnp.asarray([0, 1, 2], jnp.int32))
    for row, ident in enumerate([None, adapters[0], adapters[1]]):
        p = params if ident is None else merge_lora(params, ident)
        solo = _trunk(cfg, p, embeds[row : row + 1])
        np.testing.assert_allclose(
            np.asarray(mixed[row]), np.asarray(solo[0]), atol=2e-2, rtol=1e-2
        )


def test_mixed_adapter_continuous_batch(setup):
    """Three concurrent requests under different adapters (base, 1, 2) in one
    BatchEngine: each request's greedy tokens equal its own merged-weights
    single-request run — per-slot adapters don't cross-contaminate the shared
    decode step."""
    from omchat_tpu.runtime.batch_engine import BatchEngine
    from omchat_tpu.runtime.generate import OmChatEngine
    from omchat_tpu.config import GenerationConfig

    cfg, params, adapters = setup
    prompts = [[7, 11, 13], [5, 23, 29, 31], [3, 37]]
    gen = GenerationConfig(max_new_tokens=5, eos_token_id=-1)

    truth = []
    for ids, lora in zip(prompts, [None, adapters[0], adapters[1]]):
        p = params if lora is None else merge_lora(params, lora)
        eng = OmChatEngine(cfg, p, attn_impl="xla", prompt_bucket=8)
        truth.append(eng.generate([ids], None, gen).token_ids[0])

    bank = build_lora_bank(adapters, dtype=jnp.float32)
    be = BatchEngine(cfg, params, max_slots=4, max_len=64, chunk_size=16,
                     attn_impl="xla", lora_bank=bank)
    rids = [
        be.submit(ids, None, max_new_tokens=5, eos_token_id=-1, adapter_id=a)
        for ids, a in zip(prompts, [0, 1, 2])
    ]
    be.run_to_completion()
    for rid, want in zip(rids, truth):
        assert be.result(rid) == want

    with pytest.raises(ValueError):
        be.submit([1, 2], None, adapter_id=3)


def test_bank_through_decode_cache(setup):
    """Prefill+decode with a cache under a bank: greedy continuation equals
    the merged-weights engine run (adapter applied consistently across
    prefill and per-token decode)."""
    from omchat_tpu.runtime.generate import OmChatEngine
    from omchat_tpu.config import GenerationConfig

    cfg, params, adapters = setup
    gen = GenerationConfig(max_new_tokens=6, eos_token_id=-1)
    ids = [[7, 11, 13, 17, 19]]

    merged_engine = OmChatEngine(cfg, merge_lora(params, adapters[0]), attn_impl="xla", prompt_bucket=8)
    truth = merged_engine.generate(ids, None, gen).token_ids[0]

    bank = build_lora_bank(adapters, dtype=jnp.float32)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8, lora_bank=bank)
    out = engine.generate(ids, None, gen, adapter_id=1).token_ids[0]
    assert out == truth

    base_truth = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8).generate(
        ids, None, gen
    ).token_ids[0]
    assert engine.generate(ids, None, gen, adapter_id=0).token_ids[0] == base_truth
