"""LoRA / QLoRA adapters: zero-init identity, adapter-only gradients, loss
descent, merge parity, and the int8 (QLoRA) base path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from omchat_tpu.config import OmChatConfig
from omchat_tpu.training.lora import (
    apply_lora,
    init_lora,
    lora_loss_fn,
    lora_train_step,
    merge_lora,
)
from omchat_tpu.training.train_step import loss_fn


@pytest.fixture(scope="module")
def setup():
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    return cfg, _tiny_params(cfg)


def _batch(cfg, rng, B=2, M=24):
    ids = rng.integers(5, cfg.text.vocab_size - 1, (B, M))
    return {
        "token_ids": jnp.asarray(ids),
        "is_image": jnp.zeros((B, M), bool),
        "image_index": jnp.zeros((B, M), jnp.int32),
        "positions": jnp.broadcast_to(jnp.arange(M), (B, M)),
        "labels": jnp.asarray(ids),
        "pixel_values": None,
    }


def test_zero_init_is_identity(setup, rng):
    cfg, params = setup
    lora = init_lora(jax.random.PRNGKey(0), params, rank=4)
    batch = _batch(cfg, rng)
    base, _ = loss_fn(params, cfg, batch, attn_impl="xla", remat=False)
    adapted, _ = lora_loss_fn(lora, params, cfg, batch, attn_impl="xla", remat=False)
    np.testing.assert_allclose(float(base), float(adapted), rtol=1e-6)


def test_gradients_only_on_adapters_and_loss_descends(setup, rng):
    cfg, params = setup
    lora = init_lora(jax.random.PRNGKey(1), params, rank=4)
    # adapter tree is rank-sized: a [L, in, r], b [L, r, out] for 4 targets
    n_leaves = len(jax.tree.leaves(lora))
    assert n_leaves == 4 * 2 + 1  # q/k/v/o x (a, b) + scale

    batch = _batch(cfg, rng)
    opt = optax.adam(5e-3)
    opt_state = opt.init(lora)
    losses = []
    for _ in range(8):
        lora, opt_state, loss = lora_train_step(
            lora, opt_state, params, cfg, batch, opt, attn_impl="xla", remat=False
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # b moved away from zero (gradient actually reached the adapters)
    b = lora["layers"]["self_attn"]["q_proj"]["b"]
    assert float(jnp.abs(b).max()) > 0


def test_merge_matches_adapter_forward(setup, rng):
    cfg, params = setup
    lora = init_lora(jax.random.PRNGKey(2), params, rank=4)
    # give b real values so the delta is nonzero
    lora = jax.tree.map(
        lambda x: x + 0.01 if getattr(x, "ndim", 0) == 3 else x, lora
    )
    batch = _batch(cfg, rng)
    via_adapter, _ = lora_loss_fn(lora, params, cfg, batch, attn_impl="xla", remat=False)
    merged = merge_lora(params, lora)
    via_merged, _ = loss_fn(merged, cfg, batch, attn_impl="xla", remat=False)
    np.testing.assert_allclose(float(via_adapter), float(via_merged), rtol=1e-5)
    base, _ = loss_fn(params, cfg, batch, attn_impl="xla", remat=False)
    assert abs(float(base) - float(via_adapter)) > 1e-6  # delta is real


def test_qlora_int8_base(setup, rng):
    """Adapters train over an int8-quantized base (QLoRA): apply_lora
    dequantizes the target kernels; the merged model can re-quantize and
    still run the w8a8 path."""
    from omchat_tpu.ops.linear import quantize_tree

    cfg, params = setup
    qparams = dict(params)
    qlm = dict(params["language_model"])
    qlm["layers"] = quantize_tree(qlm["layers"])
    qparams["language_model"] = qlm

    lora = init_lora(jax.random.PRNGKey(3), qparams, rank=4)
    batch = _batch(cfg, rng)
    opt = optax.adam(5e-3)
    opt_state = opt.init(lora)
    losses = []
    for _ in range(6):
        lora, opt_state, loss = lora_train_step(
            lora, opt_state, qparams, cfg, batch, opt, attn_impl="xla", remat=False
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses

    merged = merge_lora(qparams, lora, quantize=True)
    assert "kernel_q" in merged["language_model"]["layers"]["self_attn"]["q_proj"]
    loss_q, _ = loss_fn(merged, cfg, batch, attn_impl="xla", remat=False)
    assert np.isfinite(float(loss_q))


def test_adapter_save_load_roundtrip(setup, rng, tmp_path):
    """save_lora_adapter → load_lora_adapter reproduces the adapter exactly;
    the merged model matches an in-memory merge."""
    from omchat_tpu.checkpoint.loader import load_lora_adapter
    from omchat_tpu.checkpoint.save import save_lora_adapter

    cfg, params = setup
    lora = init_lora(jax.random.PRNGKey(4), params, rank=4, alpha=8.0)
    lora = jax.tree.map(
        lambda x: x + 0.02 if getattr(x, "ndim", 0) == 3 else x, lora
    )
    save_lora_adapter(str(tmp_path / "ad"), lora, base_model="tiny")
    loaded = load_lora_adapter(str(tmp_path / "ad"))

    assert loaded["scale"] == lora["scale"] == 2.0
    for group, adapters in lora["layers"].items():
        for name, ab in adapters.items():
            got = loaded["layers"][group][name]
            np.testing.assert_array_equal(np.asarray(got["a"]), np.asarray(ab["a"]))
            np.testing.assert_array_equal(np.asarray(got["b"]), np.asarray(ab["b"]))

    batch = _batch(cfg, rng)
    want, _ = loss_fn(merge_lora(params, lora), cfg, batch, attn_impl="xla", remat=False)
    got, _ = loss_fn(merge_lora(params, loaded), cfg, batch, attn_impl="xla", remat=False)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    import json
    meta = json.loads((tmp_path / "ad" / "adapter_config.json").read_text())
    assert meta["rank"] == 4 and meta["base_model"] == "tiny"
    assert set(meta["targets"]) == {"q_proj", "k_proj", "v_proj", "o_proj"}
