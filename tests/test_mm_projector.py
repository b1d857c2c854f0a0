"""Stage-1 projector-only training (the reference's tune_mm_mlp_adapter /
pretrain_mm_mlp_adapter contract, omchat_arch.py:238-247): the projector-only
checkpoint round-trips, the reference's torch mm_projector.bin layout loads,
and a stage-1 optimizer updates ONLY the projector."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.checkpoint.loader import load_mm_projector
from omchat_tpu.checkpoint.save import save_mm_projector
from omchat_tpu.config import OmChatConfig

sys.path.insert(0, "cli")


@pytest.fixture(scope="module")
def setup():
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    return cfg, _tiny_params(cfg)


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(lb[path], np.float32),
            atol=1e-2, rtol=1e-2)  # bf16 file dtype


def test_save_load_roundtrip(setup, tmp_path):
    cfg, params = setup
    path = save_mm_projector(str(tmp_path), params["projector"])
    assert path.endswith("mm_projector.safetensors")
    loaded = load_mm_projector(str(tmp_path))
    _trees_equal(params["projector"], loaded)
    # direct file path also accepted
    _trees_equal(params["projector"], load_mm_projector(path))


def test_reference_bin_layout_loads(setup, tmp_path):
    """The reference's HF-Trainer artifact: torch .bin with
    model.mm_projector.<sequential-index> keys."""
    import torch

    cfg, params = setup
    proj = params["projector"]
    state = {}
    for i, name in ((0, "linear_1"), (2, "linear_2")):
        state[f"model.mm_projector.{i}.weight"] = torch.tensor(
            np.asarray(proj[name]["kernel"], np.float32).T)
        state[f"model.mm_projector.{i}.bias"] = torch.tensor(
            np.asarray(proj[name]["bias"], np.float32))
    state["model.norm.weight"] = torch.zeros(4)  # non-projector keys filtered
    torch.save(state, tmp_path / "mm_projector.bin")
    loaded = load_mm_projector(str(tmp_path))
    _trees_equal(proj, loaded)


def test_stage1_updates_projector_only(setup, rng):
    """Two synthetic steps with the stage-1 mask: projector moves, tower and
    LLM stay bitwise frozen."""
    import optax

    from omchat_tpu.training.train_step import init_train_state, train_step
    from train import synthetic_batch

    cfg, params = setup
    tx = optax.adamw(1e-2)
    labels = {
        k: jax.tree.map(lambda _, grp=k: "train" if grp == "projector" else "freeze", v)
        for k, v in params.items()
    }
    tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    state = init_train_state(params, tx)
    batch = synthetic_batch(cfg, 2, np.random.default_rng(0))
    for _ in range(2):
        state, loss = train_step(state, cfg, batch, tx, attn_impl="xla", remat=False)
    assert np.isfinite(float(loss))
    for group in ("vision_tower", "language_model"):
        for (path, before), (_, after) in zip(
            jax.tree_util.tree_leaves_with_path(params[group]),
            jax.tree_util.tree_leaves_with_path(state.params[group]),
        ):
            assert np.array_equal(np.asarray(before), np.asarray(after)), f"{group}{path} moved"
    moved = [
        not np.array_equal(np.asarray(b), np.asarray(a))
        for (_, b), (_, a) in zip(
            jax.tree_util.tree_leaves_with_path(params["projector"]),
            jax.tree_util.tree_leaves_with_path(state.params["projector"]),
        )
    ]
    assert all(moved), "projector leaves did not update"
