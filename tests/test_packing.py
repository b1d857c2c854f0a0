"""Sequence packing for SFT training: segment-isolated attention through
qwen2_forward(segment_ids=...), packer layout, and loss equivalence between
packed and unpacked batches."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.config import OmChatConfig
from omchat_tpu.constants import IGNORE_INDEX

sys.path.insert(0, "cli")


@pytest.fixture(scope="module")
def setup():
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    return cfg, _tiny_params(cfg)


def test_pack_rows_layout():
    from train import pack_rows

    rows = [
        [([1, 2, 3, 4], 2), ([5, 6, 7], 1)],  # two samples, 7 of 10 used
        [([8, 9], 1)],
    ]
    b = pack_rows(rows, 10)
    tok, pos, seg, lab = (np.asarray(b[k]) for k in ("token_ids", "positions", "segment_ids", "labels"))
    assert tok[0].tolist() == [1, 2, 3, 4, 5, 6, 7, 0, 0, 0]
    assert pos[0].tolist() == [0, 1, 2, 3, 0, 1, 2, 0, 0, 0]
    assert seg[0].tolist() == [0, 0, 0, 0, 1, 1, 1, -1, -1, -1]
    I = IGNORE_INDEX
    assert lab[0].tolist() == [I, I, 3, 4, I, I, 7, I, I, I]
    assert seg[1].tolist() == [0, 0, -1, -1, -1, -1, -1, -1, -1, -1]
    assert lab[1].tolist() == [I, 9, I, I, I, I, I, I, I, I]


def test_segment_isolation(setup, rng):
    """Hidden states of sample B are bit-identical whether it is packed next
    to sample A or A' — cross-segment attention is fully masked."""
    from omchat_tpu.models.qwen2 import embed_tokens, qwen2_forward

    cfg, params = setup
    lm = params["language_model"]
    a1 = rng.integers(5, 400, 6).tolist()
    a2 = rng.integers(5, 400, 6).tolist()
    b_ids = rng.integers(5, 400, 5).tolist()

    def run(first):
        ids = np.zeros((1, 16), np.int32)
        seg = np.full((1, 16), -1, np.int32)
        pos = np.zeros((1, 16), np.int32)
        ids[0, :6] = first
        ids[0, 6:11] = b_ids
        seg[0, :6] = 0
        seg[0, 6:11] = 1
        pos[0, :6] = np.arange(6)
        pos[0, 6:11] = np.arange(5)
        x = embed_tokens(lm, jnp.asarray(ids))
        h, _ = qwen2_forward(
            lm, cfg.text, x, jnp.asarray(pos), attn_impl="xla",
            segment_ids=jnp.asarray(seg),
        )
        return np.asarray(h[0, 6:11], np.float32)

    h1, h2 = run(a1), run(a2)
    np.testing.assert_allclose(h1, h2, rtol=0, atol=0)


def test_packed_loss_matches_unpacked(setup, rng):
    """Mean loss over the packed batch == token-weighted mean of the two
    samples' separate losses (same params, xla attention)."""
    from train import pack_rows

    from omchat_tpu.training.train_step import loss_fn

    cfg, params = setup
    s1 = (rng.integers(5, 400, 7).tolist(), 3)
    s2 = (rng.integers(5, 400, 5).tolist(), 2)

    packed = pack_rows([[s1, s2]], 16)
    loss_p, n_p = loss_fn(params, cfg, packed, attn_impl="xla", remat=False)

    tot, n_tot = 0.0, 0
    for ids, tlen in (s1, s2):
        single = pack_rows([[(ids, tlen)]], 16)
        l, n = loss_fn(params, cfg, single, attn_impl="xla", remat=False)
        tot += float(l) * int(n)
        n_tot += int(n)
    assert int(n_p) == n_tot == 5
    np.testing.assert_allclose(float(loss_p), tot / n_tot, rtol=2e-3)


def test_packed_train_step_runs_sharded(setup, rng):
    """One packed train step through the sharded path on the virtual mesh."""
    import optax

    from train import pack_rows

    from omchat_tpu.parallel.mesh import create_mesh
    from omchat_tpu.parallel.sharding import omchat_param_specs, shard_params
    from omchat_tpu.training.train_step import init_train_state, make_sharded_train_step

    cfg, params = setup
    if len(jax.devices()) < 2:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = create_mesh(tp=1, dp=2, devices=jax.devices()[:2])
    specs = omchat_param_specs(cfg, params)
    params = shard_params(params, mesh, specs)
    opt = optax.sgd(1e-3)
    step, batch_shardings, _ = make_sharded_train_step(cfg, mesh, specs, opt, remat=False)
    state = init_train_state(params, opt)

    rows = [
        [(rng.integers(5, 400, 6).tolist(), 2), (rng.integers(5, 400, 4).tolist(), 1)]
        for _ in range(2)
    ]
    batch = pack_rows(rows, 16)
    batch = {k: jax.device_put(v, batch_shardings[k]) for k, v in batch.items()}
    state2, loss = step(state, cfg, batch)
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1


def test_packed_jsonl_pipeline(tmp_path, mock_tokenizer):
    """jsonl_packed_batches: text records pack, oversize skipped, image errors."""
    import json as pyjson

    from train import jsonl_packed_batches

    cfg = OmChatConfig.tiny()
    recs = [
        {"conversations": [{"from": "human", "value": "hi"}, {"from": "gpt", "value": "yo"}]},
        {"conversations": [{"from": "human", "value": "q" * 500}, {"from": "gpt", "value": "a"}]},
        {"conversations": [{"from": "human", "value": "sup"}, {"from": "gpt", "value": "hey"}]},
    ]
    p = tmp_path / "d.jsonl"
    p.write_text("\n".join(pyjson.dumps(r) for r in recs))
    it = jsonl_packed_batches(str(p), mock_tokenizer, cfg, batch_size=1, seq_len=128)
    b = next(it)
    seg = np.asarray(b["segment_ids"])
    assert seg.max() >= 1  # at least two samples packed into the row
    assert (np.asarray(b["labels"]) != IGNORE_INDEX).sum() > 0

    recs.append({"image": "x.png", "conversations": recs[0]["conversations"]})
    p.write_text("\n".join(pyjson.dumps(r) for r in recs))
    with pytest.raises(ValueError, match="text-only"):
        next(jsonl_packed_batches(str(p), mock_tokenizer, cfg, batch_size=1, seq_len=128))
