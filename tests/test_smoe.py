"""MoE-LLaVA sparse expert options — the legacy v1 smoe config surface.

Reference knobs: num_experts / num_selected / mlp_smoe / clip_smoe
(omchat_llama.py:58-63); expert replication on adapter load (:79-82); CLIP
expert state-dict keys (:104-111).  The upstream expert modules were never
released, so parity here means: the knobs exist, route MoE-LLaVA-style
(softmax router, top-k, renormalized weighted sum), and degenerate exactly
to the dense modules when experts are replicas."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.config import OmChatConfig, ProjectorConfig
from omchat_tpu.models.projector import init_params, projector_forward
from omchat_tpu.models.smoe import (
    expert_bank,
    init_router,
    load_balancing_loss,
    replicate_expert_params,
    smoe_route,
)

E, K, D_IN, D_OUT = 4, 2, 16, 24


def _smoe_cfg(num_selected=K):
    return ProjectorConfig.from_type(
        "mlp2x_gelu", mlp_smoe=True, num_experts=E, num_selected=num_selected
    )


def test_smoe_route_matches_manual(rng):
    x = jnp.asarray(rng.standard_normal((5, D_IN)), jnp.float32)
    router = init_router(jax.random.PRNGKey(0), D_IN, E)
    combine, probs = smoe_route(router, x, K)

    logits = np.asarray(x) @ np.asarray(router["kernel"]) + np.asarray(router["bias"])
    ref_probs = np.exp(logits - logits.max(-1, keepdims=True))
    ref_probs /= ref_probs.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(probs), ref_probs, atol=1e-6)

    for t in range(5):
        top = np.argsort(-ref_probs[t])[:K]
        row = np.asarray(combine)[t]
        # selected experts carry renormalized softmax mass; others zero
        np.testing.assert_allclose(row[top], ref_probs[t][top] / ref_probs[t][top].sum(), atol=1e-6)
        assert np.all(row[[e for e in range(E) if e not in top]] == 0)
        np.testing.assert_allclose(row.sum(), 1.0, atol=1e-6)


def test_replicated_experts_match_dense_projector(rng):
    """Identical experts ⇒ smoe output == the plain mlp2x projector, for any
    router — the adapter-replication load semantics (omchat_llama.py:79-82)."""
    dense_cfg = ProjectorConfig.from_type("mlp2x_gelu")
    dense_params = init_params(jax.random.PRNGKey(1), dense_cfg, D_IN, D_OUT)
    smoe_params = {
        "router": init_router(jax.random.PRNGKey(2), D_IN, E),
        "experts": replicate_expert_params(dense_params, E),
    }
    x = jnp.asarray(rng.standard_normal((3, 7, D_IN)), jnp.float32)
    want = projector_forward(dense_params, dense_cfg, x)
    got = projector_forward(smoe_params, _smoe_cfg(), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_top1_routes_to_argmax_expert(rng):
    """num_selected=1 with a saturated router ⇒ each token's output is
    exactly its argmax expert's MLP."""
    cfg = _smoe_cfg(num_selected=1)
    params = init_params(jax.random.PRNGKey(3), cfg, D_IN, D_OUT)
    # saturate the router so top-1 is unambiguous per token
    x = jnp.asarray(rng.standard_normal((9, D_IN)), jnp.float32)
    combine, _ = smoe_route(params["router"], x, 1)
    picked = np.argmax(np.asarray(combine), -1)
    out = projector_forward(params, cfg, x)
    for t in range(9):
        ep = jax.tree.map(lambda a, e=picked[t]: a[e], params["experts"])
        want = projector_forward(ep, ProjectorConfig.from_type("mlp2x_gelu"), x[t])
        np.testing.assert_allclose(np.asarray(out[t]), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_load_balancing_loss_uniform_is_one(rng):
    x = jnp.asarray(rng.standard_normal((64, D_IN)), jnp.float32)
    router = {"kernel": jnp.zeros((D_IN, E)), "bias": jnp.zeros((E,))}
    combine, probs = smoe_route(router, x, K)
    loss = load_balancing_loss(probs, combine)
    np.testing.assert_allclose(float(loss), 1.0, atol=1e-5)


def test_expert_bank_weighted_sum(rng):
    """Hand-checkable combine: bank output is the combine-weighted sum of the
    per-expert function outputs."""
    params = {"scale": jnp.asarray(np.arange(1, E + 1, dtype=np.float32))}
    x = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)
    combine = jax.nn.softmax(jnp.asarray(rng.standard_normal((5, E)), jnp.float32))
    out = expert_bank(params, x, combine, lambda p, xx: xx * p["scale"])
    want = np.asarray(x) * (np.asarray(combine) @ np.arange(1, E + 1))[:, None]
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5, rtol=1e-5)


# ---- clip_smoe -------------------------------------------------------------


def _tiny_clip(clip_smoe=False):
    from omchat_tpu.models.clip_vit import ClipVisionConfig

    return ClipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
        clip_smoe=clip_smoe, num_experts=E, num_selected=K,
    )


def _tiny_hf_clip_state(rng):
    """A minimal HF-CLIP-shaped fp32 state dict for the converter."""
    import torch

    d, f, l, grid = 32, 64, 2, 2
    n_pos = grid * grid + 1
    s = {}

    def w(shape):
        return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.05)

    s["vision_model.embeddings.patch_embedding.weight"] = w((d, 3, 14, 14))
    s["vision_model.embeddings.class_embedding"] = w((d,))
    s["vision_model.embeddings.position_embedding.weight"] = w((n_pos, d))
    s["vision_model.pre_layrnorm.weight"] = torch.ones(d)
    s["vision_model.pre_layrnorm.bias"] = torch.zeros(d)
    for i in range(l):
        p = f"vision_model.encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            s[p + ln + ".weight"] = torch.ones(d)
            s[p + ln + ".bias"] = torch.zeros(d)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            s[p + f"self_attn.{proj}.weight"] = w((d, d))
            s[p + f"self_attn.{proj}.bias"] = w((d,))
        s[p + "mlp.fc1.weight"] = w((f, d))
        s[p + "mlp.fc1.bias"] = w((f,))
        s[p + "mlp.fc2.weight"] = w((d, f))
        s[p + "mlp.fc2.bias"] = w((d,))
    return s


def test_clip_smoe_replicated_matches_dense(rng):
    """clip_smoe with experts replicated from the dense MLP (the converter's
    fallback — the reference's expert init) and a zero router == the plain
    CLIP tower, bit for bit in fp32."""
    from omchat_tpu.models.clip_vit import clip_vit_forward, convert_hf_clip_vision

    state = _tiny_hf_clip_state(rng)
    dense = convert_hf_clip_vision(state, _tiny_clip(False), dtype=jnp.float32)
    smoe = convert_hf_clip_vision(state, _tiny_clip(True), dtype=jnp.float32)
    assert smoe["layers"]["experts"]["fc1"]["kernel"].shape == (2, E, 32, 64)
    assert "mlp" not in smoe["layers"]

    pixels = jnp.asarray(rng.standard_normal((2, 3, 28, 28)), jnp.float32)
    a = clip_vit_forward(dense, _tiny_clip(False), pixels, feature_layer=-1, attn_impl="xla")
    b = clip_vit_forward(smoe, _tiny_clip(True), pixels, feature_layer=-1, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-5)


def test_clip_smoe_expert_keys_load(rng):
    """Distinct per-expert checkpoint keys (the reference's
    ``...experts.{e}.fc*`` layout) land in the stacked bank."""
    import torch

    from omchat_tpu.models.clip_vit import convert_hf_clip_vision

    state = _tiny_hf_clip_state(rng)
    for i in range(2):
        for e in range(E):
            p = f"vision_model.encoder.layers.{i}.experts.{e}."
            state[p + "fc1.weight"] = torch.full((64, 32), float(e + 1))
            state[p + "fc1.bias"] = torch.zeros(64)
            state[p + "fc2.weight"] = torch.full((32, 64), float(e + 1))
            state[p + "fc2.bias"] = torch.zeros(32)
    params = convert_hf_clip_vision(state, _tiny_clip(True), dtype=jnp.float32)
    k = np.asarray(params["layers"]["experts"]["fc1"]["kernel"])
    for e in range(E):
        assert np.all(k[:, e] == e + 1)


def test_tower_dispatch_clip_smoe():
    from omchat_tpu.models.tower import build_vision_tower

    t = build_vision_tower("openai/clip-vit-large-patch14-336", clip_smoe=True,
                           num_experts=E, num_selected=1)
    assert t.config.clip_smoe and t.config.num_experts == E and t.config.num_selected == 1
    # InternViT ignores the knob, like the reference
    t6 = build_vision_tower("internvit-6b-448px", clip_smoe=True)
    assert not hasattr(t6.config, "clip_smoe")


def test_config_roundtrip():
    cfg = OmChatConfig.from_hf_dict(
        {"mm_projector_type": "mlp2x_gelu", "mlp_smoe": True,
         "num_experts": 8, "num_selected": 3}
    )
    p = cfg.projector
    assert p.mlp_smoe and p.num_experts == 8 and p.num_selected == 3
    d = cfg.to_hf_dict()
    assert d["mlp_smoe"] is True and d["num_experts"] == 8 and d["num_selected"] == 3
    # knobs absent ⇒ dense projector, keys omitted from the serialized config
    d2 = OmChatConfig.omchat_v2_13b().to_hf_dict()
    assert "mlp_smoe" not in d2
    assert not OmChatConfig.from_hf_dict(d2).projector.mlp_smoe


def test_smoe_projector_init_shapes():
    cfg = _smoe_cfg()
    params = init_params(jax.random.PRNGKey(0), cfg, D_IN, D_OUT)
    assert params["router"]["kernel"].shape == (D_IN, E)
    assert params["experts"]["linear_1"]["kernel"].shape == (E, D_IN, D_OUT)
    assert params["experts"]["linear_2"]["kernel"].shape == (E, D_OUT, D_OUT)


def test_smoe_projector_shards_on_mesh(rng):
    """projector_specs covers the smoe param tree (router replicated, expert
    bank sharded over the model axis) and the sharded forward matches the
    single-device output on the 8-device CPU mesh."""
    from jax.sharding import Mesh

    from omchat_tpu.parallel.sharding import projector_specs, shard_params

    cfg = _smoe_cfg()
    params = init_params(jax.random.PRNGKey(5), cfg, D_IN, 32)
    specs = projector_specs(params)
    assert specs["router"]["kernel"] == jax.sharding.PartitionSpec()
    assert specs["experts"]["linear_1"]["kernel"][-1] == "model"
    assert specs["experts"]["linear_2"]["kernel"][1] == "model"

    x = jnp.asarray(rng.standard_normal((4, 6, D_IN)), jnp.float32)
    want = projector_forward(params, cfg, x)
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    with Mesh(devs, ("data", "model")) as mesh:
        sharded = shard_params(params, mesh, specs)
        got = jax.jit(lambda p, xx: projector_forward(p, cfg, xx))(sharded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_projector_specs_unknown_structure_replicates():
    """cabstract-style (non linear_N) params get replicated specs instead of
    a mismatched tree."""
    from omchat_tpu.parallel.sharding import projector_specs

    params = {"pos_emb": jnp.zeros((1, 4, 8)), "net": {"w": jnp.zeros((3, 3))}}
    specs = projector_specs(params)
    assert specs["pos_emb"] == jax.sharding.PartitionSpec()
    assert specs["net"]["w"] == jax.sharding.PartitionSpec()
