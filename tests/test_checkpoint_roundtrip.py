"""Checkpoint round-trips: pytree → safetensors(HF layout) → pytree; orbax resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.config import OmChatConfig
from omchat_tpu.checkpoint.loader import convert_omchat_state_dict, load_safetensors_dir
from omchat_tpu.checkpoint.save import flatten_to_hf_state, save_hf_safetensors


def test_safetensors_roundtrip(tmp_path, rng):
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)

    save_hf_safetensors(params, str(tmp_path))
    state = load_safetensors_dir(str(tmp_path))
    params2 = convert_omchat_state_dict(state, cfg, dtype=jnp.float32)

    flat1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(params2)}
    for path, leaf in flat1:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat2[key]), atol=0, rtol=0, err_msg=key)


def test_repo_native_key_layout_loads(tmp_path):
    """The loader accepts the repo-native key naming (model.vision_tower...,
    model.mm_projector.0/2, lm_head) via the converter key map."""
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    hf_state = flatten_to_hf_state(params)

    # rename HF layout → repo-native layout (inverse of KEYS_TO_MODIFY_MAPPING)
    native = {}
    for k, v in hf_state.items():
        if k.startswith("vision_tower."):
            k = "model.vision_tower." + k
        elif k.startswith("multi_modal_projector.linear_"):
            idx = int(k.split("linear_")[1][0])
            kind = k.split(".")[-1]  # weight | bias
            k = f"model.mm_projector.{(idx - 1) * 2}.{kind}"
        elif k.startswith("language_model.lm_head"):
            k = k[len("language_model.") :]
        elif k.startswith("language_model.model."):
            k = k[len("language_model.") :]
        native[k] = v

    params2 = convert_omchat_state_dict(native, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(params2["language_model"]["embed_tokens"]),
        np.asarray(params["language_model"]["embed_tokens"]),
    )
    np.testing.assert_allclose(
        np.asarray(params2["projector"]["linear_1"]["kernel"]),
        np.asarray(params["projector"]["linear_1"]["kernel"]),
    )
    np.testing.assert_allclose(
        np.asarray(params2["vision_tower"]["layers"]["attn"]["qkv"]["kernel"]),
        np.asarray(params["vision_tower"]["layers"]["attn"]["qkv"]["kernel"]),
    )


def test_config_hf_dict_roundtrip():
    """to_hf_dict → from_hf_dict is the identity on the modeled fields."""
    import dataclasses

    from omchat_tpu.config import ProjectorConfig, RopeScalingConfig, TextConfig

    cfg = OmChatConfig.tiny()
    cfg = dataclasses.replace(
        cfg,
        projector=ProjectorConfig.from_type("cabstract", n_query=36),
        text=dataclasses.replace(
            cfg.text, rope_scaling=RopeScalingConfig(rope_type="dynamic", factor=2.0)
        ),
        tokenizer_model_max_length=4096,
    )
    assert OmChatConfig.from_hf_dict(cfg.to_hf_dict()) == cfg


def test_export_hf_bundle_loads_end_to_end(tmp_path):
    """cli/convert's export_hf_bundle writes a complete directory that
    load_pretrained_model opens and generates from (the full save_pretrained
    surface of the reference converter, convert_omchat_to_hf.py:80-106)."""
    import json
    import sys

    sys.path.insert(0, "tests")
    from tests.test_api_e2e import _write_tiny_checkpoint, _write_tiny_tokenizer

    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.checkpoint.loader import load_omchat_checkpoint
    from omchat_tpu.checkpoint.save import export_hf_bundle
    from omchat_tpu.config import GenerationConfig

    src = tmp_path / "src"
    src.mkdir()
    _write_tiny_tokenizer(str(src))
    _write_tiny_checkpoint(str(src))

    out = tmp_path / "hf_bundle"
    config, params = load_omchat_checkpoint(str(src), jnp.float32)
    export_hf_bundle(config, params, str(out), source_dir=str(src))

    names = {p.name for p in out.iterdir()}
    assert "config.json" in names and "preprocessor_config.json" in names
    assert "processor_config.json" in names
    assert any(n.endswith(".safetensors") for n in names)
    cfg_json = json.loads((out / "config.json").read_text())
    assert cfg_json["model_type"] == "omchat"
    assert OmChatConfig.from_hf_dict(cfg_json) == config

    model = load_pretrained_model(str(out), dtype=jnp.float32, attn_impl="xla")
    reply = model.chat("hi", generation=GenerationConfig(max_new_tokens=3, eos_token_id=-1))
    assert isinstance(reply, str)


def test_orbax_train_checkpoint_resume(tmp_path):
    import optax

    from omchat_tpu.checkpoint.save import TrainCheckpointer
    from omchat_tpu.training.train_step import init_train_state, make_optimizer
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    opt = make_optimizer()
    state = init_train_state(params, opt)

    ckpt = TrainCheckpointer(str(tmp_path / "ckpt"))
    assert ckpt.latest_step() is None
    ckpt.save(3, state)

    restored, step = ckpt.restore(jax.tree.map(jnp.zeros_like, state))
    assert step == 3
    np.testing.assert_allclose(
        np.asarray(restored.params["language_model"]["embed_tokens"]),
        np.asarray(state.params["language_model"]["embed_tokens"]),
    )
