"""trust_remote_code export: the bundle loads through stock transformers and
matches the JAX engine.

The reference's converter output loads via ``AutoModel.from_pretrained(...,
trust_remote_code=True)`` (/root/reference/hf_example.py:9-16); this pins the
same interop for our export: export a tiny checkpoint, load it back through
transformers' dynamic-module machinery (pure torch CPU fp32), and check the
greedy tokens equal the JAX engine's.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, "tests")


@pytest.fixture(scope="module")
def exported_bundle(tmp_path_factory):
    from tests.test_api_e2e import _write_tiny_checkpoint, _write_tiny_tokenizer

    from omchat_tpu.checkpoint.loader import load_omchat_checkpoint
    from omchat_tpu.checkpoint.save import export_hf_bundle

    tmp_path = tmp_path_factory.mktemp("trc")
    src = tmp_path / "src"
    src.mkdir()
    _write_tiny_tokenizer(str(src))
    _write_tiny_checkpoint(str(src))
    out = tmp_path / "bundle"
    config, params = load_omchat_checkpoint(str(src), jnp.float32)
    export_hf_bundle(config, params, str(out), source_dir=str(src))
    return str(out)


def test_bundle_has_code_and_auto_map(exported_bundle):
    import json
    import os

    for name in (
        "modeling_omchat.py",
        "configuration_omchat.py",
        "processing_omchat.py",
        "image_processing_omchat.py",
    ):
        assert os.path.exists(os.path.join(exported_bundle, name)), name
    cfg = json.load(open(os.path.join(exported_bundle, "config.json")))
    assert cfg["auto_map"]["AutoModel"] == "modeling_omchat.OmChatForConditionalGeneration"
    pre = json.load(open(os.path.join(exported_bundle, "preprocessor_config.json")))
    assert "AutoImageProcessor" in pre["auto_map"]


def test_automodel_greedy_matches_jax_engine(exported_bundle):
    """AutoModel(trust_remote_code) torch fp32 greedy == JAX engine greedy,
    same image+text inputs, token for token."""
    import torch
    from PIL import Image
    from transformers import AutoModel, AutoProcessor

    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.config import GenerationConfig

    jax_model = load_pretrained_model(exported_bundle, dtype=jnp.float32, attn_impl="xla")

    torch_model = AutoModel.from_pretrained(
        exported_bundle, trust_remote_code=True, torch_dtype=torch.float32
    )
    torch_model.eval()
    processor = AutoProcessor.from_pretrained(exported_bundle, trust_remote_code=True)

    rng = np.random.default_rng(0)
    image = Image.fromarray(rng.integers(0, 255, (90, 120, 3), dtype=np.uint8))
    text = "What is this?"

    # the exported processor and the engine-side processor agree on inputs
    # (images to fp32 rounding: the engine side runs the fused C++ host
    # pipeline, the exported code is pure numpy)
    torch_inputs = processor(text, images=image)
    jax_inputs = jax_model.processor(text, images=image)
    np.testing.assert_array_equal(
        torch_inputs["input_ids"].numpy()[0], jax_inputs["input_ids"][0]
    )
    np.testing.assert_allclose(
        torch_inputs["images"].numpy(), jax_inputs["images"], atol=1e-6
    )

    n_new = 6
    with torch.no_grad():
        out = torch_model.generate(
            input_ids=torch_inputs["input_ids"],
            images=torch_inputs["images"],
            max_new_tokens=n_new,
            do_sample=False,
        )
    torch_tokens = out[0, torch_inputs["input_ids"].shape[1] :].tolist()

    # same inputs on both sides (torch processor outputs), token-for-token
    jax_out = jax_model.engine.generate(
        [torch_inputs["input_ids"].numpy()[0].tolist()],
        torch_inputs["images"].numpy(),
        GenerationConfig(max_new_tokens=n_new, eos_token_id=-1),
    )
    assert torch_tokens == list(jax_out.token_ids[0])


def test_parity_runbook_reports_full_match(exported_bundle):
    """cli/parity's harness: export → reload → 100% argmax match against the
    torch twin, with per-module deltas (the VERDICT round-3 'done' criterion)."""
    from PIL import Image

    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.eval.parity import load_torch_twin, run_parity

    model = load_pretrained_model(exported_bundle, dtype=jnp.float32, attn_impl="xla")
    torch_model, source = load_torch_twin(exported_bundle, jax_params=model.engine.params)
    assert source == "remote_code"

    rng = np.random.default_rng(3)
    image = Image.fromarray(rng.integers(0, 255, (70, 100, 3), dtype=np.uint8))
    inputs = model.processor("describe", images=image)
    report = run_parity(
        model,
        torch_model,
        inputs["input_ids"][0].tolist(),
        np.asarray(inputs["images"], np.float32),
        max_new_tokens=6,
        per_module=True,
    )
    assert report["argmax_match_rate"] == 1.0
    assert report["first_divergence_step"] is None
    assert report["engine_matches_torch"]
    assert report["max_logit_diff"] < 1e-4
    assert report["per_module"]["tower_features"]["max_abs"] < 1e-4
    assert report["per_module"]["projector"]["max_abs"] < 1e-4


def test_parity_in_repo_twin(exported_bundle, tmp_path):
    """A checkpoint without code files parity-checks through the in-repo twin."""
    import json
    import os
    import shutil

    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.eval.parity import load_torch_twin, run_parity

    plain = tmp_path / "plain"
    plain.mkdir()
    for name in os.listdir(exported_bundle):
        if name.endswith(".py"):
            continue
        shutil.copy(os.path.join(exported_bundle, name), plain / name)
    cfg = json.load(open(plain / "config.json"))
    cfg.pop("auto_map", None)
    json.dump(cfg, open(plain / "config.json", "w"))

    model = load_pretrained_model(str(plain), dtype=jnp.float32, attn_impl="xla")
    torch_model, source = load_torch_twin(str(plain), jax_params=model.engine.params)
    assert source == "in-repo-twin"
    inputs = model.processor("hello there")
    report = run_parity(
        model, torch_model, inputs["input_ids"][0].tolist(), None, max_new_tokens=5
    )
    assert report["argmax_match_rate"] == 1.0 and report["engine_matches_torch"]


def test_automodel_text_only_matches(exported_bundle):
    import torch
    from transformers import AutoModel, AutoProcessor

    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.config import GenerationConfig

    jax_model = load_pretrained_model(exported_bundle, dtype=jnp.float32, attn_impl="xla")
    torch_model = AutoModel.from_pretrained(
        exported_bundle, trust_remote_code=True, torch_dtype=torch.float32
    )
    torch_model.eval()
    processor = AutoProcessor.from_pretrained(exported_bundle, trust_remote_code=True)

    inputs = processor("tell me a story")
    with torch.no_grad():
        out = torch_model.generate(
            input_ids=inputs["input_ids"], max_new_tokens=5, do_sample=False
        )
    torch_tokens = out[0, inputs["input_ids"].shape[1] :].tolist()

    jax_out = jax_model.engine.generate(
        [inputs["input_ids"].numpy()[0].tolist()],
        None,
        GenerationConfig(max_new_tokens=5, eos_token_id=-1),
    )
    assert torch_tokens == list(jax_out.token_ids[0])
