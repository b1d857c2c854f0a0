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
