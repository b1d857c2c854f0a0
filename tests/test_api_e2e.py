"""Full API path: build a tiny on-disk checkpoint (config.json + safetensors +
tokenizer files) and drive load_pretrained_model → chat end to end."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _write_tiny_tokenizer(d: str):
    """A minimal byte-level BPE tokenizer saved in HF format (no network)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders
    from transformers import PreTrainedTokenizerFast

    # vocab: 256 byte-alphabet entries via ByteLevel
    alphabet = pre_tokenizers.ByteLevel.alphabet()
    vocab = {ch: i for i, ch in enumerate(sorted(alphabet))}
    vocab["<|im_start|>"] = len(vocab)
    vocab["<|im_end|>"] = len(vocab)
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="<|im_end|>")
    fast.save_pretrained(d)


def _write_tiny_checkpoint(d: str):
    from omchat_tpu.config import OmChatConfig
    from omchat_tpu.checkpoint.save import save_hf_safetensors
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    save_hf_safetensors(params, d)
    config = {
        "model_type": "omchat",
        "vision_config": {
            "hidden_size": 64,
            "intermediate_size": 128,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "image_size": 56,
            "patch_size": 14,
            "qk_normalization": True,
        },
        "text_config": {
            "vocab_size": 512,
            "hidden_size": 64,
            "intermediate_size": 128,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "max_position_embeddings": 1024,
        },
        "mm_projector_type": "mlp2x_gelu",
        "image_grid_pinpoints": [[56, 112], [112, 56], [112, 112]],
    }
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(config, f)
    return cfg, params


def test_load_pretrained_model_chat(tmp_path, rng):
    from PIL import Image

    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.config import GenerationConfig

    d = str(tmp_path)
    _write_tiny_tokenizer(d)
    _write_tiny_checkpoint(d)

    model = load_pretrained_model(d, dtype=jnp.float32, attn_impl="xla")
    assert model.config.text.vocab_size == 512
    assert model.config.vision.image_size == 56

    img = Image.fromarray(rng.integers(0, 255, (100, 80, 3), dtype=np.uint8))
    answer = model.chat("what is this?", image=img, generation=GenerationConfig(max_new_tokens=3))
    assert isinstance(answer, str)


def test_load_pretrained_model_int8(tmp_path, rng):
    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.config import GenerationConfig

    d = str(tmp_path)
    _write_tiny_tokenizer(d)
    _write_tiny_checkpoint(d)
    model = load_pretrained_model(d, dtype=jnp.float32, quantize_int8=True, attn_impl="xla")
    assert "kernel_q" in model.engine.params["language_model"]["layers"]["mlp"]["gate_proj"]
    out = model.chat("hi", generation=GenerationConfig(max_new_tokens=2))
    assert isinstance(out, str)


def test_load_pretrained_model_lora(tmp_path, rng):
    """--lora path: a saved adapter merges into the base at load and changes
    the effective weights (non-zero b), then chat still runs."""
    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.checkpoint.save import save_lora_adapter
    from omchat_tpu.config import GenerationConfig
    from omchat_tpu.training.lora import init_lora

    d = str(tmp_path / "ckpt")
    os.makedirs(d)
    _write_tiny_tokenizer(d)
    cfg, params = _write_tiny_checkpoint(d)

    lora = init_lora(jax.random.PRNGKey(0), params, rank=2)
    lora = jax.tree.map(lambda x: x + 0.05 if getattr(x, "ndim", 0) == 3 else x, lora)
    ad = str(tmp_path / "adapter")
    save_lora_adapter(ad, lora, base_model=d)

    base = load_pretrained_model(d, dtype=jnp.float32, attn_impl="xla")
    merged = load_pretrained_model(d, dtype=jnp.float32, attn_impl="xla", lora_path=ad)
    kb = np.asarray(base.engine.params["language_model"]["layers"]["self_attn"]["q_proj"]["kernel"])
    km = np.asarray(merged.engine.params["language_model"]["layers"]["self_attn"]["q_proj"]["kernel"])
    assert np.abs(km - kb).max() > 1e-4
    out = merged.chat("hi", generation=GenerationConfig(max_new_tokens=2))
    assert isinstance(out, str)


def test_load_w8a8_mode(tmp_path):
    """load_pretrained_model(w8a8=True): config flips to w8a8, linears are
    int8-quantized, fc1 static scales are calibrated, generation runs."""
    import jax.numpy as jnp

    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.config import GenerationConfig

    path = str(tmp_path / "ck")
    _write_tiny_tokenizer(path)
    _write_tiny_checkpoint(path)
    model = load_pretrained_model(path, w8a8=True)
    assert model.config.vision.w8a8 and model.config.text.w8a8
    lm = model.engine.params["language_model"]
    assert "kernel_q" in lm["layers"]["mlp"]["gate_proj"]
    assert "fc1_out_scale" in model.engine.params["vision_tower"]["layers"]["mlp"]
    out = model.chat("hi", generation=GenerationConfig(max_new_tokens=3, eos_token_id=-1))
    assert isinstance(out, str)


def test_chat_tools_forced(tmp_path, rng):
    """Library-level tool calling: a forced choice returns a well-formed
    tool_calls entry naming the declared tool (schema-constrained decode)."""
    from omchat_tpu.api import load_pretrained_model
    from omchat_tpu.config import GenerationConfig

    d = str(tmp_path)
    _write_tiny_tokenizer(d)
    _write_tiny_checkpoint(d)
    model = load_pretrained_model(d, dtype=jnp.float32, attn_impl="xla")
    tools = [{"type": "function", "function": {
        "name": "pick", "parameters": {
            "type": "object", "properties": {"u": {"enum": ["a", "b"]}},
            "required": ["u"]}}}]
    out = model.chat_tools(
        "choose", tools, tool_choice="required",
        generation=GenerationConfig(max_new_tokens=48),
    )
    if out["tool_calls"]:  # object closed within budget
        (tc,) = out["tool_calls"]
        assert tc["function"]["name"] == "pick"
        args = json.loads(tc["function"]["arguments"])
        assert args.get("u") in ("a", "b")
        assert out["content"] is None
    else:  # truncated mid-object — raw prefix comes back as content
        assert out["content"].startswith("{")
    # auto mode: random model emits no <tool_call> tags
    out2 = model.chat_tools("hi", tools, tool_choice="auto",
                            generation=GenerationConfig(max_new_tokens=3))
    assert out2["tool_calls"] == []
