"""Vision tower dispatch (reference builder.py:7-16 semantics) + eval loop drive."""

import json

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


def test_tower_dispatch_names():
    from omchat_tpu.config import VisionConfig
    from omchat_tpu.models.clip_vit import ClipVisionConfig
    from omchat_tpu.models.tower import build_vision_tower

    t = build_vision_tower("OpenGVLab/InternViT-6B-448px-V1-5")
    assert isinstance(t.config, VisionConfig) and t.config.num_hidden_layers == 45

    t = build_vision_tower("internvit-300m-448px")
    assert t.config.norm_type == "layer_norm"

    t = build_vision_tower("google/siglip-so400m-patch14-384")
    assert isinstance(t.config, ClipVisionConfig) and not t.config.use_class_token

    t = build_vision_tower("openai/clip-vit-large-patch14-336")  # CLIP fallback
    assert isinstance(t.config, ClipVisionConfig) and t.config.use_class_token


def test_tower_forward_through_dispatch(rng):
    from omchat_tpu.models.clip_vit import ClipVisionConfig
    from omchat_tpu.models.tower import build_vision_tower

    cfg = ClipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
    )
    tower = build_vision_tower("clip-tiny", cfg)

    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(0)
    hf = CLIPVisionModel(
        CLIPVisionConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                         num_attention_heads=4, image_size=56, patch_size=14)
    ).eval().float()
    params = tower.convert(hf.state_dict(), cfg, dtype=jnp.float32)
    px = jnp.asarray(rng.standard_normal((1, 3, 56, 56)).astype(np.float32))
    out = tower.forward(params, cfg, px, feature_layer=-1, attn_impl="xla")
    assert out.shape == (1, 17, 64)


def test_eval_run_loop(tmp_path, rng):
    """Drive eval/harness.run_eval end to end with a stub model."""
    from omchat_tpu.eval.harness import read_question_file, run_eval, score

    img = Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    img.save(tmp_path / "a.jpg")
    qf = tmp_path / "q.jsonl"
    qf.write_text(
        json.dumps({"question_id": 1, "text": "pick A or B", "image": "a.jpg"}) + "\n"
        + json.dumps({"question_id": 2, "text": "text only"}) + "\n"
    )

    class StubModel:
        def chat(self, text, image=None, generation=None, guided_choices=None):
            return "The answer is A." if image is not None else "B"

    samples = read_question_file(str(qf), str(tmp_path))
    answers = tmp_path / "ans.jsonl"
    run_eval(StubModel(), samples, str(answers), progress=False)

    acc = score("scienceqa", str(answers), {"1": "A", "2": "C"})
    assert abs(acc - 0.5) < 1e-9


def test_gpt4style_tiles(rng):
    from omchat_tpu.processing.legacy import gpt4style_tiles

    img = Image.fromarray(rng.integers(0, 255, (500, 400, 3), dtype=np.uint8))
    tiles = gpt4style_tiles(img, tile_size=56)
    assert len(tiles) == 5  # overall + 2x2 crops
    assert tiles[0].shape == (3, 56, 56)
