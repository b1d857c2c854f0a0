"""Logit-parity tests: JAX InternViT vs the reference torch model (tiny configs, fp32 CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.config import VisionConfig
from omchat_tpu.checkpoint.loader import convert_vision_tower
from omchat_tpu.models.intern_vit import feature_select, intern_vit_forward, interpolate_pos_embed


def _ref_model(reference_path, **overrides):
    from omchat.model.multimodal_encoder.intern_vit_6b.configuration_intern_vit import (
        InternVisionConfig,
    )
    from omchat.model.multimodal_encoder.intern_vit_6b import modeling_intern_vit

    import torch

    cfg = InternVisionConfig(
        hidden_size=64,
        num_attention_heads=4,
        intermediate_size=128,
        num_hidden_layers=3,
        image_size=56,
        patch_size=14,
        use_flash_attn=False,
        **overrides,
    )
    torch.manual_seed(0)
    model = modeling_intern_vit.InternVisionModel(cfg).eval().float()
    return model, cfg


@pytest.mark.parametrize("qk_norm", [True, False])
def test_intern_vit_matches_reference(reference_path, qk_norm, rng):
    import torch

    model, ref_cfg = _ref_model(reference_path, qk_normalization=qk_norm)
    cfg = VisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        qk_normalization=qk_norm,
    )
    state = {k: v for k, v in model.state_dict().items()}
    params = convert_vision_tower(state, cfg, dtype=jnp.float32)

    pixels = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref_out = model(torch.from_numpy(pixels), output_hidden_states=True)

    ours = intern_vit_forward(params, cfg, jnp.asarray(pixels), attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(ours), ref_out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )

    # feature_layer=-2 == hidden_states[-2]
    ours_m2 = intern_vit_forward(params, cfg, jnp.asarray(pixels), feature_layer=-2, attn_impl="xla")
    np.testing.assert_allclose(
        np.asarray(ours_m2), ref_out.hidden_states[-2].numpy(), atol=2e-5, rtol=1e-4
    )

    # 'default' strategy drops CLS — the HF bundle's feature_select (modeling_omchat.py:750-753)
    feats = feature_select(ours, "default")
    assert feats.shape == (2, 16, 64)


def test_pos_embed_interpolation_matches_torch(reference_path, rng):
    """Arbitrary-grid position embeddings: bicubic matrix == F.interpolate(bicubic)."""
    import torch
    import torch.nn.functional as F

    d, src = 32, 4
    pos = rng.standard_normal((src * src, d)).astype(np.float32)
    for dst_h, dst_w in [(6, 6), (8, 4), (3, 7), (4, 4)]:
        ours = interpolate_pos_embed(jnp.asarray(pos), src, dst_h, dst_w)
        ref = (
            F.interpolate(
                torch.from_numpy(pos).reshape(1, src, src, d).permute(0, 3, 1, 2),
                size=(dst_h, dst_w),
                mode="bicubic",
                align_corners=False,
            )
            .reshape(1, d, dst_h * dst_w)
            .permute(0, 2, 1)[0]
            .numpy()
        )
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5, rtol=1e-5)


def test_intern_vit_rectangular_input(reference_path, rng):
    """Non-square pixel input exercises interpolated position embeddings end-to-end."""
    import torch

    model, _ = _ref_model(reference_path)
    cfg = VisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
    )
    params = convert_vision_tower(model.state_dict(), cfg, dtype=jnp.float32)
    pixels = rng.standard_normal((1, 3, 84, 56)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(pixels)).last_hidden_state.numpy()
    ours = intern_vit_forward(params, cfg, jnp.asarray(pixels), attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)
