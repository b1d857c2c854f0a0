"""CLIP / SigLIP tower parity vs HF transformers (tiny configs, fp32 CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from omchat_tpu.models.clip_vit import ClipVisionConfig, clip_vit_forward, convert_hf_clip_vision


def test_clip_vision_matches_hf(rng):
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
    )
    torch.manual_seed(0)
    model = CLIPVisionModel(hf_cfg).eval().float()

    cfg = ClipVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
    )
    params = convert_hf_clip_vision(model.state_dict(), cfg, dtype=jnp.float32)

    pixels = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(pixels), output_hidden_states=True)

    # hidden_states[-2] — the classic LLaVA/CLIP feature layer
    ours = clip_vit_forward(params, cfg, jnp.asarray(pixels), feature_layer=-2, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref.hidden_states[-2].numpy(), atol=3e-5, rtol=1e-4)


def test_siglip_vision_matches_hf(rng):
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
    )
    torch.manual_seed(0)
    model = SiglipVisionModel(hf_cfg).eval().float()

    cfg = ClipVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=56,
        patch_size=14,
        layer_norm_eps=1e-6,
        hidden_act="gelu_pytorch_tanh",
        use_class_token=False,
        post_layernorm=True,
    )
    params = convert_hf_clip_vision(model.state_dict(), cfg, dtype=jnp.float32)

    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(pixels)).last_hidden_state.numpy()

    ours = clip_vit_forward(params, cfg, jnp.asarray(pixels), feature_layer=-1, attn_impl="xla")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5, rtol=1e-4)
