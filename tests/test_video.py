"""Video path: 32-frame sampling, per-frame encode, sentinel-per-frame prompt."""

import numpy as np
from PIL import Image

import jax.numpy as jnp

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.constants import IMAGE_TOKEN_INDEX
from omchat_tpu.processing.chat import make_context, tokenizer_image_token
from omchat_tpu.processing.video import process_video_frames, sample_frame_indices, video_prompt
from omchat_tpu.runtime.generate import OmChatEngine


def test_sample_frame_indices():
    assert sample_frame_indices(10, 32) == list(range(10))
    idx = sample_frame_indices(1000, 32)
    assert len(idx) == 32 and idx[0] == 0 and idx[-1] == 999
    assert idx == sorted(idx)


def test_process_video_frames(rng):
    frames = [Image.fromarray(rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)) for _ in range(50)]
    arr = process_video_frames(frames, tile_size=56, num_samples=8)
    assert arr.shape == (8, 3, 56, 56)
    assert arr.dtype == np.float32


def test_load_video_frames(rng, tmp_path):
    from omchat_tpu.processing.video import load_video_frames

    mk = lambda: Image.fromarray(rng.integers(0, 255, (24, 32, 3), dtype=np.uint8))

    # directory of frame images, sorted by name
    d = tmp_path / "frames"
    d.mkdir()
    for i in range(10):
        mk().save(d / f"f{i:03d}.png")
    frames = load_video_frames(str(d), num_samples=4)
    assert len(frames) == 4 and frames[0].mode == "RGB"

    # animated GIF via PIL seek
    gif = tmp_path / "clip.gif"
    mk().save(gif, save_all=True, append_images=[mk() for _ in range(7)])
    frames = load_video_frames(str(gif), num_samples=4)
    assert len(frames) == 4 and frames[0].size == (32, 24)


def test_video_prompt_sentinels(mock_tokenizer):
    prompt = video_prompt("what happens?", 4)
    ids = tokenizer_image_token(prompt, mock_tokenizer)
    assert ids.count(IMAGE_TOKEN_INDEX) == 4


def test_video_generation_e2e(rng):
    """Frames flow through the engine as per-frame tiles."""
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    params = _tiny_params(cfg)
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)

    n_frames = 3
    frames = rng.standard_normal((n_frames, 3, 56, 56)).astype(np.float32)
    ids = [5] + [IMAGE_TOKEN_INDEX] * n_frames + [6, 7]
    gen = GenerationConfig(max_new_tokens=3, eos_token_id=-1)
    out = engine.generate([ids], frames, gen)
    assert len(out.token_ids[0]) == 3


def test_device_pipeline_tracks_host_path(rng):
    """Jitted on-device preprocessing ~= the PIL host path (bicubic impls
    differ slightly at edges; serving-grade tolerance)."""
    from omchat_tpu.processing.device_pipeline import (
        device_preprocess_frames,
        frames_to_device_batch,
    )

    frames = [
        Image.fromarray(rng.integers(0, 255, (90, 120, 3), dtype=np.uint8)) for _ in range(6)
    ]
    host = process_video_frames(frames, tile_size=56, num_samples=4)
    batch = frames_to_device_batch(frames, num_samples=4)
    dev = np.asarray(device_preprocess_frames(jnp.asarray(batch), tile_size=56))
    assert dev.shape == host.shape
    # mean abs error well under typical ImageNet-normalized activation scale
    assert np.abs(dev - host).mean() < 0.05, np.abs(dev - host).mean()
