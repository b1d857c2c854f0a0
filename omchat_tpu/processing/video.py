"""Video preprocessing: frame sampling + per-frame tile encode.

The reference's released video support is vestigial — 4-D per-sample tensors
route to an *undefined* ``encode_videos`` (omchat_arch.py:87; SURVEY.md §5
"long context").  This module supplies the working equivalent for the
32-frame MMBench-Video configuration (README.md:187-200): uniform frame
sampling, square 448px resize + CLIP normalization per frame, one ``<image>``
sentinel per frame in the prompt, each frame contributing one ViT tile.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
from PIL import Image

from omchat_tpu.constants import DEFAULT_IMAGE_TOKEN
from omchat_tpu.processing.clip_preprocess import preprocess_tile


def sample_frame_indices(num_frames: int, num_samples: int = 32) -> List[int]:
    """Uniformly sample ``num_samples`` frame indices (MMBench-Video protocol)."""
    if num_frames <= num_samples:
        return list(range(num_frames))
    return [int(i) for i in np.linspace(0, num_frames - 1, num_samples)]


def process_video_frames(
    frames: Sequence[Image.Image],
    tile_size: int = 448,
    num_samples: int = 32,
) -> np.ndarray:
    """Frames → float32 [T, 3, tile, tile] (plain square resize per frame,
    CLIP normalize; no anyres tiling per frame — token volume stays T×1024)."""
    idx = sample_frame_indices(len(frames), num_samples)
    arrays = []
    for i in idx:
        f = frames[i].resize((tile_size, tile_size))
        arrays.append(preprocess_tile(f, crop_size=tile_size, shortest_edge=tile_size))
    return np.stack(arrays, axis=0)


def video_prompt(text: str, num_frames: int) -> str:
    """One sentinel per frame: ``frame:<image>`` lines then the question."""
    return (
        "\n".join(["frame:" + DEFAULT_IMAGE_TOKEN] * num_frames)
        + "\n"
        + text.replace(DEFAULT_IMAGE_TOKEN, "").strip()
    )
