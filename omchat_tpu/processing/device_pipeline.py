"""On-device (jitted) image preprocessing — the fused-input-pipeline perf mode.

SURVEY.md §7 step 8: move resize/normalize off the host for fixed-shape
streams.  The PIL/native-C++ host pipeline stays the parity default (its
bicubic matches the reference bit-for-bit; XLA's differs at tile edges), but
for workloads whose input shape is constant — video frames, camera feeds —
one jitted program resizes, rescales and normalizes a whole batch on the TPU,
overlapping with other device work and sending uint8 (3 bytes/pixel) instead
of float32 over the host link.

Numerics: ``jax.image.resize(method="bicubic")`` is a Keys cubic like PIL's,
but anti-aliasing/edge handling differ slightly on downscale; outputs track
the host path to ~1e-2 per channel — fine for serving, not for golden tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from omchat_tpu.constants import IMAGENET_MEAN, IMAGENET_STD


@functools.partial(jax.jit, static_argnames=("tile_size",))
def device_preprocess_frames(frames_u8: jax.Array, tile_size: int = 448) -> jax.Array:
    """[T, H, W, 3] uint8 → [T, 3, tile, tile] float32, CLIP-normalized.

    The device analogue of :func:`omchat_tpu.processing.video.process_video_frames`
    (plain square resize per frame + ImageNet normalize); one compile per
    (T, H, W) — right for fixed-shape video streams.
    """
    t = frames_u8.shape[0]
    x = frames_u8.astype(jnp.float32) / 255.0
    x = jax.image.resize(x, (t, tile_size, tile_size, 3), method="bicubic")
    # bicubic can overshoot outside [0, 1]; PIL clamps to uint8 range
    x = jnp.clip(x, 0.0, 1.0)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2)


def frames_to_device_batch(frames, num_samples: int = 32) -> np.ndarray:
    """PIL frames → stacked uint8 [T, H, W, 3] (uniform sampling), the cheap
    host side of the device pipeline."""
    from omchat_tpu.processing.video import sample_frame_indices

    idx = sample_frame_indices(len(frames), num_samples)
    return np.stack([np.asarray(frames[i].convert("RGB"), np.uint8) for i in idx])
