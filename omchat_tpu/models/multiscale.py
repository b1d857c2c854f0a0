"""S2 multi-scale vision forward (Scaling-on-Scales).

The OmChat-v1 legacy path runs its CLIP tower at [336, 672, 1008] via the
external ``s2wrapper`` (reference: omchat_llama.py:180-209; the wrapper module
is absent upstream).  Algorithm: resize the image to each scale, split scales
larger than the base into base-size crops, batch them through the tower,
reassemble each scale's feature grid, average-pool back to the base grid, and
concatenate scales channel-wise → [B, L_base, C × num_scales].
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def _resize_bilinear(images: jax.Array, size: int) -> jax.Array:
    """[B, 3, H, W] → [B, 3, size, size] (bilinear, torch antialias=False)."""
    b, c, h, w = images.shape
    return jax.image.resize(images, (b, c, size, size), method="bilinear")


def _split_tiles(images: jax.Array, num_split: int) -> jax.Array:
    """[B, C, S, S] → [B*n², C, S/n, S/n] raster order."""
    b, c, s, _ = images.shape
    t = s // num_split
    x = images.reshape(b, c, num_split, t, num_split, t)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, ny, nx, C, t, t]
    return x.reshape(b * num_split * num_split, c, t, t)


def _merge_feature_grid(feats: jax.Array, b: int, num_split: int) -> jax.Array:
    """[B*n², L, C] → [B, n*side, n*side, C]."""
    bn, l, c = feats.shape
    side = int(math.isqrt(l))
    x = feats.reshape(b, num_split, num_split, side, side, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, ny, side, nx, side, C]
    return x.reshape(b, num_split * side, num_split * side, c)


def multiscale_forward(
    forward_feature: Callable[[jax.Array], jax.Array],
    images: jax.Array,
    img_sizes: Sequence[int] = (336, 672, 1008),
    max_split_size: int = 336,
) -> jax.Array:
    """Run ``forward_feature`` ([B,3,s,s] → [B, L, C] patch features, no CLS)
    at each scale and fuse.  Returns [B, L_base, C * len(img_sizes)]."""
    b = images.shape[0]
    base_feats = None
    outputs = []
    base_side = None
    for size in img_sizes:
        num_split = max(size // max_split_size, 1)
        resized = _resize_bilinear(images, size)
        tiles = _split_tiles(resized, num_split) if num_split > 1 else resized
        feats = forward_feature(tiles)  # [B*n², L, C]
        grid = _merge_feature_grid(feats, b, num_split)  # [B, n*side, n*side, C]
        if base_side is None:
            base_side = grid.shape[1]
        if grid.shape[1] != base_side:
            # average-pool down to the base grid
            factor = grid.shape[1] // base_side
            g = grid.reshape(b, base_side, factor, base_side, factor, grid.shape[-1])
            grid = g.mean(axis=(2, 4))
        outputs.append(grid.reshape(b, base_side * base_side, -1))
    return jnp.concatenate(outputs, axis=-1)
