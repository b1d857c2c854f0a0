"""LLaVA-NeXT 'spatial_unpad' patch merge — the OmChat-v1 legacy fusion layout
(reference: omchat_llama.py:415-459 + unpad_image :113-141; also present
unused in the HF bundle, modeling_omchat.py:926-1208).

Tile features are arranged into the anyres grid, the aspect-ratio padding is
cropped away, a learned ``image_newline`` embedding is appended to each row,
and the thumbnail's features are prepended.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from omchat_tpu.processing.anyres import get_anyres_image_grid_shape


def unpad_image(tensor: jax.Array, original_size: Tuple[int, int]) -> jax.Array:
    """Crop the centered aspect-ratio padding.  tensor: [C, H, W];
    original_size: (width, height) — reference-exact (omchat_llama.py:113-141)."""
    original_width, original_height = original_size
    current_height, current_width = tensor.shape[1:]

    original_aspect_ratio = original_width / original_height
    current_aspect_ratio = current_width / current_height

    if original_aspect_ratio > current_aspect_ratio:
        scale_factor = current_width / original_width
        new_height = int(original_height * scale_factor)
        padding = (current_height - new_height) // 2
        return tensor[:, padding : current_height - padding, :]
    scale_factor = current_height / original_height
    new_width = int(original_width * scale_factor)
    padding = (current_width - new_width) // 2
    return tensor[:, :, padding : current_width - padding]


def spatial_unpad_merge(
    tile_features: jax.Array,
    image_size: Tuple[int, int],
    grid_pinpoints: Sequence[Sequence[int]],
    tile_pixels: int,
    image_newline: jax.Array,
    *,
    patch_merge_type: str = "spatial_unpad",
) -> jax.Array:
    """Merge anyres tile features into the LLaVA-NeXT token layout.

    tile_features: [1 + n_tiles, hw, C] (thumbnail first, raster tiles after),
    hw = (tile_pixels/14)². image_newline: [C]. Returns [T, C]."""
    base = tile_features[0]
    if tile_features.shape[0] == 1:
        # single-tile image: base features, newline appended in unpad mode
        # (omchat_llama.py:452-459)
        if "unpad" in patch_merge_type:
            return jnp.concatenate([base, image_newline[None].astype(base.dtype)], axis=0)
        return base
    tiles = tile_features[1:]
    hw, c = base.shape
    side = int(hw**0.5)
    gw, gh = get_anyres_image_grid_shape(image_size, grid_pinpoints, tile_pixels)

    feat = tiles.reshape(gh, gw, side, side, c)
    if "unpad" in patch_merge_type:
        # [C, gh*side, gw*side]
        feat = feat.transpose(4, 0, 2, 1, 3).reshape(c, gh * side, gw * side)
        feat = unpad_image(feat, image_size)
        newline = jnp.broadcast_to(image_newline[:, None, None], (c, feat.shape[1], 1))
        feat = jnp.concatenate([feat, newline.astype(feat.dtype)], axis=-1)
        feat = feat.reshape(c, -1).T  # [(H*(W+1)), C]
    else:
        feat = feat.transpose(0, 2, 1, 3, 4).reshape(-1, c)
    return jnp.concatenate([base, feat], axis=0)
