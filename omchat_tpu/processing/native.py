"""ctypes binding for the native host tile pipeline (native/tile_pipeline.cpp).

The fused C++ pad+tile+normalize replaces the Python per-tile loop
(PIL crop → numpy rescale → normalize → transpose) on the serving hot path;
resampling stays in PIL so pixel output remains bit-identical to the
golden-tested pure-Python path.  Falls back silently when the library is
missing (``available()`` is False) — callers keep the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from omchat_tpu.constants import DEFAULT_GRID_PINPOINTS, IMAGENET_MEAN, IMAGENET_STD
from omchat_tpu.processing.anyres import compute_resize_shape, select_best_resolution

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.environ.get("OMCHAT_NATIVE_LIB", os.path.join(_NATIVE_DIR, "libomchat_host.so"))
    if not os.path.exists(path) and os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        try:  # build on demand
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.omchat_normalize_tiles.argtypes = [
        u8p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p, ctypes.c_float, ctypes.c_int,
    ]
    lib.omchat_pad_tile_normalize.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, f32p, ctypes.c_float, ctypes.c_int,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def normalize_tiles(
    tiles_u8: np.ndarray,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    rescale: float = 1.0 / 255.0,
    num_threads: int = 8,
) -> np.ndarray:
    """[N, T, T, 3] uint8 → [N, 3, T, T] float32 via the native kernel."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    tiles_u8 = np.ascontiguousarray(tiles_u8, dtype=np.uint8)
    n, t = tiles_u8.shape[0], tiles_u8.shape[1]
    out = np.empty((n, 3, t, t), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    lib.omchat_normalize_tiles(_u8p(tiles_u8), _f32p(out), n, t, _f32p(m), _f32p(s), rescale, num_threads)
    return out


def anyres_process_native(
    image: Image.Image,
    grid_pinpoints=DEFAULT_GRID_PINPOINTS,
    tile_size: int = 448,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    num_threads: int = 8,
) -> np.ndarray:
    """Native anyres: PIL resizes (bit-exact) + fused C++ pad/tile/normalize.

    Output matches :func:`omchat_tpu.processing.image_processor.process_anyres_image`
    (thumbnail first, raster tiles) to float32 rounding."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    if image.mode != "RGB":
        image = image.convert("RGB")
    target_w, target_h = select_best_resolution(image.size, grid_pinpoints)
    new_w, new_h = compute_resize_shape(image.size, (target_w, target_h))
    resized = np.ascontiguousarray(np.asarray(image.resize((new_w, new_h)), dtype=np.uint8))

    gx, gy = target_w // tile_size, target_h // tile_size
    tiles = np.empty((gx * gy, 3, tile_size, tile_size), np.float32)
    m = np.asarray(mean, np.float32)
    s = np.asarray(std, np.float32)
    lib.omchat_pad_tile_normalize(
        _u8p(resized), new_h, new_w, target_h, target_w, tile_size,
        _f32p(tiles), _f32p(m), _f32p(s), np.float32(1.0 / 255.0), num_threads,
    )

    thumb = np.asarray(image.resize((tile_size, tile_size)), dtype=np.uint8)
    thumb_n = normalize_tiles(thumb[None], mean, std, num_threads=1)
    return np.concatenate([thumb_n, tiles], axis=0)
