"""Native (C++) tile pipeline parity vs the golden-tested Python path."""

import numpy as np
import pytest
from PIL import Image

from omchat_tpu.processing import native
from omchat_tpu.processing.clip_preprocess import preprocess_tile
from omchat_tpu.processing.image_processor import process_anyres_image

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_normalize_tiles_matches_python(rng):
    tiles = rng.integers(0, 256, size=(4, 448, 448, 3), dtype=np.uint8)
    ours = native.normalize_tiles(tiles)
    ref = np.stack(
        [preprocess_tile(Image.fromarray(t), do_resize=False, do_center_crop=False) for t in tiles]
    )
    np.testing.assert_allclose(ours, ref, atol=2e-6)


@pytest.mark.parametrize("size", [(640, 480), (1920, 1080), (448, 448), (300, 1200)])
def test_anyres_native_matches_python(rng, size):
    w, h = size
    img = Image.fromarray(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
    ours = native.anyres_process_native(img)
    ref = process_anyres_image(img)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-6)


@pytest.mark.perf
def test_native_faster_than_python(rng):
    """Sanity perf check on a 9-tile 1344×1344 image (not a strict benchmark).

    min-of-5 per side with 1.2× headroom: under ``-n 8`` suite parallelism
    (CPU oversubscription) even min-of-3 flipped the raw comparison once; the
    native path is typically several× faster, so 1.2× still catches any real
    regression to slower-than-Python."""
    import time

    img = Image.fromarray(rng.integers(0, 256, size=(1344, 1344, 3), dtype=np.uint8))
    native.anyres_process_native(img)  # warm
    process_anyres_image(img, use_native=False)  # warm

    def best(fn):
        t = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            t = min(t, time.perf_counter() - t0)
        return t

    t_native = best(lambda: native.anyres_process_native(img))
    t_python = best(lambda: process_anyres_image(img, use_native=False))
    assert t_native < t_python * 1.2
