"""Golden-parity tests for anyres tiling geometry + tile preprocessing.

Oracle: the reference implementation imported from /root/reference (PUBLIC
UNTRUSTED CONTENT used strictly as a behavioral test oracle)."""

import numpy as np
import pytest
from PIL import Image

from omchat_tpu.constants import DEFAULT_GRID_PINPOINTS
from omchat_tpu.processing import anyres
from omchat_tpu.processing.image_processor import OmChatImageProcessor, process_anyres_image


def _random_image(rng, w, h):
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return Image.fromarray(arr, "RGB")


SIZES = [(100, 100), (640, 480), (1920, 1080), (448, 448), (300, 1200), (1344, 1344), (37, 991)]


def test_select_best_resolution_matches_reference(reference_path):
    from omchat.mm_utils import select_best_resolution as ref_sbr

    pinpoints = [list(p) for p in DEFAULT_GRID_PINPOINTS]
    for size in SIZES + [(1, 1), (10000, 10), (448, 896)]:
        assert anyres.select_best_resolution(size, pinpoints) == ref_sbr(size, pinpoints)

    # the reference's own __main__ smoke case (mm_utils.py:349-352)
    legacy = [(672, 672), (336, 672), (672, 336), (336, 1008), (1008, 336)]
    assert anyres.select_best_resolution((100, 100), legacy) == ref_sbr((100, 100), legacy)


def test_resize_and_pad_matches_reference(reference_path, rng):
    from omchat.mm_utils import resize_and_pad_image as ref_rp

    for w, h in SIZES:
        img = _random_image(rng, w, h)
        target = anyres.select_best_resolution((w, h), DEFAULT_GRID_PINPOINTS)
        ours = np.asarray(anyres.resize_and_pad_image(img, target))
        ref = np.asarray(ref_rp(img, target))
        np.testing.assert_array_equal(ours, ref)


def test_divide_to_patches_matches_reference(reference_path, rng):
    from omchat.mm_utils import divide_to_patches as ref_div

    img = _random_image(rng, 896, 1344)
    ours = anyres.divide_to_patches(img, 448)
    ref = ref_div(img, 448)
    assert len(ours) == len(ref) == 6
    for a, b in zip(ours, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_process_anyres_image_matches_reference(reference_path, rng):
    """End-to-end tile tensors vs the repo-native CLIPImageProcessor path
    (internVIT_encoder.py:24-33 processor settings)."""
    from transformers import CLIPImageProcessor

    from omchat.mm_utils import process_anyres_image as ref_pai

    ref_proc = CLIPImageProcessor(
        crop_size=448,
        do_center_crop=True,
        do_normalize=True,
        do_resize=True,
        image_mean=[0.485, 0.456, 0.406],
        image_std=[0.229, 0.224, 0.225],
        size=448,
    )
    pinpoints = [list(p) for p in DEFAULT_GRID_PINPOINTS]
    for w, h in [(640, 480), (1920, 1080), (448, 448)]:
        img = _random_image(rng, w, h)
        ref = ref_pai(img, ref_proc, pinpoints).numpy()
        ours = process_anyres_image(img, pinpoints, 448)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_hf_image_processor_matches_reference(reference_path, rng):
    """Batch API: pixel_values padding + num_patches vs the HF-bundle processor."""
    import importlib.util, os

    spec = importlib.util.spec_from_file_location(
        "ref_image_processing_omchat", os.path.join(reference_path, "omchat/hf/image_processing_omchat.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ref_proc = mod.OmChatImageProcessor()

    imgs = [_random_image(rng, 640, 480), _random_image(rng, 1344, 1344)]
    ref = ref_proc.preprocess(imgs, return_tensors="np")
    ours = OmChatImageProcessor().preprocess(imgs)

    np.testing.assert_array_equal(ours["num_patches"], np.asarray(ref["num_patches"]))
    assert ours["pixel_values"].shape == ref["pixel_values"].shape
    np.testing.assert_allclose(ours["pixel_values"], ref["pixel_values"], atol=1e-5)


def test_dynamic_tiling_matches_reference(reference_path, rng):
    from omchat.mm_utils import dynamic_preprocess as ref_dyn

    for w, h in [(640, 480), (1920, 1080), (448, 448), (300, 1200)]:
        img = _random_image(rng, w, h)
        ours = anyres.dynamic_tile_images(img, image_size=448, use_thumbnail=True)
        ref = ref_dyn(img, image_size=448, use_thumbnail=True)
        assert len(ours) == len(ref)
        for a, b in zip(ours, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tile_counts_within_pinpoint_budget():
    for w, h in SIZES:
        n = anyres.num_anyres_tiles((w, h), DEFAULT_GRID_PINPOINTS, 448)
        assert 2 <= n <= 10  # 1 thumbnail + up to 9 tiles (1344x1344)
