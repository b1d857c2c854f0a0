"""Legacy-path features: beam search, spatial_unpad merge, S2 multiscale,
cosine schedule, contrastive loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omchat_tpu.config import GenerationConfig, OmChatConfig


@pytest.fixture(scope="module")
def tiny():
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    return cfg, _tiny_params(cfg)


def test_beam1_equals_greedy(tiny):
    from omchat_tpu.runtime.beam_search import beam_search
    from omchat_tpu.runtime.generate import OmChatEngine

    cfg, params = tiny
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)
    ids = [5, 6, 7, 8, 9]
    greedy_out = engine.generate([ids], None, GenerationConfig(max_new_tokens=5, eos_token_id=-1))
    beam_out = beam_search(engine, ids, num_beams=1, max_new_tokens=5, eos_token_id=-1)
    assert beam_out == greedy_out.token_ids[0]


def test_beam_search_improves_logprob(tiny):
    from omchat_tpu.runtime.beam_search import beam_search
    from omchat_tpu.runtime.generate import OmChatEngine

    cfg, params = tiny
    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8)
    ids = [11, 12, 13]

    def seq_logprob(gen_tokens):
        """Total logprob of a generated continuation under the model."""
        from omchat_tpu.models.qwen2 import embed_tokens, lm_head, qwen2_forward

        full = ids + gen_tokens
        x = embed_tokens(params["language_model"], jnp.asarray([full]))
        hidden, _ = qwen2_forward(
            params["language_model"], cfg.text, x, jnp.arange(len(full))[None], attn_impl="xla"
        )
        logits = lm_head(params["language_model"], cfg.text, hidden)
        lp = jax.nn.log_softmax(logits[0, len(ids) - 1 : -1].astype(jnp.float32), axis=-1)
        return float(sum(lp[i, t] for i, t in enumerate(gen_tokens)))

    g = beam_search(engine, ids, num_beams=1, max_new_tokens=4, eos_token_id=-1)
    b = beam_search(engine, ids, num_beams=4, max_new_tokens=4, eos_token_id=-1)
    assert seq_logprob(b) >= seq_logprob(g) - 1e-4


def _torch_unpad_image(tensor, original_size):
    """Reference-exact torch oracle (omchat_llama.py:113-141; original_size is
    (width, height) per the reference's actual unpacking at :125)."""
    original_width, original_height = original_size
    current_height, current_width = tensor.shape[1:]
    if original_width / original_height > current_width / current_height:
        scale_factor = current_width / original_width
        new_height = int(original_height * scale_factor)
        padding = (current_height - new_height) // 2
        return tensor[:, padding : current_height - padding, :]
    scale_factor = current_height / original_height
    new_width = int(original_width * scale_factor)
    padding = (current_width - new_width) // 2
    return tensor[:, :, padding : current_width - padding]


def _torch_spatial_merge(feats, image_size, pinpoints, tile, newline, merge_type):
    """Reference-exact torch oracle of the spatial merge block
    (omchat_llama.py:425-459): permute/flatten/unpad/newline-cat/flatten."""
    import torch

    from omchat_tpu.processing.anyres import get_anyres_image_grid_shape

    base = feats[0]
    if feats.shape[0] == 1:
        if "unpad" in merge_type:
            return torch.cat((base, newline[None]), dim=0)
        return base
    image_feature = feats[1:]
    hw = base.shape[0]
    height = width = int(hw**0.5)
    num_patch_width, num_patch_height = get_anyres_image_grid_shape(image_size, pinpoints, tile)
    image_feature = image_feature.view(num_patch_height, num_patch_width, height, width, -1)
    if "unpad" in merge_type:
        image_feature = image_feature.permute(4, 0, 2, 1, 3).contiguous()
        image_feature = image_feature.flatten(1, 2).flatten(2, 3)
        image_feature = _torch_unpad_image(image_feature, image_size)
        image_feature = torch.cat(
            (image_feature, newline[:, None, None].expand(*image_feature.shape[:-1], 1)), dim=-1
        )
        image_feature = image_feature.flatten(1, 2).transpose(0, 1)
    else:
        image_feature = image_feature.permute(0, 2, 1, 3, 4).contiguous()
        image_feature = image_feature.flatten(0, 3)
    return torch.cat((base, image_feature), dim=0)


def test_unpad_image_matches_reference(rng):
    """Numeric parity with the reference's unpad_image (omchat_llama.py:113-141)
    across tall/wide/square originals, including the int() truncation and
    floor-division padding."""
    import torch

    from omchat_tpu.models.spatial_merge import unpad_image

    t_np = rng.standard_normal((8, 24, 12)).astype(np.float32)
    for original in [(200, 100), (100, 200), (448, 448), (90, 350), (337, 113)]:
        ours = np.asarray(unpad_image(jnp.asarray(t_np), original))
        ref = _torch_unpad_image(torch.from_numpy(t_np), original).numpy()
        np.testing.assert_array_equal(ours, ref, err_msg=str(original))


@pytest.mark.parametrize("merge_type", ["spatial_unpad", "spatial"])
@pytest.mark.parametrize("image_size", [(110, 56), (56, 110), (100, 100)])
def test_spatial_merge_matches_reference(rng, merge_type, image_size):
    """Numeric parity with the reference spatial merge (omchat_llama.py:425-459):
    grid reshape, unpad crop, image_newline placement, token order."""
    import torch

    from omchat_tpu.models.spatial_merge import spatial_unpad_merge
    from omchat_tpu.processing.anyres import get_anyres_image_grid_shape

    c, hw, tile = 8, 16, 56  # side 4
    pinpoints = [[56, 112], [112, 56], [112, 112]]
    gw, gh = get_anyres_image_grid_shape(image_size, pinpoints, tile)
    feats_np = rng.standard_normal((1 + gw * gh, hw, c)).astype(np.float32)
    newline_np = rng.standard_normal((c,)).astype(np.float32)

    ours = np.asarray(
        spatial_unpad_merge(
            jnp.asarray(feats_np), image_size, pinpoints, tile, jnp.asarray(newline_np),
            patch_merge_type=merge_type,
        )
    )
    ref = _torch_spatial_merge(
        torch.from_numpy(feats_np), image_size, pinpoints, tile,
        torch.from_numpy(newline_np), merge_type,
    ).numpy()
    np.testing.assert_array_equal(ours, ref)


def test_spatial_merge_single_tile_matches_reference(rng):
    import torch

    from omchat_tpu.models.spatial_merge import spatial_unpad_merge

    c, hw = 8, 16
    feats_np = rng.standard_normal((1, hw, c)).astype(np.float32)
    newline_np = rng.standard_normal((c,)).astype(np.float32)
    ours = np.asarray(
        spatial_unpad_merge(
            jnp.asarray(feats_np), (56, 56), [[56, 56]], 56, jnp.asarray(newline_np)
        )
    )
    ref = _torch_spatial_merge(
        torch.from_numpy(feats_np), (56, 56), [[56, 56]], 56,
        torch.from_numpy(newline_np), "spatial_unpad",
    ).numpy()
    np.testing.assert_array_equal(ours, ref)
    assert ours.shape[0] == hw + 1  # newline appended


def _patch_mean_tower_np(x, patch=14):
    """Deterministic stand-in tower: per-14px-patch channel means → [B, L, 3].
    Pure numpy so the torch and JAX oracles share it bit-exactly."""
    b, c, s, _ = x.shape
    g = s // patch
    v = x.reshape(b, c, g, patch, g, patch).mean(axis=(3, 5))  # [B, C, g, g]
    return v.transpose(0, 2, 3, 1).reshape(b, g * g, c)


def test_multiscale_forward_matches_reference(rng):
    """S2 numeric parity with the public s2wrapper algorithm the reference
    calls (omchat_llama.py:186-209): bilinear scale-up, raster split, merge,
    area-interpolation back to the base grid, channel concat.  The torch
    oracle uses F.interpolate (bilinear / area) directly."""
    import torch
    import torch.nn.functional as F

    from omchat_tpu.models.multiscale import multiscale_forward

    imgs_np = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)

    out = np.asarray(
        multiscale_forward(
            lambda x: jnp.asarray(_patch_mean_tower_np(np.asarray(x))),
            jnp.asarray(imgs_np),
            img_sizes=(56, 112, 168),
            max_split_size=56,
        )
    )

    # torch oracle
    def torch_s2(images):
        b = images.shape[0]
        outputs = []
        base_side = None
        for size in (56, 112, 168):
            n = max(size // 56, 1)
            resized = F.interpolate(images, size=(size, size), mode="bilinear", align_corners=False)
            if n > 1:
                t = size // n
                x = resized.reshape(b, 3, n, t, n, t).permute(0, 2, 4, 1, 3, 5).reshape(b * n * n, 3, t, t)
            else:
                x = resized
            feats = torch.from_numpy(_patch_mean_tower_np(x.numpy()))  # [B*n², L, C]
            side = int(np.sqrt(feats.shape[1]))
            grid = feats.reshape(b, n, n, side, side, 3).permute(0, 1, 3, 2, 4, 5).reshape(
                b, n * side, n * side, 3
            )
            if base_side is None:
                base_side = grid.shape[1]
            if grid.shape[1] != base_side:
                g = grid.permute(0, 3, 1, 2)  # NCHW
                g = F.interpolate(g, size=(base_side, base_side), mode="area")
                grid = g.permute(0, 2, 3, 1)
            outputs.append(grid.reshape(b, base_side * base_side, 3))
        return torch.cat(outputs, dim=-1).numpy()

    ref = torch_s2(torch.from_numpy(imgs_np))
    assert out.shape == ref.shape == (2, 16, 9)
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_v1_assembly_end_to_end(rng):
    """The OmChat-v1 model variant is instantiable end to end:
    mm_patch_merge_type='spatial_unpad' + image_newline through
    engine.generate — the first generated token equals a naive python splice
    (embed text, insert the spatial-merged feature rows at the sentinel,
    run the trunk) and api.chat drives the same path via the v1 prompt."""
    import dataclasses

    from omchat_tpu.models.omchat import encode_images as om_encode
    from omchat_tpu.models.qwen2 import embed_tokens, lm_head, qwen2_forward
    from omchat_tpu.models.spatial_merge import spatial_unpad_merge
    from omchat_tpu.runtime.generate import OmChatEngine
    from tests.test_sharding import _tiny_params

    cfg = dataclasses.replace(OmChatConfig.tiny(), mm_patch_merge_type="spatial_unpad")
    params = _tiny_params(cfg)
    params["image_newline"] = jnp.asarray(
        rng.standard_normal((cfg.text.hidden_size,)).astype(np.float32)
    )

    # image 110x56 → best res 112x56 → 2 tiles + thumbnail
    image_size = (110, 56)
    n_tiles = 3
    pixels = rng.standard_normal((n_tiles, 3, 56, 56)).astype(np.float32)
    ids = [5, 6, -200, 7, 8]  # ONE sentinel for the whole image (v1 contract)

    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=8, image_cache_size=0)
    out = engine.generate(
        [ids], pixels, GenerationConfig(max_new_tokens=3, eos_token_id=-1),
        num_patches=[n_tiles], image_sizes=[image_size],
    )
    assert len(out.token_ids[0]) == 3

    # naive python splice oracle
    feats = om_encode(params, cfg, jnp.asarray(pixels), attn_impl="xla")  # [N, L, D]
    merged = spatial_unpad_merge(
        feats, image_size, cfg.image_grid_pinpoints, cfg.vision.image_size,
        params["image_newline"],
    )
    text_embeds = embed_tokens(params["language_model"], jnp.asarray([ids]))[0]
    embeds = jnp.concatenate([text_embeds[:2], merged, text_embeds[3:]], axis=0)[None]
    pos = jnp.arange(embeds.shape[1])[None]
    hidden, _ = qwen2_forward(params["language_model"], cfg.text, embeds, pos, attn_impl="xla")
    logits = lm_head(params["language_model"], cfg.text, hidden)
    assert int(np.argmax(np.asarray(logits[0, -1]))) == out.token_ids[0][0]
    # prompt length reflects the variable expansion: 4 text + merged rows
    assert int(out.prompt_len[0]) == 4 + merged.shape[0]

    # api.chat drives the same path (v1 prompt: one sentinel, no patch lines)
    from PIL import Image as PILImage

    from omchat_tpu.api import OmChatModel
    from omchat_tpu.processing.image_processor import OmChatImageProcessor
    from omchat_tpu.processing.processor import OmChatProcessor
    from tests.conftest import MockTokenizer

    tok = MockTokenizer()
    ip = OmChatImageProcessor(crop_size=56, shortest_edge=56,
                              image_grid_pinpoints=cfg.image_grid_pinpoints)
    proc = OmChatProcessor(tok, ip, patch_expand=False)
    model = OmChatModel(tok, engine, ip, proc, cfg)
    img = PILImage.fromarray(
        np.random.default_rng(5).integers(0, 255, (56, 110, 3), dtype=np.uint8)
    )
    inputs = proc("what?", images=img)
    assert int((inputs["input_ids"] == -200).sum()) == 1  # one sentinel, no tiles expansion
    reply = model.chat("what?", image=img,
                       generation=GenerationConfig(max_new_tokens=2, eos_token_id=-1))
    assert isinstance(reply, str)


def test_v1_image_newline_checkpoint_roundtrip(rng, tmp_path):
    """image_newline survives save → load (both the flat HF state and the
    full safetensors round trip)."""
    import dataclasses

    from omchat_tpu.checkpoint.loader import convert_omchat_state_dict, load_safetensors_dir
    from omchat_tpu.checkpoint.save import flatten_to_hf_state, save_hf_safetensors
    from tests.test_sharding import _tiny_params

    cfg = dataclasses.replace(OmChatConfig.tiny(), mm_patch_merge_type="spatial_unpad")
    params = _tiny_params(cfg)
    params["image_newline"] = jnp.asarray(
        rng.standard_normal((cfg.text.hidden_size,)).astype(np.float32)
    )
    assert "image_newline" in flatten_to_hf_state(params)
    save_hf_safetensors(params, str(tmp_path))
    state = load_safetensors_dir(str(tmp_path))
    params2 = convert_omchat_state_dict(state, cfg, dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(params2["image_newline"]), np.asarray(params["image_newline"])
    )


def test_warmup_cosine_schedule():
    from omchat_tpu.training.schedules import warmup_cosine_schedule

    sched = warmup_cosine_schedule(1e-4, total_steps=100, warmup_steps=10, min_lr=1e-6)
    assert float(sched(0)) < float(sched(10))
    assert abs(float(sched(10)) - 1e-4) < 1e-9
    assert float(sched(100)) <= 1.1e-6


def test_clip_contrastive_loss(rng):
    from omchat_tpu.ops.contrastive import clip_contrastive_loss
    from omchat_tpu.parallel.mesh import create_mesh

    b, d = 8, 16
    img = jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    txt = img + 0.01 * jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
    scale = jnp.asarray(30.0)

    dense = clip_contrastive_loss(img, txt, scale)
    mesh = create_mesh(tp=1, dp=8)
    sharded = clip_contrastive_loss(img, txt, scale, mesh=mesh, axis="data")
    np.testing.assert_allclose(float(sharded), float(dense), rtol=1e-5)
    # matched pairs → loss far below chance (log 8)
    assert float(dense) < np.log(b) / 2
