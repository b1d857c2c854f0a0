"""Encoded-image LRU (runtime/feature_cache.py): repeated images skip the
ViT encode on every engine path, outputs bit-identical.

No reference counterpart — the reference re-runs the vision tower per call
(omchat_arch.py encode_images)."""

import numpy as np
import pytest

import jax.numpy as jnp

from omchat_tpu.config import GenerationConfig, OmChatConfig
from omchat_tpu.constants import IMAGE_TOKEN_INDEX
from omchat_tpu.runtime.feature_cache import ImageFeatureCache, cached_encode, pixel_digest
from omchat_tpu.runtime.generate import OmChatEngine


@pytest.fixture(scope="module")
def setup():
    from tests.test_sharding import _tiny_params

    cfg = OmChatConfig.tiny()
    return cfg, _tiny_params(cfg)


def test_lru_eviction_and_stats():
    c = ImageFeatureCache(capacity=2)
    c.put("a", 1)
    c.put("b", 2)
    assert c.get("a") == 1  # refreshes a
    c.put("c", 3)  # evicts b (LRU)
    assert c.get("b") is None
    assert c.get("a") == 1 and c.get("c") == 3
    s = c.stats()
    assert s["entries"] == 2 and s["hits"] == 3 and s["misses"] == 1


def test_pixel_digest_qualifies_shape_and_dtype(rng):
    a = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    assert pixel_digest(a) == pixel_digest(a.copy())
    assert pixel_digest(a) != pixel_digest(a.reshape(2, 3, 16, 1))
    assert pixel_digest(a) != pixel_digest(a.astype(np.float64))
    b = a.copy()
    b[0, 0, 0, 0] += 1
    assert pixel_digest(a) != pixel_digest(b)


def test_cached_encode_policy(rng):
    cache = ImageFeatureCache(capacity=4)
    calls = []

    def enc(pv):
        calls.append(1)
        return np.asarray(pv) * 2

    img = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    out1 = cached_encode(cache, img, None, enc)  # numpy, no key -> content hash
    out2 = cached_encode(cache, img.copy(), None, enc)
    assert len(calls) == 1 and np.array_equal(out1, out2)
    # explicit key wins over content
    cached_encode(cache, img, "k1", enc)
    assert len(calls) == 2
    cached_encode(cache, rng.standard_normal((1, 3, 8, 8)).astype(np.float32), "k1", enc)
    assert len(calls) == 2  # same key -> hit, pixels not consulted
    # device arrays without a key are never hashed (encoded every time)
    dev = jnp.asarray(img)
    cached_encode(cache, dev, None, enc)
    cached_encode(cache, dev, None, enc)
    assert len(calls) == 4


def test_engine_reuses_repeated_image(setup, rng, monkeypatch):
    """Same image on two chat turns: one ViT encode, identical generations."""
    cfg, params = setup
    img = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    ids = [5, 6, IMAGE_TOKEN_INDEX, 7]
    gen = GenerationConfig(max_new_tokens=4, eos_token_id=-1)

    baseline = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16, image_cache_size=0)
    assert baseline.image_cache is None
    expect = baseline.generate([ids], img, gen).token_ids[0]

    engine = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16)
    calls = []
    import omchat_tpu.runtime.generate as G

    orig = G._encode_images_jit

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(G, "_encode_images_jit", counting)
    out1 = engine.generate([ids], img, gen).token_ids[0]
    out2 = engine.generate([ids + [8]], img.copy(), gen).token_ids[0]
    assert len(calls) == 1  # second turn hit the cache
    assert out1 == expect
    assert engine.image_cache.stats()["hits"] == 1


def test_paged_engine_image_cache_key(setup, rng, monkeypatch):
    """Two requests sharing an image_cache_key encode once through the paged
    engine; generations match the uncached engine."""
    from omchat_tpu.runtime.paged_engine import PagedBatchEngine

    cfg, params = setup
    img = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    reqs = [([5, 6, IMAGE_TOKEN_INDEX, 7], img), ([9, IMAGE_TOKEN_INDEX, 10, 11], img)]
    max_new = 4
    uncached = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16, image_cache_size=0)
    expected = [
        uncached.generate([ids], im, GenerationConfig(max_new_tokens=max_new, eos_token_id=-1)).token_ids[0]
        for ids, im in reqs
    ]

    be = PagedBatchEngine(
        cfg, params, max_slots=2, num_pages=12, page_size=8, attn_impl="xla",
        prompt_bucket=16, max_len=96,
    )
    calls = []
    import omchat_tpu.runtime.generate as G

    orig = G._encode_images_jit

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(G, "_encode_images_jit", counting)
    # device arrays + shared explicit key (the serve.py pattern: key from the
    # compressed payload, pixels already on device)
    rids = [
        be.submit(ids, jnp.asarray(im), max_new_tokens=max_new, eos_token_id=-1,
                  image_cache_key="shared-img")
        for ids, im in reqs
    ]
    be.run_to_completion(max_ticks=200)
    assert len(calls) == 1
    assert [be.result(r) for r in rids] == expected
    assert be.stats()["image_cache_hits"] == 1


def test_batch_engine_image_cache(setup, rng, monkeypatch):
    from omchat_tpu.runtime.batch_engine import BatchEngine

    cfg, params = setup
    img = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    ids = [5, 6, IMAGE_TOKEN_INDEX, 7]
    max_new = 4
    uncached = OmChatEngine(cfg, params, attn_impl="xla", prompt_bucket=16, image_cache_size=0)
    expect = uncached.generate(
        [ids], img, GenerationConfig(max_new_tokens=max_new, eos_token_id=-1)
    ).token_ids[0]

    be = BatchEngine(cfg, params, max_slots=2, max_len=64, chunk_size=16, attn_impl="xla")
    calls = []
    import omchat_tpu.runtime.generate as G

    orig = G._encode_images_jit

    def counting(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(G, "_encode_images_jit", counting)
    r1 = be.submit(ids, img, max_new_tokens=max_new, eos_token_id=-1)
    r2 = be.submit(ids, img.copy(), max_new_tokens=max_new, eos_token_id=-1)
    while not (be.finished(r1) and be.finished(r2)):
        be.step()
    assert len(calls) == 1
    assert be.pop_result(r1)[0] == expect
    assert be.pop_result(r2)[0] == expect
    assert be.stats()["image_cache_hits"] == 1
