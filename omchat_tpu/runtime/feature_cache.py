"""LRU cache of encoded image features keyed by pixel (or caller) identity.

Multi-turn VQA resends the SAME image every turn (the reference's chat loop,
``cli/chat.py``, and any OpenAI-style client keeping the image in history),
and the ViT encode is the most expensive single stage of a turn (~224 ms for
a 5-tile anyres image at the 13B geometry, BENCH.md).  The KV prefix cache
cannot help — image features enter the prompt mid-sequence and the suffix
differs per turn — but the encode itself is a pure function of the pixel
tiles, so its output can be reused across requests.

Keying: callers that hold the original compressed image bytes (e.g. the
server's base64 payload) should pass those as the cache key — hashing a
~100 KB JPEG is ~1000x cheaper than hashing the decoded [tiles, 3, 448, 448]
float tensor.  Otherwise :func:`pixel_digest` hashes the full pixel array
(blake2b, ~10 ms for 5 anyres tiles — still 20x cheaper than re-encoding).
Device arrays are never hashed implicitly: pulling them back through the
host defeats the point (and over a tunneled TPU costs more than the encode).

No reference counterpart: the reference re-runs the vision tower every call
(``omchat_arch.py`` encode_images; its HF ``generate`` path has no cross-call
state at all).
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Optional

import numpy as np

__all__ = ["ImageFeatureCache", "cached_encode", "pixel_digest"]


def pixel_digest(pixel_values: np.ndarray) -> str:
    """Content hash of a host-side pixel array (shape/dtype-qualified)."""
    a = np.ascontiguousarray(pixel_values)
    h = hashlib.blake2b(digest_size=16)
    h.update(str((a.shape, a.dtype.str)).encode())
    h.update(a.tobytes())
    return h.hexdigest()


class ImageFeatureCache:
    """Bounded LRU: key -> encoded feature array (stays on device).

    ``capacity`` counts entries, not bytes: one 5-tile anyres encode at the
    13B geometry is ~[5125, 3584] bf16 = 37 MB of HBM, so the default 8 caps
    the cache at ~300 MB — sized for "a handful of live conversations", not
    a feature store.  Not thread-safe by itself; engines use it from their
    scheduler/submit thread only.
    """

    def __init__(self, capacity: int = 8):
        assert capacity > 0
        self.capacity = capacity
        self._entries: "OrderedDict[str, object]" = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: Optional[str]):
        if key is None:
            return None
        feats = self._entries.get(key)
        if feats is None:
            self.misses += 1
            return None
        self._entries.move_to_end(key)
        self.hits += 1
        return feats

    def peek(self, key: Optional[str]):
        """Stat-free lookup (no hit/miss accounting, no LRU touch) — for
        schedulers deciding whether to defer an encode; the deferred path's
        own get() does the official accounting."""
        if key is None:
            return None
        return self._entries.get(key)

    def put(self, key: Optional[str], feats) -> None:
        if key is None:
            return
        self._entries[key] = feats
        self._entries.move_to_end(key)
        while len(self._entries) > self.capacity:
            self._entries.popitem(last=False)

    def stats(self) -> dict:
        return {
            "entries": len(self._entries),
            "capacity": self.capacity,
            "hits": self.hits,
            "misses": self.misses,
        }

    def clear(self) -> None:
        self._entries.clear()


def cached_encode(cache: Optional[ImageFeatureCache], pixel_values, cache_key, encode_fn):
    """Encode-through-cache: the one keying policy for every engine.

    ``cache_key=None`` + host numpy input → content-hash the pixels;
    device-array input with no key → encode uncached (see module docstring).
    """
    if cache is not None:
        if cache_key is None and isinstance(pixel_values, np.ndarray):
            cache_key = pixel_digest(pixel_values)
        feats = cache.get(cache_key)
        if feats is not None:
            return feats
    feats = encode_fn(pixel_values)
    if cache is not None:
        cache.put(cache_key, feats)
    return feats
