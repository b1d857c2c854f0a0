"""OmChat model assembly: vision encode → project → splice → decode.

Re-designs the reference's fusion routine (`prepare_inputs_labels_for_multimodal`,
/root/reference/omchat/model/omchat_arch.py:55-209 and
hf/modeling_omchat.py:769-923) for XLA's static-shape world:

- The reference loops over sequences in Python, concatenating text-embedding
  slices with image features at each ``-200`` sentinel, then re-pads the batch.
- Here the merged layout is computed host-side once (cheap integer work in
  numpy — :func:`plan_multimodal_merge`), and the device-side splice is a pair
  of gathers + a select inside the jitted forward (:func:`fuse_embeddings`),
  so tile count / text length only change the *bucketed* padded length, never
  the compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omchat_tpu.config import OmChatConfig
from omchat_tpu.constants import IMAGE_TOKEN_INDEX
from omchat_tpu.models.intern_vit import feature_select, intern_vit_forward
from omchat_tpu.models.projector import projector_forward
from omchat_tpu.models.qwen2 import embed_tokens


def encode_images(
    params: dict,
    cfg: OmChatConfig,
    pixel_values: jax.Array,
    *,
    attn_impl: Optional[str] = None,
) -> jax.Array:
    """ViT → feature_select → projector.  [N, 3, H, W] → [N, L, D_text].

    Reference: encode_images (omchat_arch.py:50-53) with the HF bundle's
    hardcoded hidden_states[-1] + CLS drop (modeling_omchat.py:745-767).
    """
    hidden = intern_vit_forward(
        params["vision_tower"],
        cfg.vision,
        pixel_values,
        feature_layer=cfg.vision_feature_layer,
        attn_impl=attn_impl,
    )
    feats = feature_select(hidden, cfg.vision_feature_select_strategy)
    return projector_forward(params["projector"], cfg.projector, feats)


# ---------------------------------------------------------------------------
# Host-side merge planning (static-shape analogue of the -200 splice loop)
# ---------------------------------------------------------------------------


@dataclass
class MergePlan:
    """Device-ready merged-sequence layout for a batch.

    token_ids:  [B, M] int32 — merged ids with 0 at image/pad rows
    is_image:   [B, M] bool — True where a row takes an image-feature vector
    image_index:[B, M] int32 — row into the flattened [ΣN*L, D] feature matrix
    lengths:    [B] int32 — true merged length per sequence (right padding)
    positions:  [B, M] int32 — 0..len-1 then 0s (matches omchat_arch.py:193)
    """

    token_ids: np.ndarray
    is_image: np.ndarray
    image_index: np.ndarray
    lengths: np.ndarray
    positions: np.ndarray

    @property
    def max_len(self) -> int:
        return self.token_ids.shape[1]


def round_up_to_bucket(n: int, bucket: int = 128) -> int:
    return ((n + bucket - 1) // bucket) * bucket


def plan_multimodal_merge(
    batch_input_ids: Sequence[Sequence[int]],
    image_seq_len: int,
    *,
    tokens_per_sentinel: Optional[Sequence[int]] = None,
    pad_to: Optional[int] = None,
    bucket: int = 128,
    max_length: Optional[int] = None,
) -> MergePlan:
    """Expand each ``-200`` sentinel into ``image_seq_len`` feature rows.

    ``tokens_per_sentinel`` overrides the per-sentinel expansion (global order
    across the batch), used when tiles vary per image.  Feature rows are
    consumed in sentinel order, matching the reference's sequential
    ``cur_image_idx`` walk (omchat_arch.py:119-152).
    """
    sentinel_counts: List[int] = []
    merged: List[Tuple[List[int], List[int], List[int]]] = []

    global_sentinel = 0
    feature_offset = 0
    for ids in batch_input_ids:
        tok: List[int] = []
        img_idx: List[int] = []
        is_img: List[int] = []
        for t in ids:
            if t == IMAGE_TOKEN_INDEX:
                n = (
                    tokens_per_sentinel[global_sentinel]
                    if tokens_per_sentinel is not None
                    else image_seq_len
                )
                tok.extend([0] * n)
                img_idx.extend(range(feature_offset, feature_offset + n))
                is_img.extend([1] * n)
                feature_offset += n
                global_sentinel += 1
            else:
                tok.append(int(t))
                img_idx.append(0)
                is_img.append(0)
        if max_length is not None:
            # truncate to tokenizer_model_max_length (omchat_arch.py:161-164)
            tok, img_idx, is_img = tok[:max_length], img_idx[:max_length], is_img[:max_length]
        merged.append((tok, img_idx, is_img))

    lengths = np.asarray([len(m[0]) for m in merged], dtype=np.int32)
    m_len = pad_to if pad_to is not None else round_up_to_bucket(int(lengths.max()), bucket)

    b = len(merged)
    token_ids = np.zeros((b, m_len), dtype=np.int32)
    image_index = np.zeros((b, m_len), dtype=np.int32)
    is_image = np.zeros((b, m_len), dtype=bool)
    positions = np.zeros((b, m_len), dtype=np.int32)
    for i, (tok, img_idx, is_img) in enumerate(merged):
        n = len(tok)
        token_ids[i, :n] = tok
        image_index[i, :n] = img_idx
        is_image[i, :n] = is_img
        positions[i, :n] = np.arange(n)
    return MergePlan(token_ids, is_image, image_index, lengths, positions)


def fuse_embeddings(
    params: dict,
    token_ids: jax.Array,
    is_image: jax.Array,
    image_index: jax.Array,
    image_features: Optional[jax.Array],
) -> jax.Array:
    """Device-side splice: text embedding where is_image is False, else the
    gathered image-feature row.  image_features: [R, D] flattened tile rows."""
    embeds = embed_tokens(params["language_model"], token_ids)
    if image_features is None:
        return embeds
    img = jnp.take(image_features, image_index, axis=0)  # [B, M, D]
    return jnp.where(is_image[..., None], img.astype(embeds.dtype), embeds)
