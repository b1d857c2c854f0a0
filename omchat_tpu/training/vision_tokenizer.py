"""Vision-tokenizer initialization — vocab extension for multimodal fine-tuning.

The reference's ``initialize_vision_tokenizer`` (omchat_arch.py:211-253) adds
the image special tokens to the tokenizer, resizes both embedding matrices to
the new tokenizer length, mean-initializes the fresh rows, optionally splices
pretrained adapter rows, and sets which embeddings train.  Here the same
contract is a pure function over the param pytree (no mutation): it returns the
resized params, the updated text config, and a trainable-leaf mask for the
optimizer (the functional replacement for torch's ``requires_grad`` flips).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from omchat_tpu.config import TextConfig
from omchat_tpu.constants import (
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
)


def _resize_rows(emb: jax.Array, new_size: int, num_new: int) -> jax.Array:
    """Resize [V, D] to [new_size, D]; the last ``num_new`` rows become the
    mean of all earlier rows (omchat_arch.py:223-229's ``input_embeddings_avg``
    applied after HF ``resize_token_embeddings`` truncates/extends)."""
    v, d = emb.shape
    if new_size <= v:
        emb = emb[:new_size]
    else:
        emb = jnp.concatenate([emb, jnp.zeros((new_size - v, d), emb.dtype)], axis=0)
    if num_new > 0:
        avg = jnp.mean(emb[:-num_new].astype(jnp.float32), axis=0, keepdims=True)
        emb = emb.at[-num_new:].set(jnp.broadcast_to(avg, (num_new, avg.shape[1])).astype(emb.dtype))
    return emb


def initialize_vision_tokenizer(
    params: dict,
    cfg: TextConfig,
    tokenizer,
    *,
    mm_use_im_patch_token: bool = False,
    mm_use_im_start_end: bool = False,
    tune_mm_mlp_adapter: bool = False,
    pretrain_embed_rows: Optional[np.ndarray] = None,
) -> Tuple[dict, TextConfig, dict]:
    """Add image special tokens and extend the embeddings to match.

    Args mirror the reference's model_args (omchat_arch.py:211-253):
      mm_use_im_patch_token: add ``<im_patch>``.
      mm_use_im_start_end: add ``<im_start>``/``<im_end>`` and mean-init the
        new input/output embedding rows.
      tune_mm_mlp_adapter: train the input embeddings, freeze the lm_head
        (returned via the trainable mask rather than requires_grad mutation).
      pretrain_embed_rows: optional pretrained ``embed_tokens`` weight — either
        the full resized matrix or just the ``num_new`` rows
        (omchat_arch.py:237-247's two accepted shapes).

    Returns (params, cfg, trainable_mask) — the mask is a pytree of bools over
    ``params`` (True = train this leaf) for ``optax.masked`` /
    ``make_sharded_train_step``; all-True when no freezing was requested.
    """
    lm = dict(params["language_model"])
    num_new = 0
    if mm_use_im_patch_token:
        num_new += tokenizer.add_tokens([DEFAULT_IMAGE_PATCH_TOKEN], special_tokens=True)
    if mm_use_im_start_end:
        num_new += tokenizer.add_tokens(
            [DEFAULT_IM_START_TOKEN, DEFAULT_IM_END_TOKEN], special_tokens=True
        )
    new_size = len(tokenizer)

    if num_new > 0 or new_size != cfg.vocab_size:
        mean_rows = num_new if mm_use_im_start_end else 0
        lm["embed_tokens"] = _resize_rows(lm["embed_tokens"], new_size, mean_rows)
        if "lm_head" in lm and not cfg.tie_word_embeddings:
            head = dict(lm["lm_head"])
            # lm_head kernel is [D, V]: resize/mean over the vocab axis
            head["kernel"] = _resize_rows(head["kernel"].T, new_size, mean_rows).T
            lm["lm_head"] = head
        cfg = dataclasses.replace(cfg, vocab_size=new_size)

    if pretrain_embed_rows is not None:
        assert mm_use_im_start_end and num_new == 2, "pretrained rows expect the im_start/im_end pair"
        rows = jnp.asarray(pretrain_embed_rows, lm["embed_tokens"].dtype)
        if rows.shape == lm["embed_tokens"].shape:
            lm["embed_tokens"] = lm["embed_tokens"].at[-num_new:].set(rows[-num_new:])
        elif rows.shape[0] == num_new:
            lm["embed_tokens"] = lm["embed_tokens"].at[-num_new:].set(rows)
        else:
            raise ValueError(
                f"Unexpected pretrained embed rows shape {rows.shape} for "
                f"embeddings {lm['embed_tokens'].shape} with {num_new} new tokens"
            )

    out_params = dict(params)
    out_params["language_model"] = lm

    # trainable mask: the functional analogue of the reference's
    # requires_grad flips (omchat_arch.py:231-236)
    def default_mask(p):
        return jax.tree.map(lambda _: True, p)

    mask = default_mask(out_params)
    if tune_mm_mlp_adapter and mm_use_im_start_end:
        mlm = dict(mask["language_model"])
        mlm["embed_tokens"] = True
        if "lm_head" in mlm:
            mlm["lm_head"] = jax.tree.map(lambda _: False, mlm["lm_head"])
        mask["language_model"] = mlm
    return out_params, cfg, mask
