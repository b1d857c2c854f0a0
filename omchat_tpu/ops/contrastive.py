"""Cross-device contrastive (CLIP) loss.

The reference's GatherLayer + ClipLoss (multimodal_encoder/utils.py:652-728,
dead): all-gather features across data-parallel ranks, similarity logits with
a learned temperature, symmetric CE.  Here the gather is
``jax.lax.all_gather`` over the mesh's data axis inside shard_map — gradients
flow through the gathered copies exactly like the torch GatherLayer autograd
trick."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def clip_contrastive_loss(
    image_features: jax.Array,
    text_features: jax.Array,
    logit_scale: jax.Array,
    mesh: Mesh = None,
    axis: str = "data",
) -> jax.Array:
    """Symmetric InfoNCE over (optionally cross-device) batches.

    image/text features: [B_local, D] (L2-normalized by the caller or here).
    """

    def _norm(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(1e-6)

    def _loss(img, txt):
        img = _norm(img.astype(jnp.float32))
        txt = _norm(txt.astype(jnp.float32))
        if mesh is not None:
            all_img = jax.lax.all_gather(img, axis, tiled=True)
            all_txt = jax.lax.all_gather(txt, axis, tiled=True)
            rank = jax.lax.axis_index(axis)
        else:
            all_img, all_txt, rank = img, txt, 0
        b_local = img.shape[0]
        logits_i = logit_scale * img @ all_txt.T  # [B_local, B_global]
        logits_t = logit_scale * txt @ all_img.T
        labels = jnp.arange(b_local) + rank * b_local
        li = -jnp.take_along_axis(jax.nn.log_softmax(logits_i, -1), labels[:, None], 1).mean()
        lt = -jnp.take_along_axis(jax.nn.log_softmax(logits_t, -1), labels[:, None], 1).mean()
        local = (li + lt) / 2
        if mesh is not None:
            return jax.lax.pmean(local, axis)
        return local

    if mesh is None:
        return _loss(image_features, text_features)
    fn = jax.shard_map(
        _loss,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(image_features, text_features)
