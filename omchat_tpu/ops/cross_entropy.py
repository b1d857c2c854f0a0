"""Cross-entropy losses, including the vocab-parallel TP variant.

TPU-native equivalent of the reference's dead-but-revealing fused TP
cross-entropy (/root/reference/omchat/model/language_model/
fused_cross_entropy.py:41-94: local CE + all_gather of LSE + all_reduce of
losses).  Here the same math is expressed with ``shard_map`` + ``psum`` over
the mesh's ``model`` axis — XLA emits the collectives over ICI; and the plain
path is a numerically-stable logsumexp CE that XLA fuses (no materialized
softmax), with ``IGNORE_INDEX`` (−100) label masking.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from omchat_tpu.constants import IGNORE_INDEX


def cross_entropy_loss(
    logits: jax.Array,
    labels: jax.Array,
    *,
    ignore_index: int = IGNORE_INDEX,
) -> Tuple[jax.Array, jax.Array]:
    """Mean CE over non-ignored labels.  logits [..., V] fp32, labels [...].

    Returns (mean_loss, num_valid)."""
    logits = logits.astype(jnp.float32)
    # out-of-vocab labels (e.g. special ids beyond a truncated vocab) are
    # ignored, not NaN-filled by the gather
    valid = (labels != ignore_index) & (labels >= 0) & (labels < logits.shape[-1])
    safe_labels = jnp.where(valid, labels, 0)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, safe_labels[..., None], axis=-1)[..., 0]
    loss = jnp.where(valid, lse - picked, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(loss) / n, jnp.sum(valid)


def vocab_parallel_cross_entropy(
    hidden: jax.Array,
    lm_head_kernel: jax.Array,
    labels: jax.Array,
    mesh: Mesh,
    *,
    ignore_index: int = IGNORE_INDEX,
) -> jax.Array:
    """CE with the vocab dimension sharded over the ``model`` axis.

    Each shard computes its local logits [B, S, V/tp], local max / sum-exp and
    the local label pick; global statistics come from ``psum`` over ICI —
    the full [B, S, V] logits tensor never materializes unsharded (the
    shard_map recast of fused_cross_entropy.py's all_gather/all_reduce dance).
    """
    v = lm_head_kernel.shape[-1]
    tp = mesh.shape["model"]
    shard_v = v // tp

    def local_ce(h, w, y):
        # h: [B, S, D] replicated; w: [D, V/tp] local shard; y: [B, S] replicated
        idx = jax.lax.axis_index("model")
        logits = (h @ w).astype(jnp.float32)  # [B, S, V/tp]
        local_max = jnp.max(logits, axis=-1)
        global_max = jax.lax.pmax(local_max, "model")
        sumexp = jnp.sum(jnp.exp(logits - global_max[..., None]), axis=-1)
        lse = global_max + jnp.log(jax.lax.psum(sumexp, "model"))

        valid = y != ignore_index
        y_safe = jnp.where(valid, y, 0)
        lo = idx * shard_v
        in_shard = (y_safe >= lo) & (y_safe < lo + shard_v)
        local_idx = jnp.where(in_shard, y_safe - lo, 0)
        picked_local = jnp.take_along_axis(logits, local_idx[..., None], axis=-1)[..., 0]
        picked = jax.lax.psum(jnp.where(in_shard, picked_local, 0.0), "model")

        loss = jnp.where(valid, lse - picked, 0.0)
        n = jnp.maximum(jnp.sum(valid), 1)
        return jnp.sum(loss) / n

    fn = jax.shard_map(
        local_ce,
        mesh=mesh,
        in_specs=(P(), P(None, "model"), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(hidden, lm_head_kernel, labels)
