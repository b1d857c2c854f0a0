"""Ulysses sequence-parallel attention — head/sequence all-to-all over ICI.

Absent from the reference (SURVEY.md §2.3: "Ulysses — not required"); provided
here as the DeepSpeed-Ulysses-style alternative to ring attention for long
prefill: activations arrive sequence-sharded, one ``all_to_all`` re-shards
them head-wise so every device runs *full-sequence* attention on ``H/P``
heads, and a second ``all_to_all`` restores sequence sharding.  Communication
is 2 all-to-alls of the qkv/o activations per layer (vs ring attention's
P-step kv rotation) and composes with the Megatron TP weight shardings.

Requirements: num_heads % P == 0 and seq_len % P == 0 (standard Ulysses
constraint); GQA kv heads with KVH < P are broadcast to query-head count
first (the kv all-to-all then moves the repeated heads — correct, at some
bandwidth cost, same trade DeepSpeed makes).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from omchat_tpu.ops.attention import _repeat_kv, _xla_attention


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "model",
    causal: bool = True,
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """q: [B, S, H, D]; k/v: [B, S, KVH, D] (full arrays; sequence axis is
    sharded over ``axis`` by the returned computation).  ``batch_axis``
    additionally shards B (the data axis of a (data, context) training mesh)
    so the shard_map doesn't gather the batch.  Returns [B, S, H, D] sharded
    like q."""
    h = q.shape[2]
    p = mesh.shape[axis]
    if h % p != 0 or q.shape[1] % p != 0:
        raise ValueError(f"Ulysses needs heads ({h}) and seq ({q.shape[1]}) divisible by P={p}")
    k = _repeat_kv(k, h)
    v = _repeat_kv(v, h)

    def local(q, k, v):
        # local shapes: [B, S/P, H, D] → all-to-all → [B, S, H/P, D]
        q = jax.lax.all_to_all(q, axis, split_axis=2, concat_axis=1, tiled=True)
        k = jax.lax.all_to_all(k, axis, split_axis=2, concat_axis=1, tiled=True)
        v = jax.lax.all_to_all(v, axis, split_axis=2, concat_axis=1, tiled=True)
        o = _xla_attention(q, k, v, causal=causal, q_offset=None, kv_len=None)
        # [B, S, H/P, D] → [B, S/P, H, D]
        return jax.lax.all_to_all(o, axis, split_axis=1, concat_axis=2, tiled=True)

    spec = P(batch_axis, axis, None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)(q, k, v)
