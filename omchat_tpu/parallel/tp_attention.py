"""Tensor-parallel Pallas flash attention: the kernel per shard, not GSPMD.

GSPMD cannot partition a ``pallas_call`` (opaque custom call) — with sharded
operands it replicates them, all-gathering q/k/v across the mesh.  This
module runs the flash kernel *per shard* under ``jax.shard_map``: heads are
Megatron-sharded over the mesh's ``model`` axis, each device runs the kernel
on its local head slice, and no collective is needed at all (attention is
embarrassingly parallel over heads).

Engines select this path via ``attn_impl=("pallas_tp", mesh)`` — the tuple is
hashable, so it rides the existing static ``attn_impl`` plumbing through the
jitted prefill/decode programs unchanged.

Requires H % tp == 0 and KVH % tp == 0 (each shard keeps whole GQA groups);
callers fall back to the XLA impl otherwise (it partitions cleanly).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def tp_shardable(mesh, num_heads: int, num_kv_heads: int) -> bool:
    """Whole GQA groups must land on each shard of the model axis, and the
    mesh must be pure TP: this path pins batch/sequence to replicated specs,
    so on a mesh that also has a >1 ``data`` axis it would silently all-gather
    batch-sharded activations — those meshes fall back to the XLA impl, which
    partitions cleanly under GSPMD."""
    tp = mesh.shape.get("model", 1)
    pure_tp = all(size == 1 for name, size in mesh.shape.items() if name != "model")
    return pure_tp and tp > 1 and num_heads % tp == 0 and num_kv_heads % tp == 0


def tp_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh,
    *,
    causal: bool = False,
    q_offset: Optional[jax.Array] = None,
    kv_len: Optional[jax.Array] = None,
    kv_format: str = "btnd",
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with heads sharded over the mesh's ``model`` axis.

    Semantics match :func:`omchat_tpu.ops.flash_attention.flash_attention`;
    batch/sequence stay replicated (the serving mesh is pure TP).
    """
    from omchat_tpu.ops.flash_attention import flash_attention

    B = q.shape[0]
    T = k.shape[1] if kv_format == "btnd" else k.shape[2]
    S = q.shape[1]
    if q_offset is None:
        q_offset = jnp.full((B,), T - S, jnp.int32)
    else:
        q_offset = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (B,))
    if kv_len is None:
        kv_len = jnp.full((B,), T, jnp.int32)
    else:
        kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (B,))

    head_axis = 2 if kv_format == "btnd" else 1
    kv_spec = [None, None, None, None]
    kv_spec[head_axis] = "model"
    kv_spec = P(*kv_spec)
    q_spec = P(None, None, "model", None)

    def local(q, k, v, q_offset, kv_len):
        return flash_attention(
            q, k, v, causal=causal, q_offset=q_offset, kv_len=kv_len,
            kv_format=kv_format, interpret=interpret,
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, P(None), P(None)),
        out_specs=q_spec,
        check_vma=False,
    )
    return fn(q, k, v, q_offset, kv_len)
