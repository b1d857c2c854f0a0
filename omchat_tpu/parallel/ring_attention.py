"""Ring attention — context parallelism over a mesh axis.

The reference has no context parallelism (SURVEY.md §2.3: long context =
RoPE scaling only; the paper's 512K progressive training was not released).
This provides the TPU-native mechanism for long-prefill configs: the sequence
is sharded over a ``context`` mesh axis; each step every device computes block
attention between its local queries and the currently-held K/V shard while
``ppermute`` rotates K/V shards around the ICI ring, and online-softmax
statistics merge the partial results — attention over the full sequence
without any device materializing it.

Communication and compute overlap naturally: XLA schedules the ppermute of
step t+1 concurrently with the einsum of step t (both are inside one jitted
shard_map body).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _block_attention_stats(q, k, v, row_offset, col_offset, causal):
    """Partial attention of q against one kv block → (o_unnorm, m, l).

    q: [B, Sq, H, D]; k/v: [B, Sk, KVH, D].  Returns unnormalized output
    (sum of exp(s - m) @ v), row max m and row sum l, all fp32.
    """
    b, sq, h, d = q.shape
    sk, kvh = k.shape[1], k.shape[2]
    if kvh != h:
        k = jnp.repeat(k, h // kvh, axis=2)
        v = jnp.repeat(v, h // kvh, axis=2)

    scale = d**-0.5
    s = jnp.einsum("bshd,bthd->bhst", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    if causal:
        rows = jnp.arange(sq)[:, None] + row_offset
        cols = jnp.arange(sk)[None, :] + col_offset
        s = jnp.where((cols <= rows)[None, None], s, -jnp.inf)

    m = jnp.max(s, axis=-1)  # [B, H, Sq]
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(s - m_safe[..., None])
    p = jnp.where(jnp.isfinite(s), p, 0.0)
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhst,bthd->bshd", p, v.astype(jnp.float32))
    return o, m, l


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "context",
    causal: bool = True,
    batch_axis: Optional[str] = None,
) -> jax.Array:
    """Full-sequence attention with q/k/v sharded over ``axis`` on dim 1.

    q: [B, S, H, D]; k/v: [B, S, KVH, D] (global shapes).  Returns [B, S, H, D]
    with the same sharding.  Shard i holds rows [i*S/cp, (i+1)*S/cp).

    ``batch_axis``: mesh axis the batch dim is sharded over (a combined
    (data, context) training mesh) — the ring rotates only within each data
    group.
    """
    cp = mesh.shape[axis]

    def body(q_loc, k_loc, v_loc):
        idx = jax.lax.axis_index(axis)
        s_loc = q_loc.shape[1]
        row_offset = idx * s_loc

        def step(carry, t):
            k_cur, v_cur, acc, m, l = carry
            src_shard = (idx - t) % cp  # whose kv block we hold at step t
            col_offset = src_shard * s_loc

            o_t, m_t, l_t = _block_attention_stats(
                q_loc, k_cur, v_cur, row_offset, col_offset, causal
            )
            # online merge
            m_new = jnp.maximum(m, m_t)
            m_new_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - m_new_safe), 0.0)
            beta = jnp.where(jnp.isfinite(m_t), jnp.exp(m_t - m_new_safe), 0.0)
            acc = acc * alpha.transpose(0, 2, 1)[..., None] + o_t * beta.transpose(0, 2, 1)[..., None]
            l = l * alpha + l_t * beta

            # rotate kv around the ring: (source, dest) pairs send shard j to
            # device j+1, so at step t device d holds shard (d - t) % cp.
            perm = [(j, (j + 1) % cp) for j in range(cp)]
            k_next = jax.lax.ppermute(k_cur, axis, perm)
            v_next = jax.lax.ppermute(v_cur, axis, perm)
            return (k_next, v_next, acc, m_new, l), None

        b, sq, h, d = q_loc.shape
        acc0 = jnp.zeros((b, sq, h, d), jnp.float32)
        m0 = jnp.full((b, h, sq), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, h, sq), jnp.float32)

        (k_f, v_f, acc, m, l), _ = jax.lax.scan(
            step, (k_loc, v_loc, acc0, m0, l0), jnp.arange(cp)
        )
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out = acc / l_safe.transpose(0, 2, 1)[..., None]
        return out.astype(q_loc.dtype)

    spec = P(batch_axis, axis, None, None)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
