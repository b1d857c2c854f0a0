"""Pipeline parallelism (GPipe-style forward) over a ``stage`` mesh axis.

The reference has no PP (SURVEY.md §2.3: only HF ``device_map="auto"``
sequential layer placement).  This provides the genuinely-parallel TPU
equivalent for models that exceed TP reach: layers are split into S stages,
each stage's parameters live on one mesh slice, and microbatches stream
through the stages with ``ppermute`` handoffs over ICI — S + M - 1 pipeline
ticks for M microbatches instead of S·M sequential steps.

Forward/inference schedule (fill-drain).  Training would add a 1F1B backward
schedule on top; the TPU-idiomatic alternative for training remains
FSDP/TP/EP (parallel/sharding.py), which cover the reference's model sizes.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def pipeline_forward(
    stage_fn: Callable,
    stage_params,
    microbatches: jax.Array,
    mesh: Mesh,
    *,
    axis: str = "stage",
):
    """Run ``x -> stage_fn(params_s, x)`` through S pipelined stages.

    Args:
      stage_fn: pure function (stage_params, x) -> x, same shape in/out.
      stage_params: pytree whose leaves have a leading stage axis [S, ...];
        sharded one stage per device along ``axis``.
      microbatches: [M, ...] input microbatches (replicated).
      mesh: mesh with an ``axis`` dimension of size S.

    Returns [M, ...] outputs (replicated), bit-equal to applying the stages
    sequentially to each microbatch.
    """
    n_stages = mesh.shape[axis]
    m = microbatches.shape[0]
    perm_fwd = [(i, i + 1) for i in range(n_stages - 1)]

    def local(params, micro):
        # params: stage-local [1, ...] slice; micro: [M, ...] (replicated)
        params = jax.tree.map(lambda a: a[0], params)
        sid = jax.lax.axis_index(axis)
        zero = jnp.zeros_like(micro[0])

        def tick(t, carry):
            inbuf, outs = carry
            # stage 0 injects microbatch t (while available); others consume
            # the activation handed over from stage s-1 last tick.
            x_in = jnp.where(
                sid == 0,
                micro[jnp.minimum(t, m - 1)],
                inbuf,
            )
            y = stage_fn(params, x_in)
            # the last stage finished microbatch t - (S-1) at tick t
            done_idx = t - (n_stages - 1)
            outs = jnp.where(
                (sid == n_stages - 1) & (done_idx >= 0),
                outs.at[jnp.maximum(done_idx, 0)].set(y),
                outs,
            )
            nxt = jax.lax.ppermute(y, axis, perm_fwd)
            return nxt, outs

        outs0 = jnp.zeros_like(micro)
        _, outs = jax.lax.fori_loop(0, m + n_stages - 1, tick, (zero, outs0))
        # replicate the last stage's outputs to every stage
        return jax.lax.psum(
            jnp.where(sid == n_stages - 1, outs, jnp.zeros_like(outs)), axis
        )

    pspec = jax.tree.map(lambda _: P(axis), stage_params)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        check_vma=False,
    )(stage_params, microbatches)


def stage_split(params, n_stages: int):
    """Split a stacked-layer param tree [L, ...] into [S, L/S, ...] stages."""
    def split(a):
        l = a.shape[0]
        assert l % n_stages == 0, f"layers {l} not divisible by {n_stages} stages"
        return a.reshape(n_stages, l // n_stages, *a.shape[1:])

    return jax.tree.map(split, params)
