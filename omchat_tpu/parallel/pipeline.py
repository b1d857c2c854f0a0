"""Pipeline parallelism (GPipe) over a ``stage`` mesh axis.

The reference has no PP (SURVEY.md §2.3: only HF ``device_map="auto"``
sequential layer placement).  This provides the genuinely-parallel TPU
equivalent for models that exceed TP reach: layers are split into S stages,
each stage's parameters live on one mesh slice, and microbatches stream
through the stages with ``ppermute`` handoffs over ICI — S + M - 1 pipeline
ticks for M microbatches instead of S·M sequential steps.

The fill-drain schedule is a ``lax.scan``, so the whole pipeline is
reverse-mode differentiable: AD transposes the scan and the ppermutes into
the mirrored backward schedule (gradients drain stage-by-stage over the
inverted ring), giving GPipe training without a hand-written 1F1B state
machine — :func:`pipeline_train_step`.  Activation memory is GPipe-style
(all M microbatch activations live through the backward; wrap ``stage_fn``
in ``jax.checkpoint`` to trade recompute for memory).  The TPU-idiomatic
default for the reference's model sizes remains FSDP/TP/EP
(parallel/sharding.py); PP is for models beyond TP reach.
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
    static=None,
):
    """Run ``x -> stage_fn(params_s, x)`` through S pipelined stages.

    Args:
      stage_fn: pure function (stage_params, x) -> x, same shape in/out —
        or (stage_params, x, s) -> x when ``static`` is given.  ``x`` may be
        a pytree; only ``x`` rides the ppermute ring between stages.
      stage_params: pytree whose leaves have a leading stage axis [S, ...];
        sharded one stage per device along ``axis``.
      microbatches: pytree whose leaves are [M, ...] microbatches (replicated).
      mesh: mesh with an ``axis`` dimension of size S.
      static: optional pytree of [M, ...] leaves that every stage already
        holds replicated (RoPE cos/sin tables, packing segment ids).  Stage s
        reads its microbatch locally at index t - s instead of paying ICI to
        ship values it has — only the hidden activation crosses stages.

    Returns [M, ...]-leaved outputs (replicated), bit-equal to applying the
    stages sequentially to each microbatch.
    """
    n_stages = mesh.shape[axis]
    m = jax.tree.leaves(microbatches)[0].shape[0]
    perm_fwd = [(i, i + 1) for i in range(n_stages - 1)]

    def local(params, micro, stat):
        # params: stage-local [1, ...] slice; micro: [M, ...] leaves (replicated)
        params = jax.tree.map(lambda a: a[0], params)
        sid = jax.lax.axis_index(axis)
        zero = jax.tree.map(lambda a: jnp.zeros_like(a[0]), micro)

        def tick(carry, t):
            inbuf, outs = carry
            # stage 0 injects microbatch t (while available); others consume
            # the activation handed over from stage s-1 last tick.
            x_in = jax.tree.map(
                lambda mb, ib: jnp.where(sid == 0, mb[jnp.minimum(t, m - 1)], ib),
                micro, inbuf,
            )
            if stat is None:
                y = stage_fn(params, x_in)
            else:
                # stage s works on microbatch t - s at tick t; replicated
                # leaves index locally instead of riding the ring (clamped —
                # fill/drain ticks compute garbage that is never stored)
                mb_idx = jnp.clip(t - sid, 0, m - 1)
                y = stage_fn(params, x_in, jax.tree.map(lambda a: a[mb_idx], stat))
            # the last stage finished microbatch t - (S-1) at tick t
            done_idx = t - (n_stages - 1)
            outs = jax.tree.map(
                lambda o, yl: jnp.where(
                    (sid == n_stages - 1) & (done_idx >= 0),
                    o.at[jnp.maximum(done_idx, 0)].set(yl),
                    o,
                ),
                outs, y,
            )
            nxt = jax.lax.ppermute(y, axis, perm_fwd)
            return (nxt, outs), None

        outs0 = jax.tree.map(jnp.zeros_like, micro)
        # scan (not fori_loop) so the schedule is reverse-differentiable
        (_, outs), _ = jax.lax.scan(
            tick, (zero, outs0), jnp.arange(m + n_stages - 1)
        )
        # replicate the last stage's outputs to every stage
        return jax.lax.psum(
            jax.tree.map(
                lambda o: jnp.where(sid == n_stages - 1, o, jnp.zeros_like(o)),
                outs,
            ),
            axis,
        )

    pspec = jax.tree.map(lambda _: P(axis), stage_params)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(pspec, P(), P()),
        out_specs=P(),
        check_vma=False,
    )(stage_params, microbatches, static)


def pipeline_train_step(
    stage_fn: Callable,
    loss_fn: Callable,
    stage_params,
    microbatches: jax.Array,
    targets,
    mesh: Mesh,
    *,
    axis: str = "stage",
    static=None,
):
    """One GPipe training step: loss and stage-sharded gradients.

    ``loss_fn(outputs [M, ...], targets) -> scalar`` (mean over microbatches
    for batch-size-invariant math).  The backward is AD's transpose of the
    pipelined scan — gradients stream back through the stages over the
    inverted ppermute ring, each stage accumulating grads only for its own
    [1, ...] parameter slice (same sharding as ``stage_params``).

    Returns ``(loss, grads)`` with grads shaped/sharded like stage_params.
    """

    def total_loss(sp):
        outs = pipeline_forward(stage_fn, sp, microbatches, mesh, axis=axis, static=static)
        return loss_fn(outs, targets)

    return jax.value_and_grad(total_loss)(stage_params)


def stage_split(params, n_stages: int):
    """Split a stacked-layer param tree [L, ...] into [S, L/S, ...] stages."""
    def split(a):
        l = a.shape[0]
        assert l % n_stages == 0, f"layers {l} not divisible by {n_stages} stages"
        return a.reshape(n_stages, l // n_stages, *a.shape[1:])

    return jax.tree.map(split, params)
