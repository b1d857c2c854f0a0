"""Device mesh construction.

The TPU-native replacement for the reference's NCCL/torch.distributed process
groups (SURVEY.md §5 "Distributed communication backend"): a
``jax.sharding.Mesh`` over ICI with named axes, collectives emitted by GSPMD
under pjit — no runtime daemon, no process-group objects.

Axes:
- ``data``: data parallel (batch) — also the FSDP shard axis when
  ``fsdp=True`` shardings are used,
- ``model``: tensor parallel (Megatron-style column/row splits).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    tp: int = 1,
    dp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh.  tp divides the device count; dp fills the rest.

    The model axis is placed innermost so tensor-parallel collectives ride the
    fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"tp={tp} does not divide device count {n}")
    dp = dp if dp is not None else n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def create_cp_mesh(
    cp: int,
    dp: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, context) mesh for ring-attention context parallelism
    (SURVEY.md §2.3 "CP"): the sequence axis shards over ``context`` and the
    ppermute KV ring rides the innermost (fastest-ICI) axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % cp != 0:
        raise ValueError(f"cp={cp} does not divide device count {n}")
    dp = dp if dp is not None else n // cp
    if dp * cp != n:
        raise ValueError(f"dp*cp = {dp * cp} != device count {n}")
    arr = np.asarray(devices).reshape(dp, cp)
    return Mesh(arr, axis_names=("data", "context"))


def shard(mesh: Mesh, spec: P) -> NamedSharding:
    return NamedSharding(mesh, spec)


def create_multislice_mesh(
    tp: int = 1,
    num_slices: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    slice_of=None,
) -> Mesh:
    """Multi-slice mesh: data parallel over DCN (across slices), tensor
    parallel over ICI (within a slice) — the TPU-pod analogue of the
    reference's (absent) multi-node NCCL topology.

    With one slice this degrades to :func:`create_mesh`.  On multi-slice
    deployments, devices are grouped by ``device.slice_index`` so the `data`
    axis crosses DCN and `model` stays on ICI.  ``slice_of`` overrides the
    grouping (device -> slice id) — single-slice/CPU validation runs use it
    to synthesize a multi-slice topology (virtual devices all report slice 0).
    """
    devices = list(devices if devices is not None else jax.devices())
    if num_slices <= 1:
        return create_mesh(tp=tp, devices=devices)
    if len(devices) % num_slices != 0:
        raise ValueError(f"{len(devices)} devices do not split into {num_slices} slices")
    per_slice = len(devices) // num_slices
    if per_slice % tp != 0:
        raise ValueError(f"tp={tp} does not divide the per-slice device count {per_slice}")
    slice_of = slice_of or (lambda d: getattr(d, "slice_index", 0))
    groups: dict = {}
    for d in devices:
        groups.setdefault(slice_of(d), []).append(d)
    if len(groups) != num_slices or any(len(g) != per_slice for g in groups.values()):
        raise ValueError(
            f"device slice grouping {sorted((k, len(g)) for k, g in groups.items())} "
            f"does not form {num_slices} equal slices of {per_slice}"
        )
    ordered = [d for idx in sorted(groups) for d in groups[idx]]
    arr = np.asarray(ordered).reshape(num_slices * (per_slice // tp), tp)
    return Mesh(arr, axis_names=("data", "model"))
