"""Device-mesh construction (SURVEY.md §2.4).

Axes:
  data  — embarrassingly-parallel pixel/ray tiles (the SIMT-over-fragments
          parallelism the GPU gave the reference implicitly)
  model — spatial voxel-brick sharding for 512^3+ grids (parallel/brick.py);
          also used to shard voxelization surface samples

Multi-host: jax.distributed.initialize() before calling make_mesh; the mesh
spans all processes' devices and XLA routes collectives over ICI within a
slice and DCN across slices.  There is no hand-written transport layer —
the reference has none either (single GPU); scaling is mesh + shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A ('data', 'model') mesh. n_data=None uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_model={n_model}")
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def rays_sharding(mesh: Mesh) -> NamedSharding:
    """Image rows sharded over 'data' (tile-DP)."""
    return NamedSharding(mesh, P("data"))


def samples_sharding(mesh: Mesh) -> NamedSharding:
    """Voxelization surface samples sharded over 'model': each model shard
    splats its samples; XLA all-reduces the partial grids."""
    return NamedSharding(mesh, P("model"))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad axis 0 so sharded dims divide evenly; returns (padded, orig_len)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(np.asarray(x), widths), n
