"""Deterministic voxelization scatter as a Pallas kernel.

Oracle: render/voxelize.py splat(mode="mean") — the deterministic
scatter-mean that replaces the reference's unordered last-write-wins
imageStore (Shader/Voxelization.fs:88).

TPU-native structure: GPU voxelization leans on atomics / unordered image
writes; TPU has neither, and Pallas grid programs run sequentially per
core, so determinism comes from OWNERSHIP instead:

  host (once per scene, numpy):  bin samples by output x-slab and pad each
  bin to a rectangle — the voxel-grid analogue of tile binning in a
  tile-based rasterizer;

  kernel:  grid over x-slabs; each program owns its (sx, D, D*(C+1))
  output block outright, streams its bin through VMEM, and accumulates
  weighted values + weights with masked read-modify-writes.  No two
  programs touch the same voxel, so the result is bit-deterministic
  regardless of scheduling.

The normalization (sum(w*v)/sum(w), occupancy alpha) happens in XLA after
the kernel — it is elementwise and fuses.

This is the component-parity kernel for the north-star's "triangle-to-3D-
grid scatter with radiance accumulation" (BASELINE.json); the production
default remains voxelize.splat's XLA segment scatter, which compiles to
sort+segment-sum and is already bandwidth-bound — see bench notes.
Differentiability: use the XLA path for the inverse configs; this kernel
is forward-only (static geometry, per-frame radiance re-splat).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_SLAB = 8            # output x rows per program


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def bin_samples_host(
    positions: np.ndarray,      # (S, 3) world
    dim: int,
    world_size: float,
    slab: int = _SLAB,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side prep: (order, bin_rows, pad_to) for slab-binned scatter.

    Returns the permutation that sorts samples by x-slab, the number of
    samples per slab, and the padded per-slab rectangle width.
    """
    uvw = positions / (world_size * 0.5) * 0.5 + 0.5
    idx = np.floor(uvw * dim).astype(np.int64)
    inside = np.all((idx >= 0) & (idx < dim), axis=-1)
    x = np.clip(idx[:, 0], 0, dim - 1)
    n_slabs = dim // slab
    # outside samples sort to a trailing pseudo-bin and are never binned
    sid = np.where(inside, x // slab, n_slabs)
    order = np.argsort(sid, kind="stable")
    counts = np.bincount(sid[inside], minlength=n_slabs)[:n_slabs]
    pad_to = int(max(1, counts.max()))
    pad_to = -(-pad_to // 8) * 8        # sublane-align
    return order.astype(np.int32), counts.astype(np.int32), pad_to


def _scatter_kernel(slab, dim, cw, pos_ref, val_ref, o_ref):
    """One x-slab: masked accumulate of its padded sample rectangle.

    pos_ref (1, N, 3) int32 LOCAL voxel coords (x already slab-relative;
    x == -1 marks padding), val_ref (1, N, CW) weighted values+weight,
    o_ref (slab*dim*dim, CW) — voxels on the sublane axis, channels on
    lanes, so the per-sample read-modify-write uses a dynamic ROW index
    with statically-aligned lanes (dynamic lane offsets are not
    expressible on TPU).
    """
    o_ref[:] = jnp.zeros(o_ref.shape, jnp.float32)
    n = pos_ref.shape[1]

    def body(i, _):
        x = pos_ref[0, i, 0]
        y = pos_ref[0, i, 1]
        z = pos_ref[0, i, 2]
        r = (x * dim + y) * dim + z

        @pl.when(x >= 0)
        def _():
            o_ref[r, :] = o_ref[r, :] + val_ref[0, i]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def splat_pallas(
    positions: np.ndarray,      # (S, 3) world, HOST array (static geometry)
    values: Array,              # (S, C) per-sample radiance/albedo
    weights: Array,             # (S,)
    dim: int,
    world_size: float,
) -> Array:
    """Pallas scatter-mean splat -> (dim, dim, dim, C+1), alpha = occupancy.

    positions must be a host numpy array (they are static scene geometry —
    voxelize.generate_surface_samples output); values/weights may be traced
    (radiance changes per light/bounce).
    """
    positions = np.asarray(positions)
    s = positions.shape[0]
    c = values.shape[-1]
    cw = c + 1
    slab = _SLAB
    n_slabs = dim // slab

    order, counts, pad_to = bin_samples_host(positions, dim, world_size,
                                             slab)
    uvw = positions / (world_size * 0.5) * 0.5 + 0.5
    idx = np.floor(uvw * dim).astype(np.int64)
    inside = np.all((idx >= 0) & (idx < dim), axis=-1)
    idx = np.clip(idx, 0, dim - 1)

    # padded (n_slabs * pad_to) layout: local coords, -1 x marks padding
    local = np.full((n_slabs, pad_to, 3), -1, np.int32)
    scatter_rows = np.full((s,), -1, np.int64)   # sample -> padded row
    off = 0
    for b in range(n_slabs):
        cnt = int(counts[b])
        sel = order[off:off + cnt]           # all inside by construction
        local[b, :cnt, 0] = idx[sel, 0] - b * slab
        local[b, :cnt, 1] = idx[sel, 1]
        local[b, :cnt, 2] = idx[sel, 2]
        scatter_rows[sel] = b * pad_to + np.arange(cnt)
        off += cnt

    # device: gather values into the padded layout (one XLA gather), then
    # the kernel streams rectangles
    wv = jnp.concatenate([values * weights[:, None], weights[:, None]],
                         axis=-1)                                 # (S, CW)
    padded = jnp.zeros((n_slabs * pad_to, cw), jnp.float32)
    rows = jnp.asarray(np.where(scatter_rows < 0, 0, scatter_rows))
    keep = jnp.asarray((scatter_rows >= 0).astype(np.float32))[:, None]
    padded = padded.at[rows].add(wv * keep)       # unique rows: pure placement
    padded = padded.reshape(n_slabs, pad_to, cw)

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, slab, dim, cw),
        grid=(n_slabs,),
        in_specs=[
            pl.BlockSpec((1, pad_to, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pad_to, cw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((slab * dim * dim, cw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dim * dim * dim, cw), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray(local), padded)

    acc = out.reshape(dim, dim, dim, cw)
    wsum = acc[..., -1:]
    color = acc[..., :-1] / jnp.maximum(wsum, 1e-8)
    alpha = (wsum > 0).astype(jnp.float32)
    return jnp.concatenate([color, alpha], axis=-1)
