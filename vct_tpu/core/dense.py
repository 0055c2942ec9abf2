"""Direction-major (grid-major) dense cone marching — the TPU-native core.

The reference marches cones per fragment (VoxelConeTracing.fs:82-107):
per-pixel gathers at arbitrary positions.  TPU hardware has no fast
arbitrary-gather path (measured here: XLA gather ~80M rows/s vs 633 GB/s
dense — ~100x off the roofline), so this module restructures the march to
be GRID-major: march a cone *from every voxel center simultaneously* along
a FIXED direction.  Then every step reads the mip level at
(voxel_center + dist_k * dir) — a constant world offset — which is a
*separable shifted-trilinear resample*: three axis gathers of whole slices
(contiguous, bandwidth-speed) + lerps.  Zero per-element gathers.

Products:
  * light transmittance volume  S(v) = shadow cone from every voxel toward
    the light (one direction) — replaces both the reference's shadow map
    (4096^2 depth pass, Voxel_Cone_Tracing.h:81-105) and per-pixel/per-
    sample shadow marches with a single dense pass + one tap per query.
  * cone-gather fields G_b(v) = Voxel_Cone_Tracing(v, dir_b, tan) for a
    basis of world directions b — per-pixel indirect diffuse becomes a
    spherical interpolation of a few G fields at one position.

Both are EXACT cone marches at voxel centers (same schedule/composite as
core/march.py); between centers queries are trilinear, the same
interpolation the reference's hardware sampler applies to its textures.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.core import march as M

Array = jax.Array


def _axis_indices(df: int, dl: int, shift_vox_l: float) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """1D sample prep for one axis: field row i (at field res df) sampling a
    level of size dl shifted by shift_vox_l (in level-voxel units).

    Field voxel center i maps to level coordinate
      t = (i + 0.5) * (dl / df) + shift_vox_l - 0.5
    Returns (i0, i1, frac) with clamp-to-edge, all length df.
    """
    t = (np.arange(df) + 0.5) * (dl / df) + shift_vox_l - 0.5
    i0 = np.floor(t)
    f = (t - i0).astype(np.float32)
    i0 = i0.astype(np.int64)
    i1 = np.clip(i0 + 1, 0, dl - 1)
    i0c = np.clip(i0, 0, dl - 1)
    # preserve exact-zero weights at clamped edges so content doesn't smear
    return i0c.astype(np.int32), i1.astype(np.int32), f


def sample_shifted(level: Array, df: int, shift_vox: Sequence[float]) -> Array:
    """Resample `level` (dl,dl,dl,C) at the df^3 field grid shifted by a
    constant offset (in level-voxel units). Separable: one slice-gather +
    lerp per axis (contiguous accesses; no arbitrary gathers)."""
    dl = level.shape[0]
    out = level
    for axis, sv in enumerate(shift_vox):
        i0, i1, f = _axis_indices(df, dl, float(sv))
        a = jnp.take(out, jnp.asarray(i0), axis=axis)
        b = jnp.take(out, jnp.asarray(i1), axis=axis)
        shape = [1, 1, 1, 1]
        shape[axis] = df
        w = jnp.asarray(f).reshape(shape)
        out = a * (1.0 - w) + b * w
    return out


def directional_march(
    mips: Sequence[Array],
    direction: Sequence[float],          # unit world direction (static)
    schedule: M.MarchSchedule,
    world_size: float,
    field_dim: Optional[int] = None,
    max_alpha: float = 0.95,
    occlusion_falloff: float = 0.03,
    opacity_gain: float = 1.0,
    transmittance_only: bool = False,
) -> Array:
    """March the cone schedule from EVERY field voxel center along one fixed
    direction.  Returns (df, df, df, 4) = (color.rgb, occlusion) — the
    vec4 the reference's Voxel_Cone_Tracing returns (fs:107) — or
    (df, df, df, 1) transmittance if transmittance_only.

    Exactly the per-point march of core/march.py evaluated at all voxel
    centers at once; sequential over the (static, ~10-100) steps with
    running front-to-back accumulators, each step one dense shifted
    resample of a statically-chosen mip level.
    """
    d0 = mips[0].shape[0]
    df = field_dim or d0
    dtype = mips[0].dtype
    dirv = np.asarray(direction, np.float64)
    voxel = world_size / d0

    plan = M._static_lod_plan(schedule.lods, len(mips))
    t = jnp.ones((df, df, df, 1), dtype)            # transmittance so far
    color = None if transmittance_only else jnp.zeros((df, df, df, 3), dtype)
    occ = None if transmittance_only else jnp.zeros((df, df, df, 1), dtype)

    for k, (l0, l1, w) in enumerate(plan):
        offset_world = dirv * schedule.dists[k]

        def level_sample(lvl):
            dl = mips[lvl].shape[0]
            shift = offset_world / (world_size / dl)   # level-voxel units
            return sample_shifted(mips[lvl], df, shift)

        s = level_sample(l0)
        if w > 0.0 and l1 != l0:
            s = s * (1.0 - w) + level_sample(l1) * w

        a = s[..., -1:]
        if opacity_gain != 1.0:
            a = jnp.minimum(a * opacity_gain, 1.0)
        if schedule.step_factor != 1.0:
            keep = (1.0 - a) ** schedule.step_factor
        else:
            keep = 1.0 - a

        if transmittance_only:
            t = t * keep
        else:
            # loop-top early-out (fs:94): no contribution once 1-T >= max_alpha
            active = (1.0 - t) < max_alpha
            wgt = jnp.where(active, t, 0.0)
            color = color + wgt * s[..., :3]
            occ = occ + wgt * a / (1.0 + occlusion_falloff
                                   * schedule.diameters[k])
            t = jnp.where(active, t * keep, t)

    if transmittance_only:
        return t
    return jnp.concatenate([color, occ], axis=-1)


# ---------------------------------------------------------------------------
# Direction basis for the gather-cone fields
# ---------------------------------------------------------------------------

def direction_basis(n: int = 26) -> np.ndarray:
    """A small world-space direction basis covering the sphere.

    26 = 6 faces + 12 edges + 8 corners of the cube (normalized) — ample
    angular resolution for 60-degree-aperture diffuse cones, whose lobes are
    low-pass by construction.
    """
    if n == 6:
        dirs = [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1],
                [0, 0, -1]]
    elif n == 26:
        dirs = []
        for x in (-1, 0, 1):
            for y in (-1, 0, 1):
                for z in (-1, 0, 1):
                    if x == y == z == 0:
                        continue
                    dirs.append([x, y, z])
    else:
        raise ValueError(f"unsupported basis size {n}")
    d = np.asarray(dirs, np.float64)
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def basis_weights(dirs: Array, basis: np.ndarray, power: float = 8.0) -> Array:
    """Spherical interpolation weights of query dirs (..., 3) over the basis
    (B, 3): normalized max(cos,0)^power — a smooth partition of unity over
    the covered hemisphere around each query."""
    cos = jnp.einsum("...i,bi->...b", dirs, jnp.asarray(basis))
    w = jnp.maximum(cos, 0.0) ** power
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)
