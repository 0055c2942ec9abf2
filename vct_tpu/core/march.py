"""The cone march, recast as an array program.

Reference loop (Shader/VoxelConeTracing.fs:82-107):

    dist = voxelWorldSize
    startPos = Position_world + Normal_world * voxelWorldSize
    while dist < MAX_DISTANCE and alpha < MAX_ALPHA:
        diameter = max(voxelWorldSize, 2*tanHalfAngle*dist)
        lod      = log2(diameter / voxelWorldSize)
        c        = SampleVoxels(startPos + dist*direction, lod)
        color     += (1-alpha) * c.rgb
        occlusion += (1-alpha) * c.a / (1 + 0.03*diameter)
        alpha     += (1-alpha) * c.a
        dist      += diameter

Key observation exploited throughout this framework: `dist`, `diameter` and
`lod` depend only on (tanHalfAngle, voxelWorldSize, MAX_DISTANCE) — all
config constants — so the whole step schedule is STATIC.  The march is then

  (a) a fixed set of quadrilinear gathers at statically-known mip levels, and
  (b) a front-to-back emission-absorption composite, which is a parallel
      scan: with transmittance T_k = prod_{j<k}(1-a_j),
      color = sum_k active_k * T_k * c_k.  The early-out `alpha < MAX_ALPHA`
      is a monotone mask (alpha never decreases), so masking contributions
      where 1-T_k >= MAX_ALPHA reproduces the sequential loop exactly.

No data-dependent control flow remains — ideal for XLA and for the Pallas
kernel (ops/specmarch_pallas.py) which shares these schedules.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.core import grid as gridlib

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MarchSchedule:
    """Static per-step march parameters for one cone aperture."""

    tan_half_angle: float
    voxel_world_size: float
    max_distance: float
    dists: Tuple[float, ...]        # sample distance along the cone axis
    diameters: Tuple[float, ...]    # cone diameter at the sample
    lods: Tuple[float, ...]         # mip lod = log2(diameter / voxel_size)
    step_factor: float = 1.0        # advance = diameter * step_factor

    @property
    def num_steps(self) -> int:
        return len(self.dists)


def march_schedule(
    tan_half_angle: float,
    voxel_world_size: float,
    max_distance: float,
    max_steps: int | None = None,
    step_factor: float = 1.0,
) -> MarchSchedule:
    """Unroll the reference's dist/diameter recurrence (fs:94-105) statically.

    Step count is O(log(max_distance/voxel) / log(1+2*tan)) — e.g. ~9 steps
    for the 60-degree diffuse cones and ~40 for the 0.07 specular cone at
    the 128^3/150-unit reference operating point.

    step_factor < 1 advances by a fraction of the diameter (denser sampling
    than the reference; used by shadow cones where the diameter-sized step
    can tunnel through 1-voxel-thick occluders).  Sample opacity is then
    corrected in composite() so total optical depth is preserved.
    """
    dists: List[float] = []
    diams: List[float] = []
    lods: List[float] = []
    dist = voxel_world_size
    while dist < max_distance:
        diameter = max(voxel_world_size, 2.0 * tan_half_angle * dist)
        dists.append(dist)
        diams.append(diameter)
        lods.append(math.log2(diameter / voxel_world_size))
        dist += diameter * step_factor
        if max_steps is not None and len(dists) >= max_steps:
            break
    return MarchSchedule(
        tan_half_angle=tan_half_angle,
        voxel_world_size=voxel_world_size,
        max_distance=max_distance,
        dists=tuple(dists),
        diameters=tuple(diams),
        lods=tuple(lods),
        step_factor=step_factor,
    )


def _static_lod_plan(lods: Sequence[float], num_levels: int):
    """For each step: (l0, l1, w) with lod clamped into the available stack."""
    plan = []
    for lod in lods:
        lod = min(max(lod, 0.0), num_levels - 1)
        l0 = min(int(math.floor(lod)), num_levels - 1)
        l1 = min(l0 + 1, num_levels - 1)
        w = lod - l0
        plan.append((l0, l1, w))
    return plan


def sample_schedule(
    mips: Sequence[Array],
    points: Array,                    # (..., K, 3) world positions
    lods: Sequence[float],
    world_size: float,
    direction: Array | None = None,   # (..., 3) unit travel direction
) -> Array:
    """Quadrilinear samples for all K steps, gathers batched per mip level.

    Steps sharing a mip level are gathered in one trilinear_sample call, so
    the number of gather ops is O(levels touched), not O(steps).
    Returns (..., K, C).

    If the stack is anisotropic (core/aniso.py: levels >= 1 are 5-D with a
    6-direction axis) `direction` selects the directional pre-integrations;
    it is required in that case.
    """
    if len(mips) > 1 and mips[1].ndim == 5:
        from vct_tpu.core import aniso as A
        if direction is None:
            raise ValueError("anisotropic mip stack needs a march direction")
        return A.sample_schedule_aniso(mips, points, lods, world_size,
                                       direction)
    k = points.shape[-2]
    assert k == len(lods)
    plan = _static_lod_plan(lods, len(mips))
    uvw = gridlib.world_to_uvw(points, world_size)

    # level -> list of step indices needing that level
    need: Dict[int, List[int]] = {}
    for step, (l0, l1, w) in enumerate(plan):
        need.setdefault(l0, []).append(step)
        if w > 0.0 and l1 != l0:
            need.setdefault(l1, []).append(step)

    # batched gather per level
    per_level: Dict[int, Dict[int, Array]] = {}
    for lvl, steps in need.items():
        pts = uvw[..., np.array(steps), :]
        res = gridlib.trilinear_sample(mips[lvl], pts)     # (..., n, C)
        per_level[lvl] = {s: res[..., i, :] for i, s in enumerate(steps)}

    out = []
    for step, (l0, l1, w) in enumerate(plan):
        s0 = per_level[l0][step]
        if w > 0.0 and l1 != l0:
            out.append(s0 * (1.0 - w) + per_level[l1][step] * w)
        else:
            out.append(s0)
    return jnp.stack(out, axis=-2)


def composite(
    colors: Array,                    # (..., K, 3)
    alphas: Array,                    # (..., K)
    diameters: Sequence[float],       # (K,) static
    max_alpha: float = 0.95,
    occlusion_falloff: float = 0.03,
    step_factor: float = 1.0,
) -> Tuple[Array, Array, Array]:
    """Parallel front-to-back composite matching fs:100-103 exactly.

    step_factor != 1 applies opacity correction a' = 1-(1-a)^step_factor so
    denser sampling preserves optical depth (and scales emission likewise).
    Returns (color (...,3), occlusion (...), alpha (...)).
    """
    if step_factor != 1.0:
        keep = (1.0 - alphas) ** step_factor
        scale = jnp.where(
            alphas > 1e-6, (1.0 - keep) / jnp.maximum(alphas, 1e-6),
            step_factor)
        colors = colors * scale[..., None]
        alphas = 1.0 - keep
    one_m = 1.0 - alphas
    # exclusive cumprod: T_k = prod_{j<k} (1 - a_j); T_0 = 1
    t_incl = jnp.cumprod(one_m, axis=-1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1)
    # loop-top early-out: step k runs iff alpha-so-far < MAX_ALPHA (fs:94)
    active = (1.0 - t_excl) < max_alpha
    w = jnp.where(active, t_excl, 0.0)            # (1-alpha) factor per step
    color = jnp.sum(w[..., None] * colors, axis=-2)
    atten = 1.0 + occlusion_falloff * jnp.asarray(diameters, colors.dtype)
    occlusion = jnp.sum(w * alphas / atten, axis=-1)
    alpha = 1.0 - jnp.prod(jnp.where(active, one_m, 1.0), axis=-1)
    return color, occlusion, alpha


def cone_march(
    mips: Sequence[Array],
    start: Array,                     # (..., 3) pre-offset origin
    direction: Array,                 # (..., 3) unit direction
    schedule: MarchSchedule,
    world_size: float,
    max_alpha: float = 0.95,
    occlusion_falloff: float = 0.03,
) -> Tuple[Array, Array, Array]:
    """Voxel_Cone_Tracing(direction, tanHalfAngle) — fs:82-107.

    `start` must already include the normal offset
    (Position_world + Normal_world * voxelWorldSize, fs:92).
    Returns (color, occlusion, alpha); the reference packs (color, occlusion)
    into its vec4 return — alpha is exposed additionally for shadow cones.
    """
    if schedule.num_steps == 0:
        shp = start.shape[:-1]
        z = jnp.zeros(shp, start.dtype)
        return jnp.zeros(shp + (3,), start.dtype), z, z
    dists = jnp.asarray(schedule.dists, start.dtype)
    points = start[..., None, :] + dists[:, None] * direction[..., None, :]
    samples = sample_schedule(mips, points, schedule.lods, world_size,
                              direction=direction)
    return composite(
        samples[..., :3], samples[..., 3], schedule.diameters,
        max_alpha=max_alpha, occlusion_falloff=occlusion_falloff,
        step_factor=schedule.step_factor)


def cone_march_multi(
    mips: Sequence[Array],
    start: Array,                     # (..., 3)
    directions: Array,                # (..., K, 3) per-point cone set
    weights: Sequence[float],         # (K,) static cone weights
    schedule: MarchSchedule,
    world_size: float,
    max_alpha: float = 0.95,
    occlusion_falloff: float = 0.03,
) -> Tuple[Array, Array]:
    """Weighted multi-cone gather: sum_i w_i * ConeTrace(dir_i) — fs:196-199.

    Returns (color (...,3), occlusion (...)) accumulated with cone weights,
    matching `inDirectDiffuse` accumulation (color in .rgb, occlusion in .a).
    """
    color, occ, _ = cone_march(
        mips, start[..., None, :], directions, schedule, world_size,
        max_alpha=max_alpha, occlusion_falloff=occlusion_falloff)
    w = jnp.asarray(weights, color.dtype)
    return (
        jnp.sum(w[:, None] * color, axis=-2),
        jnp.sum(w * occ, axis=-1),
    )
