"""Shading combine — the math of VoxelConeTracing.fs:165-228 as array ops.

Direct diffuse + shadow, 6-cone indirect diffuse with cone-traced ambient
occlusion, Phong direct specular + 1-cone indirect specular, ambient term.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from vct_tpu.config import VCTConfig
from vct_tpu.core import cones as C
from vct_tpu.core import march as M

Array = jax.Array


def shadow_cone_value(
    mips: Sequence[Array],
    position: Array,             # (..., 3) surface point
    normal: Array,               # (..., 3)
    light_dir: Array,            # (3,) normalized, pointing toward the light
    schedule: M.MarchSchedule,
    cfg: VCTConfig,
) -> Array:
    """Differentiable soft shadow: transmittance of a narrow cone toward the
    light through the occupancy pyramid.  Replaces the 4096^2 depth map +
    PCF (VoxelConeTracing.fs:132-163) per BASELINE.json's north star.

    Unlike the gather cones this only needs transmittance, so it composites
    T = prod(1 - a') directly, with per-sample opacity gain (see
    ShadowConfig.opacity_gain) and step-density opacity correction.
    Returns shadow in [0,1], 1 = fully lit.
    """
    voxel = cfg.grid.voxel_world_size
    start = position + normal * (voxel * cfg.shadow.normal_offset)
    d = jnp.broadcast_to(light_dir, start.shape)
    if schedule.num_steps == 0:
        return jnp.ones(position.shape[:-1], position.dtype)
    dists = jnp.asarray(schedule.dists, position.dtype)
    points = start[..., None, :] + dists[:, None] * d[..., None, :]
    samples = M.sample_schedule(
        mips, points, schedule.lods, cfg.grid.world_size)
    a = jnp.minimum(samples[..., 3] * cfg.shadow.opacity_gain, 1.0)
    if schedule.step_factor != 1.0:
        keep = (1.0 - a) ** schedule.step_factor
    else:
        keep = 1.0 - a
    return jnp.prod(keep, axis=-1)


def shade(
    cfg: VCTConfig,
    mips: Sequence[Array],       # radiance pyramid
    position: Array,             # (..., 3)
    normal: Array,               # (..., 3) shading normal (bump-mapped or interpolated)
    tangent: Array,              # (..., 3)
    bitangent: Array,            # (..., 3)
    albedo: Array,               # (..., 3)
    spec_color: Array,           # (..., 3) after gray-fallback
    shadow: Array,               # (..., ) shadow value at the surface
    camera_position: Array,      # (3,)
    light_dir: Array,            # (3,) normalized
    shininess: float,
) -> Array:
    """Full combine (fs:165-228). Returns linear RGB (..., 3)."""
    voxel = cfg.grid.voxel_world_size
    ws = cfg.grid.world_size
    ca = cfg.cones

    n = C.normalize(normal)
    l = light_dir
    e = C.normalize(camera_position - position)      # fs:36 + :183

    # DIFFUSE — fs:186-205
    cos_theta = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
    direct_diffuse = shadow * cos_theta
    if not cfg.render.show_diffuse:
        direct_diffuse = jnp.zeros_like(direct_diffuse)

    tbn = C.tbn_matrix(tangent, bitangent, n)        # fs:175
    cone_dirs = C.rotate_cones(
        tbn, jnp.asarray(C.CONE_DIRECTIONS[: ca.num_diffuse_cones]))
    weights = tuple(float(w) for w in C.CONE_WEIGHTS[: ca.num_diffuse_cones])
    sched_d = M.march_schedule(
        ca.diffuse_tan_half_angle, voxel, ca.max_distance, ca.max_steps)
    start = position + n * voxel                     # fs:92 normal offset
    ind_diffuse_rgb, ind_diffuse_occ = M.cone_march_multi(
        mips, start, cone_dirs, weights, sched_d, ws,
        max_alpha=ca.max_alpha, occlusion_falloff=ca.occlusion_falloff)
    if not cfg.render.show_indirect_diffuse:
        ind_diffuse_rgb = jnp.zeros_like(ind_diffuse_rgb)
    occlusion = 1.0 - ind_diffuse_occ                # fs:201
    diffuse_reflection = (
        direct_diffuse[..., None] + occlusion[..., None] * ind_diffuse_rgb
    ) * albedo                                       # fs:205

    # SPECULAR — fs:208-223
    # reflect(-L, N) = 2*dot(N,L)*N - L   (GLSL reflect(I,N) = I - 2 dot(N,I) N)
    spec_reflect = C.normalize(
        2.0 * jnp.sum(n * l, axis=-1, keepdims=True) * n - l)
    spec = jnp.maximum(jnp.sum(e * spec_reflect, axis=-1), 0.0) ** shininess
    direct_specular = spec * shadow
    if not cfg.render.show_specular:
        direct_specular = jnp.zeros_like(direct_specular)

    if ca.trace_specular:
        # reflect(-E, N) = 2*dot(N,E)*N - E
        refl_e = C.normalize(
            2.0 * jnp.sum(n * e, axis=-1, keepdims=True) * n - e)
        sched_s = M.march_schedule(
            ca.specular_tan_half_angle, voxel, ca.max_distance, ca.max_steps)
        ind_spec_rgb, ind_spec_occ, _ = M.cone_march(
            mips, start, refl_e, sched_s, ws,
            max_alpha=ca.max_alpha, occlusion_falloff=ca.occlusion_falloff)
        if not cfg.render.show_indirect_specular:
            ind_spec_rgb = jnp.zeros_like(ind_spec_rgb)
        spec_occlusion = 1.0 - ind_spec_occ          # fs:221 (uses .a = occlusion)
        specular_reflection = (
            ind_spec_rgb + spec_occlusion[..., None] * direct_specular[..., None]
        ) * spec_color                               # fs:223
    else:
        specular_reflection = jnp.zeros_like(diffuse_reflection)

    # AMBIENT — fs:225
    ambient = cfg.light.ambient_factor * albedo * occlusion[..., None]

    return ambient + diffuse_reflection + specular_reflection   # fs:227


def spec_gray_fallback(spec: Array) -> Array:
    """specColor = length(spec.gb) > 0 ? spec : spec.rrr — fs:209-210."""
    gb = jnp.linalg.norm(spec[..., 1:3], axis=-1, keepdims=True)
    return jnp.where(gb > 0.0, spec, spec[..., 0:1])
