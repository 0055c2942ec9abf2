"""End-to-end renderer: scene -> voxel radiance pyramid -> image.

The pipeline mirrors the reference's pass structure (SURVEY.md §3) as
sequential jitted stages:

  reference                           here
  ---------                           ----
  DrawDepthTexture (shadow map)       shadow cones through the occupancy
                                      pyramid (cfg.shadow.mode="cone"), or
                                      render/shadowmap.py ("map")
  DrawVoxelTexture + glGenerateMipmap build_voxel_state(): splat albedo ->
                                      occupancy mips -> per-sample shadow ->
                                      splat radiance -> radiance mips
  Render() raster + fragment shader   raycast G-buffer + shading.shade()

Everything after host-side scene prep is jit-compatible and differentiable
w.r.t. material colors, light parameters, and (via inject_radiance) voxel
radiance itself.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.config import VCTConfig
from vct_tpu.core import camera as cameralib
from vct_tpu.core import cones as C
from vct_tpu.core import grid as G
from vct_tpu.core import march as M
from vct_tpu.render import shading
from vct_tpu.render.gbuffer import DeviceScene, GBuffer, raycast
from vct_tpu.render.voxelize import SurfaceSamples, generate_surface_samples, splat
from vct_tpu.scene.mesh import Scene

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MaterialTable:
    """Constant material colors as device arrays; texture atlas support is
    layered on in scene/textures.py."""

    albedo: Array      # (M, 4)
    specular: Array    # (M, 3)
    emissive: Array    # (M, 3)

    @staticmethod
    def from_scene(scene: Scene, dtype=jnp.float32) -> "MaterialTable":
        return MaterialTable(
            albedo=jnp.asarray([m.albedo for m in scene.materials], dtype),
            specular=jnp.asarray([m.specular for m in scene.materials], dtype),
            emissive=jnp.asarray([m.emissive for m in scene.materials], dtype),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplesDevice:
    """Surface samples on device (static per scene)."""

    positions: Array     # (S, 3)
    normals: Array       # (S, 3)
    uvs: Array           # (S, 2)
    material_ids: Array  # (S,)

    @staticmethod
    def from_samples(s: SurfaceSamples, dtype=jnp.float32) -> "SamplesDevice":
        return SamplesDevice(
            positions=jnp.asarray(s.positions, dtype),
            normals=jnp.asarray(s.normals, dtype),
            uvs=jnp.asarray(s.uvs, dtype),
            material_ids=jnp.asarray(s.material_ids),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VoxelState:
    """The voxel pyramids: lit radiance (sampled by the camera-pass cones)
    and unlit albedo/occupancy (sampled by shadow cones)."""

    radiance_mips: Tuple[Array, ...]
    unlit_mips: Tuple[Array, ...]


def prepare_scene(cfg: VCTConfig, scene: Scene):
    """Host-side prep: device geometry, material table, surface samples."""
    ds = DeviceScene.from_scene(scene)
    mats = MaterialTable.from_scene(scene)
    samples = generate_surface_samples(
        scene, cfg.grid.voxel_world_size,
        cfg.voxelize.samples_per_voxel_width)
    return ds, mats, SamplesDevice.from_samples(samples)


def shadow_schedule(cfg: VCTConfig) -> M.MarchSchedule:
    """Shadow-cone schedule: full-grid reach, denser steps (ShadowConfig)."""
    md = cfg.shadow.max_distance
    if md is None:
        md = 3.0 ** 0.5 * cfg.grid.world_size
    return M.march_schedule(
        cfg.shadow.tan_half_angle, cfg.grid.voxel_world_size, md,
        cfg.cones.max_steps, step_factor=cfg.shadow.step_factor)


def light_direction(cfg: VCTConfig, dtype=jnp.float32) -> Array:
    """L = normalize(LightDirection) — fs:181."""
    l = jnp.asarray(cfg.light.direction, dtype)
    return l / jnp.linalg.norm(l)


def build_voxel_state(
    cfg: VCTConfig,
    samples: SamplesDevice,
    mats: MaterialTable,
    light_dir: Optional[Array] = None,
    light_color: Optional[Array] = None,
) -> VoxelState:
    """Voxelization + radiance injection + mip build (startup passes §3.3).

    Stage 1: splat albedo -> unlit grid (rgb=mean albedo, a=occupancy).
    Stage 2: per-sample shadow via a cone toward the light through the
             occupancy pyramid (replaces Voxelization.fs:18-52's PCF lookup).
    Stage 3: splat albedo*light*shadow + emissive -> radiance grid
             (Voxelization.fs:88 stores albedo*shadow, occupancy 1.0).
    Stage 4: isotropic mip chains (Voxel_Cone_Tracing.h:248).
    """
    dim, ws = cfg.grid.dim, cfg.grid.world_size
    if light_dir is None:
        light_dir = light_direction(cfg)
    if light_color is None:
        light_color = jnp.asarray(cfg.light.color, jnp.float32)

    albedo = mats.albedo[samples.material_ids]           # (S, 4)
    emissive = mats.emissive[samples.material_ids]       # (S, 3)
    weights = jnp.ones(samples.positions.shape[0], albedo.dtype)

    unlit = splat(samples.positions, albedo[:, :3], weights, dim, ws,
                  mode=cfg.voxelize.mode)
    # conservative (max-alpha) mips: shadow cones must not leak through
    # thin occluders diluted by mean-reduction (see grid.downsample2x)
    unlit_mips = G.build_mips(unlit, cfg.grid.num_levels, alpha_mode="max")

    sched = shadow_schedule(cfg)
    shadow = shading.shadow_cone_value(
        unlit_mips, samples.positions, samples.normals, light_dir, sched, cfg)

    radiance = albedo[:, :3] * light_color * shadow[:, None] + emissive
    lit = splat(samples.positions, radiance, weights, dim, ws,
                mode=cfg.voxelize.mode)
    return VoxelState(
        radiance_mips=G.build_mips(lit, cfg.grid.num_levels),
        unlit_mips=unlit_mips,
    )


def shade_gbuffer(
    cfg: VCTConfig,
    voxels: VoxelState,
    gbuf: GBuffer,
    mats: MaterialTable,
    camera_position: Array,
    light_dir: Optional[Array] = None,
) -> Array:
    """Fragment-stage equivalent: G-buffer -> linear RGB image."""
    if light_dir is None:
        light_dir = light_direction(cfg)

    albedo4 = mats.albedo[gbuf.material]                 # (..., 4)
    spec = shading.spec_gray_fallback(mats.specular[gbuf.material])

    sched = shadow_schedule(cfg)
    shadow = shading.shadow_cone_value(
        voxels.unlit_mips, gbuf.position, gbuf.geo_normal, light_dir,
        sched, cfg)

    rgb = shading.shade(
        cfg, voxels.radiance_mips,
        position=gbuf.position,
        normal=gbuf.normal,
        tangent=gbuf.tangent,
        bitangent=gbuf.bitangent,
        albedo=albedo4[..., :3],
        spec_color=spec,
        shadow=shadow,
        camera_position=camera_position,
        light_dir=light_dir,
        shininess=cfg.render.shininess,
    )
    # alpha-mask discard (fs:169-172) + miss -> background
    bg = jnp.asarray(cfg.render.background, rgb.dtype)
    visible = gbuf.hit & (albedo4[..., 3] >= cfg.render.alpha_threshold)
    return jnp.where(visible[..., None], rgb, bg)


def render_rays(
    cfg: VCTConfig,
    ds: DeviceScene,
    voxels: VoxelState,
    mats: MaterialTable,
    origins: Array,
    dirs: Array,
    camera_position: Array,
    light_dir: Optional[Array] = None,
    chunk_size: int = 4096,
) -> Array:
    gbuf = raycast(ds, origins, dirs, chunk_size=chunk_size)
    return shade_gbuffer(cfg, voxels, gbuf, mats, camera_position, light_dir)


def render_image(
    cfg: VCTConfig,
    scene: Scene,
    camera: Optional[cameralib.Camera] = None,
    jit: bool = True,
) -> np.ndarray:
    """Convenience one-shot: prepare, voxelize, render. Returns (H, W, 3)."""
    if camera is None:
        camera = cameralib.Camera()
    ds, mats, samples = prepare_scene(cfg, scene)
    origins, dirs = cameralib.primary_rays(
        camera, cfg.render.width, cfg.render.height)
    cam_pos = jnp.asarray(camera.position, jnp.float32)

    def pipeline(origins, dirs, cam_pos, samples, mats):
        voxels = build_voxel_state(cfg, samples, mats)
        return render_rays(cfg, ds, voxels, mats, origins, dirs, cam_pos)

    fn = jax.jit(pipeline) if jit else pipeline
    return np.asarray(fn(origins, dirs, cam_pos, samples, mats))
