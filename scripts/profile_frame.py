"""Stage-by-stage timing of the 1080p camera pass (VERDICT.md item 1).

Times, at the sponza256 bench operating point:
  raycast-only, shadow tap, diffuse field tap, specular field tap,
  atlas albedo/spec/bump, combine — each as a separately jitted pass over
  the full frame, so we see which gathers dominate the 3.2 s frame.

NOTE: device arrays must be ARGUMENTS of the jitted fns, never closures —
closures lower to embedded constants and ship through the axon tunnel.
"""

import dataclasses
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from vct_tpu.config import preset
from vct_tpu.core import camera as cameralib
from vct_tpu.render import renderer as R
from vct_tpu.render import shading
from vct_tpu.render.gbuffer import pinhole_constants, raycast_chunk_pinhole
from vct_tpu.scene import atrium
from vct_tpu.scene import textures as TX


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def timeit(name, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / reps * 1e3
    log(f"{name:36s} {dt:9.1f} ms   (compile {compile_s:.0f}s)")
    return out, dt


def main():
    width, height = 1920, 1080
    cfg = preset("sponza256")
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, width=width, height=height))
    scene = atrium()
    camera = cameralib.Camera(position=(48.0, -10.0, 0.0), yaw=180.0)
    ds, mats, samples = R.prepare_scene(cfg, scene)
    log(f"triangles: {ds.v0.shape[0]}")
    voxels = R.build_voxel_state_staged(cfg, samples, mats)
    sync(voxels.radiance_mips[0])
    log(f"diffuse field: {voxels.diffuse_field.shape} "
        f"{voxels.diffuse_field.dtype}")
    log(f"light volume: {voxels.light_volume.shape}")

    origins, dirs = cameralib.primary_rays(camera, width, height)
    cam_pos = jnp.asarray(camera.position, jnp.float32)
    d = dirs.reshape(-1, 3)
    o = origins.reshape(-1, 3)
    n = d.shape[0]
    chunk = 65536
    pad = (-n) % chunk
    if pad:
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    dchunks = d.reshape(-1, chunk, 3)
    light_dir = R.light_direction(cfg)

    # --- raycast only ---
    @jax.jit
    def raycast_only(ds_, dch, o0):
        pc = pinhole_constants(ds_, o0)
        return jax.lax.map(lambda dc: raycast_chunk_pinhole(ds_, pc, o0, dc),
                           dch)

    gbuf, _ = timeit("raycast (pinhole, full frame)", raycast_only,
                     ds, dchunks, o[0])

    def chunked(fn):
        @jax.jit
        def run(gb, *extra):
            return jax.lax.map(lambda g: fn(g, *extra), gb)
        return run

    gchunks = gbuf  # (nchunk, chunk, ...)

    timeit("shadow volume tap", chunked(
        lambda g, lv: shading.shadow_volume_tap(
            cfg, lv, g.position, g.geo_normal)), gchunks, voxels.light_volume)

    def diffuse_tap(g, field):
        cone_dirs = shading.pixel_cone_dirs(cfg, g.normal, g.tangent,
                                            g.bitangent)
        return shading.indirect_diffuse_field(
            cfg, field, g.position, g.normal, cone_dirs)

    timeit("diffuse field tap (26b)", chunked(diffuse_tap), gchunks,
           voxels.diffuse_field)

    def spec_tap(g, field, cp):
        eye = shading.C.normalize(cp - g.position)
        refl = shading.reflect_eye(g.normal, eye)
        return shading.indirect_specular_field(
            cfg, field, g.position, g.normal, refl)

    timeit("specular field tap (26b)", chunked(spec_tap), gchunks,
           voxels.specular_field, cam_pos)

    timeit("atlas albedo", chunked(
        lambda g, m: m.sample_albedo(g.material, g.uv)), gchunks, mats)
    timeit("atlas specular", chunked(
        lambda g, m: m.sample_specular(g.material, g.uv)), gchunks, mats)
    if mats.atlas is not None:
        timeit("bump normal", chunked(
            lambda g, m: TX.bump_normal(m.atlas, g.material, g.uv, g.tangent,
                                        g.bitangent, g.normal)), gchunks, mats)

    # --- full shade (gbuffer -> rgb), chunked ---
    @jax.jit
    def shade_only(gb, v, m, cp, ld):
        return jax.lax.map(
            lambda g: R.shade_gbuffer(cfg, v, g, m, cp, ld), gb)

    timeit("shade_gbuffer (all taps+combine)", shade_only, gchunks,
           voxels, mats, cam_pos, light_dir)

    # --- full frame (raycast + shade) as shipped ---
    @jax.jit
    def full(ds_, v, m, o_, d_, cp):
        return R.render_rays(cfg, ds_, v, m, o_, d_, cp, chunk_size=chunk)

    timeit("render_rays (shipped path)", full, ds, voxels, mats,
           origins, dirs, cam_pos)


if __name__ == "__main__":
    main()
