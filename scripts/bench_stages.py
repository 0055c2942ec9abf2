"""TPU stage breakdown of the fast frame path at 1080p: raycast /
brick-select prepass / tap kernel / material+combine, each timed as its
own jitted stage so the 338 ms frame (BENCH r3 start) can be attributed.

Run from the repo root: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_stages.py
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.config import preset
from vct_tpu.core import camera as cameralib
from vct_tpu.core import grid as G
from vct_tpu.ops import raycast_pallas as RP
from vct_tpu.ops import tap_pallas as TP
from vct_tpu.render import fast as F
from vct_tpu.render import renderer as R
from vct_tpu.scene.atrium import atrium


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def timeit(name, fn, reps=10):
    """Queue `reps` async dispatches, sync once: the axon tunnel's ~22 ms
    readback latency amortizes out (bench.py's NOTE on timing)."""
    sync(fn())  # compile + settle
    t0 = time.time()
    for _ in range(reps - 1):
        fn()
    sync(fn())
    dt = (time.time() - t0) / reps
    log(f"{name:32s} {dt*1e3:8.1f} ms")
    return dt


def main():
    width, height = 1920, 1080
    cfg = preset("sponza256")
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, width=width,
                                        height=height))
    scene = atrium()
    camera = cameralib.Camera(position=(48.0, -10.0, 0.0), yaw=180.0)
    ds, mats, samples = R.prepare_scene(cfg, scene)
    voxels = R.build_voxel_state_staged(cfg, samples, mats)
    tables = F.build_frame_tables(cfg, voxels, mats)
    sync(tables.field_mips[0])

    origins, dirs = cameralib.primary_rays(camera, width, height)
    cam = jnp.asarray(camera.position, jnp.float32)
    h, w = dirs.shape[:2]
    hp = -(-h // F.TSY) * F.TSY
    wp = -(-w // F.TSX) * F.TSX
    dpad = jnp.pad(dirs, ((0, hp - h), (0, wp - w), (0, 0)), mode="edge")
    d = jax.jit(lambda x: F._tile_order(x, hp, wp))(dpad)
    origin = origins.reshape(-1, 3)[0]
    isect, attrs, _ = RP.pack_tables(ds, origin, mats.albedo, mats.specular)

    rc = jax.jit(lambda d: RP.raycast_gbuf24(d, origin, isect, attrs))
    g = rc(d)
    timeit("raycast_gbuf24", lambda: rc(d))

    voxel = cfg.grid.voxel_world_size
    ws = cfg.grid.world_size
    tile = F.TSY * F.TSX
    ntiles = g.shape[0] // tile
    ldims = tuple(m.shape[0] for m in tables.light_mips)
    fdims = tuple(m.shape[0] for m in tables.field_mips)

    from vct_tpu.scene import textures as TX
    from vct_tpu.render import shading
    from vct_tpu.ops import material_pallas as MP
    from vct_tpu.ops import prepass_pallas as PP

    res = MP.pages_resolution(tables.atlas_pages)

    @jax.jit
    def prepass(g):
        return PP.prepass_tiles(
            g, light_dims=ldims, field_dims=fdims,
            num_materials=tables.atlas_pages.shape[0], resolution=res,
            atlas_levels=int(np.log2(res)) + 1, voxel=voxel,
            world_size=ws, shadow_offset=cfg.shadow.normal_offset,
            has_atlas=True, tile=tile)

    scal, mscal, mlists, mslots = prepass(g)
    timeit("fused prepass kernel", lambda: prepass(g)[0])

    @jax.jit
    def material(g, mscal, mlists, mslots):
        mout = MP.material_tiles(
            g, mslots, mscal, mlists, tables.atlas_pages,
            resolution=res, tile=tile)
        sn = TX.bump_normal_from_heights(
            mout[:, 7], mout[:, 8], mout[:, 9], g[:, 9:12], g[:, 12:15],
            g[:, 3:6])
        return mout[:, 0:4], mout[:, 4:7], sn

    albedo4, spec, sn = material(g, mscal, mlists, mslots)
    timeit("material kernel (atlas)",
           lambda: material(g, mscal, mlists, mslots)[0])

    bn = jax.jit(lambda sn: jnp.concatenate(
        [sn, jnp.zeros((sn.shape[0], 1), jnp.float32)], axis=1))(sn)
    spec_field = (cfg.cones.trace_specular
                  and cfg.cones.specular_mode == "field")
    cfield = 4 * cfg.cones.field_basis * (2 if spec_field else 1)
    nb = cfg.cones.field_basis
    taps_fn = lambda: TP.tap_tiles(
        g, scal, bn, cam, tables.light_mips, tables.field_mips,
        cfield=cfield, nb=nb, world_size=ws, voxel=voxel,
        shadow_offset=cfg.shadow.normal_offset,
        power_diffuse=int(cfg.cones.basis_power_diffuse),
        power_specular=int(cfg.cones.basis_power_specular),
        cones_static=F._cones_static(cfg), tile=tile)
    timeit("tap_tiles kernel", taps_fn)

    taps = taps_fn()

    # exact per-pixel specular cone march (sponza256 specular_mode="percone")
    if F._spec_percone(cfg):
        from vct_tpu.ops import specmarch_pallas as SP
        pos, nrm = g[:, 0:3], g[:, 3:6]
        hit = g[:, 19] > 0.5
        eye = shading.C.normalize(cam - pos)
        refl = shading.reflect_eye(sn, eye)
        start = pos + nrm * voxel
        dims = SP.pages_dims(tables.spec_mips)
        sched = shading.specular_schedule(cfg)
        groups = SP.plan_groups(sched, len(dims))
        tiledv = lambda x: x.reshape((ntiles, tile) + x.shape[1:])
        start4 = jnp.concatenate(
            [start, hit.astype(jnp.float32)[:, None]], axis=1)
        refl4 = jnp.concatenate(
            [refl, jnp.zeros((g.shape[0], 1), jnp.float32)], axis=1)

        @jax.jit
        def spec_sel(start, refl, hit):
            return SP.select_spec_bricks(
                tiledv(start), tiledv(refl), tiledv(hit), groups, dims, ws)
        slists, rowtab = spec_sel(start, refl, hit)
        timeit("spec brick select", lambda: spec_sel(start, refl, hit))
        spec_fn = lambda: SP.spec_march_tiles(
            start4, refl4, slists, rowtab, tables.spec_mips, groups=groups,
            dims=dims, world_size=ws, max_alpha=cfg.cones.max_alpha,
            occlusion_falloff=cfg.cones.occlusion_falloff, tile=tile)
        timeit("spec march kernel", spec_fn)

    @jax.jit
    def tail(g, taps, albedo4, spec, sn):
        spec2 = shading.spec_gray_fallback(spec)
        eye = shading.C.normalize(cam - g[:, 0:3])
        rgb = shading.combine(
            cfg, albedo=albedo4[:, :3], spec_color=spec2, normal=sn,
            light_dir=jnp.asarray(cfg.light.direction) / np.linalg.norm(
                cfg.light.direction), eye_dir=eye, shadow=taps[:, 0],
            ind_diffuse_rgb=taps[:, 1:4], ind_diffuse_occ=taps[:, 4],
            ind_spec_rgb=taps[:, 5:8], ind_spec_occ=taps[:, 8],
            shininess=g[:, 27])
        return F._untile(rgb, hp, wp)[:h, :w]

    timeit("combine+untile", lambda: tail(g, taps, albedo4, spec, sn))

    frame = lambda: F.render_frame(cfg, ds, tables, mats, origins, dirs, cam)
    full = timeit("FULL render_frame", frame)
    log(f"1080p fps: {1.0/full:.2f}")


if __name__ == "__main__":
    main()
