"""TPU timing: fast frame path (render/fast.py) at the bench operating
point (atrium, 256^3 grid, 128^3 fields, 1080p)."""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.config import preset
from vct_tpu.core import camera as cameralib
from vct_tpu.render import fast as F
from vct_tpu.render import renderer as R
from vct_tpu.scene.atrium import atrium


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


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
    sync(voxels.radiance_mips[0])
    t0 = time.time()
    tables = F.build_frame_tables(cfg, voxels, mats)
    sync(tables.field_mips[0])
    log(f"frame tables: {time.time()-t0:.1f}s "
        f"(field {tables.field_mips[0].shape} {tables.field_mips[0].dtype})")

    origins, dirs = cameralib.primary_rays(camera, width, height)
    cam = jnp.asarray(camera.position, jnp.float32)

    t0 = time.time()
    img = F.render_frame(cfg, ds, tables, mats, origins, dirs, cam)
    sync(img)
    log(f"first frame compile+run: {time.time()-t0:.1f}s "
        f"mean={float(jnp.mean(img)):.4f}")
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        img = F.render_frame(cfg, ds, tables, mats, origins, dirs, cam)
        sync(img)
    dt = (time.time() - t0) / reps
    log(f"fast frame: {dt*1e3:.1f} ms ({width}x{height}, {1.0/dt:.2f} fps)")

    # compare against reference path on a small crop for sanity
    o2, d2 = cameralib.primary_rays(camera, 192, 108)
    ref = jax.jit(lambda *a: R.render_rays(cfg, *a, chunk_size=4096))(
        ds, voxels, mats, o2, d2, cam)
    out = F.render_frame(cfg, ds, tables, mats, o2, d2, cam)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    log(f"vs reference path @192x108: mean err {err.mean():.4f}, "
        f"p99 {np.percentile(err, 99):.4f}")


if __name__ == "__main__":
    main()
