"""Benchmark: cone-samples/s/chip (the BASELINE.json headline metric).

Renders the per-frame pass (raycast G-buffer + shadow cone + 6 diffuse +
1 specular cone march + combine) at the target operating point
(256^3 grid, 1080p — BASELINE.json config 3) and reports marched
cone-samples per second on one chip.

"cone-sample" = one quadrilinear voxel-pyramid fetch of the march
(schedule step x cone x pixel); the voxelization-time shadow samples are a
startup pass (as in the reference, Voxel_Cone_Tracing.h:138-139) and are
excluded, mirroring its per-frame hot loop (SURVEY.md §3.4).

vs_baseline: the reference publishes no numbers (BASELINE.json
"published": {}), so vs_baseline reports the fraction of single-chip HBM
speed-of-light for the march's gather traffic (16 taps x 16 B per sample)
— the >70% SoL north-star is vs_baseline >= 0.7.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


HBM_BYTES_PER_S = {
    # per-chip HBM bandwidth (public specs)
    "TPU v4": 1228e9,
    "TPU v5 lite": 819e9,   # v5e
    "TPU v5": 2765e9,       # v5p
    "TPU v6 lite": 1640e9,  # v6e / Trillium
}
BYTES_PER_SAMPLE = 16 * 4 * 4   # quadrilinear: 16 taps x RGBA x f32


def main():
    scale = float(os.environ.get("VCT_BENCH_SCALE", "1.0"))
    width = int(1920 * scale)
    height = int(1080 * scale)
    dim = int(os.environ.get("VCT_BENCH_DIM", "256"))

    from vct_tpu.config import preset, GridConfig
    from vct_tpu.core import camera as cameralib
    from vct_tpu.core import march as M
    from vct_tpu.render import renderer as R
    from vct_tpu.scene import cornell_box

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown")
    log(f"device: {kind} ({dev.platform})")

    cfg = preset("sponza256")
    cfg = dataclasses.replace(
        cfg,
        grid=GridConfig(dim=dim, world_size=150.0),
        render=dataclasses.replace(cfg.render, width=width, height=height),
    )
    scene = cornell_box(size=100.0)   # Sponza-class march cost; scene swap pending OBJ path
    camera = cameralib.Camera(position=(0.0, 0.0, 140.0))

    t0 = time.time()
    ds, mats, samples = R.prepare_scene(cfg, scene)
    log(f"scene prep: {samples.positions.shape[0]} surface samples, "
        f"{time.time()-t0:.1f}s")

    t0 = time.time()
    # pass everything as jit ARGUMENTS (closure constants would be pulled
    # host-side at trace time — pathological through the axon tunnel)
    build = jax.jit(lambda s, m: R.build_voxel_state(cfg, s, m))
    voxels = jax.block_until_ready(build(samples, mats))
    log(f"voxel build (startup pass): {time.time()-t0:.1f}s")

    origins, dirs = cameralib.primary_rays(camera, width, height)
    cam_pos = jnp.asarray(camera.position, jnp.float32)
    chunk = int(os.environ.get("VCT_BENCH_CHUNK", "16384"))

    frame = jax.jit(lambda ds, v, m, o, d, cp: R.render_rays(
        cfg, ds, v, m, o, d, cp, chunk_size=chunk))

    t0 = time.time()
    img = jax.block_until_ready(
        frame(ds, voxels, mats, origins, dirs, cam_pos))
    log(f"first frame (compile + run): {time.time()-t0:.1f}s, "
        f"mean={float(jnp.mean(img)):.4f}")

    n_rep = int(os.environ.get("VCT_BENCH_REPS", "3"))
    t0 = time.time()
    for _ in range(n_rep):
        img = frame(ds, voxels, mats, origins, dirs, cam_pos)
    jax.block_until_ready(img)
    dt = (time.time() - t0) / n_rep
    log(f"steady frame: {dt*1e3:.1f} ms")

    # schedule-derived per-pixel sample counts
    voxel = cfg.grid.voxel_world_size
    ca = cfg.cones
    k_diff = M.march_schedule(ca.diffuse_tan_half_angle, voxel,
                              ca.max_distance, ca.max_steps).num_steps
    k_spec = M.march_schedule(ca.specular_tan_half_angle, voxel,
                              ca.max_distance, ca.max_steps).num_steps
    k_shadow = R.shadow_schedule(cfg).num_steps
    per_pixel = ca.num_diffuse_cones * k_diff + \
        (k_spec if ca.trace_specular else 0) + k_shadow
    total = per_pixel * width * height
    sps = total / dt

    bw = HBM_BYTES_PER_S.get(kind, 819e9)
    sol = bw / BYTES_PER_SAMPLE
    log(f"per-pixel samples: {per_pixel} (diffuse 6x{k_diff}, spec {k_spec}, "
        f"shadow {k_shadow}); total/frame: {total/1e6:.1f}M")
    log(f"samples/s: {sps:.3e}; HBM SoL: {sol:.3e}; fraction: {sps/sol:.3f}")

    print(json.dumps({
        "metric": "cone_samples_per_s_per_chip",
        "value": sps,
        "unit": "samples/s",
        "vs_baseline": sps / sol,
    }))


if __name__ == "__main__":
    main()
