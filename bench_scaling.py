"""Scaling sweep: rays/s (tile-DP) and cone-samples/s (brick-TP) vs device
count, with efficiency relative to linear scaling from the 1-device point.

BASELINE.md north star: >85% rays/s scaling efficiency at >=2 hosts, with
scaling measured at 1 chip / 1 host / N>=2 hosts.  This harness is the
measurement vehicle: run it on real hardware when a multi-chip slice is
attached; locally it validates on the virtual CPU mesh
(VCT_SCALING_CPU=8 python bench_scaling.py).

Multi-host: launch one process per host with COORDINATOR_ADDRESS /
NUM_PROCESSES / PROCESS_ID set (parallel.mesh.init_distributed); the sweep
then spans all processes' devices.

Prints one JSON line per device count plus a summary line.
"""

import dataclasses
import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ncpu = os.environ.get("VCT_SCALING_CPU")
    if ncpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={ncpu}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np

    from vct_tpu.config import preset
    from vct_tpu.core import camera as cameralib
    from vct_tpu.parallel import mesh as meshlib
    from vct_tpu.parallel import tile_dp
    from vct_tpu.render import renderer as R
    from vct_tpu.scene.cornell import cornell_box

    meshlib.init_distributed()
    devices = jax.devices()
    log(f"devices: {len(devices)} x {getattr(devices[0], 'device_kind', '?')}"
        f" across {jax.process_count()} process(es)")

    dim = int(os.environ.get("VCT_SCALING_DIM", "64"))
    width = int(os.environ.get("VCT_SCALING_W", "512"))
    height = int(os.environ.get("VCT_SCALING_H", "512"))
    reps = int(os.environ.get("VCT_SCALING_REPS", "3"))

    cfg0 = preset("sponza256")
    cfg0 = dataclasses.replace(
        cfg0,
        grid=dataclasses.replace(cfg0.grid, dim=dim, compute="float32"),
        cones=dataclasses.replace(cfg0.cones, field_dim=dim),
        render=dataclasses.replace(cfg0.render, width=width, height=height),
    )
    scene = cornell_box(size=100.0)
    camera = cameralib.Camera(position=(3.0, 2.0, 140.0))
    ds, mats, samples0 = R.prepare_scene(cfg0, scene)
    origins, dirs = cameralib.primary_rays(camera, width, height)
    cam = jnp.asarray(camera.position, jnp.float32)

    def sync(x):
        return float(jnp.sum(jnp.ravel(x)[:8]))

    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    rays_total = width * height
    from vct_tpu.render import shading
    samples_per_build = (
        shading.shadow_schedule(cfg0).num_steps * dim ** 3
        + 2 * cfg0.cones.field_basis
        * shading.diffuse_schedule(cfg0).num_steps * dim ** 3)

    results = []
    for n in counts:
        # rays/s: tile-DP over 'data'
        cfg = dataclasses.replace(
            cfg0, sharding=dataclasses.replace(
                cfg0.sharding, data_parallel=n, brick_parallel=1))
        mesh = meshlib.make_mesh_for(cfg, devices=devices[:n])
        samples = tile_dp.pad_samples(samples0, 1)
        render = tile_dp.sharded_render_fn(cfg, ds, mesh, chunk_size=16384)
        img = render(origins, dirs, cam, samples, mats)
        sync(img)
        t0 = time.time()
        for _ in range(reps):
            sync(render(origins, dirs, cam, samples, mats))
        dt_rays = (time.time() - t0) / reps

        # cone-samples/s: brick-TP over 'model' (dense marches sharded)
        cfgm = dataclasses.replace(
            cfg0, sharding=dataclasses.replace(
                cfg0.sharding, data_parallel=1, brick_parallel=n))
        meshm = meshlib.make_mesh_for(cfgm, devices=devices[:n])
        kw = dict(mesh=meshm) if n > 1 else {}
        build = lambda: R.build_voxel_state_staged(cfgm, samples0, mats,
                                                   **kw)
        sync(build().diffuse_field)
        t0 = time.time()
        for _ in range(reps):
            sync(build().diffuse_field)
        dt_build = (time.time() - t0) / reps

        results.append((n, rays_total / dt_rays,
                        samples_per_build / dt_build))
        log(f"n={n:3d}: {rays_total/dt_rays:.3e} rays/s "
            f"({dt_rays*1e3:.0f} ms), {samples_per_build/dt_build:.3e} "
            f"cone-samples/s ({dt_build*1e3:.0f} ms)")

    r1, s1 = results[0][1], results[0][2]
    for n, r, s in results:
        print(json.dumps({
            "devices": n,
            "rays_per_s": r,
            "rays_scaling_efficiency": r / (r1 * n),
            "cone_samples_per_s": s,
            "samples_scaling_efficiency": s / (s1 * n),
        }))
    if len(results) > 1:
        n, r, s = results[-1]
        log(f"efficiency at {n} devices: rays {r/(r1*n):.2%}, "
            f"samples {s/(s1*n):.2%}")


if __name__ == "__main__":
    main()
