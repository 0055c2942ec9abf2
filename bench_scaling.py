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

Modes (VCT_SCALING_MODE):
  strong — fixed problem split across devices (default; on a virtual CPU
           mesh this mostly measures dispatch overhead at high n).
  weak   — per-device-constant work: the ray image grows n rows-wise and
           the dense march gets n x the basis directions over the same
           brick-sharded field (each device marches all directions over a
           1/n slab, so per-device work is constant).  On real hardware
           the efficiency column (throughput retention vs 1 device) is the
           weak-scaling number; on the VIRTUAL CPU mesh all "devices"
           share one socket, so no speedup is observable by construction —
           there the meaningful column is weak_overhead_efficiency =
           t(same n x workload, 1 device) / t(n devices), which isolates
           the sharding + collective overhead (1.0 = free sharding).

           r5 attribution (SCALING_ATTRIB_r05.json, reproducible via
           scripts/scaling_attrib.py): the r4 camera-pass loss (0.57
           weak-overhead at n=2) was REAL — the jit+sharding variant let
           the SPMD partitioner insert an all-gather + reshard rewrites
           for the cross-shard o[0] read and the chunk-grid reshape,
           worth ~1.5x the compute at n=2.  The shard_map camera pass
           (tile_dp.shardmap_camera_fn, used here since r5) is
           collective-free by construction and measures 1.0-1.6
           weak-overhead efficiency at n=2-8 on the virtual mesh,
           matching the n*t(1x) serial bound of the single-process CPU
           backend.

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
    mode = os.environ.get("VCT_SCALING_MODE", "strong")
    assert mode in ("strong", "weak"), mode

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

    from vct_tpu.core import dense as D

    results = []
    for n in counts:
        # rays/s: tile-DP over 'data'; weak mode grows the image n rows-wise
        h_n = height * n if mode == "weak" else height
        origins_n, dirs_n = cameralib.primary_rays(camera, width, h_n)
        cfg = dataclasses.replace(
            cfg0, sharding=dataclasses.replace(
                cfg0.sharding, data_parallel=n, brick_parallel=1))
        mesh = meshlib.make_mesh_for(cfg, devices=devices[:n])
        samples = tile_dp.pad_samples(samples0, 1)
        # the voxel BUILD is model state built once (untimed here); the
        # timed region is the data-scaled camera pass alone — r3 timed a
        # replicated build inside the render, an Amdahl serial fraction
        # that capped rays/s scaling by construction (VERDICT weak #4)
        build = tile_dp.sharded_build_fn(cfg, mesh)
        voxels_n = build(samples, mats)
        # shard_map: per-device camera pass, zero collectives — the r4
        # jit+sharding variant paid a partitioner-inserted all-gather +
        # reshard rewrites worth ~1.5x the compute at n=2
        # (scripts/scaling_attrib.py, SCALING_ATTRIB_r05.json)
        render = tile_dp.shardmap_camera_fn(cfg, ds, mesh, chunk_size=16384)
        img = render(origins_n, dirs_n, cam, voxels_n, mats)
        sync(img)
        t0 = time.time()
        for _ in range(reps):
            sync(render(origins_n, dirs_n, cam, voxels_n, mats))
        dt_rays = (time.time() - t0) / reps
        nrays = width * h_n

        # cone-samples/s: brick-TP over 'model' (dense marches sharded).
        # weak mode marches n x the basis directions over the same sharded
        # field: each device does all directions over a 1/n x-slab.
        basis = D.direction_basis(cfg0.cones.field_basis)
        if mode == "weak":
            basis = np.tile(basis, (n, 1))
        sched = shading.diffuse_schedule(cfg0)
        voxels0 = R.build_voxel_state_staged(cfg0, samples0, mats)
        mips = voxels0.radiance_mips
        if n > 1:
            from vct_tpu.parallel import brick
            cfgm = dataclasses.replace(
                cfg0, sharding=dataclasses.replace(
                    cfg0.sharding, data_parallel=1, brick_parallel=n))
            meshm = meshlib.make_mesh_for(cfgm, devices=devices[:n])
            march = lambda: brick.sharded_directional_march_multi(
                mips, basis, sched, cfg0.grid.world_size, meshm,
                axis_name="model", field_dim=dim,
                max_alpha=cfg0.cones.max_alpha,
                occlusion_falloff=cfg0.cones.occlusion_falloff)
        else:
            march = lambda: D.directional_march_multi(
                mips, basis, sched, cfg0.grid.world_size, field_dim=dim,
                max_alpha=cfg0.cones.max_alpha,
                occlusion_falloff=cfg0.cones.occlusion_falloff)
        jm = jax.jit(march)
        sync(jm())
        t0 = time.time()
        for _ in range(reps):
            sync(jm())
        dt_march = (time.time() - t0) / reps
        nsamp = basis.shape[0] * sched.num_steps * dim ** 3

        # weak mode's 1-device control: the same n-scaled workload without
        # a mesh — the ratio isolates sharding/collective overhead
        ctl_rays = ctl_march = None
        if mode == "weak" and n > 1:
            cfg1 = dataclasses.replace(
                cfg0, sharding=dataclasses.replace(
                    cfg0.sharding, data_parallel=1, brick_parallel=1))
            mesh1 = meshlib.make_mesh_for(cfg1, devices=devices[:1])
            build1 = tile_dp.sharded_build_fn(cfg1, mesh1)
            voxels_1 = build1(samples, mats)
            render1 = tile_dp.shardmap_camera_fn(cfg1, ds, mesh1,
                                                 chunk_size=16384)
            sync(render1(origins_n, dirs_n, cam, voxels_1, mats))
            t0 = time.time()
            for _ in range(reps):
                sync(render1(origins_n, dirs_n, cam, voxels_1, mats))
            ctl_rays = (time.time() - t0) / reps
            jm1 = jax.jit(lambda: D.directional_march_multi(
                mips, basis, sched, cfg0.grid.world_size, field_dim=dim,
                max_alpha=cfg0.cones.max_alpha,
                occlusion_falloff=cfg0.cones.occlusion_falloff))
            sync(jm1())
            t0 = time.time()
            for _ in range(reps):
                sync(jm1())
            ctl_march = (time.time() - t0) / reps

        results.append((n, nrays / dt_rays, nsamp / dt_march,
                        ctl_rays, ctl_march, dt_rays, dt_march))
        log(f"n={n:3d} [{mode}]: {nrays/dt_rays:.3e} rays/s "
            f"({dt_rays*1e3:.0f} ms), {nsamp/dt_march:.3e} "
            f"cone-samples/s ({dt_march*1e3:.0f} ms)")

    r1, s1 = results[0][1], results[0][2]
    out = []
    for n, r, s, cr, cm, tr, tm in results:
        rec = {
            "mode": mode,
            "devices": n,
            "rays_per_s": r,
            "rays_scaling_efficiency": r / (r1 * n),
            "cone_samples_per_s": s,
            "samples_scaling_efficiency": s / (s1 * n),
        }
        if cr is not None:
            rec["rays_weak_overhead_efficiency"] = cr / tr
            rec["samples_weak_overhead_efficiency"] = cm / tm
        out.append(rec)
        print(json.dumps(rec))
    if len(results) > 1:
        n, r, s = results[-1][:3]
        log(f"efficiency at {n} devices: rays {r/(r1*n):.2%}, "
            f"samples {s/(s1*n):.2%}")
    record = os.environ.get("VCT_SCALING_RECORD")
    if record:
        mode_key = {"records": out}
        try:
            with open(record) as f:
                prev = json.load(f)
        except Exception:
            prev = {}
        prev[mode] = mode_key
        prev["device_kind"] = getattr(devices[0], "device_kind", "?")
        prev["num_devices"] = len(devices)
        with open(record, "w") as f:
            json.dump(prev, f, indent=1)
        log(f"recorded -> {record}")


if __name__ == "__main__":
    main()
