"""Specular percone kernel sweep: fidelity + 1080p cost vs group tile size.

The specmarch kernel picks ONE mip brick per (pixel-group, step-group);
group world-compactness decides whether the selection stays at the
schedule's exact level (VERDICT r4 weak #3: 256-pixel groups whose
world AABB exceeds the lod-0 brick budget silently fall to coarse
levels).  This sweep measures, per group size (tile):

  * kernel rel-RMS vs the exact percone oracle on a 480x272 G-buffer
    pixel subset (the FIDELITY_r0N specular_percone_kernel metric), and
  * the full-frame spec pass cost at 1080p (sort + brick select + kernel).

Run on TPU: PYTHONPATH=/root/repo python scripts/bench_specmarch.py
Env: VCT_SPEC_TILES=256,128,64  VCT_SPEC_REPS=5
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.config import preset
from vct_tpu.core import camera as cameralib
from vct_tpu.ops import raycast_pallas as RP
from vct_tpu.ops import specmarch_pallas as SP
from vct_tpu.render import fast as F
from vct_tpu.render import renderer as R
from vct_tpu.render import shading
from vct_tpu.scene.atrium import atrium


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rel_rms(x, ref):
    x, ref = np.asarray(x, np.float64), np.asarray(ref, np.float64)
    return float(np.sqrt(np.mean((x - ref) ** 2))
                 / max(np.sqrt(np.mean(ref ** 2)), 1e-9))


def gbuf(ds, mats, camera, w, h):
    origins, dirs = cameralib.primary_rays(camera, w, h)
    origin = origins.reshape(-1, 3)[0]
    isect, attrs, _ = RP.pack_tables(ds, origin, mats.albedo, mats.specular)
    n = w * h
    pad = (-n) % RP.TILE
    d = dirs.reshape(-1, 3)
    if pad:
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    g = np.asarray(RP.raycast_gbuf24(d, origin, isect, attrs))[:n]
    return g


def main():
    interp = jax.default_backend() != "tpu"
    tiles = tuple(int(x) for x in os.environ.get(
        "VCT_SPEC_TILES", "256,128,64").split(","))
    reps = int(os.environ.get("VCT_SPEC_REPS", "5"))
    cfg = preset("sponza256_exact_specular")
    scene = atrium()
    camera = cameralib.Camera(position=(48.0, -10.0, 0.0), yaw=180.0)
    ds, mats, samples = R.prepare_scene(cfg, scene)
    t0 = time.time()
    voxels = R.build_voxel_state_staged(cfg, samples, mats)
    jax.block_until_ready(voxels.radiance_mips[0])
    log(f"voxel build: {time.time()-t0:.1f}s")
    mips = voxels.radiance_mips
    del voxels          # free fields/volumes the sweep never samples
    pages = SP.pack_spec_mips(mips)

    # --- fidelity subset (matches scripts/fidelity_field.py kernelspec) ---
    g = gbuf(ds, mats, camera, 480, 272)
    hits = np.nonzero(g[:, 19] > 0.5)[0]
    rng = np.random.RandomState(0)
    sel = rng.choice(hits, size=min(2048, len(hits)), replace=False)
    pos_s = jnp.asarray(g[sel, 0:3])
    nrm_s = jnp.asarray(g[sel, 3:6])
    eye_s = shading.C.normalize(
        jnp.asarray(camera.position, jnp.float32) - pos_s)
    refl_s = shading.reflect_eye(nrm_s, eye_s)
    s_rgb, s_occ = shading.indirect_specular_percone(
        cfg, mips, pos_s, nrm_s, refl_s)
    oracle = np.concatenate(
        [np.asarray(s_rgb), np.asarray(s_occ)[:, None]], axis=1)

    gg = jnp.asarray(g)
    posf, nrmf = gg[:, 0:3], gg[:, 3:6]
    hitf = gg[:, 19] > 0.5
    eyef = shading.C.normalize(
        jnp.asarray(camera.position, jnp.float32) - posf)

    # --- 1080p inputs for the cost sweep ---
    g2 = gbuf(ds, mats, camera, 1920, 1080)
    gg2 = jnp.asarray(g2)
    pos2, nrm2 = gg2[:, 0:3], gg2[:, 3:6]
    hit2 = gg2[:, 19] > 0.5
    eye2 = shading.C.normalize(
        jnp.asarray(camera.position, jnp.float32) - pos2)

    passfn = jax.jit(F.spec_percone_pass,
                     static_argnums=(0,), static_argnames=("interpret",
                                                           "tile"))

    def sync(x):
        # block_until_ready does NOT synchronize through the axon
        # tunnel; force a scalar readback (see bench.py NOTE)
        return float(jnp.sum(jnp.ravel(x)[:8]))

    res = {}
    for tile in tiles:
        so = np.asarray(passfn(cfg, pages, posf, nrmf, nrmf, eyef, hitf,
                               interpret=interp, tile=tile))
        err = rel_rms(so[sel], oracle)
        t0 = time.time()
        sync(passfn(cfg, pages, pos2, nrm2, nrm2, eye2, hit2,
                    interpret=interp, tile=tile))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = passfn(cfg, pages, pos2, nrm2, nrm2, eye2, hit2,
                         interpret=interp, tile=tile)
        sync(out)
        ms = (time.time() - t0) / reps * 1e3
        res[f"tile{tile}"] = {"kernel_rel_rms": err, "spec_pass_ms_1080p": ms}
        log(f"tile {tile}: rel-RMS {err:.4f}, 1080p pass {ms:.1f} ms "
            f"(compile {compile_s:.1f}s)")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
