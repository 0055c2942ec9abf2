"""TPU timing: Pallas raycast kernel vs the XLA pinhole path at 1080p."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.core import camera as cameralib
from vct_tpu.ops import raycast_pallas as RP
from vct_tpu.render import gbuffer as GB
from vct_tpu.scene.atrium import atrium


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(jnp.ravel(x)[:8]))


def main():
    scene = atrium()
    ds = GB.DeviceScene.from_scene(scene)
    cam = cameralib.Camera(position=(48.0, -10.0, 0.0), yaw=180.0)
    w, h = 1920, 1080
    origins, dirs = cameralib.primary_rays(cam, w, h)
    o0 = jnp.asarray(origins.reshape(-1, 3)[0])
    d = jnp.asarray(dirs.reshape(-1, 3))
    n = d.shape[0]
    pad = (-n) % RP.TILE
    if pad:
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    log(f"rays: {d.shape[0]}, tris: {ds.v0.shape[0]}")

    @jax.jit
    def run(ds_, o, dd):
        isect, attrs, _ = RP.pack_tables(ds_, o)
        return RP.raycast_gbuf24(dd, o, isect, attrs)

    t0 = time.time()
    g = run(ds, o0, d)
    sync(g)
    log(f"compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        g = run(ds, o0, d)
        sync(g)
    dt = (time.time() - t0) / reps
    log(f"pallas raycast: {dt*1e3:.1f} ms/frame ({d.shape[0]/dt/1e6:.0f} Mrays/s)")

    # sanity vs XLA on a slice
    sl = slice(0, 4096)
    pc = GB.pinhole_constants(ds, o0)
    ref = GB.raycast_chunk_pinhole(ds, pc, o0, d[sl])
    out = RP.gbuf24_to_gbuffer(g[sl])
    hit = np.asarray(ref.hit)
    agree = (np.asarray(out.hit) == hit).mean()
    log(f"hit agreement vs XLA: {agree:.4f}")
    terr = np.abs(np.asarray(out.t)[hit] - np.asarray(ref.t)[hit]).max()
    log(f"max |t| err on hits: {terr:.2e}")


if __name__ == "__main__":
    main()
