"""TPU roofline of the dominant dense-march stage (diffuse cone-field
build at the sponza256 operating point): ms, achieved GB/s vs peak, MXU
util — the BENCH march_achieved_gbps metric in isolation."""
import dataclasses, sys, time
import jax, jax.numpy as jnp, numpy as np
from vct_tpu.config import preset
from vct_tpu.render import renderer as R, shading
from vct_tpu.scene.atrium import atrium

def log(*a): print(*a, file=sys.stderr, flush=True)
def sync(x): return float(jnp.sum(jnp.ravel(x)[:8]))

cfg = preset("sponza256")
scene = atrium()
ds, mats, samples = R.prepare_scene(cfg, scene)
voxels = R.build_voxel_state_staged(cfg, samples, mats)
sync(voxels.radiance_mips[0])
march_fn = jax.jit(lambda mips: shading.build_cone_field(
    cfg, mips, shading.diffuse_schedule(cfg)))
compiled = march_fn.lower(voxels.radiance_mips).compile()
ca = compiled.cost_analysis()
ca = ca[0] if isinstance(ca, (list, tuple)) else ca
fl, by = float(ca.get("flops", 0)), float(ca.get("bytes accessed", 0))
sync(march_fn(voxels.radiance_mips))
ts = []
for _ in range(5):
    t0 = time.time(); sync(march_fn(voxels.radiance_mips)); ts.append(time.time()-t0)
dt = float(np.median(ts))
log(f"march: {dt*1e3:.1f} ms, cost model {fl/1e12:.2f} TF / {by/1e9:.2f} GB")
log(f"achieved {by/dt/1e9:.0f} GB/s ({by/dt/819e9:.2f} of peak), MXU {fl/dt/197e12:.2f}")
