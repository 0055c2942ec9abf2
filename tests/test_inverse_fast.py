"""Inverse rendering THROUGH the Pallas camera pass (config 4 + the fast
path): gradient parity vs the XLA path and loss descent — the round-2
"gradients through the fast path" deliverable (VERDICT missing #4/#6).

Runs the kernels in interpret mode on the CPU backend; the same graph
compiles for TPU (tests/test_tpu_compile.py covers kernel lowering).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.config import preset, GridConfig, RenderConfig
from vct_tpu.core import camera as cameralib
from vct_tpu.diff import inverse as I
from vct_tpu.render import renderer as R
from vct_tpu.scene.cornell import cornell_box



import pytest as _pytest
pytestmark = _pytest.mark.slow   # heavy integration file: excluded from the fast lane (pytest -m "not slow")

def _cfg():
    cfg = preset("inverse")
    return dataclasses.replace(
        cfg,
        grid=GridConfig(dim=32, world_size=150.0),
        cones=dataclasses.replace(
            cfg.cones, diffuse_mode="field", specular_mode="field",
            field_dim=32, field_basis=6, num_diffuse_cones=2),
        shadow=dataclasses.replace(cfg.shadow, mode="volume"),
        render=RenderConfig(width=64, height=64),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    scene = cornell_box(size=100.0)
    camera = cameralib.Camera(position=(3.0, 2.0, 140.0))
    ds, mats, samples = R.prepare_scene(cfg, scene)
    origins, dirs = cameralib.primary_rays(
        camera, cfg.render.width, cfg.render.height)
    cam = jnp.asarray(camera.position, jnp.float32)
    voxels = R.build_voxel_state(cfg, samples, mats)
    target = R.render_rays(cfg, ds, voxels, mats, origins, dirs, cam)
    return cfg, ds, mats, samples, origins, dirs, cam, target


def _grad(setup, camera_pass):
    cfg, ds, mats, samples, origins, dirs, cam, target = setup
    inv = I.InverseConfig(optimize=("radiance",), camera_pass=camera_pass)
    params = I.init_params(
        inv, cfg, mats, R.build_voxel_state(cfg, samples, mats))
    loss_fn = I.make_loss_fn(inv, cfg, ds, cam)
    # perturb the target so gradients are nonzero
    t2 = target * 0.7 + 0.05
    loss, g = jax.value_and_grad(loss_fn)(
        params, samples, mats, origins, dirs, t2)
    return float(loss), np.asarray(g["radiance"])


def test_fast_pass_gradients_match_xla(setup):
    lx, gx = _grad(setup, "xla")
    lf, gf = _grad(setup, "fast")
    assert np.isfinite(gf).all()
    assert np.abs(gf).max() > 0
    # same image semantics up to bf16 field packing + per-tile lod
    assert abs(lf - lx) < 5e-3 + 0.05 * abs(lx)
    # tiles whose footprint selects a coarser mip spread their gradient
    # through the pyramid VJP differently than the XLA level-0 taps, so
    # elementwise equality is not expected; direction and magnitude are
    # (measured: cos 0.970 at the r3 specular field schedule, 0.928 with
    # the r4 field_specular_step_factor=2 build — the sparser specular
    # field sharpens the per-tile-lod disagreement)
    cos = float((gx * gf).sum()
                / (np.linalg.norm(gx) * np.linalg.norm(gf) + 1e-12))
    ratio = float(np.linalg.norm(gf) / max(np.linalg.norm(gx), 1e-12))
    assert cos > 0.9, cos
    assert 0.85 < ratio < 1.15, ratio


def test_fast_pass_inverse_step_descends(setup):
    cfg, ds, mats, samples, origins, dirs, cam, target = setup
    inv = I.InverseConfig(optimize=("radiance",), camera_pass="fast",
                          learning_rate=0.01)
    params = I.init_params(
        inv, cfg, mats, R.build_voxel_state(cfg, samples, mats))
    # start from a black radiance grid, optimize toward the lit target
    params = {"radiance": params["radiance"] * 0.0}
    step, opt = I.make_step_fn(inv, cfg, ds, cam)
    opt_state = opt.init(params)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(
            params, opt_state, samples, mats, origins, dirs, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, losses
