"""Inverse rendering + checkpoint/resume — vct_tpu/diff (config 4).

Recover perturbed scene parameters from a target image rendered with the
true parameters; the whole pipeline (splat -> shadow -> mips -> cones ->
combine) is differentiated end to end.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.config import preset, GridConfig, RenderConfig
from vct_tpu.core import camera as cameralib
from vct_tpu.diff import (InverseConfig, OptimState, init_params, optimize,
                          voxel_state_from_radiance)
from vct_tpu.render import renderer as R
from vct_tpu.scene import cornell_box



import pytest as _pytest
pytestmark = _pytest.mark.slow   # heavy integration file: excluded from the fast lane (pytest -m "not slow")

def tiny_cfg():
    cfg = preset("inverse")
    return dataclasses.replace(
        cfg, grid=GridConfig(dim=16, world_size=150.0),
        render=RenderConfig(width=16, height=16))


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    scene = cornell_box(size=100.0, with_blocks=False)
    camera = cameralib.Camera()
    target = R.render_image(cfg, scene, camera, jit=True)
    return cfg, scene, camera, jnp.asarray(target)


class TestAlbedoRecovery:
    def test_loss_decreases_and_albedo_moves_toward_truth(self, setup):
        cfg, scene, camera, target = setup
        # start from wrong albedos (gray everything)
        ds, mats, samples = R.prepare_scene(cfg, scene)
        wrong = jnp.full_like(mats.albedo, 0.4).at[:, 3].set(1.0)
        inv = InverseConfig(optimize=("albedo",), learning_rate=5e-2,
                            num_steps=30, chunk_size=256)
        state, history = optimize(
            inv, cfg, scene, target, camera, init={"albedo": wrong})
        assert history[-1] < history[0] * 0.5, history[:3] + history[-3:]
        # red wall channel ordering recovered: R > G for material 1
        a = np.asarray(state.params["albedo"])
        assert a[1, 0] > a[1, 1]
        # green wall: G > R for material 2
        assert a[2, 1] > a[2, 0]

    def test_light_color_recovery(self, setup):
        cfg, scene, camera, target = setup
        inv = InverseConfig(optimize=("light",), learning_rate=1e-1,
                            num_steps=25, chunk_size=256)
        state, history = optimize(
            inv, cfg, scene, target, camera,
            init={"light": jnp.asarray([0.2, 0.2, 0.2])})
        assert history[-1] < history[0] * 0.25
        # true light color is (1,1,1); recovered should move up toward it
        assert float(np.min(np.asarray(state.params["light"]))) > 0.5


class TestRadianceField:
    def test_radiance_injection_matches_build(self, setup):
        """Injecting the grid the splat produced == the splatted state."""
        cfg, scene, camera, target = setup
        ds, mats, samples = R.prepare_scene(cfg, scene)
        voxels = R.build_voxel_state(cfg, samples, mats)
        injected = voxel_state_from_radiance(
            cfg, voxels.radiance_mips[0], samples, mats)
        np.testing.assert_allclose(
            np.asarray(injected.radiance_mips[1]),
            np.asarray(voxels.radiance_mips[1]), rtol=1e-5, atol=1e-6)

    def test_radiance_optimization_runs(self, setup):
        cfg, scene, camera, target = setup
        inv = InverseConfig(optimize=("radiance",), learning_rate=1e-2,
                            num_steps=8, chunk_size=256)
        state, history = optimize(inv, cfg, scene, target, camera)
        assert np.isfinite(history).all()
        assert history[-1] <= history[0] + 1e-6
        assert state.params["radiance"].shape == (16, 16, 16, 4)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path, setup):
        from vct_tpu.diff import checkpoint as ckpt

        cfg, scene, camera, target = setup
        ds, mats, samples = R.prepare_scene(cfg, scene)
        inv = InverseConfig(optimize=("albedo",))
        params = init_params(inv, cfg, mats)
        import optax
        opt = optax.adam(1e-2)
        state = OptimState(params=params, opt_state=opt.init(params), step=7)
        ckpt.save(str(tmp_path), state)
        assert ckpt.available_steps(str(tmp_path)) == [7]
        zero = OptimState(
            params={k: jnp.zeros_like(v) for k, v in params.items()},
            opt_state=opt.init(params), step=0)
        back = ckpt.restore_latest(str(tmp_path), zero)
        assert back.step == 7
        np.testing.assert_allclose(np.asarray(back.params["albedo"]),
                                   np.asarray(params["albedo"]), atol=1e-7)

    def test_optimize_resumes_from_checkpoint(self, tmp_path, setup):
        cfg, scene, camera, target = setup
        inv = InverseConfig(optimize=("albedo",), learning_rate=5e-2,
                            num_steps=6, chunk_size=256)
        # run 1: all 6 steps, checkpointing every 3
        s1, h1 = optimize(inv, cfg, scene, target, camera,
                          checkpoint_dir=str(tmp_path / "a"),
                          checkpoint_every=3)
        assert s1.step == 6
        # run 2: same dir primed with the step-3 checkpoint -> resumes at 3
        from vct_tpu.diff import checkpoint as ckpt
        steps = ckpt.available_steps(str(tmp_path / "a"))
        assert 3 in steps and 6 in steps
        s2, h2 = optimize(inv, cfg, scene, target, camera,
                          checkpoint_dir=str(tmp_path / "a"))
        assert s2.step == 6
        assert len(h2) == 0 or len(h2) < 6    # resumed, not re-run
