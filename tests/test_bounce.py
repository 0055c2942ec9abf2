"""Multi-bounce GI (light.gi_bounces > 2) — renderer._inject_bounce.

The reference stops at 2 bounces and notes more are possible
(README.md:14 "can increase to more bounce"); here each extra bounce
re-gathers indirect diffuse at the surface samples and re-injects.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.config import preset, GridConfig, LightConfig, RenderConfig
from vct_tpu.core import camera as cameralib
from vct_tpu.render import renderer as R
from vct_tpu.scene import cornell_box



import pytest as _pytest
pytestmark = _pytest.mark.slow   # heavy integration file: excluded from the fast lane (pytest -m "not slow")

def _cfg(bounces, dim=32):
    cfg = preset("cornell64_full")
    return dataclasses.replace(
        cfg,
        grid=GridConfig(dim=dim, world_size=150.0),
        light=dataclasses.replace(cfg.light, gi_bounces=bounces),
        render=RenderConfig(width=48, height=48),
    )


@pytest.fixture(scope="module")
def scene():
    return cornell_box(size=100.0)


class TestBounceInjection:
    def test_two_bounces_is_default_path(self, scene):
        """gi_bounces=2 must be bit-identical to the pre-bounce pipeline."""
        cfg2 = _cfg(2)
        ds, mats, samples = R.prepare_scene(cfg2, scene)
        v2 = R.build_voxel_state(cfg2, samples, mats)
        base = R.build_voxel_state(
            dataclasses.replace(cfg2, light=LightConfig()), samples, mats)
        np.testing.assert_array_equal(np.asarray(v2.radiance_mips[0]),
                                      np.asarray(base.radiance_mips[0]))

    def test_extra_bounce_adds_energy(self, scene):
        """Bounce 3 adds non-negative radiance where surfaces are lit
        indirectly; total grid energy strictly grows."""
        cfg2, cfg3 = _cfg(2), _cfg(3)
        ds, mats, samples = R.prepare_scene(cfg2, scene)
        v2 = R.build_voxel_state(cfg2, samples, mats)
        v3 = R.build_voxel_state(cfg3, samples, mats)
        r2 = np.asarray(v2.radiance_mips[0])
        r3 = np.asarray(v3.radiance_mips[0])
        # same occupancy, only radiance changes
        np.testing.assert_array_equal(r2[..., 3], r3[..., 3])
        assert r3[..., :3].sum() > r2[..., :3].sum() * 1.001
        assert (r3[..., :3] - r2[..., :3]).min() > -1e-5

    def test_staged_matches_monolithic(self, scene):
        cfg3 = _cfg(3)
        ds, mats, samples = R.prepare_scene(cfg3, scene)
        mono = R.build_voxel_state(cfg3, samples, mats)
        staged = R.build_voxel_state_staged(cfg3, samples, mats)
        np.testing.assert_allclose(
            np.asarray(staged.radiance_mips[0]),
            np.asarray(mono.radiance_mips[0]), rtol=1e-5, atol=1e-6)

    def test_render_and_grad_through_three_bounces(self, scene):
        """End-to-end image stays finite; gradients flow to albedo through
        the bounce loop (splat -> gather -> splat)."""
        cfg3 = _cfg(3, dim=16)
        ds, mats, samples = R.prepare_scene(cfg3, scene)
        camera = cameralib.Camera(position=(0.0, 0.0, 140.0))
        origins, dirs = cameralib.primary_rays(camera, 24, 24)
        cam_pos = jnp.asarray(camera.position, jnp.float32)

        def loss(albedo):
            m = dataclasses.replace(mats, albedo=albedo)
            voxels = R.build_voxel_state(cfg3, samples, m)
            img = R.render_rays(cfg3, ds, voxels, m, origins, dirs, cam_pos,
                                chunk_size=288)
            return jnp.mean(img)

        val, g = jax.value_and_grad(loss)(mats.albedo)
        assert np.isfinite(float(val))
        g = np.asarray(g)
        assert np.isfinite(g).all() and np.abs(g).sum() > 0
