"""Pinhole raycast fast path (gbuffer.raycast_chunk_pinhole) vs the
general Möller–Trumbore oracle — same hits, same barycentrics."""

import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.core import camera as cameralib
from vct_tpu.render import gbuffer as GB
from vct_tpu.scene.atrium import atrium


@pytest.fixture(scope="module")
def setup():
    scene = atrium()
    ds = GB.DeviceScene.from_scene(scene)
    cam = cameralib.Camera(position=(48.0, -10.0, 0.0), yaw=180.0)
    origins, dirs = cameralib.primary_rays(cam, 48, 32)
    return ds, origins.reshape(-1, 3), dirs.reshape(-1, 3)


class TestPinholeParity:
    def test_matches_general_path(self, setup):
        ds, o, d = setup
        ref = GB.raycast_chunk(ds, o, d)
        pc = GB.pinhole_constants(ds, o[0])
        out = GB.raycast_chunk_pinhole(ds, pc, o[0], d)
        np.testing.assert_array_equal(np.asarray(ref.hit),
                                      np.asarray(out.hit))
        hit = np.asarray(ref.hit)
        assert hit.sum() > 100          # the view actually sees the hall
        np.testing.assert_array_equal(np.asarray(ref.tri)[hit],
                                      np.asarray(out.tri)[hit])
        for attr in ("t", "position", "normal", "uv"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, attr))[hit],
                np.asarray(getattr(ref, attr))[hit],
                rtol=1e-4, atol=1e-4, err_msg=attr)

    def test_render_rays_pinhole_matches_general(self, setup):
        import dataclasses
        from vct_tpu.config import preset, GridConfig, RenderConfig
        from vct_tpu.render import renderer as R
        from vct_tpu.scene.atrium import atrium as mk

        cfg = preset("cornell64_full")
        cfg = dataclasses.replace(
            cfg, grid=GridConfig(dim=16, world_size=150.0),
            render=RenderConfig(width=48, height=32))
        scene = mk()
        ds, mats, samples = R.prepare_scene(cfg, scene)
        voxels = R.build_voxel_state(cfg, samples, mats)
        cam = cameralib.Camera(position=(48.0, -10.0, 0.0), yaw=180.0)
        origins, dirs = cameralib.primary_rays(cam, 48, 32)
        cam_pos = jnp.asarray(cam.position, jnp.float32)
        a = R.render_rays(cfg, ds, voxels, mats, origins, dirs, cam_pos,
                          chunk_size=512, pinhole=True)
        b = R.render_rays(cfg, ds, voxels, mats, origins, dirs, cam_pos,
                          chunk_size=512, pinhole=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
