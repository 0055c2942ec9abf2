"""End-to-end integration tests: Cornell box through the full pipeline
(voxelize -> shadow -> inject -> mips -> raycast -> cone gather -> combine),
plus differentiability (BASELINE.json config 1 & 4 shapes, shrunk for CI)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.config import preset, GridConfig, RenderConfig
from vct_tpu.core import camera as cameralib
from vct_tpu.render import renderer as R
from vct_tpu.render.gbuffer import raycast
from vct_tpu.scene import cornell_box


def small_cfg():
    cfg = preset("cornell64_full")
    return dataclasses.replace(
        cfg,
        grid=GridConfig(dim=32, world_size=150.0),
        render=dataclasses.replace(cfg.render, width=64, height=64),
    )


@pytest.fixture(scope="module")
def setup():
    cfg = small_cfg()
    scene = cornell_box(size=100.0)
    camera = cameralib.Camera(position=(0.0, 0.0, 140.0))
    ds, mats, samples = R.prepare_scene(cfg, scene)
    return cfg, scene, camera, ds, mats, samples


class TestGBuffer:
    def test_center_ray_hits_back_wall(self, setup):
        cfg, scene, camera, ds, mats, samples = setup
        o = jnp.asarray([[0.0, 0.0, 140.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        g = raycast(ds, o, d)
        assert bool(g.hit[0])
        np.testing.assert_allclose(g.position[0], [0, 0, -50], atol=1e-3)
        np.testing.assert_allclose(g.normal[0], [0, 0, 1], atol=1e-5)

    def test_miss_is_flagged(self, setup):
        cfg, scene, camera, ds, mats, samples = setup
        g = raycast(ds, jnp.asarray([[0.0, 0.0, 140.0]]),
                    jnp.asarray([[0.0, 0.0, 1.0]]))
        assert not bool(g.hit[0])

    def test_left_wall_material_red(self, setup):
        cfg, scene, camera, ds, mats, samples = setup
        # aim above the tall block (its top is y=+10)
        g = raycast(ds, jnp.asarray([[0.0, 30.0, 0.0]]),
                    jnp.asarray([[-1.0, 0.0, 0.0]]))
        assert int(g.material[0]) == 1      # red wall

    def test_batch_shape_preserved(self, setup):
        cfg, scene, camera, ds, mats, samples = setup
        o = jnp.zeros((3, 5, 3))
        d = jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (3, 5, 1))
        g = raycast(ds, o, d)
        assert g.hit.shape == (3, 5)
        assert g.position.shape == (3, 5, 3)


class TestVoxelState:
    def test_occupancy_covers_walls(self, setup):
        cfg, scene, camera, ds, mats, samples = setup
        vs = R.build_voxel_state(cfg, samples, mats)
        alpha = np.asarray(vs.unlit_mips[0][..., 3])
        assert alpha.sum() > 100            # plenty of occupied voxels
        # center of the box is empty space
        c = cfg.grid.dim // 2
        assert alpha[c, c, c] == 0.0

    def test_radiance_nonzero_only_where_occupied(self, setup):
        cfg, scene, camera, ds, mats, samples = setup
        vs = R.build_voxel_state(cfg, samples, mats)
        lit = np.asarray(vs.radiance_mips[0])
        unlit_a = np.asarray(vs.unlit_mips[0][..., 3])
        assert (lit[..., :3].sum(-1)[unlit_a == 0] == 0).all()
        assert lit[..., :3].sum() > 0       # some lit voxels exist

    def test_directional_shadowing(self, setup):
        # the floor patch under the ceiling hole is lit; floor under the
        # ceiling strip is not
        cfg, scene, camera, ds, mats, samples = setup
        vs = R.build_voxel_state(cfg, samples, mats)
        lit = np.asarray(vs.radiance_mips[0])
        dim, ws = cfg.grid.dim, cfg.grid.world_size
        def vox(x, y, z):
            return tuple(int((w / ws + 0.5) * dim) for w in (x, y, z))
        # light dir (0, .97, .243): floor (y=-50) lit region shifts +z by ~25
        i, j, k = vox(0.0, -49.9, -15.0)
        lit_floor = lit[i, j - 1:j + 2, k - 1:k + 2, :3].sum()
        i2, j2, k2 = vox(35.0, -49.9, -40.0)   # under ceiling strip
        dark_floor = lit[i2, j2 - 1:j2 + 2, k2 - 1:k2 + 2, :3].sum()
        assert lit_floor > 1e-3
        assert dark_floor < 0.1 * lit_floor


class TestRenderImage:
    def test_image_finite_and_plausible(self, setup):
        cfg, scene, camera, ds, mats, samples = setup
        img = R.render_image(cfg, scene, camera)
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()
        assert img.min() >= 0.0
        assert 0.01 < img.mean() < 1.0
        # red wall on the left half tints red, green wall right half
        left = img[28:36, 2:8]
        right = img[28:36, 56:62]
        assert left[..., 0].mean() > left[..., 1].mean()
        assert right[..., 1].mean() > right[..., 0].mean()

    def test_background_on_miss(self, setup):
        cfg, scene, camera, ds, mats, samples = setup
        cam_away = cameralib.Camera(position=(0.0, 0.0, 300.0), yaw=90.0)
        img = R.render_image(cfg, scene, cam_away)
        np.testing.assert_allclose(
            img, np.broadcast_to(cfg.render.background, img.shape), atol=1e-6)

    def test_toggles_zero_terms(self, setup):
        cfg, scene, camera, ds, mats, samples = setup
        cfg0 = dataclasses.replace(
            cfg,
            light=dataclasses.replace(cfg.light, ambient_factor=0.0),
            render=dataclasses.replace(
                cfg.render, show_diffuse=False, show_indirect_diffuse=False,
                show_specular=False, show_indirect_specular=False,
                background=(0.0, 0.0, 0.0)))
        img = R.render_image(cfg0, scene, camera)
        np.testing.assert_allclose(img, 0.0, atol=1e-6)


class TestDifferentiability:
    def test_grad_wrt_materials_and_light(self, setup):
        cfg, scene, camera, ds, mats, samples = setup
        origins, dirs = cameralib.primary_rays(camera, 16, 16)
        cam_pos = jnp.asarray(camera.position, jnp.float32)

        def loss(albedo, light_color):
            m2 = dataclasses.replace(mats, albedo=albedo)
            vs = R.build_voxel_state(cfg, samples, m2,
                                     light_color=light_color)
            img = R.render_rays(cfg, ds, vs, m2, origins, dirs, cam_pos)
            return jnp.mean(img ** 2)

        g_alb, g_light = jax.grad(loss, argnums=(0, 1))(
            mats.albedo, jnp.ones(3))
        assert np.isfinite(np.asarray(g_alb)).all()
        assert np.isfinite(np.asarray(g_light)).all()
        assert np.abs(np.asarray(g_alb)).sum() > 0
        assert np.abs(np.asarray(g_light)).sum() > 0

    def test_grad_wrt_voxel_radiance(self, setup):
        # gradients flow to the radiance grid itself (inverse rendering)
        cfg, scene, camera, ds, mats, samples = setup
        from vct_tpu.core import grid as G
        vs = R.build_voxel_state(cfg, samples, mats)
        origins, dirs = cameralib.primary_rays(camera, 16, 16)
        cam_pos = jnp.asarray(camera.position, jnp.float32)

        def loss(lit0):
            mips = G.build_mips(lit0, cfg.grid.num_levels)
            vs2 = dataclasses.replace(vs, radiance_mips=mips)
            img = R.render_rays(cfg, ds, vs2, mats, origins, dirs, cam_pos)
            return jnp.mean(img)

        g = jax.grad(loss)(vs.radiance_mips[0])
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
