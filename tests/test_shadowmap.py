"""Shadow-map mode — render/shadowmap.py (reference-parity K1 + PCF:
Voxel_Cone_Tracing.h:80-105, VoxelConeTracing.fs:132-163,
Voxelization.fs:18-52)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from vct_tpu.config import VCTConfig, ShadowConfig, LightConfig
from vct_tpu.render import shadowmap as SM


def map_cfg(**kw):
    return VCTConfig(shadow=ShadowConfig(mode="map", map_size=128, **kw))


class TestLightMatrix:
    def test_projects_origin_to_center(self):
        cfg = map_cfg()
        uv, d = SM.project(SM.light_matrix(cfg), jnp.zeros((1, 3)))
        np.testing.assert_allclose(np.asarray(uv)[0], [0.5, 0.5], atol=1e-5)
        np.testing.assert_allclose(float(d[0]), 0.5, atol=0.02)

    def test_depth_increases_away_from_light(self):
        """The light sits at lightDirection looking at the origin; points
        further along -light direction have larger [0,1] depth."""
        cfg = map_cfg()
        l = np.asarray(cfg.light.direction, np.float64)
        l /= np.linalg.norm(l)
        pts = jnp.asarray([l * 50.0, -l * 50.0], jnp.float32)
        _, d = SM.project(SM.light_matrix(cfg), pts)
        assert float(d[0]) < float(d[1])

    def test_ortho_extent_maps_to_unit_uv(self):
        cfg = map_cfg()
        e = cfg.shadow.ortho_extent
        # a point at +e along the light frame's right axis lands at u=1
        eye = np.asarray(cfg.light.direction, np.float64)
        fwd = -eye / np.linalg.norm(eye)
        s = np.cross(fwd, [0.0, 1.0, 0.0])
        s /= np.linalg.norm(s)
        uv, _ = SM.project(SM.light_matrix(cfg),
                           jnp.asarray(s * e, jnp.float32)[None])
        np.testing.assert_allclose(float(uv[0, 0]), 1.0, atol=1e-4)


class TestShadowMapAndPCF:
    def test_occluder_shadows_point_below(self):
        """Overhead light, horizontal occluder plate above a query point:
        PCF ~0 under the plate, ~1 outside it."""
        cfg = VCTConfig(
            light=LightConfig(direction=(0.0, 1.0, 0.0)),
            shadow=ShadowConfig(mode="map", map_size=256))
        # dense plate of surface samples at y=30, |x|,|z| <= 20
        n = 80
        xs = np.linspace(-20, 20, n)
        gx, gz = np.meshgrid(xs, xs, indexing="ij")
        plate = np.stack([gx, np.full_like(gx, 30.0), gz], -1).reshape(-1, 3)
        smap = SM.build_shadow_map(cfg, jnp.asarray(plate, jnp.float32))
        queries = jnp.asarray(
            [[0.0, -20.0, 0.0],      # under the plate -> shadowed
             [60.0, -20.0, 0.0],     # far outside -> lit
             [0.0, 50.0, 0.0]],      # above the plate -> lit
            jnp.float32)
        s = np.asarray(SM.pcf_shadow(cfg, smap, queries, "voxelize"))
        assert s[0] < 0.05
        assert s[1] > 0.95
        assert s[2] > 0.95

    def test_reference_pcf_quirk_brightens(self):
        """pcf_normalization='reference' multiplies the 25-tap sum by
        0.111 — 2.78x the correct /25 for fully-lit points (fs:158)."""
        cfg_ref = VCTConfig(shadow=ShadowConfig(
            mode="map", map_size=64, pcf_normalization="reference"))
        cfg_cor = VCTConfig(shadow=ShadowConfig(
            mode="map", map_size=64, pcf_normalization="correct"))
        smap = jnp.ones((64, 64))          # empty map: everything lit
        q = jnp.zeros((1, 3))
        s_ref = float(SM.pcf_shadow(cfg_ref, smap, q, "main")[0])
        s_cor = float(SM.pcf_shadow(cfg_cor, smap, q, "main")[0])
        np.testing.assert_allclose(s_cor, 1.0, atol=1e-6)
        np.testing.assert_allclose(s_ref, 25 * 0.111, atol=1e-6)
        # the voxelize-pass normalization ignores the quirk (fs:46 in
        # Voxelization.fs divides by 25)
        s_vox = float(SM.pcf_shadow(cfg_ref, smap, q, "voxelize")[0])
        np.testing.assert_allclose(s_vox, 1.0, atol=1e-6)


class TestRendererMapMode:
    def test_reference_preset_renders(self):
        from vct_tpu.config import preset, GridConfig, RenderConfig
        from vct_tpu.render import renderer as R
        from vct_tpu.scene import cornell_box

        cfg = preset("reference")
        cfg = dataclasses.replace(
            cfg, grid=GridConfig(dim=32, world_size=150.0),
            render=RenderConfig(width=24, height=24),
            shadow=dataclasses.replace(cfg.shadow, map_size=256))
        img = R.render_image(cfg, cornell_box(size=100.0), jit=False)
        assert img.shape == (24, 24, 3)
        assert np.isfinite(img).all()
        assert img.max() > 0.01

    def test_map_mode_staged_matches_monolithic(self):
        from vct_tpu.config import preset, GridConfig, RenderConfig
        from vct_tpu.render import renderer as R
        from vct_tpu.scene import cornell_box

        cfg = preset("reference")
        cfg = dataclasses.replace(
            cfg, grid=GridConfig(dim=16, world_size=150.0),
            shadow=dataclasses.replace(cfg.shadow, map_size=128))
        scene = cornell_box(size=100.0, with_blocks=False)
        ds, mats, samples = R.prepare_scene(cfg, scene)
        v1 = R.build_voxel_state(cfg, samples, mats)
        v2 = R.build_voxel_state_staged(cfg, samples, mats)
        np.testing.assert_allclose(
            np.asarray(v1.radiance_mips[0]), np.asarray(v2.radiance_mips[0]),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(v1.shadow_map), np.asarray(v2.shadow_map), atol=1e-6)
