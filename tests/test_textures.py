"""Texture atlas, bilinear REPEAT sampling, mask folding, bump normals —
scene/textures.py (DiffuseTexture/SpecularTexture/HeightTexture/MaskTexture
units of the reference, Mesh.h:89-111, VoxelConeTracing.fs:108-126,167-172).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from vct_tpu.scene import textures as TX
from vct_tpu.scene.mesh import Material, scene_from_arrays


def checker(n=8, c0=(1, 0, 0), c1=(0, 0, 1)):
    img = np.zeros((n, n, 3), np.float32)
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    m = ((yy + xx) % 2).astype(bool)
    img[m] = c1
    img[~m] = c0
    return img


class TestAtlas:
    def test_constant_fill_matches_material_color(self):
        mats = [Material(albedo=(0.2, 0.4, 0.6, 1.0),
                         specular=(0.5, 0.1, 0.2))]
        atlas = TX.TextureAtlas.from_materials(mats, resolution=8)
        assert atlas.albedo.shape == (1, 8, 8, 4)
        np.testing.assert_allclose(np.asarray(atlas.albedo[0, 3, 5]),
                                   [0.2, 0.4, 0.6, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(atlas.specular[0, 0, 0]),
                                   [0.5, 0.1, 0.2], atol=1e-6)
        np.testing.assert_allclose(np.asarray(atlas.height[0]), 0.0)

    def test_mask_folds_into_albedo_alpha(self):
        mask = np.zeros((4, 4), np.float32)
        mask[:2] = 1.0
        mats = [Material(albedo=(1, 1, 1, 1), mask_texture=mask)]
        atlas = TX.TextureAtlas.from_materials(mats, resolution=4)
        a = np.asarray(atlas.albedo[0, ..., 3])
        np.testing.assert_allclose(a[:2], 1.0, atol=1e-6)
        np.testing.assert_allclose(a[2:], 0.0, atol=1e-6)

    def test_rgb_texture_gets_alpha_one(self):
        mats = [Material(albedo_texture=checker(4))]
        atlas = TX.TextureAtlas.from_materials(mats, resolution=4)
        np.testing.assert_allclose(np.asarray(atlas.albedo[0, ..., 3]), 1.0)

    def test_has_textures(self):
        assert not TX.has_textures([Material()])
        assert TX.has_textures([Material(), Material(height_texture=np.zeros((2, 2)))])


class TestSampling:
    def test_texel_center_exact(self):
        img = checker(4)
        atlas = TX.TextureAtlas.from_materials(
            [Material(albedo_texture=img)], resolution=4)
        # v flips: uv v=1 is image row 0
        uv = jnp.asarray([[(2 + 0.5) / 4, 1.0 - (1 + 0.5) / 4]], jnp.float32)
        out = TX.sample_atlas(atlas.albedo, jnp.asarray([0]), uv)
        np.testing.assert_allclose(np.asarray(out)[0, :3], img[1, 2],
                                   atol=1e-6)

    def test_repeat_wrap(self):
        img = checker(4)
        atlas = TX.TextureAtlas.from_materials(
            [Material(albedo_texture=img)], resolution=4)
        ids = jnp.asarray([0, 0])
        uv = jnp.asarray([[0.125, 0.375], [1.125, 0.375 - 1.0]], jnp.float32)
        out = TX.sample_atlas(atlas.albedo, ids, uv)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]),
                                   atol=1e-6)

    def test_per_material_pages(self):
        mats = [Material(albedo=(1, 0, 0, 1)), Material(albedo=(0, 1, 0, 1))]
        atlas = TX.TextureAtlas.from_materials(mats, resolution=4)
        uv = jnp.full((2, 2), 0.5, jnp.float32)
        out = TX.sample_atlas(atlas.albedo, jnp.asarray([0, 1]), uv)
        np.testing.assert_allclose(np.asarray(out)[:, :3],
                                   [[1, 0, 0], [0, 1, 0]], atol=1e-6)


class TestBump:
    def _frame(self, n):
        t = jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (n, 3))
        b = jnp.broadcast_to(jnp.asarray([0.0, 1, 0]), (n, 3))
        nn = jnp.broadcast_to(jnp.asarray([0.0, 0, 1]), (n, 3))
        return t, b, nn

    def test_flat_height_keeps_normal(self):
        atlas = TX.TextureAtlas.from_materials([Material()], resolution=8)
        t, b, n = self._frame(3)
        uv = jnp.asarray([[0.2, 0.3], [0.5, 0.5], [0.9, 0.1]], jnp.float32)
        out = TX.bump_normal(atlas, jnp.zeros(3, jnp.int32), uv, t, b, n)
        np.testing.assert_allclose(np.asarray(out), np.asarray(n), atol=1e-5)

    def test_ramp_tilts_against_gradient(self):
        # height increases with u -> tangent-space normal tilts toward -x
        res = 16
        h = np.tile(np.linspace(0, 1, res, dtype=np.float32), (res, 1))
        atlas = TX.TextureAtlas.from_materials(
            [Material(height_texture=h)], resolution=res)
        t, b, n = self._frame(1)
        uv = jnp.asarray([[0.5, 0.5]], jnp.float32)
        out = np.asarray(TX.bump_normal(
            atlas, jnp.zeros(1, jnp.int32), uv, t, b, n))[0]
        assert out[0] < -0.01          # tilted along -tangent
        assert out[2] > 0.5            # still mostly +normal
        np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-5)


class TestRendererIntegration:
    def _textured_equals_flat(self, albedo):
        """A constant-color texture must render identically to the flat
        material color (the atlas fallback contract)."""
        import jax

        from vct_tpu.config import preset, GridConfig, RenderConfig
        from vct_tpu.render import renderer as R
        from vct_tpu.scene import cornell_box

        cfg = preset("cornell64")
        cfg = dataclasses.replace(
            cfg, grid=GridConfig(dim=32, world_size=150.0),
            render=RenderConfig(width=24, height=24))
        flat = cornell_box(size=100.0, with_blocks=False)
        img_flat = R.render_image(cfg, flat, jit=False)

        tex = cornell_box(size=100.0, with_blocks=False)
        const = np.empty((4, 4, 4), np.float32)
        const[:] = albedo
        tex.materials[0] = dataclasses.replace(
            tex.materials[0], albedo_texture=const[..., :4] * 0 + np.asarray(
                list(tex.materials[0].albedo), np.float32))
        img_tex = R.render_image(cfg, tex, jit=False)
        np.testing.assert_allclose(img_tex, img_flat, rtol=1e-4, atol=1e-4)

    def test_constant_texture_matches_flat(self):
        self._textured_equals_flat((0.73, 0.73, 0.73, 1.0))

    def test_alpha_mask_discards(self):
        """Albedo alpha 0 everywhere -> every hit is discarded to the
        background color (fs:169-172)."""
        from vct_tpu.config import preset, GridConfig, RenderConfig
        from vct_tpu.render import renderer as R
        from vct_tpu.scene import cornell_box

        cfg = preset("cornell64")
        cfg = dataclasses.replace(
            cfg, grid=GridConfig(dim=16, world_size=150.0),
            render=RenderConfig(width=8, height=8))
        scene = cornell_box(size=100.0, with_blocks=False)
        zero_mask = np.zeros((4, 4), np.float32)
        scene.materials = [
            dataclasses.replace(m, mask_texture=zero_mask)
            for m in scene.materials
        ]
        img = R.render_image(cfg, scene, jit=False)
        bg = np.asarray(cfg.render.background, np.float32)
        np.testing.assert_allclose(
            img, np.broadcast_to(bg, img.shape), atol=1e-5)


class TestPackedAtlas:
    """Corner-packed atlas (TX.pack_atlas/sample_packed): one fetch per
    pixel reproduces sample_atlas + bump_normal exactly."""

    def _atlas(self):
        rng = np.random.RandomState(7)
        mats = [
            Material(name="a", albedo=(1, 1, 1, 1),
                     albedo_texture=rng.rand(16, 16, 4).astype(np.float32),
                     specular_texture=rng.rand(16, 16, 3).astype(np.float32),
                     height_texture=rng.rand(16, 16).astype(np.float32)),
            Material(name="b", albedo=(0.2, 0.4, 0.6, 1.0)),
        ]
        return TX.TextureAtlas.from_materials(mats, resolution=16)

    def test_color_matches_sample_atlas(self):
        atlas = self._atlas()
        packed = TX.pack_atlas(atlas)
        rng = np.random.RandomState(1)
        uv = jnp.asarray(rng.rand(257, 2).astype(np.float32) * 3.0 - 1.0)
        mid = jnp.asarray(rng.randint(0, 2, 257))
        alb, spec, _ = TX.sample_packed(packed, atlas.resolution, mid, uv)
        ref_a = TX.sample_atlas(atlas.albedo, mid, uv)
        ref_s = TX.sample_atlas(atlas.specular, mid, uv)
        np.testing.assert_allclose(np.asarray(alb), np.asarray(ref_a),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(spec), np.asarray(ref_s),
                                   rtol=1e-5, atol=1e-6)

    def test_bump_matches_bump_normal(self):
        atlas = self._atlas()
        packed = TX.pack_atlas(atlas)
        rng = np.random.RandomState(2)
        n = 129
        uv = jnp.asarray(rng.rand(n, 2).astype(np.float32))
        mid = jnp.zeros((n,), jnp.int32)
        nrm = jnp.asarray(
            rng.randn(n, 3).astype(np.float32))
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        tan = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        bit = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        _, _, (h0, hx, hy) = TX.sample_packed(
            packed, atlas.resolution, mid, uv)
        out = TX.bump_normal_from_heights(h0, hx, hy, tan, bit, nrm)
        ref = TX.bump_normal(atlas, mid, uv, tan, bit, nrm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
