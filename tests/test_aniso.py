"""Anisotropic (6-direction) voxel mips — core/aniso.py.

The reference acknowledges its isotropic mips as the missing piece
(Voxel_Cone_Tracing.h:123-125); these tests pin the directional
pre-integration semantics: thin occluders seen face-on stay opaque at
coarse lods, the per-direction pyramids composite front-to-back along
their axis, and the march/dense/field paths agree with each other.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vct_tpu.core import aniso as A
from vct_tpu.core import dense as D
from vct_tpu.core import grid as G
from vct_tpu.core import march as M


def wall_grid(dim=16, z=6):
    """1-voxel-thick opaque white wall at z=z (even z aligns with level-1
    cell boundaries)."""
    g = np.zeros((dim, dim, dim, 4), np.float32)
    g[:, :, z] = [1.0, 1.0, 1.0, 1.0]
    return jnp.asarray(g)


def random_mips(dim=16, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 0.5, size=(dim, dim, dim, 4)).astype(np.float32)
    return A.build_aniso_mips(jnp.asarray(base))


class TestWeights:
    def test_partition_of_unity(self):
        rng = np.random.default_rng(0)
        d = rng.normal(size=(64, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        w = A.aniso_weights(jnp.asarray(d, jnp.float32))
        assert w.shape == (64, 6)
        np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, atol=1e-5)
        assert np.all(np.asarray(w) >= 0.0)

    def test_static_matches_traced(self):
        rng = np.random.default_rng(1)
        for _ in range(10):
            d = rng.normal(size=3)
            d /= np.linalg.norm(d)
            ws = A.aniso_weights_static(d)
            wt = A.aniso_weights(jnp.asarray(d, jnp.float32))
            np.testing.assert_allclose(ws, np.asarray(wt), atol=1e-5)

    def test_axis_aligned_one_hot(self):
        w = A.aniso_weights_static([0.0, 0.0, 1.0])
        np.testing.assert_allclose(w, [0, 0, 0, 0, 1, 0], atol=1e-7)
        w = A.aniso_weights_static([-1.0, 0.0, 0.0])
        np.testing.assert_allclose(w, [0, 1, 0, 0, 0, 0], atol=1e-7)


class TestDownsample:
    def test_shapes_and_level0_shared(self):
        mips = A.build_aniso_mips(wall_grid(16))
        assert mips[0].shape == (16, 16, 16, 4)
        assert mips[1].shape == (8, 8, 8, 6, 4)
        assert mips[2].shape == (4, 4, 4, 6, 4)
        assert A.is_aniso_stack(mips)
        assert not A.is_aniso_stack(G.build_mips(wall_grid(16)))

    def test_thin_wall_opaque_face_on(self):
        """A 1-voxel wall at even z: level-1 +z/-z alphas stay 1.0 (the
        whole point of aniso mips); iso box mips dilute it to 0.5."""
        mips = A.build_aniso_mips(wall_grid(16, z=6))
        lvl1 = np.asarray(mips[1])
        zc = 3                                   # level-1 cell containing z=6
        np.testing.assert_allclose(lvl1[:, :, zc, 4, 3], 1.0, atol=1e-6)  # +z
        np.testing.assert_allclose(lvl1[:, :, zc, 5, 3], 1.0, atol=1e-6)  # -z
        # edge-on (x/y directions): half the perpendicular pairs hit
        np.testing.assert_allclose(lvl1[:, :, zc, 0, 3], 0.5, atol=1e-6)
        # iso comparison
        iso = G.build_mips(wall_grid(16, z=6))
        np.testing.assert_allclose(np.asarray(iso[1])[:, :, zc, 3], 0.5,
                                   atol=1e-6)

    def test_occlusion_ordering(self):
        """Red wall in front of (smaller z) a green wall: the +z directional
        level keeps red (near occludes far); -z keeps green."""
        g = np.zeros((8, 8, 8, 4), np.float32)
        g[:, :, 2] = [1.0, 0.0, 0.0, 1.0]
        g[:, :, 3] = [0.0, 1.0, 0.0, 1.0]
        mips = A.build_aniso_mips(jnp.asarray(g))
        lvl1 = np.asarray(mips[1])[:, :, 1]      # cell with both walls
        red = np.broadcast_to([1.0, 0, 0], lvl1[..., 4, :3].shape)
        green = np.broadcast_to([0, 1.0, 0], lvl1[..., 5, :3].shape)
        np.testing.assert_allclose(lvl1[..., 4, :3], red, atol=1e-6)
        np.testing.assert_allclose(lvl1[..., 5, :3], green, atol=1e-6)

    def test_chained_levels_composite(self):
        """Level 2 composites level 1 along the same axis."""
        mips = A.build_aniso_mips(wall_grid(16, z=6))
        lvl2 = np.asarray(mips[2])
        np.testing.assert_allclose(lvl2[:, :, 1, 4, 3], 1.0, atol=1e-6)


class TestSampling:
    def test_sample_matches_blend_at_centers(self):
        mips = random_mips(16, seed=2)
        lvl = mips[1]
        d = np.array([0.6, 0.64, -0.48], np.float32)
        d /= np.linalg.norm(d)
        # at texel centers trilinear is exact: sample == static blend
        uvw = jnp.asarray([[(1 + 0.5) / 8, (2 + 0.5) / 8, (3 + 0.5) / 8]],
                          jnp.float32)
        got = A.sample_aniso_level(lvl, uvw, jnp.asarray(d)[None])
        want = A.blend_level_static(lvl, A.aniso_weights_static(d))[1, 2, 3]
        np.testing.assert_allclose(np.asarray(got)[0], np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_march_runs_and_differentiates(self):
        ws, dim = 150.0, 16
        mips = random_mips(dim, seed=3)
        sched = M.march_schedule(0.577, ws / dim, 75.0)
        start = jnp.asarray([[0.0, 0.0, -40.0], [10.0, 5.0, 0.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
        color, occ, alpha = M.cone_march(mips, start, d, sched, ws)
        assert color.shape == (2, 3) and occ.shape == (2,)
        assert np.all(np.isfinite(np.asarray(color)))

        def loss(lvl0):
            stack = (lvl0,) + tuple(mips[1:])
            c, _, _ = M.cone_march(stack, start, d, sched, ws)
            return jnp.sum(c)

        g = jax.grad(loss)(mips[0])
        assert np.isfinite(np.asarray(g)).all()

    def test_face_on_wall_beats_iso_at_distance(self):
        """From far away (coarse lod), a thin wall face-on should block
        more through the aniso stack than the iso stack."""
        ws, dim = 150.0, 32
        g = wall_grid(dim, z=24)
        aniso = A.build_aniso_mips(g)
        iso = G.build_mips(g)
        sched = M.march_schedule(0.577, ws / dim, 75.0)
        start = jnp.asarray([[0.0, 0.0, -60.0]])
        d = jnp.asarray([[0.0, 0.0, 1.0]])
        _, _, a_aniso = M.cone_march(aniso, start, d, sched, ws)
        _, _, a_iso = M.cone_march(iso, start, d, sched, ws)
        assert float(a_aniso[0]) > float(a_iso[0])


class TestDenseAniso:
    def test_directional_march_matches_percone(self):
        """Dense direction-major march over an aniso stack == the per-point
        march at voxel centers (the same parity test_dense does for iso)."""
        ws, dim = 150.0, 16
        mips = random_mips(dim, seed=5)
        sched = M.march_schedule(0.577, ws / dim, 75.0)
        dirv = np.array([0.6, -0.64, 0.48])
        dirv /= np.linalg.norm(dirv)
        field = D.directional_march(mips, dirv, sched, ws)
        idx = np.stack(np.meshgrid(*[np.arange(dim)] * 3, indexing="ij"), -1)
        centers = jnp.asarray((idx + 0.5) / dim * ws - ws / 2, jnp.float32)
        d = jnp.broadcast_to(jnp.asarray(dirv, jnp.float32), centers.shape)
        color, occ, _ = M.cone_march(mips, centers, d, sched, ws)
        np.testing.assert_allclose(field[..., :3], color, rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(field[..., 3], occ, rtol=1e-4, atol=1e-5)


class TestEndToEnd:
    def test_aniso_render_pipeline(self):
        """aniso128-style preset at toy size renders finite images through
        both percone and field providers."""
        import dataclasses

        from vct_tpu.config import preset, GridConfig, RenderConfig
        from vct_tpu.render import renderer as R
        from vct_tpu.scene import cornell_box

        cfg = preset("aniso128")
        cfg = dataclasses.replace(
            cfg, grid=GridConfig(dim=32, world_size=150.0, anisotropic=True),
            render=RenderConfig(width=24, height=24))
        img = R.render_image(cfg, cornell_box(size=100.0), jit=False)
        assert img.shape == (24, 24, 3)
        assert np.isfinite(img).all()
        assert img.max() > 0.01
