"""Golden tests for vct_tpu.core.grid against the GLSL-pinned behavior.

Specs: SampleVoxels mapping (VoxelConeTracing.fs:59-66), GL trilinear
filtering with texel centers at (i+0.5)/D, glGenerateMipmap 2x2x2 box
reduction (Voxel_Cone_Tracing.h:248).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.core import grid as G


def rand_grid(rng, d, c=4):
    return jnp.asarray(rng.uniform(size=(d, d, d, c)).astype(np.float32))


class TestMapping:
    def test_world_to_uvw_matches_shader(self):
        # fs:61-63 — uvw = p/(size*0.5)*0.5+0.5
        ws = 150.0
        p = jnp.array([[0.0, 0.0, 0.0], [75.0, -75.0, 37.5]])
        uvw = G.world_to_uvw(p, ws)
        np.testing.assert_allclose(
            uvw, [[0.5, 0.5, 0.5], [1.0, 0.0, 0.75]], atol=1e-6)

    def test_roundtrip(self):
        ws = 150.0
        p = jnp.array([1.0, -20.0, 63.0])
        np.testing.assert_allclose(
            G.uvw_to_world(G.world_to_uvw(p, ws), ws), p, atol=1e-4)

    def test_voxel_center_roundtrip(self):
        ws, d = 150.0, 64
        idx = jnp.array([[0, 31, 63]])
        c = G.voxel_center(idx, ws, d)
        np.testing.assert_array_equal(G.world_to_index(c, ws, d), idx)


class TestTrilinear:
    def test_at_texel_centers_exact(self):
        rng = np.random.default_rng(0)
        g = rand_grid(rng, 8)
        i = np.array([[0, 0, 0], [3, 5, 7], [7, 7, 7]])
        uvw = jnp.asarray((i + 0.5) / 8.0, jnp.float32)
        out = G.trilinear_sample(g, uvw)
        np.testing.assert_allclose(
            out, np.asarray(g)[i[:, 0], i[:, 1], i[:, 2]], atol=1e-6)

    def test_midpoint_is_average(self):
        g = jnp.zeros((4, 4, 4, 1)).at[1, 2, 2, 0].set(1.0).at[2, 2, 2, 0].set(3.0)
        # halfway between x-texels 1 and 2 at y=z=2
        uvw = jnp.array([(2.0) / 4.0, 2.5 / 4.0, 2.5 / 4.0])
        out = G.trilinear_sample(g, uvw)
        np.testing.assert_allclose(out, [2.0], atol=1e-6)

    def test_clamp_to_edge(self):
        rng = np.random.default_rng(1)
        g = rand_grid(rng, 4)
        out_lo = G.trilinear_sample(g, jnp.array([-0.5, 0.125, 0.125]))
        out_hi = G.trilinear_sample(g, jnp.array([1.5, 0.125, 0.125]))
        np.testing.assert_allclose(out_lo, np.asarray(g)[0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(out_hi, np.asarray(g)[3, 0, 0], atol=1e-6)

    def test_linear_in_weights(self):
        # trilinear must reproduce a trilinear function exactly
        d = 8
        xs = (np.arange(d) + 0.5) / d
        f = (xs[:, None, None] * 2.0 + xs[None, :, None] * 3.0
             + xs[None, None, :] * 5.0)
        g = jnp.asarray(f[..., None], jnp.float32)
        rng = np.random.default_rng(2)
        # interior points (away from clamp region)
        uvw = jnp.asarray(rng.uniform(0.2, 0.8, size=(50, 3)), jnp.float32)
        out = G.trilinear_sample(g, uvw)
        expect = uvw[:, 0] * 2 + uvw[:, 1] * 3 + uvw[:, 2] * 5
        np.testing.assert_allclose(out[:, 0], expect, atol=1e-5)


class TestMips:
    def test_downsample_mean(self):
        g = jnp.arange(8, dtype=jnp.float32).reshape(2, 2, 2, 1)
        out = G.downsample2x(g)
        np.testing.assert_allclose(out, [[[[3.5]]]], atol=1e-6)

    def test_build_full_chain(self):
        rng = np.random.default_rng(3)
        g = rand_grid(rng, 16)
        mips = G.build_mips(g)
        assert [m.shape[0] for m in mips] == [16, 8, 4, 2, 1]
        # global mean preserved by box filtering
        for m in mips:
            np.testing.assert_allclose(
                jnp.mean(m, axis=(0, 1, 2)), jnp.mean(g, axis=(0, 1, 2)),
                atol=1e-5)

    def test_sample_lod_interpolates_levels(self):
        g0 = jnp.full((4, 4, 4, 1), 1.0)
        mips = (g0, jnp.full((2, 2, 2, 1), 3.0), jnp.full((1, 1, 1, 1), 7.0))
        ctr = jnp.array([0.5, 0.5, 0.5])
        np.testing.assert_allclose(G.sample_lod(mips, ctr, 0.0), [1.0])
        np.testing.assert_allclose(G.sample_lod(mips, ctr, 0.5), [2.0])
        np.testing.assert_allclose(G.sample_lod(mips, ctr, 1.0), [3.0])
        np.testing.assert_allclose(G.sample_lod(mips, ctr, 5.0), [7.0])  # clamp

    def test_flatten_roundtrip(self):
        rng = np.random.default_rng(4)
        mips = G.build_mips(rand_grid(rng, 8))
        flat, offs, dims = G.flatten_mips(mips)
        back = G.unflatten_mips(flat, offs, dims)
        for a, b in zip(mips, back):
            np.testing.assert_array_equal(a, b)
