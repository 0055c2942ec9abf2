"""Tiled material-fetch kernel (ops/material_pallas.py) vs its jnp oracle
and vs the XLA gather path (scene/textures.sample_packed) at level 0."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.ops import material_pallas as MP
from vct_tpu.scene import textures as TX
from vct_tpu.scene.mesh import Material

TILE = 256


def _atlas(res=32, m=3, seed=0):
    rng = np.random.default_rng(seed)
    mats = []
    for k in range(m):
        mats.append(Material(
            name=f"m{k}",
            albedo=(0.2 + 0.2 * k, 0.5, 0.3, 1.0),
            albedo_texture=rng.uniform(0, 1, (res, res, 4)).astype(np.float32),
            specular_texture=rng.uniform(
                0, 1, (res, res, 3)).astype(np.float32),
            height_texture=rng.uniform(0, 1, (res, res)).astype(np.float32),
        ))
    atlas = TX.TextureAtlas.from_materials(mats, resolution=res)
    return atlas


def _gbuf(uv, mat, hit):
    """Minimal (N, 32) gbuf rows: uv in cols 15:17, material col 17,
    hit col 19."""
    n = uv.shape[0]
    g = np.zeros((n, 32), np.float32)
    g[:, 15:17] = uv
    g[:, 17] = mat
    g[:, 19] = hit
    return jnp.asarray(g)


def _run(atlas, uv, mat, hit, res):
    pages = MP.atlas_mip_pages(atlas.albedo, atlas.specular, atlas.height)
    assert MP.pages_resolution(pages) == res
    n = uv.shape[0]
    ntiles = n // TILE
    scal, lists, slots = MP.select_material_bricks(
        jnp.asarray(mat).reshape(ntiles, TILE).astype(jnp.int32),
        jnp.asarray(uv).reshape(ntiles, TILE, 2),
        jnp.asarray(hit).reshape(ntiles, TILE).astype(bool),
        num_materials=atlas.albedo.shape[0], resolution=res,
        num_levels=int(np.log2(res)) + 1)
    g = _gbuf(uv, mat, hit)
    out = MP.material_tiles(g, slots.reshape(-1, 1), scal, lists, pages,
                            resolution=res, interpret=True, tile=TILE)
    ref = MP.material_tiles_ref(g, slots.reshape(-1, 1), scal, lists,
                                pages, res, tile=TILE)
    return out, ref, (g, slots, scal, lists, pages)


class TestMaterialKernel:
    def test_matches_ref_random_uv(self):
        rng = np.random.default_rng(1)
        n = 4 * TILE
        uv = rng.uniform(-1.0, 2.0, (n, 2)).astype(np.float32)
        mat = rng.integers(0, 3, n)
        hit = np.ones(n, np.float32)
        out, ref, _ = _run(_atlas(), uv, mat, hit, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2)

    def test_level0_matches_sample_packed(self):
        """Tiles with tiny UV footprints select level 0, where the kernel
        must reproduce the corner-packed gather path texel-for-texel."""
        rng = np.random.default_rng(2)
        res = 32
        atlas = _atlas(res=res)
        ntiles = 4
        n = ntiles * TILE
        # per-tile 2-texel uv boxes -> footprint << THRESH -> level 0
        base = rng.uniform(0.1, 0.8, (ntiles, 1, 2))
        uv = (base + rng.uniform(0, 2.0 / res, (ntiles, TILE, 2))
              ).reshape(n, 2).astype(np.float32)
        mat = np.repeat(rng.integers(0, 3, ntiles), TILE)
        hit = np.ones(n, np.float32)
        out, _, (_, _, scal, _, _) = _run(atlas, uv, mat, hit, res)
        # every tile picked level 0
        lv = np.asarray(scal)[:ntiles, 2]
        assert (lv == 0).all(), lv

        packed = TX.pack_atlas(atlas)
        alb, spec, (h0, hx, hy) = TX.sample_packed(
            packed, res, jnp.asarray(mat, jnp.int32), jnp.asarray(uv))
        out = np.asarray(out)
        np.testing.assert_allclose(out[:, 0:4], np.asarray(alb), atol=1.5e-2)
        np.testing.assert_allclose(out[:, 4:7], np.asarray(spec), atol=1.5e-2)
        np.testing.assert_allclose(out[:, 7], np.asarray(h0), atol=1.5e-2)
        np.testing.assert_allclose(out[:, 8], np.asarray(hx), atol=1.5e-2)
        np.testing.assert_allclose(out[:, 9], np.asarray(hy), atol=1.5e-2)

    def test_wide_footprint_selects_coarse_level(self):
        """A tile spanning many texture repeats falls back to a coarse mip
        (the 1x1 page is constant, so values stay finite and equal the
        texture mean)."""
        rng = np.random.default_rng(3)
        res = 32
        atlas = _atlas(res=res)
        n = TILE
        uv = rng.uniform(-20.0, 20.0, (n, 2)).astype(np.float32)
        mat = np.zeros(n, np.int64)
        hit = np.ones(n, np.float32)
        out, ref, (_, _, scal, _, _) = _run(atlas, uv, mat, hit, res)
        lv = np.asarray(scal)[0, 2]
        assert lv == int(np.log2(res)), lv       # forced to the 1x1 level
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2)
        mean_alb = np.asarray(atlas.albedo)[0].mean(axis=(0, 1))
        np.testing.assert_allclose(
            np.asarray(out)[:, 0:4],
            np.broadcast_to(mean_alb, (n, 4)), atol=2e-2)

    def test_multi_material_tiles(self):
        """Pixels of different materials inside one tile each read their
        own page brick."""
        rng = np.random.default_rng(4)
        res = 32
        atlas = _atlas(res=res)
        n = 2 * TILE
        uv = (0.3 + rng.uniform(0, 0.1, (n, 2))).astype(np.float32)
        mat = rng.integers(0, 3, n)
        hit = np.ones(n, np.float32)
        out, ref, (_, _, scal, _, _) = _run(atlas, uv, mat, hit, res)
        counts = np.asarray(scal)[:2, 0]
        assert (counts >= 2).all(), counts
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2)

    def test_invalid_tile_zero(self):
        uv = np.zeros((TILE, 2), np.float32)
        mat = np.zeros(TILE, np.int64)
        hit = np.zeros(TILE, np.float32)
        out, _, _ = _run(_atlas(), uv, mat, hit, 32)
        assert np.asarray(out).max() == 0.0

    def test_gradients_match_ref(self):
        rng = np.random.default_rng(5)
        res = 32
        atlas = _atlas(res=res)
        n = TILE
        uv = (0.2 + rng.uniform(0, 0.2, (n, 2))).astype(np.float32)
        mat = rng.integers(0, 3, n)
        hit = np.ones(n, np.float32)
        _, _, (g, slots, scal, lists, pages) = _run(atlas, uv, mat, hit, res)
        tgt = jnp.asarray(rng.uniform(0, 1, (n, MP.NOUT)), jnp.float32)

        def loss_k(pg):
            o = MP.material_tiles(g, slots.reshape(-1, 1), scal, lists, pg,
                                  resolution=res, interpret=True, tile=TILE)
            return jnp.sum(o * tgt)

        def loss_r(pg):
            o = MP.material_tiles_ref(g, slots.reshape(-1, 1), scal, lists,
                                      pg, res, tile=TILE)
            return jnp.sum(o * tgt)

        gk = jax.grad(loss_k)(pages)
        gr = jax.grad(loss_r)(pages)
        np.testing.assert_allclose(
            np.asarray(gk, np.float32), np.asarray(gr, np.float32),
            atol=1e-2)
