"""Fused prepass kernel (ops/prepass_pallas.py) vs the XLA selection
helpers it replaces — integer outputs must match exactly."""

import jax.numpy as jnp
import numpy as np

from vct_tpu.core import grid as G
from vct_tpu.ops import material_pallas as MP
from vct_tpu.ops import prepass_pallas as PP
from vct_tpu.ops import tap_pallas as TP

TILE = 256
WS = 150.0
VOXEL = WS / 64
OFFSET = 2.0


def _gbuf(ntiles, seed=0, miss_frac=0.1, mm=5, res=64):
    rng = np.random.default_rng(seed)
    n = ntiles * TILE
    g = np.zeros((n, 32), np.float32)
    base = rng.uniform(-60, 60, (ntiles, 1, 3))
    g[:, 0:3] = (base + rng.uniform(-2, 2, (ntiles, TILE, 3))
                 ).reshape(n, 3)
    nrm = rng.normal(size=(n, 3))
    g[:, 3:6] = nrm / np.linalg.norm(nrm, axis=1, keepdims=True)
    geo = rng.normal(size=(n, 3))
    g[:, 6:9] = geo / np.linalg.norm(geo, axis=1, keepdims=True)
    ub = rng.uniform(-2, 2, (ntiles, 1, 2))
    g[:, 15:17] = (ub + rng.uniform(0, 0.3, (ntiles, TILE, 2))
                   ).reshape(n, 2)
    g[:, 17] = rng.integers(0, mm, n)
    g[:, 19] = (rng.uniform(size=n) >= miss_frac).astype(np.float32)
    return jnp.asarray(g)


def _dims(d0, floor):
    out = []
    d = d0
    while d >= floor:
        out.append(d)
        d //= 2
    return tuple(out)


class TestFusedPrepass:
    def test_matches_xla_selects(self):
        ntiles, mm, res = 6, 5, 64
        light_dims = _dims(64, TP.BRICK_L)
        field_dims = _dims(64, TP.BRICK_F)
        nlev = int(np.log2(res)) + 1
        g = _gbuf(ntiles, mm=mm, res=res)

        scal8, mscal, mlists, mslots = PP.prepass_tiles(
            g, light_dims=light_dims, field_dims=field_dims,
            num_materials=mm, resolution=res, atlas_levels=nlev,
            voxel=VOXEL, world_size=WS, shadow_offset=OFFSET,
            has_atlas=True, interpret=True, tile=TILE)

        pos = g[:, 0:3]
        nrm = g[:, 3:6]
        geo = g[:, 6:9]
        hit = g[:, 19] > 0.5
        tiled = lambda x: x.reshape((ntiles, TILE) + x.shape[1:])
        p_l = pos + geo * (VOXEL * OFFSET)
        p_f = pos + nrm * VOXEL
        llev, lorg = TP.select_light_bricks(
            tiled(G.world_to_uvw(p_l, WS)), tiled(hit), light_dims)
        flev, forg = TP.select_field_bricks(
            tiled(G.world_to_uvw(p_f, WS)), tiled(hit), field_dims)
        ref8 = np.concatenate(
            [np.asarray(llev)[:, None], np.asarray(lorg),
             np.asarray(flev)[:, None], np.asarray(forg)], axis=1)
        np.testing.assert_array_equal(np.asarray(scal8), ref8)

        rscal, rlists, rslots = MP.select_material_bricks(
            tiled(g[:, 17].astype(jnp.int32)), tiled(g[:, 15:17]),
            tiled(hit), num_materials=mm, resolution=res, num_levels=nlev)
        np.testing.assert_array_equal(np.asarray(mscal), np.asarray(rscal))
        np.testing.assert_array_equal(np.asarray(mlists),
                                      np.asarray(rlists))
        np.testing.assert_array_equal(
            np.asarray(mslots).reshape(ntiles, TILE), np.asarray(rslots))

    def test_no_atlas_zeros(self):
        ntiles = 2
        g = _gbuf(ntiles)
        scal8, mscal, mlists, mslots = PP.prepass_tiles(
            g, light_dims=_dims(64, TP.BRICK_L),
            field_dims=_dims(64, TP.BRICK_F), num_materials=1,
            resolution=64, atlas_levels=7, voxel=VOXEL, world_size=WS,
            shadow_offset=OFFSET, has_atlas=False, interpret=True,
            tile=TILE)
        assert np.asarray(mscal).max() == 0
        assert np.asarray(scal8).shape == (ntiles, 8)

    def test_all_miss_tile(self):
        ntiles = 2
        g = _gbuf(ntiles, miss_frac=1.0)
        light_dims = _dims(64, TP.BRICK_L)
        field_dims = _dims(64, TP.BRICK_F)
        scal8, mscal, _, _ = PP.prepass_tiles(
            g, light_dims=light_dims, field_dims=field_dims,
            num_materials=3, resolution=64, atlas_levels=7, voxel=VOXEL,
            world_size=WS, shadow_offset=OFFSET, has_atlas=True,
            interpret=True, tile=TILE)
        s = np.asarray(scal8)
        assert (s[:, 0] == len(light_dims) - 1).all()
        assert (s[:, 4] == len(field_dims) - 1).all()
        assert np.asarray(mscal)[:, 0].max() == 0
