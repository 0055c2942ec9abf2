"""Tiled tap kernel (ops/tap_pallas.py) vs the XLA shading taps:
shadow_volume_tap + indirect_diffuse_field + raw specular field tap.

The kernel stores volumes in bf16 and runs the tap matmuls in bf16, so
tolerances are ~5e-3 (shadow, scalar in [0,1]) and ~2e-2 (field taps)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.config import preset
from vct_tpu.core import cones as C
from vct_tpu.core import dense as D
from vct_tpu.core import grid as G
from vct_tpu.ops import tap_pallas as TP
from vct_tpu.render import shading

WS = 150.0
LDIM = 32
FDIM = 16
NB = 26


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    cfg = preset("sponza256")
    cfg = dataclasses.replace(
        cfg, grid=dataclasses.replace(cfg.grid, dim=LDIM, world_size=WS))
    voxel = WS / LDIM

    light = jnp.asarray(rng.rand(LDIM, LDIM, LDIM, 1), jnp.float32)
    light_f32 = tuple(
        m[..., 0] for m in G.build_mips(light, num_levels=2))   # 32,16
    light_mips = TP.pack_light_mips(light_f32)
    cfield = NB * 4 * 2
    field = jnp.asarray(
        rng.rand(FDIM, FDIM, FDIM, cfield), jnp.float32)
    field_f32 = tuple(G.build_mips(field, num_levels=2))        # 16,8
    field_mips = TP.pack_field_mips(field_f32)

    # synthetic tile-coherent G-buffer: each tile's points cluster in a
    # small ball so level-0 bricks fit
    ntiles = 4
    n = ntiles * TP.TILE
    centers = (rng.rand(ntiles, 3) * 0.5 + 0.25) * WS - WS / 2
    pos = np.repeat(centers, TP.TILE, axis=0) + rng.randn(n, 3) * 1.5
    normal = rng.randn(n, 3)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    tangent = np.cross(normal, [0.1, 0.9, 0.3])
    tangent /= np.linalg.norm(tangent, axis=1, keepdims=True)
    bitan = np.cross(normal, tangent)
    gbuf = np.zeros((n, 32), np.float32)
    gbuf[:, 0:3] = pos
    gbuf[:, 3:6] = normal
    gbuf[:, 6:9] = normal          # geo normal = shading normal here
    gbuf[:, 9:12] = tangent
    gbuf[:, 12:15] = bitan
    gbuf[:, 19] = 1.0
    gbuf[:, 28:31] = normal        # bump normal column (specular axis)
    gbuf = jnp.asarray(gbuf)

    return cfg, voxel, light_mips, field_mips, light_f32, field_f32, \
        gbuf, ntiles


def _scalars(cfg, voxel, gbuf, ntiles, light_dims, field_dims):
    pos = gbuf[:, 0:3].reshape(ntiles, TP.TILE, 3)
    nrm = gbuf[:, 3:6].reshape(ntiles, TP.TILE, 3)
    geo = gbuf[:, 6:9].reshape(ntiles, TP.TILE, 3)
    hit = gbuf[:, 19].reshape(ntiles, TP.TILE) > 0.5
    p_l = pos + geo * (voxel * cfg.shadow.normal_offset)
    p_f = pos + nrm * voxel
    llev, lorg = TP.select_light_bricks(G.world_to_uvw(p_l, WS), hit,
                                        light_dims)
    flev, forg = TP.select_field_bricks(G.world_to_uvw(p_f, WS), hit,
                                        field_dims)
    return jnp.concatenate(
        [llev[:, None], lorg, flev[:, None], forg], axis=1).astype(jnp.int32)


CAMPOS = jnp.asarray([5.0, -3.0, 190.0], jnp.float32)


def _kw(cfg, voxel):
    return dict(cfield=NB * 4 * 2, nb=NB, world_size=WS, voxel=voxel,
                shadow_offset=cfg.shadow.normal_offset,
                power_diffuse=8, power_specular=32,
                cones_static=(
                    tuple(map(tuple,
                              np.asarray(C.CONE_DIRECTIONS[:6],
                                         np.float32))),
                    tuple(np.asarray(C.CONE_WEIGHTS[:6], np.float32)),
                    tuple(map(tuple, D.direction_basis(NB)))))


def _run(cfg, voxel, light_mips, field_mips, gbuf, ntiles):
    scal = _scalars(cfg, voxel, gbuf, ntiles,
                    tuple(m.shape[0] for m in light_mips),
                    tuple(m.shape[0] for m in field_mips))
    return TP.tap_tiles(
        gbuf, scal, gbuf[:, 28:32], CAMPOS, light_mips, field_mips,
        interpret=True, **_kw(cfg, voxel))


class TestTapKernel:
    def test_shadow_matches_volume_tap(self, setup):
        cfg, voxel, light_mips, field_mips, light_f32, _, gbuf, nt = setup
        out = _run(cfg, voxel, light_mips, field_mips, gbuf, nt)
        lv = light_f32[0][..., None]
        ref = shading.shadow_volume_tap(cfg, lv, gbuf[:, 0:3], gbuf[:, 6:9])
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ref),
                                   rtol=5e-3, atol=5e-3)

    def test_diffuse_matches_field_mode(self, setup):
        cfg, voxel, light_mips, field_mips, _, field_f32, gbuf, nt = setup
        out = _run(cfg, voxel, light_mips, field_mips, gbuf, nt)
        # XLA reference on the same bf16-quantized level-0 field
        dfield = field_f32[0].astype(jnp.bfloat16).astype(
            jnp.float32)[..., :4 * NB]
        pos, nrm = gbuf[:, 0:3], gbuf[:, 3:6]
        cone_dirs = shading.pixel_cone_dirs(
            cfg, nrm, gbuf[:, 9:12], gbuf[:, 12:15])
        ref_rgb, ref_occ = shading.indirect_diffuse_field(
            cfg, dfield, pos, nrm, cone_dirs)
        # kernel runs the field matmul in bf16: tolerance ~1e-2 relative
        np.testing.assert_allclose(np.asarray(out[:, 1:4]),
                                   np.asarray(ref_rgb),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(out[:, 4]),
                                   np.asarray(ref_occ),
                                   rtol=2e-2, atol=2e-2)

    def test_spec_matches_field_mode(self, setup):
        cfg, voxel, light_mips, field_mips, _, field_f32, gbuf, nt = setup
        out = _run(cfg, voxel, light_mips, field_mips, gbuf, nt)
        pos, nrm = gbuf[:, 0:3], gbuf[:, 3:6]
        sfield = field_f32[0].astype(jnp.bfloat16).astype(
            jnp.float32)[..., 4 * NB:]
        eye = shading.C.normalize(CAMPOS - pos)
        refl = shading.reflect_eye(nrm, eye)
        ref_rgb, ref_occ = shading.indirect_specular_field(
            cfg, sfield, pos, nrm, refl)
        np.testing.assert_allclose(np.asarray(out[:, 5:8]),
                                   np.asarray(ref_rgb),
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(out[:, 8]),
                                   np.asarray(ref_occ),
                                   rtol=2e-2, atol=2e-2)

    def test_coarse_level_fallback(self, setup):
        """A tile whose AABB exceeds the finest brick uses a coarser level;
        the kernel then matches trilinear on that level."""
        cfg, voxel, light_mips, field_mips, light_f32, _, gbuf0, _ = setup
        rng = np.random.RandomState(3)
        n = TP.TILE
        pos = (rng.rand(n, 3) - 0.5) * WS * 0.8       # spans most of the grid
        g = np.asarray(gbuf0[:n]).copy()
        g[:, 0:3] = pos
        g[:, 6:9] = g[:, 3:6]
        gbuf = jnp.asarray(g)
        out = _run(cfg, voxel, light_mips, field_mips, gbuf, 1)
        scal = _scalars(cfg, voxel, gbuf, 1,
                        tuple(m.shape[0] for m in light_mips),
                        tuple(m.shape[0] for m in field_mips))
        llev = int(scal[0, 0])
        assert llev > 0, "expected a coarser light level for a huge AABB"
        lv = light_f32[llev][..., None]
        ref = shading.shadow_volume_tap(cfg, lv, gbuf[:, 0:3], gbuf[:, 6:9])
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ref),
                                   rtol=5e-3, atol=5e-3)
    def test_select_covers_bricks(self, setup):
        """Selected (level, origin) windows genuinely contain every tap's
        trilinear corner cells — the coverage contract of the aligned
        brick geometry."""
        cfg, voxel, light_mips, field_mips, _, _, gbuf, nt = setup
        scal = np.asarray(_scalars(
            cfg, voxel, gbuf, nt,
            tuple(m.shape[0] for m in light_mips),
            tuple(m.shape[0] for m in field_mips)))
        pos = np.asarray(gbuf[:, 0:3]).reshape(nt, TP.TILE, 3)
        geo = np.asarray(gbuf[:, 6:9]).reshape(nt, TP.TILE, 3)
        nrm = np.asarray(gbuf[:, 3:6]).reshape(nt, TP.TILE, 3)
        p_l = pos + geo * (voxel * cfg.shadow.normal_offset)
        p_f = pos + nrm * voxel

        def check(p, lvl, org, dim0, ext):
            d = dim0 // (1 << lvl)
            uvw = np.asarray(p) / WS + 0.5
            t = np.clip(uvw * d - 0.5, 0.0, d - 1.0)
            i0 = np.clip(np.floor(t), 0, d - 2)
            lo, hi = i0.min(axis=0), (i0 + 1).max(axis=0)
            for ax in range(3):
                e = ext[ax] if ext[ax] else d
                assert lo[ax] >= org[ax] and hi[ax] < org[ax] + e, \
                    (ax, lo[ax], hi[ax], org[ax], e)

        for ti in range(nt):
            check(p_l[ti], scal[ti, 0], scal[ti, 1:4],
                  light_mips[0].shape[0], (TP.BRICK_L, TP.LBY, None))
            check(p_f[ti], scal[ti, 4], scal[ti, 5:8],
                  field_mips[0].shape[0], (TP.BRICK_F, TP.BRICK_F, TP.FBZ))


class TestTapGradients:
    def test_grads_flow_and_match_xla_path(self, setup):
        """custom VJP: d(loss)/d(field mips) through the kernel equals the
        gradient of the XLA field-mode shading path (tiles here all select
        level 0), and light-volume grads are finite and nonzero."""
        cfg, voxel, light_mips, field_mips, light_f32, field_f32, gbuf, nt \
            = setup
        scal = _scalars(cfg, voxel, gbuf, nt,
                        tuple(m.shape[0] for m in light_mips),
                        tuple(m.shape[0] for m in field_mips))
        assert int(np.asarray(scal)[:, 4].max()) == 0   # level-0 field tiles
        w = jnp.asarray(np.random.RandomState(7).rand(
            gbuf.shape[0], 5), jnp.float32)
        kw = _kw(cfg, voxel)

        def loss_kernel(field0):
            fm = TP.pack_field_mips((field0,) + tuple(
                f for f in field_f32[1:]))
            out = TP.tap_tiles(gbuf, scal, gbuf[:, 28:32], CAMPOS, light_mips, fm,
                               interpret=True, **kw)
            return jnp.sum(out[:, :5] * w)

        def loss_xla(field0):
            pos, nrm = gbuf[:, 0:3], gbuf[:, 3:6]
            cone_dirs = shading.pixel_cone_dirs(
                cfg, nrm, gbuf[:, 9:12], gbuf[:, 12:15])
            rgb, occ = shading.indirect_diffuse_field(
                cfg, field0[..., :4 * NB], pos, nrm, cone_dirs)
            lv = light_f32[0][..., None]
            sh = shading.shadow_volume_tap(cfg, lv, pos, gbuf[:, 6:9])
            out = jnp.concatenate(
                [sh[:, None], rgb, occ[:, None]], axis=1)
            return jnp.sum(out * w)

        gk = jax.grad(loss_kernel)(field_f32[0])
        gx = jax.grad(loss_xla)(field_f32[0])
        assert np.all(np.isfinite(np.asarray(gk)))
        assert float(jnp.abs(gk).max()) > 0
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx),
                                   rtol=2e-2, atol=2e-2)

        def loss_light(l0):
            lm = TP.pack_light_mips((l0,) + tuple(light_f32[1:]))
            out = TP.tap_tiles(gbuf, scal, gbuf[:, 28:32], CAMPOS, lm, field_mips,
                               interpret=True, **kw)
            return jnp.sum(out[:, 0])

        gl = jax.grad(loss_light)(light_f32[0])
        assert np.all(np.isfinite(np.asarray(gl)))
        assert float(jnp.abs(gl).max()) > 0

        def loss_gbuf(gv):
            out = TP.tap_tiles(gv, scal, gv[:, 28:32], CAMPOS, light_mips, field_mips,
                               interpret=True, **kw)
            return jnp.sum(out[:, 1:9] * w[:, :1])

        gg = jax.grad(loss_gbuf)(gbuf)
        assert np.all(np.isfinite(np.asarray(gg)))
        assert float(jnp.abs(gg).max()) > 0

    def test_ref_matches_kernel_forward(self, setup):
        cfg, voxel, light_mips, field_mips, _, _, gbuf, nt = setup
        scal = _scalars(cfg, voxel, gbuf, nt,
                        tuple(m.shape[0] for m in light_mips),
                        tuple(m.shape[0] for m in field_mips))
        kw = _kw(cfg, voxel)
        out_k = TP.tap_tiles(gbuf, scal, gbuf[:, 28:32], CAMPOS, light_mips, field_mips,
                             interpret=True, **kw)
        out_r = TP.tap_tiles_ref(gbuf, scal, gbuf[:, 28:32], CAMPOS,
                                 light_mips, field_mips, **kw)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                                   rtol=2e-2, atol=2e-2)


def test_select_covers_bricks_align_straddle():
    """ADVICE r2: at level dims >= 64 a z footprint at the fit threshold
    straddling an ALIGN boundary (lo % 16 == 15) must still be covered —
    the off-by-one (threshold 16 vs 15) put the trilinear +1 corner one
    cell past the 32-wide window."""
    d0 = 64
    dims = (64, 32, 16, 8)
    ws = 150.0
    # z cells 15..30 at d=64 (footprint 15, lo%16==15): uvw for cell c is
    # (c + 0.5 + eps)/d
    cells_z = np.linspace(15.2, 30.8, TP.TILE)
    uvw = np.zeros((1, TP.TILE, 3), np.float32)
    uvw[0, :, 0] = (20.0 + 0.5) / d0
    uvw[0, :, 1] = (33.0 + 0.5) / d0
    uvw[0, :, 2] = (cells_z + 0.5) / d0
    valid = np.ones((1, TP.TILE), bool)
    lev, org = TP.select_field_bricks(
        jnp.asarray(uvw), jnp.asarray(valid), dims)
    lev, org = int(lev[0]), np.asarray(org[0])
    d = dims[lev]
    t = np.clip(uvw[0] * d - 0.5, 0.0, d - 1.0)
    i0 = np.clip(np.floor(t), 0, d - 2)
    lo, hi = i0.min(axis=0), (i0 + 1).max(axis=0)
    ext = (TP.BRICK_F, TP.BRICK_F, TP.FBZ)
    for ax in range(3):
        assert lo[ax] >= org[ax], (ax, lo[ax], org[ax])
        assert hi[ax] < org[ax] + ext[ax], (ax, hi[ax], org[ax], ext[ax])
