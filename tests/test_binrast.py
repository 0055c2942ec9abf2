"""Binned raster-style raycast (ops/binrast_pallas) vs the whole-table
kernel: hit/depth parity, conservativeness across cameras (including
cameras embedded in the scene, which exercise near-plane clipping and
the per-column wide-triangle tier), and the fast-path integration.

All kernel runs use interpret=True (CPU); tests/test_tpu_compile.py
lowers the real thing on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.config import preset
from vct_tpu.core import camera as cameralib
from vct_tpu.ops import binrast_pallas as BR
from vct_tpu.ops import raycast_pallas as RP
from vct_tpu.render import fast as F
from vct_tpu.render import renderer as R
from vct_tpu.scene.atrium import atrium
from vct_tpu.scene.mesh import subdivide_scene

W, H = 128, 64          # wp=128 -> 2 strip columns, hp=64 -> 4 rows


@pytest.fixture(scope="module")
def scene_small():
    cfg = preset("sponza256")
    ds, mats, _ = R.prepare_scene(cfg, atrium())
    return ds, mats


@pytest.fixture(scope="module")
def scene_big():
    cfg = preset("sponza256")
    ds, mats, _ = R.prepare_scene(cfg, subdivide_scene(atrium(), 1))
    return ds, mats


def _rays(camera):
    origins, dirs = cameralib.primary_rays(camera, W, H)
    hp = -(-H // 16) * 16
    wp = -(-W // 64) * 64
    dimg = jnp.pad(dirs, ((0, hp - H), (0, wp - W), (0, 0)), mode="edge")
    dflat = F._tile_order(dimg, hp, wp)
    return origins.reshape(-1, 3)[0], dflat, dimg


def _binned(ds, mats, origin, dflat, dimg):
    return np.asarray(BR.raycast_pinhole_binned(
        ds, origin, dflat, dimg, mats.albedo, mats.specular,
        mats.shininess, interpret=True))


def _whole(ds, mats, origin, dflat):
    isect, attrs, _ = RP.pack_tables(ds, origin, mats.albedo,
                                     mats.specular, mats.shininess)
    return np.asarray(RP.raycast_gbuf24(dflat, origin, isect, attrs,
                                        interpret=True))


CAMERAS = [
    cameralib.Camera(position=(48.0, -10.0, 0.0), yaw=180.0),
    cameralib.Camera(position=(0.0, 0.0, 0.0), yaw=45.0, pitch=-20.0),
    cameralib.Camera(position=(-30.0, 5.0, 10.0), yaw=10.0, pitch=30.0),
]


@pytest.mark.parametrize("cam", range(len(CAMERAS)))
def test_binned_matches_whole_table(scene_small, cam):
    """Exact hit/t parity against the brute-force kernel; winner
    attributes match except on exact-t ties (order-dependent)."""
    ds, mats = scene_small
    origin, dflat, dimg = _rays(CAMERAS[cam])
    g_b = _binned(ds, mats, origin, dflat, dimg)
    g_w = _whole(ds, mats, origin, dflat)
    np.testing.assert_array_equal(g_b[:, 19], g_w[:, 19])      # hit
    np.testing.assert_allclose(g_b[:, 18], g_w[:, 18],
                               rtol=1e-6, atol=1e-6)           # t
    same = np.all(np.isclose(g_b, g_w, rtol=1e-4, atol=1e-4), axis=1)
    assert same.mean() > 0.99, same.mean()


def test_binned_big_scene(scene_big):
    ds, mats = scene_big
    origin, dflat, dimg = _rays(CAMERAS[0])
    g_b = _binned(ds, mats, origin, dflat, dimg)
    g_w = _whole(ds, mats, origin, dflat)
    np.testing.assert_array_equal(g_b[:, 19], g_w[:, 19])
    np.testing.assert_allclose(g_b[:, 18], g_w[:, 18],
                               rtol=1e-6, atol=1e-6)


def test_column_tier_within_budget(scene_big):
    """The column tier (near-plane straddlers + wide tris) must fit its
    budget at Sponza scale — overflow beyond it would DROP geometry."""
    ds, mats = scene_big
    origin, dflat, dimg = _rays(CAMERAS[1])   # camera inside the scene
    rows, t_real = BR.pack_rows(ds, origin, mats.albedo, mats.specular,
                                mats.shininess)
    _, _, n_col = BR.bin_triangles(ds, origin, dflat, dimg, rows)
    _, nb_col = BR._budgets(t_real)
    assert int(n_col) <= nb_col, (int(n_col), nb_col)


def test_segments_contain_all_covering_triangles(scene_small):
    """Conservativeness at the binning level: every triangle a strip's
    rays can hit appears in that strip's segment or its column's (or is
    a real triangle tested redundantly — never dropped)."""
    ds, mats = scene_small
    origin, dflat, dimg = _rays(CAMERAS[0])
    rows, t_real = BR.pack_rows(ds, origin, mats.albedo, mats.specular,
                                mats.shininess)
    scal, isect_p, _ = BR.bin_triangles(ds, origin, dflat, dimg, rows)
    g_w = _whole(ds, mats, origin, dflat)
    hit = g_w[:, 19] > 0.5
    # whole-table winner ids are not reported; instead verify through
    # the kernel: binned must reproduce every whole-table hit exactly
    g_b = np.asarray(BR.finish_binned(
        dflat, origin,
        BR.raycast_binned(dflat, jnp.asarray(scal), isect_p,
                          interpret=True), rows))
    assert (g_b[hit, 19] > 0.5).all()
    np.testing.assert_allclose(g_b[hit, 18], g_w[hit, 18],
                               rtol=1e-6, atol=1e-6)


def test_fast_path_uses_binned(scene_big, monkeypatch):
    """render_frame routes big scenes through the binned kernel and the
    image matches the streamed path's."""
    import dataclasses
    cfg = preset("sponza256")
    cfg = dataclasses.replace(
        cfg,
        grid=dataclasses.replace(cfg.grid, dim=32, compute="float32"),
        cones=dataclasses.replace(cfg.cones, field_dim=32),
        render=dataclasses.replace(cfg.render, width=W, height=H))
    assert F.supported(cfg)
    dsb, matsb = scene_big
    _, _, samples = R.prepare_scene(cfg, atrium())
    voxels = R.build_voxel_state_staged(cfg, samples, matsb)
    tables = F.build_frame_tables(cfg, voxels, matsb)
    camera = CAMERAS[0]
    origins, dirs = cameralib.primary_rays(camera, W, H)
    cam = jnp.asarray(camera.position, jnp.float32)
    img_b = np.asarray(F.render_frame(cfg, dsb, tables, matsb, origins,
                                      dirs, cam, interpret=True))
    monkeypatch.setenv("VCT_RAYCAST", "stream")
    jax.clear_caches()
    img_s = np.asarray(F.render_frame(cfg, dsb, tables, matsb, origins,
                                      dirs, cam, interpret=True))
    # same image up to winner tie-breaks on edge pixels (different but
    # equally-valid coincident-surface winners shade slightly apart)
    err = np.abs(img_b - img_s)
    assert err.mean() < 1e-3, err.mean()
    assert (err.max(axis=-1) > 0.02).mean() < 0.01
