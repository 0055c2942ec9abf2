"""Per-pixel specular cone-march kernel (ops/specmarch_pallas.py) vs its
jnp mirror and vs the exact cone-march oracle (core/march.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.core import grid as G
from vct_tpu.core import march as M
from vct_tpu.ops import specmarch_pallas as SP

TILE = 256
WS = 150.0


def _mips(dim=32, seed=0, opaque=False):
    rng = np.random.default_rng(seed)
    vol = rng.uniform(0, 1, (dim, dim, dim, 4)).astype(np.float32)
    vol[..., 3] *= 0.9 if opaque else 0.25
    return G.build_mips(jnp.asarray(vol))


def _sched(dim):
    return M.march_schedule(0.07, WS / dim, 75.0)


def _rays(ntiles, seed=1, spread=0.02, miss_frac=0.0):
    """Coherent per-tile ray bundles (one surface patch per tile)."""
    rng = np.random.default_rng(seed)
    n = ntiles * TILE
    base_p = rng.uniform(-40, 40, (ntiles, 1, 3))
    base_d = rng.normal(size=(ntiles, 1, 3))
    pos = base_p + rng.uniform(-1, 1, (ntiles, TILE, 3))
    d = base_d + spread * rng.normal(size=(ntiles, TILE, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    hit = (rng.uniform(size=(ntiles, TILE)) >= miss_frac).astype(np.float32)
    start4 = np.concatenate(
        [pos, hit[..., None]], axis=-1).reshape(n, 4).astype(np.float32)
    refl4 = np.concatenate(
        [d, np.zeros((ntiles, TILE, 1))], axis=-1
    ).reshape(n, 4).astype(np.float32)
    return jnp.asarray(start4), jnp.asarray(refl4)


def _run(mips, start4, refl4, dim):
    pages = SP.pack_spec_mips(mips)
    dims = SP.pages_dims(pages)
    assert dims == tuple(
        m.shape[0] for m in mips if m.shape[0] >= SP.FLOOR_DIM)
    sched = _sched(dim)
    groups = SP.plan_groups(sched, len(dims))
    n = start4.shape[0]
    ntiles = n // TILE
    lists, rowtab = SP.select_spec_bricks(
        start4[:, :3].reshape(ntiles, TILE, 3),
        refl4[:, :3].reshape(ntiles, TILE, 3),
        (start4[:, 3] > 0.5).reshape(ntiles, TILE),
        groups, dims, WS, occlusion_falloff=0.03)
    kw = dict(groups=groups, dims=dims, world_size=WS, max_alpha=0.95,
              occlusion_falloff=0.03, tile=TILE)
    out = SP.spec_march_tiles(start4, refl4, lists, rowtab, pages,
                              interpret=True, **kw)
    ref = SP.spec_march_ref(start4, refl4, lists, pages, groups, dims,
                            WS, 0.95, 0.03, tile=TILE)
    return out, ref, (lists, rowtab, pages, groups, dims, kw)


class TestSpecMarch:
    def test_kernel_matches_ref(self):
        mips = _mips()
        start4, refl4 = _rays(4)
        out, ref, _ = _run(mips, start4, refl4, 32)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=4e-2)

    def test_ref_matches_cone_march_oracle(self):
        """Tightly-coherent tiles keep every group at its schedule level,
        where the mirror (and hence the kernel) IS the fs:82-107 march."""
        dim = 32
        mips = _mips(dim)
        start4, refl4 = _rays(4, spread=0.002)
        out, ref, (lists, _, _, groups, dims, _) = _run(
            mips, start4, refl4, dim)
        # most groups at their schedule level (coherence worked)
        lv = np.asarray(lists)[:4, 0:SP.GWORDS * len(groups):SP.GWORDS]
        l0s = np.array([g[0] for g in groups])
        frac_exact = (lv == l0s[None, :]).mean()
        assert frac_exact > 0.8, frac_exact

        sched = _sched(dim)
        color, occ, _ = M.cone_march(
            mips, start4[:, :3], refl4[:, :3], sched, WS,
            max_alpha=0.95, occlusion_falloff=0.03)
        oracle = np.concatenate(
            [np.asarray(color), np.asarray(occ)[:, None]], axis=1)
        ours = np.asarray(out)
        # compare only where every group hit its exact level
        tile_exact = (lv == l0s[None, :]).all(axis=1)
        m = np.repeat(tile_exact, TILE)
        assert m.any()
        np.testing.assert_allclose(ours[m], oracle[m], atol=5e-2)

    def test_miss_pixels_zero(self):
        mips = _mips()
        start4, refl4 = _rays(2, miss_frac=1.0)
        out, _, _ = _run(mips, start4, refl4, 32)
        assert np.abs(np.asarray(out)).max() == 0.0

    def test_early_out_opaque(self):
        """Alpha saturates after the first steps; the early-stop must not
        change the composited result."""
        mips = _mips(opaque=True)
        start4, refl4 = _rays(4, seed=7)
        out, ref, _ = _run(mips, start4, refl4, 32)
        # atol covers pixels whose accumulated alpha sits exactly at the
        # MAX_ALPHA early-out threshold: bf16 vs f32 rounding flips one
        # step's active mask there (a discrete jump, not an error trend)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2, rtol=4e-2)

    def test_gradients_match_ref(self):
        mips = _mips(16)
        start4, refl4 = _rays(2, seed=3)
        _, _, (lists, rowtab, pages, groups, dims, kw) = _run(
            mips, start4, refl4, 16)
        rng = np.random.default_rng(9)
        tgt = jnp.asarray(rng.uniform(0, 1, (2 * TILE, 4)), jnp.float32)

        def loss_k(pg):
            o = SP.spec_march_tiles(start4, refl4, lists, rowtab, pg,
                                    interpret=True, **kw)
            return jnp.sum(o * tgt)

        def loss_r(pg):
            o = SP.spec_march_ref(start4, refl4, lists, pg, groups, dims,
                                  WS, 0.95, 0.03, tile=TILE)
            return jnp.sum(o * tgt)

        gk = jax.grad(loss_k)(pages)
        gr = jax.grad(loss_r)(pages)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=2e-2)
