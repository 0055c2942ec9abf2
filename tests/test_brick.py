"""Brick-sharded dense march vs the replicated oracle — parallel/brick.py.

Runs on the 8-virtual-CPU-device mesh (conftest).  The north-star parity:
sharded == replicated allclose, including when fine levels genuinely
shard with halo exchange (SURVEY.md §2.4 TP row).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.core import dense as D
from vct_tpu.core import grid as G
from vct_tpu.core import march as M
from vct_tpu.parallel import brick as B
from vct_tpu.parallel import mesh as meshlib



import pytest as _pytest
pytestmark = _pytest.mark.slow   # heavy integration file: excluded from the fast lane (pytest -m "not slow")

def make_mips(dim=32, seed=0):
    rng = np.random.default_rng(seed)
    base = np.zeros((dim, dim, dim, 4), np.float32)
    for _ in range(80):
        i, j, k = rng.integers(1, dim - 1, size=3)
        base[i, j, k] = [*rng.uniform(0.2, 1.0, 3), rng.uniform(0.3, 1.0)]
    return G.build_mips(jnp.asarray(base))


@pytest.fixture(scope="module")
def mesh4():
    return meshlib.make_mesh(n_data=2, n_model=4)


DIRS = np.asarray([
    [0.0, 0.0, 1.0],
    [1.0, 0.0, 0.0],           # along the sharded axis — worst case
    [0.6, -0.64, 0.48],
])
DIRS = DIRS / np.linalg.norm(DIRS, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def march_pair(mesh4):
    """One sharded + one replicated gather march, shared by the parity,
    sharding-spec, and placement assertions (suite wall-time, VERDICT r2
    weak #5)."""
    ws, dim = 150.0, 32
    mips = make_mips(dim, seed=1)
    sched = M.march_schedule(0.577, ws / dim, 75.0, 12)
    ref = D.directional_march_multi(mips, DIRS, sched, ws)
    out = B.sharded_directional_march_multi(
        mips, DIRS, sched, ws, mesh4, min_shard_rows=4)
    return ref, out


class TestShardedMarchParity:
    def test_gather_march_matches_replicated(self, march_pair):
        ref, out = march_pair
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_fine_level_actually_sharded(self, mesh4):
        """With min_shard_rows=4 at 32^3/4-way, level 0 (32 rows -> 8/shard)
        must shard: verify the halo/shard decision, not just the fallback."""
        ws, dim = 150.0, 32
        mips = make_mips(dim)
        sched = M.march_schedule(0.577, ws / dim, 75.0)
        plan, groups = D.plan_groups(sched.lods, len(mips))
        touch0 = [k for k, (l0, l1, w) in enumerate(plan)
                  if l0 == 0 or (w > 0 and l1 == 0)]
        h = B._halo_for_level(DIRS, sched.dists, touch0, dim, ws)
        assert h + 1 <= dim // 4, (h, "halo would force fallback")

    def test_transmittance_volume_matches(self, mesh4):
        """The sharded light-volume build (shadow cones) == replicated."""
        ws, dim = 150.0, 32
        mips = make_mips(dim, seed=2)
        # wider shadow cone so level 0 shards at this toy size
        sched = M.march_schedule(0.2, ws / dim, ws, 12, step_factor=0.5)
        dirv = np.asarray([[0.0, 0.97014254, 0.24253564]])
        ref = D.directional_march_multi(
            mips, dirv, sched, ws, opacity_gain=4.0, transmittance_only=True)
        out = B.sharded_directional_march_multi(
            mips, dirv, sched, ws, mesh4, opacity_gain=4.0,
            transmittance_only=True, min_shard_rows=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_output_sharding(self, march_pair):
        _, out = march_pair
        spec = out.sharding.spec
        assert spec[1] == "model", spec

    def test_gradient_flows_through_halo_exchange(self, mesh4):
        ws, dim = 150.0, 16
        mips = make_mips(dim, seed=4)
        sched = M.march_schedule(0.577, ws / dim, 75.0, 8)

        def loss(lvl0):
            stack = (lvl0,) + tuple(mips[1:])
            out = B.sharded_directional_march_multi(
                stack, DIRS[:2], sched, ws, mesh4, min_shard_rows=2)
            return jnp.sum(out)

        g = jax.grad(loss)(mips[0])
        assert np.isfinite(np.asarray(g)).all()
        ref = jax.grad(lambda l: jnp.sum(D.directional_march_multi(
            (l,) + tuple(mips[1:]), DIRS[:2], sched, ws)))(mips[0])
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref),
                                   rtol=1e-3, atol=1e-4)


class TestShardMips:
    def test_placement(self, mesh4):
        mips = make_mips(32)
        placed = B.shard_mips(mesh4, mips, n_min_rows=4)
        assert placed[0].sharding.spec[0] == "model"       # 32 rows: sharded
        assert placed[-1].sharding.spec == ()  # 1^3: replicated


class TestRendererIntegration:
    """VERDICT round-1 item 2: full build_voxel_state with brick sharding
    == the replicated build, end to end on the fake mesh."""

    def _setup(self, brick_parallel):
        import dataclasses
        from vct_tpu.config import preset
        from vct_tpu.render import renderer as R
        from vct_tpu.scene.cornell import cornell_box

        cfg = preset("sponza256")
        cfg = dataclasses.replace(
            cfg,
            grid=dataclasses.replace(cfg.grid, dim=32, compute="float32"),
            cones=dataclasses.replace(cfg.cones, field_dim=32,
                                      field_basis=6, num_diffuse_cones=2),
            sharding=dataclasses.replace(
                cfg.sharding, data_parallel=8 // brick_parallel,
                brick_parallel=brick_parallel),
        )
        scene = cornell_box(size=100.0)
        ds, mats, samples = R.prepare_scene(cfg, scene)
        return cfg, R, samples, mats

    @pytest.fixture(scope="class")
    def builds(self):
        """ONE sharded + ONE replicated + ONE staged build, shared by all
        integration assertions (each build dominates wall time)."""
        import dataclasses
        cfg, R, samples, mats = self._setup(brick_parallel=4)
        mesh = meshlib.make_mesh_for(cfg)
        sharded = R.build_voxel_state(cfg, samples, mats, mesh=mesh)
        staged = R.build_voxel_state_staged(cfg, samples, mats, mesh=mesh)
        cfg_rep = dataclasses.replace(
            cfg, sharding=dataclasses.replace(cfg.sharding,
                                              brick_parallel=1))
        rep = R.build_voxel_state(cfg_rep, samples, mats)
        return sharded, staged, rep

    def test_build_voxel_state_sharded_matches_replicated(self, builds):
        sharded, _, rep = builds
        np.testing.assert_allclose(
            np.asarray(sharded.light_volume), np.asarray(rep.light_volume),
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(sharded.diffuse_field), np.asarray(rep.diffuse_field),
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(sharded.specular_field),
            np.asarray(rep.specular_field), rtol=2e-5, atol=2e-5)

    def test_sharded_outputs_are_model_sharded(self, builds):
        sharded, _, _ = builds
        spec = sharded.light_volume.sharding.spec
        assert "model" in str(spec), spec

    def test_staged_build_matches(self, builds):
        sharded, staged, _ = builds
        np.testing.assert_allclose(np.asarray(sharded.diffuse_field),
                                   np.asarray(staged.diffuse_field),
                                   rtol=1e-5, atol=1e-5)

    def test_anisotropic_raises(self):
        import dataclasses
        cfg, R, samples, mats = self._setup(brick_parallel=4)
        cfg = dataclasses.replace(
            cfg, grid=dataclasses.replace(cfg.grid, anisotropic=True))
        mesh = meshlib.make_mesh_for(cfg)
        with pytest.raises(NotImplementedError):
            R.build_voxel_state(cfg, samples, mats, mesh=mesh)
