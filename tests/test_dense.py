"""Direction-major dense march vs the per-point oracle: EXACT at voxel
centers (same schedule, same composite, same trilinear semantics)."""

import jax.numpy as jnp
import numpy as np

from vct_tpu.core import dense as D
from vct_tpu.core import grid as G
from vct_tpu.core import march as M


def make_mips(dim=32, seed=0, sparse=True):
    rng = np.random.default_rng(seed)
    base = np.zeros((dim, dim, dim, 4), np.float32)
    if sparse:
        for _ in range(60):
            i, j, k = rng.integers(2, dim - 2, size=3)
            base[i, j, k] = [*rng.uniform(0.2, 1.0, 3), rng.uniform(0.3, 1.0)]
    else:
        base[:] = rng.uniform(0, 0.4, size=base.shape)
    return G.build_mips(jnp.asarray(base))


class TestSampleShifted:
    def test_zero_shift_identity(self):
        mips = make_mips(16, sparse=False)
        out = D.sample_shifted(mips[0], 16, (0.0, 0.0, 0.0))
        np.testing.assert_allclose(out, mips[0], atol=1e-6)

    def test_integer_shift_is_slice(self):
        mips = make_mips(16, sparse=False)
        out = D.sample_shifted(mips[0], 16, (3.0, 0.0, 0.0))
        ref = np.asarray(mips[0])
        np.testing.assert_allclose(out[:12], ref[3:15], atol=1e-6)
        # clamp at the far edge
        np.testing.assert_allclose(out[13], ref[15], atol=1e-6)

    def test_matches_pointwise_trilinear(self):
        ws, dim = 150.0, 16
        mips = make_mips(dim, sparse=False)
        shift_world = np.array([3.7, -1.2, 0.9])
        out = D.sample_shifted(mips[0], dim, shift_world / (ws / dim))
        # oracle: trilinear at every center + offset
        idx = np.stack(np.meshgrid(*[np.arange(dim)] * 3, indexing="ij"), -1)
        centers = (idx + 0.5) / dim * ws - ws / 2
        uvw = G.world_to_uvw(jnp.asarray(centers + shift_world, jnp.float32),
                             ws)
        ref = G.trilinear_sample(mips[0], uvw)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    def test_cross_resolution(self):
        # field at 16^3 sampling the 8^3 mip level
        ws, dim = 150.0, 16
        mips = make_mips(dim, sparse=False)
        out = D.sample_shifted(mips[1], dim, (0.45, 0.0, -0.3))
        idx = np.stack(np.meshgrid(*[np.arange(dim)] * 3, indexing="ij"), -1)
        centers = (idx + 0.5) / dim * ws - ws / 2
        shift_world = np.array([0.45, 0.0, -0.3]) * (ws / 8)
        uvw = G.world_to_uvw(jnp.asarray(centers + shift_world, jnp.float32),
                             ws)
        ref = G.trilinear_sample(mips[1], uvw)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestDirectionalMarch:
    def _centers(self, dim, ws):
        idx = np.stack(np.meshgrid(*[np.arange(dim)] * 3, indexing="ij"), -1)
        return (idx + 0.5) / dim * ws - ws / 2

    def test_exact_at_voxel_centers(self):
        ws, dim = 150.0, 16
        mips = make_mips(dim, seed=3)
        sched = M.march_schedule(0.577, ws / dim, 75.0)
        for dirv in ([0.0, 0.0, 1.0], [0.6, -0.64, 0.48]):
            dirv = np.asarray(dirv)
            dirv = dirv / np.linalg.norm(dirv)
            field = D.directional_march(mips, dirv, sched, ws)
            centers = jnp.asarray(self._centers(dim, ws), jnp.float32)
            d = jnp.broadcast_to(jnp.asarray(dirv, jnp.float32),
                                 centers.shape)
            color, occ, _ = M.cone_march(mips, centers, d, sched, ws)
            np.testing.assert_allclose(field[..., :3], color, rtol=1e-4,
                                       atol=1e-5)
            np.testing.assert_allclose(field[..., 3], occ, rtol=1e-4,
                                       atol=1e-5)

    def test_transmittance_matches_shadow_value(self):
        ws, dim = 150.0, 16
        mips = make_mips(dim, seed=4)
        sched = M.march_schedule(0.03, ws / dim, ws, step_factor=0.5)
        dirv = np.array([0.0, 0.97014254, 0.24253564], np.float32)
        vol = D.directional_march(mips, dirv, sched, ws, opacity_gain=4.0,
                                  transmittance_only=True)
        # oracle: same formula, per point
        centers = jnp.asarray(self._centers(dim, ws), jnp.float32)
        dists = jnp.asarray(sched.dists)
        pts = centers[..., None, :] + dists[:, None] * jnp.asarray(dirv)
        samples = M.sample_schedule(mips, pts, sched.lods, ws)
        a = jnp.minimum(samples[..., 3] * 4.0, 1.0)
        ref = jnp.prod((1.0 - a) ** 0.5, axis=-1)
        np.testing.assert_allclose(vol[..., 0], ref, rtol=1e-4, atol=1e-5)

    def test_half_res_field_shape(self):
        ws, dim = 150.0, 16
        mips = make_mips(dim)
        sched = M.march_schedule(0.577, ws / dim, 75.0)
        field = D.directional_march(mips, [0, 0, 1.0], sched, ws, field_dim=8)
        assert field.shape == (8, 8, 8, 4)


class TestBasis:
    def test_basis_unit_norm(self):
        for n in (6, 26):
            b = D.direction_basis(n)
            assert b.shape == (n, 3)
            np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1.0,
                                       atol=1e-6)

    def test_weights_partition_of_unity(self):
        b = D.direction_basis(26)
        rng = np.random.default_rng(0)
        d = rng.normal(size=(100, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        w = D.basis_weights(jnp.asarray(d, jnp.float32), b)
        np.testing.assert_allclose(np.sum(np.asarray(w), -1), 1.0, atol=1e-5)

    def test_weights_peak_at_basis_dir(self):
        b = D.direction_basis(26)
        w = D.basis_weights(jnp.asarray(b[7]), b, power=8.0)
        assert int(jnp.argmax(w)) == 7
