"""The parallel cone march vs a literal sequential transliteration of the
GLSL loop (VoxelConeTracing.fs:82-107), plus closed-form schedule checks."""

import math

import jax.numpy as jnp
import numpy as np

from vct_tpu.core import grid as G
from vct_tpu.core import march as M


def sequential_cone_trace(mips, start, direction, tan_half, ws, dim,
                          max_distance=75.0, max_alpha=0.95, falloff=0.03):
    """Direct numpy transliteration of the while loop in fs:82-107 (oracle)."""
    voxel = ws / dim
    dist = voxel
    color = np.zeros(3)
    alpha = 0.0
    occlusion = 0.0
    while dist < max_distance and alpha < max_alpha:
        diameter = max(voxel, 2.0 * tan_half * dist)
        lod = math.log2(diameter / voxel)
        p = start + dist * direction
        c = np.asarray(G.sample_lod(mips, G.world_to_uvw(jnp.asarray(p), ws),
                                    lod))
        color += (1.0 - alpha) * c[:3]
        occlusion += (1.0 - alpha) * c[3] / (1.0 + falloff * diameter)
        alpha += (1.0 - alpha) * c[3]
        dist += diameter
    return color, occlusion, alpha


class TestSchedule:
    def test_recurrence_matches_loop(self):
        ws, dim = 150.0, 128
        v = ws / dim
        s = M.march_schedule(0.577, v, 75.0)
        # transliterate the loop independently
        dist, k = v, 0
        while dist < 75.0:
            diam = max(v, 2 * 0.577 * dist)
            assert abs(s.dists[k] - dist) < 1e-9
            assert abs(s.diameters[k] - diam) < 1e-9
            assert abs(s.lods[k] - math.log2(diam / v)) < 1e-9
            dist += diam
            k += 1
        assert s.num_steps == k

    def test_step_counts_log_bounded(self):
        v = 150.0 / 128
        diff = M.march_schedule(0.577, v, 75.0)
        spec = M.march_schedule(0.07, v, 75.0)
        # geometric growth (1+2t) per step once diameter > voxel
        assert 5 <= diff.num_steps <= 12
        assert 15 <= spec.num_steps <= 45
        assert spec.num_steps > diff.num_steps

    def test_first_step_lod_zero(self):
        v = 150.0 / 128
        s = M.march_schedule(0.07, v, 75.0)
        assert s.lods[0] == 0.0  # diameter clamped up to voxel size near origin

    def test_max_steps_cap(self):
        v = 150.0 / 128
        s = M.march_schedule(0.07, v, 75.0, max_steps=10)
        assert s.num_steps == 10


class TestComposite:
    def test_matches_sequential_accumulation(self):
        rng = np.random.default_rng(0)
        k = 12
        colors = rng.uniform(size=(k, 3)).astype(np.float32)
        alphas = rng.uniform(0, 0.4, size=(k,)).astype(np.float32)
        diams = rng.uniform(0.5, 5.0, size=(k,)).astype(np.float32)
        # sequential oracle (loop-top early-out)
        c = np.zeros(3)
        a = 0.0
        o = 0.0
        for i in range(k):
            if a >= 0.95:
                break
            c += (1 - a) * colors[i]
            o += (1 - a) * alphas[i] / (1 + 0.03 * diams[i])
            a += (1 - a) * alphas[i]
        color, occ, alpha = M.composite(
            jnp.asarray(colors), jnp.asarray(alphas), tuple(diams))
        np.testing.assert_allclose(color, c, rtol=1e-5)
        np.testing.assert_allclose(occ, o, rtol=1e-5)
        np.testing.assert_allclose(alpha, a, rtol=1e-5)

    def test_early_out_exact(self):
        # alpha saturates at step 1 -> steps >=2 must contribute nothing
        colors = jnp.ones((5, 3))
        alphas = jnp.array([0.9, 0.9, 0.9, 0.9, 0.9])
        color, occ, alpha = M.composite(colors, alphas, (1.0,) * 5)
        # step0: w=1; step1: alpha=0.9<0.95 so runs, w=0.1; step2: alpha=0.99 stop
        np.testing.assert_allclose(color, [1.1, 1.1, 1.1], rtol=1e-6)
        np.testing.assert_allclose(alpha, 0.99, rtol=1e-6)

    def test_opaque_first_step(self):
        colors = jnp.asarray(np.random.default_rng(1).uniform(size=(4, 3)),
                             jnp.float32)
        alphas = jnp.array([1.0, 0.5, 0.5, 0.5])
        color, occ, alpha = M.composite(colors, alphas, (2.0,) * 4)
        np.testing.assert_allclose(color, colors[0], rtol=1e-6)
        np.testing.assert_allclose(alpha, 1.0, rtol=1e-6)
        np.testing.assert_allclose(occ, 1.0 / 1.06, rtol=1e-5)


class TestConeMarch:
    def setup_method(self):
        rng = np.random.default_rng(42)
        dim, ws = 32, 150.0
        base = np.zeros((dim, dim, dim, 4), np.float32)
        # a few emissive occupied blobs
        for _ in range(40):
            i, j, l = rng.integers(4, dim - 4, size=3)
            base[i, j, l] = [*rng.uniform(0.2, 1.0, 3), rng.uniform(0.3, 1.0)]
        self.mips = G.build_mips(jnp.asarray(base))
        self.ws, self.dim = ws, dim

    def _check(self, tan_half):
        rng = np.random.default_rng(7)
        sched = M.march_schedule(tan_half, self.ws / self.dim, 75.0)
        starts = rng.uniform(-40, 40, size=(6, 3)).astype(np.float32)
        dirs = rng.normal(size=(6, 3)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        color, occ, alpha = M.cone_march(
            self.mips, jnp.asarray(starts), jnp.asarray(dirs), sched, self.ws)
        for i in range(len(starts)):
            c, o, a = sequential_cone_trace(
                self.mips, starts[i], dirs[i], tan_half, self.ws, self.dim)
            np.testing.assert_allclose(color[i], c, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(occ[i], o, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(alpha[i], a, rtol=1e-4, atol=1e-5)

    def test_diffuse_aperture(self):
        self._check(0.577)

    def test_specular_aperture(self):
        self._check(0.07)

    def test_empty_grid_traces_zero(self):
        mips = G.build_mips(jnp.zeros((16, 16, 16, 4)))
        sched = M.march_schedule(0.577, 150.0 / 16, 75.0)
        color, occ, alpha = M.cone_march(
            mips, jnp.zeros((2, 3)), jnp.asarray([[0, 0, 1.0], [1.0, 0, 0]]),
            sched, 150.0)
        np.testing.assert_allclose(color, 0.0)
        np.testing.assert_allclose(alpha, 0.0)

    def test_multi_cone_weighted_sum(self):
        from vct_tpu.core import cones as C
        sched = M.march_schedule(0.577, self.ws / self.dim, 75.0)
        start = jnp.asarray(np.random.default_rng(3).uniform(-30, 30, (4, 3)),
                            jnp.float32)
        n = jnp.tile(jnp.asarray([0.0, 1.0, 0.0]), (4, 1))
        t, bt = C.orthonormal_frame(n)
        tbn = C.tbn_matrix(t, bt, n)
        dirs = C.rotate_cones(tbn, jnp.asarray(C.CONE_DIRECTIONS))
        color, occ = M.cone_march_multi(
            self.mips, start, dirs, tuple(C.CONE_WEIGHTS), sched, self.ws)
        # oracle: accumulate per-cone traces
        exp_c = np.zeros((4, 3))
        exp_o = np.zeros(4)
        for i in range(6):
            c, o, _ = M.cone_march(self.mips, start, dirs[:, i, :], sched,
                                   self.ws)
            exp_c += C.CONE_WEIGHTS[i] * np.asarray(c)
            exp_o += C.CONE_WEIGHTS[i] * np.asarray(o)
        np.testing.assert_allclose(color, exp_c, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(occ, exp_o, rtol=1e-4, atol=1e-6)
