"""Parity tests: Pallas kernels vs their pure-jax.numpy oracles.

On the CPU test backend the kernels run in interpreter mode
(ops/*: _interpret()), so the exact kernel bodies are exercised; the same
code compiles via Mosaic on TPU (checked on hardware by bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.core import grid as G
from vct_tpu.core import march as M
from vct_tpu.ops import (build_mips_pallas, cone_march_pallas,
                         downsample2x_pallas, splat_pallas)
from vct_tpu.render.voxelize import splat


def _rand_grid(rng, d, c=4):
    g = rng.uniform(0.0, 1.0, (d, d, d, c)).astype(np.float32)
    # sparse-ish occupancy like a real scene
    g[..., -1] = (g[..., -1] > 0.7).astype(np.float32) * rng.uniform(
        0.3, 1.0, (d, d, d))
    return jnp.asarray(g)


# ---------------------------------------------------------------- mips ----

@pytest.mark.parametrize("mode", ["mean", "max"])
@pytest.mark.parametrize("d", [32, 64])
def test_mip_reduce_parity(mode, d):
    rng = np.random.default_rng(0)
    g = _rand_grid(rng, d)
    got = downsample2x_pallas(g, alpha_mode=mode)
    want = G.downsample2x(g, alpha_mode=mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_mip_chain_parity():
    rng = np.random.default_rng(1)
    g = _rand_grid(rng, 64)
    got = build_mips_pallas(g, num_levels=5, alpha_mode="max")
    want = G.build_mips(g, num_levels=5, alpha_mode="max")
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_mip_small_dims_fall_back():
    rng = np.random.default_rng(2)
    g = _rand_grid(rng, 8)
    got = downsample2x_pallas(g)
    want = G.downsample2x(g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


# --------------------------------------------------------- cone march ----

def _march_setup(d=32, ws=150.0, tan=0.577, seed=3, n=64):
    rng = np.random.default_rng(seed)
    mips = G.build_mips(_rand_grid(rng, d), num_levels=4)
    sched = M.march_schedule(tan, ws / d, ws / 2.0)
    start = rng.uniform(-0.3 * ws, 0.3 * ws, (n, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    return mips, sched, jnp.asarray(start), jnp.asarray(dirs), ws


@pytest.mark.parametrize("tan", [0.577, 0.07])
def test_cone_march_forward_parity(tan):
    mips, sched, start, dirs, ws = _march_setup(tan=tan)
    c0, o0, a0 = M.cone_march(mips, start, dirs, sched, ws)
    c1, o1, a1 = cone_march_pallas(mips, start, dirs, sched, ws)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0),
                               rtol=1e-5, atol=1e-5)


def test_cone_march_pyramid_gradient_parity():
    """d(loss)/d(mip levels) matches jax.grad of the jnp oracle."""
    mips, sched, start, dirs, ws = _march_setup(d=16, n=32)

    def loss_ref(mips):
        c, o, a = M.cone_march(mips, start, dirs, sched, ws)
        return (jnp.sum(c * jnp.array([1.0, 2.0, 3.0]))
                + 0.5 * jnp.sum(o) + 0.25 * jnp.sum(a))

    def loss_pal(mips):
        c, o, a = cone_march_pallas(mips, start, dirs, sched, ws)
        return (jnp.sum(c * jnp.array([1.0, 2.0, 3.0]))
                + 0.5 * jnp.sum(o) + 0.25 * jnp.sum(a))

    g_ref = jax.grad(lambda ms: loss_ref(tuple(ms)))(list(mips))
    g_pal = jax.grad(lambda ms: loss_pal(tuple(ms)))(list(mips))
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_cone_march_opaque_sample_gradients():
    """a == 1 voxels (binary occupancy) must differentiate correctly."""
    d, ws = 16, 150.0
    g = np.zeros((d, d, d, 4), np.float32)
    g[6:10, 6:10, 6:10] = [0.5, 0.25, 0.1, 1.0]   # fully opaque block
    mips = G.build_mips(jnp.asarray(g), num_levels=3)
    sched = M.march_schedule(0.577, ws / d, ws / 2.0)
    start = jnp.asarray([[-40.0, 0.0, 0.0]], jnp.float32)
    dirs = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)

    def loss(fn, mips):
        c, o, a = fn(mips, start, dirs, sched, ws)
        return jnp.sum(c) + jnp.sum(o) + jnp.sum(a)

    g_ref = jax.grad(lambda ms: loss(M.cone_march, tuple(ms)))(list(mips))
    g_pal = jax.grad(
        lambda ms: loss(cone_march_pallas, tuple(ms)))(list(mips))
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_cone_march_jit_and_padding():
    mips, sched, start, dirs, ws = _march_setup(n=77)   # non-multiple of 128
    fn = jax.jit(lambda s, d: cone_march_pallas(mips, s, d, sched, ws))
    c1, o1, a1 = fn(start, dirs)
    c0, o0, a0 = M.cone_march(mips, start, dirs, sched, ws)
    assert c1.shape == (77, 3)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c0),
                               rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------ scatter ----

def test_splat_parity():
    rng = np.random.default_rng(5)
    dim, ws = 32, 150.0
    s = 2000
    pos = rng.uniform(-80.0, 80.0, (s, 3)).astype(np.float32)  # some outside
    vals = rng.uniform(0.0, 1.0, (s, 3)).astype(np.float32)
    w = jnp.ones((s,), jnp.float32)
    got = splat_pallas(pos, jnp.asarray(vals), w, dim, ws)
    want = splat(jnp.asarray(pos), jnp.asarray(vals), w, dim, ws,
                 mode="mean")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_splat_weight_zero_drops():
    rng = np.random.default_rng(6)
    dim, ws = 16, 100.0
    pos = rng.uniform(-40.0, 40.0, (64, 3)).astype(np.float32)
    vals = rng.uniform(0.0, 1.0, (64, 3)).astype(np.float32)
    w = np.ones((64,), np.float32)
    w[::2] = 0.0
    got = splat_pallas(pos, jnp.asarray(vals), jnp.asarray(w), dim, ws)
    want = splat(jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(w),
                 dim, ws, mode="mean")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
