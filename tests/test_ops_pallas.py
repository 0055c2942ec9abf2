"""Parity tests: the mip-reduction Pallas kernels vs their jnp oracles.

On the CPU test backend the kernels run in interpreter mode
(ops/*: _interpret()), so the exact kernel bodies are exercised; the same
code compiles via Mosaic on TPU (checked on hardware by bench.py).
The per-pixel cone-march and material/tap/raycast/prepass kernels have
their own parity suites (test_specmarch_pallas, test_material_pallas,
test_tap_pallas, test_raycast_*, test_prepass_pallas).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.core import grid as G
from vct_tpu.ops import build_mips_pallas, downsample2x_pallas


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
