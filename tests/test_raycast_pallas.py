"""Pallas raycast kernel (ops/raycast_pallas.py) vs the XLA pinhole path:
same hits, same t, same interpolated G-buffer attributes."""

import jax.numpy as jnp
import numpy as np
import pytest

from vct_tpu.core import camera as cameralib
from vct_tpu.ops import raycast_pallas as RP
from vct_tpu.render import gbuffer as GB
from vct_tpu.scene.atrium import atrium
from vct_tpu.scene.cornell import cornell_box


@pytest.fixture(scope="module")
def setup():
    scene = atrium()
    ds = GB.DeviceScene.from_scene(scene)
    cam = cameralib.Camera(position=(48.0, -10.0, 0.0), yaw=180.0)
    origins, dirs = cameralib.primary_rays(cam, 64, 32)
    return ds, origins.reshape(-1, 3), dirs.reshape(-1, 3)


def _ref_gbuffer(ds, o, d):
    pc = GB.pinhole_constants(ds, o[0])
    return GB.raycast_chunk_pinhole(ds, pc, o[0], d)


class TestRaycastPallas:
    def test_matches_xla_pinhole(self, setup):
        ds, o, d = setup
        ref = _ref_gbuffer(ds, o, d)
        out = RP.raycast_pinhole_pallas(ds, o[0], d, interpret=True)
        hit = np.asarray(ref.hit)
        np.testing.assert_array_equal(hit, np.asarray(out.hit))
        assert hit.any() and not hit.all()
        np.testing.assert_allclose(
            np.asarray(out.t)[hit], np.asarray(ref.t)[hit],
            rtol=1e-5, atol=1e-5)
        for name in ("position", "normal", "geo_normal", "tangent",
                     "bitangent", "uv"):
            np.testing.assert_allclose(
                np.asarray(getattr(out, name))[hit],
                np.asarray(getattr(ref, name))[hit],
                rtol=1e-4, atol=1e-4, err_msg=name)
        np.testing.assert_array_equal(
            np.asarray(out.material)[hit], np.asarray(ref.material)[hit])

    def test_nonmultiple_ray_count(self, setup):
        """Ray counts that don't divide TILE are padded and trimmed."""
        ds, o, d = setup
        n = RP.TILE + 17
        ref = _ref_gbuffer(ds, o[:n], d[:n])
        out = RP.raycast_pinhole_pallas(ds, o[0], d[:n], interpret=True)
        assert out.hit.shape == (n,)
        np.testing.assert_array_equal(np.asarray(ref.hit),
                                      np.asarray(out.hit))
        hit = np.asarray(ref.hit)
        np.testing.assert_allclose(
            np.asarray(out.t)[hit], np.asarray(ref.t)[hit],
            rtol=1e-5, atol=1e-5)

    def test_cornell_interior(self):
        """Every ray from inside the closed box must hit; positions match."""
        scene = cornell_box(size=100.0)
        ds = GB.DeviceScene.from_scene(scene)
        # slightly off-axis: a perfectly centered camera sends corner rays
        # exactly through box edges, where u/v >= 0 resolves differently
        # under different (equally valid) f32 accumulation orders
        cam = cameralib.Camera(position=(3.0, 2.0, 40.0))
        origins, dirs = cameralib.primary_rays(cam, 32, 16)
        o = origins.reshape(-1, 3)
        d = dirs.reshape(-1, 3)
        ref = _ref_gbuffer(ds, o, d)
        out = RP.raycast_pinhole_pallas(ds, o[0], d, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.hit),
                                      np.asarray(out.hit))
        hit = np.asarray(ref.hit)
        assert hit.mean() > 0.9
        np.testing.assert_allclose(
            np.asarray(out.position)[hit], np.asarray(ref.position)[hit],
            rtol=1e-4, atol=1e-3)


def test_bwd_chunked_equals_whole(setup, monkeypatch):
    """The chunked backward replay (BWD_CHUNK ray blocks, VERDICT r4
    item 8) accumulates EXACTLY the whole-batch attribute gradient —
    per-ray contributions are independent and additive."""
    import jax

    ds, o, d = setup
    isect, attrs, _ = RP.pack_tables(ds, o[0])
    n = (d.shape[0] // RP.TILE) * RP.TILE
    dd = jnp.asarray(d[:n])
    rng = np.random.default_rng(0)
    bar = jnp.asarray(rng.uniform(-1, 1, (n, RP.NOUT)), jnp.float32)

    def loss(at, chunk):
        monkeypatch.setattr(RP, "BWD_CHUNK", chunk)
        out = RP.raycast_gbuf24(dd, o[0], isect, at, interpret=True)
        return jnp.sum(out * bar)

    g_whole = jax.grad(lambda at: loss(at, n + 1))(attrs)
    jax.clear_caches()      # same jit signature, different closed-over chunking
    g_chunk = jax.grad(lambda at: loss(at, RP.TILE))(attrs)
    assert n > RP.TILE      # the chunked path actually chunks
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_whole),
                               rtol=1e-5, atol=1e-5)
