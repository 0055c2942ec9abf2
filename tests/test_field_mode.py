"""Field-mode GI (direction-basis dense marches) vs the percone oracle:
close everywhere, and the dense building blocks are exactly the oracle at
voxel centers (tests/test_dense.py covers that exactness)."""

import dataclasses

import numpy as np
import pytest

from vct_tpu.config import preset, GridConfig
from vct_tpu.core import camera as cameralib
from vct_tpu.render import renderer as R
from vct_tpu.scene import cornell_box


@pytest.fixture(scope="module")
def renders():
    scene = cornell_box(100.0)
    camera = cameralib.Camera(position=(0.0, 0.0, 140.0))
    base = preset("cornell64_full")
    base = dataclasses.replace(
        base, grid=GridConfig(dim=32),
        render=dataclasses.replace(base.render, width=64, height=64))
    out = {}
    for mode in ("percone", "field"):
        cfg = dataclasses.replace(
            base, cones=dataclasses.replace(
                base.cones, diffuse_mode=mode, specular_mode=mode))
        out[mode] = R.render_image(cfg, scene, camera)
    return out


def test_field_close_to_percone(renders):
    d = np.abs(renders["percone"] - renders["field"])
    assert d.mean() < 0.02
    assert np.percentile(d, 95) < 0.08


def test_field_finite_plausible(renders):
    img = renders["field"]
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    assert 0.01 < img.mean() < 1.0
