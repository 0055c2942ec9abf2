"""Baseline JPEG decoder (utils/image.read_jpg) vs Pillow's decode, plus
the end-to-end textured-asset path: OBJ + MTL + PNG/JPG textures from
disk through the CLI renderer — the reference's whole C5 import chain
(Model.h:43-186 + stb_image) in one test."""

import os
import subprocess
import sys

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from vct_tpu.utils.image import read_jpg, write_png  # noqa: E402


def _testcard(h=96, w=120):
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([
        (np.sin(x * 0.2) * 0.5 + 0.5) * 255,
        ((x + y) % 32) / 31 * 255,
        (y / h) * 255], axis=-1)
    return img.astype(np.uint8)


@pytest.mark.parametrize("subsampling,quality", [
    (0, 95),   # 4:4:4
    (1, 85),   # 4:2:2
    (2, 75),   # 4:2:0
])
def test_read_jpg_matches_pillow(tmp_path, subsampling, quality):
    path = str(tmp_path / "t.jpg")
    PIL.fromarray(_testcard()).save(path, quality=quality,
                                    subsampling=subsampling)
    ours = read_jpg(path)
    ref = np.asarray(PIL.open(path).convert("RGB"), np.float32) / 255.0
    assert ours.shape == ref.shape
    # decoders differ in IDCT rounding/upsampling filters; bound closeness
    # decoders differ in chroma upsampling (Pillow triangle-filters,
    # ours pixel-replicates — stb_image's default too) and IDCT rounding
    err = np.abs(ours - ref)
    assert err.mean() < 0.03, err.mean()
    assert np.percentile(err, 99) < 0.15, np.percentile(err, 99)


def test_read_jpg_grayscale_and_restart(tmp_path):
    path = str(tmp_path / "g.jpg")
    g = PIL.fromarray(_testcard()[:, :, 0]).convert("L")
    g.save(path, quality=90, restart_marker_blocks=2)
    ours = read_jpg(path)
    ref = np.asarray(PIL.open(path).convert("RGB"), np.float32) / 255.0
    assert np.abs(ours - ref).mean() < 0.02


def test_textured_obj_end_to_end(tmp_path):
    """Write OBJ + MTL + PNG + JPG textures, render through the CLI."""
    tex_png = str(tmp_path / "wall.png")
    write_png(tex_png, np.tile(
        np.asarray([[200, 40, 40], [40, 40, 200]], np.uint8)[:, None, :],
        (8, 16, 1)).reshape(16, 16, 3))
    tex_jpg = str(tmp_path / "floor.jpg")
    PIL.fromarray(_testcard(64, 64)).save(tex_jpg, quality=92)

    (tmp_path / "scene.mtl").write_text(
        "newmtl wall\nKd 1 1 1\nmap_Kd wall.png\n"
        "newmtl floor\nKd 1 1 1\nmap_Kd floor.jpg\n")
    (tmp_path / "scene.obj").write_text(
        "mtllib scene.mtl\n"
        "v -60 -20 -60\nv 60 -20 -60\nv 60 -20 60\nv -60 -20 60\n"
        "v -60 40 -60\nv 60 40 -60\n"
        "vt 0 0\nvt 4 0\nvt 4 4\nvt 0 4\n"
        "vn 0 1 0\nvn 0 0 1\n"
        "usemtl floor\n"
        "f 1/1/1 2/2/1 3/3/1\nf 1/1/1 3/3/1 4/4/1\n"
        "usemtl wall\n"
        "f 1/1/2 2/2/2 6/3/2\nf 1/1/2 6/3/2 5/4/2\n")

    from vct_tpu.scene.obj import load_obj
    scene = load_obj(str(tmp_path / "scene.obj"))
    assert len(scene.materials) == 2
    kd = [m.albedo_texture for m in scene.materials]
    assert all(t is not None for t in kd)

    out = str(tmp_path / "r.png")
    env = dict(os.environ)
    cp = subprocess.run(
        [sys.executable, "-m", "vct_tpu", "render", "--scene",
         str(tmp_path / "scene.obj"), "--dim", "32", "--width", "96",
         "--height", "64", "--out", out, "--cpu"],
        env=env, capture_output=True, text=True, timeout=600)
    assert cp.returncode == 0, cp.stdout + cp.stderr
    from vct_tpu.utils.image import read_png
    img = read_png(out)
    assert img.shape[:2] == (64, 96)
    assert img.max() > 10          # something rendered
