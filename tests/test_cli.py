"""CLI driver (vct_tpu/cli.py) — the main.cpp-equivalent app layer."""

import os

import numpy as np
import pytest

from vct_tpu import cli
from vct_tpu.utils import image as I


SMALL = ["--dim", "16", "--width", "32", "--height", "24"]


class TestCLI:
    def test_render_cornell(self, tmp_path):
        out = str(tmp_path / "img.png")
        cli.main(["render", *SMALL, "--out", out])
        img = I.read_png(out)
        assert img.shape == (24, 32, 3)
        assert img.mean() > 1.0          # something lit

    def test_render_atrium(self, tmp_path):
        out = str(tmp_path / "atrium.png")
        cli.main(["render", "--scene", "atrium", *SMALL,
                  "--camera", "48,-10,0", "--yaw", "180", "--out", out])
        img = I.read_png(out)
        assert img.shape == (24, 32, 3)
        assert img.mean() > 1.0

    def test_debug_dump(self, tmp_path):
        out_dir = str(tmp_path / "dbg")
        cli.main(["debug", *SMALL, "--out-dir", out_dir])
        for f in ("voxel_mip0.png", "occupancy.png", "light_volume.png",
                  "gbuffer_depth.png", "gbuffer_normal.png"):
            assert os.path.exists(os.path.join(out_dir, f)), f

    def test_orbit(self, tmp_path):
        out_dir = str(tmp_path / "orbit")
        cli.main(["orbit", *SMALL, "--frames", "2", "--out-dir", out_dir])
        assert os.path.exists(os.path.join(out_dir, "frame_001.png"))


class TestAtriumScene:
    def test_structure(self):
        from vct_tpu.scene.atrium import atrium
        s = atrium()
        assert s.num_triangles > 500
        assert len(s.materials) == 8
        # textured slots exercised: albedo, height (bump), mask
        assert s.materials[0].albedo_texture is not None
        assert s.materials[0].height_texture is not None
        assert s.materials[4].mask_texture is not None
        # fits inside the default 150-unit grid
        assert np.abs(s.positions).max() < 75.0
