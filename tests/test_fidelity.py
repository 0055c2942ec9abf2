"""Operating-point GI fidelity gate (VERDICT r3 item 4): fails if the
sponza256 fast path's fidelity vs the exact percone oracle regresses.

TPU-gated (the 256^3 operating point needs the chip):
  VCT_TEST_TPU=1 python -m pytest tests/test_fidelity.py -v

Thresholds are REGRESSION bounds pinned at the recorded baselines (see
the assert comments below for the per-metric values and their causes);
the <= 0.15 kernel / <= 0.10 image north stars are tracked in
FIDELITY_r0N.json and tightened here as the kernels earn them.
"""

import json
import os
import subprocess
import sys

import jax
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        jax.default_backend() == "cpu",
        reason="operating-point fidelity needs the TPU "
               "(set VCT_TEST_TPU=1)"),
]


def test_operating_point_fidelity(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "fid.json")
    env = dict(os.environ)
    env.update({
        "VCT_FIDELITY_OUT": out,
        "VCT_FIDELITY_STAGE": "all",
        "VCT_FIDELITY_DF": "128",
        "VCT_FIDELITY_N": "1024",
        "PYTHONPATH": repo + ":" + env.get("PYTHONPATH", ""),
    })
    cp = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts/fidelity_field.py")],
        env=env, capture_output=True, text=True, timeout=3000)
    assert cp.returncode == 0, cp.stdout[-2000:] + cp.stderr[-2000:]
    res = json.load(open(out))
    # REGRESSION bounds pinned at the r4 recorded values (+ margin) so CI
    # fails if operating-point fidelity degrades further:
    #   diffuse field128        0.44  (resolution-dominated, FIDELITY_r03/4)
    #   specular percone kernel 0.49  — the kernel is 0.0015-exact on
    #     world-coherent pixel groups (tests/test_specmarch_pallas.py);
    #     the screen-wide RMS tail comes from 256-pixel groups whose
    #     world-space spread exceeds the lod-0 brick budget, a documented
    #     limit of the per-group brick design (render/fast.py
    #     spec_percone_pass).  Still better than the 26-dir basis field
    #     (0.63, basis-limited), and the end-to-end IMAGE error of the
    #     exact-specular mode is ~0.2 (occlusion/albedo modulate it).
    assert res["diffuse_field128_rel_rms"] < 0.5, res
    assert res["specular_percone_kernel_rel_rms"] < 0.55, res
    assert res["image_field_rel_rms"] < 0.35, res
    assert res["image_exact_specular_rel_rms"] < 0.3, res
