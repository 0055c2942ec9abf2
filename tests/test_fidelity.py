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
    # REGRESSION bounds pinned at the r5 recorded values (+ margin) so CI
    # fails if operating-point fidelity degrades:
    #   diffuse field128        0.45  (resolution-dominated, FIDELITY_r03-5)
    #   specular percone kernel 0.196 — specmarch v2 (class bricks +
    #     8-granular origins) cut the r4 0.486 by 2.5x; the residual is
    #     the measured ~2% of steps whose 256-pixel Morton group still
    #     exceeds the L-brick footprint budget (28x15x23 cells) plus
    #     bf16 taps.  The <= 0.15 north star is tracked in
    #     FIDELITY_r0N.json; tighten this gate as the kernel earns it.
    #   image exact-specular    0.175 (occlusion/albedo modulate the
    #     kernel error; the 0.20 field-image error is diffuse-dominated)
    assert res["diffuse_field128_rel_rms"] < 0.5, res
    assert res["specular_percone_kernel_rel_rms"] < 0.25, res
    assert res["image_field_rel_rms"] < 0.3, res
    assert res["image_exact_specular_rel_rms"] < 0.22, res
