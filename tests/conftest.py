"""Test env: CPU backend with 8 virtual devices for sharding tests.

Must run before jax initializes (standard JAX fake-mesh trick, SURVEY.md §4).

Set VCT_TEST_TPU=1 to keep the real TPU backend instead — only the
hardware smoke tests (tests/test_tpu_compile.py) run meaningfully there;
everything else assumes the 8-device CPU mesh.
"""

import os

ON_TPU = os.environ.get("VCT_TEST_TPU", "") == "1"

if not ON_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not ON_TPU:
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; the config
    # update is what actually forces the CPU backend in this environment.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
