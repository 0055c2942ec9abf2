"""Pallas TPU kernels for the hot voxel ops.

Every kernel here has a pure-jax.numpy oracle in vct_tpu/core or
vct_tpu/render and is parity-tested against it (tests/test_ops_pallas.py);
on non-TPU backends the kernels run in interpreter mode so the same code
path is exercised everywhere.
"""

from vct_tpu.ops.mip_pallas import build_mips_pallas, downsample2x_pallas
from vct_tpu.ops.conemarch_pallas import cone_march_pallas
from vct_tpu.ops.scatter_pallas import splat_pallas

__all__ = [
    "build_mips_pallas",
    "downsample2x_pallas",
    "cone_march_pallas",
    "splat_pallas",
]
