from vct_tpu.core import cones, grid, march
