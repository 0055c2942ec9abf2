from vct_tpu.parallel.mesh import make_mesh
from vct_tpu.parallel import tile_dp
