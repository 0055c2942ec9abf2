from vct_tpu.scene.mesh import Material, Scene, compute_tangents, scene_from_arrays
from vct_tpu.scene.cornell import cornell_box
from vct_tpu.scene.atrium import atrium
