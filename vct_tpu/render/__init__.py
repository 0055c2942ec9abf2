from vct_tpu.render import gbuffer, renderer, voxelize
