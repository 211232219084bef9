from hugs_tpu.parallel.shard import (
    make_mesh, render_tile_sharded, batch_render_sharded,
)
from hugs_tpu.parallel.gauss_shard import render_gauss_sharded
