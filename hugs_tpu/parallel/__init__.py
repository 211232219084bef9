from hugs_tpu.parallel.shard import (
    make_mesh, render_tile_sharded, batch_render_sharded,
)
