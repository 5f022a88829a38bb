from mimo_tpu.parallel.mesh import (
    make_mesh, shard_data, replicate, data_parallel_fit,
)
