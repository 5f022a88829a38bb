from mimo_tpu.parallel.mesh import (
    init_distributed, make_mesh, shard_data, replicate, data_parallel_fit,
    pad_to_multiple,
)
from mimo_tpu.parallel.chains import (
    fit_chains, best_of, systematic_resample, smc_gibbs,
)
