from mimo_tpu.parallel.mesh import (
    init_distributed, make_mesh, shard_data, replicate, data_parallel_fit,
    pad_to_multiple,
)
from mimo_tpu.parallel.chains import (
    fit_chains, best_of, systematic_resample, smc_gibbs,
)
from mimo_tpu.parallel.diagnostics import (
    split_rhat, ess, rank_normalize, diagnostics,
)
