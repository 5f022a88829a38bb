from mimo_tpu.ops.estep import (
    gmm_estep_dense, gmm_estep_blockwise, EStepResult,
)
