from mimo_tpu.models.mixture import (
    BayesianMixture, MFState, GibbsState,
)
from mimo_tpu.models.gmm import GMM, BayesianGMM
from mimo_tpu.models.ilr import BayesianILR
from mimo_tpu.models.hmix import BayesianMixtureOfMixtures
