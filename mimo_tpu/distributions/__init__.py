from mimo_tpu.distributions.wishart import (
    wishart_sample, wishart_expected_logdet, wishart_log_partition,
)
from mimo_tpu.distributions.niw import NIW, GaussStats
from mimo_tpu.distributions.ng import NG, DiagGaussStats
from mimo_tpu.distributions.mnw import MNW, LinGaussStats
from mimo_tpu.distributions.mng import MNG
from mimo_tpu.distributions.gating import Dirichlet, StickBreaking
from mimo_tpu.distributions.hierarchical import HierTied
