"""Measure the reference (NumPy) implementation's sweep throughput on the
bench workload: DP-GMM, d=2, K=50, VI + Gibbs sweeps over N points.

This freezes the CPU baseline for bench.py's `vs_baseline` (the reference
publishes no numbers — SURVEY.md §6 / BASELINE.md). Run:
    python scripts/measure_reference.py [N ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, '/root/reference')

from mimo.distributions import (
    StackedNormalWisharts, StackedGaussiansWithNormalWisharts,
    TruncatedStickBreaking, Categorical,
)
from mimo.distributions.bayesian import CategoricalWithStickBreaking
from mimo.mixtures import BayesianMixtureOfGaussians


def build(K, d):
    gating_prior = TruncatedStickBreaking(dim=K, gammas=np.ones(K),
                                          deltas=np.ones(K))
    gating = CategoricalWithStickBreaking(
        dim=K, prior=gating_prior,
        likelihood=Categorical(dim=K, probs=np.ones(K) / K))
    comp_prior = StackedNormalWisharts(
        size=K, dim=d,
        mus=np.zeros((K, d)), kappas=np.full(K, 0.05),
        psis=np.tile(np.eye(d) * 0.5, (K, 1, 1)), nus=np.full(K, d + 2.0))
    comps = StackedGaussiansWithNormalWisharts(size=K, dim=d,
                                               prior=comp_prior)
    return BayesianMixtureOfGaussians(gating=gating, components=comps)


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [1_000_000]
    rng = np.random.default_rng(0)
    K, d = 50, 2
    for n in ns:
        centers = rng.normal(size=(5, d)) * 4
        x = centers[rng.integers(0, 5, n)] + rng.normal(size=(n, d))

        model = build(K, d)
        # one warm-up + timed VI sweeps
        model.meanfield_coordinate_descent(x, maxiter=1, progress_bar=False)
        t0 = time.time()
        iters = 3
        model.meanfield_coordinate_descent(x, maxiter=iters, randomize=False,
                                           progress_bar=False, tol=-1.0)
        vi_rate = iters / (time.time() - t0)

        model2 = build(K, d)
        model2.resample(x, maxiter=1, progress_bar=False)
        t0 = time.time()
        model2.resample(x, maxiter=iters, init_labels='posterior',
                        progress_bar=False)
        gibbs_rate = iters / (time.time() - t0)

        print(f'N={n}: reference VI {vi_rate:.3f} iters/s, '
              f'Gibbs {gibbs_rate:.3f} sweeps/s', flush=True)


if __name__ == '__main__':
    main()
