"""Block-size sweep for the fused VI/Gibbs engines on the attached chip.

Prints iters/s for each candidate block size at the bench workload
(N=1e6, K=50, d=2) so bench.py's default can be pinned to the best."""

import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

import jax

jax.config.update('jax_compilation_cache_dir', os.path.join(_repo, '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.distributions.niw import GaussParams

N, K, D = 1_000_000, 50, 2
ITERS = 100


def main():
    key = jax.random.PRNGKey(0)
    mu = jnp.array([[-3., 0.], [3., 0.], [0., 4.]])
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(mu, lm),
                                jnp.array([.3, .4, .3]), N)
    model = BayesianGMM.make(size=K, dim=D, gating='dp', alpha=1.0,
                             kappa=0.05, psi_scale=0.5)

    for bs in [62500, 125000, 250000, 500000, 1000000]:
        _, vlb = model.fit_vi_fused(x, key=1, maxiter=ITERS, block_size=bs)
        jax.block_until_ready(vlb)
        t0 = time.time()
        _, vlb = model.fit_vi_fused(x, key=1, maxiter=ITERS, block_size=bs)
        jax.block_until_ready(vlb)
        vi = ITERS / (time.time() - t0)

        gs = model.fit_gibbs_fused(x, key=2, maxiter=ITERS, block_size=bs)
        jax.block_until_ready(gs.labels)
        t0 = time.time()
        gs = model.fit_gibbs_fused(x, key=2, maxiter=ITERS, block_size=bs)
        jax.block_until_ready(gs.labels)
        gibbs = ITERS / (time.time() - t0)
        print(f'block={bs:>8}: VI {vi:7.1f} iters/s | Gibbs {gibbs:7.1f} '
              f'sweeps/s', file=sys.stderr, flush=True)


if __name__ == '__main__':
    main()
