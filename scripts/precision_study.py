"""Does DEFAULT-precision (single-pass bf16 MXU) in the Pallas kernels
change the fitted posterior? Compare, at the north-star shape
(N=1e7, K=50, d=2, DP gating, 200 VI iters / 100 Gibbs sweeps):
  - final ELBO (computed by the f32-HIGHEST XLA engine for both states)
  - held-out predictive log-density (label-permutation invariant)
  - throughput
between backend='xla' (HIGHEST everywhere) and backend='pallas'
(kernel dots at DEFAULT). Results recorded in BENCH_NOTES.md."""

import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

import jax

jax.config.update('jax_compilation_cache_dir', os.path.join(_repo, '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
import numpy as np

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.distributions.niw import GaussParams

N, K, D, ITERS = 10_000_000, 50, 2, 200


def main():
    key = jax.random.PRNGKey(0)
    mu = jnp.array([[-3., 0.], [3., 0.], [0., 4.]])
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(mu, lm),
                                jnp.array([.3, .4, .3]), N)
    x_test, _ = BayesianGMM.generate(jax.random.PRNGKey(99),
                                     GaussParams(mu, lm),
                                     jnp.array([.3, .4, .3]), 100_000)
    model = BayesianGMM.make(size=K, dim=D, gating='dp', alpha=1.0,
                             kappa=0.05, psi_scale=0.5)
    pred = jax.jit(lambda st: jnp.mean(model.log_predictive(st, (x_test,))))

    results = {}
    for backend in ('xla', 'pallas'):
        st, vlb = model.fit_vi_fused(x, key=1, maxiter=ITERS, backend=backend)
        jax.block_until_ready(vlb)
        t0 = time.time()
        st, vlb = model.fit_vi_fused(x, key=1, maxiter=ITERS, backend=backend)
        jax.block_until_ready(vlb)
        dt = time.time() - t0
        lp = float(pred(st))
        v = np.asarray(vlb)
        results[backend] = (v[-1], lp, ITERS / dt)
        print(f'VI {backend:6s}: final ELBO {v[-1]:.8g} | held-out mean '
              f'logpred {lp:.6f} | {ITERS/dt:.1f} iters/s | '
              f'nonfinite {int((~np.isfinite(v)).sum())}', flush=True)

    e_x, p_x, _ = results['xla']
    e_p, p_p, _ = results['pallas']
    print(f'delta: ELBO rel {(e_p-e_x)/abs(e_x):+.2e} | '
          f'logpred {p_p-p_x:+.6f} nats/pt', flush=True)

    # Gibbs: stochastic — compare held-out predictive between backends
    for backend in ('xla', 'pallas'):
        gs = model.fit_gibbs_fused(x, key=2, maxiter=100, backend=backend)
        jax.block_until_ready(gs.labels)
        t0 = time.time()
        gs = model.fit_gibbs_fused(x, key=2, maxiter=100, backend=backend)
        jax.block_until_ready(gs.labels)
        dt = time.time() - t0
        st = gs  # GibbsState: predictive via posterior state
        lp = float(pred(st))
        print(f'Gibbs {backend:6s}: held-out mean logpred {lp:.6f} | '
              f'{100/dt:.1f} sweeps/s', flush=True)


if __name__ == '__main__':
    main()
