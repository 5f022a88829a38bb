"""Benchmark: DP-GMM mean-field VI sweep throughput on the north-star
workload (N=1e7 points, K=50 components, d=2; BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

`vs_baseline` compares against the reference (hanyas/mimo, NumPy) running
the same model/update on CPU, measured by scripts/measure_reference.py on
this machine (frozen below with provenance). Also prints per-engine detail
lines (Gibbs, serving, and the N=1e6 point for continuity) to stderr.
"""

import json
import os
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.distributions.niw import GaussParams

# Frozen CPU baseline, measured 2026-08-17/18 with
# scripts/measure_reference.py on this machine (reference @
# /root/reference, NumPy/OpenBLAS, 125 GB RAM):
#   N=1e4: VI 9.692 iters/s, Gibbs 35.229 sweeps/s
#   N=1e5: VI 0.296 iters/s, Gibbs  2.133 sweeps/s
#   N=1e6: VI 0.011 iters/s, Gibbs  0.022 sweeps/s
#   N=1e7: VI 0.00039 iters/s (2554 s/iter), Gibbs 0.00087 sweeps/s
#          (1148 s/sweep), peak RSS 43.5 GB
# (superlinear falloff: the fold=False N x d x d expected-stats path,
# gaussian.py:474-485, plus the K x N x d x d einsums going out of cache.)
REFERENCE_VI_ITERS_PER_S_1E7 = 0.00039

N, K, D = 10_000_000, 50, 2
ITERS = 100


def bench_engines(model, x, iters, reps=3):
    """(vi_iters/s, gibbs_sweeps/s, final ELBO) on `x`, best of `reps`."""
    state, vlb = model.fit_vi_fused(x, key=1, maxiter=iters)  # compile
    jax.block_until_ready(vlb)
    assert bool(jnp.isfinite(vlb[-1])), 'non-finite ELBO'

    vi_rate = 0.0
    for _ in range(reps):                 # best-of: tunnel/runtime jitter
        t0 = time.time()
        state, vlb = model.fit_vi_fused(x, key=1, maxiter=iters)
        jax.block_until_ready(vlb)
        vi_rate = max(vi_rate, iters / (time.time() - t0))

    gs = model.fit_gibbs_fused(x, key=2, maxiter=iters)       # compile
    jax.block_until_ready(gs.labels)
    gibbs_rate = 0.0
    for _ in range(reps):
        t0 = time.time()
        gs = model.fit_gibbs_fused(x, key=2, maxiter=iters)
        jax.block_until_ready(gs.labels)
        gibbs_rate = max(gibbs_rate, iters / (time.time() - t0))
    return vi_rate, gibbs_rate, state, vlb


def main():
    key = jax.random.PRNGKey(0)
    mu = jnp.array([[-3., 0.], [3., 0.], [0., 4.]])
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(mu, lm),
                                jnp.array([.3, .4, .3]), N)
    model = BayesianGMM.make(size=K, dim=D, gating='dp', alpha=1.0,
                             kappa=0.05, psi_scale=0.5)

    # the fused blockwise engines are the fast path — responsibilities
    # never materialize in HBM (ops/estep.py)
    vi_rate, gibbs_rate, state, vlb = bench_engines(model, x, ITERS)

    # serving: posterior-predictive density over all N points
    pred = jax.jit(model.log_predictive)
    lp = pred(state, (x,))
    jax.block_until_ready(lp)
    t0 = time.time()
    for _ in range(10):
        lp = pred(state, (x,))
    jax.block_until_ready(lp)
    serve_rate = 10 * N / (time.time() - t0)

    print(f'# VI {vi_rate:.1f} iters/s | Gibbs {gibbs_rate:.1f} sweeps/s | '
          f'predictive {serve_rate/1e6:.1f}M pts/s '
          f'(N={N}, K={K}, d={D}) | final ELBO {float(vlb[-1]):.4g}',
          file=sys.stderr)

    # continuity with the earlier N=1e6 headline (reference: 0.011 VI
    # iters/s, 0.022 Gibbs sweeps/s at that scale)
    vi6, gibbs6, _, _ = bench_engines(model, x[:1_000_000], ITERS, reps=2)
    print(f'# N=1e6 detail: VI {vi6:.1f} iters/s ({vi6 / 0.011:,.0f}x ref) '
          f'| Gibbs {gibbs6:.1f} sweeps/s ({gibbs6 / 0.022:,.0f}x ref)',
          file=sys.stderr)

    print(json.dumps({
        'metric': 'dpgmm_vi_iters_per_s_n1e7_k50',
        'value': round(vi_rate, 2),
        'unit': 'iters/s',
        'vs_baseline': round(vi_rate / REFERENCE_VI_ITERS_PER_S_1E7, 1),
    }))


if __name__ == '__main__':
    main()
