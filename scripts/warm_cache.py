"""Populate the persistent XLA compilation cache for the bench/demo shapes.

First TPU compiles through the axon tunnel are slow (minutes); this script
front-loads them once so bench.py and tests start fast. Safe to re-run —
cached programs load in seconds.
"""

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

from mimo_tpu.models import BayesianGMM, BayesianILR
from mimo_tpu.models.mixture import MFState
from mimo_tpu.distributions.niw import GaussParams


def timed(name, fn):
    t0 = time.time()
    out = jax.block_until_ready(fn())
    print(f'{name}: {time.time() - t0:.1f}s', flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    mu = jnp.array([[-3., 0.], [3., 0.], [0., 4.]])
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    w = jnp.array([.3, .4, .3])

    for n in (1_000_000,):
        x, _ = BayesianGMM.generate(key, GaussParams(mu, lm), w, n)
        m = BayesianGMM.make(size=50, dim=2, gating='dp', kappa=0.05,
                             psi_scale=0.5)
        timed(f'gmm vi_fused n={n}',
              lambda: m.fit_vi_fused(x, key=1, maxiter=100)[1])
        timed(f'gmm gibbs_fused n={n}',
              lambda: m.fit_gibbs_fused(x, key=2, maxiter=100).labels)
        st, _ = m.fit_vi_fused(x, key=1, maxiter=100)
        timed(f'gmm predictive n={n}',
              lambda: jax.jit(m.log_predictive)(st, (x,)))
        timed(f'gmm vi n={n}', lambda: m.fit_vi(x, key=1, maxiter=100)[1])
        timed(f'gmm gibbs n={n}', lambda: m.fit_gibbs(x, key=2, maxiter=100).labels)
        timed(f'gmm svi n={n}', lambda: m.fit_svi(
            x, key=3, maxiter=100, step_size=0.5, batch_size=4096)[0].gating.gamma)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.uniform(-6, 6, (2000, 1)), jnp.float32)
    ys = jnp.asarray(np.sin(np.asarray(xs)) + 0.1 * rng.standard_normal((2000, 1)),
                     jnp.float32)
    ilr = BayesianILR.make(size=25, input_dim=1, output_dim=1, alpha=2.0,
                           kappa=0.05)
    ilr.init_transform(xs, ys)
    g = timed('ilr gibbs', lambda: ilr.fit_gibbs((xs, ys), key=0, maxiter=25))
    st, _ = timed('ilr vi', lambda: ilr.fit_vi(
        (xs, ys), key=1, maxiter=200,
        init_state=MFState(g.components, g.gating), randomize=False))
    timed('ilr predict', lambda: ilr.predict(st, xs, ys)[0])


if __name__ == '__main__':
    main()
