"""Measure the serving-coverage table: which model configs ride which
fused kernel at what rate (BENCH_NOTES 'Serving coverage' section).

For every family the E-step kernel trains, serve N=1e7 points through
both the fused Mosaic kernel (backend='pallas'/'auto') and the dense XLA
path (backend='xla'), print M pts/s for each, and assert parity on a
16k-point probe. Run on the TPU chip:

    python scripts/serving_coverage.py

States are produced by a short fused VI fit at N=2^20 — serving rates
do not depend on fit quality, only on (K, d, family) shapes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), '.jax_cache'))
import jax.numpy as jnp
import numpy as np

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.models.ilr import BayesianILR
from mimo_tpu.models.hmix import BayesianMixtureOfMixtures

N = 10_000_000
REPS = 10


def rate(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return REPS * N / (time.perf_counter() - t0)


def rate_chunked(fn, st, arrays, chunk=1_000_000):
    """Dense p>1 predict cannot hold its (N, K, p, p) covariance
    intermediate at N=1e7 (18 GB > HBM) — serve it in 1e6-row chunks,
    the best a user of the dense path can actually do."""
    def run():
        outs = None
        for i in range(0, N, chunk):
            outs = fn(st, *[a[i:i + chunk] for a in arrays])
        return outs
    jax.block_until_ready(run())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = run()
    jax.block_until_ready(out)
    return REPS * N / (time.perf_counter() - t0)


def probe_err(fused, dense):
    f = [np.asarray(a) for a in jax.tree.leaves(fused) if a is not None]
    d = [np.asarray(a) for a in jax.tree.leaves(dense) if a is not None]
    return max(float(np.max(np.abs(a - b))) for a, b in zip(f, d))


def main():
    key = jax.random.PRNGKey(0)
    rows = []

    # ---- GMM density serving: log_predictive ---------------------------
    x = jax.random.normal(key, (N, 2)) * 2.0
    for name, kw in (('GMM full (NIW)', {}),
                     ('GMM diag (NG)', dict(diag=True)),
                     ('GMM hier (HierTied)', dict(hierarchical=True))):
        m = BayesianGMM.make(size=50, dim=2, kappa=0.5, **kw)
        st, _ = m.fit_vi_fused(x[:2**20], key=1, maxiter=10,
                               backend='xla')
        fk = jax.jit(lambda s, xx: m.log_predictive(s, xx,
                                                    backend='pallas'))
        fd = jax.jit(lambda s, xx: m.log_predictive(s, xx, backend='xla'))
        err = probe_err(fk(st, x[:16384]), fd(st, x[:16384]))
        rk, rd = rate(fk, st, x), rate(fd, st, x)
        rows.append((name, 'density', rk, rd, err))
        print(f'{name:<28} kernel {rk/1e6:7.0f}M  dense {rd/1e6:7.0f}M '
              f' probe|diff| {err:.2e}', flush=True)

    # ---- ILR regression serving: predict (p=1) -------------------------
    xs = jax.random.uniform(key, (N, 1), minval=-6, maxval=6)
    ys = jnp.sin(xs) + 0.1 * jax.random.normal(
        jax.random.fold_in(key, 1), (N, 1))
    cfgs = (('ILR plain (MNW), average', {}, 'average'),
            ('ILR plain (MNW), mode', {}, 'mode'),
            ('ILR diag expert (MNG)', dict(diag=True), 'average'),
            ('ILR tied-affine', dict(tied_affine=True), 'average'),
            ('ILR hier basis', dict(hier_basis=True), 'average'))
    for name, kw, prediction in cfgs:
        m = BayesianILR.make(size=50, input_dim=1, output_dim=1,
                             alpha=2.0, kappa=0.05, **kw)
        m.init_transform(xs[:2**20], ys[:2**20])
        st, _ = m.fit_vi((xs[:2**20], ys[:2**20]), key=1, maxiter=10)
        fk = jax.jit(lambda s, xx, yy: m.predict(
            s, xx, yy, prediction=prediction, backend='pallas'))
        fd = jax.jit(lambda s, xx, yy: m.predict(
            s, xx, yy, prediction=prediction, backend='xla'))
        err = probe_err(fk(st, xs[:16384], ys[:16384]),
                        fd(st, xs[:16384], ys[:16384]))
        rk, rd = rate(fk, st, xs, ys), rate(fd, st, xs, ys)
        rows.append((name, 'predict', rk, rd, err))
        print(f'{name:<28} kernel {rk/1e6:7.0f}M  dense {rd/1e6:7.0f}M '
              f' probe|diff| {err:.2e}', flush=True)

    # ---- ILR p>1 outputs (joint (x, y) feature kernel, round 4) --------
    d2, p2 = 2, 3
    x2 = jax.random.uniform(key, (N, d2), minval=-3, maxval=3)
    w2 = jax.random.normal(jax.random.fold_in(key, 2), (d2, p2))
    y2 = jnp.tanh(x2 @ w2) + 0.1 * jax.random.normal(
        jax.random.fold_in(key, 3), (N, p2))
    for name, kw in (('ILR multi-output (p=3)', {}),
                     ('ILR multi-output diag (p=3)', dict(diag=True))):
        m = BayesianILR.make(size=50, input_dim=d2, output_dim=p2,
                             alpha=2.0, kappa=0.1, **kw)
        m.init_transform(x2[:2**20], y2[:2**20])
        st, _ = m.fit_vi((x2[:2**20], y2[:2**20]), key=1, maxiter=10)
        fk = jax.jit(lambda s, xx, yy: m.predict(s, xx, yy,
                                                 backend='pallas'))
        fd = jax.jit(lambda s, xx, yy: m.predict(s, xx, yy,
                                                 backend='xla'))
        err = probe_err(fk(st, x2[:16384], y2[:16384]),
                        fd(st, x2[:16384], y2[:16384]))
        # dense p>1 OOMs at N=1e7 (the (N, K, p, p) covariance is 18 GB)
        rk, rd = rate(fk, st, x2, y2), rate_chunked(fd, st, (x2, y2))
        rows.append((name + ' [dense chunked]', 'predict', rk, rd, err))
        print(f'{name:<28} kernel {rk/1e6:7.0f}M  dense(chunk) '
              f'{rd/1e6:7.0f}M  probe|diff| {err:.2e}', flush=True)

    # ---- nested ILR (M*K flatten) --------------------------------------
    hm = BayesianMixtureOfMixtures.make_ilr(
        cluster_size=2, mixture_size=6, input_dim=1, output_dim=1,
        kappa=0.05)
    hm.init_transform(xs[:2**20], ys[:2**20])
    st, _ = hm.fit_vi((xs[:2**20], ys[:2**20]), key=2, maxiter=10,
                      maxsubiter=2)
    for prediction in ('average', 'mode'):
        fk = jax.jit(lambda s, xx, yy: hm.predict(
            s, xx, yy, dist='studentt', prediction=prediction,
            backend='pallas'))
        fd = jax.jit(lambda s, xx, yy: hm.predict(
            s, xx, yy, dist='studentt', prediction=prediction,
            backend='xla'))
        err = probe_err(fk(st, xs[:16384], ys[:16384]),
                        fd(st, xs[:16384], ys[:16384]))
        rk, rd = rate(fk, st, xs, ys), rate(fd, st, xs, ys)
        name = f'nested ILR (M2xK6), {prediction}'
        rows.append((name, 'predict', rk, rd, err))
        print(f'{name:<28} kernel {rk/1e6:7.0f}M  dense {rd/1e6:7.0f}M '
              f' probe|diff| {err:.2e}', flush=True)

    print('\n| Config | Surface | Kernel (M pts/s) | Dense XLA (M pts/s) '
          '| Speedup | Probe max|diff| |')
    print('|---|---|---|---|---|---|')
    for name, surface, rk, rd, err in rows:
        print(f'| {name} | {surface} | {rk/1e6:.0f} | {rd/1e6:.0f} '
              f'| {rk/rd:.2f}x | {err:.1e} |')


if __name__ == '__main__':
    main()
