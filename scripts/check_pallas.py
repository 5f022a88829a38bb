"""Parity + end-to-end timing for the register-F Pallas kernels vs the
XLA fused engines, on the real TPU at the bench shape."""

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

N, K, D, ITERS = 10_000_000, 50, 2, 100


def timeit(f, reps=3):
    o = f()
    jax.block_until_ready(o)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        o = f()
        jax.block_until_ready(o)
        best = min(best, time.time() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    mu = jnp.array([[-3., 0.], [3., 0.], [0., 4.]])
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(mu, lm),
                                jnp.array([.3, .4, .3]), N)
    model = BayesianGMM.make(size=K, dim=D, gating='dp', alpha=1.0,
                             kappa=0.05, psi_scale=0.5)

    # ---------- parity: one E-step, pallas vs XLA, on an odd-sized N ------
    from mimo_tpu.ops.pallas_estep import gmm_estep_pallas
    from mimo_tpu.ops.estep import gmm_estep_dense, _estep_nat  # noqa
    state, _ = model.fit_vi_fused(x, key=1, maxiter=5)
    log_pi = state.gating.expected_log_pi()
    x_odd = x[:100_001]
    rp = gmm_estep_pallas(state.components, log_pi, x_odd, block_size=16384)
    rd = gmm_estep_dense(state.components, log_pi, x_odd)
    for name, a, b in (('counts', rp.counts, rd.counts),
                       ('s1', rp.stats.x, rd.stats.x),
                       ('sxx', rp.stats.xxT, rd.stats.xxT)):
        err = float(jnp.max(jnp.abs(a - b) / (jnp.abs(b) + 1.0)))
        print(f'parity {name}: max rel err {err:.2e}')
        assert err < 1e-4, name
    lse_err = abs(float(rp.lse - rd.lse) / float(rd.lse))
    print(f'parity lse: rel err {lse_err:.2e}')
    assert lse_err < 1e-6

    # Gibbs kernel sanity: counts ~ softmax expectations, stats consistent
    from mimo_tpu.ops.pallas_gibbs import gibbs_labels_from_xt, gauss_plugin_nat
    params = model.family.mode_params(state.components)
    nat = gauss_plugin_nat(params, log_pi)
    xt_odd = x_odd.astype(jnp.float32).T
    labels, res = gibbs_labels_from_xt(42, nat, xt_odd, block_size=16384)
    assert labels.shape[0] == x_odd.shape[0]
    assert float(jnp.sum(res.counts)) == x_odd.shape[0], float(jnp.sum(res.counts))
    # labels histogram must match the one-hot counts exactly
    hist = jnp.bincount(labels, length=K).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(hist - res.counts))) == 0.0
    # per-component stat means consistent with gathered means
    sel = np.asarray(labels) == int(jnp.argmax(res.counts))
    mu_kernel = np.asarray(res.stats.x)[int(jnp.argmax(res.counts))] / \
        np.asarray(res.counts)[int(jnp.argmax(res.counts))]
    mu_np = np.asarray(x_odd)[sel].mean(0)
    print(f'gibbs stat parity: {np.max(np.abs(mu_kernel - mu_np)):.2e}')
    assert np.allclose(mu_kernel, mu_np, atol=1e-4)

    # ---------- end-to-end timing ----------------------------------------
    for name, fn in (
        ('VI xla   ', lambda: model.fit_vi_fused(x, key=1, maxiter=ITERS)[1]),
        ('VI pallas', lambda: model.fit_vi_fused(x, key=1, maxiter=ITERS,
                                                 backend='pallas')[1]),
        ('Gibbs xla   ', lambda: model.fit_gibbs_fused(
            x, key=2, maxiter=ITERS).labels),
        ('Gibbs pallas', lambda: model.fit_gibbs_fused(
            x, key=2, maxiter=ITERS, backend='pallas').labels),
    ):
        t = timeit(fn)
        print(f'{name}: {ITERS / t:8.1f} iters/s ({t / ITERS * 1e3:6.2f} ms/iter)',
              flush=True)

    # pallas and xla VI must agree (same math, same init)
    st_p, vlb_p = model.fit_vi_fused(x, key=1, maxiter=50, backend='pallas')
    st_x, vlb_x = model.fit_vi_fused(x, key=1, maxiter=50)
    vp, vx = np.asarray(vlb_p), np.asarray(vlb_x)
    print(f'pallas vlb[-1]={vp[-1]:.6g} xla vlb[-1]={vx[-1]:.6g} '
          f'nonfinite: pallas {int((~np.isfinite(vp)).sum())} '
          f'xla {int((~np.isfinite(vx)).sum())}')
    assert np.isfinite(vp).all() and np.isfinite(vx).all()
    assert np.allclose(vp, vx, rtol=1e-4)
    wp = np.sort(np.asarray(st_p.gating.mean()))
    wx = np.sort(np.asarray(st_x.gating.mean()))
    assert np.allclose(wp, wx, atol=1e-3), (wp[-5:], wx[-5:])
    print('ALL OK')


if __name__ == '__main__':
    main()
