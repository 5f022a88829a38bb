"""Integration tests for (Bayesian) GMM: the reference's generate-from-truth
pattern (examples/dgmm/gibbs_dgmm.py:21-38) turned into asserted tests
(SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_tpu.models.gmm import GMM, BayesianGMM
from mimo_tpu.models.mixture import MFState
from mimo_tpu.distributions.niw import GaussParams

TRUE_MU = np.array([[-4., 0.], [4., 0.], [0., 5.]])
TRUE_W = np.array([0.3, 0.4, 0.3])


@pytest.fixture(scope='module')
def data():
    key = jax.random.PRNGKey(7)
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, labels = BayesianGMM.generate(
        key, GaussParams(jnp.asarray(TRUE_MU), lm), jnp.asarray(TRUE_W), 3000)
    return x, labels


def _match_means(est_mu, est_w, used):
    """Greedy-match recovered means to truth; return max distance."""
    est = np.asarray(est_mu)[np.asarray(used)]
    errs = []
    for t in TRUE_MU:
        errs.append(np.min(np.linalg.norm(est - t, axis=-1)))
    return max(errs)


def test_vi_monotone_and_recovers(data):
    x, _ = data
    m = BayesianGMM.make(size=8, dim=2, gating='dirichlet', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    state, vlb = m.fit_vi(x, key=1, maxiter=150)
    d = np.diff(np.asarray(vlb))
    assert np.all(d > -1e-6), f'ELBO not monotone: min diff {d.min()}'
    used = m.used_labels(state, (x,))
    assert _match_means(state.components.mu, None, used) < 0.3


def test_vi_stick_breaking(data):
    x, _ = data
    m = BayesianGMM.make(size=10, dim=2, gating='dp', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    state, vlb = m.fit_vi(x, key=3, maxiter=150)
    d = np.diff(np.asarray(vlb))
    assert np.all(d > -1e-6), f'DP ELBO not monotone: min diff {d.min()}'
    used = m.used_labels(state, (x,))
    assert _match_means(state.components.mu, None, used) < 0.3
    # stick-breaking weights sum to 1
    np.testing.assert_allclose(np.sum(np.asarray(state.gating.mean())), 1.0,
                               rtol=1e-8)


def test_gibbs_recovers(data):
    x, labels = data
    m = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    gs = m.fit_gibbs(x, key=5, maxiter=150)
    counts = np.bincount(np.asarray(gs.labels), minlength=8)
    # the bulk of the mass in a few clusters, and every true mean found
    top4 = np.sort(counts)[-4:]
    assert top4.sum() > 0.85 * x.shape[0]
    used = counts > 50
    assert _match_means(gs.components.mu, None, used) < 0.4


def test_svi_converges_to_vi_neighborhood(data):
    x, _ = data
    m = BayesianGMM.make(size=8, dim=2, gating='dirichlet', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    vi_state, vi_vlb = m.fit_vi(x, key=1, maxiter=150)
    svi_state, svi_vlb = m.fit_svi(x, key=2, maxiter=300, step_size=0.6,
                                   batch_size=512, track_elbo=True)
    assert svi_vlb[-1] > vi_vlb[-1] - 0.02 * abs(float(vi_vlb[-1])), (
        f'SVI ELBO {svi_vlb[-1]} far below VI {vi_vlb[-1]}')


def test_svi_robbins_monro_schedule(data):
    """forgetting/delay enable the Hoffman-et-al decaying step schedule;
    forgetting=0 (with delay=0) must exactly reproduce the fixed-step
    path (rho_t = step_size * (t+1)^0)."""
    x, _ = data
    m = BayesianGMM.make(size=8, dim=2, gating='dirichlet', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    fixed, _ = m.fit_svi(x, key=2, maxiter=100, step_size=0.6,
                         batch_size=512)
    degen, _ = m.fit_svi(x, key=2, maxiter=100, step_size=0.6,
                         batch_size=512, forgetting=0.0, delay=0.0)
    for a, b in zip(jax.tree.leaves(fixed), jax.tree.leaves(degen)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    # a real schedule converges to the VI neighborhood too
    vi_state, vi_vlb = m.fit_vi(x, key=1, maxiter=150)
    st, vlb = m.fit_svi(x, key=2, maxiter=400, step_size=1.0,
                        batch_size=512, forgetting=0.55, delay=4.0,
                        track_elbo=True)
    assert np.isfinite(np.asarray(vlb)).all()
    assert vlb[-1] > vi_vlb[-1] - 0.02 * abs(float(vi_vlb[-1])), (
        f'scheduled SVI ELBO {vlb[-1]} far below VI {vi_vlb[-1]}')


def test_em_monotone_and_recovers(data):
    """Best-of-3 restarts (EM has local optima; the reference's examples use
    best-of-N ELBO selection, examples/gmm/sine/svi_gmm.py:57-67)."""
    x, _ = data
    em = GMM(3, 2)
    best, best_ll = None, -np.inf
    for seed in (4, 14, 24):
        state, trace = em.fit_em(x.astype(jnp.float64), key=seed, maxiter=120)
        d = np.diff(np.asarray(trace))
        assert np.all(d > -1e-6)
        if float(trace[-1]) > best_ll:
            best, best_ll = state, float(trace[-1])
    est = np.asarray(best.params.mu)
    assert _match_means(est, None, np.ones(3, bool)) < 0.2


def test_map_em_runs(data):
    x, _ = data
    m = BayesianGMM.make(size=6, dim=2, gating='dirichlet', alpha=2.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    state, trace = m.fit_map(x, key=6, maxiter=80)
    d = np.diff(np.asarray(trace))
    # complete-data loglik under MAP-EM should be eventually non-decreasing
    assert np.all(d[10:] > -1e-3)


def test_diag_gmm_vi(data):
    x, _ = data
    m = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0, diag=True,
                         kappa=0.05, dtype=jnp.float64)
    state, vlb = m.fit_vi(x, key=8, maxiter=150)
    d = np.diff(np.asarray(vlb))
    assert np.all(d > -1e-6), f'diag ELBO not monotone: min diff {d.min()}'
    used = m.used_labels(state, (x,))
    assert _match_means(state.components.mu, None, used) < 0.4


def test_tied_gmm_vi(data):
    x, _ = data
    m = BayesianGMM.make(size=8, dim=2, gating='dirichlet', alpha=1.0,
                         tied=True, kappa=0.05, psi_scale=0.5,
                         dtype=jnp.float64)
    state, vlb = m.fit_vi(x, key=9, maxiter=100)
    # tied: all psi equal across components
    psis = np.asarray(state.components.psi)
    np.testing.assert_allclose(psis, np.broadcast_to(psis[:1], psis.shape),
                               rtol=1e-8)
    # mean recovery via Gibbs (the reference's tgmm example path,
    # examples/tgmm/gibbs_tgmm.py): tied VI from random resp can collapse
    gs = m.fit_gibbs(x, key=10, maxiter=150)
    counts = np.bincount(np.asarray(gs.labels), minlength=8)
    assert _match_means(gs.components.mu, None, counts > 100) < 0.5


def test_log_predictive_density(data):
    """Held-out predictive density should beat a single-Gaussian fit."""
    x, _ = data
    x_train, x_test = x[:2500], x[2500:]
    m = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    state, _ = m.fit_vi(x_train, key=1, maxiter=100)
    lp = m.log_predictive(state, x_test)
    assert np.isfinite(np.asarray(lp)).all()
    single = BayesianGMM.make(size=1, dim=2, gating='dirichlet',
                              kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    s1, _ = single.fit_vi(x_train, key=1, maxiter=50)
    lp1 = single.log_predictive(s1, x_test)
    assert float(jnp.mean(lp)) > float(jnp.mean(lp1)) + 0.3


def test_reanchor(data):
    """prior <- posterior warm restart: second fit should start near the
    first fit's solution (evaluate_sine.py:153-155 recipe)."""
    x, _ = data
    m = BayesianGMM.make(size=6, dim=2, gating='dp', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    state, vlb1 = m.fit_vi(x, key=1, maxiter=100)
    m2 = m.with_priors(state)
    state2, vlb2 = m2.fit_vi(x, key=2, maxiter=50, init_state=state,
                             randomize=False)
    assert np.isfinite(np.asarray(vlb2)).all()


def test_vi_tol_early_stop(data):
    """`tol` reproduces the reference's |dELBO| < tol stopping rule
    (gmm.py:279-283): the early-stopped trace must be a constant-extended
    prefix of the fixed-maxiter trace, with the break at the first
    |vlb[t] - vlb[t-1]| < tol."""
    x, _ = data
    m = BayesianGMM.make(size=8, dim=2, gating='dirichlet', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    _, full = m.fit_vi(x, key=1, maxiter=150)
    full = np.asarray(full)
    d = np.abs(np.diff(full))
    # pick a tol that provably fires mid-trace: just above the smallest
    # |dELBO| seen in the first 120 sweeps
    tol = float(d[:120].min()) * 1.5
    state, vlb = m.fit_vi(x, key=1, maxiter=150, tol=tol)
    vlb = np.asarray(vlb)
    below = np.nonzero(d < tol)[0]
    assert below.size, 'fixture never converges at this tol; lower it'
    stop = below[0] + 2        # sweeps executed incl. the converged one
    assert stop < 150, 'no early stopping happened'
    np.testing.assert_allclose(vlb[:stop], full[:stop], rtol=1e-12)
    # constant-extended tail
    np.testing.assert_allclose(vlb[stop:], vlb[stop - 1], rtol=1e-12)
    # the state corresponds to the stopped sweep: its ELBO equals the
    # last trace entry after one more E-step (VI fixed-point property
    # within tol)
    resp = m.expected_responsibilities(state, (x,))
    assert abs(float(m.elbo(state, (x,), resp)) - vlb[stop - 1]) < 1.0


def test_vi_fused_tol_early_stop(data):
    x, _ = data
    m = BayesianGMM.make(size=8, dim=2, gating='dirichlet', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    _, full = m.fit_vi_fused(x, key=1, maxiter=150, block_size=750)
    full = np.asarray(full)
    d = np.abs(np.diff(full))
    tol = float(d[:120].min()) * 1.5
    _, vlb = m.fit_vi_fused(x, key=1, maxiter=150, tol=tol, block_size=750)
    vlb = np.asarray(vlb)
    below = np.nonzero(d < tol)[0]
    assert below.size and below[0] + 2 < 150
    stop = below[0] + 2
    np.testing.assert_allclose(vlb[:stop], full[:stop], rtol=1e-12)
    np.testing.assert_allclose(vlb[stop:], vlb[stop - 1], rtol=1e-12)


def test_gibbs_loglik_trace(data):
    x, _ = data
    m = BayesianGMM.make(size=6, dim=2, gating='dp', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    state, trace = m.fit_gibbs(x, key=5, maxiter=60, track_loglik=True)
    trace = np.asarray(trace)
    assert trace.shape == (60,) and np.isfinite(trace).all()
    # chain mixes toward higher-likelihood configurations
    assert trace[-10:].mean() > trace[:5].mean()
    # default (untracked) still returns a bare GibbsState
    gs = m.fit_gibbs(x, key=5, maxiter=10)
    assert gs.labels.shape == x.shape[:1]


def test_sample_from_fitted(data):
    """model.sample(state, ...) = the reference's rvs on fitted params
    (gmm.py:50-60): synthetic draws should reproduce the fitted moments."""
    x, _ = data
    m = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    state, _ = m.fit_vi(x, key=1, maxiter=100)
    for mode in ('mode', 'mean', 'draw'):
        xs, zs = m.sample(state, key=2, n=20000, params=mode)
        assert xs.shape == (20000, 2) and zs.shape == (20000,)
        assert np.isfinite(np.asarray(xs)).all()
    xs, _ = m.sample(state, key=2, n=50000)
    np.testing.assert_allclose(np.asarray(xs).mean(0), np.asarray(x).mean(0),
                               atol=0.2)
    np.testing.assert_allclose(np.cov(np.asarray(xs).T),
                               np.cov(np.asarray(x).T), rtol=0.15, atol=0.3)


def test_serve_from_gibbs_state(data):
    """Predict-after-resample (examples/dgmm/gibbs_dgmm.py:60): a Gibbs
    chain's posteriors wrapped in an MFState feed log_predictive /
    used_labels unchanged, and the density is as good as VI's on the
    same data (within a nat/point)."""
    x, _ = data
    m = BayesianGMM.make(size=8, dim=2, gating='dirichlet', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    gs = m.fit_gibbs(x, key=2, maxiter=80)
    st_g = MFState(components=gs.components, gating=gs.gating)
    lp_g = np.asarray(m.log_predictive(st_g, x[:500]))
    assert np.isfinite(lp_g).all()
    st_v, _ = m.fit_vi(x, key=1, maxiter=100)
    lp_v = np.asarray(m.log_predictive(st_v, x[:500]))
    assert abs(lp_g.mean() - lp_v.mean()) < 1.0
    used = m.used_labels(st_g, x)
    assert 2 <= int(np.asarray(used).sum()) <= 8
