"""Integration tests for the infinite mixture of linear regressions (ILR):
the reference's flagship sine/step recipes (evaluate_sine.py:131-158)
turned into asserted tests with RMSE/NLPD thresholds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_tpu.models.ilr import BayesianILR
from mimo_tpu.models.mixture import MFState


def make_sine(rng, n=1200, noise=0.1):
    x = rng.uniform(-6.0, 6.0, (n, 1))
    y = np.sin(x) + noise * rng.standard_normal((n, 1))
    return jnp.asarray(x), jnp.asarray(y)


def make_step(rng, n=1200, noise=0.05):
    x = rng.uniform(-1.0, 1.0, (n, 1))
    y = np.where(x > 0, 1.0, -1.0) + noise * rng.standard_normal((n, 1))
    return jnp.asarray(x), jnp.asarray(y)


@pytest.fixture(scope='module')
def sine():
    return make_sine(np.random.default_rng(11))


def _fit(x, y, size=30, gibbs=50, vi=200, diag=False, alpha=5.0,
         dtype=jnp.float64):
    m = BayesianILR.make(size=size, input_dim=1, output_dim=1,
                         gating='stick-breaking', alpha=alpha, kappa=0.05,
                         K_scale=1e-2, diag=diag, dtype=dtype)
    m.init_transform(x, y)
    g = m.fit_gibbs((x, y), key=0, maxiter=gibbs)
    st, vlb = m.fit_vi((x, y), key=1, maxiter=vi,
                       init_state=MFState(g.components, g.gating),
                       randomize=False)
    return m, st, vlb


@pytest.mark.slow
def test_sine_rmse_nlpd(sine):
    x, y = sine
    m, st, vlb = _fit(x.astype(jnp.float64), y.astype(jnp.float64))
    d = np.diff(np.asarray(vlb))
    assert np.all(d > -1e-6), f'ILR ELBO not monotone: {d.min()}'
    mu, var, std, nlpd = m.predict(st, x, y)
    rmse = float(jnp.sqrt(jnp.mean((mu - y) ** 2)))
    assert rmse < 0.16, rmse                  # noise floor is 0.1
    assert float(jnp.mean(nlpd)) < 0.0        # better than standard normal
    assert np.all(np.asarray(var) > 0)


def test_step_function(sine):
    """Mode prediction gives a sharp transition at the step (averaging
    blends the two experts near the boundary — ilr.py:396-401 offers both)."""
    rng = np.random.default_rng(13)
    x, y = make_step(rng)
    m, st, _ = _fit(x.astype(jnp.float64), y.astype(jnp.float64))
    mu, var, std, nlpd = m.predict(st, x, y, prediction='mode')
    rmse = float(jnp.sqrt(jnp.mean((mu - y) ** 2)))
    assert rmse < 0.2, rmse
    mu_a, _, _, _ = m.predict(st, x, y, prediction='average')
    assert float(jnp.sqrt(jnp.mean((mu_a - y) ** 2))) < 0.35


def test_mode_vs_average_prediction(sine):
    x, y = sine
    m, st, _ = _fit(x.astype(jnp.float64), y.astype(jnp.float64))
    mu_a, _, _, _ = m.predict(st, x, prediction='average')
    mu_m, _, _, _ = m.predict(st, x, prediction='mode')
    # both near truth
    for mu in (mu_a, mu_m):
        assert float(jnp.sqrt(jnp.mean((mu - y) ** 2))) < 0.2


@pytest.mark.slow
def test_diag_noise_experts(sine):
    x, y = sine
    m, st, vlb = _fit(x.astype(jnp.float64), y.astype(jnp.float64),
                      diag=True)
    d = np.diff(np.asarray(vlb))
    assert np.all(d > -1e-6), f'MNG ILR ELBO not monotone: {d.min()}'
    mu, var, std, nlpd = m.predict(st, x, y)
    assert float(jnp.sqrt(jnp.mean((mu - y) ** 2))) < 0.15


def test_svi_path(sine):
    x, y = sine
    x, y = x.astype(jnp.float64), y.astype(jnp.float64)
    m = BayesianILR.make(size=30, input_dim=1, output_dim=1,
                         alpha=5.0, kappa=0.05, dtype=jnp.float64)
    m.init_transform(x, y)
    g = m.fit_gibbs((x, y), key=0, maxiter=50)
    st, _ = m.fit_svi((x, y), key=1, maxiter=400, step_size=0.5,
                      batch_size=256,
                      init_state=MFState(g.components, g.gating))
    mu, var, std, nlpd = m.predict(st, x, y)
    assert float(jnp.sqrt(jnp.mean((mu - y) ** 2))) < 0.2


@pytest.mark.slow
def test_super_iteration_reanchoring(sine):
    """The flagship recipe: Gibbs init -> [SVI -> prior<-posterior] x2
    (evaluate_sine.py:131-155)."""
    x, y = sine
    x, y = x.astype(jnp.float64), y.astype(jnp.float64)
    m = BayesianILR.make(size=30, input_dim=1, output_dim=1, alpha=5.0,
                         kappa=0.05, dtype=jnp.float64)
    m.init_transform(x, y)
    g = m.fit_gibbs((x, y), key=0, maxiter=10)
    state = MFState(g.components, g.gating)
    for it in range(2):
        state, _ = m.fit_svi((x, y), key=10 + it, maxiter=250,
                             step_size=0.5, batch_size=256, init_state=state)
        m = m.with_priors(state)
    mu, _, _, nlpd = m.predict(state, x, y)
    assert float(jnp.sqrt(jnp.mean((mu - y) ** 2))) < 0.2


@pytest.mark.slow
def test_multi_output(rng):
    """2-D input -> 2-D output regression."""
    n = 800
    x = rng.uniform(-2, 2, (n, 2))
    w = np.array([[1.0, -0.5], [0.3, 0.8]])
    y = np.tanh(x @ w) + 0.05 * rng.standard_normal((n, 2))
    x, y = jnp.asarray(x), jnp.asarray(y)
    m = BayesianILR.make(size=12, input_dim=2, output_dim=2, alpha=2.0,
                         kappa=0.05, dtype=jnp.float64)
    m.init_transform(x, y)
    g = m.fit_gibbs((x, y), key=0, maxiter=20)
    st, _ = m.fit_vi((x, y), key=1, maxiter=100,
                     init_state=MFState(g.components, g.gating),
                     randomize=False)
    mu, var, std, nlpd = m.predict(st, x, y)
    assert mu.shape == (n, 2) and var.shape == (n, 2)
    assert float(jnp.sqrt(jnp.mean((mu - y) ** 2))) < 0.15


@pytest.mark.slow
def test_tied_affine_experts(sine):
    """Shared-slope experts with per-component offsets
    (bayesian.py:1222-1522): piecewise-parallel fit of the sine."""
    x, y = sine
    x, y = x.astype(jnp.float64), y.astype(jnp.float64)
    m = BayesianILR.make(size=25, input_dim=1, output_dim=1, alpha=5.0,
                         kappa=0.05, tied_affine=True, maxsubiter=10,
                         dtype=jnp.float64)
    m.init_transform(x, y)
    g = m.fit_gibbs((x, y), key=0, maxiter=30)
    st, vlb = m.fit_vi((x, y), key=1, maxiter=100,
                       init_state=MFState(g.components, g.gating),
                       randomize=False)
    assert np.isfinite(np.asarray(vlb)).all()
    # slope is genuinely shared: single (p, q) matrix in the posterior
    assert st.components[1].M.ndim == 2
    mu, var, std, nlpd = m.predict(st, x, y)
    assert float(jnp.sqrt(jnp.mean((mu - y) ** 2))) < 0.3


@pytest.mark.slow
def test_tied_affine_hier_basis(sine):
    """The hilr tied-activation configuration (hilr.py:79): hierarchical
    basis + tied-affine experts."""
    x, y = sine
    x, y = x.astype(jnp.float64), y.astype(jnp.float64)
    m = BayesianILR.make(size=25, input_dim=1, output_dim=1, alpha=5.0,
                         kappa=0.05, tied_affine=True, hier_basis=True,
                         maxsubiter=10, dtype=jnp.float64)
    m.init_transform(x, y)
    # 60 sweeps: the round-5 EXACT tied-affine/hier draws (PARITY.md)
    # carry full conditional variance — unlike the reference-style inner
    # chains they replaced, which under-dispersed the shared slope/Lambda
    # — so the chain needs more burn-in before the VI warm start (at 30
    # sweeps this seed lands in a two-plateau mode, RMSE 0.69; at 60+ it
    # is at 0.20-0.23)
    g = m.fit_gibbs((x, y), key=0, maxiter=60)
    st, vlb = m.fit_vi((x, y), key=1, maxiter=100,
                       init_state=MFState(g.components, g.gating),
                       randomize=False)
    assert np.isfinite(np.asarray(vlb)).all()
    mu, var, std, nlpd = m.predict(st, x, y)
    assert float(jnp.sqrt(jnp.mean((mu - y) ** 2))) < 0.35


@pytest.mark.slow
def test_nlpd_in_original_units():
    """NLPD must include the standardization Jacobian: scaling y by c with a
    refit transform shifts NLPD by exactly out_dim * log(c) (the
    standardized fits are identical, so the difference is pure
    change-of-variables; the reference omits this term, ilr.py:405-409)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-3, 3, (600, 1)), jnp.float64)
    y = jnp.asarray(np.sin(np.asarray(x))
                    + 0.1 * rng.standard_normal((600, 1)), jnp.float64)
    c = 10.0

    def fit(yv):
        m = BayesianILR.make(size=8, input_dim=1, output_dim=1, alpha=2.0,
                             kappa=0.05, dtype=jnp.float64)
        m.init_transform(x, yv)
        st, _ = m.fit_vi((x, yv), key=3, maxiter=60)
        return m, st

    m1, st1 = fit(y)
    m2, st2 = fit(c * y)
    _, _, _, nlpd1 = m1.predict(st1, x, y)
    _, _, _, nlpd2 = m2.predict(st2, x, c * y)
    np.testing.assert_allclose(np.asarray(nlpd2) - np.asarray(nlpd1),
                               np.log(c), rtol=1e-6)


@pytest.mark.slow
def test_sample_from_fitted_ilr():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-6, 6, (1500, 1)), jnp.float64)
    y = jnp.asarray(np.sin(np.asarray(x))
                    + 0.1 * rng.standard_normal((1500, 1)), jnp.float64)
    m = BayesianILR.make(size=15, input_dim=1, output_dim=1, alpha=2.0,
                         kappa=0.05, dtype=jnp.float64)
    m.init_transform(x, y)
    g = m.fit_gibbs((x, y), key=0, maxiter=25)
    from mimo_tpu.models.mixture import MFState
    st, _ = m.fit_vi((x, y), key=1, maxiter=100,
                     init_state=MFState(g.components, g.gating),
                     randomize=False)
    xs, ys, zs = m.sample(st, key=3, n=20000)
    xs, ys = np.asarray(xs), np.asarray(ys)
    assert np.isfinite(xs).all() and np.isfinite(ys).all()
    # samples live in original units and follow the sine shape
    sel = np.abs(xs[:, 0]) < 5.5
    pred_err = np.abs(ys[sel, 0] - np.sin(xs[sel, 0]))
    assert np.quantile(pred_err, 0.5) < 0.35, np.quantile(pred_err, 0.5)


def test_predict_from_gibbs_state(sine):
    """Predict-after-resample for regression: the Gibbs chain's
    posteriors serve through predict() via MFState (the reference
    user's workflow after examples/ilr gibbs runs)."""
    x, y = sine
    m = BayesianILR.make(size=20, input_dim=1, output_dim=1,
                         gating='stick-breaking', alpha=5.0, kappa=0.05,
                         dtype=jnp.float64)
    m.init_transform(x, y)
    gs = m.fit_gibbs((x, y), key=0, maxiter=60)
    mu, var, std, nlpd = m.predict(
        MFState(components=gs.components, gating=gs.gating), x, y)
    rmse = float(np.sqrt(np.mean(
        (np.asarray(mu) - np.sin(np.asarray(x))) ** 2)))
    assert np.isfinite(np.asarray(nlpd)).all()
    assert rmse < 0.3
