"""Tests for the hierarchically-tied Gaussian family and the two-level
mixture-of-mixtures models (reference: bayesian.py:503-793, hgmm.py,
hilr.py). Parity of the update equations lives in test_reference_parity."""

from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.models.hmix import BayesianMixtureOfMixtures, HMixState
from mimo_tpu.models.mixture import MFState
from mimo_tpu.distributions.niw import GaussParams

TRUE_MU = np.array([[-4., 0.], [4., 0.], [0., 5.]])


@pytest.fixture(scope='module')
def data():
    key = jax.random.PRNGKey(7)
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(jnp.asarray(TRUE_MU), lm),
                                jnp.asarray([.3, .4, .3]), 3000)
    return x.astype(jnp.float64)


def test_hier_gibbs_recovers(data):
    m = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0,
                         hierarchical=True, kappa=0.05, psi_scale=0.5,
                         dtype=jnp.float64)
    gs = m.fit_gibbs(data, key=2, maxiter=100)
    counts = np.bincount(np.asarray(gs.labels), minlength=8)
    est = np.asarray(gs.components.mus)[counts > 100]
    for t in TRUE_MU:
        assert np.min(np.linalg.norm(est - t, axis=-1)) < 0.4


def test_hier_vi_warm_monotone(data):
    """VI warm-started from Gibbs: monotone ELBO + mean recovery
    (the reference's hgauss/hgmm recipe is Gibbs-first)."""
    m = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0,
                         hierarchical=True, kappa=0.05, psi_scale=0.5,
                         dtype=jnp.float64)
    gs = m.fit_gibbs(data, key=2, maxiter=50)
    st, vlb = m.fit_vi(data, key=1, maxiter=100,
                       init_state=MFState(gs.components, gs.gating),
                       randomize=False)
    d = np.diff(np.asarray(vlb))
    assert np.all(d > -1e-6), f'hier VI not monotone: {d.min()}'
    used = np.asarray(m.used_labels(st, (data,)))
    est = np.asarray(st.components.mus)[used]
    for t in TRUE_MU:
        assert np.min(np.linalg.norm(est - t, axis=-1)) < 0.4
    # tied: every component shares the single hyper Wishart
    assert st.components.hyper.psi.shape[0] == 1


def test_hier_svi_runs(data):
    m = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0,
                         hierarchical=True, kappa=0.05, psi_scale=0.5,
                         dtype=jnp.float64)
    gs = m.fit_gibbs(data, key=2, maxiter=30)
    st, _ = m.fit_svi(data, key=3, maxiter=100, step_size=0.5,
                      batch_size=512,
                      init_state=MFState(gs.components, gs.gating))
    assert np.isfinite(np.asarray(st.components.mus)).all()
    assert np.isfinite(np.asarray(st.components.hyper.psi)).all()


@pytest.fixture(scope='module')
def nested_data():
    rng = np.random.default_rng(0)

    def blob(c, n):
        return c + 0.5 * rng.standard_normal((n, 2))

    x = np.vstack([blob([-5, -5], 500), blob([-5, -3], 500),
                   blob([5, 5], 500), blob([5, 3], 500)])
    return jnp.asarray(x[rng.permutation(2000)])


def test_mixture_of_mixtures_vi_separates(nested_data):
    """With informative per-cluster hyper means, VI assigns the two
    super-clusters to distinct outer labels."""
    x = nested_data
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=True,
        kappa=0.5, psi_scale=0.5, maxsubiter=5,
        means=[[-5, -4], [5, 4]], dtype=jnp.float64)
    st, tr = m.fit_vi(x, key=0, maxiter=50, maxsubiter=3)
    assert np.isfinite(np.asarray(tr)).all()
    resp = m.expected_responsibilities(st, (x,))
    lab = np.asarray(jnp.argmax(resp, -1))
    left = np.asarray(x)[:, 0] < 0
    l_major = Counter(lab[left].tolist()).most_common(1)[0]
    r_major = Counter(lab[~left].tolist()).most_common(1)[0]
    assert l_major[0] != r_major[0]
    assert l_major[1] > 900 and r_major[1] > 900


def test_mixture_of_mixtures_gibbs_runs(nested_data):
    x = nested_data
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=True,
        kappa=0.5, psi_scale=0.5, maxsubiter=5,
        means=[[-5, -4], [5, 4]], dtype=jnp.float64)
    gs = m.fit_gibbs(x, key=1, maxiter=40, maxsubiter=3)
    counts = np.bincount(np.asarray(gs.labels), minlength=2)
    assert counts.sum() == x.shape[0]
    assert np.isfinite(np.asarray(
        jax.tree.leaves(gs.components)[0])).all()


def test_mixture_of_mixtures_ilr_builds(nested_data):
    """Nested ILR (hilr.py:293-) constructs and runs one VI fit."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-2, 2, (600, 1)))
    y = jnp.asarray(np.sin(np.asarray(x) * 3) + 0.1 * rng.standard_normal((600, 1)))
    m = BayesianMixtureOfMixtures.make_ilr(
        cluster_size=2, mixture_size=4, input_dim=1, output_dim=1,
        kappa=0.05, dtype=jnp.float64)
    st, tr = m.fit_vi((x, y), key=0, maxiter=30, maxsubiter=2)
    assert np.isfinite(np.asarray(tr)).all()


@pytest.mark.slow
def test_mixture_of_mixtures_ilr_predict():
    """Two-level predictive (hilr.py:527-609): moment-matched prediction
    on a sine reaches the noise floor; mode prediction and NLPD work."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-3, 3, (1500, 1)))
    y = jnp.asarray(np.sin(np.asarray(x) * 2)
                    + 0.1 * rng.standard_normal((1500, 1)))
    m = BayesianMixtureOfMixtures.make_ilr(
        cluster_size=2, mixture_size=8, input_dim=1, output_dim=1,
        kappa=0.05, dtype=jnp.float64)
    m.init_transform(x, y)
    st, tr = m.fit_vi((x, y), key=2, maxiter=80, maxsubiter=3)
    mu, var, std, nlpd = m.predict(st, x, y)
    rmse = float(jnp.sqrt(jnp.mean((mu - y) ** 2)))
    assert rmse < 0.25, rmse
    assert np.isfinite(np.asarray(nlpd)).all()
    assert np.all(np.asarray(var) > 0)
    mu_m, _, _, _ = m.predict(st, x, prediction='mode')
    assert float(jnp.sqrt(jnp.mean((mu_m - y) ** 2))) < 0.35
    w = m.predictive_weights(st, m.input_transform.transform(x))
    np.testing.assert_allclose(np.asarray(w.sum(axis=(1, 2))), 1.0,
                               rtol=1e-6)


@pytest.mark.slow
def test_mixture_of_mixtures_log_predictive(nested_data):
    """Predictive density of the nested GMM: in-distribution points score
    higher than far-away outliers."""
    x = nested_data
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=True,
        kappa=0.5, psi_scale=0.5, maxsubiter=5,
        means=[[-5, -4], [5, 4]], dtype=jnp.float64)
    st, _ = m.fit_vi(x, key=0, maxiter=50, maxsubiter=3)
    lp_in = np.asarray(m.log_predictive(st, x[:100]))
    lp_out = np.asarray(m.log_predictive(
        st, jnp.full((5, 2), 50.0, jnp.float64)))
    assert np.isfinite(lp_in).all()
    assert lp_in.mean() > lp_out.max() + 10


def test_mixture_of_mixtures_em(nested_data):
    """Likelihood-only nested EM (hgmm.py:59-88): monotone loglik trace
    and recovery of the two super-clusters via plug-in responsibilities."""
    x = nested_data
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=False,
        kappa=0.5, psi_scale=0.5, dtype=jnp.float64)
    # best-of-N restarts by final loglik — the reference's own recipe for
    # EM local optima (examples/gmm/sine/svi_gmm.py:57-67 best-of-5)
    fits = [m.fit_em(x, key=s, maxiter=60, maxsubiter=4)
            for s in range(4)]
    st, tr = max(fits, key=lambda f: float(f[1][-1]))
    tr = np.asarray(tr)
    assert np.isfinite(tr).all()
    assert tr[-1] > tr[0]
    # trace is near-monotone after the first sweeps (EM guarantees
    # monotonicity per fixed outer resp; the nested schedule may wiggle)
    assert tr[-1] >= tr[10:].min() - 1e-6
    resp = m.responsibilities(st, x)
    lab = np.asarray(jnp.argmax(resp, -1))
    left = np.asarray(x)[:, 0] < 0
    l_major = Counter(lab[left].tolist()).most_common(1)[0]
    r_major = Counter(lab[~left].tolist()).most_common(1)[0]
    assert l_major[0] != r_major[0]
    assert l_major[1] > 800 and r_major[1] > 800
    # marginal log-likelihood agrees with the trace's final value
    ll = float(m.log_likelihood(st, x).sum())
    np.testing.assert_allclose(ll, tr[-1], rtol=1e-6)


def test_mixture_of_mixtures_em_ilr():
    """Nested likelihood-only EM for the ILR variant (hilr.py:39-78)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-2, 2, (800, 1)))
    y = jnp.asarray(np.sin(np.asarray(x) * 3)
                    + 0.1 * rng.standard_normal((800, 1)))
    m = BayesianMixtureOfMixtures.make_ilr(
        cluster_size=2, mixture_size=4, input_dim=1, output_dim=1,
        kappa=0.05, dtype=jnp.float64)
    st, tr = m.fit_em((x, y), key=0, maxiter=40, maxsubiter=3)
    tr = np.asarray(tr)
    assert np.isfinite(tr).all()
    assert tr[-1] > tr[0]


def test_hmix_svi_step_size_is_traced():
    """Regression: hmix.fit_svi used to bake step_size into the cached
    jitted closure — a second call with a different step size silently
    reused the first. Different step sizes must give different states."""
    rng = np.random.default_rng(2)
    x = np.vstack([rng.standard_normal((300, 2)) + [-4, 0],
                   rng.standard_normal((300, 2)) + [4, 0]])
    x = jnp.asarray(x, jnp.float64)
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=2, dim=2, hierarchical=False,
        kappa=0.5, psi_scale=0.5, dtype=jnp.float64)
    st0, _ = m.fit_vi(x, key=0, maxiter=5, maxsubiter=2)
    s_big = m.fit_svi(x, key=1, maxiter=20, step_size=0.5, batch_size=128,
                      maxsubiter=2, init_state=st0, randomize=False)
    s_small = m.fit_svi(x, key=1, maxiter=20, step_size=0.01,
                        batch_size=128, maxsubiter=2, init_state=st0,
                        randomize=False)
    diffs = [float(jnp.max(jnp.abs(a - b)))
             for a, b in zip(jax.tree.leaves(s_big),
                             jax.tree.leaves(s_small))]
    assert max(diffs) > 1e-6, 'step_size had no effect (stale closure)'


def test_hmix_fused_vi_gmm():
    """Nested fused VI (flat M*K softmax) separates the super-clusters and
    reports a finite, increasing nested ELBO."""
    rng = np.random.default_rng(0)

    def blob(c, n):
        return c + 0.5 * rng.standard_normal((n, 2))

    x = np.vstack([blob([-5, -5], 500), blob([-5, -3], 500),
                   blob([5, 5], 500), blob([5, 3], 500)])
    x = jnp.asarray(x[rng.permutation(2000)], jnp.float64)
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=True,
        kappa=0.5, psi_scale=0.5, maxsubiter=5,
        means=[[-5, -4], [5, 4]], dtype=jnp.float64)
    st, vlb = m.fit_vi_fused(x, key=0, maxiter=40, block_size=500)
    vlb = np.asarray(vlb)
    assert np.isfinite(vlb).all() and vlb[-1] > vlb[0]
    resp = m.expected_responsibilities(st, (x,))
    lab = np.asarray(jnp.argmax(resp, -1))
    left = np.asarray(x)[:, 0] < 0
    assert (lab[left] == lab[left][0]).mean() > 0.9
    assert (lab[~left] == lab[~left][0]).mean() > 0.9
    assert lab[left][0] != lab[~left][0]
    # non-hierarchical inner family too
    m2 = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=False,
        kappa=0.5, psi_scale=0.5, means=[[-5, -4], [5, 4]],
        dtype=jnp.float64)
    st2, v2 = m2.fit_vi_fused(x, key=0, maxiter=40, block_size=500)
    assert np.isfinite(np.asarray(v2)).all()


@pytest.mark.slow
def test_hmix_fused_vi_ilr():
    rng = np.random.default_rng(3)
    n = 800
    x1 = rng.uniform(-2, 0, (n // 2, 1))
    x2 = rng.uniform(0, 2, (n // 2, 1))
    y = np.vstack([1.5 * x1 + 1, -2.0 * x2 + 0.5]) \
        + 0.05 * rng.standard_normal((n, 1))
    x = jnp.asarray(np.vstack([x1, x2]), jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    m = BayesianMixtureOfMixtures.make_ilr(
        cluster_size=2, mixture_size=2, input_dim=1, output_dim=1,
        kappa=0.05, dtype=jnp.float64)
    st, vlb = m.fit_vi_fused((x, y), key=1, maxiter=60, block_size=400)
    vlb = np.asarray(vlb)
    assert np.isfinite(vlb).all() and vlb[-1] > vlb[0]
    mu, _, _, nlpd = m.predict(st, x, y)
    rmse = float(jnp.sqrt(jnp.mean((mu - y) ** 2)))
    assert rmse < 0.3, rmse


def test_mixture_of_mixtures_map(nested_data):
    """Nested MAP-EM (the one engine x model cell the reference declares
    but never implements — hilr.py:341-344 raises NotImplementedError):
    posterior update + mode plug-in at both levels, weight-masked. The
    trace must improve and the super-clusters separate, and the map
    estimate must behave like the EM one with priors (shrinkage)."""
    x = nested_data
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=False,
        kappa=0.5, psi_scale=0.5, dtype=jnp.float64)
    fits = [m.fit_map(x, key=s, maxiter=60, maxsubiter=4)
            for s in range(4)]
    st, tr = max(fits, key=lambda f: float(f[1][-1]))
    tr = np.asarray(tr)
    assert np.isfinite(tr).all()
    assert tr[-1] > tr[0]
    assert tr[-1] >= tr[10:].min() - 1e-6
    # posterior state is a valid HMixState: predictive + outer resp work
    resp = m.expected_responsibilities(st, (x,))
    lab = np.asarray(jnp.argmax(resp, -1))
    left = np.asarray(x)[:, 0] < 0
    l_major = Counter(lab[left].tolist()).most_common(1)[0]
    r_major = Counter(lab[~left].tolist()).most_common(1)[0]
    assert l_major[0] != r_major[0]
    assert l_major[1] > 800 and r_major[1] > 800
    lp = np.asarray(m.log_predictive(st, x[:50]))
    assert np.isfinite(lp).all()


def test_mixture_of_mixtures_map_ilr():
    """Nested MAP for the ILR variant."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-2, 2, (800, 1)))
    y = jnp.asarray(np.sin(np.asarray(x) * 3)
                    + 0.1 * rng.standard_normal((800, 1)))
    m = BayesianMixtureOfMixtures.make_ilr(
        cluster_size=2, mixture_size=4, input_dim=1, output_dim=1,
        kappa=0.05, dtype=jnp.float64)
    st, tr = m.fit_map((x, y), key=0, maxiter=40, maxsubiter=3)
    tr = np.asarray(tr)
    assert np.isfinite(tr).all()
    assert tr[-1] > tr[0]
    mu, _, _, _ = m.predict(st, x)
    assert np.isfinite(np.asarray(mu)).all()


def test_hmix_fused_gibbs_gmm(nested_data):
    """Nested fused Gibbs (joint flat (z, c) label sweep) recovers the two
    super-clusters without ever materializing the (M, N, K) log-prob
    tensor of fit_gibbs."""
    x = nested_data
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=False,
        kappa=0.5, psi_scale=0.5, means=[[-5, -4], [5, 4]],
        dtype=jnp.float64)
    gs = m.fit_gibbs_fused(x, key=1, maxiter=40, block_size=500)
    counts = np.bincount(np.asarray(gs.labels), minlength=2)
    assert counts.sum() == x.shape[0]
    lab = np.asarray(gs.labels)
    left = np.asarray(x)[:, 0] < 0
    l_major = Counter(lab[left].tolist()).most_common(1)[0]
    r_major = Counter(lab[~left].tolist()).most_common(1)[0]
    assert l_major[0] != r_major[0]
    assert l_major[1] > 900 and r_major[1] > 900
    assert np.isfinite(np.asarray(
        jax.tree.leaves(gs.components)[0])).all()
    # hierarchical inner family goes through gibbs_update
    mh = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=True,
        kappa=0.5, psi_scale=0.5, maxsubiter=4,
        means=[[-5, -4], [5, 4]], dtype=jnp.float64)
    gsh = mh.fit_gibbs_fused(x, key=1, maxiter=30, block_size=500)
    assert np.bincount(np.asarray(gsh.labels), minlength=2).sum() == \
        x.shape[0]
    assert np.isfinite(np.asarray(
        jax.tree.leaves(gsh.components)[0])).all()


def test_hmix_fused_gibbs_ilr():
    rng = np.random.default_rng(3)
    n = 800
    x1 = rng.uniform(-2, 0, (n // 2, 1))
    x2 = rng.uniform(0, 2, (n // 2, 1))
    y = np.vstack([1.5 * x1 + 1, -2.0 * x2 + 0.5]) \
        + 0.05 * rng.standard_normal((n, 1))
    x = jnp.asarray(np.vstack([x1, x2]), jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    m = BayesianMixtureOfMixtures.make_ilr(
        cluster_size=2, mixture_size=2, input_dim=1, output_dim=1,
        kappa=0.05, dtype=jnp.float64)
    gs = m.fit_gibbs_fused((x, y), key=1, maxiter=50, block_size=400)
    st = HMixState(outer_gating=gs.outer_gating,
                   inner_gating=gs.inner_gating,
                   components=gs.components)
    mu, _, _, _ = m.predict(st, x)
    assert np.isfinite(np.asarray(mu)).all()


def test_hmix_fused_em(nested_data):
    """Nested fused EM (flat M*K plug-in softmax): the loglik trace must
    improve and the super-clusters separate; the ILR variant runs too.
    The (M, N, K) responsibility tensor of fit_em never exists."""
    x = jnp.asarray(nested_data, jnp.float64)
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=False,
        kappa=0.5, psi_scale=0.5, dtype=jnp.float64)
    fits = [m.fit_em_fused(x, key=s, maxiter=80, block_size=500)
            for s in range(6)]
    st, tr = max(fits, key=lambda f: float(f[1][-1]))
    tr = np.asarray(tr)
    assert np.isfinite(tr).all() and tr[-1] > tr[0]
    # engine-correctness oracle: both traces are sum_n log sum_{m,k}
    # exp(joint loglik), so the fused best must reach the dense fit_em's
    # best (outer grouping under a symmetric init is model selection —
    # label permutations don't move this number)
    dense_best = max(float(m.fit_em(x, key=s, maxiter=50,
                                    maxsubiter=1)[1][-1])
                     for s in range(3))
    assert float(tr[-1]) >= dense_best - 0.05 * x.shape[0]
    # HMixEMState surfaces work: responsibilities + log_likelihood
    resp = m.responsibilities(st, (x,))
    assert resp.shape == (x.shape[0], 2)
    assert np.isfinite(np.asarray(m.log_likelihood(st, (x,)))).all()
    # hierarchical families have no ML update: actionable gate
    mh = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=True,
        dtype=jnp.float64)
    with pytest.raises(NotImplementedError, match='maximum-likelihood'):
        mh.fit_em_fused(x, maxiter=2, block_size=500)


def test_hmix_fused_em_ilr():
    rng = np.random.default_rng(3)
    n = 800
    x1 = rng.uniform(-2, 0, (n // 2, 1))
    x2 = rng.uniform(0, 2, (n // 2, 1))
    y = np.vstack([1.5 * x1 + 1, -2.0 * x2 + 0.5]) \
        + 0.05 * rng.standard_normal((n, 1))
    x = jnp.asarray(np.vstack([x1, x2]), jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    m = BayesianMixtureOfMixtures.make_ilr(
        cluster_size=2, mixture_size=2, input_dim=1, output_dim=1,
        kappa=0.05, dtype=jnp.float64)
    st, tr = m.fit_em_fused((x, y), key=1, maxiter=40, block_size=400)
    tr = np.asarray(tr)
    assert np.isfinite(tr).all() and tr[-1] > tr[0]


def test_hmix_fused_map(nested_data):
    """Nested fused MAP-EM: trace improves, super-clusters separate, and
    the returned HMixState feeds the standard surfaces (predictive,
    outer responsibilities) — MAP at HBM-resident N."""
    x = jnp.asarray(nested_data, jnp.float64)
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=False,
        kappa=0.5, psi_scale=0.5, means=[[-5, -4], [5, 4]],
        dtype=jnp.float64)
    fits = [m.fit_map_fused(x, key=s, maxiter=50, block_size=500)
            for s in range(3)]
    st, tr = max(fits, key=lambda f: float(f[1][-1]))
    tr = np.asarray(tr)
    assert np.isfinite(tr).all() and tr[-1] > tr[0]
    resp = m.expected_responsibilities(st, (x,))
    lab = np.asarray(jnp.argmax(resp, -1))
    left = np.asarray(x)[:, 0] < 0
    l_major = Counter(lab[left].tolist()).most_common(1)[0]
    r_major = Counter(lab[~left].tolist()).most_common(1)[0]
    assert l_major[0] != r_major[0]
    assert l_major[1] > 800 and r_major[1] > 800
    lp = np.asarray(m.log_predictive(st, x[:50]))
    assert np.isfinite(lp).all()


def test_hmix_svi_mesh(nested_data):
    """Nested SVI on the 8-device CPU mesh: stratified per-device
    minibatches + psum'd two-level stats produce a finite posterior that
    separates the super-clusters (the flat fit_svi's sharding scheme at
    both levels)."""
    from mimo_tpu.parallel.mesh import make_mesh, shard_data
    x = jnp.asarray(nested_data, jnp.float64)
    mesh = make_mesh()
    xs = shard_data(mesh, x)
    m = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=False,
        kappa=0.5, psi_scale=0.5, means=[[-5, -4], [5, 4]],
        dtype=jnp.float64)
    st = m.fit_svi(xs, key=1, maxiter=150, step_size=0.5,
                   batch_size=512, maxsubiter=2, mesh=mesh)
    leaves = jax.tree.leaves(st.components)
    assert all(np.isfinite(np.asarray(a)).all() for a in leaves)
    resp = m.expected_responsibilities(st, (x,))
    lab = np.asarray(jnp.argmax(resp, -1))
    left = np.asarray(x)[:, 0] < 0
    l_major = Counter(lab[left].tolist()).most_common(1)[0]
    r_major = Counter(lab[~left].tolist()).most_common(1)[0]
    assert l_major[0] != r_major[0]
    assert l_major[1] > 800 and r_major[1] > 800
    # batch size must divide the mesh
    with pytest.raises(ValueError, match='multiple'):
        m.fit_svi(xs, key=1, maxiter=2, batch_size=511, mesh=mesh)
