"""Golden-parity tests: run the REFERENCE package's NumPy implementations as
oracles on identical inputs and compare posteriors/expectations bit-for-bit
(to fp tolerance). The reference is imported, never copied.

Skipped automatically when /root/reference is absent (e.g. CI elsewhere).
"""

import sys

import numpy as np
import pytest

try:
    sys.path.insert(0, '/root/reference')
    import mimo.distributions as ref  # noqa: F401
    HAVE_REF = True
except Exception:  # pragma: no cover
    HAVE_REF = False

import jax.numpy as jnp

from mimo_tpu.distributions import niw as jniw
from mimo_tpu.distributions import mnw as jmnw
from mimo_tpu.distributions import gating as jgating

pytestmark = pytest.mark.skipif(not HAVE_REF, reason='reference unavailable')


@pytest.fixture
def gauss_problem(rng):
    k, d, n = 5, 3, 100
    x = rng.standard_normal((n, d)) * 2 + 1
    resp = rng.uniform(0.01, 1.0, (n, k))
    mus = rng.standard_normal((k, d))
    kappas = rng.uniform(0.5, 2.0, k)
    a = rng.standard_normal((k, d, d))
    psis = np.einsum('kij,klj->kil', a, a) + 3 * np.eye(d)
    nus = rng.uniform(d + 2.0, d + 6.0, k)
    return x, resp, mus, kappas, psis, nus


def _ref_stacked_nw(mus, kappas, psis, nus):
    k, d = mus.shape
    from mimo.distributions import StackedNormalWisharts
    return StackedNormalWisharts(size=k, dim=d, mus=mus.copy(),
                                 kappas=kappas.copy(), psis=psis.copy(),
                                 nus=nus.copy())


def test_niw_posterior_update_parity(gauss_problem):
    """posterior.nat_param = prior.nat_param + weighted_statistics
    (bayesian.py:217-222) vs our posterior_update."""
    x, resp, mus, kappas, psis, nus = gauss_problem
    k, d = mus.shape

    # --- reference path
    from mimo.distributions import StackedGaussiansWithPrecision
    prior = _ref_stacked_nw(mus, kappas, psis, nus)
    lik = StackedGaussiansWithPrecision(
        size=k, dim=d, mus=mus.copy(),
        lmbdas=np.tile(np.eye(d), (k, 1, 1)))
    stats = lik.weighted_statistics(x, resp.T)  # reference is (K, N)
    post = _ref_stacked_nw(mus, kappas, psis, nus)
    post.nat_param = prior.nat_param + stats
    ref_mu, ref_kappa, ref_psi, ref_nu = post.params

    # --- ours
    p = jniw.NIW(mu=jnp.asarray(mus), kappa=jnp.asarray(kappas),
                 psi=jnp.asarray(psis), nu=jnp.asarray(nus))
    ours = jniw.posterior_update(p, jniw.suff_stats(jnp.asarray(x),
                                                    jnp.asarray(resp)))
    np.testing.assert_allclose(ours.mu, ref_mu, rtol=1e-8)
    np.testing.assert_allclose(ours.kappa, ref_kappa, rtol=1e-10)
    np.testing.assert_allclose(ours.psi, ref_psi, rtol=1e-6)
    np.testing.assert_allclose(ours.nu, ref_nu, rtol=1e-10)


def test_niw_expected_log_likelihood_parity(gauss_problem):
    """bayesian.py:287-301 vs our fused expected_log_likelihood."""
    x, resp, mus, kappas, psis, nus = gauss_problem
    k, d = mus.shape
    from mimo.distributions import StackedGaussiansWithNormalWisharts
    prior = _ref_stacked_nw(mus, kappas, psis, nus)
    pair = StackedGaussiansWithNormalWisharts(size=k, dim=d, prior=prior)
    ref_ell = pair.expected_log_likelihood(x)          # (K, N)

    p = jniw.NIW(mu=jnp.asarray(mus), kappa=jnp.asarray(kappas),
                 psi=jnp.asarray(psis), nu=jnp.asarray(nus))
    ours = jniw.expected_log_likelihood(p, jnp.asarray(x))  # (N, K)
    np.testing.assert_allclose(ours, ref_ell.T, rtol=1e-6, atol=1e-8)


def test_niw_variational_lowerbound_parity(gauss_problem):
    """entropy - cross_entropy (bayesian.py:240-243) == -KL(q||p)."""
    x, resp, mus, kappas, psis, nus = gauss_problem
    k, d = mus.shape
    q_mus = mus + 0.3
    q_kappas = kappas * 2.0
    q_psis = psis * 1.3
    q_nus = nus + 3.0

    prior = _ref_stacked_nw(mus, kappas, psis, nus)
    post = _ref_stacked_nw(q_mus, q_kappas, q_psis, q_nus)
    ref_vlb = post.entropy() - post.cross_entropy(prior)   # (K,)

    p = jniw.NIW(jnp.asarray(mus), jnp.asarray(kappas),
                 jnp.asarray(psis), jnp.asarray(nus))
    q = jniw.NIW(jnp.asarray(q_mus), jnp.asarray(q_kappas),
                 jnp.asarray(q_psis), jnp.asarray(q_nus))
    np.testing.assert_allclose(-jniw.kl_divergence(q, p), ref_vlb,
                               rtol=1e-6, atol=1e-8)


def test_niw_predictive_parity(gauss_problem):
    """posterior_predictive_studentt params (bayesian.py:314-319)."""
    x, resp, mus, kappas, psis, nus = gauss_problem
    k, d = mus.shape
    from mimo.distributions import StackedGaussiansWithNormalWisharts
    pair = StackedGaussiansWithNormalWisharts(
        size=k, dim=d, prior=_ref_stacked_nw(mus, kappas, psis, nus))
    ref_mus, ref_lmbdas, ref_dfs = pair.posterior_predictive_studentt()

    p = jniw.NIW(jnp.asarray(mus), jnp.asarray(kappas),
                 jnp.asarray(psis), jnp.asarray(nus))
    mus_j, lmbdas_j, dfs_j = jniw.predictive_studentt_params(p)
    np.testing.assert_allclose(mus_j, ref_mus, rtol=1e-10)
    np.testing.assert_allclose(lmbdas_j, ref_lmbdas, rtol=1e-8)
    np.testing.assert_allclose(dfs_j, ref_dfs, rtol=1e-10)


@pytest.fixture
def lingauss_problem(rng):
    k, p, q_in, n = 4, 2, 3, 80
    x = rng.standard_normal((n, q_in))
    y = rng.standard_normal((n, p))
    resp = rng.uniform(0.01, 1.0, (n, k))
    Ms = rng.standard_normal((k, p, q_in + 1))
    a = rng.standard_normal((k, q_in + 1, q_in + 1))
    Ks = np.einsum('kij,klj->kil', a, a) + 2 * np.eye(q_in + 1)
    b = rng.standard_normal((k, p, p))
    psis = np.einsum('kij,klj->kil', b, b) + 2 * np.eye(p)
    nus = rng.uniform(p + 2.0, p + 6.0, k)
    return x, y, resp, Ms, Ks, psis, nus


def _ref_stacked_mnw(Ms, Ks, psis, nus):
    k, p, q = Ms.shape
    from mimo.distributions import StackedMatrixNormalWisharts
    return StackedMatrixNormalWisharts(size=k, column_dim=q, row_dim=p,
                                       Ms=Ms.copy(), Ks=Ks.copy(),
                                       psis=psis.copy(), nus=nus.copy())


def test_mnw_posterior_update_parity(lingauss_problem):
    x, y, resp, Ms, Ks, psis, nus = lingauss_problem
    k, p, q = Ms.shape
    from mimo.distributions import StackedLinearGaussiansWithPrecision
    lik = StackedLinearGaussiansWithPrecision(
        size=k, column_dim=q - 1, row_dim=p,
        As=Ms.copy(), lmbdas=np.tile(np.eye(p), (k, 1, 1)), affine=True)
    stats = lik.weighted_statistics(x, y, resp.T)
    prior = _ref_stacked_mnw(Ms, Ks, psis, nus)
    post = _ref_stacked_mnw(Ms, Ks, psis, nus)
    post.nat_param = prior.nat_param + stats
    ref_M, ref_K, ref_psi, ref_nu = post.params

    pj = jmnw.MNW(M=jnp.asarray(Ms), K_=jnp.asarray(Ks),
                  psi=jnp.asarray(psis), nu=jnp.asarray(nus))
    xa = jmnw.augment(jnp.asarray(x), True)
    ours = jmnw.posterior_update(
        pj, jmnw.suff_stats(xa, jnp.asarray(y), jnp.asarray(resp)))
    np.testing.assert_allclose(ours.M, ref_M, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(ours.K_, ref_K, rtol=1e-8)
    np.testing.assert_allclose(ours.psi, ref_psi, rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(ours.nu, ref_nu, rtol=1e-10)


def test_mnw_expected_log_likelihood_parity(lingauss_problem):
    x, y, resp, Ms, Ks, psis, nus = lingauss_problem
    k, p, q = Ms.shape
    from mimo.distributions import StackedLinearGaussiansWithMatrixNormalWisharts
    pair = StackedLinearGaussiansWithMatrixNormalWisharts(
        size=k, column_dim=q - 1, row_dim=p,
        prior=_ref_stacked_mnw(Ms, Ks, psis, nus), affine=True)
    ref_ell = pair.expected_log_likelihood(x, y)        # (K, N)

    pj = jmnw.MNW(M=jnp.asarray(Ms), K_=jnp.asarray(Ks),
                  psi=jnp.asarray(psis), nu=jnp.asarray(nus))
    xa = jmnw.augment(jnp.asarray(x), True)
    ours = jmnw.expected_log_likelihood(pj, xa, jnp.asarray(y))
    np.testing.assert_allclose(ours, ref_ell.T, rtol=1e-6, atol=1e-7)


def test_stickbreaking_update_parity(rng):
    """gamma/delta updates incl. the reverse-cumsum trick
    (bayesian.py:151-159)."""
    k = 7
    counts = rng.uniform(0.0, 20.0, k)
    gammas = rng.uniform(0.5, 2.0, k)
    deltas = rng.uniform(0.5, 5.0, k)

    from mimo.distributions import TruncatedStickBreaking, Categorical
    from mimo.distributions.bayesian import CategoricalWithStickBreaking
    prior = TruncatedStickBreaking(dim=k, gammas=gammas.copy(),
                                   deltas=deltas.copy())
    pair = CategoricalWithStickBreaking(
        dim=k, prior=prior,
        likelihood=Categorical(dim=k, probs=np.ones(k) / k))
    # reference computes counts from weights via Categorical stats; feed
    # resp whose column sums equal `counts`
    n = 50
    resp = rng.uniform(0.01, 1.0, (k, n))
    resp *= (counts / resp.sum(1))[:, None]
    pair.meanfield_update(None, resp)

    ours_prior = jgating.StickBreaking(gamma=jnp.asarray(gammas),
                                       delta=jnp.asarray(deltas))
    ours = ours_prior.update(jnp.asarray(resp.sum(1)))
    np.testing.assert_allclose(ours.gamma, pair.posterior.gammas, rtol=1e-8)
    np.testing.assert_allclose(ours.delta, pair.posterior.deltas, rtol=1e-8)

    # expected log pi assembly (gmm.py:251-252)
    log_stick, log_rest = pair.expected_log_likelihood()
    ref_log_pi = log_stick + np.hstack((0, np.cumsum(log_rest)[:-1]))
    np.testing.assert_allclose(ours.expected_log_pi(), ref_log_pi, rtol=1e-8)


def test_dirichlet_parity(rng):
    k = 6
    counts = rng.uniform(0.0, 30.0, k)
    alphas = rng.uniform(0.5, 3.0, k)
    from mimo.distributions import Dirichlet as RefDirichlet
    ref = RefDirichlet(dim=k, alphas=alphas + counts)

    ours = jgating.Dirichlet(alpha=jnp.asarray(alphas)).update(
        jnp.asarray(counts))
    np.testing.assert_allclose(ours.alpha, ref.alphas, rtol=1e-10)
    np.testing.assert_allclose(ours.expected_log_pi(),
                               ref.expected_statistics(), rtol=1e-8)
    np.testing.assert_allclose(ours.mean(), ref.mean(), rtol=1e-10)


def test_hierarchical_tied_meanfield_parity(rng):
    """TiedGaussiansWithHierarchicalNormalWisharts.meanfield_update
    (bayesian.py:662-689) vs our hierarchical posterior_update: same stats,
    same inner-iteration count -> identical hyper-posterior and q(mu_k)."""
    k, d, n = 4, 2, 200
    x = rng.standard_normal((n, d)) * 2 + 0.5
    resp = rng.uniform(0.01, 1.0, (n, k))

    kappas = rng.uniform(0.5, 2.0, k)
    m0 = rng.standard_normal(d)
    kappa0 = 0.3
    a = rng.standard_normal((d, d))
    psi0 = a @ a.T + 2 * np.eye(d)
    nu0 = d + 3.0

    from mimo.distributions import (NormalWishart,
                                    TiedGaussiansWithScaledPrecision)
    from mimo.distributions.bayesian import (
        TiedGaussiansWithHierarchicalNormalWisharts)
    hyper = NormalWishart(dim=d, mu=m0.copy(), kappa=kappa0,
                          psi=psi0.copy(), nu=nu0)
    prior = TiedGaussiansWithScaledPrecision(size=k, dim=d,
                                             kappas=kappas.copy())
    pair = TiedGaussiansWithHierarchicalNormalWisharts(
        size=k, dim=d, hyper_prior=hyper, prior=prior)
    pair.meanfield_update(x, resp.T, nb_iter=7)
    ref_rho, ref_kappa, ref_psi, ref_nu = pair.hyper_posterior.params
    ref_mus = pair.posterior.mus

    from mimo_tpu.distributions import hierarchical as jh
    from mimo_tpu.distributions import niw as jniw2
    hp = jh.HierTied(
        hyper=jniw2.NIW(mu=jnp.asarray(m0)[None],
                        kappa=jnp.asarray([kappa0]),
                        psi=jnp.asarray(psi0)[None],
                        nu=jnp.asarray([nu0])),
        mus=jnp.zeros((k, d)),
        kappas=jnp.asarray(kappas), kappas0=jnp.asarray(kappas))
    stats = jniw2.suff_stats(jnp.asarray(x), jnp.asarray(resp))
    post = jh.posterior_update(hp, stats, nb_iter=7)

    np.testing.assert_allclose(post.hyper.mu[0], ref_rho, rtol=1e-8)
    np.testing.assert_allclose(post.hyper.kappa[0], ref_kappa, rtol=1e-10)
    np.testing.assert_allclose(post.hyper.psi[0], ref_psi, rtol=1e-6)
    np.testing.assert_allclose(post.hyper.nu[0], ref_nu, rtol=1e-10)
    np.testing.assert_allclose(post.mus, ref_mus, rtol=1e-7)


def test_hierarchical_ell_parity(rng):
    """expected_log_likelihood (bayesian.py:731-749) parity after one VI
    update (posterior lmbdas = hyper wishart mean, as the reference sets)."""
    k, d, n = 3, 2, 60
    x = rng.standard_normal((n, d))
    resp = rng.uniform(0.01, 1.0, (n, k))
    kappas = rng.uniform(0.5, 2.0, k)
    m0 = rng.standard_normal(d)
    kappa0, nu0 = 0.4, d + 3.0
    a = rng.standard_normal((d, d))
    psi0 = a @ a.T + 2 * np.eye(d)

    from mimo.distributions import (NormalWishart,
                                    TiedGaussiansWithScaledPrecision)
    from mimo.distributions.bayesian import (
        TiedGaussiansWithHierarchicalNormalWisharts)
    pair = TiedGaussiansWithHierarchicalNormalWisharts(
        size=k, dim=d,
        hyper_prior=NormalWishart(dim=d, mu=m0.copy(), kappa=kappa0,
                                  psi=psi0.copy(), nu=nu0),
        prior=TiedGaussiansWithScaledPrecision(size=k, dim=d,
                                               kappas=kappas.copy()))
    pair.meanfield_update(x, resp.T, nb_iter=4)
    # reference's posterior lmbdas must reflect the hyper mean for its ELL
    pair.posterior.lmbdas = np.stack(k * [pair.hyper_posterior.wishart.mean()])
    ref_ell = pair.expected_log_likelihood(x)         # (K, N)

    from mimo_tpu.distributions import hierarchical as jh
    from mimo_tpu.distributions import niw as jniw2
    hp = jh.HierTied(
        hyper=jniw2.NIW(mu=jnp.asarray(m0)[None],
                        kappa=jnp.asarray([kappa0]),
                        psi=jnp.asarray(psi0)[None],
                        nu=jnp.asarray([nu0])),
        mus=jnp.zeros((k, d)),
        kappas=jnp.asarray(kappas), kappas0=jnp.asarray(kappas))
    stats = jniw2.suff_stats(jnp.asarray(x), jnp.asarray(resp))
    post = jh.posterior_update(hp, stats, nb_iter=4)
    ours = jh.expected_log_likelihood(post, jnp.asarray(x))
    np.testing.assert_allclose(ours, ref_ell.T, rtol=1e-6, atol=1e-8)


def test_tied_affine_meanfield_parity(rng):
    """TiedAffineLinearGaussiansWithMatrixNormalWisharts.meanfield_update
    (bayesian.py:1321-1375) vs our tied-affine posterior_update."""
    k, p, q, n = 3, 2, 2, 120
    x = rng.standard_normal((n, q))
    y = rng.standard_normal((n, p))
    resp = rng.uniform(0.01, 1.0, (n, k))

    M0 = rng.standard_normal((p, q))
    a = rng.standard_normal((q, q))
    K0 = a @ a.T + 2 * np.eye(q)
    mus0 = rng.standard_normal((k, p))
    kappas0 = rng.uniform(0.5, 2.0, k)
    b = rng.standard_normal((p, p))
    psi0 = b @ b.T + 2 * np.eye(p)
    nu0 = p + 3.0

    from mimo.distributions import (MatrixNormalWithPrecision, Wishart,
                                    TiedGaussiansWithScaledPrecision)
    from mimo.distributions.bayesian import (
        TiedAffineLinearGaussiansWithMatrixNormalWisharts)
    pair = TiedAffineLinearGaussiansWithMatrixNormalWisharts(
        size=k, column_dim=q, row_dim=p,
        slope_prior=MatrixNormalWithPrecision(column_dim=q, row_dim=p,
                                              M=M0.copy(), K=K0.copy()),
        offset_prior=TiedGaussiansWithScaledPrecision(
            size=k, dim=p, kappas=kappas0.copy(), mus=mus0.copy()),
        precision_prior=Wishart(dim=p, psi=psi0.copy(), nu=nu0))
    pair.meanfield_update(x, y, resp.T, nb_iter=6)

    from mimo_tpu.distributions import affine as jaff
    prior = jaff.TiedAffine(M=jnp.asarray(M0), K_=jnp.asarray(K0),
                            mus=jnp.asarray(mus0),
                            kappas=jnp.asarray(kappas0),
                            psi=jnp.asarray(psi0), nu=jnp.asarray(nu0))
    stats = jaff.suff_stats(jnp.asarray(x), jnp.asarray(y),
                            jnp.asarray(resp))
    post = jaff.posterior_update(prior, stats, nb_iter=6)

    np.testing.assert_allclose(post.M, pair.slope_posterior.M, rtol=1e-7)
    np.testing.assert_allclose(post.K_, pair.slope_posterior.K, rtol=1e-8)
    np.testing.assert_allclose(post.psi, pair.precision_posterior.psi,
                               rtol=1e-6)
    np.testing.assert_allclose(post.nu, pair.precision_posterior.nu,
                               rtol=1e-10)
    np.testing.assert_allclose(post.mus, pair.offset_posterior.mus,
                               rtol=1e-7)
    np.testing.assert_allclose(post.kappas, pair.offset_posterior.kappas,
                               rtol=1e-10)


def test_tied_affine_ell_parity(rng):
    """The packed-MNW ELL (bayesian.py:1388-1421) vs ours."""
    k, p, q, n = 3, 2, 2, 40
    x = rng.standard_normal((n, q))
    y = rng.standard_normal((n, p))
    resp = rng.uniform(0.01, 1.0, (n, k))
    M0 = rng.standard_normal((p, q))
    a = rng.standard_normal((q, q))
    K0 = a @ a.T + 2 * np.eye(q)
    mus0 = rng.standard_normal((k, p))
    kappas0 = rng.uniform(0.5, 2.0, k)
    b = rng.standard_normal((p, p))
    psi0 = b @ b.T + 2 * np.eye(p)
    nu0 = p + 3.0

    from mimo.distributions import (MatrixNormalWithPrecision, Wishart,
                                    TiedGaussiansWithScaledPrecision)
    from mimo.distributions.bayesian import (
        TiedAffineLinearGaussiansWithMatrixNormalWisharts)
    pair = TiedAffineLinearGaussiansWithMatrixNormalWisharts(
        size=k, column_dim=q, row_dim=p,
        slope_prior=MatrixNormalWithPrecision(column_dim=q, row_dim=p,
                                              M=M0.copy(), K=K0.copy()),
        offset_prior=TiedGaussiansWithScaledPrecision(
            size=k, dim=p, kappas=kappas0.copy(), mus=mus0.copy()),
        precision_prior=Wishart(dim=p, psi=psi0.copy(), nu=nu0))
    pair.meanfield_update(x, y, resp.T, nb_iter=4)
    ref_ell = pair.expected_log_likelihood(x, y)       # (K, N)

    from mimo_tpu.distributions import affine as jaff
    from mimo_tpu.distributions.mnw import augment
    prior = jaff.TiedAffine(M=jnp.asarray(M0), K_=jnp.asarray(K0),
                            mus=jnp.asarray(mus0),
                            kappas=jnp.asarray(kappas0),
                            psi=jnp.asarray(psi0), nu=jnp.asarray(nu0))
    stats = jaff.suff_stats(jnp.asarray(x), jnp.asarray(y),
                            jnp.asarray(resp))
    post = jaff.posterior_update(prior, stats, nb_iter=4)
    ours = jaff.expected_log_likelihood(post, augment(jnp.asarray(x), True),
                                        jnp.asarray(y))
    np.testing.assert_allclose(ours, ref_ell.T, rtol=1e-6, atol=1e-8)


@pytest.mark.slow
def test_ilr_step_end_to_end_parity(rng):
    """End-to-end workload parity: identical step data + priors through
    Gibbs(100) -> VI(1000) in both frameworks; predictive RMSE must agree.
    (This benchmark's ~0.6 average-prediction RMSE is the REFERENCE's own
    behavior on this dataset at these settings, verified here — not a
    regression.)"""
    from mimo_tpu.models.ilr import BayesianILR
    from mimo_tpu.models.mixture import MFState
    import jax.numpy as jnp

    n, q = 160, 40
    x = np.concatenate([np.linspace(-2., -1., q), np.linspace(-1., 0., q),
                        np.linspace(0., 1., q),
                        np.linspace(1., 2., q)]).reshape(-1, 1)
    mean = np.concatenate([np.full(q, 1.), np.full(q, 3.), np.full(q, 0.),
                           np.full(q, 4.)]).reshape(-1, 1)
    y = mean + 0.1 * rng.standard_normal((n, 1))

    # ours
    m = BayesianILR.make(size=10, input_dim=1, output_dim=1,
                         gating='stick-breaking', alpha=1.0, kappa=1e-2,
                         K_scale=1e-2, psi_scale=1e2, dtype=jnp.float64)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    m.init_transform(xj, yj)
    g = m.fit_gibbs((xj, yj), key=0, maxiter=100, init_labels='random')
    st, _ = m.fit_vi((xj, yj), key=1, maxiter=1000,
                     init_state=MFState(g.components, g.gating),
                     randomize=False)
    mu, _, _, _ = m.predict(st, xj, yj)
    ours = float(jnp.sqrt(jnp.mean((mu - yj) ** 2)))

    # reference
    from mimo.distributions import (
        StackedNormalWisharts, StackedGaussiansWithNormalWisharts,
        StackedMatrixNormalWisharts,
        StackedLinearGaussiansWithMatrixNormalWisharts,
        TruncatedStickBreaking, CategoricalWithStickBreaking)
    from mimo.mixtures import BayesianMixtureOfLinearGaussians
    K = 10
    basis_prior = StackedNormalWisharts(
        size=K, dim=1, mus=np.zeros((K, 1)), kappas=1e-2 * np.ones(K),
        psis=np.stack(K * [np.eye(1)]), nus=2.0 * np.ones(K) + 1e-16)
    basis = StackedGaussiansWithNormalWisharts(size=K, dim=1,
                                               prior=basis_prior)
    models_prior = StackedMatrixNormalWisharts(
        K, 2, 1, Ms=np.zeros((K, 1, 2)),
        Ks=np.stack(K * [1e-2 * np.eye(2)]),
        psis=np.stack(K * [1e2 * np.eye(1)]), nus=2.0 * np.ones(K) + 1e-16)
    models = StackedLinearGaussiansWithMatrixNormalWisharts(
        K, 2, 1, models_prior, affine=True)
    gating = CategoricalWithStickBreaking(
        K, TruncatedStickBreaking(K, np.ones(K), np.ones(K)))
    ilr = BayesianMixtureOfLinearGaussians(
        size=K, input_dim=1, output_dim=1, gating=gating, basis=basis,
        models=models)
    ilr.init_transform(x, y)
    ilr.resample(x, y, init_labels='random', maxiter=100,
                 progress_bar=False)
    ilr.meanfield_coordinate_descent(x, y, randomize=False, maxiter=1000,
                                     tol=1e-2, progress_bar=False)
    mu_ref, _, _ = ilr.meanfield_prediction(x, prediction='average')
    theirs = float(np.sqrt(np.mean((mu_ref - y) ** 2)))

    assert abs(ours - theirs) < 0.15, (ours, theirs)


# ---------------------------------------------------------------------------
# Diagonal (Normal-Gamma) family oracles.
#
# NOTE: the reference's StackedNormalGammas cannot serve as an oracle — its
# alphas/betas setters are buggy (composite.py:474-484 assign to nonexistent
# gamma.psi / gamma.nu attributes, so stacked nat_param assignment silently
# leaves the Gamma part of the posterior at its prior values). The SCALAR
# NormalGamma (composite.py:286-400) has correct setters and is the oracle
# here, applied per component.
# ---------------------------------------------------------------------------

@pytest.fixture
def diag_problem(rng):
    k, d, n = 4, 3, 80
    x = rng.standard_normal((n, d)) * 1.5 + 0.5
    resp = rng.uniform(0.01, 1.0, (n, k))
    mus = rng.standard_normal((k, d))
    kappas = rng.uniform(0.5, 2.0, (k, d))
    alphas = rng.uniform(1.5, 3.0, (k, d))
    betas = rng.uniform(0.5, 2.0, (k, d))
    return x, resp, mus, kappas, alphas, betas


def test_ng_posterior_update_parity(diag_problem):
    """posterior.nat_param = prior.nat_param + weighted_statistics for the
    diagonal pair (bayesian.py:385-391) vs our ng.posterior_update."""
    from mimo.distributions import NormalGamma, GaussianWithDiagonalPrecision
    from mimo_tpu.distributions import ng as jng

    x, resp, mus, kappas, alphas, betas = diag_problem
    k, d = mus.shape
    prior = jng.NG(*(jnp.asarray(a) for a in (mus, kappas, alphas, betas)))
    ours = jng.posterior_update(
        prior, jng.suff_stats(jnp.asarray(x), jnp.asarray(resp)))

    for i in range(k):
        pr = NormalGamma(d, mus[i].copy(), kappas[i].copy(),
                         alphas[i].copy(), betas[i].copy())
        lik = GaussianWithDiagonalPrecision(dim=d, mu=mus[i].copy(),
                                            lmbda_diag=np.ones(d))
        stats = lik.weighted_statistics(x, resp[:, i])
        po = NormalGamma(d, mus[i].copy(), kappas[i].copy(),
                         alphas[i].copy(), betas[i].copy())
        po.nat_param = pr.nat_param + stats
        mu_r, kappa_r, alpha_r, beta_r = po.params
        np.testing.assert_allclose(np.asarray(ours.mu[i]), mu_r, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(ours.kappa[i]), kappa_r,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(ours.alpha[i]), alpha_r,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(ours.beta[i]), beta_r,
                                   rtol=1e-7)


def test_ng_expected_log_likelihood_parity(diag_problem):
    """StackedGaussiansWithNormalGammas.expected_log_likelihood
    (bayesian.py:428-486) vs our fused (N, K) form.

    Two more reference bugs force the oracle construction used here:
    (a) the SCALAR pair's expected_log_likelihood crashes, because scalar
    GaussianWithDiagonalPrecision.statistics ignores fold=False
    (gaussian.py:648-658) and feeds folded (d,) stats into 'd,nd->n'
    einsums; (b) the stacked posterior cannot be set via nat_param (the
    setter bug above). So: compute the posterior per-component with the
    scalar NormalGamma (validated by test_ng_posterior_update_parity),
    CONSTRUCT a StackedNormalGammas with those values, and call the
    stacked ell (whose getters are fine)."""
    from mimo.distributions import (NormalGamma, StackedNormalGammas,
                                    GaussianWithDiagonalPrecision,
                                    StackedGaussiansWithDiagonalPrecision)
    from mimo.distributions.bayesian import StackedGaussiansWithNormalGammas
    from mimo_tpu.distributions import ng as jng

    x, resp, mus, kappas, alphas, betas = diag_problem
    k, d = mus.shape
    prior = jng.NG(*(jnp.asarray(a) for a in (mus, kappas, alphas, betas)))
    post = jng.posterior_update(
        prior, jng.suff_stats(jnp.asarray(x), jnp.asarray(resp)))
    ours = np.asarray(jng.expected_log_likelihood(post, jnp.asarray(x)))

    mu_p = np.empty((k, d)); kap_p = np.empty((k, d))
    al_p = np.empty((k, d)); be_p = np.empty((k, d))
    for i in range(k):
        pr = NormalGamma(d, mus[i].copy(), kappas[i].copy(),
                         alphas[i].copy(), betas[i].copy())
        lik = GaussianWithDiagonalPrecision(dim=d, mu=mus[i].copy(),
                                            lmbda_diag=np.ones(d))
        stats = lik.weighted_statistics(x, resp[:, i])
        po = NormalGamma(d, mus[i].copy(), kappas[i].copy(),
                         alphas[i].copy(), betas[i].copy())
        po.nat_param = pr.nat_param + stats
        mu_p[i], kap_p[i], al_p[i], be_p[i] = po.params

    prior_s = StackedNormalGammas(k, d, mus=mus.copy(), kappas=kappas.copy(),
                                  alphas=alphas.copy(), betas=betas.copy())
    lik_s = StackedGaussiansWithDiagonalPrecision(
        size=k, dim=d, mus=mus.copy(), lmbdas_diags=np.ones((k, d)))
    pair = StackedGaussiansWithNormalGammas(k, d, prior_s, likelihood=lik_s)
    pair.posterior = StackedNormalGammas(k, d, mus=mu_p, kappas=kap_p,
                                         alphas=al_p, betas=be_p)
    theirs = pair.expected_log_likelihood(x)      # (K, N)
    np.testing.assert_allclose(ours, np.asarray(theirs).T, rtol=1e-7)


def test_mng_posterior_update_parity(rng):
    """Scalar MatrixNormalGamma nat add (composite.py:838-862,
    bayesian.py:1006-1084) vs our mng.posterior_update; diagonal-noise
    linear experts."""
    from mimo.distributions import (MatrixNormalGamma,
                                    LinearGaussianWithDiagonalPrecision)
    from mimo_tpu.distributions import mng as jmng
    from mimo_tpu.distributions import mnw as jmnw

    k, p, q, n = 3, 2, 3, 60
    x = rng.standard_normal((n, q))
    y = rng.standard_normal((n, p))
    resp = rng.uniform(0.01, 1.0, (n, k))
    Ms = rng.standard_normal((k, p, q))
    a = rng.standard_normal((k, q, q))
    Ks = np.einsum('kij,klj->kil', a, a) + 2 * np.eye(q)
    alphas = rng.uniform(1.5, 3.0, (k, p))
    betas = rng.uniform(0.5, 2.0, (k, p))

    prior = jmng.MNG(M=jnp.asarray(Ms), K_=jnp.asarray(Ks),
                     alpha=jnp.asarray(alphas), beta=jnp.asarray(betas))
    stats = jmnw.suff_stats(jnp.asarray(x), jnp.asarray(y),
                            jnp.asarray(resp))
    ours = jmng.posterior_update(prior, stats)

    for i in range(k):
        pr = MatrixNormalGamma(q, p, M=Ms[i].copy(), K=Ks[i].copy(),
                               alphas=alphas[i].copy(),
                               betas=betas[i].copy())
        lik = LinearGaussianWithDiagonalPrecision(
            q, p, A=Ms[i].copy(), lmbda_diag=np.ones(p), affine=False)
        st = lik.weighted_statistics(x, y, resp[:, i])
        po = MatrixNormalGamma(q, p, M=Ms[i].copy(), K=Ks[i].copy(),
                               alphas=alphas[i].copy(),
                               betas=betas[i].copy())
        po.nat_param = pr.nat_param + st
        M_r, K_r, alpha_r, beta_r = po.params
        np.testing.assert_allclose(np.asarray(ours.M[i]), M_r, rtol=1e-7)
        np.testing.assert_allclose(np.asarray(ours.K_[i]), K_r, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(ours.alpha[i]), alpha_r,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(ours.beta[i]), beta_r,
                                   rtol=1e-6)


def test_niw_svi_blend_parity(gauss_problem):
    """meanfield_sgd: nat <- (1-rho) nat + rho (prior.nat + stats/scale)
    (bayesian.py:232-238, scalar path :394-399) vs our niw svi_blend."""
    from mimo.distributions import NormalWishart, GaussianWithPrecision
    from mimo.distributions.bayesian import GaussianWithNormalWishart
    from mimo_tpu.distributions import niw as jniw2

    x, resp, mus, kappas, psis, nus = gauss_problem
    k, d = mus.shape
    scale, step = 0.25, 0.7
    # warm posterior from a first batch, then one SVI blend on a second
    x1, x2 = x[:40], x[40:]
    r1, r2 = resp[:40], resp[40:]

    prior = jniw.NIW(mu=jnp.asarray(mus), kappa=jnp.asarray(kappas),
                     psi=jnp.asarray(psis), nu=jnp.asarray(nus))
    post = jniw.posterior_update(prior, jniw.suff_stats(jnp.asarray(x1),
                                                        jnp.asarray(r1)))
    ours = jniw2.svi_blend(post, prior,
                           jniw.suff_stats(jnp.asarray(x2),
                                           jnp.asarray(r2)), scale, step)

    for i in range(k):
        pr = NormalWishart(d, mu=mus[i].copy(), kappa=float(kappas[i]),
                           psi=psis[i].copy(), nu=float(nus[i]))
        lik = GaussianWithPrecision(dim=d, mu=mus[i].copy(),
                                    lmbda=np.eye(d))
        pair = GaussianWithNormalWishart(d, pr, likelihood=lik)
        s1 = lik.weighted_statistics(x1, r1[:, i])
        pair.posterior.nat_param = pair.prior.nat_param + s1
        s2 = lik.weighted_statistics(x2, r2[:, i])
        pair.posterior.nat_param = \
            (1.0 - step) * pair.posterior.nat_param \
            + step * (pair.prior.nat_param + 1.0 / scale * s2)
        mu_r, kappa_r, psi_r, nu_r = pair.posterior.params
        np.testing.assert_allclose(np.asarray(ours.mu[i]), mu_r, rtol=1e-7)
        np.testing.assert_allclose(np.asarray(ours.kappa[i]), kappa_r,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(ours.psi[i]), psi_r,
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.nu[i]), nu_r, rtol=1e-10)


def test_tied_niw_update_parity(gauss_problem):
    """TiedGaussiansWithNormalWisharts.meanfield_update pools psi/nu across
    K during nat_to_std (composite.py:275-283) vs our tied_family update."""
    from mimo.distributions import TiedNormalWisharts
    from mimo.distributions import TiedGaussiansWithNormalWisharts
    from mimo.distributions import TiedGaussiansWithPrecision
    from mimo_tpu.conjugate.families import gaussian_family, tied_family

    x, resp, mus, kappas, psis, nus = gauss_problem
    k, d = mus.shape
    # tied reference wants one shared psi/nu to start
    psis_t = np.stack(k * [psis[0]])
    nus_t = np.full(k, nus[0])

    pr = TiedNormalWisharts(size=k, dim=d, mus=mus.copy(),
                            kappas=kappas.copy(), psis=psis_t.copy(),
                            nus=nus_t.copy())
    lik = TiedGaussiansWithPrecision(size=k, dim=d, mus=mus.copy(),
                                     lmbdas=np.tile(np.eye(d), (k, 1, 1)))
    pair = TiedGaussiansWithNormalWisharts(k, d, pr, likelihood=lik)
    stats = lik.weighted_statistics(x, resp.T)
    pair.posterior.nat_param = pair.prior.nat_param + stats
    mu_r, kappa_r, psi_r, nu_r = pair.posterior.params

    fam = tied_family(gaussian_family())
    prior = jniw.NIW(mu=jnp.asarray(mus), kappa=jnp.asarray(kappas),
                     psi=jnp.asarray(psis_t), nu=jnp.asarray(nus_t))
    ours = fam.update(prior, fam.suff_stats((jnp.asarray(x),),
                                            jnp.asarray(resp)))
    np.testing.assert_allclose(np.asarray(ours.mu), mu_r, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(ours.kappa), kappa_r, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(ours.psi), psi_r, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.nu), nu_r, rtol=1e-10)


def _hier_pair_and_ours(rng, k=3, d=2):
    """Shared construction: reference hierarchical pair + our HierTied
    prior, with matching hyper-prior and per-component kappas."""
    kappas = rng.uniform(0.5, 2.0, k)
    m0 = rng.standard_normal(d)
    kappa0, nu0 = 0.4, d + 3.0
    a = rng.standard_normal((d, d))
    psi0 = a @ a.T + 2 * np.eye(d)

    from mimo.distributions import (NormalWishart,
                                    TiedGaussiansWithScaledPrecision)
    from mimo.distributions.bayesian import (
        TiedGaussiansWithHierarchicalNormalWisharts)
    pair = TiedGaussiansWithHierarchicalNormalWisharts(
        size=k, dim=d,
        hyper_prior=NormalWishart(dim=d, mu=m0.copy(), kappa=kappa0,
                                  psi=psi0.copy(), nu=nu0),
        prior=TiedGaussiansWithScaledPrecision(size=k, dim=d,
                                               kappas=kappas.copy()))
    from mimo_tpu.distributions import hierarchical as jh
    hp = jh.HierTied(
        hyper=jniw.NIW(mu=jnp.asarray(m0)[None],
                       kappa=jnp.asarray([kappa0]),
                       psi=jnp.asarray(psi0)[None],
                       nu=jnp.asarray([nu0])),
        mus=jnp.zeros((k, d)),
        kappas=jnp.asarray(kappas), kappas0=jnp.asarray(kappas))
    return pair, hp


def test_hierarchical_predictive_parity(rng):
    """log_posterior_predictive_gaussian (bayesian.py:783-793) vs our
    hierarchical log_predictive_gaussian after identical VI updates."""
    k, d, n = 3, 2, 60
    x = rng.standard_normal((n, d))
    resp = rng.uniform(0.01, 1.0, (n, k))
    pair, hp = _hier_pair_and_ours(rng, k, d)
    pair.meanfield_update(x, resp.T, nb_iter=4)
    ref = pair.log_posterior_predictive_gaussian(x)     # (K, N)

    from mimo_tpu.distributions import hierarchical as jh
    stats = jniw.suff_stats(jnp.asarray(x), jnp.asarray(resp))
    post = jh.posterior_update(hp, stats, nb_iter=4)
    ours = jh.log_predictive_gaussian(post, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref).T,
                               rtol=1e-6, atol=1e-8)


def test_hierarchical_svi_blend_parity(rng):
    """meanfield_sgd (bayesian.py:691-729) vs our hierarchical svi_blend:
    identical warm posterior, one stochastic step on a second batch."""
    k, d = 3, 2
    x1 = rng.standard_normal((60, d))
    r1 = rng.uniform(0.01, 1.0, (60, k))
    x2 = rng.standard_normal((40, d))
    r2 = rng.uniform(0.01, 1.0, (40, k))
    scale, step = 0.25, 0.7

    pair, hp = _hier_pair_and_ours(rng, k, d)
    pair.meanfield_update(x1, r1.T, nb_iter=4)
    pair.meanfield_sgd(x2, r2.T, nb_iter=1, scale=scale, step_size=step)
    ref_mus = pair.posterior.mus
    ref_rho, ref_kappa, ref_psi, ref_nu = pair.hyper_posterior.params

    from mimo_tpu.distributions import hierarchical as jh
    post = jh.posterior_update(hp, jniw.suff_stats(jnp.asarray(x1),
                                                   jnp.asarray(r1)),
                               nb_iter=4)
    ours = jh.svi_blend(post, hp, jniw.suff_stats(jnp.asarray(x2),
                                                  jnp.asarray(r2)),
                        scale, step, nb_iter=1)
    np.testing.assert_allclose(np.asarray(ours.mus), ref_mus, rtol=1e-6,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(ours.hyper.mu[0]), ref_rho,
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(ours.hyper.kappa[0]), ref_kappa,
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(ours.hyper.psi[0]), ref_psi,
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(float(ours.hyper.nu[0]), ref_nu, rtol=1e-8)


def test_ng_svi_blend_parity(diag_problem):
    """Scalar NormalGamma nat-space SGD blend (bayesian.py:394-399) vs our
    ng.svi_blend (the stacked reference class is unusable — see the setter
    bug note above)."""
    from mimo.distributions import NormalGamma, GaussianWithDiagonalPrecision
    from mimo_tpu.distributions import ng as jng

    x, resp, mus, kappas, alphas, betas = diag_problem
    k, d = mus.shape
    scale, step = 0.25, 0.7
    x1, x2 = x[:40], x[40:]
    r1, r2 = resp[:40], resp[40:]

    prior = jng.NG(*(jnp.asarray(a) for a in (mus, kappas, alphas, betas)))
    post = jng.posterior_update(prior, jng.suff_stats(jnp.asarray(x1),
                                                      jnp.asarray(r1)))
    ours = jng.svi_blend(post, prior,
                         jng.suff_stats(jnp.asarray(x2), jnp.asarray(r2)),
                         scale, step)

    for i in range(k):
        pr = NormalGamma(d, mus[i].copy(), kappas[i].copy(),
                         alphas[i].copy(), betas[i].copy())
        lik = GaussianWithDiagonalPrecision(dim=d, mu=mus[i].copy(),
                                            lmbda_diag=np.ones(d))
        po = NormalGamma(d, mus[i].copy(), kappas[i].copy(),
                         alphas[i].copy(), betas[i].copy())
        po.nat_param = pr.nat_param + lik.weighted_statistics(x1, r1[:, i])
        po.nat_param = (1.0 - step) * po.nat_param \
            + step * (pr.nat_param
                      + 1.0 / scale * lik.weighted_statistics(x2, r2[:, i]))
        mu_r, kappa_r, alpha_r, beta_r = po.params
        np.testing.assert_allclose(np.asarray(ours.mu[i]), mu_r, rtol=1e-7)
        np.testing.assert_allclose(np.asarray(ours.kappa[i]), kappa_r,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(ours.alpha[i]), alpha_r,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(ours.beta[i]), beta_r,
                                   rtol=1e-6)


def test_mng_svi_blend_parity(rng):
    """Scalar MatrixNormalGamma nat-space SGD blend vs our mng.svi_blend."""
    from mimo.distributions import (MatrixNormalGamma,
                                    LinearGaussianWithDiagonalPrecision)
    from mimo_tpu.distributions import mng as jmng
    from mimo_tpu.distributions import mnw as jmnw2

    k, p, q, n = 3, 2, 3, 80
    x = rng.standard_normal((n, q))
    y = rng.standard_normal((n, p))
    resp = rng.uniform(0.01, 1.0, (n, k))
    Ms = rng.standard_normal((k, p, q))
    a = rng.standard_normal((k, q, q))
    Ks = np.einsum('kij,klj->kil', a, a) + 2 * np.eye(q)
    alphas = rng.uniform(1.5, 3.0, (k, p))
    betas = rng.uniform(0.5, 2.0, (k, p))
    scale, step = 0.3, 0.6
    x1, x2, y1, y2, r1, r2 = x[:50], x[50:], y[:50], y[50:], resp[:50], resp[50:]

    prior = jmng.MNG(M=jnp.asarray(Ms), K_=jnp.asarray(Ks),
                     alpha=jnp.asarray(alphas), beta=jnp.asarray(betas))
    post = jmng.posterior_update(
        prior, jmnw2.suff_stats(jnp.asarray(x1), jnp.asarray(y1),
                                jnp.asarray(r1)))
    ours = jmng.svi_blend(
        post, prior, jmnw2.suff_stats(jnp.asarray(x2), jnp.asarray(y2),
                                      jnp.asarray(r2)), scale, step)

    for i in range(k):
        pr = MatrixNormalGamma(q, p, M=Ms[i].copy(), K=Ks[i].copy(),
                               alphas=alphas[i].copy(), betas=betas[i].copy())
        lik = LinearGaussianWithDiagonalPrecision(
            q, p, A=Ms[i].copy(), lmbda_diag=np.ones(p), affine=False)
        po = MatrixNormalGamma(q, p, M=Ms[i].copy(), K=Ks[i].copy(),
                               alphas=alphas[i].copy(), betas=betas[i].copy())
        po.nat_param = pr.nat_param + lik.weighted_statistics(x1, y1, r1[:, i])
        po.nat_param = (1.0 - step) * po.nat_param \
            + step * (pr.nat_param
                      + 1.0 / scale * lik.weighted_statistics(x2, y2, r2[:, i]))
        M_r, K_r, alpha_r, beta_r = po.params
        np.testing.assert_allclose(np.asarray(ours.M[i]), M_r, rtol=1e-6,
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(ours.K_[i]), K_r, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(ours.alpha[i]), alpha_r,
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(ours.beta[i]), beta_r,
                                   rtol=1e-5)


def test_gating_svi_blend_parity(rng):
    """Dirichlet (bayesian.py:85-89) and stick-breaking (:161-171) SGD
    blends vs our gating svi_blend (incl. the reverse-cumsum acc counts)."""
    k = 6
    counts1 = rng.uniform(0.0, 20.0, k)
    counts2 = rng.uniform(0.0, 20.0, k)
    scale, step = 0.2, 0.65

    # Dirichlet
    from mimo.distributions import Dirichlet as RefDir
    from mimo.distributions.bayesian import CategoricalWithDirichlet
    alphas = rng.uniform(0.5, 3.0, k)
    prior = jgating.Dirichlet(alpha=jnp.asarray(alphas))
    post = prior.update(jnp.asarray(counts1))
    ours = prior.svi_blend(post, jnp.asarray(counts2), scale, step)
    ref_pr = RefDir(dim=k, alphas=alphas.copy())
    ref_po = RefDir(dim=k, alphas=alphas.copy())
    ref_po.nat_param = ref_pr.nat_param + counts1
    ref_po.nat_param = (1.0 - step) * ref_po.nat_param \
        + step * (ref_pr.nat_param + 1.0 / scale * counts2)
    np.testing.assert_allclose(np.asarray(ours.alpha), ref_po.alphas,
                               rtol=1e-10)

    # Stick-breaking (gammas/deltas with exclusive reverse-cumsum counts)
    gammas = rng.uniform(0.5, 2.0, k)
    deltas = rng.uniform(0.5, 2.0, k)
    sb_prior = jgating.StickBreaking(gamma=jnp.asarray(gammas),
                                     delta=jnp.asarray(deltas))
    sb_post = sb_prior.update(jnp.asarray(counts1))
    sb_ours = sb_prior.svi_blend(sb_post, jnp.asarray(counts2), scale, step)

    def acc(c):
        return np.hstack((np.cumsum(c[::-1])[-2::-1], 0))
    g1 = gammas + counts1
    d1 = deltas + acc(counts1)
    g2 = (1.0 - step) * g1 + step * (gammas + counts2 / scale)
    d2 = (1.0 - step) * d1 + step * (deltas + acc(counts2) / scale)
    np.testing.assert_allclose(np.asarray(sb_ours.gamma), g2, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sb_ours.delta), d2, rtol=1e-10)
