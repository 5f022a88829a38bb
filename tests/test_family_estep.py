"""The generic fused E-step (ops/family_estep.py): feature-map/theta
linearity oracles against each family's expected_log_likelihood and
suff_stats, plus fused-vs-standard VI engine equivalence for GMM, diag
GMM, and mixtures of linear experts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_tpu.distributions import mng as _mng
from mimo_tpu.distributions import mnw as _mnw
from mimo_tpu.distributions import ng as _ng
from mimo_tpu.distributions import niw as _niw
from mimo_tpu.distributions.mnw import augment
from mimo_tpu.ops import family_estep as fe
from mimo_tpu.utils.stats import normalize_log


@pytest.fixture
def xy(rng):
    x = jnp.asarray(rng.standard_normal((200, 2)) * 1.5)
    y = jnp.asarray(rng.standard_normal((200, 1)) + 0.3 * x[:, :1])
    return x, y


def test_gaussian_spec_matches_ell(xy, rng):
    x, _ = xy
    post = _niw.NIW.standard(6, 2, kappa=1.3, psi_scale=0.7,
                             dtype=jnp.float64)
    post = post._replace(mu=jnp.asarray(rng.standard_normal((6, 2))))
    spec = fe.gaussian_spec()
    logp = spec.features((x,)) @ spec.theta(post).T
    np.testing.assert_allclose(np.asarray(logp),
                               np.asarray(_niw.expected_log_likelihood(post, x)),
                               rtol=1e-10)


def test_diag_gaussian_spec_matches_ell(xy, rng):
    x, _ = xy
    post = _ng.NG.standard(6, 2, kappa=1.3, dtype=jnp.float64)
    post = post._replace(mu=jnp.asarray(rng.standard_normal((6, 2))),
                         beta=jnp.asarray(rng.uniform(0.5, 2.0, (6, 2))))
    spec = fe.diag_gaussian_spec()
    logp = spec.features((x,)) @ spec.theta(post).T
    np.testing.assert_allclose(np.asarray(logp),
                               np.asarray(_ng.expected_log_likelihood(post, x)),
                               rtol=1e-10)


def test_linear_spec_matches_ell(xy, rng):
    x, y = xy
    post = _mnw.MNW.standard(6, 1, 3, K_scale=0.5, psi_scale=0.8,
                             dtype=jnp.float64)
    post = post._replace(M=jnp.asarray(rng.standard_normal((6, 1, 3))))
    spec = fe.linear_spec(True, 1, 3)
    xa = augment(x, True)
    logp = spec.features((x, y)) @ spec.theta(post).T
    np.testing.assert_allclose(
        np.asarray(logp),
        np.asarray(_mnw.expected_log_likelihood(post, xa, y)), rtol=1e-10)


def test_diag_linear_spec_matches_ell(xy, rng):
    x, y = xy
    post = _mng.MNG.standard(6, 1, 3, K_scale=0.5, dtype=jnp.float64)
    post = post._replace(M=jnp.asarray(rng.standard_normal((6, 1, 3))),
                         beta=jnp.asarray(rng.uniform(0.5, 2.0, (6, 1))))
    spec = fe.diag_linear_spec(True, 1, 3)
    xa = augment(x, True)
    logp = spec.features((x, y)) @ spec.theta(post).T
    np.testing.assert_allclose(
        np.asarray(logp),
        np.asarray(_mng.expected_log_likelihood(post, xa, y)), rtol=1e-10)


def test_fused_stats_match_suff_stats(xy, rng):
    """The scaled-feature accumulator equals suff_stats(resp) exactly."""
    x, y = xy
    post_b = _niw.NIW.standard(6, 2, dtype=jnp.float64)._replace(
        mu=jnp.asarray(rng.standard_normal((6, 2))))
    post_e = _mnw.MNW.standard(6, 1, 3, dtype=jnp.float64)._replace(
        M=jnp.asarray(rng.standard_normal((6, 1, 3))))
    spec = fe.ilr_spec(2, 1, affine=True)
    log_pi = jnp.log(jnp.full((6,), 1.0 / 6, jnp.float64))
    res = fe.fused_estep_blockwise(spec, (post_b, post_e), log_pi, (x, y),
                                   block_size=50)
    # oracle: dense responsibilities + the families' suff_stats
    xa = augment(x, True)
    ell = (_niw.expected_log_likelihood(post_b, x)
           + _mnw.expected_log_likelihood(post_e, xa, y)
           + log_pi[None, :])
    resp, lse = normalize_log(ell)
    st_b = _niw.suff_stats(x, resp)
    st_e = _mnw.suff_stats(xa, y, resp)
    for a, b in zip(jax.tree.leaves(res.stats[0]), jax.tree.leaves(st_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)
    for a, b in zip(jax.tree.leaves(res.stats[1]), jax.tree.leaves(st_e)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8)
    np.testing.assert_allclose(float(res.lse), float(jnp.sum(lse)),
                               rtol=1e-10)


@pytest.mark.slow
def test_gmm_fused_equals_standard(rng):
    from mimo_tpu.models.gmm import BayesianGMM
    from mimo_tpu.distributions.niw import GaussParams
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(
        jax.random.PRNGKey(3),
        GaussParams(jnp.asarray([[-4., 0.], [4., 0.], [0., 5.]]), lm),
        jnp.asarray([.3, .4, .3]), 2000)
    x = x.astype(jnp.float64)
    for kwargs in [dict(), dict(diag=True), dict(tied=True)]:
        m = BayesianGMM.make(size=5, dim=2, gating='dp', kappa=0.05,
                             psi_scale=0.5, dtype=jnp.float64, **kwargs)
        st1, v1 = m.fit_vi(x, key=0, maxiter=40)
        st2, v2 = m.fit_vi_fused(x, key=0, maxiter=40, block_size=500)
        # same random init + same math -> same fixed point
        np.testing.assert_allclose(np.asarray(st1.components.mu),
                                   np.asarray(st2.components.mu),
                                   rtol=1e-6, atol=1e-8)
        # the traces are different estimators of the same bound (resp-based
        # vs lse-identity), equal only at convergence — compare loosely
        np.testing.assert_allclose(float(v1[-1]), float(v2[-1]), rtol=1e-4)


@pytest.mark.slow
def test_ilr_fused_equals_standard(rng):
    from mimo_tpu.models.ilr import BayesianILR
    x = jnp.asarray(rng.uniform(-3, 3, (1600, 1)))
    y = jnp.asarray(np.sin(np.asarray(x) * 2)
                    + 0.1 * rng.standard_normal((1600, 1)))
    for diag in [False, True]:
        m = BayesianILR.make(size=8, input_dim=1, output_dim=1, diag=diag,
                             kappa=0.05, dtype=jnp.float64)
        m.init_transform(x, y)
        st1, v1 = m.fit_vi((x, y), key=0, maxiter=60)
        st2, v2 = m.fit_vi_fused((x, y), key=0, maxiter=60, block_size=400)
        mu1, _, _, _ = m.predict(st1, x, y)
        mu2, _, _, _ = m.predict(st2, x, y)
        np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                                   rtol=1e-5, atol=1e-7)
        # sanity only — cold-start quality is covered by the ILR
        # integration tests (the equivalence above is this test's point)
        rmse = float(jnp.sqrt(jnp.mean((mu2 - y) ** 2)))
        assert rmse < 1.0, rmse


def test_gmm_fused_gibbs_recovers(rng):
    from mimo_tpu.models.gmm import BayesianGMM
    from mimo_tpu.distributions.niw import GaussParams
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(
        jax.random.PRNGKey(5),
        GaussParams(jnp.asarray([[-4., 0.], [4., 0.], [0., 5.]]), lm),
        jnp.asarray([.3, .4, .3]), 3000)
    x = x.astype(jnp.float64)
    m = BayesianGMM.make(size=6, dim=2, gating='dp', kappa=0.05,
                         psi_scale=0.5, dtype=jnp.float64)
    gs = m.fit_gibbs_fused(x, key=2, maxiter=100, block_size=750)
    counts = np.bincount(np.asarray(gs.labels), minlength=6)
    est = np.asarray(gs.components.mu)[counts > 300]
    for t in [[-4., 0.], [4., 0.], [0., 5.]]:
        assert np.min(np.linalg.norm(est - np.asarray(t), axis=-1)) < 0.4


@pytest.mark.slow
def test_ilr_fused_gibbs_recovers(rng):
    from mimo_tpu.models.ilr import BayesianILR
    from mimo_tpu.models.mixture import MFState
    x = jnp.asarray(rng.uniform(-3, 3, (2000, 1)))
    y = jnp.asarray(np.where(np.asarray(x) < 0, np.asarray(x),
                             -np.asarray(x))
                    + 0.1 * rng.standard_normal((2000, 1)))
    m = BayesianILR.make(size=6, input_dim=1, output_dim=1, kappa=0.05,
                         dtype=jnp.float64)
    m.init_transform(x, y)
    gs = m.fit_gibbs_fused((x, y), key=0, maxiter=100, block_size=500)
    st, _ = m.fit_vi((x, y), key=1, maxiter=200,
                     init_state=MFState(gs.components, gs.gating),
                     randomize=False)
    mu, _, _, _ = m.predict(st, x, y)
    rmse = float(jnp.sqrt(jnp.mean((mu - y) ** 2)))
    assert rmse < 0.2, rmse


def test_hier_gmm_fused_equals_standard(rng):
    """hier_gaussian_spec: the hierarchical family's ell is feature-linear
    too, so the fused engines must match the dense ones."""
    from mimo_tpu.models.gmm import BayesianGMM
    from mimo_tpu.distributions.niw import GaussParams
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(
        jax.random.PRNGKey(5),
        GaussParams(jnp.asarray([[-4., 0.], [4., 0.], [0., 5.]]), lm),
        jnp.asarray([.3, .4, .3]), 2000)
    x = x.astype(jnp.float64)
    m = BayesianGMM.make(size=5, dim=2, gating='dp', hierarchical=True,
                         kappa=0.05, psi_scale=0.5, maxsubiter=5,
                         dtype=jnp.float64)
    st1, v1 = m.fit_vi(x, key=0, maxiter=40)
    st2, v2 = m.fit_vi_fused(x, key=0, maxiter=40, block_size=500)
    np.testing.assert_allclose(np.asarray(st1.components.mus),
                               np.asarray(st2.components.mus),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(float(v1[-1]), float(v2[-1]), rtol=1e-4)
    # fused blocked Gibbs runs the family's inner-chain gibbs_update
    gs = m.fit_gibbs_fused(x, key=1, maxiter=30, block_size=500)
    counts = np.bincount(np.asarray(gs.labels), minlength=5)
    assert counts.sum() == 2000
    assert np.sort(counts)[-3:].sum() > 0.8 * 2000
    assert np.isfinite(np.asarray(gs.components.mus)).all()


@pytest.mark.slow
def test_ilr_tied_affine_and_hier_basis_fused(rng):
    """tied_affine_spec / hier-basis ILR: fused VI must match the dense
    engine (both were previously dense-only)."""
    from mimo_tpu.models.ilr import BayesianILR
    x = jnp.asarray(rng.uniform(-3, 3, (1600, 1)))
    y = jnp.asarray(np.where(np.asarray(x) < 0, -1.0, 1.0) * np.asarray(x)
                    + 0.1 * rng.standard_normal((1600, 1)))
    for kw in [dict(tied_affine=True), dict(hier_basis=True),
               dict(tied_affine=True, hier_basis=True)]:
        m = BayesianILR.make(size=6, input_dim=1, output_dim=1, kappa=0.05,
                             maxsubiter=5, dtype=jnp.float64, **kw)
        m.init_transform(x, y)
        st1, v1 = m.fit_vi((x, y), key=0, maxiter=40)
        st2, v2 = m.fit_vi_fused((x, y), key=0, maxiter=40, block_size=400)
        mu1, _, _, _ = m.predict(st1, x, y)
        mu2, _, _, _ = m.predict(st2, x, y)
        np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2),
                                   rtol=1e-5, atol=1e-6)
        # exact engine equivalence: the fused trace is the dense trace
        # shifted by one sweep (fused reports ELBO(state_t) pre-update)
        np.testing.assert_allclose(np.asarray(v1)[:-1], np.asarray(v2)[1:],
                                   rtol=1e-9, atol=1e-7)
        # fused Gibbs drives the family's inner-chain gibbs_update
        gs = m.fit_gibbs_fused((x, y), key=1, maxiter=20, block_size=400)
        assert gs.labels.shape == (1600,)
        assert np.isfinite(np.asarray(jax.tree.leaves(gs.params)[0])).all()
