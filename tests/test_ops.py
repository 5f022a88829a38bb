"""Tests for the fused E-step ops: dense vs blockwise equality and the
logsumexp-collapse identity against the mixture engine's ELBO route."""

import jax
import jax.numpy as jnp
import numpy as np

from mimo_tpu.distributions.gating import Dirichlet
from mimo_tpu.distributions.niw import NIW, suff_stats
from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.models.mixture import MFState
from mimo_tpu.ops.estep import gmm_estep_dense, gmm_estep_blockwise
from mimo_tpu.utils.stats import normalize_log


def _setup(rng, n=1024, k=6, d=3):
    x = jnp.asarray(rng.standard_normal((n, d)))
    post = NIW(
        mu=jnp.asarray(rng.standard_normal((k, d))),
        kappa=jnp.asarray(rng.uniform(1.0, 5.0, k)),
        psi=jnp.asarray(np.tile(np.eye(d), (k, 1, 1)) * 0.7),
        nu=jnp.asarray(rng.uniform(d + 2.0, d + 8.0, k)),
    )
    log_pi = jnp.log(jnp.asarray(rng.dirichlet(np.ones(k))))
    return x, post, log_pi


def test_dense_blockwise_equal(rng):
    x, post, log_pi = _setup(rng)
    dense = gmm_estep_dense(post, log_pi, x)
    block = gmm_estep_blockwise(post, log_pi, x, block_size=128)
    for a, b in zip(dense.stats, block.stats):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(dense.lse, block.lse, rtol=1e-10)


def test_estep_matches_engine(rng):
    """The fused E-step's resp/stats must equal the mixture engine's
    expected_responsibilities + suff_stats route."""
    x, post, log_pi = _setup(rng)
    from mimo_tpu.distributions.niw import expected_log_likelihood
    ell = expected_log_likelihood(post, x) + log_pi[None, :]
    resp, lse = normalize_log(ell)
    stats = suff_stats(x, resp)
    dense = gmm_estep_dense(post, log_pi, x)
    for a, b in zip(stats, dense.stats):
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(jnp.sum(lse), dense.lse, rtol=1e-10)


def test_lse_identity(rng):
    """sum_k r_k (l_k - log r_k) == logsumexp(l): the ELBO-collapse identity
    the blockwise sweep relies on."""
    l = jnp.asarray(rng.standard_normal((32, 5)))
    resp, lse = normalize_log(l)
    direct = jnp.sum(resp * (l - jnp.log(resp)), axis=-1)
    np.testing.assert_allclose(direct, lse, rtol=1e-9)


def test_gammaln_diff_stable_at_large_a():
    """lgamma(a+h) - lgamma(a) via the rearranged Stirling difference: the
    naive f32 difference has ulp-of-lgamma error (+-4 nats at a ~ 2.5e6,
    the nu/2 of a posterior that absorbed N=1e7 points), which inflated
    every Student-t predictive normalizer at Gibbs/VI scale."""
    import math
    from mimo_tpu.utils.stats import gammaln_diff
    for a in (0.5, 2.0, 50.0, 99.5, 100.5, 1e4, 2.5e6, 1e8):
        for h in (0.5, 1.0, 8.0):
            exact = math.lgamma(a + h) - math.lgamma(a)
            got = float(gammaln_diff(jnp.float32(a), jnp.float32(h)))
            assert abs(got - exact) < 5e-4 * max(1.0, abs(exact)), (a, h)


def test_mvt_logpdf_huge_df_matches_gaussian_limit():
    """At df ~ 5e6 the Student-t is numerically Gaussian; the f32
    normalizer must agree with the Gaussian logpdf to ~1e-3 (the old
    naive gammaln difference was off by up to +-4)."""
    from mimo_tpu.utils.stats import mvt_logpdf, mvn_logpdf
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 2)), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((3, 2)), jnp.float32)
    lm = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32) * 2.0, (3, 2, 2))
    df = jnp.full((3,), 5e6, jnp.float32)
    t = np.asarray(mvt_logpdf(x, mu, lm, df))
    g = np.asarray(mvn_logpdf(x, mu, lm))
    np.testing.assert_allclose(t, g, atol=2e-3)
