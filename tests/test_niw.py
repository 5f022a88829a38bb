"""Unit tests for the Normal-Wishart family: round-trips, update oracles,
Monte-Carlo expectations, KL properties, predictive consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_tpu.distributions import niw
from mimo_tpu.distributions.niw import NIW, GaussStats


def random_niw(rng, k=4, d=3):
    a = rng.standard_normal((k, d, d))
    psi = np.einsum('kij,klj->kil', a, a) + 3 * np.eye(d)
    return NIW(
        mu=jnp.asarray(rng.standard_normal((k, d))),
        kappa=jnp.asarray(rng.uniform(0.5, 3.0, k)),
        psi=jnp.asarray(psi),
        nu=jnp.asarray(rng.uniform(d + 2.0, d + 9.0, k)),
    )


def random_stats(rng, k=4, d=3, n=50):
    x = rng.standard_normal((n, d))
    r = rng.uniform(0.1, 1.0, (n, k))
    from mimo_tpu.distributions.niw import suff_stats
    return suff_stats(jnp.asarray(x), jnp.asarray(r)), x, r


def test_nat_std_roundtrip(rng):
    p = random_niw(rng)
    q = niw.std_from_nat(niw.nat_from_std(p))
    for a, b in zip(p, q):
        np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-9)


def test_update_equals_nat_add(rng):
    """Centered-form update must equal nat(post) = nat(prior) + stats."""
    p = random_niw(rng)
    stats, _, _ = random_stats(rng)
    direct = niw.posterior_update(p, stats)
    via_nat = niw.std_from_nat(GaussStats(*[
        a + b for a, b in zip(niw.nat_from_std(p), stats)]))
    for a, b in zip(direct, via_nat):
        np.testing.assert_allclose(a, b, rtol=1e-7, atol=1e-8)


def test_suff_stats_oracle(rng):
    stats, x, r = random_stats(rng)
    np.testing.assert_allclose(stats.x, r.T @ x, rtol=1e-10)
    np.testing.assert_allclose(stats.n1, r.sum(0), rtol=1e-10)
    np.testing.assert_allclose(
        stats.xxT, np.einsum('nd,nk,nl->kdl', x, r, x), rtol=1e-9)


@pytest.mark.slow
def test_expected_log_likelihood_monte_carlo(rng, key):
    """E_q[log N(x|mu,Lambda^-1)] via 20k NW samples."""
    p = random_niw(rng, k=2, d=2)
    x = jnp.asarray(rng.standard_normal((5, 2)))
    analytic = niw.expected_log_likelihood(p, x)

    samples = 6000
    keys = jax.random.split(key, samples)
    lls = jax.vmap(lambda k: niw.log_likelihood(niw.sample_params(k, p), x))(keys)
    mc = jnp.mean(lls, axis=0)
    np.testing.assert_allclose(analytic, mc, rtol=0.05, atol=0.05)


def test_sample_params_moments(rng, key):
    p = random_niw(rng, k=3, d=2)
    keys = jax.random.split(key, 12000)
    params = jax.vmap(lambda k: niw.sample_params(k, p))(keys)
    np.testing.assert_allclose(
        jnp.mean(params.lmbda, 0),
        p.nu[:, None, None] * p.psi, rtol=0.1, atol=0.1)
    np.testing.assert_allclose(jnp.mean(params.mu, 0), p.mu, atol=0.08)


def test_kl_properties(rng):
    q = random_niw(rng)
    p = random_niw(rng)
    kl_qq = niw.kl_divergence(q, q)
    np.testing.assert_allclose(kl_qq, 0.0, atol=1e-7)
    assert np.all(np.asarray(niw.kl_divergence(q, p)) > 0)


def test_predictive_equals_marginal_of_one_point(rng):
    """For a single data point, log p(x) = logZ(post)-logZ(prior)-d/2 log2pi
    must equal the prior-predictive Student-t density at x."""
    p = random_niw(rng, k=3, d=2)
    x = jnp.asarray(rng.standard_normal((1, 2)))
    stats = niw.suff_stats(x, jnp.ones((1, 3)))
    post = niw.posterior_update(p, stats)
    lml = niw.log_marginal_likelihood(p, post, 1.0)
    pred = niw.log_predictive_studentt(p, x)[0]
    np.testing.assert_allclose(lml, pred, rtol=1e-8, atol=1e-8)


@pytest.mark.slow
def test_predictive_studentt_monte_carlo(rng, key):
    """Predictive t == E_{(mu,L)~NW}[N(x|mu,L^-1)] (log-domain MC check)."""
    p = random_niw(rng, k=2, d=2)
    x = jnp.asarray(rng.standard_normal((4, 2)) * 0.5)
    analytic = niw.log_predictive_studentt(p, x)
    keys = jax.random.split(key, 12000)
    lls = jax.vmap(lambda k: niw.log_likelihood(niw.sample_params(k, p), x))(keys)
    mc = jax.scipy.special.logsumexp(lls, axis=0) - jnp.log(lls.shape[0])
    np.testing.assert_allclose(analytic, mc, rtol=0.05, atol=0.05)
