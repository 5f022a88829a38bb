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
