"""Pallas kernel tests (interpreter mode on the CPU test mesh): the fused
E-step must match the dense XLA path; the fused Gibbs kernel must sample
valid labels whose one-hot statistics are self-consistent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_tpu.distributions.niw import NIW
from mimo_tpu.ops.estep import gmm_estep_dense
from mimo_tpu.ops.pallas_estep import gmm_estep_pallas
from mimo_tpu.ops.pallas_gibbs import gibbs_labels_from_xt, gauss_plugin_nat
from mimo_tpu.distributions.niw import GaussParams


@pytest.fixture(scope='module')
def problem():
    rng = np.random.default_rng(5)
    n, k, d = 1024, 6, 2
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    post = NIW(
        mu=jnp.asarray(rng.standard_normal((k, d)), jnp.float32),
        kappa=jnp.asarray(rng.uniform(1, 5, k), jnp.float32),
        psi=jnp.broadcast_to(0.7 * jnp.eye(d), (k, d, d)).astype(jnp.float32),
        nu=jnp.asarray(rng.uniform(d + 2, d + 8, k), jnp.float32),
    )
    log_pi = jnp.log(jnp.full((k,), 1.0 / k, jnp.float32))
    return x, post, log_pi


def test_fused_estep_matches_dense(problem):
    x, post, log_pi = problem
    dense = gmm_estep_dense(post, log_pi, x)
    fused = gmm_estep_pallas(post, log_pi, x, block_size=256)
    for a, b in zip(dense.stats, fused.stats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(dense.lse), float(fused.lse), rtol=1e-5)


def test_fused_estep_padded_tail(problem):
    """N not a multiple of block_size: the launcher zero-pads and the
    kernel masks the tail, so results match the dense path exactly."""
    x, post, log_pi = problem
    x = x[:1000]                                  # 1000 % 256 != 0
    dense = gmm_estep_dense(post, log_pi, x)
    fused = gmm_estep_pallas(post, log_pi, x, block_size=256)
    for a, b in zip(dense.stats, fused.stats):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(dense.lse), float(fused.lse), rtol=1e-5)


def test_fused_gibbs_labels(problem):
    x, post, log_pi = problem
    from mimo_tpu.distributions.niw import mode_params
    params = mode_params(post)
    nat = gauss_plugin_nat(params, log_pi)
    xt = x.T
    labels, res = gibbs_labels_from_xt(42, nat, xt, block_size=256)
    labels = np.asarray(labels)
    k = post.mu.shape[0]
    assert labels.min() >= 0 and labels.max() < k
    # one-hot stats consistent with the sampled labels
    counts = np.bincount(labels, minlength=k)
    np.testing.assert_allclose(np.asarray(res.counts), counts, atol=1e-3)
    s1 = np.zeros((k, 2))
    np.add.at(s1, labels, np.asarray(x))
    np.testing.assert_allclose(np.asarray(res.stats.x), s1, rtol=1e-4,
                               atol=1e-4)
    # labels roughly follow the softmax distribution (chi^2-ish sanity)
    from mimo_tpu.distributions.niw import log_likelihood
    logp = np.asarray(log_likelihood(params, x)) + np.asarray(log_pi)
    probs = np.exp(logp - logp.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    expected = probs.sum(0)
    assert np.all(np.abs(counts - expected)
                  <= 5 * np.sqrt(expected * (1 - expected / len(labels)))
                  + 5)
