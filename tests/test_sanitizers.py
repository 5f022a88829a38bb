"""Numerical sanitizers (SURVEY.md §5 'race detection' analogue): the
reference guards with NaN row-dropping (gaussian.py:191-192), np.seterr
wraps (gmm.py:352-354) and probability clips (bayesian.py:75). Here the
equivalents are static-shape zero-weight masking plus jnp.clip, and this
module is the jax_debug_nans-gated CI job the survey calls for: whole
fits run with the NaN debugger armed, so any non-finite intermediate
fails loudly instead of silently corrupting the posterior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_tpu.distributions.niw import GaussParams
from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.utils.data import nan_mask


@pytest.fixture(scope='module')
def data():
    key = jax.random.PRNGKey(7)
    mu = jnp.array([[-4., 0.], [4., 0.]], dtype=jnp.float64)
    lm = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float64), (2, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(mu, lm),
                                jnp.array([.5, .5]), 512)
    return x.astype(jnp.float64)


@pytest.fixture
def debug_nans():
    jax.config.update('jax_debug_nans', True)
    yield
    jax.config.update('jax_debug_nans', False)


def test_vi_under_debug_nans(data, debug_nans):
    m = BayesianGMM.make(size=4, dim=2, gating='dp', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    # fresh model object: cached jitted fits would bypass the nan checker
    state, vlb = m.fit_vi(data, key=1, maxiter=15)
    assert bool(jnp.isfinite(vlb[-1]))


def test_gibbs_under_debug_nans(data, debug_nans):
    m = BayesianGMM.make(size=4, dim=2, gating='dp', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    state = m.fit_gibbs(data, key=2, maxiter=15)
    assert int(jnp.sum(jnp.bincount(state.labels, length=4))) == 512


def test_nan_mask_equals_row_dropping(data):
    """Zero-weight masked fit == fit on the clean subset (the reference's
    boolean-indexing semantics, gaussian.py:191-192, with static shapes)."""
    x = np.asarray(data).copy()
    x[::7] = np.nan                                  # corrupt 74 rows
    clean = jnp.asarray(x[~np.isnan(x).any(axis=1)])
    xm, w = nan_mask(jnp.asarray(x))
    assert float(jnp.sum(w)) == clean.shape[0]

    m = BayesianGMM.make(size=4, dim=2, gating='dirichlet', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    # one masked VI sweep from identical responsibilities
    st_masked = m._mf_update((xm,), jnp.full((x.shape[0], 4), 0.25,
                                             jnp.float64), point_weights=w)
    st_clean = m._mf_update((clean,), jnp.full((clean.shape[0], 4), 0.25,
                                               jnp.float64))
    np.testing.assert_allclose(np.asarray(st_masked.components.mu),
                               np.asarray(st_clean.components.mu), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st_masked.components.psi),
                               np.asarray(st_clean.components.psi), rtol=1e-12)


def test_clip_guards_extreme_gating(data):
    """Degenerate stick-breaking draws stay finite (bayesian.py:75 clip)."""
    m = BayesianGMM.make(size=32, dim=2, gating='dp', alpha=1e-6,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float64)
    state = m.fit_gibbs(data, key=3, maxiter=10)
    assert bool(jnp.all(jnp.isfinite(state.log_pi)))


def test_stick_breaking_kl_finite_at_huge_counts():
    """f32 cancellation in the exclusive reverse-cumsum (total - cumsum)
    can make the LAST accumulated count slightly negative at counts ~ 1e7,
    driving the Beta posterior's delta below 0 and the stick KL to NaN
    (digamma(-1)); _reverse_cumsum_exclusive must clamp at 0."""
    from mimo_tpu.distributions.gating import (StickBreaking,
                                               _reverse_cumsum_exclusive)
    # counts engineered so the f32 running sums disagree in the last slot
    counts = jnp.asarray(
        np.r_[np.full(49, 199944.39), 173269.0], jnp.float32)
    acc = _reverse_cumsum_exclusive(counts)
    assert float(acc[-1]) == 0.0
    assert bool(jnp.all(acc >= 0.0))
    prior = StickBreaking.standard(50, 1.0, jnp.float32)
    post = prior.update(counts)
    assert bool(jnp.all(post.delta >= prior.delta))
    assert bool(jnp.isfinite(post.kl_divergence(prior)))
