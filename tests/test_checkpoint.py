"""Checkpoint / resume: chunked fits with durable state, Gibbs chain
continuation, and crash-recovery semantics (SURVEY.md §5 aux subsystems)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.distributions.niw import GaussParams
from mimo_tpu.utils.checkpoint import (
    save_state, load_state, fit_with_checkpoints,
)


@pytest.fixture(scope='module')
def data():
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(
        jax.random.PRNGKey(7),
        GaussParams(jnp.asarray([[-4., 0.], [4., 0.], [0., 5.]]), lm),
        jnp.asarray([.3, .4, .3]), 2000)
    return x.astype(jnp.float64)


def test_save_load_roundtrip(tmp_path, data):
    m = BayesianGMM.make(size=4, dim=2, dtype=jnp.float64)
    st, _ = m.fit_vi(data, key=0, maxiter=20)
    p = str(tmp_path / 'state')
    save_state(p, st)
    st2 = load_state(p, st)
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gibbs_warm_start_continues(data):
    """Two 25-sweep runs chained via init_state behave like a longer chain
    (state evolves, stays finite, occupancy is preserved roughly)."""
    m = BayesianGMM.make(size=4, dim=2, dtype=jnp.float64)
    g1 = m.fit_gibbs(data, key=0, maxiter=25, init_labels='random')
    g2 = m.fit_gibbs(data, key=1, maxiter=25, init_state=g1)
    assert np.isfinite(np.asarray(g2.components.mu)).all()
    assert not np.array_equal(np.asarray(g1.labels), np.asarray(g2.labels))
    # chained run should keep the main components occupied
    c2 = np.bincount(np.asarray(g2.labels), minlength=4)
    assert (c2 > 100).sum() >= 3


def test_fit_with_checkpoints_resume(tmp_path, data):
    m = BayesianGMM.make(size=4, dim=2, dtype=jnp.float64)
    p = str(tmp_path / 'vi_ckpt')
    st, ran = fit_with_checkpoints(m, 'fit_vi', data, p, total_iters=60,
                                   chunk_iters=20, key=0)
    assert ran == 60
    assert os.path.exists(p + '.meta.json') or os.path.exists(p)
    # a "restarted process": resume finds everything done, runs nothing
    st2, ran2 = fit_with_checkpoints(m, 'fit_vi', data, p, total_iters=60,
                                     chunk_iters=20, key=0)
    assert ran2 == 0
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(st2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # extend the run: only the delta executes
    st3, ran3 = fit_with_checkpoints(m, 'fit_vi', data, p, total_iters=100,
                                     chunk_iters=20, key=0)
    assert ran3 == 40


def test_fit_with_checkpoints_gibbs(tmp_path, data):
    m = BayesianGMM.make(size=4, dim=2, dtype=jnp.float64)
    p = str(tmp_path / 'gibbs_ckpt')
    gs, ran = fit_with_checkpoints(m, 'fit_gibbs', data, p, total_iters=50,
                                   chunk_iters=25, key=0,
                                   init_labels='random')
    assert ran == 50
    assert np.isfinite(np.asarray(gs.components.mu)).all()
