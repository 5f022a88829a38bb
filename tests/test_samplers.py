"""Monte-Carlo moment tests for the matrix-variate samplers with a
NON-DIAGONAL column precision — the exact axis where a wrong
triangular-solve orientation is invisible to diagonal-K tests
(regression: all matrix-normal-style samplers drew columns with
covariance (Lk^T Lk)^{-1} instead of K^{-1}).

Identity used: A ~ MN(M, Lambda^{-1}, K^{-1})  =>
E[(A - M)^T Lambda (A - M)] = p * K^{-1}   (p = row dim).
"""

import jax
import jax.numpy as jnp
import numpy as np

from mimo_tpu.distributions import mnw, mng, extra

K_COL = np.array([[2.0, 1.0], [1.0, 1.0]])   # deliberately non-diagonal
N_MC = 40_000


def _col_moment(A, W):
    """E[(A-0)^T W (A-0)] over leading MC axis; W per-sample (n,p,p) or
    diagonal (n,p)."""
    if W.ndim == 2:   # diagonal weights
        return np.einsum('npq,np,nps->qs', A, W, A) / A.shape[0]
    return np.einsum('npq,npr,nrs->qs', A, W, A) / A.shape[0]


def test_mnw_sampler_column_covariance():
    p = mnw.MNW(M=jnp.zeros((1, 3, 2)),
                K_=jnp.asarray(K_COL, jnp.float64)[None],
                psi=0.5 * jnp.eye(3, dtype=jnp.float64)[None],
                nu=jnp.array([10.0], jnp.float64))
    keys = jax.random.split(jax.random.PRNGKey(0), N_MC)
    samp = jax.jit(jax.vmap(lambda k: mnw.sample_params(k, p)))(keys)
    est = _col_moment(np.asarray(samp.A[:, 0]), np.asarray(samp.lmbda[:, 0]))
    want = 3 * np.linalg.inv(K_COL)
    np.testing.assert_allclose(est, want, rtol=0.05, atol=0.05)


def test_mng_sampler_row_covariance():
    p = mng.MNG(M=jnp.zeros((1, 3, 2)),
                K_=jnp.asarray(K_COL, jnp.float64)[None],
                alpha=jnp.full((1, 3), 4.0, jnp.float64),
                beta=jnp.full((1, 3), 2.0, jnp.float64))
    keys = jax.random.split(jax.random.PRNGKey(1), N_MC)
    samp = jax.jit(jax.vmap(lambda k: mng.sample_params(k, p)))(keys)
    est = _col_moment(np.asarray(samp.A[:, 0]),
                      np.asarray(samp.lmbda_diag[:, 0]))
    want = 3 * np.linalg.inv(K_COL)
    np.testing.assert_allclose(est, want, rtol=0.05, atol=0.05)


def test_matrix_normal_sample_column_covariance():
    m = jnp.zeros((3, 2), jnp.float64)
    v = 2.0 * jnp.eye(3, dtype=jnp.float64)          # row precision
    k = jnp.asarray(K_COL, jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(2), N_MC)
    A = np.asarray(jax.jit(jax.vmap(
        lambda kk: extra.matrix_normal_sample(kk, m, v, k)))(keys))
    est = np.einsum('npq,pr,nrs->qs', A, np.asarray(v), A) / N_MC
    want = 3 * np.linalg.inv(K_COL)
    np.testing.assert_allclose(est, want, rtol=0.05, atol=0.05)


def test_matrix_normal_sample_matches_logpdf_covariance():
    """The sampler must follow the density matrix_normal_logpdf evaluates:
    compare the MC mean log-density against the analytic differential
    entropy of MN(M, V^{-1}, K^{-1})."""
    m = jnp.zeros((2, 2), jnp.float64)
    v = jnp.asarray([[3.0, 0.5], [0.5, 1.0]], jnp.float64)
    k = jnp.asarray(K_COL, jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(3), N_MC)
    A = jax.jit(jax.vmap(
        lambda kk: extra.matrix_normal_sample(kk, m, v, k)))(keys)
    lp = jax.vmap(lambda a: extra.matrix_normal_logpdf(a, m, v, k))(A)
    # H = (pq/2) log(2 pi e) - (q/2) logdet V - (p/2) logdet K
    p_, q_ = 2, 2
    h = (0.5 * p_ * q_ * (np.log(2 * np.pi) + 1.0)
         - 0.5 * q_ * np.linalg.slogdet(np.asarray(v))[1]
         - 0.5 * p_ * np.linalg.slogdet(np.asarray(k))[1])
    np.testing.assert_allclose(-float(jnp.mean(lp)), h, rtol=0.02)


# ---------------------------------------------------------------------------
# MNW nat <-> std algebra (the NIW analogues live in test_niw.py)
# ---------------------------------------------------------------------------

def _random_mnw(rng, k=3, p=2, q=3):
    Ms = rng.standard_normal((k, p, q))
    a = rng.standard_normal((k, q, q))
    Ks = np.einsum('kij,klj->kil', a, a) + 2 * np.eye(q)
    b = rng.standard_normal((k, p, p))
    psis = np.einsum('kij,klj->kil', b, b) + 2 * np.eye(p)
    nus = rng.uniform(p + 2.0, p + 6.0, k)
    return mnw.MNW(M=jnp.asarray(Ms), K_=jnp.asarray(Ks),
                   psi=jnp.asarray(psis), nu=jnp.asarray(nus))


def test_mnw_nat_std_roundtrip():
    rng = np.random.default_rng(0)
    p = _random_mnw(rng)
    q = mnw.std_from_nat(mnw.nat_from_std(p))
    for a, b in zip(p, q):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-8)


def test_mnw_update_equals_nat_add():
    rng = np.random.default_rng(1)
    p = _random_mnw(rng)
    n, q_dim, p_dim = 60, 3, 2
    x = rng.standard_normal((n, q_dim))
    y = rng.standard_normal((n, p_dim))
    r = rng.uniform(0.1, 1.0, (n, 3))
    stats = mnw.suff_stats(jnp.asarray(x), jnp.asarray(y), jnp.asarray(r))
    direct = mnw.posterior_update(p, stats)
    via_nat = mnw.std_from_nat(mnw.LinGaussStats(*[
        a + b for a, b in zip(mnw.nat_from_std(p), stats)]))
    for a, b in zip(direct, via_nat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_tied_gibbs_exact_draws_all_families():
    """distributions/tied_gibbs: the exact tied blocked draws for all
    four base families — shared scale across K, correct posterior
    concentration (nu' = nu0 + N), and prior recovery at ZERO statistics
    (the property the Geweke harness builds its prior side on). The NIW
    leg is Geweke-certified end-to-end; this pins the MNW/NG/MNG legs'
    structure (not reachable through a model flag)."""
    import jax
    import jax.numpy as jnp
    from mimo_tpu.distributions import niw as _niw, ng as _ng, \
        mnw as _mnw, mng as _mng
    from mimo_tpu.distributions.tied_gibbs import tied_gibbs_update

    rng = np.random.default_rng(0)
    kk, d, n = 4, 2, 500
    x = jnp.asarray(rng.standard_normal((n, d)))
    y = jnp.asarray(rng.standard_normal((n, 1)))
    resp = jax.nn.softmax(jnp.asarray(rng.standard_normal((n, kk))), -1)
    key = jax.random.PRNGKey(0)

    cases = [
        (_niw.NIW.standard(kk, d, kappa=2.0, nu=6.0, dtype=jnp.float64),
         _niw.suff_stats(x, resp), 'lmbda', 'nu'),
        (_ng.NG.standard(kk, d, kappa=2.0, dtype=jnp.float64),
         _ng.suff_stats(x, resp), 'lmbda_diag', 'alpha'),
        (_mnw.MNW.standard(kk, 1, d, nu=5.0, dtype=jnp.float64),
         _mnw.suff_stats(x, y, resp), 'lmbda', 'nu'),
        (_mng.MNG.standard(kk, 1, d, dtype=jnp.float64),
         _mnw.suff_stats(x, y, resp), 'lmbda_diag', 'alpha'),
    ]
    for prior, stats, scale_attr, conc_attr in cases:
        post, params = tied_gibbs_update(key, prior, stats)
        sc = np.asarray(getattr(params, scale_attr))
        # shared scale: every component carries the SAME draw
        np.testing.assert_allclose(sc[0], sc[1], rtol=0, atol=0)
        np.testing.assert_allclose(sc[0], sc[-1], rtol=0, atol=0)
        assert np.isfinite(np.asarray(jax.tree.leaves(params)[0])).all()
        conc = np.asarray(getattr(post, conc_attr))
        base = np.asarray(getattr(prior, conc_attr))
        # concentration gains the FULL N (nu' = nu0 + N / alpha' =
        # alpha0 + N/2), not the reference's pooled mean(n_k)
        gain = conc.reshape(kk, -1)[0, 0] - base.reshape(kk, -1)[0, 0]
        expect = n if conc_attr == 'nu' else n / 2
        assert abs(gain - expect) < 1e-4 * expect, (conc_attr, gain)
        # zero statistics -> the draw IS a prior draw (posterior == prior)
        zs = jax.tree.map(jnp.zeros_like, stats)
        post0, _ = tied_gibbs_update(key, prior, zs)
        for a, b in zip(jax.tree.leaves(post0), jax.tree.leaves(prior)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-12)
