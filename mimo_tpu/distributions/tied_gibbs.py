"""EXACT blocked-Gibbs draws for scale-tied conjugate families.

The reference implements tied components by pooling the per-component
posterior scales during the nat->std map (composite.py:275-283, 800-808)
and then drawing K INDEPENDENT scale matrices from the pooled posterior
(composite.py:82-86) — an approximation of the tied model twice over:
the pooled (psi, nu) is not the conditional of any coherent joint, and
the K independent draws never share the scale the model says is shared.

None of that is necessary. The tied models are fully conjugate, so the
complete conditional p(params | labels, data) has a closed form and can
be drawn EXACTLY in one ancestral pass:

  tied Gaussian     Lambda ~ W(psi0, nu0) shared;
                    mu_k | Lambda ~ N(m_k, (kappa_k Lambda)^{-1});
                    x | z=k ~ N(mu_k, Lambda^{-1}).
    Completing the square in each mu_k leaves a pure Wishart in Lambda:
      kappa'_k = kappa_k + n_k;  m'_k = (kappa_k m_k + s_k)/kappa'_k
      psi'^{-1} = psi0^{-1} + sum_k [S_k - n_k xbar_k xbar_k^T
                    + (kappa_k n_k / kappa'_k)(xbar_k - m_k)(xbar_k - m_k)^T]
      nu' = nu0 + N
    Draw Lambda ~ W(psi', nu') ONCE, then mu_k | Lambda independently.

  tied linear       Lambda shared; A_k | Lambda ~ MN(M_k, L^{-1}, K_k^{-1}).
    Same structure: complete the square in each A_k,
      K'_k = K_k + Sxx_k;  M'_k = (M_k K_k + Syx_k) K'_k^{-1}
      psi'^{-1} = psi0^{-1} + sum_k [Syy_k + M_k K_k M_k^T - M'_k K'_k M'_k^T]
      nu' = nu0 + N
    Draw Lambda once, then A_k | Lambda.

  diagonal variants (tied NG / tied MNG): identical per-dimension with
  Gamma(alpha' = alpha0 + N/2, beta' = beta0 + residual/2) in place of
  the Wishart.

These one-shot draws replace the reference's pooled approximation in the
production Gibbs engines (wired as Family.gibbs_update by
conjugate.families.tied_family) — they are exact (Geweke-certified by
scripts/geweke_gibbs.py --family tied / tied-diag) AND cheaper: one
Wishart draw instead of K.

The sweep's label kernel conditions on these params like any other
family; the returned posterior summary carries the exact conditional
(per-component location params, shared scale broadcast over K).
"""

import jax
import jax.numpy as jnp

from mimo_tpu.distributions.niw import NIW, GaussStats, GaussParams
from mimo_tpu.distributions.ng import NG, DiagGaussStats, DiagGaussParams
from mimo_tpu.distributions.mnw import MNW, LinGaussStats, LinGaussParams
from mimo_tpu.distributions.mng import MNG, DiagLinGaussParams
from mimo_tpu.distributions.wishart import wishart_sample
from mimo_tpu.utils.linalg import cholesky, inv_psd, symmetrize, solve_psd


def _gauss_scaled_draw(key, mean, kappa, chol_lmbda):
    """x ~ N(mean, (kappa Lambda)^{-1}) given chol(Lambda), batched.
    mean (K, d), kappa (K,), chol_lmbda (K, d, d)."""
    z = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    delta = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol_lmbda, -1, -2), z[..., None], lower=False)[..., 0]
    return mean + delta / jnp.sqrt(kappa)[..., None]


def tied_niw_gibbs(key, prior: NIW, stats: GaussStats):
    """Exact tied-Gaussian blocked draw. prior psi/nu must be identical
    across K (they are, by construction of the tied priors)."""
    k_w, k_m = jax.random.split(key)
    kk, d = prior.mu.shape
    kappa_n = prior.kappa + stats.n1
    mu_n = (prior.kappa[:, None] * prior.mu + stats.x) / kappa_n[:, None]
    n_safe = jnp.maximum(stats.n1, jnp.asarray(1e-12, stats.n1.dtype))
    xbar = stats.x / n_safe[:, None]
    scatter = stats.xxT - stats.n1[:, None, None] * (
        xbar[:, :, None] * xbar[:, None, :])
    dm = xbar - prior.mu
    coef = prior.kappa * stats.n1 / kappa_n
    psi_inv = (inv_psd(prior.psi[:1])[0]
               + jnp.sum(scatter, axis=0)
               + jnp.einsum('k,kd,ke->de', coef, dm, dm))
    psi_n = inv_psd(symmetrize(psi_inv)[None])                 # (1, d, d)
    nu_n = prior.nu[:1] + jnp.sum(stats.n2)                    # (1,)
    lmbda = wishart_sample(k_w, psi_n, nu_n)                   # (1, d, d)
    lmbda = jnp.broadcast_to(lmbda, (kk, d, d))
    mus = _gauss_scaled_draw(k_m, mu_n, kappa_n, cholesky(lmbda))
    post = NIW(mu=mu_n, kappa=kappa_n,
               psi=jnp.broadcast_to(psi_n, (kk, d, d)),
               nu=jnp.broadcast_to(nu_n, (kk,)))
    return post, GaussParams(mu=mus, lmbda=lmbda)


def tied_ng_gibbs(key, prior: NG, stats: DiagGaussStats):
    """Exact tied-diagonal-Gaussian blocked draw (shared lambda_diag)."""
    k_g, k_m = jax.random.split(key)
    kk, d = prior.mu.shape
    n = stats.n1[:, None]
    kappa_n = prior.kappa + n
    mu_n = (prior.kappa * prior.mu + stats.x) / kappa_n
    n_safe = jnp.maximum(n, jnp.asarray(1e-12, n.dtype))
    xbar = stats.x / n_safe
    scatter = stats.xsq - n * jnp.square(xbar)
    coef = prior.kappa * n / kappa_n
    beta_n = prior.beta[:1] + 0.5 * jnp.sum(
        scatter + coef * jnp.square(xbar - prior.mu), axis=0, keepdims=True)
    alpha_n = prior.alpha[:1] + 0.5 * jnp.sum(stats.n1)        # (1, d)
    lam = jax.random.gamma(k_g, alpha_n, dtype=alpha_n.dtype) / beta_n
    lam = jnp.broadcast_to(lam, (kk, d))
    z = jax.random.normal(k_m, mu_n.shape, dtype=mu_n.dtype)
    mus = mu_n + z / jnp.sqrt(kappa_n * lam)
    post = NG(mu=mu_n, kappa=kappa_n,
              alpha=jnp.broadcast_to(alpha_n, (kk, d)),
              beta=jnp.broadcast_to(beta_n, (kk, d)))
    return post, DiagGaussParams(mu=mus, lmbda_diag=lam)


def _mn_draw_rows(key, m, k_chol, chol_lmbda):
    """A ~ MN(m, Lambda^{-1}, K^{-1}) given chol(Lambda), chol(K), batched.
    m (K, p, q)."""
    z = jax.random.normal(key, m.shape, dtype=m.dtype)
    u = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol_lmbda, -1, -2), z, lower=False)
    w = jnp.swapaxes(jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(k_chol, -1, -2), jnp.swapaxes(u, -1, -2),
        lower=False), -1, -2)
    return m + w


def tied_mnw_gibbs(key, prior: MNW, stats: LinGaussStats):
    """Exact tied-linear-Gaussian blocked draw (shared noise Lambda)."""
    k_w, k_a = jax.random.split(key)
    kk, p, q = prior.M.shape
    k_n = prior.K_ + stats.xxT
    mk = prior.M @ prior.K_ + stats.yxT
    m_n = jnp.swapaxes(solve_psd(k_n, jnp.swapaxes(mk, -1, -2)), -1, -2)
    per_k = (stats.yyT
             + prior.M @ prior.K_ @ jnp.swapaxes(prior.M, -1, -2)
             - m_n @ k_n @ jnp.swapaxes(m_n, -1, -2))
    psi_inv = inv_psd(prior.psi[:1])[0] + jnp.sum(per_k, axis=0)
    psi_n = inv_psd(symmetrize(psi_inv)[None])                 # (1, p, p)
    nu_n = prior.nu[:1] + jnp.sum(stats.n)
    lmbda = jnp.broadcast_to(wishart_sample(k_w, psi_n, nu_n), (kk, p, p))
    a_s = _mn_draw_rows(k_a, m_n, cholesky(k_n), cholesky(lmbda))
    post = MNW(M=m_n, K_=k_n,
               psi=jnp.broadcast_to(psi_n, (kk, p, p)),
               nu=jnp.broadcast_to(nu_n, (kk,)))
    return post, LinGaussParams(A=a_s, lmbda=lmbda)


def tied_mng_gibbs(key, prior: MNG, stats: LinGaussStats):
    """Exact tied-diagonal-noise linear-Gaussian blocked draw."""
    k_g, k_a = jax.random.split(key)
    kk, p, q = prior.M.shape
    k_n = prior.K_ + stats.xxT
    mk = prior.M @ prior.K_ + stats.yxT
    m_n = jnp.swapaxes(solve_psd(k_n, jnp.swapaxes(mk, -1, -2)), -1, -2)
    resid = (stats.yyT
             + prior.M @ prior.K_ @ jnp.swapaxes(prior.M, -1, -2)
             - m_n @ k_n @ jnp.swapaxes(m_n, -1, -2))
    beta_n = prior.beta[:1] + 0.5 * jnp.sum(
        jnp.diagonal(resid, axis1=-2, axis2=-1), axis=0, keepdims=True)
    alpha_n = prior.alpha[:1] + 0.5 * jnp.sum(stats.n)         # (1, p)
    lam = jax.random.gamma(k_g, alpha_n, dtype=alpha_n.dtype) / beta_n
    lam = jnp.broadcast_to(lam, (kk, p))                       # (K, p)
    # A rows have covariance lam_i^{-1} K'^{-1}
    k_chol = cholesky(k_n)
    z = jax.random.normal(k_a, m_n.shape, dtype=m_n.dtype)
    u = z / jnp.sqrt(lam)[..., None]
    w = jnp.swapaxes(jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(k_chol, -1, -2), jnp.swapaxes(u, -1, -2),
        lower=False), -1, -2)
    post = MNG(M=m_n, K_=k_n,
               alpha=jnp.broadcast_to(alpha_n, (kk, p)),
               beta=jnp.broadcast_to(beta_n, (kk, p)))
    return post, DiagLinGaussParams(A=m_n + w, lmbda_diag=lam)


_TIED_GIBBS = {NIW: tied_niw_gibbs, NG: tied_ng_gibbs,
               MNW: tied_mnw_gibbs, MNG: tied_mng_gibbs}


def tied_gibbs_update(key, prior, stats):
    """Dispatch the exact tied blocked draw on the prior's type."""
    fn = _TIED_GIBBS.get(type(prior))
    if fn is None:
        raise TypeError(f'no exact tied Gibbs for {type(prior).__name__}')
    return fn(key, prior, stats)
