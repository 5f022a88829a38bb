"""Standalone exponential-family densities that round out the reference's
L1 inventory: Wishart / Inverse-Wishart, Gamma / Inverse-Gamma, and
Matrix-Normal log-densities + samplers (reference wishart.py:156-311,
gamma.py:8-218, matrix.py:10-300, gaussian.py:1-250).

The core inference paths use the conjugate composites (niw/ng/mnw/mng);
these functions exist for direct density evaluation, priors over
covariances (inverse parameterizations), and completeness.
All batched over leading axes.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from mimo_tpu.utils.linalg import (
    cholesky, chol_logdet, inv_psd, mvgammaln, solve_psd,
)
from mimo_tpu.utils.stats import LOG2PI
from mimo_tpu.distributions.wishart import (
    wishart_sample, wishart_log_partition,
)


# -- Wishart / Inverse-Wishart ------------------------------------------------

def wishart_logpdf(x, psi, nu):
    """log W(X | psi, nu), E[X] = nu psi (wishart.py:134-137)."""
    d = psi.shape[-1]
    logdet_x = chol_logdet(cholesky(x))
    tr = jnp.trace(solve_psd(psi, x), axis1=-2, axis2=-1)
    return (0.5 * (nu - d - 1.0) * logdet_x - 0.5 * tr
            - wishart_log_partition(cholesky(psi), nu))


def inverse_wishart_sample(key, psi, nu):
    """Sigma ~ IW(psi, nu): inverse of a Wishart draw with inverted scale
    (wishart.py:217-250 convention: E[Sigma] = psi / (nu - d - 1))."""
    lmbda = wishart_sample(key, inv_psd(psi), nu)
    return inv_psd(lmbda)


def inverse_wishart_logpdf(x, psi, nu):
    """log IW(X | psi, nu)."""
    d = psi.shape[-1]
    logdet_x = chol_logdet(cholesky(x))
    logdet_psi = chol_logdet(cholesky(psi))
    tr = jnp.trace(solve_psd(x, psi), axis1=-2, axis2=-1)
    log_z = (0.5 * nu * d * jnp.log(jnp.asarray(2.0, nu.dtype))
             + mvgammaln(0.5 * nu, d) - 0.5 * nu * logdet_psi)
    return -0.5 * (nu + d + 1.0) * logdet_x - 0.5 * tr - log_z


def inverse_wishart_mean(psi, nu):
    d = psi.shape[-1]
    return psi / (nu - d - 1.0)[..., None, None]


# -- Gamma / Inverse-Gamma (vector rate parameterization, gamma.py) ----------

def gamma_logpdf(x, alpha, beta):
    """log Gamma(x | alpha, beta) with rate beta, elementwise."""
    return (alpha * jnp.log(beta) - gammaln(alpha)
            + (alpha - 1.0) * jnp.log(x) - beta * x)


def gamma_sample(key, alpha, beta):
    return jax.random.gamma(key, alpha, dtype=alpha.dtype) / beta


def inverse_gamma_logpdf(x, alpha, beta):
    """log IG(x | alpha, beta), elementwise (gamma.py:116-218)."""
    return (alpha * jnp.log(beta) - gammaln(alpha)
            - (alpha + 1.0) * jnp.log(x) - beta / x)


def inverse_gamma_sample(key, alpha, beta):
    return beta / jax.random.gamma(key, alpha, dtype=alpha.dtype)


# -- Matrix-Normal ------------------------------------------------------------

def matrix_normal_logpdf(a, m, v, k):
    """log MN(A | M, V^{-1} (rows), K^{-1} (cols)) with precision
    parameterization matching matrix.py:10-177: vec(A) ~ N(vec(M),
    (K (x) V)^{-1}); logpdf = p q/2 log2pi^{-1} + q/2 logdet V
    + p/2 logdet K - 1/2 tr[K (A-M)' V (A-M)]."""
    p, q = a.shape[-2], a.shape[-1]
    da = a - m
    quad = jnp.einsum('...pq,...pr,...rs,...sq->...', k, jnp.swapaxes(da, -1, -2), v, da)
    logdet_v = chol_logdet(cholesky(v))
    logdet_k = chol_logdet(cholesky(k))
    return (-0.5 * p * q * LOG2PI + 0.5 * q * logdet_v
            + 0.5 * p * logdet_k - 0.5 * quad)


def matrix_normal_sample(key, m, v, k):
    """A ~ MN(M, V^{-1}, K^{-1}): A = M + chol(V)^{-T} Z chol(K)^{-1}."""
    lv = cholesky(v)
    lk = cholesky(k)
    z = jax.random.normal(key, m.shape, m.dtype)
    u = jax.scipy.linalg.solve_triangular(jnp.swapaxes(lv, -1, -2), z,
                                          lower=False)
    # column covariance K^{-1} = Lk^{-T} Lk^{-1}: solve against Lk^T
    return m + jnp.swapaxes(jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(lk, -1, -2), jnp.swapaxes(u, -1, -2),
        lower=False), -1, -2)


# -- covariance-parameterized Gaussian (gaussian.py:125-250) ------------------

def gaussian_cov_logpdf(x, mu, sigma):
    """log N(x | mu, Sigma) with covariance parameterization; x (N, d),
    mu (K, d), sigma (K, d, d) -> (N, K)."""
    from mimo_tpu.utils.stats import mvn_logpdf
    return mvn_logpdf(x, mu, inv_psd(sigma))
