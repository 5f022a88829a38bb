"""Wishart distribution primitives, batched over a leading component axis.

Convention (same as the reference, wishart.py:11-153): Lambda ~ W(psi, nu)
with E[Lambda] = nu * psi. The sampler is a fully-batched Bartlett
decomposition (reference: a per-draw Python loop of chi-square draws,
wishart.py:72-92) — here one `jax.random.gamma` + one triangular matmul for
all K components at once.
"""

import jax
import jax.numpy as jnp

from mimo_tpu.utils.linalg import (
    cholesky, chol_logdet, mvdigamma, mvgammaln,
)


def wishart_sample(key, psi, nu):
    """Draw Lambda ~ W(psi, nu), batched: psi (..., d, d), nu (...,).

    Bartlett: A lower-triangular with A_ii ~ sqrt(chi2(nu - i)),
    A_ij ~ N(0,1) for i > j; Lambda = (L A)(L A)^T with L = chol(psi).
    """
    d = psi.shape[-1]
    batch = psi.shape[:-2]
    k_norm, k_chi = jax.random.split(key)

    normals = jax.random.normal(k_norm, batch + (d, d), dtype=psi.dtype)
    tril = jnp.tril(normals, k=-1)

    # chi2(k) = 2 * Gamma(k/2); diagonal i uses df = nu - i.
    i = jnp.arange(d, dtype=psi.dtype)
    df = nu[..., None] - i                                    # (..., d)
    chi2 = 2.0 * jax.random.gamma(k_chi, 0.5 * df, dtype=psi.dtype)
    a = tril + jnp.zeros_like(normals).at[..., i.astype(int), i.astype(int)].set(
        jnp.sqrt(chi2))

    l = cholesky(psi)
    t = l @ a
    return t @ jnp.swapaxes(t, -1, -2)


def wishart_expected_logdet(psi_chol, nu):
    """E[logdet Lambda] = mvdigamma(nu/2, d) + d log 2 + logdet psi
    (reference composite.py:115-116)."""
    d = psi_chol.shape[-1]
    return (mvdigamma(0.5 * nu, d) + d * jnp.log(jnp.asarray(2.0, nu.dtype))
            + chol_logdet(psi_chol))


def wishart_log_partition(psi_chol, nu):
    """log Z of W(psi, nu): nu*d/2 log2 + log Gamma_d(nu/2) + nu/2 logdet psi
    (reference wishart.py:129-132)."""
    d = psi_chol.shape[-1]
    return (0.5 * nu * d * jnp.log(jnp.asarray(2.0, nu.dtype))
            + mvgammaln(0.5 * nu, d)
            + 0.5 * nu * chol_logdet(psi_chol))
