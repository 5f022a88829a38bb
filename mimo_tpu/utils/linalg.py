"""Batched PSD linear algebra helpers.

TPU-native counterparts of the reference's scalar SciPy/LAPACK helpers
(/root/reference/mimo/utils/matrix.py). Everything here broadcasts over
arbitrary leading batch axes (typically the K component axis) and is safe
under `jit`/`vmap`/`pjit`.
"""

import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

# TPU matmuls at Precision.DEFAULT run bfloat16 passes; sufficient-statistic
# accumulation and the conjugate-update cancellations need full float32.
# Everything numerically critical in the package routes through these.
PRECISION = jax.lax.Precision.HIGHEST


def mm(a, b):
    """matmul at full float32 precision (6-pass on TPU MXU)."""
    return jnp.matmul(a, b, precision=PRECISION)


def einsum(subscripts, *operands):
    """einsum at full float32 precision."""
    return jnp.einsum(subscripts, *operands, precision=PRECISION)


def symmetrize(a):
    """0.5 * (A + A^T) over the trailing two axes (matrix.py:53-54)."""
    return 0.5 * (a + jnp.swapaxes(a, -1, -2))


def cholesky(a, jitter=0.0):
    """Batched Cholesky of a PSD matrix, with optional diagonal jitter."""
    if jitter:
        a = a + jitter * jnp.eye(a.shape[-1], dtype=a.dtype)
    return jnp.linalg.cholesky(symmetrize(a))


def chol_logdet(chol):
    """log|A| from chol(A): 2 * sum(log(diag))."""
    diag = jnp.diagonal(chol, axis1=-2, axis2=-1)
    return 2.0 * jnp.sum(jnp.log(diag), axis=-1)


def logdet_psd(a):
    """log-determinant of a PSD matrix via Cholesky (batched)."""
    return chol_logdet(cholesky(a))


def inv_psd(a):
    """Inverse of a PSD matrix via Cholesky (batched).

    Counterpart of matrix.py:39 (`invpd`), but batched and jit-safe.
    """
    chol = cholesky(a)
    eye = jnp.broadcast_to(jnp.eye(a.shape[-1], dtype=a.dtype), a.shape)
    return jax.scipy.linalg.cho_solve((chol, True), eye)


def solve_psd(a, b):
    """Solve A x = b for PSD A via Cholesky (batched over leading axes)."""
    chol = cholesky(a)
    return jax.scipy.linalg.cho_solve((chol, True), b)


def mvdigamma(a, d):
    """Multivariate digamma: sum_{i=0..d-1} digamma(a - i/2).

    Used for E[logdet Lambda] of a Wishart: the reference computes
    `sum(digamma((nu - arange(d)) / 2))` (composite.py:115); this equals
    mvdigamma(nu/2, d).
    """
    i = jnp.arange(d, dtype=a.dtype)
    return jnp.sum(digamma((a[..., None] - 0.5 * i)), axis=-1)


def mvgammaln(a, d):
    """Multivariate log-gamma, log Gamma_d(a) (scipy.special.multigammaln)."""
    i = jnp.arange(d, dtype=a.dtype)
    const = 0.25 * d * (d - 1) * jnp.log(jnp.asarray(jnp.pi, dtype=a.dtype))
    return const + jnp.sum(gammaln(a[..., None] - 0.5 * i), axis=-1)


def quad_form(x, a, m=None):
    """Batched quadratic form (x - m)^T A (x - m) -> (N, K).

    Args:
      x: (N, d) data.
      a: (K, d, d) PSD matrices.
      m: optional (K, d) centers.

    Computed in a MXU-friendly way: the (N, d^2) "squared feature" matrix
    xx is built ONCE (independent of K) and contracted against the flattened
    matrices with a single matmul, instead of materializing an (N, K, d)
    intermediate. This is the TPU-native replacement of the reference's
    `fold=False` N x d x d statistics path (gaussian.py:474-485) and the
    einsum hot loop 'kd,kdl,nl->kn' (gaussian.py:510-523).
    """
    n, d = x.shape
    k = a.shape[0]
    xx = (x[:, :, None] * x[:, None, :]).reshape(n, d * d)   # (N, d^2)
    af = a.reshape(k, d * d)                                 # (K, d^2)
    quad = mm(xx, af.T)                                      # x^T A x
    if m is not None:
        am = einsum('kde,ke->kd', a, m)                      # (K, d)
        mam = einsum('kd,kd->k', m, am)                      # (K,)
        quad = quad - 2.0 * mm(x, am.T) + mam
    return quad
