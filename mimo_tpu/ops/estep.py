"""Fused GMM E-step: responsibilities + sufficient statistics + ELBO terms
without materializing N x K responsibilities in HBM.

The mean-field E-step (gmm.py:256-259 + gaussian.py:491-505 in the
reference) is, per data block B:
    logp  = ell(post, x_B) + E[log pi]          (B, K)  — two matmuls
    resp  = softmax(logp, axis=-1)
    stats += [resp^T x_B, resp^T 1, resp^T (x (x) x), resp^T 1]
    vlb   += sum(logsumexp(logp))               (collapsed data+label+entropy
                                                 terms: sum_n lse_k logp_nk)
The blockwise form caps live memory at B*(d^2 + K) regardless of N — the
TPU-native fix for the reference's N x d x d `fold=False` hazard
(gaussian.py:474-485) and its 4 GB K x N responsibility matrix at N=1e7.

Identity used for the ELBO accumulation: with r = softmax(l),
    sum_k r_k (l_k - log r_k) = logsumexp(l),
so the data + gating-label + label-entropy terms of the mixture ELBO
collapse to one logsumexp per point (the KL terms are N-independent and
added by the caller). For stick-breaking gating the label terms are NOT a
pure function of l (they need per-k accumulated counts), so the caller
adds the correction using the returned per-component counts.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mimo_tpu.distributions.niw import NIW, GaussStats, expected_stats
from mimo_tpu.utils.stats import LOG2PI


class EStepResult(NamedTuple):
    stats: GaussStats   # weighted sufficient statistics, summed over N
    lse: jax.Array      # () sum_n logsumexp_k logp_nk
    counts: jax.Array   # (K,) sum_n resp_nk  (== stats.n1; kept for clarity)


def pick_block_size(n, target=131072, multiple=1):
    """Largest divisor of n that is <= target and a multiple of `multiple`
    (Mosaic lane tiling needs multiples of 128; XLA scan blocks are free).
    Falls back to n itself when no such divisor exists."""
    for b in range(min(n, target), multiple - 1, -1):
        if n % b == 0 and b % multiple == 0:
            return b
    return n


def _estep_nat(post: NIW, log_pi):
    """Collapse the NIW posterior expectations into E-step natural params:
    logp_nk = x_n @ h1_k + <H2_k, x x^T> + c_k."""
    e_lm, e_mlm, e_l, e_logdet = expected_stats(post)
    d = post.mu.shape[-1]
    h1 = e_lm                                   # (K, d)
    h2 = e_l                                    # (K, d, d)  (= -1/2 E[Lambda])
    c = e_mlm + e_logdet + log_pi - 0.5 * d * LOG2PI
    return h1, h2, c


def _block_logp(x, h1, h2, c):
    n, d = x.shape
    k = h1.shape[0]
    xx = (x[:, :, None] * x[:, None, :]).reshape(n, d * d)
    return x @ h1.T + xx @ h2.reshape(k, d * d).T + c[None, :], xx


def gmm_estep_dense(post: NIW, log_pi, x):
    """Single-shot E-step; fine when N*K fits comfortably in HBM."""
    h1, h2, c = _estep_nat(post, log_pi)
    logp, xx = _block_logp(x, h1, h2, c)
    lse = jax.scipy.special.logsumexp(logp, axis=-1)
    resp = jnp.exp(logp - lse[:, None])
    d = x.shape[-1]
    counts = jnp.sum(resp, axis=0)
    stats = GaussStats(
        x=resp.T @ x,
        n1=counts,
        xxT=(resp.T @ xx).reshape(-1, d, d),
        n2=counts,
    )
    return EStepResult(stats=stats, lse=jnp.sum(lse), counts=counts)


def gmm_estep_blockwise(post: NIW, log_pi, x, block_size=65536):
    """Streamed E-step via lax.scan over N blocks: O(B*(K + d^2)) live
    memory. N must be a multiple of block_size (pad + weight upstream)."""
    h1, h2, c = _estep_nat(post, log_pi)
    n, d = x.shape
    nb = n // block_size
    assert nb * block_size == n, 'pad N to a multiple of block_size'
    xb = x.reshape(nb, block_size, d)
    k = h1.shape[0]

    def body(carry, x_blk):
        stats, lse_acc = carry
        logp, xx = _block_logp(x_blk, h1, h2, c)
        lse = jax.scipy.special.logsumexp(logp, axis=-1)
        resp = jnp.exp(logp - lse[:, None])
        counts = jnp.sum(resp, axis=0)
        new = GaussStats(
            x=stats.x + resp.T @ x_blk,
            n1=stats.n1 + counts,
            xxT=stats.xxT + (resp.T @ xx).reshape(k, d, d),
            n2=stats.n2 + counts,
        )
        return (new, lse_acc + jnp.sum(lse)), None

    zero = GaussStats(
        x=jnp.zeros((k, d), x.dtype),
        n1=jnp.zeros((k,), x.dtype),
        xxT=jnp.zeros((k, d, d), x.dtype),
        n2=jnp.zeros((k,), x.dtype),
    )
    (stats, lse), _ = jax.lax.scan(body, (zero, jnp.zeros((), x.dtype)), xb)
    return EStepResult(stats=stats, lse=lse, counts=stats.n1)


def gmm_gibbs_blockwise(key, params_nat, x, block_size=65536):
    """Streamed Gibbs label sweep: per block, plug-in log-probs ->
    categorical labels -> one-hot statistics, via `lax.scan`. Neither the
    N x K log-prob matrix nor the one-hot ever exist at full N
    (gmm.py:227-237 + utils/stats.py:8-21, fused).

    Args:
      key: PRNG key for this sweep.
      params_nat: (h1 (K, d), h2f (K, d*d), c (1, K)) plug-in natural form
        (pallas_gibbs.gauss_plugin_nat).
      x: (N, d), N a multiple of block_size.
    Returns: (labels (N,) int32, EStepResult with one-hot stats, lse=0).
    """
    h1, h2f, c2 = params_nat
    n, d = x.shape
    k = h1.shape[0]
    nb = n // block_size
    assert nb * block_size == n, 'pad N to a multiple of block_size'
    xb = x.reshape(nb, block_size, d).astype(jnp.float32)
    keys = jax.random.split(key, nb)

    def body(stats, inp):
        x_blk, kb = inp
        xx = (x_blk[:, :, None] * x_blk[:, None, :]).reshape(block_size,
                                                             d * d)
        logp = x_blk @ h1.T + xx @ h2f.T + c2
        labels = jax.random.categorical(kb, logp, axis=-1).astype(jnp.int32)
        oh = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        counts = jnp.sum(oh, axis=0)
        new = GaussStats(
            x=stats.x + oh.T @ x_blk,
            n1=stats.n1 + counts,
            xxT=stats.xxT + (oh.T @ xx).reshape(k, d, d),
            n2=stats.n2 + counts,
        )
        return new, labels

    zero = GaussStats(
        x=jnp.zeros((k, d), jnp.float32),
        n1=jnp.zeros((k,), jnp.float32),
        xxT=jnp.zeros((k, d, d), jnp.float32),
        n2=jnp.zeros((k,), jnp.float32),
    )
    stats, labels = jax.lax.scan(body, zero, (xb, keys))
    return labels.reshape(n), EStepResult(
        stats=stats, lse=jnp.zeros((), jnp.float32), counts=stats.n1)
