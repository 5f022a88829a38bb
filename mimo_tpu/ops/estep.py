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
    Falls back to n itself when the best divisor is degenerate — a tiny
    divisor (e.g. 1 for prime n) would turn the blockwise scan into an
    n-step sequential loop, far worse than one big block."""
    for b in range(min(n, target), multiple - 1, -1):
        if n % b == 0 and b % multiple == 0:
            if b >= min(n, max(multiple, target // 64)):
                return b
            break
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


def _estep_theta(h1, h2, c):
    """Stack the E-step natural params as one (K, 1+d+d^2) matrix so
    logp = F @ theta^T with F = [1, x, x (x) x]."""
    k, d = h1.shape
    return jnp.concatenate([c[:, None], h1, h2.reshape(k, d * d)], axis=-1)


def _features(x):
    """[1, x, x (x) x] -> (N, 1+d+d^2), the Gaussian sufficient-statistic
    feature map shared by the log-density AND the statistic reduction."""
    n, d = x.shape
    xx = (x[:, :, None] * x[:, None, :]).reshape(n, d * d)
    return jnp.concatenate([jnp.ones((n, 1), x.dtype), x, xx], axis=-1)


def _split_acc(acc, d):
    """(K, 1+d+d^2) accumulated [counts | s1 | sxx] -> GaussStats."""
    counts = acc[:, 0]
    return GaussStats(x=acc[:, 1:1 + d], n1=counts,
                      xxT=acc[:, 1 + d:].reshape(-1, d, d), n2=counts)


def gmm_estep_dense(post: NIW, log_pi, x):
    """Single-shot E-step; fine when N*K fits comfortably in HBM.

    Two matmuls total: logp = F @ theta^T and stats = ex^T @ (F/denom).
    Normalizing the (N, 1+d+d^2) FEATURES by the softmax denominator —
    instead of normalizing the (N, K) numerator into responsibilities —
    keeps one fewer N x K array out of HBM (measured 1.7x on the full VI
    sweep at N=1e6, K=50)."""
    d = x.shape[-1]
    h1, h2, c = _estep_nat(post, log_pi)
    feats = _features(x)
    logp = feats @ _estep_theta(h1, h2, c).T
    m = jnp.max(logp, axis=-1)
    ex = jnp.exp(logp - m[:, None])
    denom = jnp.sum(ex, axis=-1)
    lse = m + jnp.log(denom)
    acc = ex.T @ (feats / denom[:, None])
    stats = _split_acc(acc, d)
    return EStepResult(stats=stats, lse=jnp.sum(lse), counts=stats.n1)


def gmm_estep_blockwise(post: NIW, log_pi, x, block_size=65536):
    """Streamed E-step via lax.scan over N blocks: O(B*(K + d^2)) live
    memory; same scaled-feature trick as gmm_estep_dense (responsibilities
    never exist, even per block). N must be a multiple of block_size (pad
    + weight upstream)."""
    h1, h2, c = _estep_nat(post, log_pi)
    n, d = x.shape
    nb = n // block_size
    assert nb * block_size == n, 'pad N to a multiple of block_size'
    xb = x.reshape(nb, block_size, d)
    k = h1.shape[0]
    theta = _estep_theta(h1, h2, c)

    def body(carry, x_blk):
        acc, lse_acc = carry
        feats = _features(x_blk)
        logp = feats @ theta.T
        m = jnp.max(logp, axis=-1)
        ex = jnp.exp(logp - m[:, None])
        denom = jnp.sum(ex, axis=-1)
        lse = m + jnp.log(denom)
        acc = acc + ex.T @ (feats / denom[:, None])
        return (acc, lse_acc + jnp.sum(lse)), None

    zero = jnp.zeros((k, 1 + d + d * d), x.dtype)
    (acc, lse), _ = jax.lax.scan(body, (zero, jnp.zeros((), x.dtype)), xb)
    stats = _split_acc(acc, d)
    return EStepResult(stats=stats, lse=lse, counts=stats.n1)


def gmm_gibbs_blockwise(key, params_nat, x, block_size=65536):
    """Streamed Gibbs label sweep: per block, plug-in log-probs ->
    categorical labels -> one-hot statistics, via `lax.scan`. Neither the
    N x K log-prob matrix nor the one-hot ever exist at full N
    (gmm.py:227-237 + utils/stats.py:8-21, fused).

    Args:
      key: PRNG key for this sweep.
      params_nat: (h1 (K, d), h2f (K, d*d), c (K, 1)) plug-in natural form
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
    theta = jnp.concatenate([c2.reshape(k, 1), h1, h2f], axis=-1)

    def body(acc, inp):
        x_blk, kb = inp
        feats = _features(x_blk)
        logp = feats @ theta.T
        labels = jax.random.categorical(kb, logp, axis=-1).astype(jnp.int32)
        oh = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        return acc + oh.T @ feats, labels

    zero = jnp.zeros((k, 1 + d + d * d), jnp.float32)
    acc, labels = jax.lax.scan(body, zero, (xb, keys))
    stats = _split_acc(acc, d)
    return labels.reshape(n), EStepResult(
        stats=stats, lse=jnp.zeros((), jnp.float32), counts=stats.n1)
