"""Pallas TPU kernel: fused GMM E-step.

One pass over HBM-resident data computes, per block of B points:
    logp = h1 @ x^T + h2 @ (x (x) x)^T + c          (K, B)  [MXU]
    lse  = logsumexp(logp, axis=0)                   (B,)
    resp = exp(logp - lse)                           (K, B)
and accumulates s1 (K,d), sxx (K,d^2), counts (K,) and sum(lse) into
VMEM-resident accumulators revisited by every grid step (TPU grids are
sequential, so cross-step read-modify-write is safe).

The N x K responsibility matrix never exists in HBM — the fix for the
reference's 4 GB K x N matrix at N=1e7 (SURVEY.md §5) and its `fold=False`
N x d x d expected-stats tensor (gaussian.py:474-485).

Layout notes (measured on TPU):
  * data is fed TRANSPOSED, (d, B) blocks: with d << 128 the natural (B, d)
    layout pads the lane dimension 128/d-fold (a (32768, 2) f32 block would
    occupy 16 MB of VMEM instead of 256 KB);
  * everything stays in (K, B) orientation — K on sublanes, points on
    lanes. logp = h @ xt is the native matmul form (contraction over d),
    and the stat reductions resp @ stripe^T contract over the lane axis of
    both operands (the "NT" form Mosaic lowers without transposes). The
    previous (B, K) orientation forced a B-lanes->sublanes rotation per
    dot_general and padded K 50->128 on every VPU op — 2.8x slower;
  * the quadratic features are processed as d unrolled column stripes
    (Mosaic cannot reshape (B, d, d) -> (B, d^2));
  * softmax reduction runs over the sublane (K) axis; with K <= 128 the
    padding waste is K -> ceil8(K), not K -> 128.

ELBO: sum_n lse_n equals the data + gating-label + label-entropy terms of
the mixture ELBO for BOTH Dirichlet and stick-breaking gating (the TSB
per-k accumulated-count term telescopes to counts_k E[log pi_k]); the
caller adds the N-independent KL terms.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimo_tpu.distributions.niw import NIW, GaussStats
from mimo_tpu.ops.estep import _estep_nat, EStepResult


def _nt(a, b):
    """dot_general contracting the last (lane) axis of both operands:
    (M, B) x (N, B) -> (M, N)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _estep_kernel(n_valid, x_ref, h1_ref, h2_ref, c_ref,
                  s1_ref, sxx_ref, cnt_ref, lse_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        sxx_ref[:] = jnp.zeros_like(sxx_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        lse_ref[:] = jnp.zeros_like(lse_ref)

    xt = x_ref[:]                                    # (d, B)
    d, b = xt.shape

    # quadratic-feature stripes, reused by logp and the stat reduction
    stripes = [xt * xt[j:j + 1, :] for j in range(d)]    # d x (d, B)

    # logp (K, B): native matmul orientation, contraction over d
    logp = jnp.dot(h1_ref[:], xt,
                   preferred_element_type=jnp.float32) + c_ref[:]
    for j in range(d):
        logp += jnp.dot(h2_ref[:, j * d:(j + 1) * d], stripes[j],
                        preferred_element_type=jnp.float32)

    m = jnp.max(logp, axis=0, keepdims=True)         # (1, B)
    ex = jnp.exp(logp - m)                           # (K, B)
    if n_valid is None:
        denom = jnp.sum(ex, axis=0, keepdims=True)   # (1, B)
        lse = m + jnp.log(denom)
        resp = ex / denom                            # (K, B)
    else:
        # zero-mask padded tail columns (launcher pads N up to a
        # block_size multiple) so they contribute nothing to stats/lse
        col = i * b + jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        mask = (col < n_valid).astype(jnp.float32)   # (1, B)
        ex = ex * mask
        denom = jnp.sum(ex, axis=0, keepdims=True)
        safe = jnp.maximum(denom, jnp.float32(1e-37))
        lse = (m + jnp.log(safe)) * mask
        resp = ex / safe                             # 0 on padded columns

    s1_ref[:] += _nt(resp, xt)                       # (K, d)
    for j in range(d):
        sxx_ref[:, j * d:(j + 1) * d] += _nt(resp, stripes[j])
    cnt_ref[:] += jnp.sum(resp, axis=1, keepdims=True)     # (K, 1)
    lse_ref[:] += jnp.sum(lse).reshape(1, 1)


def pick_pallas_block(n, target=65536):
    """Block size for the padded kernels: ~target-sized blocks whose
    count covers n with at most 127 columns of padding per block (a
    flat min(target, ceil128(n)) wastes up to ~2x when n is just above
    target)."""
    nb = -(-n // target)
    return -(-(-(-n // nb)) // 128) * 128


def _estep_pallas_xt(xt, h1, h2f, c2, block_size, n_valid):
    """Kernel launcher on pre-transposed, already block-padded data
    xt (d, N') with N' a multiple of block_size; n_valid (static int or
    None) marks the real rows — tail columns beyond it are masked in the
    kernel. c2 arrives (K, 1) so it broadcasts over the lane axis."""
    d, n = xt.shape
    k = h1.shape[0]
    assert n % block_size == 0
    grid = n // block_size
    return pl.pallas_call(
        functools.partial(_estep_kernel, n_valid),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d, block_size), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, d), jnp.float32),
            jax.ShapeDtypeStruct((k, d * d), jnp.float32),
            jax.ShapeDtypeStruct((k, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        # off-TPU (tests, dryruns) the kernel runs in the interpreter
        interpret=jax.default_backend() != 'tpu',
    )(xt, h1, h2f, c2)


def estep_from_xt(post: NIW, log_pi, xt, block_size: int = 32768,
                  n_valid=None):
    """Fused E-step on pre-transposed float32 data xt (d, N).

    Any N works. Callers running this inside a sweep loop should pad xt
    to a block_size multiple ONCE outside the loop (jnp.pad) and pass
    `n_valid` = the real N, so the pad copy isn't re-done per sweep;
    with n_valid=None the padding happens here."""
    d, n = xt.shape
    k = post.mu.shape[0]
    if n_valid is None:
        pad = (-n) % block_size
        if pad:
            xt = jnp.pad(xt, ((0, 0), (0, pad)))
            n_valid = n
    elif n_valid == n:
        n_valid = None           # nothing masked: use the unmasked kernel
    h1, h2, c = _estep_nat(post, log_pi)
    s1, sxx, cnt, lse = _estep_pallas_xt(
        xt, h1.astype(jnp.float32), h2.reshape(k, d * d).astype(jnp.float32),
        c.reshape(k, 1).astype(jnp.float32), block_size, n_valid)
    counts = cnt[:, 0]
    stats = GaussStats(x=s1, n1=counts, xxT=sxx.reshape(k, d, d), n2=counts)
    return EStepResult(stats=stats, lse=lse[0, 0], counts=counts)


@functools.partial(jax.jit, static_argnames=('block_size',))
def gmm_estep_pallas(post: NIW, log_pi, x, block_size: int = 32768):
    """Fused E-step. x: (N, d), any N (the launcher zero-pads the tail
    to a block_size multiple and the kernel masks it). Returns
    EStepResult like the XLA versions."""
    xt = x.astype(jnp.float32).T
    res = estep_from_xt(post, log_pi, xt, block_size)
    return EStepResult(
        stats=jax.tree.map(lambda a: a.astype(x.dtype), res.stats),
        lse=res.lse.astype(x.dtype), counts=res.counts.astype(x.dtype))
