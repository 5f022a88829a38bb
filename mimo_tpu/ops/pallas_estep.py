"""Pallas TPU kernel: fused GMM E-step.

One pass over HBM-resident data computes, per block of B points:
    logp = x @ h1^T + (x (x) x) @ h2^T + c          (B, K)  [MXU]
    lse  = logsumexp(logp, axis=-1)                  (B,)
    resp = exp(logp - lse)                           (B, K)
and accumulates
    s1  += resp^T @ x          (K, d)
    sxx += resp^T @ xx         (K, d^2)
    cnt += sum(resp, 0)        (K,)
    lse_sum += sum(lse)        ()
into VMEM-resident accumulators revisited by every grid step (TPU grids
are sequential, so read-modify-write accumulation across steps is safe).

The N x K responsibility matrix never exists in HBM — this is the fix for
the reference's 4 GB K x N matrix at N=1e7 (SURVEY.md §5) and its
`fold=False` N x d x d expected-stats tensor (gaussian.py:474-485).

The collapsed ELBO identity (see ops/estep.py): sum_n lse_n carries the
data + Dirichlet-label + entropy terms; K-sized corrections are added by
the caller.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimo_tpu.distributions.niw import NIW, GaussStats
from mimo_tpu.ops.estep import _estep_nat, EStepResult


def _estep_kernel(x_ref, h1_ref, h2_ref, c_ref,
                  s1_ref, sxx_ref, cnt_ref, lse_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        sxx_ref[:] = jnp.zeros_like(sxx_ref)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        lse_ref[:] = jnp.zeros_like(lse_ref)

    x = x_ref[:]                                     # (B, d)
    b, d = x.shape

    # quadratic term via d unrolled column products (Mosaic cannot reshape
    # (B, d, d) -> (B, d^2), so xx is processed stripe-by-stripe):
    # logp += sum_j (x * x_j) @ h2[:, j*d:(j+1)*d]^T
    logp = jnp.dot(x, h1_ref[:].T, preferred_element_type=jnp.float32) \
        + c_ref[:]
    for j in range(d):
        t_j = x * x[:, j:j + 1]                      # (B, d)
        logp += jnp.dot(t_j, h2_ref[:, j * d:(j + 1) * d].T,
                        preferred_element_type=jnp.float32)

    m = jnp.max(logp, axis=-1, keepdims=True)
    ex = jnp.exp(logp - m)
    denom = jnp.sum(ex, axis=-1, keepdims=True)
    lse = m + jnp.log(denom)                         # (B, 1)
    resp = ex / denom                                # (B, K)

    s1_ref[:] += jnp.dot(resp.T, x, preferred_element_type=jnp.float32)
    for j in range(d):
        t_j = x * x[:, j:j + 1]
        sxx_ref[:, j * d:(j + 1) * d] += jnp.dot(
            resp.T, t_j, preferred_element_type=jnp.float32)
    cnt_ref[:] += jnp.sum(resp, axis=0, keepdims=True)
    lse_ref[:] += jnp.sum(lse).reshape(1, 1)


@functools.partial(jax.jit, static_argnames=('block_size',))
def gmm_estep_pallas(post: NIW, log_pi, x, block_size: int = 2048):
    """Fused E-step. x: (N, d) with N a multiple of block_size (pad with
    zero-weight upstream). Returns EStepResult like the XLA versions."""
    n, d = x.shape
    k = post.mu.shape[0]
    h1, h2, c = _estep_nat(post, log_pi)
    h2f = h2.reshape(k, d * d)
    c2 = c.reshape(1, k)
    grid = n // block_size
    assert grid * block_size == n, 'pad N to a multiple of block_size'

    s1, sxx, cnt, lse = pl.pallas_call(
        _estep_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_size, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d * d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, d), jnp.float32),
            jax.ShapeDtypeStruct((k, d * d), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
    )(x.astype(jnp.float32), h1.astype(jnp.float32),
      h2f.astype(jnp.float32), c2.astype(jnp.float32))

    counts = cnt[0].astype(x.dtype)
    stats = GaussStats(x=s1.astype(x.dtype), n1=counts,
                       xxT=sxx.reshape(k, d, d).astype(x.dtype), n2=counts)
    return EStepResult(stats=stats, lse=lse[0, 0].astype(x.dtype),
                       counts=counts)
