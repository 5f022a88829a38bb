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


# The package pins jax_default_matmul_precision=float32 (HIGHEST) for the
# K-sized posterior algebra, but the kernels' N-sized dots are explicitly
# DEFAULT (one bf16 MXU pass): at the E-step's tiny-contraction shape the
# MXU runs ~3x faster than HIGHEST's 6 passes (scripts/roofline.py).
#
# Rounding analysis (scripts/precision_study.py): rounding the per-POINT
# features F to bf16 is harmless — the errors are random across points and
# average out of the N-summed statistics (counts max rel err ~1e-5). But
# rounding THETA to bf16 is NOT: each component's c column (magnitude up
# to ~60) takes a SYSTEMATIC log-density shift of up to log2(eps_bf16)*60
# ~ 0.25 nats, which mis-weights responsibilities by up to e^0.25 and at
# N=1e7 moved the converged ELBO by 12%. So logp uses a two-term
# bf16 hi/lo split of theta (theta restored to ~2^-17 relative; still
# 2 cheap DEFAULT passes, ~2x faster than one HIGHEST dot), and the stats
# dot keeps a single DEFAULT pass (resp and F rounding are per-point
# random). (HIGH is not lowerable by Mosaic.)
_DOT_PREC = jax.lax.Precision.DEFAULT


def _nt(a, b):
    """dot_general contracting the last (lane) axis of both operands:
    (M, B) x (N, B) -> (M, N)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_DOT_PREC)


def _dot_split(theta, f):
    """theta @ f with theta split into bf16 hi + lo parts: kills the
    systematic per-component rounding (see module comment) at the cost of
    one extra DEFAULT-precision pass; f is rounded to bf16 once per dot,
    a random per-point perturbation."""
    hi = theta.astype(jnp.bfloat16).astype(jnp.float32)
    lo = theta - hi
    return (jnp.dot(hi, f, precision=_DOT_PREC,
                    preferred_element_type=jnp.float32)
            + jnp.dot(lo, f, precision=_DOT_PREC,
                      preferred_element_type=jnp.float32))


def feature_rows(d, kind):
    """Feature-map width m for a (d,)-dim data block under `kind`
    ('gauss': [1, x, x (x) x]; 'diag': [1, x, x^2])."""
    return 1 + d + (d * d if kind == 'gauss' else d)


def _assemble_f(xt, m8, kind='gauss'):
    """F = [1; x; quadratic rows; 0-padding] as a (m8, B) REGISTER value.

    kind: 'gauss' -> d x d cross rows x_l x_j (full-covariance families);
          'diag'  -> d squared rows x_j^2   (diagonal families).

    This must stay a jnp.concatenate of register values: the earlier
    kernel staged F through a VMEM scratch ref with per-stripe stores
    (f_ref[1+d+j*d:...] = ...) and those sub-sublane-tile strided stores
    serialized the whole block — 9.6 ms/iter vs 0.36 ms/iter for the
    identical math at the bench shape (scripts/bisect_pallas.py,
    BENCH_NOTES.md)."""
    d, b = xt.shape
    rows = [jnp.ones((1, b), jnp.float32), xt]
    if kind == 'gauss':
        for j in range(d):
            rows.append(xt * xt[j:j + 1, :])
    else:
        rows.append(xt * xt)
    m = feature_rows(d, kind)
    if m8 > m:
        rows.append(jnp.zeros((m8 - m, b), jnp.float32))
    return jnp.concatenate(rows, axis=0)


def _estep_kernel2(n_valid, d, kind, x_ref, theta_ref, acc_ref, lse_ref):
    """Two-dot E-step body. Per (d, B) block:
        F     = [1; x; x (x) x]  assembled in registers   (m8, B)
        logp  = theta @ F                                 (K, B)  [1 MXU op]
        resp-free softmax: ex, inv-denom on the (1, B) row
        acc  += ex @ (F * inv_denom)^T                    (K, m8) [1 MXU op]
    The v1 kernel issued d+1 separate tiny-contraction dots for logp and
    d+1 more for the stats — 6 MXU streams per block at d=2 where 2
    suffice; staging F via a VMEM scratch cost another 27x (see
    BENCH_NOTES.md). theta carries c + log_pi in column 0 against F's
    constant row, so counts fall out of acc[:, 0]."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        lse_ref[:] = jnp.zeros_like(lse_ref)

    xt = x_ref[:]                                        # (d, B)
    b = xt.shape[1]
    f = _assemble_f(xt, acc_ref.shape[1], kind)          # (m8, B)

    logp = _dot_split(theta_ref[:], f)                   # (K, B)
    mx = jnp.max(logp, axis=0, keepdims=True)            # (1, B)
    ex = jnp.exp(logp - mx)                              # (K, B)
    if n_valid is None:
        denom = jnp.sum(ex, axis=0, keepdims=True)
        lse = mx + jnp.log(denom)
    else:
        col = i * b + jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        mask = (col < n_valid).astype(jnp.float32)       # (1, B)
        ex = ex * mask
        denom = jnp.maximum(jnp.sum(ex, axis=0, keepdims=True),
                            jnp.float32(1e-37))
        lse = (mx + jnp.log(denom)) * mask
    acc_ref[:] += _nt(ex, f / denom)                     # (K, m8)
    lse_ref[:] += jnp.sum(lse).reshape(1, 1)


def _estep_pallas2(xt, theta, block_size, n_valid, kind='gauss'):
    """Launcher: xt (d, N') pre-padded to a block_size multiple;
    theta (K, m8) with column 0 = c + log_pi and m8 = ceil8(feature_rows)."""
    d, n = xt.shape
    k, m8 = theta.shape
    assert n % block_size == 0
    grid = n // block_size
    acc, lse = pl.pallas_call(
        functools.partial(_estep_kernel2, n_valid, d, kind),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d, block_size), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, m8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, m8), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != 'tpu',
    )(xt, theta)
    return acc, lse


def pick_pallas_block(n, target=65536, rows=None, budget=64 * 1024 * 1024):
    """Block size for the padded kernels: ~target-sized blocks whose
    count covers n with at most 127 columns of padding per block (a
    flat min(target, ceil128(n)) wastes up to ~2x when n is just above
    target).

    `rows` caps the block by the kernel's live VMEM rows (F is (m8, B),
    logp/ex/Gumbel are (K, B)): B <= budget / (4 rows). At d=2/K=50 this
    leaves the 64k default; at d=32/K=256 (m8=1064) it pulls B down to
    ~8k so the kernel stays inside VMEM instead of spilling."""
    if rows is not None:
        cap = max(128, budget // (4 * rows) // 128 * 128)
        target = min(target, cap)
    nb = -(-n // target)
    return -(-(-(-n // nb)) // 128) * 128


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
    m = 1 + d + d * d
    m8 = -(-m // 8) * 8
    theta = jnp.concatenate(
        [c[:, None], h1, h2.reshape(k, d * d),
         jnp.zeros((k, m8 - m), c.dtype)], axis=-1).astype(jnp.float32)
    acc, lse = _estep_pallas2(xt, theta, block_size, n_valid)
    counts = acc[:, 0]
    stats = GaussStats(x=acc[:, 1:1 + d], n1=counts,
                       xxT=acc[:, 1 + d:m].reshape(k, d, d), n2=counts)
    return EStepResult(stats=stats, lse=lse[0, 0], counts=counts)


def _pad_theta(theta, log_pi):
    """Fold log_pi into the constant column and zero-pad the feature axis
    to the kernels' sublane multiple of 8."""
    k, m = theta.shape
    m8 = -(-m // 8) * 8
    theta = theta.at[:, 0].add(log_pi)
    return jnp.concatenate(
        [theta, jnp.zeros((k, m8 - m), theta.dtype)],
        axis=-1).astype(jnp.float32), m


def fused_estep_pallas(spec, post, log_pi, xt, block_size, n_valid):
    """Spec-driven fused E-step on the Mosaic kernel — a drop-in for
    fused_estep_blockwise for any family whose spec has a `feature_kind`
    ('gauss': NIW / hierarchical / tied GMMs; 'diag': Normal-Gamma GMMs).

    xt: (d, N') float32, pre-transposed and pre-padded to a block_size
    multiple (pad ONCE outside the sweep loop); n_valid = the real N, or
    None when nothing is padded. Returns a FusedEStep in f32."""
    from mimo_tpu.ops.family_estep import FusedEStep
    theta, m = _pad_theta(spec.theta(post), log_pi)
    acc, lse = _estep_pallas2(xt, theta, block_size, n_valid,
                              spec.feature_kind)
    return FusedEStep(stats=spec.unpack(acc[:, :m]), lse=lse[0, 0],
                      counts=acc[:, 0])


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
