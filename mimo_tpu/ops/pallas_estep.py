"""Pallas TPU kernel: fused mixture E-step for any feature-linear family.

One pass over HBM-resident data computes, per block of B points:
    F    = features_t(blocks)       (m8, B)  assembled in REGISTERS
    logp = theta @ F                (K, B)   [MXU, theta hi/lo split]
    lse  = logsumexp(logp, axis=0)  (B,)
    acc += exp(logp-lse) @ F^T      (K, m8)  [MXU]
with acc / sum(lse) living in VMEM accumulators revisited by every grid
step (TPU grids are sequential, so cross-step read-modify-write is safe).
`features_t` comes from the family's EStepSpec (ops/family_estep.py), so
the same kernel serves full / diagonal / tied / hierarchical GMMs AND
mixtures of linear experts — any family whose expected log-likelihood is
linear in an on-core-assemblable feature map of the data.

The N x K responsibility matrix never exists in HBM — the fix for the
reference's 4 GB K x N matrix at N=1e7 (SURVEY.md §5) and its `fold=False`
N x d x d expected-stats tensor (gaussian.py:474-485).

Layout notes (measured on TPU):
  * data arrays are fed TRANSPOSED, (d_i, B) blocks: with d << 128 the
    natural (B, d) layout pads the lane dimension 128/d-fold (a
    (32768, 2) f32 block would occupy 16 MB of VMEM instead of 256 KB);
  * everything stays in (K, B) orientation — K on sublanes, points on
    lanes. logp = theta @ F is the native matmul form, and the stat
    reduction ex @ F^T contracts over the lane axis of both operands
    (the "NT" form Mosaic lowers without transposes). The previous
    (B, K) orientation forced a B-lanes->sublanes rotation per
    dot_general and padded K 50->128 on every VPU op — 2.8x slower;
  * F must be assembled as a jnp.concatenate of register values; staging
    row stripes through a VMEM scratch ref serialized the kernel 27x
    (scripts/bisect_pallas.py, BENCH_NOTES.md);
  * softmax reduction runs over the sublane (K) axis; with K <= 128 the
    padding waste is K -> ceil8(K), not K -> 128.

ELBO: sum_n lse_n equals the data + gating-label + label-entropy terms of
the mixture ELBO for BOTH Dirichlet and stick-breaking gating (the TSB
per-k accumulated-count term telescopes to counts_k E[log pi_k]); the
caller adds the N-independent KL terms.
"""

import functools
import os

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


# Experimental exp variants for the VPU-bound d=2 softmax (BENCH_NOTES
# round-5 "one more pass at the d=2 VPU bound"): MIMO_TPU_EXP=exp2 maps
# exp through exp2 (one extra multiply, possibly cheaper lowering);
# =bf16 evaluates exp in bfloat16 (the stats dot rounds its operands to
# bf16 anyway — per-point random resp errors average out of the
# N-summed statistics). Measurement knob only; default stays f32 exp.
_EXP_MODE = os.environ.get('MIMO_TPU_EXP', 'f32')


def _exp(z):
    if _EXP_MODE == 'exp2':
        return jnp.exp2(z * jnp.float32(1.4426950408889634))
    if _EXP_MODE == 'bf16':
        return jnp.exp(z.astype(jnp.bfloat16)).astype(jnp.float32)
    return jnp.exp(z)


def _nt(a, b):
    """dot_general contracting the last (lane) axis of both operands:
    (M, B) x (N, B) -> (M, N)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=_DOT_PREC)


def _split(a):
    """bf16 hi + f32 lo residual split: hi + lo == a to ~2^-17 relative
    through a pair of DEFAULT (bf16) passes."""
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, a - hi


def _dot_split(theta, f):
    """theta @ f with theta split into bf16 hi + lo parts: kills the
    systematic per-component rounding (see module comment); f is rounded
    to bf16 once, a random per-point perturbation.

    The two passes are folded into ONE dot with stacked operands,
    [hi lo] (K, 2m) @ [f; f] (2m, B): at the E-step's skinny contraction
    depth (m8=8 at d=2) each separate pass fills ~6% of the systolic
    array's depth, so doubling the contraction instead of issuing two
    dots costs nothing on the MXU and halves the pass count (measured
    on TPU: see BENCH_NOTES round 3)."""
    hi, lo = _split(theta)
    th2 = jnp.concatenate([hi, lo], axis=1)          # (K, 2m)
    f2 = jnp.concatenate([f, f], axis=0)             # (2m, B)
    return jnp.dot(th2, f2, precision=_DOT_PREC,
                   preferred_element_type=jnp.float32)


def _dot_split_ff(theta, f):
    """theta @ f with BOTH operands hi/lo split: 4 DEFAULT passes, exact
    to ~2^-27 relative (each operand reconstructs to ~2^-18; the MXU
    accumulates in f32). Used when the spec sets hi_lo_features —
    linear-expert log-densities multiply the y(x)y feature rows by noise
    precisions that grow without bound as the fit converges, so
    single-pass rounding of F injects multi-nat per-point errors there
    (see EStepSpec.hi_lo_features). The lo x lo pass is NOT negligible
    for these families: dropping it leaves an error ~2^-18 sum_j
    |theta_j||f_j|, and the converged linear-expert logp is a
    cancellation of terms lambda*y^2 >> 1 — measured one-step lse drift
    of 2.3e-3 relative on the nested-ILR fit (scripts/diag_hmix_ilr.py),
    restored to ~1e-6 by the 4th pass."""
    th_hi, th_lo = _split(theta)
    f_hi, f_lo = _split(f)
    d = functools.partial(jnp.dot, precision=_DOT_PREC,
                          preferred_element_type=jnp.float32)
    # fold the 4 passes into 2 stacked dots (see _dot_split): [hi lo]
    # against [f_hi; f_hi] gives hh + lh, against [f_lo; f_lo] hl + ll
    th2 = jnp.concatenate([th_hi, th_lo], axis=1)        # (K, 2m)
    return (d(th2, jnp.concatenate([f_hi, f_hi], axis=0))
            + d(th2, jnp.concatenate([f_lo, f_lo], axis=0)))


def _nt_split(a, b):
    """_nt with b hi/lo split (a taken verbatim — responsibilities /
    one-hots round benignly): 2 DEFAULT passes."""
    b_hi, b_lo = _split(b)
    return _nt(a, b_hi) + _nt(a, b_lo)


def _assemble(features_t, xts, m8):
    """Run the spec's transposed feature assembler on the (d_i, B) blocks
    and zero-pad the rows to m8 (the accumulator's sublane multiple)."""
    f = features_t(xts)
    m, b = f.shape
    if m8 > m:
        f = jnp.concatenate(
            [f, jnp.zeros((m8 - m, b), jnp.float32)], axis=0)
    return f


def _estep_kernel2(masked, nx, features_t, split_f, *refs):
    """Two-dot E-step body; refs = (nv_ref, *x_refs, theta_ref, acc_ref,
    lse_ref). theta carries c + log_pi in column 0 against F's constant
    row, so counts fall out of acc[:, 0]. nv_ref is an SMEM (1, 1) int32
    holding the valid-point count — a runtime value (not a compile-time
    constant) so the kernel can run per-device inside shard_map where the
    local valid count depends on the device index, and rank-2 so vmapped
    chains can batch it (Mosaic validates only the last two block dims);
    `masked` statically gates the tail-masking code."""
    nv_ref = refs[0]
    x_refs = refs[1:1 + nx]
    theta_ref, acc_ref, lse_ref = refs[1 + nx:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        lse_ref[:] = jnp.zeros_like(lse_ref)

    xts = tuple(r[:] for r in x_refs)                    # (d_i, B) each
    b = xts[0].shape[1]
    f = _assemble(features_t, xts, acc_ref.shape[1])     # (m8, B)

    logp = (_dot_split_ff if split_f else _dot_split)(
        theta_ref[:], f)                                 # (K, B)
    mx = jnp.max(logp, axis=0, keepdims=True)            # (1, B)
    ex = _exp(logp - mx)                                 # (K, B)
    if not masked:
        denom = jnp.sum(ex, axis=0, keepdims=True)
        lse = mx + jnp.log(denom)
    else:
        col = i * b + jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        mask = (col < nv_ref[0, 0]).astype(jnp.float32)   # (1, B)
        ex = ex * mask
        denom = jnp.maximum(jnp.sum(ex, axis=0, keepdims=True),
                            jnp.float32(1e-37))
        lse = (mx + jnp.log(denom)) * mask
    # normalize via one reciprocal row + a multiply on whichever operand
    # has fewer rows: at d=2/K=50 that's f (m8=8), at d=32/K=256 it's ex
    # (K=256 vs m8=1064) — a straight f/denom costs m8 x B VPU divides
    # per block (1e9/iter at the fed d=32 shape)
    r = 1.0 / denom                                      # (1, B)
    nt = _nt_split if split_f else _nt
    if ex.shape[0] <= f.shape[0]:
        acc_ref[:] += nt(ex * r, f)                      # (K, m8)
    else:
        acc_ref[:] += nt(ex, f * r)
    lse_ref[:] += jnp.sum(lse).reshape(1, 1)


def _x_specs(xts, block_size):
    return [pl.BlockSpec((xt.shape[0], block_size), lambda i: (0, i),
                         memory_space=pltpu.VMEM) for xt in xts]


def _estep_pallas2(xts, theta, block_size, n_valid, features_t,
                   split_f=False):
    """Launcher: xts = tuple of (d_i, N') arrays pre-padded to a common
    block_size multiple; theta (K, m8) with column 0 = c + log_pi.
    n_valid: None (no masking), a python int, or a traced int32 scalar
    (the shard_map path, where the local valid count is device-dependent)."""
    n = xts[0].shape[1]
    k, m8 = theta.shape
    assert n % block_size == 0
    grid = n // block_size
    masked = n_valid is not None
    # (1, 1): see pallas_gibbs - rank-2 SMEM scalars batch under vmap
    nv = jnp.reshape(jnp.asarray(n_valid if masked else n, jnp.int32),
                     (1, 1))
    acc, lse = pl.pallas_call(
        functools.partial(_estep_kernel2, masked, len(xts), features_t,
                          split_f),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _x_specs(xts, block_size) + [
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
    )(nv, *xts, theta)
    return acc, lse


def pick_pallas_block(n, target=98304, rows=None, budget=64 * 1024 * 1024):
    """Block size for the padded kernels: ~target-sized blocks whose
    count covers n with at most 127 columns of padding per block (a
    flat min(target, ceil128(n)) wastes up to ~2x when n is just above
    target).

    `rows` caps the block by the kernel's live VMEM rows (F is (m8, B),
    hi/lo split counts twice, logp/ex/Gumbel are (K, B)):
    B <= budget / (4 rows). At d=2/K=50 the cap lands at B=77568 —
    inside the measured 77k-131k throughput plateau (round-3 sweep:
    337-341 VI it/s vs 325 at 65k; 262k regresses) — so `target` sits
    above the cap for skinny shapes and the cap decides; at d=32/K=256
    (m8=1064, split) it pulls B down to ~5k so the kernel stays inside
    VMEM instead of spilling."""
    if rows is not None:
        cap = max(128, budget // (4 * rows) // 128 * 128)
        target = min(target, cap)
    nb = -(-n // target)
    return -(-(-(-n // nb)) // 128) * 128


def estep_from_xt(post: NIW, log_pi, xt, block_size: int = 32768,
                  n_valid=None):
    """Fused Gaussian E-step on pre-transposed float32 data xt (d, N).

    Any N works. Callers running this inside a sweep loop should pad xt
    to a block_size multiple ONCE outside the loop (jnp.pad) and pass
    `n_valid` = the real N, so the pad copy isn't re-done per sweep;
    with n_valid=None the padding happens here."""
    from mimo_tpu.ops.family_estep import gauss_features_t
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
    acc, lse = _estep_pallas2((xt,), theta, block_size, n_valid,
                              gauss_features_t)
    counts = acc[:, 0]
    stats = GaussStats(x=acc[:, 1:1 + d], n1=counts,
                       xxT=acc[:, 1 + d:m].reshape(k, d, d), n2=counts)
    return EStepResult(stats=stats, lse=lse[0, 0], counts=counts)


def _pad_theta(theta, log_pi):
    """Fold log_pi into the constant column and zero-pad the feature axis
    to the kernels' sublane multiple of 8."""
    k, m = theta.shape
    m8 = -(-m // 8) * 8
    theta = theta.at[:, 0].add(log_pi.astype(theta.dtype))
    return jnp.concatenate(
        [theta, jnp.zeros((k, m8 - m), theta.dtype)],
        axis=-1).astype(jnp.float32), m


def fused_estep_pallas(spec, post, log_pi, xts, block_size, n_valid):
    """Spec-driven fused E-step on the Mosaic kernel — a drop-in for
    fused_estep_blockwise for any family whose spec has a `features_t`
    assembler (GMM families and mixtures of linear experts).

    xts: tuple of (d_i, N') float32 arrays, pre-transposed and pre-padded
    to a common block_size multiple (pad ONCE outside the sweep loop);
    n_valid = the real N, or None when nothing is padded. Returns a
    FusedEStep in f32."""
    from mimo_tpu.ops.family_estep import FusedEStep
    theta, m = _pad_theta(spec.theta(post), log_pi)
    acc, lse = _estep_pallas2(xts, theta, block_size, n_valid,
                              spec.features_t,
                              getattr(spec, 'hi_lo_features', False))
    return FusedEStep(stats=spec.unpack(acc[:, :m]), lse=lse[0, 0],
                      counts=acc[:, 0])


def fused_estep_pallas_sharded(spec, post, log_pi, xts, block_size,
                               n_valid, mesh, axis='data'):
    """Multi-chip fused E-step on the Mosaic kernel: shard_map over the
    mesh's `axis`, each device running _estep_pallas2 on its LOCAL
    contiguous column shard, then ONE psum of the (K, m8) accumulator +
    lse across the mesh — the same K*m-float collective payload as the
    XLA fused_estep_sharded (ops/family_estep.py), but with the 3-6x
    faster kernel doing the per-device work (round-2 VERDICT weak #2:
    previously mesh= forced the XLA engine).

    xts: tuple of (d_i, N') float32 arrays, pre-transposed, padded so the
    PER-DEVICE column count N'/n_shards is a block_size multiple, and
    sharded (or shardable) over columns on `axis`. n_valid = the real
    global N; each device masks its local tail via the kernel's runtime
    valid-count scalar (padding lives at the global end, so device i's
    local valid count is clip(n_valid - i*local_n, 0, local_n))."""
    from jax.sharding import PartitionSpec as P
    from mimo_tpu.ops.family_estep import FusedEStep

    theta, m = _pad_theta(spec.theta(post), log_pi)
    n_shards = mesh.shape[axis]
    n_tot = xts[0].shape[1]
    local_n = n_tot // n_shards
    assert local_n * n_shards == n_tot, 'pad N to a multiple of the mesh'
    assert local_n % block_size == 0, \
        f'per-device N={local_n} must be a multiple of block_size'
    split_f = getattr(spec, 'hi_lo_features', False)

    def local(theta, *shards):
        idx = jax.lax.axis_index(axis)
        nv = jnp.clip(jnp.int32(n_valid) - idx.astype(jnp.int32) * local_n,
                      0, local_n)
        acc, lse = _estep_pallas2(shards, theta, block_size, nv,
                                  spec.features_t, split_f)
        return jax.lax.psum(acc, axis), jax.lax.psum(lse, axis)

    # check_vma=False: pallas_call's out_shape carries no varying-axes
    # annotation, so the vma checker cannot see through it
    acc, lse = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(),) + tuple(P(None, axis) for _ in xts),
        out_specs=(P(), P()), check_vma=False)(theta, *xts)
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
