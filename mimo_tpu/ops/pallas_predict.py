"""Pallas TPU kernel: fused posterior-predictive mixture density.

Serving path (reference meanfield_prediction / the GMM density surface,
ilr.py:374-430, gmm.py:105-144): per block of B points, in one pass over
HBM-resident data,

    F     = [1; x; x (x) x]  assembled in REGISTERS            (m8, B)
    Q     = theta_q @ F      (K, B)  [MXU, hi/lo split]  — the Student-t
            quadratic forms (x - mu_k)' Lmbda_k (x - mu_k), feature-
            linear exactly like the E-step log-densities
    lp    = aux_k - h_k * log1p(Q * invdf_k)                   (K, B)
    out   = logsumexp_k(lp)                                    (1, B)

so the mixture predictive log-density never materializes the (N, K)
Student-t matrix the dense path streams through HBM (utils/stats.py
mvt_logpdf + logsumexp: ~3 HBM round trips of N x K f32 at N=1e7).
Accuracy: Q is a cancelling quadratic (terms ~mu'Lmbda mu near the
centers), so BOTH operands run hi/lo split (pallas_estep._dot_split_ff,
~2^-27); per-point parity vs the f32 XLA path is ~1e-5 relative
(measured max 1.2e-3 nats absolute at N=1e7, in the far tails where
|lp| ~ 80). Measured on TPU: 1468M pts/s vs the dense path's 482M
(3.05x) at N=1e7, K=50, d=2.

Used by BayesianMixture.log_predictive(backend='auto') for
full-covariance Gaussian mixtures (the flagship serving shape); other
families keep the dense XLA path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimo_tpu.ops.pallas_estep import _assemble, _dot_split_ff


def _predict_kernel(studentt, nx, features_t, *refs):
    """refs = (*x_refs, thq_ref, aux_ref, out_ref). aux_ref is (K, 8)
    with columns [aux + log_w, h, 1/df, 0...]; out_ref a (1, B) block of
    the (1, N) per-point log-density row. `studentt` statically selects
    the tail transform: -h log1p(q/df) (Student-t predictive) or -q/2
    (moment-matched Gaussian, bayesian.py:303-312)."""
    x_refs = refs[:nx]
    thq_ref, aux_ref, out_ref = refs[nx:]
    xts = tuple(r[:] for r in x_refs)                  # (d_i, B) each
    f = _assemble(features_t, xts, thq_ref.shape[1])   # (m8, B)
    q = _dot_split_ff(thq_ref[:], f)                   # (K, B)
    q = jnp.maximum(q, 0.0)        # PSD form; clip rounding negatives
    aux = aux_ref[:, 0:1]                              # (K, 1)
    if studentt:
        h = aux_ref[:, 1:2]
        invdf = aux_ref[:, 2:3]
        lp = aux - h * jnp.log1p(q * invdf)            # (K, B)
    else:
        lp = aux - 0.5 * q
    mx = jnp.max(lp, axis=0, keepdims=True)
    out_ref[:] = mx + jnp.log(jnp.sum(jnp.exp(lp - mx), axis=0,
                                      keepdims=True))


def _predict_pallas(thq, aux, xts, block_size, features_t,
                    studentt=True):
    """pallas_call wrapper: xts pre-padded (d_i, N') arrays; thq (K, m8)
    f32 quad-form coefficients; aux (K, 8) f32 [aux+log_w, h, 1/df].
    Returns the (1, N') per-point mixture log-density (padded tail
    columns carry junk — callers slice)."""
    n = xts[0].shape[1]
    k, m8 = thq.shape
    assert n % block_size == 0
    grid = n // block_size
    return pl.pallas_call(
        functools.partial(_predict_kernel, studentt, len(xts), features_t),
        grid=(grid,),
        in_specs=[pl.BlockSpec((xt.shape[0], block_size), lambda i: (0, i),
                               memory_space=pltpu.VMEM) for xt in xts]
        + [pl.BlockSpec((k, m8), lambda i: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((k, 8), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_size), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != 'tpu',
    )(*xts, thq, aux)


def gauss_predictive_pallas(post, log_w, x, block_size=None,
                            dist='studentt', mesh=None):
    """Fused Student-t mixture predictive for a full-covariance Gaussian
    mixture (NIW posterior): logsumexp_k [log_w_k + St(x; mu_k,
    Lmbda_k, df_k)] -> (N,). Matches
    logsumexp(niw.log_predictive_studentt(post, x) + log_w, -1)
    (mvt_logpdf, utils/stats.py:70-86) to ~1e-5 per point. Also serves
    hierarchical (HierTied) posteriors — their predictive is the same
    Student-t with the shared hyper (nu-d+1) psi scale
    (bayesian.py:783-793).

    The quad form is feature-linear over [1, x, x (x) x]:
      delta_k(x) = mu'Lmu_k - 2 (Lmu_k)'x + vec(Lmbda_k) . vec(x x')
    so the kernel is the E-step kernel's dot with a log1p transform in
    place of the softmax. Cited parity anchor:
    /root/reference/mimo/utils/stats.py:53-79 (stacked mvt logpdf) +
    mixtures' predictive weighting (gmm.py:105-144)."""
    from mimo_tpu.ops.family_estep import gauss_features_t
    from mimo_tpu.ops.pallas_estep import pick_pallas_block
    from mimo_tpu.utils.linalg import logdet_psd
    from mimo_tpu.utils.stats import gammaln_diff

    mu, lmbda, df = _basis_studentt_params(post, x.shape[1])
    k, d = mu.shape
    lmu = jnp.einsum('kde,ke->kd', lmbda, mu)
    thq = jnp.concatenate(
        [jnp.einsum('kd,kd->k', mu, lmu)[:, None], -2.0 * lmu,
         lmbda.reshape(k, d * d)], axis=-1).astype(jnp.float32)
    m = 1 + d + d * d
    m8 = -(-m // 8) * 8
    if m8 > m:
        thq = jnp.concatenate(
            [thq, jnp.zeros((k, m8 - m), jnp.float32)], axis=-1)
    studentt = dist == 'studentt'
    if studentt:
        aux = (gammaln_diff(0.5 * df, 0.5 * d)
               + 0.5 * logdet_psd(lmbda)
               - 0.5 * d * (jnp.log(df) + jnp.log(jnp.pi))
               + log_w)
        cols = jnp.stack([aux, 0.5 * (df + d), 1.0 / df], axis=-1)
    else:   # moment-matched Gaussian predictive (bayesian.py:303-312)
        aux = (0.5 * logdet_psd(lmbda)
               - 0.5 * d * jnp.log(2.0 * jnp.pi) + log_w)
        cols = jnp.stack([aux, jnp.zeros_like(aux), jnp.zeros_like(aux)],
                         axis=-1)
    aux8 = jnp.concatenate(
        [cols, jnp.zeros((k, 5), cols.dtype)], axis=-1).astype(jnp.float32)

    n = x.shape[0]
    if mesh is not None:
        # data-parallel serving: per-device kernel over the local column
        # shard, NO collective — the (1, N) density row stays sharded
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_shards = mesh.shape['data']
        if block_size is None:
            block_size = pick_pallas_block(-(-n // n_shards),
                                           rows=4 * m8 + 4 * k)
        mult = block_size * n_shards
        xt = jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, (-n) % mult)))
        xt = jax.lax.with_sharding_constraint(
            xt, NamedSharding(mesh, P(None, 'data')))
        out = jax.shard_map(
            lambda th, a8, xl: _predict_pallas(th, a8, (xl,), block_size,
                                               gauss_features_t, studentt),
            mesh=mesh, in_specs=(P(), P(), P(None, 'data')),
            out_specs=P(None, 'data'), check_vma=False)(thq, aux8, xt)
        return out[0, :n]
    if block_size is None:
        block_size = pick_pallas_block(n, rows=4 * m8 + 4 * k)
    pad = (-n) % block_size
    xt = x.astype(jnp.float32).T
    if pad:
        xt = jnp.pad(xt, ((0, 0), (0, pad)))
    out = _predict_pallas(thq, aux8, (xt,), block_size, gauss_features_t,
                          studentt)
    return out[0, :n]


# -- fused diag-Gaussian serving: product of per-dim Student-t's -------------

def _diag_predict_kernel(k, *refs):
    """Diag (NG) Student-t predictive: the joint density is a PRODUCT of
    per-dimension univariate t's (ng.log_predictive_studentt,
    reference composite.py:490-520 via gaussian.py:575-888), so the
    log1p tail transform is per-(component, dim), not per-component.
    refs = (x_ref, thu_ref, h_ref, aux_ref, out_ref); thu_ref (K*d, m8)
    holds the scaled quad coefficients u_kj(x) = (lam_kj/df_kj)
    (x_j - mu_kj)^2 over F = [1; x; x^2] (rows flattened (k, j)
    row-major); h_ref (K*d, 8) col0 = 0.5 (df_kj + 1); aux_ref (K, 8)
    col0 = per-component normalizer + log_w. The d-reduction is a
    sublane regroup (K*d, B) -> (K, d, B) + sum — layout-free because
    the lane (B) axis is untouched."""
    x_ref, thu_ref, h_ref, aux_ref, out_ref = refs
    from mimo_tpu.ops.family_estep import diag_gauss_features_t
    f = _assemble(diag_gauss_features_t, (x_ref[:],), thu_ref.shape[1])
    u = jnp.maximum(_dot_split_ff(thu_ref[:], f), 0.0)   # (K*d, B)
    t = h_ref[:, 0:1] * jnp.log1p(u)                     # (K*d, B)
    b = t.shape[1]
    lp = aux_ref[:, 0:1] - jnp.sum(t.reshape(k, -1, b), axis=1)
    mx = jnp.max(lp, axis=0, keepdims=True)
    out_ref[:] = mx + jnp.log(jnp.sum(jnp.exp(lp - mx), axis=0,
                                      keepdims=True))


def _diag_predict_call(thu, h8, aux8, xt, block_size):
    k = aux8.shape[0]
    kd, m8 = thu.shape
    n = xt.shape[1]
    assert n % block_size == 0
    return pl.pallas_call(
        functools.partial(_diag_predict_kernel, k),
        grid=(n // block_size,),
        in_specs=[pl.BlockSpec((xt.shape[0], block_size), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((kd, m8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((kd, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((k, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, block_size), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != 'tpu',
    )(xt, thu, h8, aux8)


def diag_predictive_pallas(post, log_w, x, block_size=None,
                           dist='studentt', mesh=None):
    """Fused posterior-predictive mixture density for a DIAGONAL
    Gaussian mixture (NG posterior): matches
    logsumexp(ng.log_predictive_studentt(post, x) + log_w, -1) to
    ~1e-5 per point. dist='gaussian' (the moment-matched plug-in,
    bayesian.py:303-312 applied per dim) is fully feature-linear and
    reuses the generic quad kernel over F = [1; x; x^2]. With `mesh`,
    data-parallel serving under shard_map (no collective — the density
    row stays sharded), as gauss_predictive_pallas."""
    from mimo_tpu.distributions.ng import predictive_studentt_params
    from mimo_tpu.ops.family_estep import diag_gauss_features_t
    from mimo_tpu.ops.pallas_estep import pick_pallas_block
    from mimo_tpu.utils.stats import LOG2PI, gammaln_diff

    mu, lam, df = predictive_studentt_params(post)       # (K, d) each
    k, d = mu.shape
    m = 1 + 2 * d
    m8 = -(-m // 8) * 8
    n = x.shape[0]

    if dist == 'gaussian':
        # one row per component: q_k(x) = sum_j lam_kj (x_j - mu_kj)^2
        thq = jnp.concatenate(
            [jnp.sum(lam * mu * mu, -1)[:, None], -2.0 * lam * mu, lam],
            axis=-1).astype(jnp.float32)
        if m8 > m:
            thq = jnp.concatenate(
                [thq, jnp.zeros((k, m8 - m), jnp.float32)], axis=-1)
        aux = (0.5 * jnp.sum(jnp.log(lam), -1) - 0.5 * d * LOG2PI
               + log_w)
        aux8 = jnp.concatenate(
            [aux[:, None], jnp.zeros((k, 7), jnp.float32)],
            axis=-1).astype(jnp.float32)
        rows = 4 * m8 + 4 * k
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_shards = mesh.shape['data']
            if block_size is None:
                block_size = pick_pallas_block(-(-n // n_shards), rows=rows)
            mult = block_size * n_shards
            xt = jnp.pad(x.astype(jnp.float32).T,
                         ((0, 0), (0, (-n) % mult)))
            xt = jax.lax.with_sharding_constraint(
                xt, NamedSharding(mesh, P(None, 'data')))
            out = jax.shard_map(
                lambda th, a8, xl: _predict_pallas(
                    th, a8, (xl,), block_size, diag_gauss_features_t,
                    False),
                mesh=mesh, in_specs=(P(), P(), P(None, 'data')),
                out_specs=P(None, 'data'), check_vma=False)(thq, aux8, xt)
            return out[0, :n]
        if block_size is None:
            block_size = pick_pallas_block(n, rows=rows)
        xt = jnp.pad(x.astype(jnp.float32).T,
                     ((0, 0), (0, (-n) % block_size)))
        out = _predict_pallas(thq, aux8, (xt,), block_size,
                              diag_gauss_features_t, False)
        return out[0, :n]

    # Student-t: one row per (component, dim) scaled quad
    r = (lam / df).astype(jnp.float32)
    kd = k * d
    eye = jnp.eye(d, dtype=jnp.float32)
    thu = jnp.concatenate(
        [(r * mu * mu).reshape(kd, 1),
         ((-2.0 * r * mu)[:, :, None] * eye[None]).reshape(kd, d),
         (r[:, :, None] * eye[None]).reshape(kd, d)],
        axis=-1).astype(jnp.float32)
    if m8 > m:
        thu = jnp.concatenate(
            [thu, jnp.zeros((kd, m8 - m), jnp.float32)], axis=-1)
    h8 = jnp.concatenate(
        [(0.5 * (df + 1.0)).reshape(kd, 1), jnp.zeros((kd, 7))],
        axis=-1).astype(jnp.float32)
    aux = (jnp.sum(gammaln_diff(0.5 * df, 0.5)
                   + 0.5 * (jnp.log(lam) - jnp.log(df)
                            - jnp.log(jnp.pi)), axis=-1) + log_w)
    aux8 = jnp.concatenate(
        [aux[:, None], jnp.zeros((k, 7), jnp.float32)],
        axis=-1).astype(jnp.float32)

    # VPU-bound (K*d log1p rows per point): measured flat at 515-525M
    # pts/s for B in [5k, 25k] at K=50/d=2 and VMEM-OOM above ~40k —
    # small blocks pipeline better, so target 16k instead of the
    # MXU-kernels' 98k (round-3 sweep, BENCH_NOTES).
    rows = 4 * m8 + 3 * kd + 2 * k
    target = 16384
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_shards = mesh.shape['data']
        if block_size is None:
            block_size = pick_pallas_block(-(-n // n_shards),
                                           target=target, rows=rows)
        mult = block_size * n_shards
        xt = jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, (-n) % mult)))
        xt = jax.lax.with_sharding_constraint(
            xt, NamedSharding(mesh, P(None, 'data')))
        out = jax.shard_map(
            lambda th, hh, a8, xl: _diag_predict_call(th, hh, a8, xl,
                                                      block_size),
            mesh=mesh, in_specs=(P(), P(), P(), P(None, 'data')),
            out_specs=P(None, 'data'), check_vma=False)(thu, h8, aux8, xt)
        return out[0, :n]
    if block_size is None:
        block_size = pick_pallas_block(n, target=target, rows=rows)
    xt = jnp.pad(x.astype(jnp.float32).T,
                 ((0, 0), (0, (-n) % block_size)))
    out = _diag_predict_call(thu, h8, aux8, xt, block_size)
    return out[0, :n]


# -- fused ILR serving: weights + moment-matched prediction + NLPD -----------


def _ilr_joint_features_t(ts):
    """Joint (x, y) feature rows for the p>1 serving kernel:
    [1; x; x (x) x; y; x (x) y; y (x) y]. The leading 1 + d + d^2 rows
    MATCH gauss_features_t, so x-only coefficient rows (basis quad,
    c quad, expert means) zero-pad the y-columns and ride the same
    dot."""
    from mimo_tpu.ops.family_estep import _rows_outer
    xt, yt = ts
    one = jnp.ones((1, xt.shape[1]), xt.dtype)
    return jnp.concatenate(
        [one, xt] + _rows_outer(xt, xt) + [yt] + _rows_outer(xt, yt)
        + _rows_outer(yt, yt), axis=0)


def _ilr_p_predict_kernel(p_out, has_y, hard, diag, *refs):
    """Fused ILR predict for p>1 outputs. refs = (x_ref, [y_ref],
    th_ref, aux_ref, vc_ref, out_ref); th_ref ((2 + p)K [+ K or pK],
    m8) rows = [basis-quad; c-quad; expert-mean rows (j*K + k order);
    with y: the MVT quad (y - M xt)' psi (y - M xt) — or, diag (MNG)
    experts, the p scaled per-dim quads yc_kj^2/(2 beta_kj), j-major];
    aux_ref (K, 8) cols = [log_pi + basis_aux, basis_h, basis_1/df,
    y_aux, y_h, 0...]; vc_ref (K, 2*p8): per-(component, output)
    variance coefficients (var_kj = c_k(x) vc_kj) then, diag, the
    per-dim tail exponents h_kj = alpha_kj + 1/2; out_ref (ro8, B)
    rows = [mean (p), var (p), nlpd, lse_w, 0...]."""
    x_ref = refs[0]
    y_ref = refs[1] if has_y else None
    th_ref, aux_ref, vc_ref, out_ref = refs[1 + has_y:]
    k = aux_ref.shape[0]
    if has_y:
        f = _assemble(_ilr_joint_features_t, (x_ref[:], y_ref[:]),
                      th_ref.shape[1])
    else:
        from mimo_tpu.ops.family_estep import gauss_features_t
        f = _assemble(gauss_features_t, (x_ref[:],), th_ref.shape[1])
    b = f.shape[1]
    z = _dot_split_ff(th_ref[:], f)                    # (rows, B)
    qb = jnp.maximum(z[:k], 0.0)
    cq = jnp.maximum(z[k:2 * k], 0.0)
    mu = z[2 * k:(2 + p_out) * k]                      # (K*p, B)
    c = 1.0 + cq                                       # (K, B)

    lwc = aux_ref[:, 0:1]
    bh = aux_ref[:, 1:2]
    binvdf = aux_ref[:, 2:3]
    y_aux = aux_ref[:, 3:4]
    y_h = aux_ref[:, 4:5]

    lw = lwc - bh * jnp.log1p(qb * binvdf)             # (K, B)
    mx = jnp.max(lw, axis=0, keepdims=True)
    ew = jnp.exp(lw - mx)
    denom = jnp.sum(ew, axis=0, keepdims=True)
    w = ew * (1.0 / denom)
    lse_w = mx + jnp.log(denom)
    if hard:
        # first-occurrence argmax (matches jnp.argmax in the dense
        # path on exact ties, instead of averaging the tied experts)
        im = (lw >= mx).astype(lw.dtype)
        w = im * (jnp.cumsum(im, axis=0) <= 1.0).astype(lw.dtype)

    # j-major mean/variance: p static 2D passes — (K, p, B) tensors
    # lower to slow Mosaic shuffles, (K, B) elementwise + sublane
    # reductions don't. mu rows are (j*K + k) order.
    wc = w * c                                         # (K, B)
    means, varis = [], []
    for j in range(p_out):
        mu_j = mu[j * k:(j + 1) * k]                   # (K, B)
        mean_j = jnp.sum(w * mu_j, axis=0, keepdims=True)
        second_j = (jnp.sum(wc * vc_ref[:, j:j + 1], axis=0,
                            keepdims=True)
                    + jnp.sum(w * mu_j * mu_j, axis=0, keepdims=True))
        means.append(mean_j)
        varis.append(jnp.maximum(second_j - mean_j * mean_j, 0.0))
    mean = jnp.concatenate(means, axis=0)              # (p, B)
    var = jnp.concatenate(varis, axis=0)

    if has_y and diag:
        # product of per-dim univariate t tails, shared scale c
        p8 = vc_ref.shape[1] // 2
        inv_c = 1.0 / c
        tails = 0.0
        for j in range(p_out):
            v_j = jnp.maximum(z[(2 + p_out + j) * k:
                                (3 + p_out + j) * k], 0.0)
            tails = tails + (vc_ref[:, p8 + j:p8 + j + 1]
                             * jnp.log1p(v_j * inv_c))
        lp_y = y_aux - 0.5 * p_out * jnp.log(c) - tails
        s = lp_y + lw
    elif has_y:
        bq = jnp.maximum(z[(2 + p_out) * k:], 0.0)     # (K, B)
        lp_y = (y_aux - 0.5 * p_out * jnp.log(c)
                - y_h * jnp.log1p(bq * (1.0 / c)))
        s = lp_y + lw
    if has_y:
        mxs = jnp.max(s, axis=0, keepdims=True)
        lse_s = mxs + jnp.log(jnp.sum(jnp.exp(s - mxs), axis=0,
                                      keepdims=True))
        nlpd = -(lse_s - lse_w)
    else:
        nlpd = jnp.zeros((1, b), jnp.float32)

    ro8 = out_ref.shape[0]
    pad = ro8 - (2 * p_out + 2)
    parts = [mean, var, nlpd, lse_w]
    if pad:             # zero-row concat operands break Mosaic lowering
        parts.append(jnp.zeros((pad, b), jnp.float32))
    out_ref[:] = jnp.concatenate(parts, axis=0)


def _ilr_p_predict_pallas(basis_post, models_post, log_pi, x, y,
                          affine, block_size, prediction, mesh=None):
    """p>1 fused ILR serving (full MNW / tied-affine / diag MNG
    experts; NIW or HierTied basis). One hi/lo-split dot over joint
    (x, y) features produces basis quads, c quads, all K*p expert
    means, and the NLPD quads — K MVT quads (MNW) or K*p scaled
    per-dim quads (MNG, whose joint predictive is a product of
    univariate t's sharing the scale c); moment matching, variance
    diagonals, and NLPD follow in-register. Returns
    (mean (N, p), var (N, p), nlpd (N,) | None)."""
    from mimo_tpu.distributions.affine import TiedAffine, to_packed_mnw
    from mimo_tpu.distributions.mng import MNG
    from mimo_tpu.ops.pallas_estep import pick_pallas_block
    from mimo_tpu.utils.linalg import inv_psd, logdet_psd
    from mimo_tpu.utils.stats import gammaln_diff

    if isinstance(models_post, TiedAffine):
        models_post = to_packed_mnw(models_post)
        affine = True
    diag = isinstance(models_post, MNG)
    n, d = x.shape
    k = log_pi.shape[0]
    p_out = models_post.M.shape[-2]
    has_y = y is not None
    m = 1 + d + d * d
    m_xy = m + p_out + d * p_out + p_out * p_out
    m8 = -(-(m_xy if has_y else m) // 8) * 8

    def pad_cols(a):
        return jnp.concatenate(
            [a, jnp.zeros((a.shape[0], m8 - a.shape[1]), jnp.float32)],
            axis=-1) if a.shape[1] < m8 else a

    # basis rows (x-features only)
    bmu, blm, bdf = _basis_studentt_params(basis_post, d)
    blmu = jnp.einsum('kde,ke->kd', blm, bmu)
    th_b = jnp.concatenate(
        [jnp.einsum('kd,kd->k', bmu, blmu)[:, None], -2.0 * blmu,
         blm.reshape(k, d * d)], axis=-1)
    b_aux = (gammaln_diff(0.5 * bdf, 0.5 * d)
             + 0.5 * logdet_psd(blm)
             - 0.5 * d * (jnp.log(bdf) + jnp.log(jnp.pi)) + log_pi)

    # c-quad rows
    g = inv_psd(models_post.K_)
    if affine:
        th_c = jnp.concatenate(
            [g[:, -1, -1][:, None], 2.0 * g[:, :d, -1],
             g[:, :d, :d].reshape(k, d * d)], axis=-1)
    else:
        th_c = jnp.concatenate(
            [jnp.zeros((k, 1 + d), x.dtype), g.reshape(k, d * d)],
            axis=-1)

    # expert-mean rows, (j*K + k) order (j-major: the kernel reduces
    # each output's (K, B) slice in 2D): mu_kj(x) = (M1 x + m0)_j
    M = models_post.M                                   # (K, p, q)
    m1 = M[:, :, :d]                                    # (K, p, d)
    m0 = M[:, :, -1] if affine else jnp.zeros((k, p_out), x.dtype)
    th_m = jnp.concatenate(
        [m0.T.reshape(k * p_out, 1),
         jnp.swapaxes(m1, 0, 1).reshape(k * p_out, d),
         jnp.zeros((k * p_out, d * d), x.dtype)], axis=-1)

    rows = [pad_cols(th_b.astype(jnp.float32)),
            pad_cols(th_c.astype(jnp.float32)),
            pad_cols(th_m.astype(jnp.float32))]

    # expert predictive constants
    if diag:
        alpha = models_post.alpha                       # (K, p)
        beta = models_post.beta
        vcoef = beta / jnp.maximum(alpha - 1.0, 1e-6)   # (K, p)
        y_aux = jnp.sum(
            gammaln_diff(alpha, 0.5)
            + 0.5 * (jnp.log(alpha) - jnp.log(beta))
            - 0.5 * (jnp.log(2.0 * alpha) + jnp.log(jnp.pi)), axis=-1)
        y_h = jnp.zeros_like(y_aux)     # per-dim tails ride vc_ref
        h_cols = alpha + 0.5                            # (K, p)
    else:
        ydf = models_post.nu - p_out + 1.0              # (K,)
        psi = models_post.psi                           # (K, p, p)
        psi_inv = inv_psd(psi)
        vcoef = (jnp.diagonal(psi_inv, axis1=-2, axis2=-1)
                 / jnp.maximum(ydf - 2.0, 1e-6)[:, None])   # (K, p)
        y_aux = (gammaln_diff(0.5 * ydf, 0.5 * p_out)
                 + 0.5 * logdet_psd(psi)
                 - 0.5 * p_out * jnp.log(jnp.pi))
        y_h = 0.5 * (ydf + p_out)
        h_cols = jnp.zeros_like(vcoef)

    if has_y and diag:
        # K*p scaled per-dim quad rows (j-major): yc_kj^2 / (2 beta_kj)
        # with yc_kj = y_j - (M1 x + m0)_j, over the joint features
        rj = (0.5 / beta).T                             # (p, K)
        m1j = jnp.swapaxes(m1, 0, 1)                    # (p, K, d)
        m0j = m0.T                                      # (p, K)
        eye = jnp.eye(p_out, dtype=x.dtype)
        xx = (m1j[:, :, :, None] * m1j[:, :, None, :]).reshape(
            p_out, k, d * d)
        xy = (m1j[:, :, :, None]
              * eye[:, None, None, :]).reshape(p_out, k, d * p_out)
        yy = jnp.broadcast_to(
            (eye[:, :, None] * eye[:, None, :]).reshape(
                p_out, 1, p_out * p_out), (p_out, k, p_out * p_out))
        th_q = jnp.concatenate([
            (rj * m0j * m0j)[:, :, None],                       # 1
            2.0 * (rj * m0j)[:, :, None] * m1j,                 # x
            rj[:, :, None] * xx,                                # x (x) x
            -2.0 * (rj * m0j)[:, :, None] * eye[:, None, :],    # y
            -2.0 * rj[:, :, None] * xy,                         # x (x) y
            rj[:, :, None] * yy,                                # y (x) y
        ], axis=-1).reshape(p_out * k, -1).astype(jnp.float32)
        rows.append(pad_cols(th_q))
    elif has_y:
        # MVT quad rows over the joint features:
        # (y - mu)' psi (y - mu), mu = M1 x + m0
        pm1 = jnp.einsum('kpr,krd->kpd', psi, m1)       # psi M1
        pm0 = jnp.einsum('kpr,kr->kp', psi, m0)         # psi m0
        th_q = jnp.concatenate([
            jnp.einsum('kp,kp->k', m0, pm0)[:, None],           # 1
            2.0 * jnp.einsum('kp,kpd->kd', m0, pm1),            # x
            jnp.einsum('kpd,kpe->kde', m1, pm1).reshape(k, d * d),
            -2.0 * pm0,                                         # y
            -2.0 * jnp.swapaxes(pm1, 1, 2).reshape(k, d * p_out),
            psi.reshape(k, p_out * p_out),                      # y x y
        ], axis=-1).astype(jnp.float32)
        rows.append(pad_cols(th_q))
    th = jnp.concatenate(rows, axis=0)

    aux8 = jnp.stack(
        [b_aux, 0.5 * (bdf + d), 1.0 / bdf, y_aux, y_h,
         jnp.zeros_like(y_aux), jnp.zeros_like(y_aux),
         jnp.zeros_like(y_aux)],
        axis=-1).astype(jnp.float32)
    p8 = -(-p_out // 8) * 8
    vc8 = jnp.concatenate(
        [vcoef, jnp.zeros((k, p8 - p_out), vcoef.dtype),
         h_cols, jnp.zeros((k, p8 - p_out), h_cols.dtype)],
        axis=-1).astype(jnp.float32)

    ro8 = -(-(2 * p_out + 2) // 8) * 8
    extra = (p_out * k if diag else k) if has_y else 0
    n_rows_live = (2 + p_out) * k + extra
    rows_est = 4 * m8 + 4 * n_rows_live + 2 * ro8

    def call(th, aux8, vc8, xt, *yts):
        np_ = xt.shape[1]
        ins = [xt]
        in_specs = [pl.BlockSpec((d, block_size), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)]
        if has_y:
            ins.append(yts[0])
            in_specs.append(pl.BlockSpec((p_out, block_size),
                                         lambda i: (0, i),
                                         memory_space=pltpu.VMEM))
        return pl.pallas_call(
            functools.partial(_ilr_p_predict_kernel, p_out, has_y,
                              prediction == 'mode', diag),
            grid=(np_ // block_size,),
            in_specs=in_specs + [
                pl.BlockSpec(th.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, 2 * p8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ro8, block_size), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ro8, np_), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() != 'tpu',
        )(*ins, th, aux8, vc8)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_shards = mesh.shape['data']
        if block_size is None:
            block_size = pick_pallas_block(-(-n // n_shards),
                                           rows=rows_est)
        mult = block_size * n_shards
        col_sh = NamedSharding(mesh, P(None, 'data'))
        xt = jax.lax.with_sharding_constraint(
            jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, (-n) % mult))),
            col_sh)
        args = (th, aux8, vc8, xt)
        specs = (P(), P(), P(), P(None, 'data'))
        if has_y:
            yt = jax.lax.with_sharding_constraint(
                jnp.pad(y.astype(jnp.float32).T,
                        ((0, 0), (0, (-n) % mult))), col_sh)
            args = args + (yt,)
            specs = specs + (P(None, 'data'),)
        out = jax.shard_map(call, mesh=mesh, in_specs=specs,
                            out_specs=P(None, 'data'),
                            check_vma=False)(*args)
    else:
        if block_size is None:
            block_size = pick_pallas_block(n, rows=rows_est)
        pad = (-n) % block_size
        xt = jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, pad)))
        args = (th, aux8, vc8, xt)
        if has_y:
            args = args + (jnp.pad(y.astype(jnp.float32).T,
                                   ((0, 0), (0, pad))),)
        out = call(*args)
    mean = out[:p_out, :n].T
    var = out[p_out:2 * p_out, :n].T
    nlpd = out[2 * p_out, :n] if has_y else None
    return mean, var, nlpd

def _ilr_predict_kernel(has_y, hard, *refs):
    """Fused ILR predict (p=1 experts). refs = (x_ref, [y_ref], th_ref,
    aux_ref, out_ref); th_ref (3K, m8) rows = [basis-quad; c-quad;
    expert-mean] coefficients over F = [1; x; x (x) x]; aux_ref (K, 8)
    cols = [log_pi + basis_aux, basis_h, basis_1/df, var_coef, psi,
    y_aux, y_h, 0]; out_ref (8, B) rows = [mean, var, nlpd, lse_w,
    0...]. All expert-level per-point quantities are feature-linear or
    quadratic in x (reference ilr.py:325-430 + bayesian.py:968-985), so
    ONE hi/lo-split dot produces the basis quad forms, the c_n = 1 +
    xt'K^-1 xt scale quads, and the expert means for every component.
    `hard` (prediction='mode', ilr.py:396-398) replaces the soft
    moment-matching weights with the argmax one-hot — the same weighted
    sums then yield exactly the selected expert's mean and c*vcoef
    variance; the NLPD still uses the soft weights (ilr.py:405-409)."""
    from mimo_tpu.ops.family_estep import gauss_features_t
    x_ref = refs[0]
    y_ref = refs[1] if has_y else None
    th_ref, aux_ref, out_ref = refs[1 + has_y:]
    k = aux_ref.shape[0]
    f = _assemble(gauss_features_t, (x_ref[:],), th_ref.shape[1])
    z = _dot_split_ff(th_ref[:], f)                    # (3K, B)
    qb = jnp.maximum(z[:k], 0.0)                       # basis quad
    cq = jnp.maximum(z[k:2 * k], 0.0)                  # c - 1 >= 0
    mu = z[2 * k:]                                     # expert means
    c = 1.0 + cq

    lwc = aux_ref[:, 0:1]
    bh = aux_ref[:, 1:2]
    binvdf = aux_ref[:, 2:3]
    vcoef = aux_ref[:, 3:4]
    psi = aux_ref[:, 4:5]
    y_aux = aux_ref[:, 5:6]
    y_h = aux_ref[:, 6:7]

    lw = lwc - bh * jnp.log1p(qb * binvdf)             # (K, B) unnorm
    mx = jnp.max(lw, axis=0, keepdims=True)
    ew = jnp.exp(lw - mx)
    denom = jnp.sum(ew, axis=0, keepdims=True)
    w = ew * (1.0 / denom)                             # (K, B)
    lse_w = mx + jnp.log(denom)
    if hard:
        # first-occurrence argmax (parity with the dense jnp.argmax
        # path on exact ties)
        im = (lw >= mx).astype(lw.dtype)
        w = im * (jnp.cumsum(im, axis=0) <= 1.0).astype(lw.dtype)

    mean = jnp.sum(w * mu, axis=0, keepdims=True)      # (1, B)
    second = jnp.sum(w * (c * vcoef + mu * mu), axis=0, keepdims=True)
    var = jnp.maximum(second - mean * mean, 0.0)

    b = f.shape[1]
    if has_y:
        yc = y_ref[:] - mu                             # (K, B) via bcast
        bq = psi * yc * yc
        lp_y = (y_aux - 0.5 * jnp.log(c)
                - y_h * jnp.log1p(bq * (1.0 / c)))     # (K, B)
        s = lp_y + lw
        mxs = jnp.max(s, axis=0, keepdims=True)
        lse_s = mxs + jnp.log(jnp.sum(jnp.exp(s - mxs), axis=0,
                                      keepdims=True))
        nlpd = -(lse_s - lse_w)
    else:
        nlpd = jnp.zeros((1, b), jnp.float32)

    out_ref[:] = jnp.concatenate(
        [mean, var, nlpd, lse_w, jnp.zeros((4, b), jnp.float32)], axis=0)


def _basis_studentt_params(basis_post, d):
    """(mu, lmbda, df) of the per-component basis Student-t predictive:
    NIW (niw.predictive_studentt_params, bayesian.py:314-323) or
    HierTied (hierarchical.log_predictive_studentt: shared hyper
    (nu-d+1) psi scale, bayesian.py:783-793)."""
    from mimo_tpu.distributions.hierarchical import HierTied
    from mimo_tpu.distributions.niw import predictive_studentt_params
    if isinstance(basis_post, HierTied):
        kk = basis_post.size
        df = jnp.broadcast_to(basis_post.hyper.nu - d + 1.0, (kk,))
        lm = jnp.broadcast_to(df[:, None, None] * basis_post.hyper.psi,
                              (kk, d, d))
        return basis_post.mus, lm, df
    return predictive_studentt_params(basis_post)


def _expert_rows(models_post, affine, d, k, dtype):
    """Per-expert kernel rows + constants for p=1 experts of any
    feature-linear flavor: full MNW (bayesian.py:895-912), tied-affine
    via the block-diagonal MNW re-pack (bayesian.py:1388-1422,
    affine.to_packed_mnw), or diagonal-noise MNG (bayesian.py:1006-1116)
    whose univariate-t tail maps onto the same
    `y_aux - 0.5 log c - y_h log1p(psi yc^2 / c)` form with
    psi = 1/(2 beta), y_h = alpha + 1/2.
    Returns (th_c, th_m, vcoef, psi_col, y_aux, y_h)."""
    from mimo_tpu.distributions.affine import TiedAffine, to_packed_mnw
    from mimo_tpu.distributions.mng import MNG
    from mimo_tpu.utils.linalg import inv_psd
    from mimo_tpu.utils.stats import gammaln_diff

    if isinstance(models_post, TiedAffine):
        models_post = to_packed_mnw(models_post)
        affine = True     # the packed offset column IS the affine part

    # c-quad rows: c = 1 + xt' K^-1 xt over xt = [x, 1(affine)] — the
    # input-dependent scale, identical for MNW and MNG experts
    g = inv_psd(models_post.K_)                         # (K, q, q)
    if affine:
        g11 = g[:, :d, :d]
        g12 = g[:, :d, -1]
        g22 = g[:, -1, -1]
        th_c = jnp.concatenate(
            [g22[:, None], 2.0 * g12, g11.reshape(k, d * d)], axis=-1)
    else:
        th_c = jnp.concatenate(
            [jnp.zeros((k, 1), dtype), jnp.zeros((k, d), dtype),
             g.reshape(k, d * d)], axis=-1)

    # expert-mean rows: mu_k(x) = M1 x + m0 (p = 1)
    M = models_post.M                                   # (K, 1, q)
    assert M.shape[1] == 1, 'fused ILR predict supports p=1 experts'
    m1 = M[:, 0, :d]
    m0 = M[:, 0, -1] if affine else jnp.zeros((k,), dtype)
    th_m = jnp.concatenate(
        [m0[:, None], m1, jnp.zeros((k, d * d), dtype)], axis=-1)

    if isinstance(models_post, MNG):
        alpha = models_post.alpha[:, 0]
        beta = models_post.beta[:, 0]
        # t(y; mu, (alpha/beta)/c, 2 alpha): lam yc^2/df = yc^2/(2 beta c)
        psi_col = 0.5 / beta
        y_h = alpha + 0.5
        y_aux = (gammaln_diff(alpha, 0.5)
                 + 0.5 * (jnp.log(alpha) - jnp.log(beta))
                 - 0.5 * (jnp.log(2.0 * alpha) + jnp.log(jnp.pi)))
        # var = (beta c / alpha) * df/(df-2) = c * beta/(alpha-1)
        vcoef = beta / jnp.maximum(alpha - 1.0, 1e-6)
    else:
        ydf = models_post.nu - 1.0 + 1.0                # pd = 1
        psi_col = models_post.psi[:, 0, 0]
        # cov = (c/df * df/(df-2)) * psi^-1 = c * psi^-1 / (df - 2)
        vcoef = (1.0 / psi_col) / jnp.maximum(ydf - 2.0, 1e-6)
        y_aux = (gammaln_diff(0.5 * ydf, 0.5)
                 + 0.5 * jnp.log(psi_col) - 0.5 * jnp.log(jnp.pi))
        y_h = 0.5 * (ydf + 1.0)
    return th_c, th_m, vcoef, psi_col, y_aux, y_h


def ilr_predict_pallas(basis_post, models_post, log_pi, x, y=None,
                       affine=True, block_size=None, prediction='average',
                       mesh=None):
    """Fused ILR posterior-predictive regression for scalar-output
    (p=1) experts — the flagship serving path (reference ilr.py:374-430):
    input-conditional Student-t expert weights, moment-matched mixture
    mean/variance (or the argmax expert's, prediction='mode'), and
    (with y) the per-point negative log predictive density, all in one
    pass over HBM-resident x. Basis: NIW or HierTied (hierarchical);
    experts: full MNW, tied-affine (re-packed), or diagonal MNG.
    Everything is computed in STANDARDIZED space — the model wrapper
    applies the output transform / Jacobian. With `mesh`, data-parallel
    serving: the kernel runs per-device under shard_map over the 'data'
    axis with NO collective (the output rows stay sharded), as
    gauss_predictive_pallas. Returns
    (mean (N,), var (N,), nlpd (N,) | None)."""
    from mimo_tpu.ops.pallas_estep import pick_pallas_block
    from mimo_tpu.utils.linalg import logdet_psd
    from mimo_tpu.utils.stats import gammaln_diff

    n, d = x.shape
    k = log_pi.shape[0]
    m = 1 + d + d * d
    m8 = -(-m // 8) * 8

    # basis quad rows + constants (as gauss_predictive_pallas)
    bmu, blm, bdf = _basis_studentt_params(basis_post, d)
    blmu = jnp.einsum('kde,ke->kd', blm, bmu)
    th_b = jnp.concatenate(
        [jnp.einsum('kd,kd->k', bmu, blmu)[:, None], -2.0 * blmu,
         blm.reshape(k, d * d)], axis=-1)
    b_aux = (gammaln_diff(0.5 * bdf, 0.5 * d)
             + 0.5 * logdet_psd(blm)
             - 0.5 * d * (jnp.log(bdf) + jnp.log(jnp.pi)) + log_pi)

    th_c, th_m, vcoef, psi, y_aux, y_h = _expert_rows(
        models_post, affine, d, k, x.dtype)

    th = jnp.concatenate([th_b, th_c, th_m], axis=0).astype(jnp.float32)
    if m8 > m:
        th = jnp.concatenate(
            [th, jnp.zeros((3 * k, m8 - m), jnp.float32)], axis=-1)

    aux8 = jnp.stack(
        [b_aux, 0.5 * (bdf + d), 1.0 / bdf, vcoef, psi, y_aux, y_h,
         jnp.zeros_like(psi)], axis=-1).astype(jnp.float32)

    has_y = y is not None

    def call(th, aux8, xt, *yts):
        np_ = xt.shape[1]
        ins = [xt]
        in_specs = [pl.BlockSpec((d, block_size), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)]
        if has_y:
            ins.append(yts[0])
            in_specs.append(pl.BlockSpec((1, block_size),
                                         lambda i: (0, i),
                                         memory_space=pltpu.VMEM))
        return pl.pallas_call(
            functools.partial(_ilr_predict_kernel, has_y,
                              prediction == 'mode'),
            grid=(np_ // block_size,),
            in_specs=in_specs + [
                pl.BlockSpec((3 * k, m8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, block_size), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, np_), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=jax.default_backend() != 'tpu',
        )(*ins, th, aux8)

    rows_est = 4 * m8 + 8 * k
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_shards = mesh.shape['data']
        if block_size is None:
            block_size = pick_pallas_block(-(-n // n_shards),
                                           rows=rows_est)
        mult = block_size * n_shards
        col_sh = NamedSharding(mesh, P(None, 'data'))
        xt = jax.lax.with_sharding_constraint(
            jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, (-n) % mult))),
            col_sh)
        args = (th, aux8, xt)
        specs = (P(), P(), P(None, 'data'))
        if has_y:
            yt = jax.lax.with_sharding_constraint(
                jnp.pad(y.astype(jnp.float32).T,
                        ((0, 0), (0, (-n) % mult))), col_sh)
            args = args + (yt,)
            specs = specs + (P(None, 'data'),)
        out = jax.shard_map(call, mesh=mesh, in_specs=specs,
                            out_specs=P(None, 'data'),
                            check_vma=False)(*args)
    else:
        if block_size is None:
            block_size = pick_pallas_block(n, rows=rows_est)
        pad = (-n) % block_size
        xt = jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, pad)))
        args = (th, aux8, xt)
        if has_y:
            args = args + (jnp.pad(y.astype(jnp.float32).T,
                                   ((0, 0), (0, pad))),)
        out = call(*args)
    mean = out[0, :n]
    var = out[1, :n]
    nlpd = out[2, :n] if has_y else None
    return mean, var, nlpd
