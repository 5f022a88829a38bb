"""Conjugate-family protocol: one functional interface for every
{likelihood, prior, posterior} triple, plus combinators.

This replaces the reference's 18 hand-written Bayesian pair classes
(bayesian.py:36-1522) with four base families and two combinators:

  * gaussian_family()        <->  (Stacked)GaussiansWithNormalWisharts
  * diag_gaussian_family()   <->  (Stacked)GaussiansWithNormalGammas
  * linear_family(...)       <->  (Stacked)LinearGaussiansWithMatrixNormalWisharts
  * diag_linear_family(...)  <->  (Stacked)LinearGaussiansWithMatrixNormalGammas
  * product_family(...)      — joint density over heterogeneous data blocks
                               (e.g. ILR experts = basis Gaussian on x
                                x linear-Gaussian model of y|x)
  * tied_family(...)         <->  Tied* variants (pooled posterior params)

A Family is a bundle of pure functions. `data` is always a tuple of arrays
with leading axis N; `resp` is (N, K); per-point outputs are (N, K).
All functions are jit/vmap/pjit-safe; K components are a batch axis.
"""

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from mimo_tpu.distributions import niw as _niw
from mimo_tpu.distributions import ng as _ng
from mimo_tpu.distributions import mnw as _mnw
from mimo_tpu.distributions import mng as _mng
from mimo_tpu.distributions.mnw import augment


class Family(NamedTuple):
    """Functional interface of a conjugate pair (bayesian.py 5-method
    contract: max_aposteriori / resample / meanfield_update / meanfield_sgd /
    variational_lowerbound — plus predictive hooks)."""
    suff_stats: Callable[[Any, jax.Array], Any]     # (data, resp) -> stats
    update: Callable[[Any, Any], Any]               # (prior, stats) -> posterior
    svi_blend: Callable[..., Any]                   # (post, prior, stats, scale, step)
    ell: Callable[[Any, Any], jax.Array]            # (posterior, data) -> (N, K)
    loglik: Callable[[Any, Any], jax.Array]         # (params, data) -> (N, K)
    kl: Callable[[Any, Any], jax.Array]             # (q, p) -> (K,)
    sample_params: Callable[[Any, Any], Any]        # (key, posterior) -> params
    mode_params: Callable[[Any], Any]
    mean_params: Callable[[Any], Any]
    log_predictive: Callable[[Any, Any], jax.Array] # (posterior, data) -> (N, K), Student-t
    log_predictive_gaussian: Callable[[Any, Any], jax.Array]
    # Optional override for families whose Gibbs step is not plain
    # update+sample (hierarchical inner-Gibbs chains, bayesian.py:623-659):
    # (key, prior, stats) -> (posterior, params)
    gibbs_update: Any = None
    # Optional weighted maximum-likelihood update (stats) -> params, for
    # the likelihood-only EM engine (reference max_likelihood contract,
    # gmm.py:77-103, ilr.py:82-86). None = EM unsupported for this family.
    ml_update: Any = None


def gaussian_family() -> Family:
    """Full-covariance Gaussian | Normal-Wishart (bayesian.py:182-323)."""
    return Family(
        suff_stats=lambda data, resp: _niw.suff_stats(data[0], resp),
        update=_niw.posterior_update,
        svi_blend=_niw.svi_blend,
        ell=lambda post, data: _niw.expected_log_likelihood(post, data[0]),
        loglik=lambda params, data: _niw.log_likelihood(params, data[0]),
        kl=_niw.kl_divergence,
        sample_params=_niw.sample_params,
        mode_params=_niw.mode_params,
        mean_params=_niw.mean_params,
        log_predictive=lambda post, data: _niw.log_predictive_studentt(post, data[0]),
        log_predictive_gaussian=lambda post, data: _niw.log_predictive_gaussian(post, data[0]),
        ml_update=_niw.ml_params,
    )


def diag_gaussian_family() -> Family:
    """Diagonal Gaussian | Normal-Gamma (bayesian.py:343-500)."""
    return Family(
        suff_stats=lambda data, resp: _ng.suff_stats(data[0], resp),
        update=_ng.posterior_update,
        svi_blend=_ng.svi_blend,
        ell=lambda post, data: _ng.expected_log_likelihood(post, data[0]),
        loglik=lambda params, data: _ng.log_likelihood(params, data[0]),
        kl=_ng.kl_divergence,
        sample_params=_ng.sample_params,
        mode_params=_ng.mode_params,
        mean_params=_ng.mean_params,
        log_predictive=lambda post, data: _ng.log_predictive_studentt(post, data[0]),
        log_predictive_gaussian=lambda post, data: _ng.log_predictive_gaussian(post, data[0]),
        ml_update=_ng.ml_params,
    )


def linear_family(affine: bool = True) -> Family:
    """Linear Gaussian y|x | Matrix-Normal-Wishart (bayesian.py:796-1003).

    data = (x, y); x is augmented with a ones column internally when affine.
    """
    aug = lambda x: augment(x, affine)
    return Family(
        suff_stats=lambda data, resp: _mnw.suff_stats(aug(data[0]), data[1], resp),
        update=_mnw.posterior_update,
        svi_blend=_mnw.svi_blend,
        ell=lambda post, data: _mnw.expected_log_likelihood(post, aug(data[0]), data[1]),
        loglik=lambda params, data: _mnw.log_likelihood(params, aug(data[0]), data[1]),
        kl=_mnw.kl_divergence,
        sample_params=_mnw.sample_params,
        mode_params=_mnw.mode_params,
        mean_params=_mnw.mean_params,
        log_predictive=lambda post, data: _mnw.log_predictive_studentt(
            post, aug(data[0]), data[1]),
        log_predictive_gaussian=lambda post, data: _mnw.log_predictive_gaussian(
            post, aug(data[0]), data[1]),
        ml_update=_mnw.ml_params,
    )


def diag_linear_family(affine: bool = True) -> Family:
    """Linear Gaussian with diagonal noise | Matrix-Normal-Gamma
    (bayesian.py:1006-1134)."""
    aug = lambda x: augment(x, affine)
    return Family(
        suff_stats=lambda data, resp: _mnw.suff_stats(aug(data[0]), data[1], resp),
        update=_mng.posterior_update,
        svi_blend=_mng.svi_blend,
        ell=lambda post, data: _mng.expected_log_likelihood(post, aug(data[0]), data[1]),
        loglik=lambda params, data: _mng.log_likelihood(params, aug(data[0]), data[1]),
        kl=_mng.kl_divergence,
        sample_params=_mng.sample_params,
        mode_params=_mng.mode_params,
        mean_params=_mng.mean_params,
        log_predictive=lambda post, data: _mng.log_predictive_studentt(
            post, aug(data[0]), data[1]),
        log_predictive_gaussian=lambda post, data: _mng.log_predictive_gaussian(
            post, aug(data[0]), data[1]),
        ml_update=_mng.ml_params,
    )


def product_family(families, data_slices) -> Family:
    """Joint family over independent data blocks sharing the labels.

    `families`: tuple of Family; `data_slices`: tuple of index tuples —
    data_slices[i] selects which elements of the joint data tuple feed
    family i. Priors/posteriors/stats/params become tuples.

    This is how ILR experts are built: p(x, y | z=k) =
    basis_k(x) * model_k(y | x) (reference ilr.py:71-75 structure).
    """
    def pick(data, sl):
        return tuple(data[i] for i in sl)

    def split_keys(key, n):
        return jax.random.split(key, n)

    nf = len(families)

    def _member_gibbs(f: Family):
        if f.gibbs_update is not None:
            return f.gibbs_update
        return lambda key, prior, stats: (
            lambda post: (post, f.sample_params(key, post))
        )(f.update(prior, stats))

    if any(f.gibbs_update is not None for f in families):
        def product_gibbs(key, prior, stats):
            outs = tuple(
                _member_gibbs(f)(k, p, s)
                for f, k, p, s in zip(families, split_keys(key, nf),
                                      prior, stats))
            return tuple(o[0] for o in outs), tuple(o[1] for o in outs)
    else:
        product_gibbs = None

    return Family(
        gibbs_update=product_gibbs,
        suff_stats=lambda data, resp: tuple(
            f.suff_stats(pick(data, sl), resp)
            for f, sl in zip(families, data_slices)),
        update=lambda prior, stats: tuple(
            f.update(p, s) for f, p, s in zip(families, prior, stats)),
        svi_blend=lambda post, prior, stats, scale, step: tuple(
            f.svi_blend(q, p, s, scale, step)
            for f, q, p, s in zip(families, post, prior, stats)),
        ell=lambda post, data: sum(
            f.ell(q, pick(data, sl))
            for f, q, sl in zip(families, post, data_slices)),
        loglik=lambda params, data: sum(
            f.loglik(p, pick(data, sl))
            for f, p, sl in zip(families, params, data_slices)),
        kl=lambda q, p: sum(
            f.kl(qq, pp) for f, qq, pp in zip(families, q, p)),
        sample_params=lambda key, post: tuple(
            f.sample_params(k, q)
            for f, k, q in zip(families, split_keys(key, nf), post)),
        mode_params=lambda post: tuple(
            f.mode_params(q) for f, q in zip(families, post)),
        mean_params=lambda post: tuple(
            f.mean_params(q) for f, q in zip(families, post)),
        log_predictive=lambda post, data: sum(
            f.log_predictive(q, pick(data, sl))
            for f, q, sl in zip(families, post, data_slices)),
        log_predictive_gaussian=lambda post, data: sum(
            f.log_predictive_gaussian(q, pick(data, sl))
            for f, q, sl in zip(families, post, data_slices)),
        ml_update=(
            (lambda stats: tuple(f.ml_update(s)
                                 for f, s in zip(families, stats)))
            if all(f.ml_update is not None for f in families) else None),
    )


def hier_gaussian_family(nb_iter: int = 25, gibbs_iter: int = 5) -> Family:
    """Hierarchically-tied Gaussians: shared NW hyper-prior over component
    means + tied precision (bayesian.py:503-793). The VI update runs
    `nb_iter` inner coordinate-ascent sub-iterations (the reference's
    maxsubiter). `gibbs_iter` is retained for API compatibility but
    UNUSED since round 5: the Gibbs side is the exact one-shot draw
    (hierarchical.gibbs_update_exact), which has no inner chain."""
    from mimo_tpu.distributions import hierarchical as _h
    return Family(
        suff_stats=lambda data, resp: _niw.suff_stats(data[0], resp),
        update=lambda prior, stats: _h.posterior_update(prior, stats, nb_iter),
        svi_blend=lambda post, prior, stats, scale, step: _h.svi_blend(
            post, prior, stats, scale, step, nb_iter=1),
        ell=lambda post, data: _h.expected_log_likelihood(post, data[0]),
        loglik=lambda params, data: _niw.log_likelihood(params, data[0]),
        kl=_h.kl_divergence,
        sample_params=_h.sample_params,
        mode_params=_h.mode_params,
        mean_params=_h.mean_params,
        log_predictive=lambda post, data: _h.log_predictive_studentt(post, data[0]),
        log_predictive_gaussian=lambda post, data: _h.log_predictive_gaussian(
            post, data[0]),
        # EXACT one-shot blocked draw (hierarchical.gibbs_update_exact);
        # the reference's inner chain (bayesian.py:623-659, kept as
        # hierarchical.gibbs_update) is an approximation the conjugacy
        # makes unnecessary. Geweke-certified: scripts/geweke_gibbs.py
        # --family hier.
        gibbs_update=_h.gibbs_update_exact,
    )


def tied_affine_family(nb_iter: int = 25, gibbs_iter: int = 25) -> Family:
    """Tied-affine experts: shared slope + shared noise, per-component
    offsets (bayesian.py:1137-1522). data = (x, y), x NOT augmented.
    `gibbs_iter` is retained for API compatibility but UNUSED since
    round 5: the Gibbs side is the exact one-shot draw
    (affine.gibbs_update_exact), which has no inner chain. The VI
    update keeps its `nb_iter` inner coordinate ascent."""
    from mimo_tpu.distributions import affine as _aff

    def _raise(*a, **k):
        raise NotImplementedError(
            'meanfield_sgd is not implemented for tied-affine experts '
            '(reference bayesian.py:1385-1386 raises as well)')

    aug = lambda x: augment(x, True)
    return Family(
        suff_stats=lambda data, resp: _aff.suff_stats(data[0], data[1], resp),
        update=lambda prior, stats: _aff.posterior_update(prior, stats, nb_iter),
        svi_blend=_raise,
        ell=lambda post, data: _aff.expected_log_likelihood(
            post, aug(data[0]), data[1]),
        loglik=lambda params, data: _aff.log_likelihood(
            params, aug(data[0]), data[1]),
        kl=_aff.kl_divergence,
        sample_params=_aff.sample_params,
        mode_params=_aff.mode_params,
        mean_params=_aff.mean_params,
        log_predictive=lambda post, data: _aff.log_predictive_studentt(
            post, aug(data[0]), data[1]),
        log_predictive_gaussian=lambda post, data: _aff.log_predictive_gaussian(
            post, aug(data[0]), data[1]),
        # EXACT one-shot blocked draw (affine.gibbs_update_exact); the
        # reference's inner chain (bayesian.py:1258-1319, kept as
        # affine.gibbs_update) is an approximation the conjugacy makes
        # unnecessary. Geweke-certified: scripts/geweke_gibbs.py
        # --family tied-affine.
        gibbs_update=_aff.gibbs_update_exact,
    )


def ilr_family(affine: bool = True, diag: bool = False,
               tied_affine: bool = False, hier_basis: bool = False,
               maxsubiter: int = 25) -> Family:
    """Mixture-of-linear-experts joint family: Gaussian basis on x (NIW or
    hierarchically-tied) x linear model of y|x (MNW, MNG, or tied-affine).
    data = (x, y). tied_affine + hier_basis reproduces the reference's
    BayesianMixtureOfLinearGaussiansWithTiedActivation (hilr.py:79)."""
    basis = hier_gaussian_family(nb_iter=maxsubiter) if hier_basis \
        else gaussian_family()
    if tied_affine:
        model = tied_affine_family(nb_iter=maxsubiter, gibbs_iter=maxsubiter)
    elif diag:
        model = diag_linear_family(affine)
    else:
        model = linear_family(affine)
    return product_family((basis, model), ((0,), (0, 1)))


# ---------------------------------------------------------------------------
# tied variants (shared covariance / noise across components)
# ---------------------------------------------------------------------------

def _pool_niw(p: _niw.NIW) -> _niw.NIW:
    """Pool psi, nu across K (TiedNormalWisharts.nat_to_std,
    composite.py:275-283): psi = inv(mean_k psi_k^{-1}), nu = mean_k nu_k."""
    from mimo_tpu.utils.linalg import inv_psd
    psi_inv = inv_psd(p.psi)
    pooled = inv_psd(jnp.mean(psi_inv, axis=0, keepdims=True))
    k = p.psi.shape[0]
    return p._replace(psi=jnp.broadcast_to(pooled, p.psi.shape),
                      nu=jnp.full_like(p.nu, jnp.mean(p.nu)))


def _pool_mnw(p: _mnw.MNW) -> _mnw.MNW:
    """Pool psi, nu across K experts (composite.py:800-808)."""
    from mimo_tpu.utils.linalg import inv_psd
    psi_inv = inv_psd(p.psi)
    pooled = inv_psd(jnp.mean(psi_inv, axis=0, keepdims=True))
    return p._replace(psi=jnp.broadcast_to(pooled, p.psi.shape),
                      nu=jnp.full_like(p.nu, jnp.mean(p.nu)))


def _pool_ng(p: _ng.NG) -> _ng.NG:
    """Pool alpha, beta across K (TiedNormalGammas, composite.py:523-547)."""
    return p._replace(alpha=jnp.broadcast_to(jnp.mean(p.alpha, 0, keepdims=True),
                                             p.alpha.shape),
                      beta=jnp.broadcast_to(jnp.mean(p.beta, 0, keepdims=True),
                                            p.beta.shape))


def _pool_mng(p: _mng.MNG) -> _mng.MNG:
    """Pool alpha, beta across K experts (TiedLinearGaussiansWith
    MatrixNormalGammas, composite.py:1050-1075)."""
    return p._replace(alpha=jnp.broadcast_to(jnp.mean(p.alpha, 0, keepdims=True),
                                             p.alpha.shape),
                      beta=jnp.broadcast_to(jnp.mean(p.beta, 0, keepdims=True),
                                            p.beta.shape))


_POOLERS = {_niw.NIW: _pool_niw, _mnw.MNW: _pool_mnw, _ng.NG: _pool_ng,
            _mng.MNG: _pool_mng}


def _tied_ml(stats, base_ml):
    """Pooled-scale weighted maximum likelihood: per-component means/slopes,
    one shared covariance from the summed residual scatter
    (TiedGaussiansWithPrecision.max_likelihood, gaussian.py:550-572;
    TiedLinearGaussians, lingauss.py:379-398; diagonal analogues
    gaussian.py:865-888, lingauss.py:1107-1130). Dispatches on the BASE
    family's ML params type — mnw and mng share LinGaussStats, so the
    stats type alone cannot distinguish full from diagonal noise."""
    params = base_ml(stats)
    if isinstance(params, _niw.GaussParams):
        n = jnp.maximum(stats.n1, 1e-8)
        scatter = stats.xxT - n[..., None, None] \
            * params.mu[..., :, None] * params.mu[..., None, :]
        sigma = jnp.sum(scatter, axis=0, keepdims=True) / jnp.sum(n)
        lm = jnp.linalg.inv(sigma + 1e-6 * jnp.eye(sigma.shape[-1],
                                                   dtype=sigma.dtype))
        return params._replace(lmbda=jnp.broadcast_to(lm,
                                                      params.lmbda.shape))
    if isinstance(params, _mnw.LinGaussParams):
        n = jnp.maximum(stats.n, 1e-8)
        resid = stats.yyT - params.A @ jnp.swapaxes(stats.yxT, -1, -2)
        sigma = jnp.sum(resid, axis=0, keepdims=True) / jnp.sum(n)
        sigma = 0.5 * (sigma + jnp.swapaxes(sigma, -1, -2)) \
            + 1e-6 * jnp.eye(sigma.shape[-1], dtype=sigma.dtype)
        lm = jnp.linalg.inv(sigma)
        return params._replace(lmbda=jnp.broadcast_to(lm,
                                                      params.lmbda.shape))
    if isinstance(params, _ng.DiagGaussParams):
        n = jnp.maximum(stats.n1, 1e-8)
        scatter = stats.xsq - n[..., None] * jnp.square(params.mu)
        sigma = jnp.sum(scatter, axis=0, keepdims=True) / jnp.sum(n)
        ld = 1.0 / (sigma + 1e-8)
        return params._replace(
            lmbda_diag=jnp.broadcast_to(ld, params.lmbda_diag.shape))
    if isinstance(params, _mng.DiagLinGaussParams):
        n = jnp.maximum(stats.n, 1e-8)
        resid = stats.yyT - params.A @ jnp.swapaxes(stats.yxT, -1, -2)
        sigma = jnp.sum(jnp.diagonal(resid, axis1=-2, axis2=-1),
                        axis=0, keepdims=True) / jnp.sum(n)
        ld = 1.0 / (sigma + 1e-8)
        return params._replace(
            lmbda_diag=jnp.broadcast_to(ld, params.lmbda_diag.shape))
    raise TypeError(f'no tied ML for {type(params).__name__}')


def tied_family(base: Family, pooler=None) -> Family:
    """Tie the scale parameters across components: run the base update then
    pool the posterior (mirrors Tied*.nat_to_std which pools during the
    nat->std map, composite.py:269-283 — algebraically the same point).

    The Gibbs path does NOT pool: the tied models are fully conjugate, so
    `tied_gibbs.tied_gibbs_update` draws the shared scale EXACTLY (one
    Wishart/Gamma draw from the summed residual scatter) instead of the
    reference's pooled-posterior approximation with K independent scale
    draws. Geweke-certified: scripts/geweke_gibbs.py --family tied."""
    from mimo_tpu.distributions.tied_gibbs import tied_gibbs_update

    def _auto_pool(post):
        pool = _POOLERS.get(type(post), None)
        return pool(post) if pool is not None else post

    pool = pooler if pooler is not None else _auto_pool
    return base._replace(
        update=lambda prior, stats: pool(base.update(prior, stats)),
        svi_blend=lambda post, prior, stats, scale, step: pool(
            base.svi_blend(post, prior, stats, scale, step)),
        gibbs_update=tied_gibbs_update,
        ml_update=(None if base.ml_update is None
                   else partial(_tied_ml, base_ml=base.ml_update)),
    )
