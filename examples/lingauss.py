"""Single linear-Gaussian regression with Matrix-Normal-Wishart priors —
plain, diagonal-noise, and tied-affine (separate slope/offset) variants.

Mirrors examples/lingauss and examples/dlingauss in the reference.
"""

from _common import setup

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = setup('linear Gaussian | MNW')
    from mimo_tpu.distributions import mnw, mng, affine
    from mimo_tpu.distributions.mnw import MNW, augment
    from mimo_tpu.distributions.mng import MNG
    from mimo_tpu.distributions.affine import TiedAffine

    rng = np.random.default_rng(args.seed)
    n, q, p = 2000, 3, 2
    true_A = rng.standard_normal((p, q))
    true_c = np.array([0.5, -1.0])
    x = jnp.asarray(rng.standard_normal((n, q)))
    y = jnp.asarray(np.asarray(x) @ true_A.T + true_c
                    + 0.1 * rng.standard_normal((n, p)))
    ones = jnp.ones((n, 1), x.dtype)

    # plain MNW (affine via the ones column)
    prior = MNW.standard(1, p, q + 1, K_scale=1e-2, dtype=x.dtype)
    xa = augment(x, True)
    stats = mnw.suff_stats(xa, y, ones)
    post = mnw.posterior_update(prior, stats)
    est = np.asarray(post.M[0])
    print('MNW slope error ', np.abs(est[:, :q] - true_A).max().round(5),
          '| offset error ', np.abs(est[:, q] - true_c).max().round(5))
    lp = mnw.log_predictive_studentt(post, xa[:3], y[:3])
    print('predictive logpdf of 3 points', np.asarray(lp[:, 0]).round(2))

    # diagonal noise (MNG)
    prior_d = MNG.standard(1, p, q + 1, K_scale=1e-2, dtype=x.dtype)
    post_d = mng.posterior_update(prior_d, stats)
    print('MNG noise precisions ',
          np.asarray(post_d.alpha[0] / post_d.beta[0]).round(2),
          '(true 100)')

    # tied-affine: explicit offset prior, shared slope
    prior_a = TiedAffine.standard(1, p, q, K_scale=1e-2, kappa=1e-2,
                                  dtype=x.dtype)
    stats_a = affine.suff_stats(x, y, ones)
    post_a = affine.posterior_update(prior_a, stats_a, nb_iter=25)
    print('tied-affine slope error ',
          np.abs(np.asarray(post_a.M) - true_A).max().round(5),
          '| offset error ',
          np.abs(np.asarray(post_a.mus[0]) - true_c).max().round(5))


if __name__ == '__main__':
    main()
