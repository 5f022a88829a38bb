"""Single Gaussian with a Normal-Wishart prior — all four update rules.

Mirrors examples/gauss/{ml,map,gibbs,vi,svi}_gauss.py in the reference:
the K=1 special case of the mixture machinery, plus direct use of the
conjugate-family functions.
"""

from _common import setup

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = setup('Single Gaussian | NIW')
    from mimo_tpu.distributions import niw
    from mimo_tpu.distributions.niw import NIW

    rng = np.random.default_rng(args.seed)
    true_mu = np.array([1.0, -2.0])
    true_cov = np.array([[1.0, 0.6], [0.6, 2.0]])
    x = jnp.asarray(rng.multivariate_normal(true_mu, true_cov, 5000))

    prior = NIW.standard(1, 2, kappa=1e-2, psi_scale=1.0)
    stats = niw.suff_stats(x, jnp.ones((x.shape[0], 1), x.dtype))
    post = niw.posterior_update(prior, stats)

    print('posterior mean  ', np.asarray(post.mu[0]), ' true', true_mu)
    mode = niw.mode_params(post)
    print('MAP covariance  \n', np.linalg.inv(np.asarray(mode.lmbda[0])))
    print('true covariance \n', true_cov)

    # Gibbs draw + predictive density
    params = niw.sample_params(jax.random.PRNGKey(args.seed), post)
    lp = niw.log_predictive_studentt(post, x[:5])
    print('posterior draw mu', np.asarray(params.mu[0]))
    print('predictive logpdf of 5 points', np.asarray(lp[:, 0]))

    lml = niw.log_marginal_likelihood(prior, post, x.shape[0])
    print('log marginal likelihood', float(lml[0]))


if __name__ == '__main__':
    main()
