"""Fixed-K GMM on a 2-D toy: EM, MAP, VI + Gibbs with best-of-N restarts.

Mirrors examples/gmm/toy and the best-of-5 ELBO selection of
examples/gmm/sine/svi_gmm.py:57-67 — here the restarts are one vmapped
on-device batch instead of sequential refits.
"""

from _common import setup, maybe_save_plot

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = setup('fixed-K GMM toy', nb_models=(int, 5, 'truncation K'),
                 restarts=(int, 5, 'parallel restarts'))
    from mimo_tpu.models.gmm import GMM, BayesianGMM
    from mimo_tpu.distributions.niw import GaussParams
    from mimo_tpu.parallel.chains import fit_chains, best_of

    key = jax.random.PRNGKey(args.seed)
    true_mu = jnp.array([[-4., 0.], [4., 0.], [0., 5.]])
    true_lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, z = BayesianGMM.generate(key, GaussParams(true_mu, true_lm),
                                jnp.array([.3, .4, .3]), 3000)

    # ML EM
    em = GMM(3, 2)
    em_state, ll = em.fit_em(x, key=args.seed, maxiter=150)
    print(f'EM final loglik {float(ll[-1]):.1f}; means:\n',
          np.asarray(em_state.params.mu))

    # Bayesian VI with best-of-N vmapped restarts
    model = BayesianGMM.make(size=args.nb_models, dim=2, gating='dirichlet',
                             alpha=1.0, kappa=0.05, psi_scale=0.5)
    keys = jax.random.split(key, args.restarts)
    states, vlbs = fit_chains(model, 'fit_vi', x, keys, maxiter=150)
    state, idx = best_of(states, vlbs)
    print(f'VI best-of-{args.restarts} ELBO {float(vlbs[idx, -1]):.1f} '
          f'(chain {int(idx)})')
    used = np.asarray(model.used_labels(state, (x,)))
    print('recovered means:\n', np.asarray(state.components.mu)[used])

    # MAP EM
    map_state, trace = model.fit_map(x, key=args.seed, maxiter=100)
    print(f'MAP final complete-loglik {float(trace[-1]):.1f}')

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from mimo_tpu.distributions import niw
        from mimo_tpu.utils.plot import plot_mixture
        resp = model.expected_responsibilities(state, (x,))
        plot_mixture(x, niw.mode_params(state.components),
                     np.asarray(state.gating.mean()),
                     labels=np.asarray(jnp.argmax(resp, -1)))
        maybe_save_plot(args, 'gmm_toy')


if __name__ == '__main__':
    main()
