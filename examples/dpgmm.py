"""DP-GMM: truncated stick-breaking mixture with blocked Gibbs and VI.

Mirrors examples/dgmm (diag via --diag), examples/dp.py (prior draws) and
the tied variants of examples/tgmm (via --tied).
"""

from _common import setup, maybe_save_plot

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = setup('DP-GMM (stick-breaking)',
                 nb_models=(int, 25, 'truncation level'),
                 alpha=(float, 1.0, 'DP concentration'),
                 diag=(bool, False, 'diagonal covariances'),
                 tied=(bool, False, 'tied covariances'),
                 n=(int, 20000, 'data size'))
    from mimo_tpu.models.gmm import BayesianGMM
    from mimo_tpu.models.mixture import MFState
    from mimo_tpu.distributions.gating import StickBreaking
    from mimo_tpu.distributions.niw import GaussParams

    # stick-breaking prior draws (examples/dp.py)
    sb = StickBreaking.standard(args.nb_models, args.alpha)
    draws = jax.vmap(sb.sample)(jax.random.split(
        jax.random.PRNGKey(args.seed), 3))
    print('three stick-breaking prior draws (first 6 weights):')
    print(np.asarray(draws[:, :6]).round(3))

    key = jax.random.PRNGKey(args.seed)
    true_mu = jnp.array([[-4., 0.], [4., 0.], [0., 5.], [0., -4.]], jnp.float32)
    true_lm = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32) * 2.0, (4, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(true_mu, true_lm),
                                jnp.array([.25, .3, .25, .2], jnp.float32), args.n)

    model = BayesianGMM.make(size=args.nb_models, dim=2, gating='dp',
                             alpha=args.alpha, diag=args.diag,
                             tied=args.tied, kappa=0.05, psi_scale=0.5)
    gs = model.fit_gibbs(x, key=args.seed, maxiter=200)
    counts = np.bincount(np.asarray(gs.labels), minlength=args.nb_models)
    print('Gibbs occupancy (sorted):', np.sort(counts)[::-1][:8])

    state, vlb = model.fit_vi(x, key=args.seed + 1, maxiter=200,
                              init_state=MFState(gs.components, gs.gating),
                              randomize=False)
    used = np.asarray(model.used_labels(state, (x,)))
    print(f'VI ELBO {float(vlb[-1]):.1f}; {used.sum()} components used')
    if not args.diag:
        print('means:\n', np.asarray(state.components.mu)[used].round(2))
    else:
        print('means:\n', np.asarray(state.components.mu)[used].round(2))

    if args.plot and not args.diag:
        import matplotlib
        matplotlib.use('Agg')
        from mimo_tpu.distributions import niw
        from mimo_tpu.utils.plot import plot_mixture
        resp = model.expected_responsibilities(state, (x,))
        plot_mixture(x[:3000], niw.mode_params(state.components),
                     np.asarray(state.gating.mean()),
                     labels=np.asarray(jnp.argmax(resp[:3000], -1)))
        maybe_save_plot(args, 'dpgmm')


if __name__ == '__main__':
    main()
