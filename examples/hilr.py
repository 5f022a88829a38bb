"""Hierarchical ILR variants: tied-activation experts (shared slope +
hierarchical basis, hilr.py:79) and a two-level mixture of ILRs
(hilr.py:293), on a triangle-wave dataset (examples/hilr/triangle)."""

from _common import setup, maybe_save_plot

import jax.numpy as jnp
import numpy as np


def main():
    args = setup('hierarchical ILR', nb_models=(int, 25, 'experts'))
    from mimo_tpu.models.ilr import BayesianILR
    from mimo_tpu.models.hmix import BayesianMixtureOfMixtures
    from mimo_tpu.models.mixture import MFState

    rng = np.random.default_rng(args.seed)
    n = 1500
    x = jnp.asarray(rng.uniform(-3., 3., (n, 1)), jnp.float32)
    tri = 2.0 * np.abs(np.asarray(x) / 2.0
                       - np.floor(np.asarray(x) / 2.0 + 0.5)) - 0.5
    y = jnp.asarray(tri + 0.05 * rng.standard_normal((n, 1)), jnp.float32)

    # tied-activation: hierarchical basis + tied-affine experts
    m = BayesianILR.make(size=args.nb_models, input_dim=1, output_dim=1,
                         alpha=5.0, kappa=0.05, tied_affine=True,
                         hier_basis=True, maxsubiter=10)
    m.init_transform(x, y)
    g = m.fit_gibbs((x, y), key=args.seed, maxiter=30)
    st, vlb = m.fit_vi((x, y), key=args.seed + 1, maxiter=100,
                       init_state=MFState(g.components, g.gating),
                       randomize=False)
    mu, var, std, nlpd = m.predict(st, x, y)
    print(f'tied-activation ILR: RMSE '
          f'{float(jnp.sqrt(jnp.mean((mu - y) ** 2))):.4f}, '
          f'mean NLPD {float(jnp.mean(nlpd)):.4f}')

    # two-level mixture of ILRs
    mm = BayesianMixtureOfMixtures.make_ilr(
        cluster_size=2, mixture_size=6, input_dim=1, output_dim=1,
        kappa=0.05)
    mm.init_transform(x, y)
    st2, tr = mm.fit_vi((x, y), key=args.seed, maxiter=40, maxsubiter=2)
    mu2, _, _, nlpd2 = mm.predict(st2, x, y)
    print(f'mixture-of-ILRs marginal loglik {float(tr[-1]):.1f}, RMSE '
          f'{float(jnp.sqrt(jnp.mean((mu2 - y) ** 2))):.4f}, '
          f'mean NLPD {float(jnp.mean(nlpd2)):.4f}')

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        from mimo_tpu.utils.plot import plot_regression_band
        plot_regression_band(x, mu, std, y=y)
        maybe_save_plot(args, 'hilr')


if __name__ == '__main__':
    main()
