"""The flagship workload: infinite mixture of linear regressions on sine.

Mirrors examples/ilr/evaluate_sine.py end to end: standardized data, prior
construction from CLI hyperparameters, Gibbs init, super-iterations of SVI
with prior<-posterior re-anchoring, moment-matched prediction with NLPD.
"""

from _common import setup, maybe_save_plot

import jax.numpy as jnp
import numpy as np


def main():
    args = setup(
        'ILR on sine (evaluate_sine parity)',
        nb_models=(int, 50, 'expert truncation (--nb_models)'),
        alpha=(float, 5.0, 'DP concentration (--alpha)'),
        super_iters=(int, 2, 'SVI super-iterations (--super_iters)'),
        gibbs_iters=(int, 10, 'Gibbs init sweeps (--gibbs_iters)'),
        svi_iters=(int, 500, 'SVI iterations (--svi_iters)'),
        svi_stepsize=(float, 5e-1, '(--svi_stepsize)'),
        svi_batchsize=(int, 256, '(--svi_batchsize)'),
        prediction=(str, 'average', 'average | mode (--prediction)'),
        n=(int, 2000, 'training points'),
    )
    from mimo_tpu.config import ILRConfig, GatingConfig, TrainConfig, \
        flagship_fit

    rng = np.random.default_rng(args.seed)
    x = jnp.asarray(rng.uniform(-6., 6., (args.n, 1)), jnp.float32)
    noise = 0.1 * (1.0 + 0.2 * np.abs(np.asarray(x)))
    y = jnp.asarray(np.sin(np.asarray(x))
                    + noise * rng.standard_normal((args.n, 1)), jnp.float32)

    cfg = ILRConfig(size=args.nb_models, input_dim=1, output_dim=1,
                    gating=GatingConfig('stick-breaking', args.alpha),
                    kappa=0.05, K_scale=1e-2)
    model = cfg.build()
    model.init_transform(x, y)

    train = TrainConfig(super_iters=args.super_iters,
                        gibbs_iters=args.gibbs_iters,
                        svi_iters=args.svi_iters,
                        svi_step_size=args.svi_stepsize,
                        svi_batch_size=args.svi_batchsize, seed=args.seed)
    model, state = flagship_fit(model, (x, y), train)

    mu, var, std, nlpd = model.predict(state, x, y,
                                       prediction=args.prediction)
    rmse = float(jnp.sqrt(jnp.mean((mu - y) ** 2)))
    used = int(np.asarray(model.used_labels(state, (x, y))).sum())
    print(f'RMSE {rmse:.4f} | mean NLPD {float(jnp.mean(nlpd)):.4f} | '
          f'{used} experts used')

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        from mimo_tpu.utils.plot import plot_regression_band
        plot_regression_band(x, mu, std, y=y)
        maybe_save_plot(args, 'ilr_sine')


if __name__ == '__main__':
    main()
