"""Multi-seed sinc study: the literal counterpart of the reference's
evaluate_sinc_parallel.py (its only parallel workflow — a 24-process
joblib/loky pool, lines 120-132).

Here the whole study is ONE vmapped+jitted program: every seed gets its
own random 80% train split (ShuffleSplit semantics) and runs the flagship
recipe (Gibbs init -> super-iters of [SVI -> prior<-posterior re-anchor],
evaluate_sinc_parallel.py:85-116) on device, in parallel. Evaluation
mirrors the reference: per-seed predictive mean/std curves on the input
grid, aggregated to mean +- std bands, plus per-seed RMSE (vs the true
sinc mean) and held-out NLPD distributions summarized violin-style
(utils.plot.plot_violin_box with --plot).
"""

from _common import setup, maybe_save_plot

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = setup(
        'multi-seed sinc study (vmapped restarts)',
        seeds=(int, 8, 'number of random train splits (reference: 24)'),
        models=(int, 50, 'DP truncation level (reference: 100)'),
        alpha=(float, 50.0, 'DP concentration (reference: 100)'),
        gibbs_iters=(int, 10, 'Gibbs init sweeps'),
        super_iters=(int, 2, 'SVI super-iterations with re-anchoring'),
        svi_iters=(int, 500, 'SVI steps per super-iteration'),
        svi_step_size=(float, 0.5, 'SVI step size'),
        svi_batch_size=(int, 256, 'SVI minibatch'),
        prediction=(str, 'average', 'mode or average'),
    )
    from mimo_tpu.models.ilr import BayesianILR
    from mimo_tpu.models.mixture import MFState

    # sinc dataset with input-dependent noise
    # (evaluate_sinc_parallel.py:166-171)
    rng = np.random.default_rng(args.seed)
    n = 2500
    grid = np.linspace(-10., 10., n).reshape(n, 1)
    noise = 0.05 + 0.2 * (1. + np.sin(2. * grid)) / (1. + np.exp(-0.2 * grid))
    target = np.sinc(grid) + noise * rng.standard_normal((n, 1))
    mean_true = np.sinc(grid)

    # per-seed 80/20 shuffle splits, stacked for vmap
    n_tr = int(0.8 * n)
    perms = np.stack([rng.permutation(n) for _ in range(args.seeds)])
    xtr = jnp.asarray(grid[perms[:, :n_tr]], jnp.float32)     # (S, ntr, 1)
    ytr = jnp.asarray(target[perms[:, :n_tr]], jnp.float32)
    xte = jnp.asarray(grid[perms[:, n_tr:]], jnp.float32)
    yte = jnp.asarray(target[perms[:, n_tr:]], jnp.float32)

    m = BayesianILR.make(size=args.models, input_dim=1, output_dim=1,
                         alpha=args.alpha, kappa=0.05)
    m.init_transform(jnp.asarray(grid, jnp.float32),
                     jnp.asarray(target, jnp.float32))

    def one_seed(key, x, y):
        """The flagship recipe on one train split (pure; vmapped)."""
        g = m.fit_gibbs((x, y), key=key, maxiter=args.gibbs_iters)
        state = MFState(g.components, g.gating)
        mm = m
        for it in range(args.super_iters):
            state, _ = mm.fit_svi(
                (x, y), key=jax.random.fold_in(key, it),
                maxiter=args.svi_iters, step_size=args.svi_step_size,
                batch_size=args.svi_batch_size, init_state=state,
                randomize=False)
            mm = mm.with_priors(state)      # prior <- posterior re-anchor
        return state

    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.seeds)
    states = jax.jit(jax.vmap(one_seed))(keys, xtr, ytr)

    gx = jnp.asarray(grid, jnp.float32)
    mu, _, std, _ = jax.vmap(
        lambda st: m.predict(st, gx, prediction=args.prediction))(states)
    _, _, _, nlpd = jax.vmap(
        lambda st, xs, ys: m.predict(st, xs, ys,
                                     prediction=args.prediction))(
        states, xte, yte)

    mu = np.asarray(mu)[..., 0]                       # (S, n)
    std = np.asarray(std)[..., 0]
    rmse = np.sqrt(np.mean((mu - mean_true.T) ** 2, axis=1))   # (S,)
    nlpd_mean = np.mean(np.asarray(nlpd), axis=1)              # (S,)

    print(f'{args.seeds} seeds | RMSE vs true mean: '
          f'{rmse.mean():.4f} +- {rmse.std():.4f} '
          f'(min {rmse.min():.4f}, max {rmse.max():.4f})')
    print(f'held-out NLPD: {nlpd_mean.mean():.4f} +- {nlpd_mean.std():.4f}')
    assert np.isfinite(rmse).all() and np.isfinite(nlpd_mean).all()
    assert rmse.mean() < 0.2, f'sinc recovery degraded: {rmse.mean()}'

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from mimo_tpu.utils.plot import plot_violin_box
        fig, axes = plt.subplots(3, 1, figsize=(7, 9))
        mu_avg, mu_std = mu.mean(0), mu.std(0)
        std_avg, std_std = std.mean(0), std.std(0)
        axes[0].plot(grid, mean_true, 'k--', zorder=10)
        axes[0].scatter(grid, target, s=0.75, facecolors='none',
                        edgecolors='grey', zorder=1)
        axes[0].plot(grid, mu_avg, '-r', zorder=5)
        for c in (1., 2.):
            axes[0].fill_between(grid.ravel(), mu_avg - c * mu_std,
                                 mu_avg + c * mu_std, color=(0, 0, 1, .1))
        axes[0].set_title('predictive mean across seeds')
        axes[1].plot(grid, noise, 'k--', zorder=10)
        axes[1].plot(grid, std_avg, '-r', zorder=5)
        for c in (1., 2.):
            axes[1].fill_between(grid.ravel(), std_avg - c * std_std,
                                 std_avg + c * std_std, color=(0, 0, 1, .1))
        axes[1].set_title('predictive std vs true noise level')
        plot_violin_box([rmse, nlpd_mean], labels=['RMSE', 'NLPD'],
                        ax=axes[2])
        axes[2].set_title('per-seed RMSE / held-out NLPD')
        plt.tight_layout()
        maybe_save_plot(args, 'ilr_sinc_study')


if __name__ == '__main__':
    main()
