"""ILR evaluation suite over the reference's benchmark datasets.

One driver for the remaining `examples/ilr/evaluate_*.py` workloads of the
reference: sinc (evaluate_sinc_parallel.py:167-171), step
(evaluate_step.py:58-75), chirp (evaluate_chirp.py:57-65), inverse — the
multi-valued S-curve (evaluate_inverse.py:58-60), cmb — the Cosmic
Microwave Background table (evaluate_cmb.py:60-69), and step with cubic
polynomial features (evaluate_step_poly_features.py:72-79).

Each runs the flagship recipe (Gibbs init -> SVI super-iterations with
prior<-posterior re-anchoring) and reports RMSE / NLPD / experts used.
"""

from _common import setup, maybe_save_plot

import os

import jax.numpy as jnp
import numpy as np

# the CMB table (Hannah 2011) is the one dataset the reference ships; we
# don't vendor it — point --cmb_path at a copy (falls back to the mounted
# reference's table when available)
_CMB_CANDIDATES = [
    os.path.join(os.path.dirname(__file__), 'cmb.csv'),
    '/root/reference/examples/ilr/cmb.csv',
]
CMB_DEFAULT = next((p for p in _CMB_CANDIDATES if os.path.exists(p)),
                   _CMB_CANDIDATES[0])


def poly_features(x, degree):
    """1-D polynomial feature map [x, x^2, ..., x^degree]; the affine
    engine supplies the bias column (evaluate_step_poly_features.py:76-79
    uses sklearn PolynomialFeatures(degree=3))."""
    return np.concatenate([x ** p for p in range(1, degree + 1)], axis=-1)


def make_dataset(name, n, rng, cmb_path=CMB_DEFAULT):
    """Returns (x_raw, x_features, y). x_raw is what gets plotted."""
    if name == 'sine':
        x = rng.uniform(-6., 6., (n, 1))
        y = np.sin(x) + 0.1 * (1.0 + 0.2 * np.abs(x)) \
            * rng.standard_normal((n, 1))
    elif name == 'sinc':
        x = np.linspace(-10., 10., n).reshape(n, 1)
        noise = 0.05 + 0.2 * (1. + np.sin(2. * x)) / (1. + np.exp(-0.2 * x))
        y = np.sinc(x) + noise * rng.standard_normal((n, 1))
    elif name in ('step', 'step_poly'):
        q = n // 4
        x = np.concatenate([np.linspace(-2., -1., q), np.linspace(-1., 0., q),
                            np.linspace(0., 1., q),
                            np.linspace(1., 2., n - 3 * q)]).reshape(-1, 1)
        mean = np.concatenate([np.full(q, 1.), np.full(q, 3.),
                               np.full(q, 0.),
                               np.full(n - 3 * q, 4.)]).reshape(-1, 1)
        sigma = 3.0 if name == 'step_poly' else 0.1
        y = mean + sigma * rng.standard_normal((len(x), 1))
        if name == 'step_poly':
            return x, poly_features(x, 3), y
    elif name == 'chirp':
        # hyperbolic chirp f(t) = f0*f1*t1 / ((f0-f1)t + f1*t1), phase
        # integral (scipy.signal.chirp method='hyperbolic' semantics)
        x = np.linspace(0., 5., n).reshape(n, 1)
        f0, f1, t1 = 2.5, 1.0, 2.5
        sing = -f1 * t1 / (f0 - f1)
        phase = -2 * np.pi * f0 * f1 * t1 / (f0 - f1) \
            * np.log(np.abs(1 - x / sing))
        y = np.cos(phase) + 0.25 * rng.standard_normal((n, 1))
    elif name == 'inverse':
        out = rng.uniform(0., 1., (n, 1))
        x = out + 0.3 * np.sin(2. * np.pi * out) \
            + 0.05 * rng.standard_normal((n, 1))
        y = out
    elif name == 'cmb':
        if not os.path.exists(cmb_path):
            raise FileNotFoundError(
                f'{cmb_path} not found; pass --cmb_path (CMB table from '
                f'Hannah 2011, two comma-separated columns)')
        data = np.loadtxt(cmb_path, delimiter=',', skiprows=1)
        x, y = data[:n, :1], data[:n, 1:]
    else:
        raise ValueError(name)
    return x, x, y


# per-dataset hyperparameters, following the reference drivers' argparse
# defaults (nb_models/alpha per evaluate_*.py); small datasets use the
# full-batch VI engine inside the super-iterations
PRESETS = {
    'sine': dict(n=2000, k=50, alpha=5.0, engine='svi'),
    'sinc': dict(n=2500, k=50, alpha=5.0, engine='svi'),
    'step': dict(n=160, k=10, alpha=1.0, engine='vi'),
    'step_poly': dict(n=160, k=10, alpha=1.0, engine='vi'),
    'chirp': dict(n=1500, k=50, alpha=5.0, engine='vi'),
    'inverse': dict(n=200, k=10, alpha=1.0, engine='vi'),
    'cmb': dict(n=696, k=25, alpha=3.0, engine='vi'),
}


def main():
    args = setup(
        'ILR benchmark datasets (evaluate_* parity)',
        dataset=(str, 'all', 'sine|sinc|step|step_poly|chirp|inverse|cmb|all'),
        nb_models=(int, 0, 'expert truncation (0 = per-dataset preset)'),
        alpha=(float, 0.0, 'DP concentration (0 = preset)'),
        n=(int, 0, 'training points (0 = preset)'),
        super_iters=(int, 2, 'SVI super-iterations'),
        gibbs_iters=(int, 25, 'Gibbs init sweeps'),
        svi_iters=(int, 500, 'SVI iterations per super-iteration'),
        svi_stepsize=(float, 5e-1, 'SVI step size'),
        svi_batchsize=(int, 128, 'SVI batch size'),
        prediction=(str, 'average', 'average | mode'),
        cmb_path=(str, CMB_DEFAULT, 'path to the CMB csv'),
    )
    from mimo_tpu.config import ILRConfig, GatingConfig, TrainConfig, \
        flagship_fit

    names = list(PRESETS) if args.dataset == 'all' else [args.dataset]
    for name in names:
        preset = PRESETS[name]
        n = args.n or preset['n']
        k = args.nb_models or preset['k']
        alpha = args.alpha or preset['alpha']
        rng = np.random.default_rng(args.seed)
        try:
            x_raw, x_feat, y = make_dataset(name, n, rng, args.cmb_path)
        except FileNotFoundError as e:
            print(f'{name}: skipped ({e})')
            continue
        x = jnp.asarray(x_feat, jnp.float32)
        yj = jnp.asarray(y, jnp.float32)

        cfg = ILRConfig(size=k, input_dim=x.shape[-1], output_dim=1,
                        gating=GatingConfig('stick-breaking', alpha),
                        kappa=0.05, K_scale=1e-2)
        model = cfg.build()
        model.init_transform(x, yj)
        train = TrainConfig(super_iters=args.super_iters,
                            gibbs_iters=args.gibbs_iters,
                            svi_iters=args.svi_iters,
                            vi_iters=args.svi_iters,
                            svi_step_size=args.svi_stepsize,
                            svi_batch_size=min(args.svi_batchsize, n),
                            seed=args.seed, engine=preset['engine'])
        model, state = flagship_fit(model, (x, yj), train)

        mu, var, std, nlpd = model.predict(state, x, yj,
                                           prediction=args.prediction)
        rmse = float(jnp.sqrt(jnp.mean((mu - yj) ** 2)))
        used = int(np.asarray(model.used_labels(state, (x, yj))).sum())
        print(f'{name:10s} N={n:5d} K={k:3d}: RMSE {rmse:8.4f} | '
              f'mean NLPD {float(jnp.mean(nlpd)):8.4f} | {used} experts')

        if args.plot:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            plt.figure()
            from mimo_tpu.utils.plot import plot_regression_band
            plot_regression_band(jnp.asarray(x_raw, jnp.float32), mu, std,
                                 y=yj)
            maybe_save_plot(args, f'ilr_{name}')


if __name__ == '__main__':
    main()
