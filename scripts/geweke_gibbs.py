"""Geweke joint-distribution test of the FULL Gibbs transition.

The fixed-state two-sample test (scripts/gibbs_twosample.py) certifies
only the label-sampling conditional; this tests everything else too —
the conjugate posterior updates and the SAMPLED parameter conditionals
(the Bartlett Wishart path in wishart_sample, the Gaussian mean draw,
the stick-breaking Beta draws), reference anchors composite.py:82-86 and
wishart.py:72-92.

Geweke (2004, "Getting it right"): if the Gibbs transition
T(theta' | theta, y) leaves p(theta | y) invariant for every y, then the
Markov chain

    y_t ~ p(y | theta_{t-1}),   theta_t ~ T(. | theta_{t-1}, y_t)

has stationary marginal theta_t ~ p(theta) — the PRIOR. So every
marginal statistic of (theta, y) must match between (a) iid prior draws
(params + sticks from the prior, data generated from them) and (b) the
successive-conditional chain that regenerates the data each sweep and
applies the production transition (fused label sweep -> conjugate
update -> wishart/normal/Beta draws). Any bias in ANY sampled
conditional shifts the stationary distribution and shows up as a large
z-score.

The gating is stick-breaking (NOT exchangeable across component index),
so per-index statistics are well-defined — no label-alignment tricks.

z = (mean_a - mean_b) / sqrt(se_a^2 + se_b^2), with se_b from batch
means (the chain autocorrelates). |z| > ~4 on any statistic indicates a
transition bug; healthy runs sit |z| < 3 (see the committed BENCH_NOTES
section for measured values, CPU f64 + TPU f32 Mosaic path).

Usage:
    python scripts/geweke_gibbs.py                    # CPU f64 oracle
    python scripts/geweke_gibbs.py --backend pallas   # TPU f32 Mosaic
    python scripts/geweke_gibbs.py --draws 40000 --thin 2
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--backend', default='xla',
                    choices=['xla', 'pallas'],
                    help='pallas = the Mosaic on-core-PRNG label kernel '
                         '(f32; interpret mode off-TPU)')
    ap.add_argument('--family', default='gmm', choices=['gmm', 'ilr'],
                    help='gmm: NIW draws (Bartlett Wishart + Gaussian); '
                         'ilr: adds the Matrix-Normal expert draws '
                         '(composite.py:666-683 analogue)')
    ap.add_argument('--draws', type=int, default=20000)
    ap.add_argument('--thin', type=int, default=2,
                    help='transitions per collected draw')
    ap.add_argument('--burn', type=int, default=500)
    ap.add_argument('--n', type=int, default=512)
    ap.add_argument('--k', type=int, default=3)
    ap.add_argument('--dim', type=int, default=2)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--f64', action='store_true',
                    help='force x64 (default on for the xla backend)')
    args = ap.parse_args(argv)

    import jax
    if args.backend == 'xla' or args.f64:
        jax.config.update('jax_enable_x64', True)
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), '.jax_cache'
                      if jax.default_backend() == 'tpu'
                      else '.jax_cache_tests'))
    import jax.numpy as jnp
    import numpy as np

    from mimo_tpu.models.gmm import BayesianGMM
    from mimo_tpu.ops.family_estep import fused_gibbs_blockwise
    from mimo_tpu.utils.linalg import logdet_psd

    dtype = jnp.float64 if (args.backend == 'xla' or args.f64) \
        else jnp.float32
    n, kk, d = args.n, args.k, args.dim
    # moderately tight priors so prior-drawn data is non-degenerate (a
    # diffuse NIW makes both samplers produce huge-variance data and the
    # test loses power, not validity)
    if args.family == 'gmm':
        model = BayesianGMM.make(size=kk, dim=d, gating='stick-breaking',
                                 alpha=1.5, kappa=2.0, psi_scale=1.0,
                                 nu=float(d + 3), dtype=dtype)

        def generate(key, params, pi):
            x, _ = BayesianGMM.generate(key, params, pi, n)
            return (x,)

        def stats_of(params, pi, data):
            """(S,) permutation-SENSITIVE statistics (stick order is
            real). Data moments pass through arcsinh — the predictive
            tails are Student-t with df ~ nu-d+1, so RAW sample
            variances are too heavy-tailed for a CLT-based z (and can
            overflow f32); arcsinh is monotone, applied identically to
            both samplers, so equality of marginals is preserved."""
            (x,) = data
            lam = params.lmbda
            return jnp.concatenate([
                params.mu[:, 0],                      # K
                logdet_psd(lam),                      # K (logdet Lambda_k)
                jnp.trace(lam, axis1=-2, axis2=-1),   # K
                pi,                                   # K
                jnp.arcsinh(jnp.stack([
                    jnp.mean(x[:, 0]), jnp.var(x[:, 0]),
                    jnp.mean(jnp.sum(x * x, -1))])),
            ])

        names = ([f'mu{j}_x0' for j in range(kk)]
                 + [f'logdetL{j}' for j in range(kk)]
                 + [f'trL{j}' for j in range(kk)]
                 + [f'pi{j}' for j in range(kk)]
                 + ['mean_x0', 'var_x0', 'mean_xx'])
    else:
        from mimo_tpu.models.ilr import BayesianILR
        model = BayesianILR.make(size=kk, input_dim=d, output_dim=1,
                                 gating='stick-breaking', alpha=1.5,
                                 kappa=2.0, K_scale=1.0, psi_scale=1.0,
                                 basis_psi_scale=1.0, dtype=dtype)

        def generate(key, params, pi):
            bp, ep = params
            x, y, _ = BayesianILR.generate(key, bp, ep, pi, n,
                                           affine=model.affine)
            return (x, y)

        def stats_of(params, pi, data):
            """Data moments arcsinh-stabilized (see the gmm variant):
            prior-drawn expert precisions put Student-t-like tails on
            y whose raw sample variance overflows f32 once in ~1e4
            draws and breaks the CLT z even in f64."""
            x, y = data
            bp, ep = params
            return jnp.concatenate([
                bp.mu[:, 0],                          # K basis means
                logdet_psd(bp.lmbda),                 # K basis logdets
                ep.A[:, 0, 0],                        # K slopes
                ep.A[:, 0, -1],                       # K offsets
                jnp.log(ep.lmbda[:, 0, 0]),           # K noise logdets
                pi,                                   # K
                jnp.arcsinh(jnp.stack([
                    jnp.mean(x[:, 0]), jnp.var(x[:, 0]),
                    jnp.mean(y[:, 0]), jnp.var(y[:, 0]),
                    jnp.mean(x[:, 0] * y[:, 0])])),
            ])

        names = ([f'bmu{j}' for j in range(kk)]
                 + [f'blogdet{j}' for j in range(kk)]
                 + [f'A{j}' for j in range(kk)]
                 + [f'c{j}' for j in range(kk)]
                 + [f'loglam{j}' for j in range(kk)]
                 + [f'pi{j}' for j in range(kk)]
                 + ['mean_x', 'var_x', 'mean_y', 'var_y', 'mean_xy'])
    spec = model._estep_spec()
    use_pallas = args.backend == 'pallas'
    block = 128 if use_pallas else n

    def prior_draw(key):
        k1, k2, k3 = jax.random.split(key, 3)
        params = model.family.sample_params(k1, model.components_prior)
        pi = model.gating_prior.sample(k2)
        return stats_of(params, pi, generate(k3, params, pi))

    if use_pallas:
        from mimo_tpu.ops.pallas_gibbs import fused_gibbs_pallas
        from mimo_tpu.models.mixture import _pallas_xts

    def transition(key, params, pi, data):
        """ONE production Gibbs sweep: fused label sample -> conjugate
        posterior update -> parameter + stick draws (the exact sweep
        body of fit_gibbs_fused, mixture.py)."""
        k_lab, k_par, k_pi = jax.random.split(key, 3)
        log_pi = jnp.log(jnp.clip(pi, 1e-37, None))
        if use_pallas:
            seed = jax.random.randint(k_lab, (), 0, 2**31 - 1,
                                      dtype=jnp.int32)
            xts = _pallas_xts(data, block, None)
            _, res = fused_gibbs_pallas(spec, seed, params, log_pi, xts,
                                        block, n)
            res = jax.tree.map(lambda a: a.astype(dtype)
                               if a.dtype != jnp.int32 else a, res)
        else:
            _, res = fused_gibbs_blockwise(spec, k_lab, params, log_pi,
                                           data, block)
        comps = model.family.update(model.components_prior, res.stats)
        params = model.family.sample_params(k_par, comps)
        gating = model.gating_prior.update(res.counts)
        pi = gating.sample(k_pi)
        return params, pi

    def succ_step(carry, key):
        params, pi = carry
        k_d, k_t = jax.random.split(key)
        data = generate(k_d, params, pi)
        for i in range(args.thin):
            params, pi = transition(jax.random.fold_in(k_t, i),
                                    params, pi, data)
            if i + 1 < args.thin:     # fresh data between thinned sweeps
                data = generate(jax.random.fold_in(k_d, i + 1),
                                params, pi)
        return (params, pi), stats_of(params, pi, data)

    key = jax.random.PRNGKey(args.seed)
    k_prior, k_succ, k0 = jax.random.split(key, 3)

    # (a) iid prior side
    prior_stats = jax.lax.map(prior_draw,
                              jax.random.split(k_prior, args.draws),
                              batch_size=1024)
    prior_stats = np.asarray(jax.device_get(prior_stats), np.float64)

    # (b) successive-conditional side (one jitted scan)
    params0 = model.family.sample_params(jax.random.fold_in(k0, 0),
                                         model.components_prior)
    pi0 = model.gating_prior.sample(jax.random.fold_in(k0, 1))

    @jax.jit
    def run_chain(params0, pi0, keys):
        _, s = jax.lax.scan(succ_step, (params0, pi0), keys)
        return s

    succ_stats = run_chain(params0, pi0,
                           jax.random.split(k_succ,
                                            args.burn + args.draws))
    succ_stats = np.asarray(jax.device_get(succ_stats),
                            np.float64)[args.burn:]

    # non-finite draws (possible at f32 from astronomically-deep tails
    # even after arcsinh, e.g. an inf inside a component's logdet):
    # count PER SIDE and drop, loudly — silently nan-propagating means
    # would void every z
    bad_p = ~np.isfinite(prior_stats).all(axis=1)
    bad_s = ~np.isfinite(succ_stats).all(axis=1)
    if bad_p.any() or bad_s.any():
        runs = []
        in_run = False
        for i, b in enumerate(bad_s):
            if b and not in_run:
                runs.append([i, i])
                in_run = True
            elif b:
                runs[-1][1] = i
            else:
                in_run = False
        print(f'WARNING: dropped non-finite draws: prior '
              f'{int(bad_p.sum())}/{len(bad_p)}, successive '
              f'{int(bad_s.sum())}/{len(bad_s)} in {len(runs)} run(s) '
              f'{runs[:5]}', flush=True)
    assert bad_p.mean() < 0.01 and bad_s.mean() < 0.01, \
        'too many non-finite draws — investigate before trusting z'
    prior_stats = prior_stats[~bad_p]
    succ_stats = succ_stats[~bad_s]

    def batch_means_se(a, nb=50):
        m = len(a) // nb
        bm = a[:nb * m].reshape(nb, m).mean(axis=1)
        return bm.std(ddof=1) / np.sqrt(nb)

    out = []
    for j, name in enumerate(names):
        pa, sb = prior_stats[:, j], succ_stats[:, j]
        se_a = pa.std(ddof=1) / np.sqrt(len(pa))
        se_b = batch_means_se(sb)
        z = (pa.mean() - sb.mean()) / np.sqrt(se_a ** 2 + se_b ** 2)
        out.append({'stat': name, 'prior_mean': float(pa.mean()),
                    'succ_mean': float(sb.mean()), 'z': float(z)})
        print(f'{name:<10} prior {pa.mean():+10.4f} succ {sb.mean():+10.4f}'
              f'  z {z:+6.2f}', flush=True)
    mx = max(abs(o['z']) for o in out)
    print(json.dumps({'backend': args.backend, 'family': args.family,
                      'draws': args.draws,
                      'dropped_prior': int(bad_p.sum()),
                      'dropped_succ': int(bad_s.sum()),
                      'thin': args.thin, 'max_abs_z': mx,
                      'n': n, 'k': kk, 'd': d,
                      'dtype': str(dtype.__name__ if hasattr(dtype,
                                   '__name__') else dtype)}))
    return mx, out


if __name__ == '__main__':
    main()
