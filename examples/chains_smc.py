"""Chain parallelism: vmapped restarts on the ('chain',) mesh axis and
SMC-style population Gibbs with systematic resampling.

Replaces the reference's joblib/loky 24-process seed pool
(evaluate_sinc_parallel.py:120-132) with one on-device program.
"""

from _common import setup

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = setup('parallel chains + SMC', chains=(int, 8, 'chain count'))
    from mimo_tpu.models.gmm import BayesianGMM
    from mimo_tpu.distributions.niw import GaussParams
    from mimo_tpu.parallel.chains import fit_chains, best_of, smc_gibbs

    from mimo_tpu.parallel.diagnostics import diagnostics

    key = jax.random.PRNGKey(args.seed)
    true_mu = jnp.array([[-4., 0.], [4., 0.], [0., 5.]], jnp.float32)
    true_lm = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(true_mu, true_lm),
                                jnp.array([.3, .4, .3], jnp.float32), 10000)

    model = BayesianGMM.make(size=10, dim=2, gating='dp', kappa=0.05,
                             psi_scale=0.5)
    keys = jax.random.split(key, args.chains)
    states, vlbs = fit_chains(model, 'fit_vi', x, keys, maxiter=100)
    finals = np.asarray(vlbs[:, -1])
    print(f'{args.chains} vmapped VI chains, final ELBOs: '
          f'{finals.round(1)}')
    best, idx = best_of(states, vlbs)
    print(f'best chain {int(idx)}: {finals[idx]:.1f}')

    # convergence diagnostics over a Gibbs trace stack (no reference
    # counterpart — its only diagnostic is best-of-N ELBO)
    gss, lls = fit_chains(model, 'fit_gibbs', x, keys, maxiter=150,
                          track_loglik=True)
    d = diagnostics(np.asarray(lls)[:, 50:])     # post-burn-in
    print(f"Gibbs loglik diagnostics over {args.chains} chains: "
          f"split-R-hat {d['rhat']:.3f} (rank {d['rhat_rank']:.3f}), "
          f"ESS {d['ess']:.0f} of {d['n']}")

    states, lls = smc_gibbs(model, x, key=args.seed, n_chains=args.chains,
                            n_rounds=8, sweeps_per_round=10)
    print('SMC population mean loglik per round:',
          np.asarray(lls).round(1))


if __name__ == '__main__':
    main()
