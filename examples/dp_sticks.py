"""Truncated stick-breaking prior demo — Dirichlet-process intuition.

Counterpart of the reference's standalone examples/dp.py: draw weight
vectors from TruncatedStickBreaking(K, 1, alpha), show the expected
weight decay over the stick index, and draw random DP mixture CDFs
(weights x standard-normal atoms) against the base measure's CDF.

Vectorized: the reference's Python list comprehension over 10,000 rvs()
calls becomes one vmapped sampler invocation.
"""

from _common import setup, maybe_save_plot

args = setup('Truncated stick-breaking / DP prior demo',
             k=(int, 1000, 'truncation level'),
             alpha=(float, 10.0, 'DP concentration'),
             draws=(int, 10000, 'prior weight draws'),
             cdfs=(int, 10, 'random mixture CDFs to draw'))

import jax
import jax.numpy as jnp
import numpy as np

from mimo_tpu.distributions.gating import StickBreaking

key = jax.random.PRNGKey(args.seed)
prior = StickBreaking.standard(args.k, args.alpha)

# mean prior weights over the stick index: E[pi_k] decays geometrically
# with rate alpha/(1+alpha) — check the Monte-Carlo mean against it
k_w, k_atoms = jax.random.split(key)
weights = jax.vmap(prior.sample)(jax.random.split(k_w, args.draws))
mean_w = jnp.mean(weights, axis=0)
rate = args.alpha / (1.0 + args.alpha)
theory = (1.0 / (1.0 + args.alpha)) * rate ** jnp.arange(args.k)
err = float(jnp.max(jnp.abs(mean_w[:50] - theory[:50])))
print(f'K={args.k} alpha={args.alpha}: E[pi_1..5] = '
      f'{np.asarray(mean_w[:5]).round(4)} (theory '
      f'{np.asarray(theory[:5]).round(4)}, max abs err first 50 sticks '
      f'{err:.2e})')
assert err < 5e-3, 'stick-breaking prior mean off its closed form'

# random DP mixture CDFs: F(x) = sum_k pi_k 1[omega_k <= x],
# omega_k ~ N(0, 1) — scattered around the base measure's CDF
atoms = jax.random.normal(k_atoms, (args.cdfs, args.k))
grid = jnp.linspace(-3.0, 3.0, 200)
sample_cdfs = jnp.einsum('ck,ckx->cx', weights[:args.cdfs],
                         (atoms[:, :, None] <= grid[None, None, :])
                         .astype(jnp.float32))
base_cdf = 0.5 * (1.0 + jax.scipy.special.erf(grid / jnp.sqrt(2.0)))
dev = float(jnp.mean(jnp.max(jnp.abs(sample_cdfs - base_cdf[None]),
                             axis=-1)))
print(f'{args.cdfs} random DP({args.alpha}) mixture CDFs: mean sup '
      f'deviation from the base N(0,1) CDF {dev:.3f} '
      f'(shrinks as alpha grows)')
assert jnp.all(jnp.abs(sample_cdfs[:, -1] - 1.0) < 1e-3), \
    'CDFs must reach 1 at the right edge'
print('OK')

if args.plot:
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    ax1.bar(range(1, 51), np.asarray(mean_w[:50]))
    ax1.set_xlabel('stick index')
    ax1.set_ylabel('E[pi_k]')
    for c in np.asarray(sample_cdfs):
        ax2.step(np.asarray(grid), c, alpha=0.6)
    ax2.plot(np.asarray(grid), np.asarray(base_cdf), 'k--', lw=2)
    maybe_save_plot(args, 'dp_sticks')
