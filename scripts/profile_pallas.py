"""Isolate the Pallas VI sweep's cost components at the bench shape
(N=1e7, K=50, d=2): kernel-only scan vs M-step-only scan vs full sweep,
and the same for the XLA fused engine. Run on the TPU chip."""

import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

import jax

jax.config.update('jax_compilation_cache_dir', os.path.join(_repo, '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.distributions.niw import GaussParams

N, K, D, ITERS = 10_000_000, 50, 2, 100


def timeit(f, *a, reps=3):
    o = f(*a)
    jax.block_until_ready(o)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        o = f(*a)
        jax.block_until_ready(o)
        best = min(best, time.time() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    mu = jnp.array([[-3., 0.], [3., 0.], [0., 4.]])
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(mu, lm),
                                jnp.array([.3, .4, .3]), N)
    model = BayesianGMM.make(size=K, dim=D, gating='dp', alpha=1.0,
                             kappa=0.05, psi_scale=0.5)
    # a fitted-ish state to run E-steps from
    state, _ = model.fit_vi_fused(x, key=1, maxiter=5)

    from mimo_tpu.ops.pallas_estep import estep_from_xt, pick_pallas_block
    from mimo_tpu.ops.family_estep import fused_estep_blockwise
    from mimo_tpu.ops.estep import pick_block_size

    bs_pallas = pick_pallas_block(N)
    bs_xla = pick_block_size(N)
    print(f'block sizes: pallas {bs_pallas}, xla {bs_xla}')
    xt = jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, (-N) % bs_pallas)))
    spec = model._estep_spec()

    @jax.jit
    def kernel_only_scan(state, xt):
        log_pi = state.gating.expected_log_pi()

        def step(c, _):
            res = estep_from_xt(state.components, log_pi, xt, bs_pallas,
                                n_valid=N)
            return c + res.lse, None
        return jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                            length=ITERS)[0]

    @jax.jit
    def xla_estep_only_scan(state, x):
        log_pi = state.gating.expected_log_pi()

        def step(c, _):
            res = fused_estep_blockwise(spec, state.components, log_pi,
                                        (x,), bs_xla)
            return c + res.lse, None
        return jax.lax.scan(step, jnp.zeros((), x.dtype), None,
                            length=ITERS)[0]

    @jax.jit
    def mstep_only_scan(state, x):
        # one real E-step for stats, then ITERS M-steps (K-sized math only)
        log_pi = state.gating.expected_log_pi()
        res = fused_estep_blockwise(spec, state.components, log_pi, (x,),
                                    bs_xla)
        from mimo_tpu.models.mixture import MFState

        def step(st, _):
            new = MFState(
                components=model.family.update(model.components_prior,
                                               res.stats),
                gating=model.gating_prior.update(res.counts))
            kl = jnp.sum(model.family.kl(new.components,
                                         model.components_prior))
            return new, kl
        st, kls = jax.lax.scan(step, state, None, length=ITERS)
        return kls[-1]

    t = timeit(kernel_only_scan, state, xt)
    print(f'pallas kernel-only: {ITERS / t:.1f} iters/s ({t / ITERS * 1e3:.2f} ms/iter)')
    t = timeit(xla_estep_only_scan, state, x)
    print(f'xla e-step-only:    {ITERS / t:.1f} iters/s ({t / ITERS * 1e3:.2f} ms/iter)')
    t = timeit(mstep_only_scan, state, x)
    print(f'm-step-only:        {ITERS / t:.1f} iters/s ({t / ITERS * 1e3:.2f} ms/iter)')

    # full engines for reference
    def full_pallas():
        st, v = model.fit_vi_fused(x, key=1, maxiter=ITERS, backend='pallas')
        return v
    def full_xla():
        st, v = model.fit_vi_fused(x, key=1, maxiter=ITERS)
        return v
    t = timeit(full_pallas)
    print(f'full pallas VI:     {ITERS / t:.1f} iters/s ({t / ITERS * 1e3:.2f} ms/iter)')
    t = timeit(full_xla)
    print(f'full xla VI:        {ITERS / t:.1f} iters/s ({t / ITERS * 1e3:.2f} ms/iter)')


if __name__ == '__main__':
    main()
