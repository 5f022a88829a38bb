"""Bisect the packaged Pallas v2 E-step (9.86 ms/iter at the bench
shape) against the 0.73 ms/iter standalone two-dot experiment.

Variants, all at N=1e7 K=50 d=2, each run as a 100-iter jitted scan:
  masked    packaged estep_from_xt with n_valid=N (tail-mask branch)
  unmasked  packaged estep_from_xt with N % block == 0 (mask elided)
  regF      two-dot kernel with F assembled as a register value
            (jnp.concatenate) instead of scratch-ref stripe stores
  regF-nod  regF without the F/denom divide (stats are then exp-sums,
            denominator folded later) -- isolates the (m8,B) divide
Swept over block sizes {16384, 32768, 65536, 131072, 262144}.
"""

import functools
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _repo)

import jax

jax.config.update('jax_compilation_cache_dir', os.path.join(_repo, '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.distributions.niw import GaussParams
from mimo_tpu.ops.estep import _estep_nat
from mimo_tpu.ops.pallas_estep import estep_from_xt, _nt

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


def _regf_kernel(divide, d, x_ref, theta_ref, acc_ref, lse_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        lse_ref[:] = jnp.zeros_like(lse_ref)

    xt = x_ref[:]
    b = xt.shape[1]
    m8 = acc_ref.shape[1]
    rows = [jnp.ones((1, b), jnp.float32), xt]
    for j in range(d):
        rows.append(xt * xt[j:j + 1, :])
    m = 1 + d + d * d
    if m8 > m:
        rows.append(jnp.zeros((m8 - m, b), jnp.float32))
    f = jnp.concatenate(rows, axis=0)                    # (m8, B) register
    logp = jnp.dot(theta_ref[:], f,
                   preferred_element_type=jnp.float32)   # (K, B)
    mx = jnp.max(logp, axis=0, keepdims=True)
    ex = jnp.exp(logp - mx)
    denom = jnp.sum(ex, axis=0, keepdims=True)
    lse = mx + jnp.log(denom)
    if divide:
        acc_ref[:] += _nt(ex, f / denom)
    else:
        acc_ref[:] += _nt(ex, f)
    lse_ref[:] += jnp.sum(lse).reshape(1, 1)


def regf_call(xt, theta, block_size, divide):
    d, n = xt.shape
    k, m8 = theta.shape
    grid = n // block_size
    return pl.pallas_call(
        functools.partial(_regf_kernel, divide, d),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((d, block_size), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, m8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, m8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, m8), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, theta)


def main():
    key = jax.random.PRNGKey(0)
    mu = jnp.array([[-3., 0.], [3., 0.], [0., 4.]])
    lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(mu, lm),
                                jnp.array([.3, .4, .3]), N)
    model = BayesianGMM.make(size=K, dim=D, gating='dp', alpha=1.0,
                             kappa=0.05, psi_scale=0.5)
    state, _ = model.fit_vi_fused(x, key=1, maxiter=5)
    log_pi = state.gating.expected_log_pi()
    h1, h2, c = _estep_nat(state.components, log_pi)
    m = 1 + D + D * D
    m8 = -(-m // 8) * 8
    theta = jnp.concatenate(
        [c[:, None], h1, h2.reshape(K, D * D),
         jnp.zeros((K, m8 - m), c.dtype)], axis=-1).astype(jnp.float32)

    for bs in (32768, 65536, 131072):
        pad = (-N) % bs
        n_pad = N + pad
        xt = jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, pad)))
        xt_exact = xt[:, :N - (N % bs)] if N % bs else xt[:, :N]

        @jax.jit
        def masked(xt):
            def step(cr, _):
                r = estep_from_xt(state.components, log_pi, xt, bs, n_valid=N)
                return cr + r.lse, None
            return jax.lax.scan(step, jnp.zeros(()), None, length=ITERS)[0]

        @jax.jit
        def unmasked(xt):
            def step(cr, _):
                r = estep_from_xt(state.components, log_pi, xt, bs,
                                  n_valid=xt.shape[1])
                return cr + r.lse, None
            return jax.lax.scan(step, jnp.zeros(()), None, length=ITERS)[0]

        @jax.jit
        def regf(xt):
            def step(cr, _):
                acc, lse = regf_call(xt, theta, bs, True)
                return cr + lse[0, 0], None
            return jax.lax.scan(step, jnp.zeros(()), None, length=ITERS)[0]

        @jax.jit
        def regf_nod(xt):
            def step(cr, _):
                acc, lse = regf_call(xt, theta, bs, False)
                return cr + lse[0, 0], None
            return jax.lax.scan(step, jnp.zeros(()), None, length=ITERS)[0]

        out = [f'bs={bs:7d}']
        for name, fn, arg in (('masked', masked, xt),
                              ('unmasked', unmasked, xt),
                              ('regF', regf, xt_exact),
                              ('regF-nodiv', regf_nod, xt_exact)):
            try:
                t = timeit(fn, arg) / ITERS * 1e3
                out.append(f'{name} {t:6.2f}ms')
            except Exception as e:  # noqa
                out.append(f'{name} FAIL({type(e).__name__})')
        print(' | '.join(out), flush=True)


if __name__ == '__main__':
    main()
