"""Bisect: does adding an SMEM scalar input to the estep kernel break the
real-TPU Mosaic lowering/runtime? (scripts/min_kernel_test.py aborted.)"""
import sys
sys.path.insert(0, '/root/repo')
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mimo_tpu.ops.family_estep import gauss_features_t
from mimo_tpu.ops.pallas_estep import _dot_split, _nt, _assemble

K, D, B, N = 8, 2, 1024, 4096
m8 = 8
theta = jnp.asarray(np.random.randn(K, m8), jnp.float32)
xt = jnp.asarray(np.random.randn(D, N), jnp.float32)


def body(x_ref, theta_ref, acc_ref, lse_ref, nv_ref=None, masked=False):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        lse_ref[:] = jnp.zeros_like(lse_ref)

    f = _assemble(gauss_features_t, (x_ref[:],), acc_ref.shape[1])
    logp = _dot_split(theta_ref[:], f)
    mx = jnp.max(logp, axis=0, keepdims=True)
    ex = jnp.exp(logp - mx)
    if masked:
        b = f.shape[1]
        col = i * b + jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        ex = ex * (col < nv_ref[0]).astype(jnp.float32)
    denom = jnp.sum(ex, axis=0, keepdims=True)
    lse = mx + jnp.log(denom)
    acc_ref[:] += _nt(ex, f / denom)
    lse_ref[:] += jnp.sum(lse).reshape(1, 1)


def kern_nosmem(x_ref, theta_ref, acc_ref, lse_ref):
    body(x_ref, theta_ref, acc_ref, lse_ref)


def kern_smem_unused(nv_ref, x_ref, theta_ref, acc_ref, lse_ref):
    body(x_ref, theta_ref, acc_ref, lse_ref)


def kern_smem_used(nv_ref, x_ref, theta_ref, acc_ref, lse_ref):
    body(x_ref, theta_ref, acc_ref, lse_ref, nv_ref, masked=True)


common = dict(
    grid=(N // B,),
    out_specs=[pl.BlockSpec((K, m8), lambda i: (0, 0),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((1, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)],
    out_shape=[jax.ShapeDtypeStruct((K, m8), jnp.float32),
               jax.ShapeDtypeStruct((1, 1), jnp.float32)],
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024))

x_spec = pl.BlockSpec((D, B), lambda i: (0, i), memory_space=pltpu.VMEM)
th_spec = pl.BlockSpec((K, m8), lambda i: (0, 0), memory_space=pltpu.VMEM)

t0 = time.time()
acc, lse = pl.pallas_call(kern_nosmem, in_specs=[x_spec, th_spec],
                          **common)(xt, theta)
jax.block_until_ready(acc)
print('NO-SMEM:', round(time.time() - t0, 2), 's, counts',
      float(acc[:, 0].sum()), flush=True)

nv = jnp.asarray([N], jnp.int32)
t0 = time.time()
acc, lse = pl.pallas_call(
    kern_smem_unused,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), x_spec, th_spec],
    **common)(nv, xt, theta)
jax.block_until_ready(acc)
print('SMEM-unused:', round(time.time() - t0, 2), 's, counts',
      float(acc[:, 0].sum()), flush=True)

t0 = time.time()
acc, lse = pl.pallas_call(
    kern_smem_used,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), x_spec, th_spec],
    **common)(jnp.asarray([4000], jnp.int32), xt, theta)
jax.block_until_ready(acc)
print('SMEM-used (mask 4000):', round(time.time() - t0, 2), 's, counts',
      float(acc[:, 0].sum()), flush=True)
print('OK', flush=True)
