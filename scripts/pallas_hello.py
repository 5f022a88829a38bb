import sys
sys.path.insert(0, '/root/repo')
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


x = jnp.ones((8, 128), jnp.float32)
f = pl.pallas_call(kern,
                   out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
t0 = time.time()
lowered = jax.jit(f).lower(x)
print('lowered', round(time.time() - t0, 2), flush=True)
t0 = time.time()
compiled = lowered.compile()
print('compiled', round(time.time() - t0, 2), flush=True)
t0 = time.time()
y = compiled(x)
jax.block_until_ready(y)
print('ran', round(time.time() - t0, 2), float(y.sum()), flush=True)
