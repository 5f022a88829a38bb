import sys; sys.path.insert(0, '/root/repo')
import time, jax, jax.numpy as jnp, numpy as np
print('devices:', jax.devices(), flush=True)
from mimo_tpu.distributions.niw import NIW
from mimo_tpu.ops.pallas_estep import gmm_estep_pallas
rng = np.random.default_rng(5)
n, k, d = 4096, 6, 2
x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
post = NIW(mu=jnp.asarray(rng.standard_normal((k, d)), jnp.float32),
           kappa=jnp.asarray(rng.uniform(1, 5, k), jnp.float32),
           psi=jnp.broadcast_to(0.7 * jnp.eye(d), (k, d, d)).astype(jnp.float32),
           nu=jnp.asarray(rng.uniform(d + 2, d + 8, k), jnp.float32))
log_pi = jnp.log(jnp.full((k,), 1.0 / k, jnp.float32))
t0 = time.time()
res = gmm_estep_pallas(post, log_pi, x, block_size=1024)
jax.block_until_ready(res.counts)
print('estep kernel compile+run', time.time() - t0, 's; counts sum',
      float(res.counts.sum()), flush=True)
# masked path (n not multiple of block)
t0 = time.time()
res2 = gmm_estep_pallas(post, log_pi, x[:4000], block_size=1024)
jax.block_until_ready(res2.counts)
print('masked estep', time.time() - t0, 's; counts sum',
      float(res2.counts.sum()), flush=True)
from mimo_tpu.ops.pallas_gibbs import gibbs_labels_from_xt, gauss_plugin_nat
from mimo_tpu.distributions.niw import mode_params
params = mode_params(post)
nat = gauss_plugin_nat(params, log_pi)
t0 = time.time()
labels, r3 = gibbs_labels_from_xt(42, nat, x.T, block_size=1024)
jax.block_until_ready(labels)
print('gibbs kernel', time.time() - t0, 's; labels', int(labels.min()),
      int(labels.max()), flush=True)
print('OK', flush=True)
