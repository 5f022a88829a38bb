"""Smoke: pallas kernels inside shard_map on the 8-virtual-device CPU
mesh (estep in interpret mode; gibbs via the per-device XLA fallback)."""
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
import jax.numpy as jnp
import numpy as np
jax.config.update('jax_enable_x64', True)

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.distributions.niw import GaussParams
from mimo_tpu.parallel.mesh import make_mesh, shard_data

rng = np.random.default_rng(0)
mu = jnp.asarray([[-3., 0.], [3., 0.], [0., 4.]], jnp.float32)
lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2)).astype(jnp.float32)
x, _ = BayesianGMM.generate(jax.random.PRNGKey(0),
                            GaussParams(mu, lm),
                            jnp.asarray([.3, .4, .3]), 5000)  # odd N
x = x.astype(jnp.float32)
model = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0,
                         kappa=0.05, psi_scale=0.5, dtype=jnp.float32)
mesh = make_mesh()
xs = shard_data(mesh, x)

st_s, v_s = model.fit_vi_fused(xs, key=1, maxiter=10, backend='pallas',
                               mesh=mesh)
st_u, v_u = model.fit_vi_fused(x, key=1, maxiter=10, backend='pallas')
st_x, v_x = model.fit_vi_fused(x, key=1, maxiter=10, backend='xla')
print('vi sharded-pallas vs single-pallas max rel:',
      float(np.max(np.abs((np.asarray(v_s) - np.asarray(v_u))
                          / np.asarray(v_u)))))
print('vi sharded-pallas vs xla        max rel:',
      float(np.max(np.abs((np.asarray(v_s) - np.asarray(v_x))
                          / np.asarray(v_x)))))

gs = model.fit_gibbs_fused(xs, key=2, maxiter=10, backend='pallas',
                           mesh=mesh)
print('gibbs sharded-pallas labels finite/min/max:',
      int(gs.labels.shape[0]), int(gs.labels.min()), int(gs.labels.max()))
print('gibbs log_pi finite:', bool(jnp.all(jnp.isfinite(gs.log_pi))))

# nested mixtures
from mimo_tpu.models.hmix import BayesianMixtureOfMixtures


def blob(c, n):
    return c + 0.5 * rng.standard_normal((n, 2))


xh = np.vstack([blob([-5, -5], 500), blob([-5, -3], 500),
                blob([5, 5], 500), blob([5, 3], 500)])
xh = jnp.asarray(xh[rng.permutation(2000)], jnp.float32)
mh = BayesianMixtureOfMixtures.make_gmm(
    cluster_size=2, mixture_size=3, dim=2, hierarchical=False,
    kappa=0.5, psi_scale=0.5, means=[[-5, -4], [5, 4]], dtype=jnp.float32)
xhs = shard_data(mesh, xh)
vh_s = mh.fit_vi_fused(xhs, key=0, maxiter=8, backend='pallas',
                       mesh=mesh)[1]
vh_u = mh.fit_vi_fused(xh, key=0, maxiter=8, backend='pallas')[1]
print('hmix vi sharded vs single max rel:',
      float(np.max(np.abs((np.asarray(vh_s) - np.asarray(vh_u))
                          / np.asarray(vh_u)))))
gh = mh.fit_gibbs_fused(xhs, key=3, maxiter=8, backend='pallas', mesh=mesh)
print('hmix gibbs sharded labels:', int(gh.labels.shape[0]),
      int(gh.labels.min()), int(gh.labels.max()))
print('OK')
