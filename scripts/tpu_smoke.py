import sys; sys.path.insert(0, "/root/repo")
import os, jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp, numpy as np, time
print('backend:', jax.default_backend(), flush=True)
from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.models.ilr import BayesianILR
from mimo_tpu.distributions.niw import GaussParams
from mimo_tpu.parallel.chains import fit_chains
mu = jnp.asarray([[-3., 0.], [3., 0.], [0., 4.]], jnp.float32)
lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2)).astype(jnp.float32)
x, _ = BayesianGMM.generate(jax.random.PRNGKey(0), GaussParams(mu, lm),
                            jnp.asarray([.3, .4, .3]), 50000)
x = x.astype(jnp.float32)
m = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0, kappa=0.05,
                     psi_scale=0.5, dtype=jnp.float32)
t0=time.time()
st, v = m.fit_vi_fused(x, key=1, maxiter=10)            # auto -> pallas
print('pallas vi done', time.time()-t0, flush=True)
vx = m.fit_vi_fused(x, key=1, maxiter=10, backend='xla')[1]
print('TPU single pallas vs xla max rel:',
      float(np.max(np.abs((np.asarray(v)-np.asarray(vx))/np.asarray(vx)))), flush=True)
gs = m.fit_gibbs_fused(x, key=2, maxiter=10)
print('TPU gibbs labels ok:', int(gs.labels.shape[0]), bool(jnp.all(jnp.isfinite(gs.log_pi))), flush=True)
rng = np.random.default_rng(0)
xs = jnp.asarray(rng.uniform(-3, 3, (20000, 1)), jnp.float32)
ys = jnp.asarray(np.sin(np.asarray(xs)) + 0.1*rng.standard_normal((20000,1)), jnp.float32)
ilr = BayesianILR.make(size=8, input_dim=1, output_dim=1, alpha=2.0, kappa=0.05, dtype=jnp.float32)
ilr.init_transform(xs, ys)
vi = ilr.fit_vi_fused((xs, ys), key=1, maxiter=15)[1]
vix = ilr.fit_vi_fused((xs, ys), key=1, maxiter=15, backend='xla')[1]
print('TPU ILR pallas vs xla max rel:',
      float(np.max(np.abs((np.asarray(vi)-np.asarray(vix))/np.asarray(vix)))), flush=True)
keys = jax.random.split(jax.random.PRNGKey(1), 4)
t0=time.time()
sts, vlbs = fit_chains(m, 'fit_vi_fused', x, keys, maxiter=10)
print('TPU vmap pallas chains final:', np.asarray(vlbs)[:, -1], 'compile+run', time.time()-t0, flush=True)
gss = fit_chains(m, 'fit_gibbs_fused', x, keys, maxiter=5)
print('TPU vmap pallas gibbs labels:', np.asarray(gss.labels).shape, flush=True)
print('OK', flush=True)
