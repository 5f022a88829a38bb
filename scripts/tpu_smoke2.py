import sys
sys.path.insert(0, '/root/repo')
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import time

import jax.numpy as jnp
import numpy as np

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.distributions.niw import GaussParams
from mimo_tpu.parallel.chains import fit_chains

mu = jnp.asarray([[-3., 0.], [3., 0.], [0., 4.]], jnp.float32)
lm = jnp.broadcast_to(jnp.eye(2) * 2.0, (3, 2, 2)).astype(jnp.float32)
x, _ = BayesianGMM.generate(jax.random.PRNGKey(0), GaussParams(mu, lm),
                            jnp.asarray([.3, .4, .3]), 50000)
x = x.astype(jnp.float32)
m = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0, kappa=0.05,
                     psi_scale=0.5, dtype=jnp.float32)
# single-chip gibbs first (new two-ref SMEM signature)
gs = m.fit_gibbs_fused(x, key=2, maxiter=10)
print('single gibbs ok:', bool(jnp.all(jnp.isfinite(gs.log_pi))),
      flush=True)
keys = jax.random.split(jax.random.PRNGKey(1), 4)
t0 = time.time()
gss = fit_chains(m, 'fit_gibbs_fused', x, keys, maxiter=5)
lab = np.asarray(gss.labels)
print('vmap pallas gibbs labels:', lab.shape, 'distinct chains:',
      len({tuple(lab[i, :50]) for i in range(4)}),
      'in', round(time.time() - t0, 1), 's', flush=True)
print('OK', flush=True)
