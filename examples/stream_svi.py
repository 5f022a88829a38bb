"""Out-of-core stochastic VI: a DP-GMM trained from a binary file streamed
by the native C loader, never holding the full dataset in device memory.

No reference counterpart (hanyas/mimo holds all N in RAM); this is the
framework's scaling path for N larger than HBM. The recipe:

  1. write/convert the dataset to the 16-byte-header binary format
     (io.write_bin / io.csv_to_bin),
  2. MmapDataset streams shuffled minibatches on host threads,
  3. fit_svi_stream runs one jitted natural-gradient step per batch
     (Robbins-Monro decaying step via --forgetting).
"""

import os
import tempfile

import numpy as np

from _common import setup, maybe_save_plot

args = setup('Out-of-core SVI DP-GMM via the native loader',
             n=(int, 200_000, 'dataset size'),
             batch=(int, 4096, 'minibatch size'),
             steps=(int, 400, 'SVI steps'),
             step_size=(float, 0.7, 'initial step size'),
             forgetting=(float, 0.6, 'Robbins-Monro exponent (0 = fixed)'))

import jax
import jax.numpy as jnp

from mimo_tpu.models.gmm import BayesianGMM
from mimo_tpu.distributions.niw import GaussParams
from mimo_tpu.io import MmapDataset, write_bin

# --- generate a 4-component GMM dataset and write it as a binary file
key = jax.random.PRNGKey(args.seed)
true_mu = jnp.array([[-5., 0.], [5., 0.], [0., 5.], [0., -5.]])
true_lm = jnp.broadcast_to(jnp.eye(2) * 1.5, (4, 2, 2))
x, _ = BayesianGMM.generate(key, GaussParams(true_mu, true_lm),
                            jnp.array([.25, .25, .25, .25]), args.n)
path = os.path.join(tempfile.gettempdir(), f'stream_svi_{os.getpid()}.bin')
write_bin(path, np.asarray(x, np.float32))

try:
    ds = MmapDataset(path)
    print(f'dataset: {ds.shape[0]} rows x {ds.shape[1]} cols '
          f'({os.path.getsize(path) / 1e6:.1f} MB on disk)')

    model = BayesianGMM.make(size=16, dim=2, gating='dp', alpha=1.0,
                             kappa=0.05, psi_scale=0.5)
    rng = np.random.default_rng(args.seed)
    # break the symmetric fixed point: Gibbs-init on one in-memory probe
    # subset (label sampling breaks symmetry where flat-random VI cannot —
    # the flagship recipe's init, evaluate_sine.py:131-135), then stream
    # the full dataset through SVI
    from mimo_tpu.models.mixture import MFState
    init_batch = jnp.asarray(ds.sample(rng, min(16384, ds.shape[0])))
    g = model.fit_gibbs(init_batch, key=args.seed, maxiter=20,
                        init_labels='random')
    init_state = MFState(g.components, g.gating)
    # feed HOST arrays: the stream stacks `group` batches per device
    # call, so per-batch device puts would just round-trip through host
    state = model.fit_svi_stream(
        lambda i: ds.sample(rng, args.batch),
        total_size=ds.shape[0], key=args.seed, maxiter=args.steps,
        step_size=args.step_size, batch_size=args.batch,
        init_state=init_state, forgetting=args.forgetting or None)

    # evaluate on an in-memory probe subset
    probe = jnp.asarray(ds.sample(rng, 8192))
    used = model.used_labels(state, (probe,))
    resp = model.expected_responsibilities(state, (probe,))
    elbo = float(model.elbo(state, (probe,), resp))
    mu = np.asarray(state.components.mu)
    err = max(float(np.min(np.linalg.norm(mu - t, axis=-1)))
              for t in np.asarray(true_mu))
    print(f'probe ELBO {elbo:.4g} | used components {int(used.sum())} | '
          f'max mean-recovery error {err:.3f}')
    assert np.isfinite(elbo) and err < 0.5, 'streaming SVI failed to recover'

    # --- round 5: out-of-core FULL-DATA VI — each sweep is one pass over
    # the on-disk file through the fused E-step (exact vs in-memory); use
    # the SVI result as the warm start and polish with full-data sweeps
    bb = max(4096, ds.shape[0] // 8)
    nb = ds.shape[0] // bb
    state2, elbo_tr = model.fit_vi_stream_full(
        lambda i: ds.read_block(i * bb, bb), nb, init_state=state,
        maxiter=10)
    mu2 = np.asarray(state2.components.mu)
    err2 = max(float(np.min(np.linalg.norm(mu2 - t, axis=-1)))
               for t in np.asarray(true_mu))
    print(f'full-data streamed VI polish: ELBO {elbo_tr[-1]:.6g} '
          f'(rising: {bool(elbo_tr[1] < elbo_tr[-1])}) | max recovery '
          f'error {err2:.3f}')
    assert np.isfinite(elbo_tr).all() and err2 < 0.5
    print('OK')

    if args.plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from mimo_tpu.utils.plot import plot_mixture
        w = np.asarray(state.gating.mean())
        plot_mixture(np.asarray(probe), model.family.mean_params(
            state.components), w)
        maybe_save_plot(args, 'stream_svi')
finally:
    ds.close()
    os.unlink(path)
