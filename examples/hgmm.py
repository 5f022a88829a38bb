"""Hierarchical mixtures: (a) flat GMM with a shared NW hyper-prior and
tied precision (examples/hgauss, examples/hgmm/gibbs_component.py);
(b) two-level mixture of GMMs (examples/hgmm mixture-of-mixtures).
"""

from _common import setup

import jax
import jax.numpy as jnp
import numpy as np


def main():
    args = setup('hierarchical GMMs',
                 nb_models=(int, 8, 'components / inner mixtures'))
    from mimo_tpu.models.gmm import BayesianGMM
    from mimo_tpu.models.hmix import BayesianMixtureOfMixtures
    from mimo_tpu.models.mixture import MFState
    from mimo_tpu.distributions.niw import GaussParams

    key = jax.random.PRNGKey(args.seed)
    true_mu = jnp.array([[-4., 0.], [4., 0.], [0., 5.]], jnp.float32)
    true_lm = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32) * 2.0, (3, 2, 2))
    x, _ = BayesianGMM.generate(key, GaussParams(true_mu, true_lm),
                                jnp.array([.3, .4, .3], jnp.float32), 5000)

    # (a) flat hierarchical GMM: Gibbs then warm VI
    model = BayesianGMM.make(size=args.nb_models, dim=2, gating='dp',
                             hierarchical=True, kappa=0.05, psi_scale=0.5)
    gs = model.fit_gibbs(x, key=args.seed, maxiter=100)
    counts = np.bincount(np.asarray(gs.labels), minlength=args.nb_models)
    print('hier-GMM Gibbs occupancy:', np.sort(counts)[::-1][:5])
    st, vlb = model.fit_vi(x, key=args.seed + 1, maxiter=100,
                           init_state=MFState(gs.components, gs.gating),
                           randomize=False)
    used = np.asarray(model.used_labels(st, (x,)))
    print(f'hier-GMM VI ELBO {float(vlb[-1]):.1f}; means:\n',
          np.asarray(st.components.mus)[used].round(2))

    # (b) two-level mixture of GMMs on two super-clusters
    rng = np.random.default_rng(args.seed)

    def blob(c, n):
        return c + 0.5 * rng.standard_normal((n, 2))

    x2 = np.vstack([blob([-5, -5], 800), blob([-5, -3], 800),
                    blob([5, 5], 800), blob([5, 3], 800)])
    x2 = jnp.asarray(x2[rng.permutation(len(x2))], jnp.float32)
    mm = BayesianMixtureOfMixtures.make_gmm(
        cluster_size=2, mixture_size=3, dim=2, hierarchical=True,
        kappa=0.5, psi_scale=0.5, maxsubiter=5, means=[[-5, -4], [5, 4]])
    st2, _ = mm.fit_vi(x2, key=args.seed, maxiter=50, maxsubiter=3)
    resp = mm.expected_responsibilities(st2, (x2,))
    lab = np.asarray(jnp.argmax(resp, -1))
    left = np.asarray(x2)[:, 0] < 0
    print('mixture-of-GMMs: left-cluster labels',
          np.bincount(lab[left], minlength=2),
          '| right-cluster labels', np.bincount(lab[~left], minlength=2))


if __name__ == '__main__':
    main()
