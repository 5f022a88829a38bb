"""Checkpoint / resume: all inference state is a pytree of arrays, so
checkpointing is a single orbax save/restore.

The reference has no checkpointing (SURVEY.md §5) — its closest analogues
are deepcopy snapshots for best-of-N selection (svi_gmm.py:64-67) and the
prior<-posterior re-anchoring (evaluate_sine.py:153-155), both of which are
plain pytree operations here. This module adds durable on-disk state so
multi-host sweeps can resume after preemption.
"""

import os

import jax
import numpy as np


def save_state(path, state):
    """Save any pytree of arrays (MFState, GibbsState, priors, ...)."""
    try:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path), state, force=True)
        return path
    except Exception:
        # fallback: flat npz (single-host only)
        leaves, treedef = jax.tree.flatten(state)
        np.savez(path if path.endswith('.npz') else path + '.npz',
                 *[np.asarray(l) for l in leaves])
        return path


def load_state(path, like):
    """Restore a pytree saved by `save_state`; `like` provides structure
    (and shapes/dtypes for orbax)."""
    try:
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as ckptr:
            target = jax.tree.map(ocp.utils.to_shape_dtype_struct, like) \
                if hasattr(ocp.utils, 'to_shape_dtype_struct') else like
            return ckptr.restore(os.path.abspath(path), target)
    except Exception:
        npz = np.load(path if path.endswith('.npz') else path + '.npz')
        leaves = [npz[k] for k in npz.files]
        treedef = jax.tree.structure(like)
        return jax.tree.unflatten(treedef, leaves)
