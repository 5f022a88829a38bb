"""Tests for the native C++ data loader and the out-of-core SVI path."""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HAVE_GXX = shutil.which('g++') is not None
pytestmark = pytest.mark.skipif(not HAVE_GXX, reason='no C++ toolchain')


@pytest.fixture(scope='module')
def dataset(tmp_path_factory, ):
    from mimo_tpu.io.loader import write_bin
    rng = np.random.default_rng(0)
    centers = np.array([[-4., 0.], [4., 0.], [0., 5.]])
    labels = rng.integers(0, 3, 20000)
    x = centers[labels] + rng.standard_normal((20000, 2))
    path = str(tmp_path_factory.mktemp('data') / 'toy.bin')
    write_bin(path, x)
    return path, x.astype(np.float32)


def test_open_and_gather(dataset):
    from mimo_tpu.io.loader import MmapDataset
    path, x = dataset
    ds = MmapDataset(path)
    assert ds.shape == x.shape
    idx = np.array([0, 5, 19999, 123, 5, 0])
    np.testing.assert_array_equal(ds.gather(idx), x[idx])
    np.testing.assert_array_equal(ds.read_block(100, 50), x[100:150])
    # out-of-range indices produce zero rows, not crashes
    got = ds.gather(np.array([-1, 20000]))
    assert (got == 0).all()
    ds.close()


def test_csv_roundtrip(tmp_path, dataset):
    from mimo_tpu.io.loader import MmapDataset, csv_to_bin
    rng = np.random.default_rng(1)
    arr = rng.standard_normal((100, 3)).astype(np.float32)
    csv = tmp_path / 'data.csv'
    np.savetxt(csv, arr, delimiter=',', fmt='%.6f')
    binp = tmp_path / 'data.bin'
    rows = csv_to_bin(str(csv), str(binp))
    assert rows == 100
    ds = MmapDataset(str(binp))
    np.testing.assert_allclose(ds.read_block(0, 100), arr, atol=1e-5)
    ds.close()


def test_streaming_svi(dataset):
    """Out-of-core SVI from the mmap'd file recovers the cluster means."""
    from mimo_tpu.io.loader import MmapDataset
    from mimo_tpu.models.gmm import BayesianGMM
    path, x = dataset
    ds = MmapDataset(path)
    rng = np.random.default_rng(3)
    model = BayesianGMM.make(size=8, dim=2, gating='dp', alpha=1.0,
                             kappa=0.05, psi_scale=0.5, dtype=jnp.float64)

    def next_batch(i):
        return jnp.asarray(ds.sample(rng, 512), jnp.float64)

    state = model.fit_svi_stream(next_batch, total_size=ds.shape[0],
                                 key=0, maxiter=300, step_size=0.5,
                                 batch_size=512)
    used = np.asarray(model.used_labels(state, (jnp.asarray(x, jnp.float64),)))
    est = np.asarray(state.components.mu)[used]
    for t in np.array([[-4., 0.], [4., 0.], [0., 5.]]):
        assert np.min(np.linalg.norm(est - t, axis=-1)) < 0.4
    ds.close()
