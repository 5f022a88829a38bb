"""Test configuration: force a virtual 8-device CPU mesh so sharding tests
run without TPU hardware, and enable x64 so parity oracles are exact.

(The package itself is dtype-polymorphic; production runs are float32 on
TPU. Tests use float64 CPU to separate math bugs from rounding.)
"""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

# Belt and braces: a pytest plugin may have imported jax before this
# conftest ran, in which case the env vars above are too late — but the
# config flags still apply as long as no backend has been initialized.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: the suite is compile-dominated on this
# 4-core box (measured ~4x on warm fit_* runs); first run populates,
# every later run loads. Kept separate from the TPU cache (.jax_cache).
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), '.jax_cache_tests'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(42)
