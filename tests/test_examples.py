"""Smoke tests for the examples suite: every driver must run end-to-end
on CPU (the reference's examples are its de-facto test suite, SURVEY.md
§2.5 — here they get asserted exit codes instead of eyeballed plots).

Each example is a subprocess so its own argparse/config applies; --cpu
keeps them off the TPU tunnel and on the 8-device test topology.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

EXAMPLES = os.path.join(os.path.dirname(__file__), '..', 'examples')

DRIVERS = [
    ('gauss.py', []),
    ('lingauss.py', []),
    ('gmm_toy.py', []),
    ('dpgmm.py', []),
    ('ilr_sine.py', []),
    ('ilr_eval.py', ['--dataset', 'step']),   # one dataset; 'all' is slow
    ('hgmm.py', []),
    ('hilr.py', []),
    ('chains_smc.py', ['--chains', '4']),
    ('ilr_sinc_study.py', ['--seeds', '3', '--svi_iters', '150']),
    ('stream_svi.py', ['--n', '100000']),
]


@pytest.mark.parametrize('script,extra', DRIVERS,
                         ids=[d[0] for d in DRIVERS])
def test_example_runs(script, extra):
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)   # example sets cpu via jax.config
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), '--cpu'] + extra,
        capture_output=True, text=True, timeout=420, env=env)
    assert proc.returncode == 0, (
        f'{script} failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}')
