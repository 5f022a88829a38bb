"""Metrics / observability: host-side JSONL logging, sweep timing, and a
jax.profiler hook.

The reference's only observability is tqdm progress bars and returned
Python lists of ELBO values (SURVEY.md §5). Here every fit already returns
metric traces as arrays; this module adds durable logging and profiling.
"""

import json
import time
from contextlib import contextmanager


class MetricsLogger:
    """Append-only JSONL metrics log."""

    def __init__(self, path):
        self.path = path
        self._t0 = time.time()

    def log(self, step=None, **metrics):
        rec = {'t': round(time.time() - self._t0, 4)}
        if step is not None:
            rec['step'] = int(step)
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        with open(self.path, 'a') as f:
            f.write(json.dumps(rec) + '\n')
        return rec

    def log_trace(self, name, trace, every=1):
        import numpy as np
        arr = np.asarray(trace)
        for i in range(0, arr.shape[0], every):
            self.log(step=i, **{name: arr[i]})


@contextmanager
def timed(label, logger=None):
    """Wall-clock a block; logs/prints '<label>: <dt>s'."""
    t0 = time.time()
    yield
    dt = time.time() - t0
    if logger is not None:
        logger.log(**{f'{label}_seconds': dt})
    else:
        print(f'{label}: {dt:.3f}s')


@contextmanager
def profile(logdir='/tmp/mimo_tpu_profile'):
    """jax.profiler trace around a block (view with TensorBoard/xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
