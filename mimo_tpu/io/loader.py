"""ctypes binding for the native data loader (native/loader.cc).

`MmapDataset` serves minibatches from a memory-mapped float32 matrix file
with multithreaded row gather — the out-of-core data path for stochastic
VI on datasets beyond host RAM / device HBM. Build the library once with
`make -C native` (done automatically on first use if g++ is available).

Without a C++ toolchain the module degrades gracefully to a pure-NumPy
np.memmap backend (same 16-byte {int64 rows, int64 cols} + float32
row-major format, same API; single-threaded gather — measured ~2-3x
slower ingest than the threaded native path, which only matters when
fit_svi_stream is IO-bound). Set MIMO_TPU_LOADER=numpy to force it.
"""

import ctypes
import glob
import os
import subprocess
import warnings

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libmimo_loader.so')
_lib = None


def _find_lib():
    """Locate the shared object: explicit env override, then the wheel-
    installed extension (setup.py builds native/loader.cc into
    mimo_tpu/io/_libmimo_loader*.so), then the source-tree build
    (native/libmimo_loader.so, compiled on demand via make)."""
    env = os.environ.get('MIMO_TPU_LOADER')
    if env:
        return env
    here = os.path.dirname(__file__)
    hits = glob.glob(os.path.join(here, '_libmimo_loader*.so'))
    if hits:
        return hits[0]
    if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
        subprocess.run(['make', '-C', _NATIVE_DIR], check=True,
                       capture_output=True)
    if os.path.exists(_LIB_PATH):
        return _LIB_PATH
    raise OSError(
        'native loader not found: set MIMO_TPU_LOADER, reinstall with a '
        'C++ toolchain, or run `make -C native` in a source checkout')


def _load():
    global _lib
    if _lib is False:
        raise OSError('native loader unavailable (cached from a prior '
                      'failed probe)')
    if _lib is not None:
        return _lib
    if os.environ.get('MIMO_TPU_LOADER') == 'numpy':
        raise OSError('MIMO_TPU_LOADER=numpy forces the NumPy backend')
    lib = ctypes.CDLL(_find_lib())
    lib.mimo_open.restype = ctypes.c_void_p
    lib.mimo_open.argtypes = [ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_int64),
                              ctypes.POINTER(ctypes.c_int64)]
    lib.mimo_close.argtypes = [ctypes.c_void_p]
    lib.mimo_gather.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int64),
                                ctypes.c_int64,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int]
    lib.mimo_read_block.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_int64,
                                    ctypes.POINTER(ctypes.c_float)]
    lib.mimo_csv_to_bin.restype = ctypes.c_int64
    lib.mimo_csv_to_bin.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.mimo_write_bin.restype = ctypes.c_int64
    lib.mimo_write_bin.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int64, ctypes.c_int64]
    _lib = lib
    return lib


def _native_or_none():
    """The native library, or None (with a one-time warning) when no
    toolchain/prebuilt .so is available — callers fall back to NumPy.
    The first failure is cached (_lib = False) so later calls skip the
    `make -C native` re-probe instead of re-spawning a doomed build."""
    global _warned, _lib
    try:
        return _load()
    except (OSError, subprocess.CalledProcessError):
        # Don't cache the env-forced case: unsetting MIMO_TPU_LOADER=numpy
        # should re-enable the native probe within the same process.
        if _lib is None and os.environ.get('MIMO_TPU_LOADER') != 'numpy':
            _lib = False
        if not globals().get('_warned'):
            warnings.warn(
                'mimo_tpu.io: native loader unavailable (no C++ toolchain '
                'or prebuilt extension); using the pure-NumPy mmap backend '
                '(same format/API, single-threaded gather)', RuntimeWarning)
            _warned = True
        return None


def write_bin(path, array):
    """Write a float32 (N, d) array in the loader's binary format."""
    arr = np.ascontiguousarray(np.asarray(array, np.float32))
    if arr.ndim != 2:
        raise ValueError(
            f'write_bin needs a 2-D (N, d) array, got ndim={arr.ndim} — '
            f'reshape 1-D data to (N, 1) first')
    lib = _native_or_none()
    if lib is None:
        with open(path, 'wb') as f:
            np.asarray(arr.shape, np.int64).tofile(f)
            arr.tofile(f)
        return path
    rows = lib.mimo_write_bin(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr.shape[0], arr.shape[1])
    if rows != arr.shape[0]:
        raise IOError(f'failed to write {path}')
    return path


def csv_to_bin(csv_path, bin_path):
    """Convert a headerless numeric CSV (e.g. the reference's ilr/cmb.csv)
    to the binary format. Returns the row count."""
    lib = _native_or_none()
    if lib is None:
        arr = np.loadtxt(csv_path, delimiter=',', dtype=np.float32,
                         ndmin=2)
        write_bin(bin_path, arr)
        return int(arr.shape[0])
    rows = lib.mimo_csv_to_bin(csv_path.encode(), bin_path.encode())
    if rows < 0:
        raise IOError(f'failed to parse {csv_path}')
    return int(rows)


class MmapDataset:
    """Memory-mapped float32 matrix with O(1) open and threaded gather
    (native), or np.memmap single-threaded gather (fallback)."""

    def __init__(self, path, n_threads=8):
        self._lib = _native_or_none()
        self._h = None
        self._mm = None
        if self._lib is None:
            hdr = np.fromfile(path, dtype=np.int64, count=2)
            if hdr.size != 2 or hdr[0] <= 0 or hdr[1] <= 0:
                raise IOError(f'cannot open dataset {path}')
            rows_v, cols_v = int(hdr[0]), int(hdr[1])
            payload = os.path.getsize(path) - 16
            if payload < 4 * rows_v * cols_v:
                raise IOError(f'cannot open dataset {path}: truncated')
            self._mm = np.memmap(path, dtype=np.float32, mode='r',
                                 offset=16, shape=(rows_v, cols_v))
            self.shape = (rows_v, cols_v)
        else:
            rows = ctypes.c_int64()
            cols = ctypes.c_int64()
            self._h = self._lib.mimo_open(path.encode(), ctypes.byref(rows),
                                          ctypes.byref(cols))
            if not self._h:
                raise IOError(f'cannot open dataset {path}')
            self.shape = (rows.value, cols.value)
        self.n_threads = n_threads

    def gather(self, indices):
        """Rows by index -> float32 (len(indices), d)."""
        idx = np.ascontiguousarray(np.asarray(indices, np.int64))
        if self._mm is not None:
            if idx.size and (idx.min() < 0 or idx.max() >= self.shape[0]):
                raise IndexError('gather index out of range')
            return np.asarray(self._mm[idx], np.float32)
        out = np.empty((idx.shape[0], self.shape[1]), np.float32)
        self._lib.mimo_gather(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx.shape[0], out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads)
        return out

    def read_block(self, start, count):
        if not 0 <= start < self.shape[0]:
            raise IndexError(
                f'start={start} out of range for {self.shape[0]} rows')
        if count <= 0:
            raise ValueError(f'count={count} must be positive')
        count = min(count, self.shape[0] - start)
        if self._mm is not None:
            return np.array(self._mm[start:start + count], np.float32)
        out = np.empty((count, self.shape[1]), np.float32)
        self._lib.mimo_read_block(
            self._h, start, count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def sample(self, rng, batch_size):
        """One uniform minibatch (reference `batches` semantics)."""
        idx = rng.choice(self.shape[0], size=batch_size, replace=False)
        return self.gather(idx)

    def minibatches(self, rng, batch_size, steps):
        for _ in range(steps):
            yield self.sample(rng, batch_size)

    def close(self):
        if self._h:
            self._lib.mimo_close(self._h)
            self._h = None
        self._mm = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
