"""Build hook: compile the native data loader (native/loader.cc) as a
ctypes-loaded shared object installed next to mimo_tpu.io.

The loader is plain C with no Python API (io/loader.py binds it via
ctypes), so the Extension below only borrows setuptools' compiler
plumbing; `io/loader.py:_load` also falls back to building via
`make -C native` in source checkouts, so installing without a C++
toolchain still works for everything except out-of-core streaming.
"""

from setuptools import setup
from setuptools.command.build_ext import build_ext
from setuptools.extension import Extension


class OptionalBuildExt(build_ext):
    """Don't fail the whole install when no C++ toolchain is present —
    the native loader is an optional acceleration (io/loader.py degrades
    with a clear error only when actually used)."""

    def run(self):
        try:
            super().run()
        except Exception as exc:          # pragma: no cover
            print(f'WARNING: skipping native loader build ({exc})')

    def build_extension(self, ext):
        try:
            super().build_extension(ext)
        except Exception as exc:          # pragma: no cover
            print(f'WARNING: skipping native loader build ({exc})')


setup(
    ext_modules=[
        Extension(
            'mimo_tpu.io._libmimo_loader',
            sources=['native/loader.cc'],
            extra_compile_args=['-O3', '-std=c++17', '-pthread'],
            extra_link_args=['-pthread'],
            py_limited_api=False,
        )
    ],
    cmdclass={'build_ext': OptionalBuildExt},
)
