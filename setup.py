"""Wheel build: compile the native host runtime as a bundled extension.

The lazy in-tree g++ build (entreepy_tpu/runtime/__init__.py) exists for
source checkouts; wheels built here ship a portable binary instead
(-O3 -mtune=generic, NO -march=native), so `pip install` lands a working
fast path on machines without a compiler. Counterpart of the reference's 4
per-target ReleaseFast binaries (build.zig:14-23, release.yml:32-50).

The module is built as a plain shared library (ctypes, C linkage) — it only
borrows setuptools' Extension machinery for compilation and wheel tagging.
"""

from setuptools import setup
from setuptools.command.build_ext import build_ext
from setuptools.extension import Extension


class ctypes_build_ext(build_ext):
    """Skip the CPython-extension import check: the library exports plain C
    symbols for ctypes, not a PyInit_* entry point."""

    def get_export_symbols(self, ext):
        return ext.export_symbols

    def get_ext_filename(self, ext_name):
        # fixed, interpreter-independent name next to native.cpp
        return ext_name.replace(".", "/") + ".so"


setup(
    ext_modules=[
        Extension(
            "entreepy_tpu.runtime._native_ext",
            sources=["entreepy_tpu/runtime/native.cpp"],
            language="c++",
            extra_compile_args=["-O3", "-mtune=generic", "-std=c++17", "-pthread"],
            extra_link_args=["-pthread"],
        )
    ],
    cmdclass={"build_ext": ctypes_build_ext},
)
