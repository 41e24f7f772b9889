"""Build the native IO shared library (g++ + system libjpeg/libpng/zlib).

The library is rebuilt lazily whenever ``io_native.cpp`` is newer than the
cached ``_io_native.so`` next to it, so a source edit is picked up on the
next import.  No setuptools/pybind11: the ABI is plain C, bound via ctypes.
"""

from __future__ import annotations

import os
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "io_native.cpp")
LIB = os.path.join(_DIR, "_io_native.so")


def lib_path() -> str:
    return LIB


def is_stale() -> bool:
    if not os.path.exists(LIB):
        return True
    return os.path.getmtime(SRC) > os.path.getmtime(LIB)


def build(verbose: bool = False) -> str:
    """Compile io_native.cpp -> _io_native.so; returns the .so path.

    Compiles to a temp file then renames, so concurrent builders (pytest-xdist
    workers, parallel trainers) never load a half-written library.
    """
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17",
        SRC, "-o", tmp, "-ljpeg", "-lpng", "-lz", "-pthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            raise RuntimeError(
                f"native IO build failed:\n{proc.stderr.strip()}"
            )
        os.replace(tmp, LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    if verbose:
        print(f"built {LIB}")
    return LIB


def ensure_built(verbose: bool = False) -> str:
    if is_stale():
        build(verbose=verbose)
    return LIB


if __name__ == "__main__":
    build(verbose=True)
