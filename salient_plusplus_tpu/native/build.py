"""Build the native sampler shared library (lazily, cached by mtime).

Replaces the reference's torch cpp_extension build (fast_sampler/setup.py):
plain g++ -O3 shared object bound via ctypes — no pybind11 dependency.
"""

from __future__ import annotations

import os
import subprocess
import threading

_NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_NATIVE_DIR, "sampler.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libsptpu.so")
_lock = threading.Lock()


def lib_path(rebuild: bool = False) -> str:
    with _lock:
        if (
            rebuild
            or not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            # NOTE: no -march=native — binaries built with it crash when
            # the process has also initialized Pallas/libtpu (observed on
            # GKE: ISA state interaction; plain -O3 is ~equal for this
            # memcpy/branch-bound workload and always safe).
            cmd = [
                "g++", "-O3", "-std=c++17", "-shared",
                "-fPIC", "-o", _LIB, _SRC,
            ]
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _LIB
