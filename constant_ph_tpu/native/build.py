"""Lazy compilation + ctypes loading of the native components."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}

_SOURCES = {
    "topology": "topology.cpp",
    "lammps_data": "lammps_data.cpp",
}


def load_library(name: str):
    """Compile (once, cached as .so next to the source) and dlopen.

    Returns the ctypes CDLL, or None if no C++ toolchain is available —
    callers fall back to pure Python.
    """
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        src = os.path.join(_DIR, _SOURCES[name])
        so = os.path.join(_DIR, f"_{name}.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     "-o", so, src],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError, FileNotFoundError):
            lib = None
        _LIBS[name] = lib
        return lib
