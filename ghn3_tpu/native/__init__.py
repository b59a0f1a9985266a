"""Native (C++) host-side kernels with automatic build + graceful fallback.

Builds graphfast.cpp into a shared library on first import (g++ -O3) and binds
it via ctypes. If the toolchain is unavailable the callers fall back to the
numpy implementations in graph/shortest_paths.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'graphfast.cpp')
_LIB = os.path.join(_DIR, '_graphfast.so')
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', _SRC, '-o', _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        try:  # some toolchains reject -march=native
            subprocess.run(['g++', '-O3', '-shared', '-fPIC', _SRC, '-o', _LIB],
                           check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.apsp.argtypes = [ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
                                 ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
            lib.add_virtual_edges.argtypes = [ctypes.POINTER(ctypes.c_int32),
                                              ctypes.c_int32, ctypes.c_int32,
                                              ctypes.POINTER(ctypes.c_int32)]
            _lib = lib
        except Exception:
            _failed = True
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def apsp(adj: np.ndarray, cutoff: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(adj, dtype=np.int32)
    n = a.shape[0]
    out = np.zeros((n, n), dtype=np.int32)
    lib.apsp(_ptr(a), n, cutoff, _ptr(out))
    return out


def add_virtual_edges(adj: np.ndarray, cutoff: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(adj, dtype=np.int32).copy()
    n = a.shape[0]
    scratch = np.zeros((n, n), dtype=np.int32)
    lib.add_virtual_edges(_ptr(a), n, cutoff, _ptr(scratch))
    return a
