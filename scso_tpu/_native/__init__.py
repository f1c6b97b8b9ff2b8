"""Native (C++) runtime tier: host-side data generation.

Compiles `datagen.cpp` on first use (g++ -O3 -march=native -fopenmp)
into a cached shared library and binds it via ctypes — no pybind11
dependency. Every entry point has a numpy fallback, so the package works
without a toolchain; `available()` reports whether the native path
loaded.

The reference has no native code (SURVEY.md §2); this tier exists for
the framework's own scale (filling the 2 GiB bench matrix takes ~17 s in
numpy, well under a second here).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "datagen.cpp"
_LIB = _DIR / "_libdatagen.so"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SCSO_NO_NATIVE"):
            return None
        try:
            if (not _LIB.exists()
                    or _LIB.stat().st_mtime < _SRC.stat().st_mtime):
                if not _build():
                    return None
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            return None
        i64, f32p, dbl = (ctypes.c_int64,
                          np.ctypeslib.ndpointer(np.float32,
                                                 flags="C_CONTIGUOUS"),
                          ctypes.c_double)
        lib.fill_sparse_logreg.argtypes = [f32p, f32p, f32p, f32p, i64,
                                           i64, dbl, i64, i64,
                                           ctypes.c_int]
        lib.fill_sparse_logreg.restype = ctypes.c_int
        lib.fill_randn.argtypes = [f32p, i64, i64, i64]
        lib.fill_randn.restype = ctypes.c_int
        lib.omp_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def sparse_logreg(m: int, n: int, density: float, n_active: int,
                  seed: int, label01: bool):
    """Native sparse logistic data; returns (A, y, x0, x_true) or None."""
    lib = _load()
    if lib is None:
        return None
    A = np.empty((m, n), np.float32)
    y = np.empty((m,), np.float32)
    x0 = np.empty((n,), np.float32)
    x_true = np.empty((n,), np.float32)
    rc = lib.fill_sparse_logreg(A, y, x0, x_true, m, n, float(density),
                                int(n_active), int(seed), int(label01))
    if rc != 0:
        return None
    return A, y, x0, x_true


def randn(m: int, n: int, seed: int):
    """Native (m, n) standard-normal matrix, or None."""
    lib = _load()
    if lib is None:
        return None
    A = np.empty((m, n), np.float32)
    if lib.fill_randn(A, m, n, int(seed)) != 0:
        return None
    return A
