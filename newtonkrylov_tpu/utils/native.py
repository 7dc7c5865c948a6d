"""ctypes loader for the native host kernels (csrc/libnkilu.so).

Builds on demand with ``make -C csrc`` if the shared library is missing and a
compiler is available; callers fall back to NumPy implementations otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB = os.path.join(_CSRC, "libnkilu.so")

_cached = None
_cache_valid = False


class NativeILU:
    def __init__(self, lib: ctypes.CDLL):
        self._lib = lib
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.nk_ilu0_factorize.restype = ctypes.c_int64
        lib.nk_ilu0_factorize.argtypes = [ctypes.c_int64, i64p, i64p, f64p, i64p]
        lib.nk_ilu0_solve.restype = None
        lib.nk_ilu0_solve.argtypes = [ctypes.c_int64, i64p, i64p, f64p, i64p, f64p, f64p]

    @staticmethod
    def _p(a, ty):
        return a.ctypes.data_as(ctypes.POINTER(ty))

    def factorize(self, indptr, cols, vals):
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        cols = np.ascontiguousarray(cols, dtype=np.int64)
        vals = np.ascontiguousarray(vals, dtype=np.float64).copy()
        n = len(indptr) - 1
        diag = np.zeros(n, dtype=np.int64)
        rc = self._lib.nk_ilu0_factorize(
            n, self._p(indptr, ctypes.c_int64), self._p(cols, ctypes.c_int64),
            self._p(vals, ctypes.c_double), self._p(diag, ctypes.c_int64),
        )
        if rc != 0:
            raise ZeroDivisionError(f"ILU(0): zero pivot or missing diagonal at row {rc - 1}")
        return vals, diag

    def solve(self, indptr, cols, vals, diag, b):
        indptr = np.ascontiguousarray(indptr, dtype=np.int64)
        cols = np.ascontiguousarray(cols, dtype=np.int64)
        vals = np.ascontiguousarray(vals, dtype=np.float64)
        diag = np.ascontiguousarray(diag, dtype=np.int64)
        b = np.ascontiguousarray(b, dtype=np.float64)
        x = np.zeros_like(b)
        self._lib.nk_ilu0_solve(
            len(indptr) - 1, self._p(indptr, ctypes.c_int64),
            self._p(cols, ctypes.c_int64), self._p(vals, ctypes.c_double),
            self._p(diag, ctypes.c_int64), self._p(b, ctypes.c_double),
            self._p(x, ctypes.c_double),
        )
        return x


def load_ilu() -> Optional[NativeILU]:
    """Load (building if needed) the native ILU library; None on failure."""
    global _cached, _cache_valid
    if _cache_valid:
        return _cached
    _cache_valid = True
    if not os.path.exists(_LIB):
        try:
            subprocess.run(
                ["make", "-C", _CSRC], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            _cached = None
            return None
    try:
        _cached = NativeILU(ctypes.CDLL(_LIB))
    except OSError:
        _cached = None
    return _cached
