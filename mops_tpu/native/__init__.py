"""ctypes loader for the native host-ops library (auto-compiled with g++).

Replaces the reference's C++ KD-tree host components (nanoflann,
reference src/Utils/KDTree.h) with a bucket-grid exact 1-NN.  Falls back to
the scipy path when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "host_ops.cpp")
_LIB = os.path.join(_HERE, "libmops_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _compile() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True)
            return True
        except Exception:
            return False


def load() -> Optional[ctypes.CDLL]:
    """Load (compiling on first use) the native library, or None."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            if not _compile():
                _failed = True
                return None
        lib = ctypes.CDLL(_LIB)
        lib.mops_grid_build.restype = ctypes.c_void_p
        lib.mops_grid_build.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int]
        lib.mops_grid_free.argtypes = [ctypes.c_void_p]
        lib.mops_grid_query.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
        lib.mops_grid_candidates.restype = ctypes.c_int32
        lib.mops_grid_candidates.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


class NativeCellSearch:
    """Exact 1-NN over cell centers via the native bucket grid."""

    def __init__(self, cell_xyz: np.ndarray, n_lat: int = 0, n_lon: int = 0):
        lib = load()
        if lib is None:
            raise RuntimeError("native host_ops unavailable")
        self._lib = lib
        xyz = np.ascontiguousarray(cell_xyz, dtype=np.float64)
        n = xyz.shape[0]
        if n_lat <= 0:
            # aim for O(10) cells per bucket
            n_lat = max(4, int(np.sqrt(n / 20)))
            n_lon = 2 * n_lat
        self.n_lat, self.n_lon = n_lat, n_lon
        self._xyz_ref = xyz   # keep alive (library copies, but be safe)
        self._handle = lib.mops_grid_build(
            xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            n_lat, n_lon)

    def query(self, points: np.ndarray) -> np.ndarray:
        pts = np.ascontiguousarray(points, dtype=np.float64).reshape(-1, 3)
        out = np.empty(pts.shape[0], dtype=np.int32)
        self._lib.mops_grid_query(
            self._handle,
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            pts.shape[0], out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def candidate_table(self, depth: int = 0) -> np.ndarray:
        """(n_lat*n_lon, depth) candidate table for the on-device search."""
        need = self._lib.mops_grid_candidates(self._handle, 0, None)
        depth = max(depth, int(need))
        table = np.empty((self.n_lat * self.n_lon, depth), dtype=np.int32)
        self._lib.mops_grid_candidates(
            self._handle, depth,
            table.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return table

    def __del__(self):
        try:
            self._lib.mops_grid_free(self._handle)
        except Exception:
            pass
