"""ctypes bindings for the native host ops (KD-tree, grid subsample).

The shared library is built on first use with g++ (cached next to the
source); callers fall back to scipy/numpy when no compiler is available.
"""

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "nanoknn.cpp"
_LIB = _HERE / "libnanoknn.so"
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        str(_SRC), "-o", str(_LIB)
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library, or None on failure."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not _LIB.exists() or \
                    _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                _build()
            lib = ctypes.CDLL(str(_LIB))
            lib.kdtree_build.restype = ctypes.c_void_p
            lib.kdtree_build.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64
            ]
            lib.kdtree_free.argtypes = [ctypes.c_void_p]
            lib.kdtree_knn.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float)
            ]
            lib.kdtree_radius.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_float, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)
            ]
            lib.grid_subsample.restype = ctypes.c_int64
            lib.grid_subsample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32)
            ]
            _lib = lib
        except Exception as e:  # pragma: no cover - env without g++
            log.warning(f"native lib unavailable ({e}); using numpy paths")
            _build_failed = True
        return _lib


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeKDTree:
    """KD-tree over [N,3] float32 points with knn/radius queries.

    Drop-in for the data-pipeline uses of scipy cKDTree (query / padded
    query_radius); raises if the native library is unavailable — callers
    should check ``native_available()`` first.
    """

    def __init__(self, points):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._points = np.ascontiguousarray(points, np.float32)
        self.n = self._points.shape[0]
        self._handle = lib.kdtree_build(_fptr(self._points),
                                        ctypes.c_int64(self.n))

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.kdtree_free(self._handle)
        except Exception:
            pass

    def query(self, queries, k=1):
        """Returns (dist [Q,k], idx [Q,k]) like scipy cKDTree.query."""
        q = np.ascontiguousarray(queries, np.float32).reshape(-1, 3)
        nq = q.shape[0]
        out_i = np.empty((nq, k), np.int32)
        out_d = np.empty((nq, k), np.float32)
        self._lib.kdtree_knn(self._handle, _fptr(q), ctypes.c_int64(nq),
                             ctypes.c_int32(k), _iptr(out_i), _fptr(out_d))
        return np.sqrt(out_d), out_i

    def query_radius(self, queries, r, cap=4096):
        """Per-query neighbor index lists (python list of arrays)."""
        out_i, out_c = self.query_radius_padded(queries, r, cap)
        return [out_i[i, :min(out_c[i], cap)] for i in range(len(out_c))]

    def query_radius_padded(self, queries, r, cap=4096, fill=None):
        """Padded radius query, no per-query Python loop.

        Returns (idx [Q, cap] int32, counts [Q] int32); entries beyond a
        query's count hold ``fill`` (default: n, the sentinel row).
        """
        q = np.ascontiguousarray(queries, np.float32).reshape(-1, 3)
        nq = q.shape[0]
        out_i = np.zeros((nq, cap), np.int32)
        out_c = np.zeros((nq,), np.int32)
        self._lib.kdtree_radius(self._handle, _fptr(q), ctypes.c_int64(nq),
                                ctypes.c_float(r), ctypes.c_int32(cap),
                                _iptr(out_i), _iptr(out_c))
        sentinel = self.n if fill is None else fill
        pad = np.arange(cap, dtype=np.int32)[None, :] >= out_c[:, None]
        out_i[pad] = sentinel
        return out_i, out_c


def native_available():
    return get_lib() is not None


def grid_subsample_native(points, features=None, labels=None, grid_size=0.1):
    """Native barycenter grid subsampling; same contract as
    ops.subsample.grid_subsampling. Returns None if lib unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    n = pts.shape[0]
    fdim = 0
    fptr = None
    out_f = None
    if features is not None:
        feats = np.ascontiguousarray(features, np.float32)
        fdim = feats.shape[1]
        fptr = _fptr(feats)
        out_f = np.empty((n, fdim), np.float32)
    lptr = None
    out_l = None
    if labels is not None:
        labs = np.ascontiguousarray(labels, np.int32).reshape(-1)
        lptr = _iptr(labs)
        out_l = np.empty((n,), np.int32)
    out_p = np.empty((n, 3), np.float32)
    nv = lib.grid_subsample(
        _fptr(pts), ctypes.c_int64(n), fptr, ctypes.c_int32(fdim), lptr,
        ctypes.c_float(grid_size), _fptr(out_p),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        if out_f is not None else None,
        _iptr(out_l) if out_l is not None else None)
    out = [out_p[:nv].copy()]
    if features is not None:
        out.append(out_f[:nv].copy())
    if labels is not None:
        out.append(out_l[:nv].copy())
    return out[0] if len(out) == 1 else tuple(out)
