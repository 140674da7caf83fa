"""ctypes bindings to the native host geometry library (csrc/).

The library is built on first use with g++ (no pybind11 in this image;
a C ABI + ctypes keeps the binding dependency-free). If the toolchain
is unavailable, callers fall back to the numpy/scipy implementations —
the native path only accelerates host-side data prep, never the device
compute path.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_logger = logging.getLogger(__name__)
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_ROOT, "csrc", "geometry.cpp")
_LIB_PATH = os.path.join(_ROOT, "csrc", "libfggeometry.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _LIB_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001
        _logger.warning("native build failed (%s); using numpy fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)):
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.fg_grid_subsample.argtypes = [f32p, ctypes.c_int, ctypes.c_float, f32p]
        lib.fg_grid_subsample.restype = ctypes.c_int
        lib.fg_radius_neighbors.argtypes = [f32p, ctypes.c_int, f32p,
                                            ctypes.c_int, ctypes.c_float,
                                            ctypes.c_int, i32p]
        lib.fg_radius_neighbors.restype = None
        lib.fg_nearest_within_radius.argtypes = [f32p, ctypes.c_int, f32p,
                                                 ctypes.c_int, ctypes.c_float,
                                                 i32p]
        lib.fg_nearest_within_radius.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def grid_subsample(points: np.ndarray, cell: float) -> np.ndarray:
    """Barycenter voxel subsample, (n,3) -> (m,3) float32."""
    lib = get_lib()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        # numpy fallback (same semantics)
        origin = np.floor(pts.min(0) / cell) * cell
        ijk = np.floor((pts - origin) / cell).astype(np.int64)
        order = np.lexsort((ijk[:, 0], ijk[:, 1], ijk[:, 2]))
        ijk_s, pts_s = ijk[order], pts[order]
        boundary = np.concatenate(
            [[True], np.any(ijk_s[1:] != ijk_s[:-1], axis=1)])
        vid = np.cumsum(boundary) - 1
        m = vid[-1] + 1
        sums = np.zeros((m, 3))
        np.add.at(sums, vid, pts_s)
        counts = np.bincount(vid, minlength=m)
        return (sums / counts[:, None]).astype(np.float32)
    out = np.empty_like(pts)
    m = lib.fg_grid_subsample(pts, pts.shape[0], cell, out)
    return out[:m].copy()


def radius_neighbors(queries: np.ndarray, supports: np.ndarray,
                     radius: float, k: int) -> np.ndarray:
    """(nq,3) x (ns,3) -> (nq,k) int32, sentinel = ns, sorted by dist."""
    lib = get_lib()
    q = np.ascontiguousarray(queries, np.float32)
    s = np.ascontiguousarray(supports, np.float32)
    if lib is None:
        from scipy.spatial import cKDTree
        tree = cKDTree(s)
        dist, idx = tree.query(q, k=k, distance_upper_bound=radius)
        idx = np.atleast_2d(idx).astype(np.int32)
        return np.where(np.isfinite(np.atleast_2d(dist)), idx,
                        np.int32(s.shape[0]))
    out = np.empty((q.shape[0], k), np.int32)
    lib.fg_radius_neighbors(q, q.shape[0], s, s.shape[0], radius, k, out)
    return out


def nearest_within_radius(queries: np.ndarray, supports: np.ndarray,
                          radius: float) -> np.ndarray:
    """(nq,3) -> (nq,) int32 nearest support in radius, -1 if none."""
    lib = get_lib()
    q = np.ascontiguousarray(queries, np.float32)
    s = np.ascontiguousarray(supports, np.float32)
    if lib is None:
        from ..utils.pointcloud import nearest_within_radius as np_impl
        return np_impl(q, s, radius).astype(np.int32)
    out = np.empty(q.shape[0], np.int32)
    lib.fg_nearest_within_radius(q, q.shape[0], s, s.shape[0], radius, out)
    return out
