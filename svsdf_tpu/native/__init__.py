"""ctypes bindings for the native C++ host runtime (runtime.cpp).

The library is built lazily on first use (g++ is in the image) and
cached next to the source; every entry point has a pure-Python
fallback in the package, so `available()` gating keeps the framework
fully functional without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "runtime.cpp")
_LIB = os.path.join(_DIR, "libsvsdfrt.so")
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
           "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None

        c_i32, c_i64, c_dbl = ctypes.c_int32, ctypes.c_int64, ctypes.c_double
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")

        lib.svsdf_astar.restype = c_i64
        lib.svsdf_astar.argtypes = [
            u8p, ctypes.c_void_p, u8p, c_i32, c_i32, c_i32, c_i32,
            c_i32, c_i32, c_i32, c_i32, c_i32, i32p, c_dbl, c_i64,
            i32p, c_i64, i64p]
        lib.svsdf_voxelize.restype = c_i64
        lib.svsdf_voxelize.argtypes = [
            f64p, c_i64, f64p, c_dbl, c_i32, c_i32, c_i32, c_i32, u8p]
        lib.svsdf_marching_squares.restype = c_i64
        lib.svsdf_marching_squares.argtypes = [
            f32p, c_i32, c_i32, c_dbl, c_dbl, c_dbl, ctypes.c_float,
            f64p, c_i64]
        lib.svsdf_esdf2d.restype = None
        lib.svsdf_esdf2d.argtypes = [u8p, c_i32, c_i32, c_dbl, f32p]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def astar(feas, trans_feas, occ2d, start_ij, goal_ij, start_bin,
          yaw_deltas, yaw_change_weight=0.1, max_expansions=2_000_000):
    """Native A* (runtime.cpp svsdf_astar). Returns (cells (L,3) int32
    rows [i, j, yaw_bin], expansions) or (None, expansions) if no path.
    """
    lib = _load()
    assert lib is not None, "native runtime unavailable"
    feas = np.ascontiguousarray(feas, np.uint8)
    occ2d = np.ascontiguousarray(occ2d, np.uint8)
    K, X, Y = feas.shape
    if trans_feas is not None:
        trans_feas = np.ascontiguousarray(trans_feas, np.uint8)
        D = trans_feas.shape[1]
        tf_ptr = trans_feas.ctypes.data_as(ctypes.c_void_p)
    else:
        D = len(yaw_deltas)
        tf_ptr = None
    deltas = np.ascontiguousarray(yaw_deltas, np.int32)
    out = np.zeros((X * Y, 3), np.int32)
    exp = np.zeros(1, np.int64)
    n = lib.svsdf_astar(feas, tf_ptr, occ2d, K, D, X, Y,
                        int(start_ij[0]), int(start_ij[1]),
                        int(goal_ij[0]), int(goal_ij[1]), int(start_bin),
                        deltas, float(yaw_change_weight),
                        int(max_expansions), out, X * Y, exp)
    if n <= 0:
        return None, int(exp[0])
    return out[:n].copy(), int(exp[0])


def voxelize(points, xyz_min, resolution, shape, threshold):
    """Native point counting + threshold -> occupancy (nx, ny, nz)."""
    lib = _load()
    assert lib is not None, "native runtime unavailable"
    pts = np.ascontiguousarray(points, np.float64)
    occ = np.zeros(int(np.prod(shape)), np.uint8)
    lib.svsdf_voxelize(pts, len(pts),
                       np.ascontiguousarray(xyz_min, np.float64),
                       float(resolution), int(shape[0]), int(shape[1]),
                       int(shape[2]), int(threshold), occ)
    return occ.reshape(shape).astype(bool)


def marching_squares(field, x0, y0, step, level=0.0):
    """Native zero-level-set segments -> (S, 2, 2) float64."""
    lib = _load()
    assert lib is not None, "native runtime unavailable"
    f = np.ascontiguousarray(field, np.float32)
    nx, ny = f.shape
    max_segs = 2 * nx * ny + 16
    out = np.zeros((max_segs, 4), np.float64)
    n = lib.svsdf_marching_squares(f, nx, ny, float(x0), float(y0),
                                   float(step), float(level), out,
                                   max_segs)
    return out[:n].reshape(-1, 2, 2).copy()


def esdf2d(occ, resolution):
    """Native signed ESDF of a 2-D occupancy slice -> float32 (nx, ny)."""
    lib = _load()
    assert lib is not None, "native runtime unavailable"
    o = np.ascontiguousarray(occ, np.uint8)
    nx, ny = o.shape
    out = np.zeros((nx, ny), np.float32)
    lib.svsdf_esdf2d(o, nx, ny, float(resolution), out)
    return out
