"""ctypes bindings for the native geometry kernel (native/geometry.cpp).

Builds libp3geometry.so on first use (g++ -O3, cached next to the source)
and exposes:
- find_contours(image, level) — subpixel marching squares, skimage-style
  (y, x) polylines with closed-ring detection;
- douglas_peucker_native(points, tol) — polyline simplification.

Falls back to pure-python equivalents when no compiler is available
(`HAVE_NATIVE` is False then).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.normpath(os.path.join(_HERE, "..", "..", "native", "geometry.cpp"))
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libp3geometry.so")

_lib = None
HAVE_NATIVE = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB_PATH, _SRC],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib, HAVE_NATIVE
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.p3_marching_squares.restype = ctypes.c_int
    lib.p3_marching_squares.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
    ]
    lib.p3_douglas_peucker.restype = ctypes.c_int
    lib.p3_douglas_peucker.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    HAVE_NATIVE = True
    return lib


def find_contours(image: np.ndarray, level: float):
    """Subpixel iso-contours. Returns list of ((V, 2) float64 (y, x), closed)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native geometry kernel unavailable (no g++)")
    img = np.ascontiguousarray(image, np.float32)
    H, W = img.shape
    max_pts = 4 * H * W + 1024
    max_contours = 4096
    pts = np.empty((max_pts, 2), np.float64)
    sizes = np.empty((max_contours,), np.int32)
    closed = np.empty((max_contours,), np.uint8)
    n = lib.p3_marching_squares(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        H,
        W,
        ctypes.c_float(level),
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        max_pts,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        closed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        max_contours,
    )
    if n < 0:
        raise RuntimeError("marching squares output overflow")
    out = []
    off = 0
    for i in range(n):
        k = int(sizes[i])
        out.append((pts[off : off + k].copy(), bool(closed[i])))
        off += k
    return out


def douglas_peucker_native(points: np.ndarray, tol: float) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native geometry kernel unavailable (no g++)")
    pts = np.ascontiguousarray(points, np.float64)
    keep = np.empty((len(pts),), np.int32)
    m = lib.p3_douglas_peucker(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(pts),
        ctypes.c_double(tol),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return pts[keep[:m]]


def available() -> bool:
    return _load() is not None
