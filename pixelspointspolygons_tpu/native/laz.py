"""ctypes bindings for the native LASzip codec (native/laszip.cpp).

Decodes COPC / LAS 1.4 ``.laz`` files (compressor 3 "layered chunked",
POINT14 v3) — the format the P3 dataset ships its LiDAR in (the reference
reads it through laspy[lazrs]: datasets/p3_coco.py:78). Also encodes the
same format for fixtures and round-trip tests.

Decode conformance is guarded: reconstructed coordinate min/max are checked
against the file's header bbox (grid-exact for files our own writer or
lazperf/COPC writers produce); violations raise instead of returning
silently-skewed points (see the table discussion in native/laszip.cpp).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.normpath(os.path.join(_HERE, "..", "..", "native", "laszip.cpp"))
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libp3laszip.so")

_lib = None


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
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        if not _build():
            raise RuntimeError("native LASzip codec unavailable (no g++ to build it)")
    lib = ctypes.CDLL(_LIB_PATH)
    lib.p3laz_npoints.restype = ctypes.c_int64
    lib.p3laz_npoints.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.p3laz_read_points.restype = ctypes.c_int64
    lib.p3laz_read_points.argtypes = [ctypes.c_void_p] * 2 + [ctypes.c_void_p] * 7 + [
        ctypes.c_void_p,
        ctypes.c_int64,
    ]
    lib.p3laz_write_points.restype = ctypes.c_int64
    lib.p3laz_write_points.argtypes = [
        ctypes.c_void_p,  # XYZ int32
        ctypes.c_void_p,  # intensity u16
        ctypes.c_void_p,  # rn u8
        ctypes.c_void_p,  # cls u8
        ctypes.c_void_p,  # gps f64
        ctypes.c_int64,
        ctypes.c_void_p,  # scale f64[3]
        ctypes.c_void_p,  # offset f64[3]
        ctypes.c_uint32,
        ctypes.c_void_p,  # map6 override
        ctypes.c_void_p,  # lvl8 override
        ctypes.c_void_p,  # out
        ctypes.c_int64,
    ]
    lib.p3laz_last_error.restype = ctypes.c_char_p
    _lib = lib
    return lib


def _header_bbox(buf: bytes):
    """(mins, maxs, scale) from the LAS header (max_x, min_x, ... order)."""
    bb = struct.unpack("<6d", buf[179:227])
    scale = struct.unpack("<3d", buf[131:155])
    maxs = np.array([bb[0], bb[2], bb[4]])
    mins = np.array([bb[1], bb[3], bb[5]])
    return mins, maxs, np.array(scale)


def read_laz(path: str, attributes: bool = False):
    """Decode a .laz/.copc.laz (or point-format>=6 .las) file.

    Returns (N, 3) float64 xyz, or a dict with xyz/gps_time/intensity/
    return_number/number_of_returns/classification when attributes=True.
    """
    lib = _load()
    raw = np.frombuffer(open(path, "rb").read(), np.uint8)
    pbuf = raw.ctypes.data_as(ctypes.c_void_p)
    n = lib.p3laz_npoints(pbuf, len(raw))
    if n < 0:
        raise ValueError(f"{path}: {lib.p3laz_last_error().decode()}")
    xyz = np.empty((n, 3), np.float64)
    gps = np.empty(n, np.float64) if attributes else None
    inten = np.empty(n, np.uint16) if attributes else None
    rn = np.empty(n, np.uint8) if attributes else None
    cls = np.empty(n, np.uint8) if attributes else None
    got = lib.p3laz_read_points(
        pbuf,
        len(raw),
        None,
        None,
        xyz.ctypes.data_as(ctypes.c_void_p),
        gps.ctypes.data_as(ctypes.c_void_p) if attributes else None,
        inten.ctypes.data_as(ctypes.c_void_p) if attributes else None,
        rn.ctypes.data_as(ctypes.c_void_p) if attributes else None,
        cls.ctypes.data_as(ctypes.c_void_p) if attributes else None,
        None,
        n,
    )
    if got != n:
        raise ValueError(f"{path}: {lib.p3laz_last_error().decode()}")
    if n:
        # conformance guard: decoded extent must match the header bbox up to
        # one grid step (writers quantize the header bbox to the grid)
        mins, maxs, scale = _header_bbox(bytes(raw[:375].tobytes()))
        tol = np.maximum(np.abs(scale) * 2, 1e-6)
        lo, hi = xyz.min(axis=0), xyz.max(axis=0)
        if np.any(lo < mins - tol) or np.any(hi > maxs + tol):
            raise ValueError(
                f"{path}: decoded extent {lo}..{hi} violates header bbox "
                f"{mins}..{maxs} — refusing possibly-corrupt decode "
                "(return-context prediction tables mismatch?)"
            )
    if not attributes:
        return xyz
    return {
        "xyz": xyz,
        "gps_time": gps,
        "intensity": inten,
        "return_number": rn & 0x0F,
        "number_of_returns": rn >> 4,
        "classification": cls,
    }


def write_laz(
    path: str,
    xyz: np.ndarray,
    scale=(0.01, 0.01, 0.01),
    offset=None,
    intensity=None,
    return_number=None,
    number_of_returns=None,
    classification=None,
    gps_time=None,
    chunk_size: int = 50000,
) -> int:
    """Encode float64 (N, 3) points to a .laz file. Returns bytes written."""
    lib = _load()
    xyz = np.asarray(xyz, np.float64)
    n = len(xyz)
    scale = np.asarray(scale, np.float64)
    if offset is None:
        offset = np.floor(xyz.min(axis=0)) if n else np.zeros(3)
    offset = np.asarray(offset, np.float64)
    XYZ = np.round((xyz - offset) / scale).astype(np.int32)
    XYZ = np.ascontiguousarray(XYZ)

    def _opt(arr, dtype):
        if arr is None:
            return None, None
        a = np.ascontiguousarray(np.asarray(arr, dtype))
        return a, a.ctypes.data_as(ctypes.c_void_p)

    inten, p_inten = _opt(intensity, np.uint16)
    if return_number is not None or number_of_returns is not None:
        r = np.asarray(return_number if return_number is not None else 1, np.uint8)
        nr = np.asarray(
            number_of_returns if number_of_returns is not None else 1, np.uint8
        )
        rn = np.ascontiguousarray(
            np.broadcast_to((r & 0x0F) | (nr << 4), (n,)).astype(np.uint8)
        )
        p_rn = rn.ctypes.data_as(ctypes.c_void_p)
    else:
        rn, p_rn = None, None
    cls, p_cls = _opt(classification, np.uint8)
    gps, p_gps = _opt(gps_time, np.float64)

    cap = n * 64 + 65536
    out = np.empty(cap, np.uint8)
    sz = lib.p3laz_write_points(
        XYZ.ctypes.data_as(ctypes.c_void_p),
        p_inten,
        p_rn,
        p_cls,
        p_gps,
        n,
        scale.ctypes.data_as(ctypes.c_void_p),
        offset.ctypes.data_as(ctypes.c_void_p),
        chunk_size,
        None,
        None,
        out.ctypes.data_as(ctypes.c_void_p),
        cap,
    )
    if sz <= 0:
        raise ValueError(lib.p3laz_last_error().decode() or f"buffer: need {-sz}")
    with open(path, "wb") as f:
        f.write(out[:sz].tobytes())
    return int(sz)


def available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False
