"""Native host-side preprocessing (C++ via ctypes).

Builds lazily with g++ on first use; falls back to the pure-numpy
implementations in data/ground.py when no toolchain is available. The
shared object is cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ground_seg.cpp")
_SO = os.path.join(_HERE, "_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None (numpy fallback)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.segment_ground.restype = ctypes.c_int
        lib.segment_ground.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ]
        lib.filter_scan.restype = ctypes.c_int
        lib.filter_scan.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def segment_ground_native(
    points: np.ndarray,
    n_rings: int = 8,
    n_sectors: int = 16,
    min_range: float = 1.0,
    max_range: float = 80.0,
    seed_quantile: float = 0.15,
    dist_th: float = 0.2,
    uprightness_th: float = 0.85,
    n_iters: int = 3,
    sensor_height: float = 1.7,
):
    """C++ ground segmentation; same contract as data.ground.segment_ground.
    Returns None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points[:, :3], np.float32)
    n = len(pts)
    mask = np.zeros(n, np.uint8)
    cos = np.ones(n, np.float32)
    lib.segment_ground(
        _fptr(pts), n, n_rings, n_sectors, min_range, max_range,
        seed_quantile, dist_th, uprightness_th, n_iters, sensor_height,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fptr(cos),
    )
    return mask.astype(bool), cos


def filter_scan_native(xyzr: np.ndarray, z_min: float, min_d: float, max_d: float):
    """C++ range/z filter for (n, >=3) float32 scans; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(xyzr, np.float32)
    n, stride = arr.shape[0], arr.shape[1]
    out = np.empty((n, 3), np.float32)
    k = lib.filter_scan(_fptr(arr), n, stride, z_min, min_d, max_d, _fptr(out))
    return out[:k].copy()
