"""ctypes bindings for the native runtime library (native/librtnative.so).

Every entry point has a pure-Python fallback, so the framework works without
the native build; when present, asset decode and procedural generation use the
C paths (the pieces the reference also kept native — libpng and the Perlin
host loops).  Build with ``native/build.sh``."""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "native", "librtnative.so"),
]

_lib: Optional[ctypes.CDLL] = None


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        if os.path.exists(path):
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.rt_png_unfilter.restype = ctypes.c_int
            lib.rt_png_unfilter.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long,
                ctypes.c_long, ctypes.c_long,
            ]
            lib.rt_perlin_grid_yoff.restype = None
            lib.rt_perlin_grid_yoff.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_float, ctypes.c_float, ctypes.c_int32, ctypes.c_void_p,
            ]
            lib.rt_z_order_batch.restype = None
            lib.rt_z_order_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p,
            ]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return load() is not None


def png_unfilter(raw: bytes, height: int, stride: int, bpp: int
                 ) -> Optional[np.ndarray]:
    """Unfilter PNG scanlines natively; None if the library isn't built."""
    lib = load()
    if lib is None:
        return None
    raw_arr = np.frombuffer(raw, dtype=np.uint8)
    if raw_arr.size < height * (stride + 1):
        return None
    out = np.empty((height, stride), dtype=np.uint8)
    rc = lib.rt_png_unfilter(
        raw_arr.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        height, stride, bpp,
    )
    if rc != 0:
        return None
    return out


def perlin_grid_yoff(sample_vecs: np.ndarray, permutation: np.ndarray,
                     amplitude: float, period: float, grid: int
                     ) -> Optional[np.ndarray]:
    """Whole-grid terrain stack offsets; None if the library isn't built."""
    lib = load()
    if lib is None:
        return None
    sv = np.ascontiguousarray(sample_vecs, dtype=np.float32)
    perm = np.ascontiguousarray(permutation, dtype=np.int32)
    out = np.empty(grid * grid, dtype=np.float32)
    lib.rt_perlin_grid_yoff(
        sv.ctypes.data_as(ctypes.c_void_p),
        perm.ctypes.data_as(ctypes.c_void_p),
        np.int32(sv.shape[0]), np.float32(amplitude), np.float32(period),
        np.int32(grid), out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def z_order_batch(centers: np.ndarray) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    c = np.ascontiguousarray(centers, dtype=np.float32)
    out = np.empty(c.shape[0], dtype=np.uint64)
    lib.rt_z_order_batch(
        c.ctypes.data_as(ctypes.c_void_p), c.shape[0],
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out
