"""ctypes bindings for the C++ host-side hot ops (native/miseg_native.cpp).

Auto-builds the shared library with `make` on first import if the
toolchain is present; every entry point has a scipy fallback so the
framework works without the native lib (import never fails).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libmiseg_native.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and os.environ.get("MISEG_NATIVE", "1") != "0":
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.resample_affine_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int]
        lib.edt3d_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float)]
        lib.binary_erosion_f32.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return lib
    except OSError:
        return None


def available() -> bool:
    return _load() is not None


def _i64(arr):
    return np.ascontiguousarray(arr, dtype=np.int64).ctypes.data_as(
        ctypes.POINTER(ctypes.c_int64))


def resample_affine(vol: np.ndarray, matrix: np.ndarray, offset: np.ndarray,
                    out_shape, order: int) -> np.ndarray:
    """scipy.ndimage.affine_transform equivalent (3D, constant cval=0)."""
    lib = _load()
    if lib is None:
        from scipy import ndimage
        return ndimage.affine_transform(
            vol, matrix, offset=offset, output_shape=tuple(out_shape),
            order=order, mode="constant", cval=0.0,
            prefilter=False).astype(np.float32)
    vol = np.ascontiguousarray(vol, dtype=np.float32)
    out = np.empty(tuple(out_shape), dtype=np.float32)
    m = np.ascontiguousarray(matrix, dtype=np.float64)
    off = np.ascontiguousarray(offset, dtype=np.float64)
    lib.resample_affine_f32(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _i64(vol.shape),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _i64(out.shape), ctypes.c_int(order))
    return out


def edt(target: np.ndarray) -> np.ndarray:
    """Distance from every voxel to the nearest TRUE voxel of `target`
    (== scipy.ndimage.distance_transform_edt(~target))."""
    lib = _load()
    if lib is None:
        from scipy import ndimage
        return ndimage.distance_transform_edt(~target).astype(np.float32)
    t = np.ascontiguousarray(target, dtype=np.uint8)
    out = np.empty(t.shape, dtype=np.float32)
    lib.edt3d_f32(t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  _i64(t.shape),
                  out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def binary_erosion(mask: np.ndarray) -> np.ndarray:
    """scipy.ndimage.binary_erosion equivalent (cross SE, border_value=1)."""
    lib = _load()
    if lib is None:
        from scipy import ndimage
        return ndimage.binary_erosion(mask, iterations=1, border_value=1)
    m = np.ascontiguousarray(mask, dtype=np.uint8)
    out = np.empty(m.shape, dtype=np.uint8)
    lib.binary_erosion_f32(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           _i64(m.shape),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)
