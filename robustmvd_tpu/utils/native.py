"""ctypes loader for the native host-IO library (robustmvd_tpu/native/).

Compiles librmvd_io.so on demand with g++ (cached next to the source) and
exposes the resize kernels; every entry point has a numpy fallback so the
framework runs without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.realpath(__file__))), "native")
_SRC = osp.join(_NATIVE_DIR, "rmvd_io.cpp")
_LIB = osp.join(_NATIVE_DIR, "librmvd_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not osp.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            f32p = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64 = ctypes.c_int64
            lib.resize_bilinear_chw_f32.argtypes = [f32p, f32p, i64, i64, i64, i64, i64]
            lib.resize_nearest_chw_f32.argtypes = [f32p, f32p, i64, i64, i64, i64, i64]
            lib.u8hwc_to_f32chw.argtypes = [u8p, f32p, i64, i64, i64, ctypes.c_float, ctypes.c_float]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _as_chw(img):
    img = np.ascontiguousarray(img, dtype=np.float32)
    lead = img.shape[:-2]
    c = int(np.prod(lead)) if lead else 1
    return img.reshape(c, img.shape[-2], img.shape[-1]), lead


def resize_bilinear_native(img, size):
    """Native bilinear resize of (..., H, W) float32; None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    src, lead = _as_chw(img)
    c, in_h, in_w = src.shape
    out = np.empty((c, int(size[0]), int(size[1])), np.float32)
    lib.resize_bilinear_chw_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c, in_h, in_w, out.shape[1], out.shape[2],
    )
    return out.reshape(*lead, out.shape[1], out.shape[2]) if lead else out[0]


def resize_nearest_native(img, size):
    lib = get_lib()
    if lib is None:
        return None
    orig_dtype = np.asarray(img).dtype
    src, lead = _as_chw(img)
    c, in_h, in_w = src.shape
    out = np.empty((c, int(size[0]), int(size[1])), np.float32)
    lib.resize_nearest_chw_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        c, in_h, in_w, out.shape[1], out.shape[2],
    )
    out = out.reshape(*lead, out.shape[1], out.shape[2]) if lead else out[0]
    return out.astype(orig_dtype, copy=False)
