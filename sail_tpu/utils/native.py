"""ctypes binding to the native image codec (native/imagecodec.cpp).

Auto-builds on first use if the toolchain is available; all callers fall
back to the pure-Python encoders in utils/imageio.py when it is not.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsailimg.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.tonemap_u8.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8)]
        lib.tonemap_u8.restype = None
        lib.encode_png.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
        lib.encode_png.restype = ctypes.c_long
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def tonemap_u8(hdr: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    lib = _load()
    hdr = np.ascontiguousarray(hdr, np.float32)
    h, w, _ = hdr.shape
    out = np.empty((h, w, 3), np.uint8)
    lib.tonemap_u8(hdr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   h, w, ctypes.c_float(gamma),
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def encode_png(u8: np.ndarray) -> bytes:
    lib = _load()
    u8 = np.ascontiguousarray(u8, np.uint8)
    h, w, _ = u8.shape
    cap = h * w * 3 + (1 << 16)
    out = np.empty(cap, np.uint8)
    n = lib.encode_png(u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       cap)
    if n < 0:
        raise RuntimeError(f"native png encode failed ({n})")
    return out[:n].tobytes()


def png_bytes(hdr: np.ndarray, gamma: float = 2.2) -> bytes:
    """HDR float image → PNG bytes via the native path."""
    return encode_png(tonemap_u8(hdr, gamma))
