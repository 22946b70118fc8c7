"""ctypes binding to the native strip/tile codec (native/tiffcodec.cpp).

Loads ``libtiffcodec.so`` if present (building it on first use when a
compiler is available); all entry points have pure-Python fallbacks in
``io.tiff``, so the binding is best-effort.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_native_dir(), "libtiffcodec.so")
    if not os.path.exists(so):
        src = os.path.join(_native_dir(), "tiffcodec.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", so, src],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                return None
        else:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.lzw_decode.restype = ctypes.c_long
    lib.lzw_decode.argtypes = [ctypes.c_char_p, ctypes.c_long,
                               ctypes.c_void_p, ctypes.c_long]
    lib.lzw_encode.restype = ctypes.c_long
    lib.lzw_encode.argtypes = [ctypes.c_char_p, ctypes.c_long,
                               ctypes.c_void_p, ctypes.c_long]
    lib.packbits_decode.restype = ctypes.c_long
    lib.packbits_decode.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                    ctypes.c_void_p, ctypes.c_long]
    lib.predictor_undo.restype = None
    lib.predictor_undo.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                   ctypes.c_long, ctypes.c_long, ctypes.c_int]
    lib.predictor_apply.restype = None
    lib.predictor_apply.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                    ctypes.c_long, ctypes.c_long, ctypes.c_int]
    if hasattr(lib, "hist_u8"):   # older prebuilt .so may lack it
        lib.hist_u8.restype = None
        lib.hist_u8.argtypes = [ctypes.c_void_p, ctypes.c_long,
                                ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def hist_u8(arr: np.ndarray) -> Optional[np.ndarray]:
    """Exact 256-bin histogram of a contiguous uint8 array (int64
    counts); ~7x numpy.bincount on this host. None if the native lib is
    unavailable (callers fall back to np.bincount)."""
    lib = _load()
    if lib is None or not hasattr(lib, "hist_u8"):
        return None
    a = np.ascontiguousarray(arr.reshape(-1))
    if a.dtype != np.uint8:
        raise ValueError(f"hist_u8 wants uint8, got {a.dtype}")
    out = np.zeros(256, dtype=np.int64)
    lib.hist_u8(a.ctypes.data, a.size, out.ctypes.data)
    return out


def lzw_decode(data: bytes, expected_size: int) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(expected_size, dtype=np.uint8)
    n = lib.lzw_decode(data, len(data), out.ctypes.data, expected_size)
    if n < 0:
        raise ValueError("corrupt LZW stream")
    return out[:n].tobytes()


def lzw_encode(data: bytes) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    # worst case: 12 bits per input byte plus framing
    cap = len(data) * 2 + 1024
    out = np.empty(cap, dtype=np.uint8)
    n = lib.lzw_encode(data, len(data), out.ctypes.data, cap)
    if n < 0:
        raise ValueError("LZW encode overflow")
    return out[:n].tobytes()


def packbits_decode(data: bytes, expected_size: int) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    out = np.empty(max(expected_size, 1), dtype=np.uint8)
    n = lib.packbits_decode(data, len(data), out.ctypes.data, expected_size)
    if n < 0:
        raise ValueError("corrupt PackBits stream")
    return out[:n].tobytes()
