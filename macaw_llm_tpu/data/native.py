"""ctypes bindings for the native media loader (native/libmacaw_media.so).

Falls back to the pure-Python paths (PIL / wave) when the shared library
has not been built. Build with ``make -C native``. ctypes releases the GIL
during calls, so the loader's thread pool gets true parallel decode.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for cand in (os.path.join(here, "native", "libmacaw_media.so"),
                 os.environ.get("MACAW_MEDIA_LIB", "")):
        if cand and os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.macaw_decode_jpeg_crop.restype = ctypes.c_int
                lib.macaw_decode_jpeg_crop.argtypes = [
                    ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8)]
                lib.macaw_load_wav.restype = ctypes.c_int
                lib.macaw_load_wav.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                    ctypes.c_long]
                _LIB = lib
                break
            except OSError:
                continue
    return _LIB


def available() -> bool:
    return _lib() is not None


def decode_jpeg_crop(data: bytes, target: int) -> Optional[np.ndarray]:
    """JPEG bytes -> uint8 [target, target, 3], or None on failure."""
    lib = _lib()
    if lib is None:
        return None
    out = np.empty((target, target, 3), np.uint8)
    rc = lib.macaw_decode_jpeg_crop(
        data, len(data), target,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return out


def load_wav(path: str, target_len: int) -> Optional[np.ndarray]:
    """WAV file -> fp32 mono [target_len] (pad-or-trim), or None."""
    lib = _lib()
    if lib is None:
        return None
    out = np.empty((target_len,), np.float32)
    rc = lib.macaw_load_wav(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        target_len)
    if rc < 0:
        return None
    return out
