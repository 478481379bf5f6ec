"""
ctypes binding for the native C++ preprocessing library (native/mcaq_dataio).

Gated: if the shared library is absent (not built) the Python/cv2 path is
used transparently.  Build with `make -C native`.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    candidates = [
        Path(__file__).resolve().parents[2] / "native" / "libmcaq_dataio.so",
        Path(os.environ.get("MCAQ_DATAIO_LIB", "")),
    ]
    for c in candidates:
        if c and c.exists():
            try:
                lib = ctypes.CDLL(str(c))
            except OSError:
                # stale / ABI-incompatible build (e.g. -march=native from
                # another host) — fall back to the Python path
                continue
            lib.mcaq_letterbox_f32.restype = ctypes.c_float
            lib.mcaq_letterbox_f32.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.mcaq_hflip_f32.restype = None
            lib.mcaq_hflip_f32.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int
            ]
            try:
                lib.mcaq_letterbox_u8.restype = ctypes.c_float
                lib.mcaq_letterbox_u8.argtypes = [
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_uint8,
                    ctypes.POINTER(ctypes.c_uint8),
                    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ]
                lib.has_u8 = True
            except AttributeError:  # older .so
                lib.has_u8 = False
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def letterbox_f32(
    img: np.ndarray, out_size: int, pad_value: float = 114.0
) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Fused letterbox + normalize: HxWx3 uint8 -> (S,S,3) float32 in [0,1].
    Single pass over the image (the Python path makes four)."""
    lib = _find_lib()
    if lib is None:
        raise RuntimeError("native dataio library not built (make -C native)")
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((out_size, out_size, 3), np.float32)
    px = ctypes.c_int()
    py = ctypes.c_int()
    scale = lib.mcaq_letterbox_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out_size, ctypes.c_float(pad_value),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(px), ctypes.byref(py),
    )
    return out, float(scale), (px.value, py.value)


def letterbox_u8(
    img: np.ndarray, out_size: int, pad_value: int = 114
) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Letterbox keeping uint8 (normalization happens on-device): HxWx3
    uint8 -> (S,S,3) uint8.  Identity-size inputs are a single memcpy."""
    lib = _find_lib()
    if lib is None or not getattr(lib, "has_u8", False):
        raise RuntimeError("native dataio library not built (make -C native)")
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((out_size, out_size, 3), np.uint8)
    px = ctypes.c_int()
    py = ctypes.c_int()
    scale = lib.mcaq_letterbox_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out_size, ctypes.c_uint8(pad_value),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(px), ctypes.byref(py),
    )
    return out, float(scale), (px.value, py.value)


def available_u8() -> bool:
    lib = _find_lib()
    return lib is not None and getattr(lib, "has_u8", False)


def hflip_f32(img: np.ndarray) -> np.ndarray:
    lib = _find_lib()
    if lib is None:
        raise RuntimeError("native dataio library not built")
    img = np.ascontiguousarray(img, np.float32)
    lib.mcaq_hflip_f32(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), img.shape[0]
    )
    return img
