"""ctypes bindings for the native data-IO library (native/dataio.cpp).

Loads native/libdataio.so when present (`make -C native`); every entry point
has a pure-Python fallback so the framework works without the build step.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    path = os.path.join(here, "native", "libdataio.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.letterbox_bicubic_u8.argtypes = [u8p] + [ctypes.c_int] * 2 + [f32p] + \
        [ctypes.c_int] * 6
    lib.letterbox_nearest_u8.argtypes = [u8p] + [ctypes.c_int] * 2 + [i32p] + \
        [ctypes.c_int] * 7
    lib.parse_radar_csv.argtypes = [ctypes.c_char_p, i32p, ctypes.c_int,
                                    f32p, ctypes.c_int]
    lib.parse_radar_csv.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _find_lib() is not None


def _geometry(h_in, w_in, res):
    scale = min(res / h_in, res / w_in)
    nh, nw = int(h_in * scale), int(w_in * scale)
    return nh, nw, (res - nh) // 2, (res - nw) // 2


def letterbox_image_native(img: np.ndarray, res: int) -> Optional[np.ndarray]:
    """RGB u8 [H,W,3] -> normalized f32 [res,res,3], or None w/o the lib."""
    lib = _find_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    nh, nw, dy, dx = _geometry(h, w, res)
    out = np.empty((res, res, 3), np.float32)
    lib.letterbox_bicubic_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), res, res,
        nh, nw, dy, dx)
    return out


def letterbox_mask_native(mask: np.ndarray, res: int,
                          clip_max: int) -> Optional[np.ndarray]:
    lib = _find_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape[:2]
    nh, nw, dy, dx = _geometry(h, w, res)
    out = np.empty((res, res), np.int32)
    lib.letterbox_nearest_u8(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), res, res,
        nh, nw, dy, dx, clip_max)
    return out


def parse_radar_csv_native(path: str, col_idx: Sequence[int],
                           max_rows: int = 4096) -> Optional[np.ndarray]:
    lib = _find_lib()
    if lib is None:
        return None
    idx = np.asarray(col_idx, np.int32)
    out = np.empty((max_rows, len(col_idx)), np.float32)
    n = lib.parse_radar_csv(
        path.encode(), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(col_idx),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_rows)
    if n < 0:
        return None
    return out[:n].copy()
