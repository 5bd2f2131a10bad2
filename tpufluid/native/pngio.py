"""Native PNG export bindings (write-only; reads fall back to PIL)."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from .lib import load


def available() -> bool:
    lib = load()
    return lib is not None and hasattr(lib, "png_write_rgba")


def write_rgba(path: str, rgba8: np.ndarray) -> None:
    lib = load()
    if lib is None:
        raise RuntimeError("native library not built")
    rgba8 = np.ascontiguousarray(rgba8, dtype=np.uint8)
    if rgba8.ndim != 3 or rgba8.shape[2] != 4 or not rgba8.size:
        raise ValueError(
            f"expected nonempty u8[H, W, 4] rgba array, got {rgba8.shape}")
    h, w = rgba8.shape[:2]
    rc = lib.png_write_rgba(
        path.encode(), rgba8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(w), ctypes.c_int32(h),
    )
    if rc != 0:
        raise IOError(f"png_write_rgba failed with code {rc}")


def read_rgba(path: str) -> Optional[np.ndarray]:
    return None  # decoding handled by PIL fallback in utils.io
