"""Native chamfer distance-transform push-out field.

Byte-exact implementation of the reference's CPU algorithm
(src/main.rs:403-515); serves as the oracle for the on-device JFA
(tpufluid.ops.forcefield.jump_flood_field) and as the fast host path for
video-driven force fields.
"""

from __future__ import annotations

import ctypes

import numpy as np

from .lib import load


def available() -> bool:
    return load() is not None


def chamfer_push_field(mask_u8: np.ndarray) -> np.ndarray:
    """u8[H, W] grayscale mask -> f32[H, W, 2] push vectors (pixel units).

    Sources are pixels > 128 ('outside'); image border seeds if none.
    """
    lib = load()
    mask_u8 = np.ascontiguousarray(mask_u8, dtype=np.uint8)
    h, w = mask_u8.shape
    out = np.empty((h, w, 2), np.float32)
    if lib is not None:
        lib.chamfer_push_field(
            mask_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int32(w), ctypes.c_int32(h),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    return _chamfer_numpy(mask_u8)


def _chamfer_numpy(mask_u8: np.ndarray) -> np.ndarray:
    """Pure-NumPy fallback (slow; exact same semantics)."""
    h, w = mask_u8.shape
    dist = np.full((h, w), np.float32(np.finfo(np.float32).max))
    nearest = np.zeros((h, w, 2), np.int32)  # (x, y)
    src = mask_u8 > 128
    if not src.any():
        src = np.zeros((h, w), bool)
        src[0, :] = src[-1, :] = True
        src[:, 0] = src[:, -1] = True
    ys, xs = np.nonzero(src)
    dist[ys, xs] = 0.0
    nearest[ys, xs, 0] = xs
    nearest[ys, xs, 1] = ys

    def relax(y, x, ny, nx):
        if 0 <= nx < w and 0 <= ny < h:
            cx, cy = nearest[ny, nx]
            d = float(x - cx) ** 2 + float(y - cy) ** 2
            if d < dist[y, x]:
                dist[y, x] = d
                nearest[y, x] = (cx, cy)

    for y in range(h):
        for x in range(w):
            for nx, ny in ((x - 1, y), (x - 1, y - 1), (x, y - 1), (x + 1, y - 1)):
                relax(y, x, ny, nx)
    for y in range(h - 1, -1, -1):
        for x in range(w - 1, -1, -1):
            for nx, ny in ((x + 1, y), (x + 1, y + 1), (x, y + 1), (x - 1, y + 1)):
                relax(y, x, ny, nx)

    px = np.stack(np.meshgrid(np.arange(w), np.arange(h), indexing="xy"),
                  axis=-1)
    d = (px - nearest).astype(np.float32)
    length = np.linalg.norm(d, axis=-1, keepdims=True)
    return np.where(length > 1e-6, -d, 0.0).astype(np.float32)
