"""ctypes loader for the native host runtime (native/coherence_native.cpp).

Builds on first use with g++ if no shared object is present; every entry
point has a pure-Python/NumPy fallback so the framework works without a
toolchain.  ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "native", "coherence_native.cpp")
_SO = os.path.join(_HERE, "native", "coherence_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.boxes_overlap_filter.restype = ctypes.c_int32
        lib.boxes_overlap_filter.argtypes = [
            i32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8p,
        ]
        lib.boxes_union_reduce.restype = None
        lib.boxes_union_reduce.argtypes = [i32p, ctypes.c_int32, i32p]
        lib.boxes_intersect.restype = None
        lib.boxes_intersect.argtypes = [
            i32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p, u8p,
        ]
        lib.blit_masked_rgb.restype = None
        lib.blit_masked_rgb.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, i32p, u8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.encode_refresh_frame.restype = ctypes.c_int64
        lib.encode_refresh_frame.argtypes = [
            u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, u8p,
        ]
        lib.fb_diff_bbox.restype = ctypes.c_int32
        lib.fb_diff_bbox.argtypes = [u8p, u8p, ctypes.c_int32, ctypes.c_int32, i32p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def boxes_overlap_filter(boxes: np.ndarray, query) -> np.ndarray:
    """boxes (n, 4) int32 inclusive; returns bool (n,) overlap mask."""
    boxes = np.ascontiguousarray(boxes, dtype=np.int32)
    n = boxes.shape[0]
    lib = _load()
    if lib is not None and n:
        out = np.empty(n, dtype=np.uint8)
        lib.boxes_overlap_filter(boxes, n, int(query[0]), int(query[1]), int(query[2]), int(query[3]), out)
        return out.astype(bool)
    qx0, qy0, qx1, qy1 = query
    return (
        (boxes[:, 0] <= qx1) & (qx0 <= boxes[:, 2]) & (boxes[:, 1] <= qy1) & (qy0 <= boxes[:, 3])
    )


def boxes_union_reduce(boxes: np.ndarray):
    boxes = np.ascontiguousarray(boxes, dtype=np.int32)
    lib = _load()
    if lib is not None and boxes.shape[0]:
        out = np.empty(4, dtype=np.int32)
        lib.boxes_union_reduce(boxes, boxes.shape[0], out)
        return tuple(int(v) for v in out)
    return (
        int(boxes[:, 0].min()), int(boxes[:, 1].min()),
        int(boxes[:, 2].max()), int(boxes[:, 3].max()),
    )


def blit_masked_rgb(fb: np.ndarray, rgba: np.ndarray, mask: np.ndarray, oy: int, ox: int):
    """Write rgba[...,:3] into fb (H, W, 3) u8 where mask, at (oy, ox)."""
    lib = _load()
    h, w = mask.shape
    if lib is not None:
        lib.blit_masked_rgb(
            fb, fb.shape[0], fb.shape[1],
            np.ascontiguousarray(rgba, dtype=np.int32),
            np.ascontiguousarray(mask, dtype=np.uint8),
            h, w, oy, ox,
        )
        return
    FH, FW = fb.shape[:2]
    y_lo, y_hi = max(0, -oy), min(h, FH - oy)
    x_lo, x_hi = max(0, -ox), min(w, FW - ox)
    if y_hi <= y_lo or x_hi <= x_lo:
        return
    sub_m = mask[y_lo:y_hi, x_lo:x_hi]
    sub_c = rgba[y_lo:y_hi, x_lo:x_hi, :3].astype(np.uint8)
    tgt = fb[oy + y_lo : oy + y_hi, ox + x_lo : ox + x_hi]
    tgt[sub_m] = sub_c[sub_m]


def encode_refresh_frame(fb: np.ndarray, window: int, x: int, y: int, w: int, h: int) -> bytes:
    """Full RefreshWindow wire frame straight out of the framebuffer."""
    lib = _load()
    if lib is not None:
        out = np.empty(80 + w * h * 3, dtype=np.uint8)
        n = lib.encode_refresh_frame(
            np.ascontiguousarray(fb), fb.shape[0], fb.shape[1], window, x, y, w, h, out
        )
        return out[:n].tobytes()
    from .gui import wire

    data = fb[y : y + h, x : x + w].tobytes()
    return wire.marshall(["RefreshWindow", window, x, y, w, h, data])


def fb_diff_bbox(a: np.ndarray, b: np.ndarray):
    """Tight bbox (x0, y0, x1, y1) of differing pixels, or None."""
    lib = _load()
    if lib is not None:
        out = np.empty(4, dtype=np.int32)
        got = lib.fb_diff_bbox(
            np.ascontiguousarray(a), np.ascontiguousarray(b), a.shape[0], a.shape[1], out
        )
        return tuple(int(v) for v in out) if got else None
    diff = (a != b).any(axis=-1)
    ys, xs = np.nonzero(diff)
    if len(ys) == 0:
        return None
    return int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())
