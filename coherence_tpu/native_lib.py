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
            [
                "g++",
                "-O3",
                "-march=native",
                # The bezier/scanline entry points are bit-exact float64
                # transcriptions of NumPy formulas: FMA contraction of
                # a*b+c would change the double rounding, so forbid it.
                "-ffp-contract=off",
                "-shared",
                "-fPIC",
                _SRC,
                "-o",
                _SO,
            ],
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
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.bezier_subdivide_batch.restype = ctypes.c_int64
        lib.bezier_subdivide_batch.argtypes = [
            f64p, ctypes.c_int64, ctypes.c_double, f64p, ctypes.c_int64, i64p,
        ]
        lib.edge_spans_count.restype = ctypes.c_int64
        lib.edge_spans_count.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.edge_spans_fill.restype = None
        lib.edge_spans_fill.argtypes = [
            i64p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p, i64p, i64p, i64p, i64p,
        ]
        lib.expand_1x_count.restype = ctypes.c_int64
        lib.expand_1x_count.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.expand_1x_grouped.restype = ctypes.c_int64
        lib.expand_1x_grouped.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, i64p, i64p, i64p,
        ]
        lib.expand_aa_count.restype = ctypes.c_int64
        lib.expand_aa_count.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, u8p,
        ]
        lib.expand_aa_grouped.restype = ctypes.c_int64
        lib.expand_aa_grouped.argtypes = [
            i64p, i64p, i64p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, u8p,
            i64p, i64p, i64p, i64p, i64p,
        ]
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        lib.jbig2_generic_region.restype = ctypes.c_int32
        lib.jbig2_generic_region.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, i8p, ctypes.c_int32, ctypes.c_int32, u8p,
        ]
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


def bezier_subdivide_batch(ctrl: np.ndarray, eps: float):
    """De Casteljau subdivision of a batch of beziers to chords, exactly
    matching geometry.path.bezier_subdivide's DFS order and flatness
    classification (polygon.ml:107-127).

    ctrl: (n, 8) float64 control points [x1 y1 x2 y2 x3 y3 x4 y4].
    Returns (chords (total, 4) float64 [ax ay bx by], counts (n,) int64)
    or None when the native library is unavailable (callers fall back to
    the pure-Python subdivision)."""
    lib = _load()
    if lib is None:
        return None
    ctrl = np.ascontiguousarray(ctrl, dtype=np.float64)
    n = ctrl.shape[0]
    counts = np.empty(n, dtype=np.int64)
    cap = max(32 * n, 64)
    while True:
        out = np.empty((cap, 4), dtype=np.float64)
        total = lib.bezier_subdivide_batch(ctrl, n, float(eps), out, cap, counts)
        if total <= cap:
            return out[:total], counts
        cap = int(total)


def edge_spans(edges: np.ndarray, nonzero: bool, crossing_ext: int,
               clip_lo: int, clip_hi: int):
    """Native scanline sweep (raster/scanline._edge_spans semantics, same
    array order bit-for-bit).  Returns (rows, cov_s, cov_e, cross_rows,
    cross_s, cross_e) int64 arrays, None when no rows survive the clip, or
    NotImplemented when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return NotImplemented
    edges = np.ascontiguousarray(edges, dtype=np.int64)
    n = edges.shape[0]
    T = lib.edge_spans_count(edges, n, clip_lo, clip_hi)
    if T == 0:
        return None
    cov_rows = np.empty(T, dtype=np.int64)
    cov_s = np.empty(T, dtype=np.int64)
    cov_e = np.empty(T, dtype=np.int64)
    cross_rows = np.empty(2 * T, dtype=np.int64)
    cross_s = np.empty(2 * T, dtype=np.int64)
    cross_e = np.empty(2 * T, dtype=np.int64)
    counts = np.empty(2, dtype=np.int64)
    lib.edge_spans_fill(
        edges, n, 1 if nonzero else 0, int(crossing_ext),
        int(clip_lo), int(clip_hi),
        cov_rows, cov_s, cov_e, cross_rows, cross_s, cross_e, counts,
    )
    m = int(counts[1])
    return cov_rows, cov_s, cov_e, cross_rows[:m], cross_s[:m], cross_e[:m]


def _as_i64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64)


def expand_1x_grouped(rows, ss, ee, nty: int, ntx: int, tile_h: int, tile_w: int):
    """Tile assignment of 1x pixel spans, grouped by tile (fused
    tile_raster._expand_1x + _group_slices; per-tile entry order matches
    NumPy's stable sort bit-for-bit).  Returns {tile: (r_rel, s_rel,
    e_rel)} or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows, ss, ee = _as_i64(rows), _as_i64(ss), _as_i64(ee)
    T = rows.shape[0]
    total = lib.expand_1x_count(rows, ss, ee, T, nty, ntx, tile_h, tile_w) if T else 0
    if total == 0:
        return {}
    out_r = np.empty(total, np.int64)
    out_s = np.empty(total, np.int64)
    out_e = np.empty(total, np.int64)
    groups = np.empty((nty * ntx, 3), np.int64)
    ng = np.empty(1, np.int64)
    lib.expand_1x_grouped(
        rows, ss, ee, T, nty, ntx, tile_h, tile_w, out_r, out_s, out_e, groups, ng
    )
    return {
        int(groups[i, 0]): (
            out_r[groups[i, 1] : groups[i, 2]],
            out_s[groups[i, 1] : groups[i, 2]],
            out_e[groups[i, 1] : groups[i, 2]],
        )
        for i in range(int(ng[0]))
    }


def expand_aa_grouped(rows, ss, ee, nty: int, ntx: int, hstep: int, wstep: int,
                      hpad: int, ttw: int, edge_tiles: np.ndarray):
    """Tile assignment of 16x AA spans to edge-tile t-plane windows,
    grouped by tile (fused tile_raster._expand_aa + _group_slices).
    Returns {tile: (r_rel, s_rel, e_rel)} or None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows, ss, ee = _as_i64(rows), _as_i64(ss), _as_i64(ee)
    et = np.ascontiguousarray(edge_tiles, dtype=np.uint8)
    T = rows.shape[0]
    total = (
        lib.expand_aa_count(rows, ss, ee, T, nty, ntx, hstep, wstep, hpad, et)
        if T
        else 0
    )
    if total == 0:
        return {}
    out_r = np.empty(total, np.int64)
    out_s = np.empty(total, np.int64)
    out_e = np.empty(total, np.int64)
    groups = np.empty((nty * ntx, 3), np.int64)
    ng = np.empty(1, np.int64)
    lib.expand_aa_grouped(
        rows, ss, ee, T, nty, ntx, hstep, wstep, hpad, ttw, et,
        out_r, out_s, out_e, groups, ng,
    )
    return {
        int(groups[i, 0]): (
            out_r[groups[i, 1] : groups[i, 2]],
            out_s[groups[i, 1] : groups[i, 2]],
            out_e[groups[i, 1] : groups[i, 2]],
        )
        for i in range(int(ng[0]))
    }


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


def jbig2_generic_region(data: bytes, w: int, h: int, template: int,
                         at, tpgdon: bool):
    """Native arithmetic generic-region decode (io/jbig2.py hot loop) ->
    (h, w) uint8, or NotImplemented when the native library is unavailable
    (callers fall back to the pure-Python decoder)."""
    lib = _load()
    if lib is None:
        return NotImplemented
    buf = np.frombuffer(bytes(data), dtype=np.uint8)
    at_arr = np.asarray([c for p in at for c in p], dtype=np.int8)
    out = np.zeros((h, w), dtype=np.uint8)
    rc = lib.jbig2_generic_region(
        buf, buf.size, int(w), int(h), int(template),
        at_arr, len(at), 1 if tpgdon else 0, out,
    )
    if rc != 0:
        return NotImplemented
    return out
