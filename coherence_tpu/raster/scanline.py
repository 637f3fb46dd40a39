"""Scanline rasterization of edge lists to dense coverage masks.

Parity target: reference ``polygon.ml:306-609`` (shape / minshape
calculation) and ``polygon.ml:673-692`` (the 16x-scaled mask used for
antialiasing).  The reference walks pixel rows with an active edge list and
emits span lists; here every (edge, row) interaction is computed at once with
NumPy using the reference's exact integer/float formulas, and the spans are
scattered into dense difference arrays (union of spans == positive prefix
sum).  This runs on the host: it is per-scene-change work, and its output
masks are uploaded once and cached (see scene.cache).

Semantics reproduced exactly:

* Bands: pixel row y covers subbins [32y-47 .. 32y+16] — one pixel plus half
  a pixel above and below (``polygon.ml:538-541``), which is what makes the
  AA matte "correlated" (shape extends half a pixel beyond geometry).
* Crossings at band boundaries with the reference's rounding
  ``toint(x0 + g*((y - ymin) + 0.25) + 0.5)`` (``polygon.ml:345-385``),
  including the compounded rounding when an edge is clipped top AND bottom.
* Winding rules: even-odd pairing and nonzero winding accumulation
  (``polygon.ml:456-512``), crossing spans extended by ±halfips for the
  1x masks and unextended for the scaled AA masks.
* Coverage of in-band edge segments, always extended by ±halfips
  (``polygon.ml:444-453``).
* shape = tops ∪ bottoms ∪ coverage; minshape = shape − coverage
  (``polygon.ml:520-528``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .. import coord
from ..geometry.path import EVEN_ODD, NONZERO, Path, edgelist_of_path
from . import region
from .region import NULL_SHAPE, Shape, shape_of_mask

_HALF = coord.halfips  # 16
_IPS = coord.ipspacing  # 32

# Route sweeps through the native C++ implementation when available (a
# bit-exact transcription, tests/test_native_sweep.py).  Module flag so
# differential tests can force the NumPy path.
use_native = True


def _ceil_div(a, b):
    return -((-a) // b)


def _edge_spans(edges: np.ndarray, winding: str, crossing_ext: int, rows_clip=None):
    """Core scanline sweep, span-list form.

    edges: (N, 4) int64 subbin [x0, y0, x1, y1] (raw endpoint order).
    Returns ``(cov_rows, cov_s, cov_e, cross_rows, cross_s, cross_e)`` —
    inclusive pixel-column spans per pixel row (absolute coordinates) for the
    in-band coverage and the winding crossing spans — or None for empty.

    rows_clip = (lo, hi): restrict the sweep to pixel rows lo..hi inclusive
    (rows are independent — crossing pairing is per-row — so dropping rows
    outside a viewport is exact and skips their span work entirely).
    """
    if edges.shape[0] == 0:
        return None
    if use_native:
        from .. import native_lib

        lo, hi = rows_clip if rows_clip is not None else (-(2**62), 2**62)
        got = native_lib.edge_spans(edges, winding == NONZERO, crossing_ext, lo, hi)
        if got is not NotImplemented:
            return got
    ex0 = edges[:, 0].astype(np.int64)
    ey0 = edges[:, 1].astype(np.int64)
    ex1 = edges[:, 2].astype(np.int64)
    ey1 = edges[:, 3].astype(np.int64)

    ymin = np.minimum(ey0, ey1)
    ymax = np.maximum(ey0, ey1)
    # x at the min-y / max-y ends (polygon.ml:235-236); horizontal edges use
    # min/max respectively.
    up = ey1 > ey0
    down = ey0 > ey1
    x0in = np.where(down, ex1, np.where(up, ex0, np.minimum(ex0, ex1)))
    x1in = np.where(down, ex0, np.where(up, ex1, np.maximum(ex0, ex1)))
    # Crossing direction: +1 anticlockwise (y1 > y0), -1 clockwise
    # (polygon.ml:309-328).
    dirs = np.where(up, 1, -1).astype(np.int64)
    denom = (ymax - ymin).astype(np.float64)
    grad = np.where(denom == 0.0, 0.0, (x1in - x0in) / np.where(denom == 0, 1, denom))

    # Active pixel-row range per edge: active iff ymax >= 32y-47 and
    # ymin <= 32y+16.
    ylo = _ceil_div(ymin - _HALF, _IPS)
    yhi = (ymax + (_IPS + _HALF - 1)) // _IPS
    counts = (yhi - ylo + 1).astype(np.int64)
    assert (counts > 0).all()

    eidx = np.repeat(np.arange(edges.shape[0]), counts)
    # Row index within each edge's range (vectorized ragged arange).
    total = int(counts.sum())
    starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    offs = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    rows = ylo[eidx] + offs

    if rows_clip is not None:
        keep_r = (rows >= rows_clip[0]) & (rows <= rows_clip[1])
        if not keep_r.all():
            eidx = eidx[keep_r]
            rows = rows[keep_r]
            if rows.size == 0:
                return None

    top = _IPS * rows - (_IPS + _HALF - 1)  # 32y - 47
    bot = top + 2 * _IPS - 1  # 32y + 16

    pe_ymin = ymin[eidx]
    pe_ymax = ymax[eidx]
    pe_x0 = x0in[eidx].astype(np.float64)
    pe_x1 = x1in[eidx]
    pe_g = grad[eidx]
    pe_dir = dirs[eidx]

    has_top = pe_ymin < top
    has_bot = pe_ymax > bot

    # Crossing x at the top band boundary (y_clip = top - 1), polygon.ml:355-363.
    x_t = np.trunc(pe_x0 + pe_g * ((top - 1 - pe_ymin) + 0.25) + 0.5).astype(np.int64)
    # Crossing at the bottom boundary (y_clip = bot): when also top-clipped the
    # reference compounds the already-rounded top crossing (polygon.ml:365-385).
    x_b_plain = np.trunc(pe_x0 + pe_g * ((bot - pe_ymin) + 0.25) + 0.5).astype(np.int64)
    x_b_comp = np.trunc(
        x_t.astype(np.float64) + pe_g * ((2 * _IPS - 1) + 0.25) + 0.5
    ).astype(np.int64)
    x_b = np.where(has_top, x_b_comp, x_b_plain)

    # Coverage x-range of the clipped in-band segment.
    a = np.where(has_top, x_t, x0in[eidx])
    b = np.where(has_bot, x_b, pe_x1)
    cov_lo = np.minimum(a, b)
    cov_hi = np.maximum(a, b)

    # ---- build the dense difference arrays -------------------------------
    # Pixel spans: crossings -> [pix(p - ext), pix(q + ext)],
    # coverage -> [pix(lo - 16), pix(hi + 16)].
    cov_s = coord.pix_of_sub_np(cov_lo - _HALF)
    cov_e = coord.pix_of_sub_np(cov_hi + _HALF)

    def crossing_spans(sel: np.ndarray, xs: np.ndarray):
        """Extract in-spans from per-row crossing lists under the winding rule.

        Returns (rows, s_pix, e_pix) arrays of spans."""
        r = rows[sel]
        x = xs[sel]
        d = pe_dir[sel]
        if r.size == 0:
            return r, x, x
        order = np.lexsort((x, r))
        r, x, d = r[order], x[order], d[order]
        same_row_next = np.zeros(len(r), dtype=bool)
        same_row_next[:-1] = r[:-1] == r[1:]
        if winding == NONZERO:
            # Segmented cumulative winding (reset at row starts).
            new_row = np.ones(len(r), dtype=bool)
            new_row[1:] = r[1:] != r[:-1]
            csum = np.cumsum(d)
            seg_starts = np.flatnonzero(new_row)
            seg_id = np.cumsum(new_row) - 1
            base = (csum - d)[seg_starts]
            wind = csum - base[seg_id]
            emit = same_row_next & (wind != 0)
        else:
            new_row = np.ones(len(r), dtype=bool)
            new_row[1:] = r[1:] != r[:-1]
            row_start_idx = np.where(new_row, np.arange(len(r)), 0)
            np.maximum.accumulate(row_start_idx, out=row_start_idx)
            idx_in_row = np.arange(len(r)) - row_start_idx
            emit = same_row_next & (idx_in_row % 2 == 0)
        i = np.nonzero(emit)[0]
        p = x[i]
        q = x[i + 1]
        s = coord.pix_of_sub_np(p - crossing_ext)
        e = coord.pix_of_sub_np(q + crossing_ext)
        return r[i], s, e

    t_rows, t_s, t_e = crossing_spans(has_top, x_t)
    b_rows, b_s, b_e = crossing_spans(has_bot, x_b)
    return (
        rows,
        cov_s,
        cov_e,
        np.concatenate([t_rows, b_rows]),
        np.concatenate([t_s, b_s]),
        np.concatenate([t_e, b_e]),
    )


def _rasterize_edges(
    edges: np.ndarray, winding: str, crossing_ext: int
) -> Optional[Tuple[int, int, np.ndarray, np.ndarray]]:
    """Dense-mask form of the sweep.

    Returns (x0_pix, y0_pix, shape_mask, minshape_mask) or None for empty.
    """
    spans = _edge_spans(edges, winding, crossing_ext)
    if spans is None:
        return None
    rows, cov_s, cov_e, cross_rows, cross_s, cross_e = spans

    all_rows = np.concatenate([rows, cross_rows])
    all_s = np.concatenate([cov_s, cross_s])
    all_e = np.concatenate([cov_e, cross_e])
    if all_rows.size == 0:
        return None

    y0_pix = int(rows.min())
    y1_pix = int(rows.max())
    x0_pix = int(all_s.min())
    x1_pix = int(all_e.max())
    h = y1_pix - y0_pix + 1
    w = x1_pix - x0_pix + 1

    def spans_to_mask(rws, ss, ee) -> np.ndarray:
        diff = np.zeros((h, w + 1), dtype=np.int32)
        np.add.at(diff, (rws - y0_pix, ss - x0_pix), 1)
        np.add.at(diff, (rws - y0_pix, ee - x0_pix + 1), -1)
        return np.cumsum(diff, axis=1)[:, :-1] > 0

    cov_mask = spans_to_mask(rows, cov_s, cov_e)
    cross_mask = spans_to_mask(cross_rows, cross_s, cross_e)
    shape_mask = cov_mask | cross_mask
    minshape_mask = shape_mask & ~cov_mask
    return x0_pix, y0_pix, shape_mask, minshape_mask


def _tighten(x0: int, y0: int, mask: np.ndarray) -> Optional[Shape]:
    if not mask.any():
        return NULL_SHAPE
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    r0, r1 = int(rows[0]), int(rows[-1])
    c0, c1 = int(cols[0]), int(cols[-1])
    sub = mask[r0 : r1 + 1, c0 : c1 + 1]
    box = (x0 + c0, y0 + r0, x0 + c1, y0 + r1)
    return shape_of_mask(box, sub)


def shapeminshape_of_edgelist(edges: np.ndarray, winding: str):
    """Shape and minshape of an edge list (ref polygon.ml:582-603)."""
    res = _rasterize_edges(np.asarray(edges, dtype=np.int64), winding, _HALF)
    if res is None:
        return NULL_SHAPE, NULL_SHAPE
    x0, y0, smask, mmask = res
    return _tighten(x0, y0, smask), _tighten(x0, y0, mmask)


# Alias matching the reference name used for stroked paths
# (polygon.ml:608-609; sorting is irrelevant to the vectorized sweep).
def shapeminshape_of_unsorted_edgelist(edges: np.ndarray, winding: str):
    return shapeminshape_of_edgelist(edges, winding)


def shapeminshape_polygon(path: Path):
    """Shape/minshape of a path (ref polygon.ml:605-606)."""
    return shapeminshape_of_edgelist(edgelist_of_path(path), path.winding)


def scaled_mask_of_edgelist(edges: np.ndarray, winding: str, scale: int):
    """The AA supersampled coverage mask (ref polygon.ml:673-692).

    Edge subbin coordinates are multiplied by ``scale`` (= res/2 = 16) and
    rasterized with the *unextended* crossing spans (the ``_aa`` span
    functions, polygon.ml:469-512) but ordinary ±half coverage spans.

    Returns (x0, y0, mask) in scaled-pixel coordinates, or None.
    """
    e = np.asarray(edges, dtype=np.int64)
    if e.shape[0] == 0:
        return None
    res = _rasterize_edges(e * scale, winding, 0)
    if res is None:
        return None
    x0, y0, smask, _ = res
    return x0, y0, smask


def scaled_spans_of_edgelist(edges: np.ndarray, winding: str, scale: int, rows_clip=None):
    """Span-list form of ``scaled_mask_of_edgelist``: the same mask as
    inclusive per-row column spans in absolute scaled-pixel coordinates.

    Returns (rows, s, e) int64 arrays, or None for empty.  The union of the
    spans IS the scaled mask — the dense expansion happens on device
    (raster/aa.py) so only these few-KB lists cross the host↔device link
    instead of the multi-MB 16x-scaled boolean plane.
    """
    e = np.asarray(edges, dtype=np.int64)
    if e.shape[0] == 0:
        return None
    spans = _edge_spans(e * scale, winding, 0, rows_clip=rows_clip)
    if spans is None:
        return None
    rows, cov_s, cov_e, cross_rows, cross_s, cross_e = spans
    all_rows = np.concatenate([rows, cross_rows])
    if all_rows.size == 0:
        return None
    return (
        all_rows,
        np.concatenate([cov_s, cross_s]),
        np.concatenate([cov_e, cross_e]),
    )
