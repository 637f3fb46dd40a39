"""Rasterizer tests: the vectorized scanline sweep vs a direct (slow)
transcription of the reference row loop (polygon.ml:306-609), plus sanity
and AA coverage checks."""

import math

import numpy as np
import pytest

from coherence_tpu import coord
from coherence_tpu.geometry import EVEN_ODD, NONZERO, circle, rectangle, edgelist_of_path
from coherence_tpu.raster import scanline
from coherence_tpu.raster import aa as raa

HALF = coord.halfips
IPS = coord.ipspacing


# --- direct port of the reference row loop (slow, for testing only) --------


def _toint(f):
    return int(math.trunc(f))


def _pix_of_sub(n):
    v = n + IPS - 1
    q, r = divmod(abs(v), IPS)
    return (1 if v >= 0 else -1) * q if v >= 0 or r == 0 else -q


def pix_of_sub(n):
    # OCaml (n + 31) / 32 truncating toward zero.
    v = n + IPS - 1
    return int(v / IPS) if v < 0 else v // IPS


def slow_shapeminshape(edges, winding, ext):
    """Row-by-row port of polygon_spanline/shapeminshape_spanline."""
    edges = [tuple(int(v) for v in e) for e in edges]
    if not edges:
        return None
    recs = []
    for (x0, y0, x1, y1) in edges:
        ymin, ymax = min(y0, y1), max(y0, y1)
        if y0 > y1:
            x0in, x1in = x1, x0
        elif y1 > y0:
            x0in, x1in = x0, x1
        else:
            x0in, x1in = min(x0, x1), max(x0, x1)
        d = 1 if y1 > y0 else -1
        g = 0.0 if ymax == ymin else (x1in - x0in) / float(ymax - ymin)
        recs.append((x0in, x1in, ymin, ymax, d, g))
    gymax = max(r[3] for r in recs)
    gymin = min(r[2] for r in recs)
    starty = pix_of_sub(gymax + HALF)
    endy = min(-((-(r[2] - HALF)) // IPS) for r in recs)  # ceil((ymin-16)/32)
    rows = {}
    for y in range(endy, starty + 1):
        top = IPS * y - (IPS + HALF - 1)
        bot = top + 2 * IPS - 1
        tops, mids, bots = [], [], []
        for (x0in, x1in, ymin, ymax, d, g) in recs:
            if ymin > bot or ymax < top:
                continue
            if ymin == ymax or (ymin >= top and ymax <= bot):
                mids.append((min(x0in, x1in), max(x0in, x1in)))
            elif ymin >= top:  # bottom clip only
                xy = _toint(x0in + g * ((bot - ymin) + 0.25) + 0.5)
                mids.append((min(x0in, xy), max(x0in, xy)))
                bots.append((xy, d))
            elif ymax <= bot:  # top clip only
                xy = _toint(x0in + g * ((top - 1 - ymin) + 0.25) + 0.5)
                mids.append((min(xy, x1in), max(xy, x1in)))
                tops.append((xy, d))
            else:  # both
                xt = _toint(x0in + g * ((top - 1 - ymin) + 0.25) + 0.5)
                xb = _toint(xt + g * ((bot - top) + 0.25) + 0.5)
                mids.append((min(xt, xb), max(xt, xb)))
                tops.append((xt, d))
                bots.append((xb, d))

        def spans_from(crossings):
            pts = sorted(crossings, key=lambda c: c[0])
            spans = []
            if winding == NONZERO:
                c = 0
                for k in range(len(pts)):
                    c += pts[k][1]
                    if c != 0 and k + 1 < len(pts):
                        spans.append(
                            (pix_of_sub(pts[k][0] - ext), pix_of_sub(pts[k + 1][0] + ext))
                        )
            else:
                for k in range(0, len(pts) - 1, 2):
                    spans.append(
                        (pix_of_sub(pts[k][0] - ext), pix_of_sub(pts[k + 1][0] + ext))
                    )
            return spans

        t = spans_from(tops)
        b = spans_from(bots)
        c = [(pix_of_sub(lo - HALF), pix_of_sub(hi + HALF)) for lo, hi in mids]
        rows[y] = (t + b + c, c)
    # Build masks.
    allspans = [s for v in rows.values() for s in v[0]]
    if not allspans:
        return None
    xlo = min(s for s, e in allspans)
    xhi = max(e for s, e in allspans)
    h = starty - endy + 1
    w = xhi - xlo + 1
    shape = np.zeros((h, w), dtype=bool)
    cov = np.zeros((h, w), dtype=bool)
    for y, (spans, covspans) in rows.items():
        for s, e in spans:
            shape[y - endy, s - xlo : e - xlo + 1] = True
        for s, e in covspans:
            cov[y - endy, s - xlo : e - xlo + 1] = True
    minshape = shape & ~cov
    return xlo, endy, shape, minshape


def crop_to_content(x0, y0, mask):
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    if len(rows) == 0:
        return None
    return (
        x0 + int(cols[0]),
        y0 + int(rows[0]),
        mask[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1],
    )


def assert_masks_equal(fast_shape, slow):
    assert (fast_shape is None) == (slow is None)
    if fast_shape is None:
        return
    sx0, sy0, smask = slow
    got = crop_to_content(sx0, sy0, smask)
    if got is None:
        assert fast_shape is None
        return
    gx0, gy0, gmask = got
    fx0, fy0, _, _ = fast_shape.box
    fmask = fast_shape.mask_np()
    assert (fx0, fy0) == (gx0, gy0), ((fx0, fy0), (gx0, gy0))
    assert fmask.shape == gmask.shape, (fmask.shape, gmask.shape)
    assert np.array_equal(fmask, gmask)


RNG = np.random.default_rng(7)


def random_polygon_edges(n_pts, scale=400):
    pts = RNG.uniform(1, scale, size=(n_pts, 2))
    edges = []
    for k in range(n_pts):
        a = pts[k]
        b = pts[(k + 1) % n_pts]
        edges.append(
            (
                coord.sub_of_float(a[0]),
                coord.sub_of_float(a[1]),
                coord.sub_of_float(b[0]),
                coord.sub_of_float(b[1]),
            )
        )
    return np.array(edges, dtype=np.int64)


@pytest.mark.parametrize("winding", [NONZERO, EVEN_ODD])
@pytest.mark.parametrize("npts", [3, 5, 8, 12])
def test_vectorized_matches_rowloop(winding, npts):
    for trial in range(4):
        edges = random_polygon_edges(npts)
        shp, minshp = scanline.shapeminshape_of_edgelist(edges, winding)
        slow = slow_shapeminshape(edges, winding, HALF)
        if slow is None:
            assert shp is None
            continue
        sx0, sy0, smask, mmask = slow[0], slow[1], slow[2], slow[3]
        assert_masks_equal(shp, (sx0, sy0, smask))
        assert_masks_equal(minshp, (sx0, sy0, mmask))


def test_square_shape_and_minshape():
    r = rectangle(10.0, 10.0, 20.0, 20.0)
    edges = edgelist_of_path(r)
    shp, minshp = scanline.shapeminshape_of_edgelist(edges, EVEN_ODD)
    # Shape covers the square plus the half-pixel matte fringe.
    assert shp is not None and minshp is not None
    x0, y0, x1, y1 = shp.box
    assert x0 <= 10 and x1 >= 30 and y0 <= 10 and y1 >= 30
    # Minshape strictly inside shape.
    mx0, my0, mx1, my1 = minshp.box
    assert mx0 > x0 - 1 and mx1 < x1 + 1
    mask = shp.mask_np()
    mmask = minshp.mask_np()
    assert mask.sum() > mmask.sum() > 0
    # Interior pixel well inside is in minshape.
    assert mmask[20 - my0, 20 - mx0]


def test_scaled_mask_square():
    r = rectangle(4.0, 4.0, 8.0, 8.0)
    edges = edgelist_of_path(r)
    got = scanline.scaled_mask_of_edgelist(edges, EVEN_ODD, 16)
    assert got is not None
    sx0, sy0, smask = got
    # Scaled square spans roughly 16x the pixel extent.
    assert smask.shape[0] >= 8 * 16 and smask.shape[1] >= 8 * 16
    # Center is covered.
    cy = smask.shape[0] // 2
    cx = smask.shape[1] // 2
    assert smask[cy, cx]


def test_aa_opacity_interior_and_exterior():
    # Big square: interior pixels should reach ~opaque coverage, pixels far
    # outside ~0, edge pixels in between.
    r = rectangle(10.0, 10.0, 30.0, 30.0)
    edges = edgelist_of_path(r)
    shp, _ = scanline.shapeminshape_of_edgelist(edges, EVEN_ODD)
    scaled = scanline.scaled_spans_of_edgelist(edges, EVEN_ODD, 16)
    op = np.asarray(raa.coverage_opacity(shp.box, scaled))
    x0, y0, x1, y1 = shp.box
    interior = op[25 - y0, 25 - x0]
    assert interior >= 250, interior
    # The reference's filter footprint for pixel (x, y) covers float range
    # ~(y-1.5, y+0.45] (centered on the pixel's top-left corner,
    # polygon.ml:694-705), so for a square starting at y=10.0 the transition
    # happens across rows 10 and 11.
    edge_above = op[9 - y0, 25 - x0]
    edge_on = op[10 - y0, 25 - x0]
    edge_below = op[11 - y0, 25 - x0]
    assert edge_above <= 10, edge_above
    assert edge_above < edge_on < edge_below, (edge_above, edge_on, edge_below)
    assert 30 <= edge_below <= 240, edge_below
    corner_out = op[0, 0]
    assert corner_out <= 60


def test_aa_coverage_matches_direct_tablesum():
    # Direct per-pixel table summation (the reference pixel_coverage) vs conv.
    r = rectangle(5.0, 5.0, 9.0, 7.0)
    edges = edgelist_of_path(r)
    shp, _ = scanline.shapeminshape_of_edgelist(edges, EVEN_ODD)
    sx0, sy0, smask = scanline.scaled_mask_of_edgelist(edges, EVEN_ODD, 16)
    spans = scanline.scaled_spans_of_edgelist(edges, EVEN_ODD, 16)
    x0, y0, x1, y1 = shp.box
    op = np.asarray(raa.coverage_opacity(shp.box, spans))
    tbl = raa.maintable
    for (px, py) in [(5, 5), (7, 6), (9, 7), (6, 5), (x0, y0), (x1, y1)]:
        count = 0
        minx = (px - 1) * 16 - 16
        miny = (py - 1) * 16 - 16
        for u in range(32):
            for v in range(32):
                sx = minx + u
                sy = miny + v
                if 0 <= sy - sy0 < smask.shape[0] and 0 <= sx - sx0 < smask.shape[1]:
                    if smask[sy - sy0, sx - sx0]:
                        count += int(tbl[u, v])
        expect = raa.opacity_of_tableval(count * 256)
        assert op[py - y0, px - x0] == expect, (px, py, op[py - y0, px - x0], expect)


def test_scaled_spans_union_equals_dense_mask():
    # The span-list form (device expansion input) is exactly the dense mask.
    import random

    rng = random.Random(7)
    for _ in range(8):
        pts = [(rng.uniform(0, 40), rng.uniform(0, 40)) for _ in range(6)]
        from coherence_tpu.geometry.path import path_of_pointlist, NONZERO

        for winding in (EVEN_ODD, NONZERO):
            p = path_of_pointlist(winding, pts)
            edges = edgelist_of_path(p)
            dense = scanline.scaled_mask_of_edgelist(edges, winding, 16)
            spans = scanline.scaled_spans_of_edgelist(edges, winding, 16)
            assert (dense is None) == (spans is None)
            if dense is None:
                continue
            sx0, sy0, smask = dense
            rows, ss, ee = spans
            rebuilt = np.zeros_like(smask)
            for r, s, e in zip(rows, ss, ee):
                rebuilt[r - sy0, max(0, s - sx0) : e - sx0 + 1] = True
            assert np.array_equal(rebuilt, smask)


def test_aa_sprite_bucket_padding_stays_zero():
    # Sprite.rgba beyond the logical box extent must be zero (ops rely on
    # it); the AA opacity is consumed under shp.mask, which enforces it.
    from coherence_tpu.raster import fills as rfills
    import coherence_tpu.colour as C

    r = rectangle(2.0, 2.0, 20.0, 11.0)
    edges = edgelist_of_path(r)
    shp, _ = scanline.shapeminshape_of_edgelist(edges, EVEN_ODD)
    spr = raa.polygon_sprite_edgelist(rfills.plain(C.red), shp, edges, EVEN_ODD)
    x0, y0, x1, y1 = spr.box
    h, w = y1 - y0 + 1, x1 - x0 + 1
    rgba = np.asarray(spr.rgba)
    mask = np.asarray(spr.mask)
    assert rgba.shape[0] >= h and rgba.shape[1] >= w
    assert (rgba[h:, :, :] == 0).all() and (rgba[:, w:, :] == 0).all()
    assert not mask[h:, :].any() and not mask[:, w:].any()
    assert rgba[:h, :w, 3].max() == 255
