"""Adversarial rasterizer fuzz (VERDICT r1 #7): the known-hard families —
horizontal edges on scanline band boundaries, vertices at exact subbin
half-pixels, mitre-limit and self-intersecting stroke rails
(shapes.ml:344-403), and degenerate dot paths (shapes.ml:479-509) —
checked vectorized-vs-slow-oracle and fast-path-vs-general-renderer."""

import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu import coord, ident
from coherence_tpu.geometry import EVEN_ODD, NONZERO, circle, edgelist_of_path
from coherence_tpu.geometry import path as gpath
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region, scanline
from coherence_tpu.scene import cache, render as R
from coherence_tpu.scene.fastframe import full_sprite_of_object

from test_scanline import HALF, assert_masks_equal, slow_shapeminshape

RNG = np.random.default_rng(23)


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def polyline(pts, closed=True, winding=NONZERO):
    segs = []
    n = len(pts)
    for k in range(n if closed else n - 1):
        segs.append(gpath.Straight(tuple(pts[k]), tuple(pts[(k + 1) % n])))
    return gpath.mkpath(winding, [(False, closed, segs)])


def _masks_equal_or_empty(fast_shape, slow3):
    """Like assert_masks_equal, but a None fast shape matches an all-empty
    oracle mask (a zero-area polygon's spans cancel)."""
    if fast_shape is None:
        assert not slow3[2].any()
        return
    assert_masks_equal(fast_shape, slow3)


def check_both_windings(edges):
    for winding in (NONZERO, EVEN_ODD):
        shp, minshp = scanline.shapeminshape_of_edgelist(edges, winding)
        slow = slow_shapeminshape(edges, winding, HALF)
        if slow is None:
            assert shp is None
            continue
        sx0, sy0, smask, mmask = slow[0], slow[1], slow[2], slow[3]
        _masks_equal_or_empty(shp, (sx0, sy0, smask))
        _masks_equal_or_empty(minshp, (sx0, sy0, mmask))


def test_horizontal_edges_on_band_boundaries():
    """Staircase polygons whose horizontal edges land exactly on the
    scanline band boundary subbins (rows y*32, y*32±15, y*32±16): the
    band-clip classification (mid vs top vs bottom) is most fragile
    there."""
    ips, half = coord.ipspacing, coord.halfips
    for trial in range(6):
        # y values at exact band-boundary subbins around random pixel rows.
        ys = []
        for _ in range(3):
            py = int(RNG.integers(3, 12))
            off = int(RNG.choice([0, half - 1, half, half + 1, -half, ips - 1]))
            ys.append(py * ips + off)
        ys = sorted(set(ys))
        if len(ys) < 3:
            continue
        x0, x1, x2 = (
            int(RNG.integers(1, 4)) * ips,
            int(RNG.integers(5, 8)) * ips + half,
            int(RNG.integers(9, 12)) * ips,
        )
        # A staircase: right at x2 down to ys[1], in to x1, down to ys[2], close.
        pts_sub = [
            (x0, ys[0]),
            (x2, ys[0]),
            (x2, ys[1]),
            (x1, ys[1]),
            (x1, ys[2]),
            (x0, ys[2]),
        ]
        edges = np.array(
            [
                (*pts_sub[k], *pts_sub[(k + 1) % len(pts_sub)])
                for k in range(len(pts_sub))
            ],
            dtype=np.int64,
        )
        check_both_windings(edges)


def test_vertices_on_half_subbin():
    """Random polygons with every coordinate snapped to exact half-pixel or
    pixel-boundary subbins — the rounding rule's tie cases."""
    ips, half = coord.ipspacing, coord.halfips
    offsets = np.array([0, half - 1, half, half + 1])
    for trial in range(8):
        n = int(RNG.integers(3, 8))
        px = RNG.integers(1, 14, size=n) * ips + RNG.choice(offsets, size=n)
        py = RNG.integers(1, 14, size=n) * ips + RNG.choice(offsets, size=n)
        pts = list(zip(px.tolist(), py.tolist()))
        edges = np.array(
            [(*pts[k], *pts[(k + 1) % n]) for k in range(n)], dtype=np.int64
        )
        check_both_windings(edges)


def _stroke_edges(path, spec):
    return gshapes.strokepath(spec, path)


def test_mitre_limit_and_selfintersecting_rails():
    """Acute zig-zag strokes (mitre limit exceeded -> bevel fallback,
    shapes.ml:344-403) and self-intersecting paths produce stroke rails
    that cross themselves; the even-odd AA matte and nonzero shape must
    still match the slow oracle, and the fast batched sprite must equal
    the general renderer."""
    specs = [
        gshapes.StrokeSpec(join=gshapes.MitredJoin, mitrelimit=1.2, linewidth=5.0),
        gshapes.StrokeSpec(join=gshapes.MitredJoin, mitrelimit=20.0, linewidth=4.0),
        gshapes.StrokeSpec(join=gshapes.RoundJoin, linewidth=6.0),
    ]
    paths = [
        # Acute zig-zag: ~11 degree interior angles.
        polyline([(10.0, 30.0), (40.0, 33.0), (12.0, 36.0), (44.0, 40.0)], closed=False),
        # Self-intersecting bow-tie, closed.
        polyline([(10.0, 10.0), (50.0, 40.0), (50.0, 10.0), (10.0, 40.0)]),
        # Spike returning along itself (collinear reversal).
        polyline([(15.0, 60.0), (45.0, 60.0), (25.0, 60.0), (25.0, 80.0)], closed=False),
    ]
    for spec in specs:
        for pth in paths:
            edges = _stroke_edges(pth, spec)
            # Stroke shapes use NONZERO for the shape, EVEN_ODD for the
            # AA matte (render.ml:1002-1008) — oracle-check both.
            check_both_windings(np.asarray(edges, dtype=np.int64))
            obj = R.Obj(
                ident.new_ids(),
                R.Basic(
                    rfills.plain(C.dissolve(C.darkgreen, delta=200)),
                    R.StrokedPathShape(pth, spec),
                ),
                (),
                R.OVER,
            )
            fast = full_sprite_of_object(obj)
            cache.clear()
            # The general renderer's spriteof path (minshape flat fill +
            # even-odd AA fringe, render.ml:1198-1213) — NOT the pure-AA
            # sprite_of_basicshape, which differs by design where
            # self-intersecting rails cancel in the even-odd matte.
            general = R.render_simple_scene(
                [obj], region.shape_of_box(fast.box)
            )
            fm, gm = np.asarray(fast.mask), np.asarray(general.mask)
            fr, gr = np.asarray(fast.rgba), np.asarray(general.rgba)

            def dense(box, m, r):
                x0, y0, x1, y1 = box
                out = np.zeros((200, 200, 4), np.int64)
                h, w = m.shape
                for yy in range(h):
                    for xx in range(w):
                        fy, fx = y0 + yy, x0 + xx
                        if 0 <= fy < 200 and 0 <= fx < 200 and m[yy, xx]:
                            out[fy, fx] = r[yy, xx]
                return out
            assert np.array_equal(dense(fast.box, fm, fr), dense(general.box, gm, gr))


def test_degenerate_dot_paths():
    """A stroked path whose points all coincide degenerates to the dot
    circle of the stroke width (shapes.ml:479-509) — and must rasterize
    identically to that circle through both paths."""
    dot = polyline([(30.0, 30.0), (30.0, 30.0)], closed=False)
    # Round caps: the stroke IS the dot circle (shapes.ml:505-509).
    spec = gshapes.StrokeSpec(
        startcap=gshapes.RoundCap,
        endcap=gshapes.RoundCap,
        join=gshapes.RoundJoin,
        linewidth=8.0,
    )
    edges = np.asarray(_stroke_edges(dot, spec), dtype=np.int64)
    assert edges.size, "degenerate round-cap dot produced no edges"
    check_both_windings(edges)
    dot_circle = circle(30.0, 30.0, 4.0)
    ce = edgelist_of_path(dot_circle)
    shp_dot, _ = scanline.shapeminshape_of_unsorted_edgelist(edges, NONZERO)
    shp_circ, _ = scanline.shapeminshape_of_edgelist(np.asarray(ce, np.int64), NONZERO)
    assert shp_dot.box == shp_circ.box
    assert np.array_equal(shp_dot.mask_np(), shp_circ.mask_np())
    # Butt caps: degenerate segments clean away to nothing (shapes.ml:494-502).
    spec_b = gshapes.StrokeSpec(
        startcap=gshapes.ButtCap, endcap=gshapes.ButtCap, linewidth=8.0
    )
    assert np.asarray(_stroke_edges(dot, spec_b), dtype=np.int64).size == 0
