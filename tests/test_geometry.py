"""Geometry layer tests: bezier subdivision, path points, shapes, stroker."""

import math

import numpy as np
import pytest

from coherence_tpu import coord
from coherence_tpu import transform as tr
from coherence_tpu.geometry import (
    EVEN_ODD,
    NONZERO,
    Bezier,
    Straight,
    StrokeSpec,
    ButtCap,
    RoundCap,
    RoundJoin,
    MitredJoin,
    bezier_split,
    bezier_subdivide,
    bounds_polygon,
    circle,
    edgelist_of_path,
    path_of_pointlist,
    path_proper_bounds,
    points_on_path,
    rectangle,
    strokepath,
    strokepath_polygon,
    bounds_stroke,
    kappa,
)
from coherence_tpu.geometry.path import bezier_epsilon, transform_path


def test_coord_model():
    assert coord.ipspacing == 32 and coord.halfips == 16
    assert coord.right_of_pix(1) == 32
    assert coord.left_of_pix(1) == 1
    assert coord.pix_of_sub(1) == 1
    assert coord.pix_of_sub(32) == 1
    assert coord.pix_of_sub(33) == 2
    # sub_of_float: centre of pixel 1 is 0.5 -> subbin 0? ceil(16-16)=0
    assert coord.sub_of_float(1.0) == 16
    assert coord.pix_of_float(1.0) == 1
    assert coord.pix_of_float(0.4) == 0
    # vectorized agrees with scalar
    fs = np.linspace(-5, 5, 333)
    assert all(coord.sub_of_float_np(fs)[i] == coord.sub_of_float(float(fs[i])) for i in range(333))
    ns = np.arange(-200, 200)
    assert all(coord.pix_of_sub_np(ns)[i] == coord.pix_of_sub(int(ns[i])) for i in range(400))


def test_bezier_subdivide_flat_chords():
    flat = bezier_epsilon(0.2)
    chords = bezier_subdivide(flat, (0, 0), (30, 40), (70, 40), (100, 0))
    # Chords connect start to end, in order.
    assert chords[0][0] == (0, 0)
    assert chords[-1][1] == (100, 0)
    for k in range(len(chords) - 1):
        assert chords[k][1] == chords[k + 1][0]
    # Every chord midpoint is within epsilon-ish of the curve (loose check).
    assert len(chords) > 4


def test_bezier_split():
    b = Bezier((0, 0), (1, 2), (3, 2), (4, 0))
    l, r = bezier_split(0.5, b)
    assert l.p1 == (0, 0) and r.p4 == (4, 0)
    assert l.p4 == r.p1


def test_points_on_path_spacing():
    p = path_of_pointlist(NONZERO, [(0, 0), (100, 0), (100, 100), (0, 100)])
    pts = points_on_path(10.0, p)
    # Perimeter 400 -> 40 points at spacing 10.
    assert len(pts) == 40
    # All points on the rectangle boundary.
    for (x, y) in pts:
        on = (
            abs(y) < 1e-9 or abs(y - 100) < 1e-9 or abs(x) < 1e-9 or abs(x - 100) < 1e-9
        )
        assert on, (x, y)


def test_circle_and_bounds():
    c = circle(100.0, 100.0, 50.0)
    xmin, xmax, ymin, ymax = path_proper_bounds(c)
    assert 49 <= xmin <= 51 and 149 <= xmax <= 151
    bx0, bx1, by0, by1 = bounds_polygon(c)
    assert bx0 <= coord.pix_of_float(50.5) and bx1 >= coord.pix_of_float(149.5)


def test_rectangle_edges():
    r = rectangle(10.0, 20.0, 30.0, 40.0)
    e = edgelist_of_path(r)
    assert e.shape == (4, 4)
    xmin, xmax, ymin, ymax = path_proper_bounds(r)
    assert (xmin, xmax, ymin, ymax) == (10.0, 40.0, 20.0, 60.0)


def test_transform_path():
    r = rectangle(0.0, 0.0, 10.0, 10.0)
    r2 = transform_path([tr.Translate(5.0, 7.0)], r)
    xmin, xmax, ymin, ymax = path_proper_bounds(r2)
    assert (xmin, xmax, ymin, ymax) == (5.0, 15.0, 7.0, 17.0)


def test_stroke_straight_line_bounds():
    p = (NONZERO, [(False, False, (Straight((0.0, 0.0), (100.0, 0.0)),))])
    from coherence_tpu.geometry.path import mkpath

    path = mkpath(*p)
    spec = StrokeSpec(startcap=ButtCap, endcap=ButtCap, join=MitredJoin, mitrelimit=10.0, linewidth=4.0)
    outline = strokepath_polygon(spec, path)
    xmin, xmax, ymin, ymax = path_proper_bounds(outline)
    assert abs(ymin + 2.0) < 1e-6 and abs(ymax - 2.0) < 1e-6
    assert abs(xmin) < 1e-6 and abs(xmax - 100.0) < 1e-6
    edges = strokepath(spec, path)
    assert edges.shape[0] >= 4


def test_stroke_degenerate_dot():
    from coherence_tpu.geometry.path import mkpath

    path = mkpath(NONZERO, [(False, False, (Straight((5.0, 5.0), (5.0, 5.0)),))])
    spec = StrokeSpec(startcap=RoundCap, endcap=RoundCap, join=RoundJoin, mitrelimit=10.0, linewidth=4.0)
    outline = strokepath_polygon(spec, path)
    xmin, xmax, ymin, ymax = path_proper_bounds(outline)
    assert abs(xmin - 3.0) < 0.1 and abs(xmax - 7.0) < 0.1


def test_stroke_corner_join():
    from coherence_tpu.geometry.path import mkpath

    path = mkpath(
        NONZERO,
        [(False, False, (Straight((0.0, 0.0), (50.0, 0.0)), Straight((50.0, 0.0), (50.0, 50.0))))],
    )
    for join in (RoundJoin, MitredJoin, "beveljoin"):
        spec = StrokeSpec(startcap=ButtCap, endcap=ButtCap, join=join, mitrelimit=10.0, linewidth=6.0)
        outline = strokepath_polygon(spec, path)
        xmin, xmax, ymin, ymax = path_proper_bounds(outline)
        assert xmax >= 52.9, join
        assert ymax >= 49.9, join


def test_bounds_stroke_oversize():
    from coherence_tpu.geometry.path import mkpath

    path = mkpath(NONZERO, [(False, False, (Straight((0.0, 0.0), (10.0, 0.0)),))])
    spec = StrokeSpec(linewidth=4.0, join=RoundJoin)
    bx0, bx1, by0, by1 = bounds_stroke(path, spec)
    assert bx0 <= -2 and by0 <= -2


def test_kappa():
    assert abs(kappa - 0.5523) < 1e-3
