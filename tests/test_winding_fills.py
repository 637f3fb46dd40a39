"""Winding-rule semantics (self-intersecting star) and gradient/radial fill
pixel correctness."""

import math

import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu import ident
from coherence_tpu.geometry import path as gpath
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, render as R


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def star_path(winding, cx=50.0, cy=50.0, r=40.0):
    """Classic 5-point self-intersecting star (pentagram)."""
    pts = []
    for k in range(5):
        a = -math.pi / 2 + k * 4.0 * math.pi / 5.0
        pts.append((cx + r * math.cos(a), cy + r * math.sin(a)))
    return gpath.path_of_pointlist(winding, pts)


def dense(spr, box):
    x0, y0, x1, y1 = box
    out = np.zeros((y1 - y0 + 1, x1 - x0 + 1, 4), np.int32)
    if spr is None:
        return out
    w, h = spr.wh
    m = np.asarray(spr.mask)[:h, :w]
    r = np.asarray(spr.rgba)[:h, :w]
    sub = out[spr.box[1] - y0 : spr.box[1] - y0 + h, spr.box[0] - x0 : spr.box[0] - x0 + w]
    sub[m] = r[m]
    return out


BOX = (1, 1, 100, 100)


def test_star_nonzero_fills_centre_evenodd_does_not():
    blue = C.rgba_of_colour(C.blue)
    imgs = {}
    for winding in (gpath.NONZERO, gpath.EVEN_ODD):
        cache.clear()
        obj = R.Obj(
            ident.new_ids(),
            R.Basic(rfills.plain(C.blue), R.PathShape(star_path(winding))),
            (),
            R.OVER,
        )
        spr = R.render_simple_scene([obj], region.shape_of_box(BOX))
        imgs[winding] = dense(spr, BOX)
    # Pentagram centre: inside under nonzero, a hole under even-odd.
    assert tuple(imgs[gpath.NONZERO][50 - 1, 50 - 1]) == blue
    assert tuple(imgs[gpath.EVEN_ODD][50 - 1, 50 - 1]) == (0, 0, 0, 0)
    # A point inside one of the star's arms is filled under both.
    assert tuple(imgs[gpath.NONZERO][20, 49]) == blue
    assert tuple(imgs[gpath.EVEN_ODD][20, 49]) == blue


def test_gradient_fill_pixels_exact():
    fill = rfills.gradient((10.0, 0.0), (90.0, 0.0), False, False, C.red, C.blue)
    img = fill.image((1, 1, 100, 100), 100, 128)
    # Before the axis start (x < 10): clear (no extend).
    assert tuple(img[0, 4]) == (0, 0, 0, 0)
    # After the end: clear.
    assert tuple(img[0, 95]) == (0, 0, 0, 0)
    # Exact formula at x=50 (pixel index 49 -> x coordinate 50):
    xp = (50.0 - 10.0) / 80.0
    alpha = 255 - int(xp * 255.0)
    expect = C.rgba_of_colour(C.dissolve_between(a=C.red, b=C.blue, alpha=alpha))
    assert tuple(img[0, 49]) == expect
    # At the start point exactly: pure red.
    assert tuple(img[0, 9]) == C.rgba_of_colour(C.red)


def test_gradient_extend_flags():
    fill = rfills.gradient((10.0, 0.0), (90.0, 0.0), True, True, C.red, C.blue)
    img = fill.image((1, 1, 100, 1), 1, 128)
    assert tuple(img[0, 2]) == C.rgba_of_colour(C.red)
    assert tuple(img[0, 97]) == C.rgba_of_colour(C.blue)


def test_radial_fill_pixels_exact():
    fill = rfills.radial(
        (50.0, 50.0), (50.0, 50.0), (90.0, 50.0), True, True, C.white, C.black
    )
    img = fill.image((1, 1, 100, 100), 100, 128)
    # Centre: start colour.
    assert tuple(img[49, 49]) == C.rgba_of_colour(C.white)
    # Beyond the outer radius with extend: end colour.
    assert tuple(img[49, 97]) == C.rgba_of_colour(C.black)
    # Exact mid formula at distance 20 (x=70, y=50):
    t = 20.0 / 40.0
    alpha = 255 - int(t * 255.0)
    expect = C.rgba_of_colour(C.dissolve_between(a=C.white, b=C.black, alpha=alpha))
    assert tuple(img[49, 69]) == expect


def test_gradient_transform_moves_axis():
    import coherence_tpu.transform as tr

    fill = rfills.gradient((0.0, 0.0), (10.0, 0.0), True, True, C.red, C.blue)
    moved = fill.transform([tr.Translate(20.0, 0.0)])
    assert moved.p0 == (20.0, 0.0) and moved.p1 == (30.0, 0.0)
    changed = fill.changecolour(lambda c: C.dissolve(c, delta=128))
    assert C.alpha_of_colour(changed.cs) == 128


def test_fill_single_matches_image():
    fill = rfills.gradient((5.0, 5.0), (60.0, 40.0), True, False, C.green, C.purple)
    for (x, y) in [(10, 10), (30, 20), (55, 38), (80, 80)]:
        c = fill.single(x, y)
        img = fill.image((x, y, x, y), 1, 128)
        assert C.rgba_of_colour(c) == tuple(int(v) for v in img[0, 0])
