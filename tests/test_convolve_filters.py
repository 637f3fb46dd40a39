"""Convolution exactness vs integer reference; filter behavior tests."""

import numpy as np
import pytest

import coherence_tpu.colour as C
import coherence_tpu.transform as tr
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import convolve as rconvolve
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, filters as F, render as R


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


RNG = np.random.default_rng(11)


def random_canvas(h, w):
    a = RNG.integers(0, 256, size=(h, w, 1))
    rgb = (RNG.integers(0, 256, size=(h, w, 3)) * a) // 255
    return np.concatenate([rgb, a], axis=-1).astype(np.int32)


def ref_xy_convolve(canvas, mask, radius, values, total):
    """Direct integer transcription of convolve.ml:122-158 (x then y pass,
    zero beyond borders, truncating division, r/g clamped to alpha)."""
    h, w, _ = canvas.shape
    out1 = canvas.copy()
    pad = radius

    def sample(c, y, x):
        if 0 <= y < h and 0 <= x < w:
            return c[y, x]
        return np.zeros(4, np.int64)

    for y in range(h):
        for x in range(w):
            if not mask[y, x]:
                continue
            t = np.zeros(4, np.int64)
            for k, v in enumerate(values):
                t += sample(canvas.astype(np.int64), y, x - radius + k) * v
            q = t // total
            ta = q[3]
            out1[y, x] = [min(ta, q[0]), min(ta, q[1]), q[2], ta]
    out2 = out1.copy()
    for y in range(h):
        for x in range(w):
            if not mask[y, x]:
                continue
            t = np.zeros(4, np.int64)
            for k, v in enumerate(values):
                t += sample(out1.astype(np.int64), y - radius + k, x) * v
            q = t // total
            ta = q[3]
            out2[y, x] = [min(ta, q[0]), min(ta, q[1]), q[2], ta]
    return out2


def test_xy_convolve_exact_vs_reference():
    k = rconvolve.mkgaussian(3)
    canvas = random_canvas(24, 40)
    mask = RNG.random((24, 40)) < 0.8
    got = np.asarray(rconvolve.convolve_canvas(k, canvas, np.asarray(mask)))
    expect = ref_xy_convolve(canvas, mask, k.radius, k.values, k.total)
    assert np.array_equal(got, expect)


def test_unit_kernel_box_blur_exact():
    k = rconvolve.mkunit(2)
    canvas = random_canvas(16, 20)
    mask = np.ones((16, 20), dtype=bool)
    got = np.asarray(rconvolve.convolve_canvas(k, canvas, np.asarray(mask)))
    # x then y pass with /(2r+1) each, no clamping.
    n = 5
    c = canvas.astype(np.int64)
    padded = np.zeros((16, 20 + 4, 4), np.int64)
    padded[:, 2:-2] = c
    x1 = sum(padded[:, i : i + 20] for i in range(n)) // n
    padded2 = np.zeros((16 + 4, 20, 4), np.int64)
    padded2[2:-2, :] = x1
    y1 = sum(padded2[i : i + 16, :] for i in range(n)) // n
    assert np.array_equal(got, y1)


def test_hilo_split_large_kernel_exact():
    # Radius big enough that sum(w)*255 exceeds 2^24 — exercises the split.
    r = 60
    k = rconvolve.mkgaussian(r)
    assert sum(k.values) * 255 >= (1 << 24)
    canvas = random_canvas(8, 140)
    mask = np.ones((8, 140), dtype=bool)
    got = np.asarray(rconvolve.convolve_canvas(k, canvas, np.asarray(mask)))
    expect = ref_xy_convolve(canvas, mask, k.radius, k.values, k.total)
    assert np.array_equal(got, expect)


def test_gaussian_kernel_values():
    k = rconvolve.mkgaussian(5)
    assert k.radius == 5
    assert k.values[5] == int(100 * np.exp(0.0) / 2 + 0.5)
    assert k.values[0] == k.values[-1]


def test_convolve_sprite_roundtrip_box():
    spr = region.fillshape(region.shape_of_box((10, 10, 29, 29)), rfills.plain(C.red))
    k = rconvolve.mkgaussian(2)
    out = rconvolve.convolve_sprite(k, spr)
    assert out is not None
    # Result covers the bloated shape.
    x0, y0, x1, y1 = out.box
    assert x0 <= 8 and x1 >= 31
    # Interior far from the edge stays pure red (all samples equal).
    rgba = np.asarray(out.rgba)
    w, h = out.wh
    centre = rgba[20 - y0, 20 - x0]
    assert tuple(centre) == C.rgba_of_colour(C.red)


# --- filters ---------------------------------------------------------------


def circle_obj(x, y, r, colour, alpha=255):
    return R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.dissolve(colour, delta=alpha)), R.PathShape(gshapes.circle(x, y, r))),
        (),
        R.OVER,
    )


def rect_geom(colour, x, y, w, h):
    return R.Basic(rfills.plain(colour), R.rectangle(x, y, w, h))


BOX = (1, 1, 80, 80)


def dense(spr):
    out = np.zeros((80, 80, 4), np.int32)
    if spr is None:
        return out
    w, h = spr.wh
    m = np.asarray(spr.mask)[:h, :w]
    r = np.asarray(spr.rgba)[:h, :w]
    ox, oy = spr.box[0] - 1, spr.box[1] - 1
    sub = out[oy : oy + h, ox : ox + w]
    sub[m] = r[m]
    return out


def test_hole_filter_cuts_scene():
    below = circle_obj(40, 40, 20, C.red)
    holeobj = R.Obj(ident.new_ids(), F.hole(rect_geom(C.white, 30, 30, 20, 20)), (), R.OVER)
    img = dense(R.render_simple_scene([holeobj, below], region.shape_of_box(BOX)))
    # Inside the hole: nothing (the scene below is removed).
    assert tuple(img[40, 40]) == (0, 0, 0, 0)
    # Outside the hole but inside the circle: red.
    assert tuple(img[40, 25]) == C.rgba_of_colour(C.red)


def test_monochrome_filter():
    below = circle_obj(40, 40, 20, C.red)
    mono = R.Obj(ident.new_ids(), F.monochrome(rect_geom(C.white, 30, 30, 20, 20)), (), R.OVER)
    img = dense(R.render_simple_scene([mono, below], region.shape_of_box(BOX)))
    grey = C.rgba_of_colour(C.monochrome(C.red))
    assert tuple(img[40, 40]) == grey
    assert tuple(img[40, 25]) == C.rgba_of_colour(C.red)


def test_blur_filter_softens():
    below = circle_obj(40, 40, 12, C.red)
    blur = R.Obj(
        ident.new_ids(),
        F.blur(rect_geom(C.white, 25, 25, 30, 30), rconvolve.mkgaussian(3)),
        (),
        R.OVER,
    )
    img_f = dense(R.render_simple_scene([blur, below], region.shape_of_box(BOX)))
    cache.clear()
    img_n = dense(R.render_simple_scene([below], region.shape_of_box(BOX)))
    # At the circle's edge inside the filter, blur bleeds red outward.
    assert img_f[40, 53, 0] > 0 and img_n[40, 53, 0] == 0
    # Far outside the filter box, the scene is unchanged.
    assert np.array_equal(img_f[70:, :], img_n[70:, :])


def test_minus_filter_removes_top_object():
    below = circle_obj(40, 40, 20, C.red)
    under = circle_obj(40, 40, 30, C.blue)
    minus = R.Obj(ident.new_ids(), F.minus(rect_geom(C.white, 30, 30, 20, 20)), (), R.OVER)
    img = dense(R.render_simple_scene([minus, below, under], region.shape_of_box(BOX)))
    # Inside the filter: the top object (red circle) is removed -> blue shows.
    assert tuple(img[40, 40]) == C.rgba_of_colour(C.blue)
    # Outside the filter: red on top.
    assert tuple(img[40, 25]) == C.rgba_of_colour(C.red)


def test_swapdepth_filter():
    a = circle_obj(38, 40, 15, C.red)
    b = circle_obj(46, 40, 15, C.blue)
    swap = R.Obj(
        ident.new_ids(),
        F.swapdepth(a.idset, b.idset, rect_geom(C.white, 20, 20, 44, 44)),
        (),
        R.OVER,
    )
    img = dense(R.render_simple_scene([swap, a, b], region.shape_of_box(BOX)))
    # In the overlap region inside the filter, blue now wins.
    assert tuple(img[40, 42]) == C.rgba_of_colour(C.blue)


def test_wireframe_filter():
    below = circle_obj(40, 40, 15, C.red)
    wf = R.Obj(
        ident.new_ids(),
        F.wireframe(
            rect_geom(C.white, 20, 20, 40, 40),
            gshapes.StrokeSpec(linewidth=1.0, join=gshapes.BevelJoin),
            rfills.plain(C.black),
        ),
        (),
        R.OVER,
    )
    img = dense(R.render_simple_scene([wf, below], region.shape_of_box(BOX)))
    # Centre of the circle inside the filter: no fill (wireframe only).
    assert tuple(img[40, 40]) == (0, 0, 0, 0)
    # The outline ring near radius 15 is inked.
    ring = img[40, 24:27, 3]
    assert ring.max() > 0


def test_affine_filter_transforms_scene_below():
    below = circle_obj(30, 40, 10, C.red)
    aff = R.Obj(
        ident.new_ids(),
        F.affine([tr.Translate(20.0, 0.0)], rect_geom(C.white, 10, 10, 70, 60)),
        (),
        R.OVER,
    )
    img = dense(R.render_simple_scene([aff, below], region.shape_of_box(BOX)))
    # The circle appears translated by +20 in x inside the filter.
    assert tuple(img[40, 50]) == C.rgba_of_colour(C.red)
    assert tuple(img[40, 30]) != C.rgba_of_colour(C.red)


def test_rgb_filter_shifts_channels():
    below = circle_obj(40, 40, 12, C.white)
    flt = R.Obj(
        ident.new_ids(),
        F.rgb(
            rect_geom(C.white, 20, 20, 40, 40),
            (
                lambda c: [tr.Translate(6.0, 0.0)],
                lambda c: [tr.Translate(-6.0, 0.0)],
                lambda c: [tr.Translate(0.0, 0.0)],
            ),
            R.FILTER_PLAIN,
        ),
        (),
        R.OVER,
    )
    img = dense(R.render_simple_scene([flt, below], region.shape_of_box(BOX)))
    # Left of the circle: green-shifted copy only.
    left = img[40, 30]
    right = img[40, 50]
    assert left[1] >= left[0] and right[0] >= right[1]


def test_filter_dirty_composition():
    below = circle_obj(40, 40, 10, C.red)
    blur = R.Obj(
        ident.new_ids(),
        F.blur(rect_geom(C.white, 25, 25, 30, 30), rconvolve.mkgaussian(3)),
        (),
        R.OVER,
    )
    scene = [blur, below]
    initial = region.shape_of_box((38, 38, 42, 42))
    out = R.dirty_filter(below.idset, initial, scene)
    # The blur's dirty fn bloats within the filter.
    assert region.shapesize(out) >= region.shapesize(initial)
    assert region.is_null_shape(region.shape_difference(initial, out))


def test_weight_limbs_byte_planes():
    # Byte-limb split: every digit bf16-exact, reconstruction exact.  This
    # is what keeps the MXU conv bit-exact for weights > 255 (e.g. the
    # radius-16 Gaussian's 265/319 taps, caught by the TPU kernel gate).
    for w in [(1, 2, 1), (265, 319, 512), (70000, 140000, 70000), (0, 0, 0)]:
        limbs = rconvolve._weight_limbs(np.asarray(w))
        recon = [0] * len(w)
        for shift, digits in limbs:
            assert all(0 <= d <= 255 for d in digits)
            for i, d in enumerate(digits):
                recon[i] += d << shift
        assert tuple(recon) == w


def test_radius16_gaussian_exact():
    # Weights 265/319 are not bf16-exact; the limb split must keep the conv
    # integer-exact (differential vs the slow int64 oracle).
    k = rconvolve.mkgaussian(16)
    assert max(k.values) > 255
    canvas = random_canvas(12, 80)
    mask = np.ones((12, 80), dtype=bool)
    got = np.asarray(rconvolve.convolve_canvas(k, canvas, np.asarray(mask)))
    expect = ref_xy_convolve(canvas, mask, k.radius, k.values, k.total)
    assert np.array_equal(got, expect)
