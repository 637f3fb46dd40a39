"""Shape/Sprite dense-region algebra tests (vs brute-force numpy masks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from coherence_tpu import colour as C
from coherence_tpu.raster import region as R
from coherence_tpu.raster import fills


RNG = np.random.default_rng(3)


def random_shape(lo=0, hi=60):
    x0, y0 = RNG.integers(lo, hi, 2)
    w, h = RNG.integers(1, 40, 2)
    mask = RNG.random((h, w)) < 0.5
    if not mask.any():
        mask[0, 0] = True
    return R.shape_of_mask((int(x0), int(y0), int(x0) + w - 1, int(y0) + h - 1), mask)


def dense(s, box):
    """Shape -> dense bool over box."""
    x0, y0, x1, y1 = box
    out = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
    if s is None:
        return out
    m = s.mask_np()
    sx0, sy0, sx1, sy1 = s.box
    out[sy0 - y0 : sy1 - y0 + 1, sx0 - x0 : sx1 - x0 + 1] = m
    return out


UNIVERSE = (-20, -20, 140, 140)


@pytest.mark.parametrize("trial", range(8))
def test_set_algebra(trial):
    a = random_shape()
    b = random_shape()
    da, db = dense(a, UNIVERSE), dense(b, UNIVERSE)
    assert np.array_equal(dense(R.shape_union(a, b), UNIVERSE), da | db)
    assert np.array_equal(dense(R.shape_difference(a, b), UNIVERSE), da & ~db)
    assert np.array_equal(dense(R.shape_intersection(a, b), UNIVERSE), da & db)


def test_null_cases():
    a = random_shape()
    assert R.shape_union(a, None) is a
    assert R.shape_union(None, a) is a
    assert R.shape_difference(None, a) is None
    assert R.shape_difference(a, None) is a
    assert R.shape_intersection(a, None) is None
    # Difference with itself is null (lazily: empty mask).
    assert R.is_null_shape(R.shape_difference(a, a))


def test_translate_and_point_in_shape():
    m = np.zeros((5, 5), dtype=bool)
    m[2, 3] = True
    s = R.shape_of_mask((10, 10, 14, 14), m)
    assert R.point_in_shape(s, (13, 12))
    assert not R.point_in_shape(s, (10, 10))
    t = R.translate_shape(5, -3, s)
    assert R.point_in_shape(t, (18, 9))
    assert t.box == (15, 7, 19, 11)


def test_boxshape_tightens():
    m = np.zeros((10, 10), dtype=bool)
    m[3:5, 4:8] = True
    s = R.Shape((0, 0, 9, 9), R._pad_mask(m))
    t = R.boxshape(s)
    assert t.box == (4, 3, 7, 4)
    assert t.mask_np().all()


def test_bloat_erode():
    m = np.zeros((7, 7), dtype=bool)
    m[3, 3] = True
    s = R.shape_of_mask((0, 0, 6, 6), m)
    b = R.bloat(2, 1, s)
    db = dense(b, UNIVERSE)
    expect = np.zeros_like(db)
    expect[22 : 22 + 3, 21 : 21 + 5] = True  # rows 3±1 cols 3±2 shifted by 20
    assert np.array_equal(db, expect)
    # erode(bloat(x)) over a solid block recovers the block.
    solid = R.shape_of_box((5, 5, 14, 14))
    be = R.erode(2, 2, R.bloat(2, 2, solid))
    assert np.array_equal(dense(be, UNIVERSE), dense(solid, UNIVERSE))


def test_fillshape_and_shape_of_sprite():
    s = R.shape_of_box((3, 4, 10, 9))
    fill = fills.plain(C.mkcol(10, 20, 30))
    spr = R.fillshape(s, fill)
    assert spr.box == s.box
    sh = R.shape_of_sprite(spr)
    assert np.array_equal(sh.mask_np(), s.mask_np())
    rgba = np.asarray(spr.rgba)
    assert tuple(rgba[0, 0]) == (10, 20, 30, 255)


def test_portion():
    s = R.shape_of_box((0, 0, 9, 9))
    spr = R.fillshape(s, fills.plain(C.red))
    clip = R.shape_of_box((5, 5, 20, 20))
    p = R.portion(spr, clip)
    assert p.box == (5, 5, 9, 9)
    assert p.mask_np().all() if hasattr(p, "mask_np") else np.asarray(p.mask)[:5, :5].all()


def test_caf_over_and_opaque_shape():
    a_shape = R.shape_of_box((0, 0, 7, 7))
    b_shape = R.shape_of_box((4, 4, 11, 11))
    a = R.fillshape(a_shape, fills.plain(C.dissolve(C.red, delta=128)))
    b = R.fillshape(b_shape, fills.plain(C.blue))
    out, opaque = R.caf("over", "opaque", a, b)
    assert out.box == (0, 0, 11, 11)
    rgba = np.asarray(out.rgba)
    mask = np.asarray(out.mask)
    # a-only region: translucent red.
    ra = C.rgba_of_colour(C.dissolve(C.red, delta=128))
    assert tuple(rgba[0, 0]) == ra
    # b-only region: opaque blue.
    assert tuple(rgba[10, 10]) == C.rgba_of_colour(C.blue)
    # overlap: over(a, b)
    expect = C.rgba_of_colour(
        C.over(C.dissolve(C.red, delta=128), C.blue)
    )
    assert tuple(rgba[5, 5]) == expect
    # opaque shape includes b-only and overlap (alpha 255), not a-only.
    dop = dense(opaque, UNIVERSE)
    assert dop[20 + 10, 20 + 10] and dop[20 + 5, 20 + 5] and not dop[20 + 0, 20 + 0]


def test_caf_nocover_disjoint():
    a = R.fillshape(R.shape_of_box((0, 0, 3, 3)), fills.plain(C.red))
    b = R.fillshape(R.shape_of_box((10, 10, 13, 13)), fills.plain(C.blue))
    out, _ = R.caf("nocover", "opaque", a, b)
    rgba = np.asarray(out.rgba)
    assert tuple(rgba[0, 0]) == C.rgba_of_colour(C.red)
    assert tuple(rgba[10, 10]) == C.rgba_of_colour(C.blue)
    # Debug mode raises on overlap.
    R.debug_spritecheck = True
    try:
        c = R.fillshape(R.shape_of_box((2, 2, 5, 5)), fills.plain(C.blue))
        with pytest.raises(C.Nocover):
            R.caf("nocover", "opaque", a, c)
    finally:
        R.debug_spritecheck = False


def test_flatten_pickup_roundtrip():
    s = R.shape_of_box((5, 6, 12, 13))
    spr = R.fillshape(s, fills.plain(C.green))
    canvas = R.flatten_sprite(2, spr, C.clear)
    assert canvas.origin == (3, 4)
    back = R.pickup(R.shape_of_sprite(spr), canvas)
    assert np.array_equal(np.asarray(back.rgba), np.asarray(spr.rgba))


def test_sprite_map_and_map_coords():
    s = R.shape_of_box((0, 0, 3, 3))
    spr = R.fillshape(s, fills.plain(C.red))
    mono = R.sprite_map(C.monochrome_rgba, spr)
    rgba = np.asarray(mono.rgba)
    assert tuple(rgba[0, 0]) == C.rgba_of_colour(C.monochrome(C.red))

    def f(ys, xs, rgba):
        return jnp.where((xs % 2 == 0)[..., None], rgba, 0)

    striped = R.map_coords(f, spr)
    rs = np.asarray(striped.rgba)
    assert tuple(rs[0, 0]) == C.rgba_of_colour(C.red)
    assert tuple(rs[0, 1]) == (0, 0, 0, 0)


def test_fill_image_device_matches_host():
    import jax.numpy as jnp
    import numpy as np
    from coherence_tpu.raster import fills as rfills
    import coherence_tpu.colour as C

    for f in [
        rfills.plain(C.crimson),
        rfills.gradient((2.0, 3.0), (30.0, 9.0), True, False, C.red, C.blue),
        rfills.radial((10.0, 10.0), (10.0, 10.0), (18.0, 10.0), False, True, C.green, C.yellow),
    ]:
        box = (3, 4, 34, 23)
        H, W = 20, 32
        host = np.asarray(f.image(box, H, W), dtype=np.int32)
        # image_device may return a (1, 1, 4) constant, broadcastable to plane.
        dev = np.broadcast_to(np.asarray(f.image_device(box, H, W)), (H, W, 4))
        assert np.array_equal(host, dev), type(f).__name__
