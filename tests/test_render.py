"""HSR renderer semantics: early-terminating front-to-back rendering must be
pixel-identical to naive back-to-front compositing; cache translation reuse;
dirty regions; CPG; picking."""

import numpy as np
import pytest

import coherence_tpu.colour as C
import coherence_tpu.transform as tr
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, render as R


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def circle_obj(x, y, r, colour, alpha=255):
    fill = rfills.plain(C.dissolve(colour, delta=alpha))
    return R.Obj(
        ident.new_ids(), R.Basic(fill, R.PathShape(gshapes.circle(x, y, r))), (), R.OVER
    )


def rect_obj(x, y, w, h, colour, alpha=255):
    fill = rfills.plain(C.dissolve(colour, delta=alpha))
    return R.Obj(ident.new_ids(), R.Basic(fill, R.rectangle(x, y, w, h)), (), R.OVER)


def naive_composite(scene, box):
    """Front-to-back full compositing with NO early termination and no
    update-shape minimisation — the renderer's fold order (integer `over` is
    not exactly associative, so the fold direction must match) but none of
    its occlusion machinery.  Equality with render_simple_scene proves the
    early termination is output-invariant."""
    acc = None
    for o in scene:
        shp, minshp = R.shape_of_basicshape(o)
        shp = region.shape_intersection(shp, region.shape_of_box(box))
        if shp is None:
            continue
        minshp = region.shape_intersection(minshp, region.shape_of_box(box))
        maxshape = region.shape_difference(shp, minshp)
        fill = R.fillin_obj(o).transform(list(o.transform))
        fringe = R.sprite_of_basicshape(o, maxshape, scene) if maxshape is not None else None
        interior = region.fillshape(minshp, fill) if minshp is not None else None
        spr, _ = region.caf("nocover", "opaque", interior, fringe)
        if spr is None:
            continue
        acc, _ = region.caf("over", "opaque", acc, spr)
    return acc


def dense_rgba(spr, box):
    x0, y0, x1, y1 = box
    out = np.zeros((y1 - y0 + 1, x1 - x0 + 1, 4), dtype=np.int32)
    if spr is None:
        return out
    w, h = spr.wh
    m = np.asarray(spr.mask)[:h, :w]
    r = np.asarray(spr.rgba)[:h, :w]
    sx0, sy0, sx1, sy1 = spr.box
    ox, oy = sx0 - x0, sy0 - y0
    sub = out[oy : oy + h, ox : ox + w]
    sub[m] = r[m]
    return out


BOX = (1, 1, 96, 96)


def test_hsr_equals_naive_opaque_stack():
    scene = [
        circle_obj(40, 40, 25, C.red),
        circle_obj(50, 50, 25, C.green),
        circle_obj(60, 60, 25, C.blue),
        rect_obj(10, 10, 80, 80, C.white),
    ]
    got = R.render_simple_scene(scene, region.shape_of_box(BOX))
    expect = naive_composite(scene, BOX)
    assert np.array_equal(dense_rgba(got, BOX), dense_rgba(expect, BOX))


def test_hsr_equals_naive_translucent_stack():
    scene = [
        circle_obj(40, 40, 25, C.red, alpha=120),
        circle_obj(50, 50, 25, C.green, alpha=200),
        rect_obj(20, 20, 60, 60, C.blue, alpha=255),
        rect_obj(5, 5, 90, 90, C.yellow, alpha=90),
    ]
    got = R.render_simple_scene(scene, region.shape_of_box(BOX))
    expect = naive_composite(scene, BOX)
    assert np.array_equal(dense_rgba(got, BOX), dense_rgba(expect, BOX))


def test_early_termination_skips_occluded():
    """A fully opaque rect on top must stop the object below from being
    rasterized (observable through the cache: no sprite is stored for it)."""
    below = circle_obj(40, 40, 20, C.red)
    top = rect_obj(1, 1, 95, 95, C.black)
    # Render region strictly inside the opaque rect's minshape.
    inner = region.shape_of_box((30, 30, 60, 60))
    R.render_simple_scene([top, below], inner)
    assert cache.getsprite(top.idset) is not None
    assert cache.getsprite(below.idset) is None  # never rasterized


def test_cache_translation_reuses_raster():
    obj = circle_obj(30, 30, 15, C.green)
    R.render_simple_scene([obj], region.shape_of_box(BOX))
    spr0 = cache.getsprite(obj.idset)
    assert spr0 is not None
    moved = R.translate_renderobject(10, 5, obj)
    got = cache.getsprite(moved.idset)
    assert got is not None
    spr1, _ = got
    assert spr1.box == (
        spr0[0].box[0] + 10,
        spr0[0].box[1] + 5,
        spr0[0].box[2] + 10,
        spr0[0].box[3] + 5,
    )
    # Same underlying raster array (zero-copy reuse).
    assert spr1.rgba is spr0[0].rgba


def test_translated_render_matches_fresh():
    obj = circle_obj(30, 30, 15, C.purple)
    a = R.render_simple_scene([obj], region.shape_of_box(BOX))
    moved = R.translate_renderobject(12, 7, obj)
    b = R.render_simple_scene([moved], region.shape_of_box(BOX))
    cache.clear()
    fresh_obj = R.Obj(ident.new_ids(), moved.geometry, moved.transform, moved.compop)
    c = R.render_simple_scene([fresh_obj], region.shape_of_box(BOX))
    db, dc = dense_rgba(b, BOX), dense_rgba(c, BOX)
    assert np.array_equal(db, dc)


def test_pretrans_compop():
    obj = R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.red), R.rectangle(10, 10, 40, 40)),
        (),
        R.PreTrans(0.5, R.OVER),
    )
    got = R.render_simple_scene([obj], region.shape_of_box(BOX))
    img = dense_rgba(got, BOX)
    centre = img[30, 30]
    expect = C.rgba_of_colour(C.dissolve(C.red, delta=127))
    assert tuple(centre) == expect


def test_group_render_and_bounds():
    g = R.mkgroup([circle_obj(30, 30, 10, C.red), circle_obj(60, 60, 10, C.blue)])
    xmin, xmax, ymin, ymax = R.bounds_of_basicshape(g)
    assert xmin <= 20 and xmax >= 70
    got = R.render_simple_scene([g], region.shape_of_box(BOX))
    img = dense_rgba(got, BOX)
    assert tuple(img[30, 30]) == C.rgba_of_colour(C.red)
    assert tuple(img[60, 60]) == C.rgba_of_colour(C.blue)


def test_cpg_shapes_and_render():
    a = R.PathShape(gshapes.circle(40.0, 40.0, 20.0))
    b = R.PathShape(gshapes.circle(55.0, 40.0, 20.0))
    for op in (R.UNION, R.INTERSECTION, R.SUBTRACTION, R.EXCLUSIVE_OR):
        obj = R.Obj(
            ident.new_ids(), R.Basic(rfills.plain(C.blue), R.CPG(op, a, b)), (), R.OVER
        )
        got = R.render_simple_scene([obj], region.shape_of_box(BOX))
        img = dense_rgba(got, BOX)
        left = tuple(img[40, 25])  # only in a
        mid = tuple(img[40, 47])  # in both
        right = tuple(img[40, 70])  # only in b
        blue = C.rgba_of_colour(C.blue)
        clearpx = (0, 0, 0, 0)
        if op == R.UNION:
            assert left == blue and mid == blue and right == blue
        elif op == R.INTERSECTION:
            assert left == clearpx and mid == blue and right == clearpx
        elif op == R.SUBTRACTION:
            assert left == blue and mid == clearpx
        else:
            assert left == blue and mid == clearpx and right == blue


def test_dirty_region_plain_vs_fancy():
    obj = circle_obj(40, 40, 15, C.red)
    moved = R.translate_renderobject(5, 0, obj)
    u = region.shape_of_box(BOX)
    d = R.dirty_region(obj, moved)(u)
    assert d is not None
    # Dirty region is bounded by the union of old and new shapes.
    total = region.shape_union(
        R.shapeonly_of_basicshape(obj), R.shapeonly_of_basicshape(moved)
    )
    assert region.is_null_shape(region.shape_difference(d, total))


def test_pick_topmost():
    below = circle_obj(40, 40, 20, C.red)
    top = circle_obj(45, 45, 20, C.blue)
    view = R.View(scene=[top, below])
    picked = R.pick(45, 45, view)
    assert isinstance(picked, R.PickedObject)
    assert picked.obj is top
    picked2 = R.pick(25, 33, view)  # only in below
    assert picked2 is not None and picked2.obj is below
    assert R.pick(90, 90, view) is R.PickedNone


def test_selection_drawable_and_handles():
    obj = rect_obj(30, 30, 30, 30, C.red)
    sel = (R.Size, ([obj], R.handles_size()))
    drawable = R.drawable_of_selection(sel)
    assert len(drawable) == 12  # 8 arrows + 4 rectangle edges
    h = R.renderobject_of_handle(sel, R.HandleTopLeft)
    assert h is not None
    # Picking a handle works through a view.
    view = R.View(scene=[obj], selections=sel)
    xmin, xmax, ymin, ymax = R.proper_bounds(h)
    cx, cy = int((xmin + xmax) / 2), int((ymin + ymax) / 2)
    got = R.pick(cx, cy, view)
    assert isinstance(got, R.PickedSelectionHandle)
