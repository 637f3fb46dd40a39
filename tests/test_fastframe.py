"""DeviceView: tiled fast path must match the general renderer, and dirty
tracking must keep incremental updates identical to full re-renders."""

import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, render as R
from coherence_tpu.scene.fastframe import DeviceView, full_sprite_of_object


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def circle_obj(x, y, r, colour, alpha=255):
    return R.Obj(
        ident.new_ids(),
        R.Basic(
            rfills.plain(C.dissolve(colour, delta=alpha)), R.PathShape(gshapes.circle(x, y, r))
        ),
        (),
        R.OVER,
    )


def general_render(scene, w, h):
    """General renderer output composited over a white window."""
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, w, h)))
    white = region.fillshape(region.shape_of_box((1, 1, w, h)), rfills.plain(C.white))
    out, _ = region.caf("over", "opaque", spr, white)
    ww, hh = out.wh
    img = np.asarray(out.rgba, dtype=np.uint8)[:hh, :ww]
    full = np.zeros((h, w, 4), np.uint8)
    x0, y0, _, _ = out.box
    full[y0 - 1 : y0 - 1 + hh, x0 - 1 : x0 - 1 + ww] = img
    return full


def test_deviceview_matches_general_renderer():
    w, h = 256, 128
    scene = [
        circle_obj(60, 60, 30, C.red, 150),
        circle_obj(100, 64, 35, C.green),
        circle_obj(180, 60, 30, C.blue, 220),
    ]
    dv = DeviceView(w, h)
    dv.set_scene(scene)
    dv.render(full=True)
    got = dv.read()
    expect = general_render(scene, w, h)
    assert np.array_equal(got, expect)


def test_deviceview_dirty_translate_matches_full():
    w, h = 256, 128
    base = circle_obj(100, 64, 40, C.green)
    blob = circle_obj(50, 40, 15, C.crimson, 170)
    dv = DeviceView(w, h)
    dv.set_scene([blob, base])
    dv.render(full=True)
    # Translate the blob by (30, 20) via raster reuse + dirty tiles only.
    dv.translate_object(blob.idset, 30, 20)
    assert dv.dirty  # some tiles marked
    dv.render()  # incremental
    got = dv.read()
    # Full reference: fresh view with the blob at the new place.
    cache.clear()
    moved = R.Obj(
        blob.idset,
        blob.geometry,
        tuple(__import__("coherence_tpu.transform", fromlist=["compose"]).compose(
            __import__("coherence_tpu.transform", fromlist=["Translate"]).Translate(30.0, 20.0),
            list(blob.transform),
        )),
        blob.compop,
    )
    dv2 = DeviceView(w, h)
    dv2.set_scene([moved, base])
    dv2.render(full=True)
    expect = dv2.read()
    assert np.array_equal(got, expect)


def test_deviceview_restack():
    w, h = 256, 128
    a = circle_obj(100, 64, 30, C.red)
    b = circle_obj(120, 64, 30, C.blue)
    dv = DeviceView(w, h)
    dv.set_scene([a, b])
    dv.render(full=True)
    before = dv.read()
    assert tuple(before[64 - 1, 110 - 1][:3]) == (255, 0, 0)  # red on top
    dv.restack([b.idset, a.idset])
    dv.render()
    after = dv.read()
    assert tuple(after[64 - 1, 110 - 1][:3]) == (0, 0, 255)  # blue now on top


def test_full_sprite_of_object_covers_shape():
    o = circle_obj(30, 30, 12, C.purple)
    spr = full_sprite_of_object(o)
    shp = R.shapeonly_of_basicshape(o)
    # The sprite's defined region equals the object's shape.
    assert region.is_null_shape(
        region.shape_difference(shp, region.shape_of_sprite(spr))
    )


def test_deviceview_fuzz_matches_general_renderer():
    """Seeded random scenes (polygons, both windings, stroked paths, mixed
    opacity, transforms) through the batched fast path vs the general HSR
    renderer — whole-window pixel equality."""
    import random

    import coherence_tpu.transform as tr
    from coherence_tpu.geometry import path as gpath

    w, h = 192, 160
    spec = gshapes.StrokeSpec(
        startcap=gshapes.RoundCap,
        join=gshapes.MitredJoin,
        endcap=gshapes.ProjectingCap,
        mitrelimit=10.0,
        linewidth=2.5,
    )
    for seed in (11, 23):
        rng = random.Random(seed)
        cache.clear()
        scene = []
        for k in range(6):
            pts = [
                (rng.uniform(5, w - 5), rng.uniform(5, h - 5)) for _ in range(5)
            ]
            winding = gpath.NONZERO if k % 2 else gpath.EVEN_ODD
            p = gpath.path_of_pointlist(winding, pts)
            colour = C.dissolve(
                C.colour_of_rgba(
                    rng.randrange(256), rng.randrange(256), rng.randrange(256), 255
                ),
                delta=rng.choice([255, 180, 120]),
            )
            shape = (
                R.StrokedPathShape(p, spec) if k == 4 else R.PathShape(p)
            )
            t = (
                (tr.Rotate((w / 2, h / 2), rng.uniform(-0.4, 0.4)),)
                if k == 5
                else ()
            )
            scene.append(
                R.Obj(ident.new_ids(), R.Basic(rfills.plain(colour), shape), t, R.OVER)
            )
        dv = DeviceView(w, h)
        dv.set_scene(scene)
        dv.render(full=True)
        got = dv.read()
        cache.clear()
        expect = general_render(scene, w, h)
        assert np.array_equal(got, expect), f"seed {seed}"


def test_translate_tiled_object_rerasterizes():
    """translate_object on a TILED-built object (no materialized Sprite)
    must re-rasterize from the retained geometry — pixel-equal to a fresh
    view with the translated object — and a second translate (now with a
    materialized Sprite) must keep matching.  Previously this silently
    no-opped."""
    import coherence_tpu.transform as tr

    w, h = 256, 128
    base = circle_obj(100, 64, 40, C.green)
    blob = circle_obj(50, 40, 15, C.crimson, 170)
    dv = DeviceView(w, h)
    dv.set_scene([blob, base], tiled=True)
    dv.render(full=True)
    before = dv.read()
    dv.translate_object(blob.idset, 30, 20)
    dv.render()
    got1 = dv.read()
    assert not np.array_equal(got1, before), "translate was a no-op"
    dv.translate_object(blob.idset, 10, -5)
    dv.render()
    got2 = dv.read()

    def moved(o, dx, dy):
        return R.Obj(
            o.idset, o.geometry,
            tuple(tr.compose(tr.Translate(float(dx), float(dy)),
                             list(o.transform))),
            o.compop,
        )

    cache.clear()
    dv2 = DeviceView(w, h)
    dv2.set_scene([moved(blob, 30, 20), base], tiled=True)
    dv2.render(full=True)
    assert np.array_equal(got1, dv2.read())
    cache.clear()
    dv3 = DeviceView(w, h)
    dv3.set_scene([moved(blob, 40, 15), base], tiled=True)
    dv3.render(full=True)
    assert np.array_equal(got2, dv3.read())


def test_translate_tiled_group_object():
    """A tiled-built GROUP object translates by moving its leaves (group
    Objs carry no transform of their own)."""
    import coherence_tpu.transform as tr

    w, h = 256, 128
    grp = R.Obj(
        ident.new_ids(),
        R.Group((circle_obj(40, 40, 20, C.blue, 200),
                 circle_obj(70, 60, 18, C.red))),
        (),
        R.OVER,
    )
    dv = DeviceView(w, h)
    dv.set_scene([grp], tiled=True)
    dv.render(full=True)
    dv.translate_object(grp.idset, 25, 10)
    dv.render()
    got = dv.read()
    cache.clear()
    moved = R.Obj(
        grp.idset,
        R.Group(tuple(
            R.Obj(c.idset, c.geometry,
                  tuple(tr.compose(tr.Translate(25.0, 10.0), list(c.transform))),
                  c.compop)
            for c in grp.geometry.objects
        )),
        (),
        R.OVER,
    )
    dv2 = DeviceView(w, h)
    dv2.set_scene([moved], tiled=True)
    dv2.render(full=True)
    assert np.array_equal(got, dv2.read())


def test_translate_tiled_offscreen_object_comes_onscreen():
    """An offscreen-culled tiled object translated back onto the grid must
    appear (the cull leaves no pieces and no Sprite)."""
    w, h = 256, 128
    off = circle_obj(-500, 64, 20, C.blue)
    base = circle_obj(100, 64, 40, C.green)
    dv = DeviceView(w, h)
    dv.set_scene([off, base], tiled=True)
    dv.render(full=True)
    before = dv.read()
    dv.translate_object(off.idset, 550, 0)  # now at x=50, on screen
    dv.render()
    got = dv.read()
    assert not np.array_equal(got, before)
    cache.clear()
    dv2 = DeviceView(w, h)
    dv2.set_scene([circle_obj(50, 64, 20, C.blue), base], tiled=True)
    dv2.render(full=True)
    assert np.array_equal(got, dv2.read())
