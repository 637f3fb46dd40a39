"""Device frame path: the fused layer-pack compositor must match the general
caf-over renderer, and the animated-sprite blit must match recompositing."""

import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.raster.framepath import FrameBuffer
from coherence_tpu.raster.region import translate_sprite
from coherence_tpu.scene import cache, render as R


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def full_sprite(o):
    shp, minshp = R.shape_of_basicshape(o)
    maxshape = region.shape_difference(shp, minshp)
    fill = R.fillin_obj(o).transform(list(o.transform))
    fringe = R.sprite_of_basicshape(o, maxshape, [o]) if maxshape is not None else None
    interior = region.fillshape(minshp, fill) if minshp is not None else None
    spr, _ = region.caf("nocover", "opaque", interior, fringe)
    return spr


def circle_obj(x, y, r, colour, alpha=255):
    return R.Obj(
        ident.new_ids(),
        R.Basic(
            rfills.plain(C.dissolve(colour, delta=alpha)), R.PathShape(gshapes.circle(x, y, r))
        ),
        (),
        R.OVER,
    )


def test_framebuffer_composite_matches_general_renderer():
    scene = [
        circle_obj(40, 40, 22, C.red, 150),
        circle_obj(60, 55, 25, C.green),
        circle_obj(80, 40, 22, C.blue, 200),
    ]
    sprites = [full_sprite(o) for o in scene]
    fb = FrameBuffer(160, 120, C.white)
    fb.composite((1, 1, 160, 120), sprites)
    got = fb.read()

    # General path: render the scene, then over white.
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 160, 120)))
    white_bg = region.fillshape(region.shape_of_box((1, 1, 160, 120)), rfills.plain(C.white))
    out, _ = region.caf("over", "opaque", spr, white_bg)
    w, h = out.wh
    expect = np.asarray(out.rgba)[:h, :w]
    assert np.array_equal(got[:h, :w], expect)


def test_recomposite_window_matches_full_composite():
    """Dirty-window recomposite (restore + repaint via the exact layer fold)
    must equal a from-scratch full-frame composite — including where the
    translucent blob crosses the base circle's translucent AA fringe, which
    a blit-over-background-snapshot path gets wrong by ±1 (integer `over`
    is non-associative)."""
    base = circle_obj(50, 50, 30, C.green)
    blob = circle_obj(30, 30, 12, C.crimson, 170)
    base_spr = full_sprite(base)
    blob_spr = full_sprite(blob)
    fb = FrameBuffer(128, 128, C.white)
    fb.composite((1, 1, 128, 128), [blob_spr, base_spr])
    # Move the blob; recomposite only the dirty window from the layer stack.
    moved = translate_sprite(15, 10, blob_spr)
    dirty = region.box_union(blob_spr.box, moved.box)
    fb.recomposite(dirty, [moved, base_spr])
    got = fb.read()
    # Reference: full recomposite of [moved blob, base] over white.
    fb2 = FrameBuffer(128, 128, C.white)
    fb2.composite((1, 1, 128, 128), [moved, base_spr])
    assert np.array_equal(got, fb2.read())


def test_clear_window():
    fb = FrameBuffer(64, 64, C.white)
    spr = region.fillshape(region.shape_of_box((10, 10, 50, 50)), rfills.plain(C.red))
    fb.composite((1, 1, 64, 64), [spr])
    fb.clear_window((20, 20, 30, 30))
    got = fb.read()
    assert tuple(got[25 - 1, 25 - 1]) == C.rgba_of_colour(C.white)
    assert tuple(got[15 - 1, 15 - 1]) == C.rgba_of_colour(C.red)


def test_partial_window_composite_no_double_blend():
    """Re-compositing a non-bucket-aligned dirty window must not re-blend a
    translucent sprite into the bucket-padding ring, where the frame already
    contains it (ADVICE r1: composite is clipped to the logical box)."""
    fb = FrameBuffer(256, 64, C.white)
    spr = region.fillshape(
        region.shape_of_box((1, 1, 200, 40)),
        rfills.plain(C.dissolve(C.navy, delta=120)),
    )
    fb.composite((1, 1, 256, 64), [spr])
    expect = fb.read().copy()
    # Dirty box (1,1,150,20) buckets to (32, 256): the ring rows 20..31 and
    # cols 150..255 intersect the sprite.
    box = (1, 1, 150, 20)
    fb.clear_window(box)
    fb.composite(box, [spr])
    assert np.array_equal(fb.read(), expect)
