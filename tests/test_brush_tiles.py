"""Batched brush-tile kernel == scalar brush pipeline, pixel for pixel.

The brush group path (raster/brush_tiles) must composite identically to
shattering sprite_of_brushstroke rasters (brush.ml:126-222 semantics):
same stamp sequence, same alpha_over integer arithmetic, same box-dilation
shape mask, same fill dissolve."""

import numpy as np
import pytest

import coherence_tpu.colour as C
import coherence_tpu.transform as tr
from coherence_tpu.geometry import path as gpath
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import brush as rbrush
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster.pallas_compositor import pack_rgba
from coherence_tpu.raster.tiled_scene import TiledScene
from coherence_tpu.scene import render as R
from coherence_tpu.scene.fastframe import build_tiled_scene, full_sprite_of_object

import jax.numpy as jnp

W, H = 512, 256  # 4 x 4 tiles of 128 x 64


def _bg():
    return pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))


def _render_both(objs):
    keyed = [(i, o) for i, o in enumerate(objs)]
    order = [i for i, _ in keyed]

    ts_tile = TiledScene(W, H)
    build_tiled_scene(ts_tile, keyed)
    starts, idxs = ts_tile.build_lists(order)
    frame_tile = np.asarray(ts_tile.render(_bg(), starts, idxs))

    ts_ref = TiledScene(W, H)
    for key, o in keyed:
        spr = full_sprite_of_object(o)
        if spr is not None:
            ts_ref.add_object(key, spr)
        else:
            ts_ref.pieces[key] = []
    starts, idxs = ts_ref.build_lists(order)
    frame_ref = np.asarray(ts_ref.render(_bg(), starts, idxs))
    return frame_tile, frame_ref


def _stroke(cx, cy, r, radius=6.0, opacity=0.5, colour=None, alpha=255):
    colour = C.darkorange if colour is None else colour
    fill = rfills.plain(C.dissolve(colour, delta=alpha) if alpha != 255 else colour)
    pth = gshapes.circle(cx, cy, r)
    return R.Obj(
        R.ident.new_ids(),
        R.Basic(fill, R.BrushStroke((rbrush.mkround(radius, opacity), pth))),
        (),
        R.OVER,
    )


def test_stroke_across_tile_borders():
    got, want = _render_both([_stroke(256.0, 128.0, 80.0)])
    assert (got == want).all()


def test_stroke_partially_offscreen_topleft():
    got, want = _render_both([_stroke(10.0, 8.0, 60.0)])
    assert (got == want).all()


def test_stroke_partially_offscreen_bottomright():
    got, want = _render_both([_stroke(500.0, 250.0, 70.0)])
    assert (got == want).all()


def test_stroke_fully_offscreen():
    got, want = _render_both([_stroke(-400.0, -300.0, 40.0)])
    assert (got == want).all()


def test_overlapping_translucent_strokes():
    objs = [
        _stroke(200.0, 120.0, 60.0, colour=C.crimson, alpha=170),
        _stroke(250.0, 130.0, 55.0, colour=C.steelblue, alpha=255),
    ]
    got, want = _render_both(objs)
    assert (got == want).all()


def test_mixed_paths_and_strokes():
    objs = [
        _stroke(300.0, 100.0, 50.0, radius=4.0, opacity=0.8),
        R.Obj(
            R.ident.new_ids(),
            R.Basic(
                rfills.plain(C.darkgreen),
                R.PathShape(gshapes.circle(300.0, 128.0, 90.0)),
            ),
            (),
            R.OVER,
        ),
        _stroke(120.0, 180.0, 45.0, radius=9.0, opacity=0.4, colour=C.black),
    ]
    got, want = _render_both(objs)
    assert (got == want).all()


def test_transformed_stroke():
    base = _stroke(128.0, 64.0, 40.0)
    o = R.Obj(
        base.idset,
        base.geometry,
        (tr.Scale((0.0, 0.0), 2.0, 2.0),),
        R.OVER,
    )
    got, want = _render_both([o])
    assert (got == want).all()


def test_prewarm_brush_zoom_covers_scaled_groups(monkeypatch):
    """prewarm_brush_zoom must dispatch the SAME brush programs (static
    shape keys) a real staging of the 2x/0.5x-scaled scene would use, so a
    first-visit zoom never loads a brush program inside the step."""
    from coherence_tpu.raster import brush_tiles
    from coherence_tpu.raster.brush_tiles import BrushTileBuild
    from coherence_tpu.scene.fastframe import prewarm_brush_zoom

    keys = []
    real = brush_tiles._brush_group_kernel

    def recording(*args, **kw):
        keys.append(tuple(sorted(kw.items())))
        return real(*args, **kw)

    monkeypatch.setattr(brush_tiles, "_brush_group_kernel", recording)

    objs = [
        _stroke(300.0, 100.0, 50.0, radius=4.0, opacity=0.8),
        _stroke(120.0, 180.0, 45.0, radius=9.0, opacity=0.4, colour=C.black),
    ]
    keyed = [(o.idset, o) for o in objs]
    nty, ntx = H // 64, W // 128
    prewarm_brush_zoom(keyed, nty, ntx)
    prewarmed = set(keys)
    assert prewarmed, "prewarm dispatched nothing"

    # Real staging of the zoomed scenes (the engine zoom tool's +-2x about
    # the frame centre) must need no program key beyond the prewarmed set.
    keys.clear()
    for s in (2.0, 0.5):
        tmats = [
            tr.Translate(W / 2.0, H / 2.0),
            tr.Scale((0.0, 0.0), s, s),
            tr.Translate(-W / 2.0, -H / 2.0),
        ]
        bb = BrushTileBuild(nty, ntx)
        for key, o in keyed:
            o2 = R.transform_renderobject_many(tmats, o)
            from coherence_tpu.scene.fastframe import _brush_extract

            bext = _brush_extract(o2)
            assert bext is not None
            assert bb.add_stroke(key, *bext)
        bb.flush()
    assert set(keys) <= prewarmed


def test_prewarm_brush_zoom_nontile_frame_centre(monkeypatch):
    """At a frame size that pads to a larger tile grid (the 4K case:
    H=2160 -> 2176) the zoom tool still scales about the LOGICAL frame
    centre; prewarm_brush_zoom(width=, height=) must cover the programs
    that staging mints, not the padded-grid-centre ones."""
    from coherence_tpu.raster import brush_tiles
    from coherence_tpu.raster.brush_tiles import BrushTileBuild
    from coherence_tpu.scene.fastframe import _brush_extract, prewarm_brush_zoom

    lw, lh = 500, 200  # logical frame; pads to 512 x 256 (4 x 4 tiles)
    nty, ntx = H // 64, W // 128

    keys = []
    real = brush_tiles._brush_group_kernel

    def recording(*args, **kw):
        keys.append(tuple(sorted(kw.items())))
        return real(*args, **kw)

    monkeypatch.setattr(brush_tiles, "_brush_group_kernel", recording)

    objs = [
        # Near a tile boundary so a centre shifted by half the padding can
        # change the stroke's tile-footprint bucket.
        _stroke(260.0, 130.0, 50.0, radius=4.0, opacity=0.8),
        _stroke(120.0, 64.0, 45.0, radius=9.0, opacity=0.4, colour=C.black),
    ]
    keyed = [(o.idset, o) for o in objs]
    prewarm_brush_zoom(keyed, nty, ntx, width=lw, height=lh)
    prewarmed = set(keys)
    assert prewarmed, "prewarm dispatched nothing"

    keys.clear()
    for s in (2.0, 0.5):
        tmats = [
            tr.Translate(lw / 2.0, lh / 2.0),
            tr.Scale((0.0, 0.0), s, s),
            tr.Translate(-lw / 2.0, -lh / 2.0),
        ]
        bb = BrushTileBuild(nty, ntx)
        for key, o in keyed:
            o2 = R.transform_renderobject_many(tmats, o)
            bext = _brush_extract(o2)
            assert bext is not None
            assert bb.add_stroke(key, *bext)
        bb.flush()
    assert set(keys) <= prewarmed


def test_build_tiled_scene_brush_flush_error_propagates(monkeypatch):
    """An exception on the side-thread brush flush must surface as itself
    on the calling thread, not as a bare KeyError('b')."""
    from coherence_tpu.raster.brush_tiles import BrushTileBuild

    def boom(self):
        raise RuntimeError("synthetic brush flush failure")

    monkeypatch.setattr(BrushTileBuild, "flush", boom)
    objs = [_stroke(128.0, 64.0, 40.0)]
    ts = TiledScene(W, H)
    with pytest.raises(RuntimeError, match="synthetic brush flush"):
        build_tiled_scene(ts, [(o.idset, o) for o in objs])


def test_warmup_paste_programs_runs():
    from coherence_tpu.raster.tiled_scene import warmup_paste_programs

    warmup_paste_programs(8, block_ns=(8, 16))
