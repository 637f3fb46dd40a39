"""Stateful coherence-cache fuzz (VERDICT r3 item 5).

Random scenes, then random edit scripts through the REAL engine entry
points — the same methods the event handlers dispatch to: nudge/drag
translations, handle scale/shear drags, z-order, transparency + blur
sliders, undo/redo — with a tiny ``cache.setsize`` forcing eviction
mid-sequence.  After EVERY step, the engine's incrementally maintained
framebuffer (dirty-region recomposites, cache aliases, chained
translations, eviction survivors) must be pixel-identical to a
from-scratch render of the same scene with the cache disabled.

This targets the subtlest logic in the reference: cache-under-transform
(/root/reference/cache.ml:328-367) and scene-diff dirty regions
(/root/reference/engine.ml:599-623).  Integer ``over`` is
non-associative, so any incremental window that recomposites the layer
stack in the wrong order shows up as a pixel diff here.
"""

import random

import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu import ident, transform as tr
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.gui import app as A
from coherence_tpu.gui import window as W
from coherence_tpu.raster import convolve as rconvolve
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.scene import cache
from coherence_tpu.scene import filters as F
from coherence_tpu.scene import render as R

SIZE = 170  # window/master_update extent (small: every step renders twice)


@pytest.fixture(autouse=True)
def _fresh_cache():
    cache.clear()
    cache.setsize(20_000_000)
    yield
    cache.clear()
    cache.setsize(20_000_000)


def _random_fill(rng):
    cols = [C.red, C.blue, C.green, C.darkorange, C.purple, C.teal,
            C.cornflowerblue, C.gold]
    c = cols[rng.randrange(len(cols))]
    if rng.random() < 0.5:
        c = C.dissolve(c, delta=rng.randrange(40, 250))
    if rng.random() < 0.25:
        c2 = cols[rng.randrange(len(cols))]
        x0, y0 = rng.uniform(10, SIZE - 10), rng.uniform(10, SIZE - 10)
        return rfills.gradient(
            (x0, y0), (x0 + rng.uniform(15, 60), y0 + rng.uniform(-30, 30)),
            True, True, c, c2,
        )
    return rfills.plain(c)


def _random_basic(rng):
    x = rng.uniform(20, SIZE - 30)
    y = rng.uniform(20, SIZE - 30)
    kind = rng.randrange(3)
    if kind == 0:
        shape = R.PathShape(gshapes.circle(x, y, rng.uniform(8, 26)))
    elif kind == 1:
        shape = R.rectangle(x, y, rng.uniform(12, 45), rng.uniform(12, 45))
    else:  # stroked outline
        spec = gshapes.StrokeSpec(
            startcap=gshapes.ButtCap, endcap=gshapes.ButtCap,
            join=gshapes.RoundJoin, mitrelimit=10.0,
            linewidth=rng.uniform(2.0, 6.0),
        )
        shape = R.StrokedPathShape(gshapes.circle(x, y, rng.uniform(10, 24)), spec)
    return R.Obj(ident.new_ids(), R.Basic(_random_fill(rng), shape), (), R.OVER)


def _random_filter(rng):
    x = rng.uniform(40, SIZE - 40)
    y = rng.uniform(40, SIZE - 40)
    lens = R.Basic(rfills.plain(C.white),
                   R.PathShape(gshapes.circle(x, y, rng.uniform(14, 28))))
    k = rng.randrange(3)
    if k == 0:
        g = F.blur(lens, rconvolve.mkgaussian(rng.randrange(2, 5)))
    elif k == 1:
        g = F.monochrome(lens)
    else:
        g = F.hole(lens)
    return R.Obj(ident.new_ids(), g, (), R.OVER)


def _mk_engine(scene):
    eng = A.Engine()
    view = R.View(
        scene=list(scene),
        pages=[],
        window=W.nullwindow,
        background=[A.background_obj()],
        selections=R.null_selection,
        master_update=region.shape_of_box((0, 0, SIZE, SIZE)),
        rubberband=None,
        tool=W.Select,
    )
    eng.views.append(view)
    view.window = eng.wx.make_window("fuzz", SIZE, SIZE, 0, 0, 0, 0)
    return eng, view


def _paint_whole(eng, view):
    eng.event_handler((W.PAINT_RECT, view.window, 0, 0, SIZE, SIZE))
    return eng.wx.framebuffers[view.window]


def _oracle_fb(view):
    """From-scratch render of view's scene+selections, cache disabled."""
    was = cache.usecache
    cache.usecache = False
    try:
        eng2, view2 = _mk_engine(view.scene)
        view2.selections = view.selections
        return _paint_whole(eng2, view2).copy()
    finally:
        cache.usecache = was


def _select(eng, view, rng):
    if not view.scene:
        return
    obj = view.scene[rng.randrange(len(view.scene))]
    eng.change_selection(view, (R.Size, ([obj], R.handles_size())))


def _step(eng, view, rng):
    """One random edit through a real engine entry point."""
    has_sel = view.selections != R.null_selection
    ops = ["select", "deselect", "nudge", "drag", "scale", "top", "bottom",
           "trans", "blur", "undo", "redo", "evict", "drophalf"]
    op = ops[rng.randrange(len(ops))]
    if op == "select":
        eng.undo.record(view)
        _select(eng, view, rng)
    elif op == "deselect":
        eng.change_selection(view, R.null_selection)
    elif not has_sel and op in ("nudge", "drag", "scale", "top", "bottom",
                                "trans", "blur"):
        _select(eng, view, rng)
    elif op == "nudge":
        eng.nudge_selection(rng.randrange(-3, 4), rng.randrange(-3, 4), view)
        eng.redraw_selections(view)  # gesture end (select_leftup path)
    elif op == "drag":  # multi-step move like select_dragging
        eng.undo.record(view)
        eng.move_selected(True, rng.randrange(-12, 13), rng.randrange(-12, 13), view)
        for _ in range(rng.randrange(0, 3)):
            eng.move_selected(False, rng.randrange(-8, 9), rng.randrange(-8, 9), view)
        eng.redraw_selections(view)
    elif op == "scale":  # handle drag: incremental transforms vs drag origin
        eng.undo.record(view)
        oscene = list(view.scene)
        osel = view.selections
        cx, cy = eng.centre_of_selections(view.selections)
        for i in range(rng.randrange(1, 3)):
            s = rng.uniform(0.6, 1.5)
            t = tr.Scale((float(cx), float(cy)), s, rng.uniform(0.6, 1.5))
            eng.transform_selected(i == 0, t, view, oscene, osel)
        eng.redraw_selections(view)
    elif op == "top":
        eng.selection_to_top(view)
        eng.redraw_selections(view)
    elif op == "bottom":
        eng.selection_to_bottom(view)
        eng.redraw_selections(view)
    elif op == "trans":
        eng.changetrans(view, rng.randrange(0, 256))
    elif op == "blur":
        eng.changeblur(view, rng.randrange(0, 5))
    elif op == "undo":
        state = eng.undo.undo(view)
        if state is not None:
            eng.view_change_scene(view, state.scene, state.selections, True, True)
    elif op == "redo":
        state = eng.undo.redo(view)
        if state is not None:
            eng.view_change_scene(view, state.scene, state.selections, True, True)
    elif op == "evict":
        # Tiny cache: every later add evicts sprite-first (cache.ml order).
        cache.setsize(rng.choice([1, 20_000, 150_000]))
    elif op == "drophalf":
        cache.drophalf()
    return op


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_incremental_frames_equal_from_scratch(seed):
    rng = random.Random(seed)
    scene = [_random_basic(rng) for _ in range(rng.randrange(4, 8))]
    # a filter object in every scene: filters read the composited scene
    # below them, the hardest dirty/recomposite interaction
    scene.insert(rng.randrange(len(scene) + 1), _random_filter(rng))
    eng, view = _mk_engine(scene)
    fb = _paint_whole(eng, view)
    np.testing.assert_array_equal(fb, _oracle_fb(view))
    for stepno in range(22):
        op = _step(eng, view, rng)
        got = eng.wx.framebuffers[view.window]
        want = _oracle_fb(view)
        if not np.array_equal(got, want):
            bad = np.argwhere((got != want).any(-1))
            raise AssertionError(
                f"seed {seed} step {stepno} op {op}: incremental frame "
                f"diverged from from-scratch render at {len(bad)} px, "
                f"first {bad[0] if len(bad) else None}"
            )


def test_eviction_mid_drag_stays_exact():
    """The classic cache-under-transform trap: evict the translation
    alias's target mid-drag; the recomputed sprite must land identically."""
    rng = random.Random(99)
    scene = [_random_basic(rng) for _ in range(5)]
    eng, view = _mk_engine(scene)
    _paint_whole(eng, view)
    eng.change_selection(view, (R.Size, ([view.scene[2]], R.handles_size())))
    eng.undo.record(view)
    eng.move_selected(True, 6, 3, view)
    cache.setsize(1)  # evict EVERYTHING the next adds touch
    eng.move_selected(False, 5, -2, view)
    cache.setsize(20_000_000)
    eng.move_selected(False, -3, 7, view)
    eng.redraw_selections(view)
    np.testing.assert_array_equal(
        eng.wx.framebuffers[view.window], _oracle_fb(view)
    )
