"""The fused blit+blur frame kernel == the general renderer's blur filter.

bench.py's north-star loop (animated sprite + a live blur filter at every
frame) maintains the frame with ONE fused dispatch per frame
(framepath._blit_blur_kernel).  These tests pin its semantics to the
general renderer: a scene [blur-filter, blob, statics..., background]
rendered through the full HSR + filter-recursion path (render.ml:1080-1131,
filters.ml:247-261) must match the incremental frames pixel for pixel."""

import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import convolve as rconvolve
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.raster.framepath import FrameBuffer
from coherence_tpu.raster.region import box_union, translate_sprite
from coherence_tpu.scene import cache, filters as F, render as R
from coherence_tpu.scene.fastframe import alpha_plane_of_object, full_sprite_of_object


def _f_alpha(kernel):
    """The filter geometry's alpha plane (what blend' weights by)."""
    geom_obj = R.Obj(ident.new_ids(), _filter_obj(kernel).geometry.filter.geometry, (), R.OVER)
    return alpha_plane_of_object(geom_obj, W, H)


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


W, H = 160, 120
RADIUS = 2
F_BOX = (30, 20, 130, 100)  # filter rect, >= 2*radius inside the frame


def rect_obj(colour, x, y, w, h):
    return R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(colour), R.rectangle(float(x), float(y), float(w), float(h))),
        (),
        R.OVER,
    )


def _blob_at(cx, cy):
    return R.Obj(
        ident.new_ids(),
        R.Basic(
            rfills.plain(C.dissolve(C.crimson, delta=170)),
            R.PathShape(gshapes.circle(float(cx), float(cy), 9.0)),
        ),
        (),
        R.OVER,
    )


def _statics():
    return [
        rect_obj(C.dissolve(C.steelblue, delta=200), 50, 35, 40, 30),
        R.Obj(
            ident.new_ids(),
            R.Basic(rfills.plain(C.darkgreen), R.PathShape(gshapes.circle(100.0, 70.0, 18.0))),
            (),
            R.OVER,
        ),
        rect_obj(C.white, 1, 1, W, H),  # opaque background
    ]


def _filter_obj(kernel):
    geom = R.Basic(
        rfills.plain(C.white),
        R.rectangle(
            float(F_BOX[0]),
            float(F_BOX[1]),
            float(F_BOX[2] - F_BOX[0] + 1),
            float(F_BOX[3] - F_BOX[1] + 1),
        ),
    )
    return R.Obj(ident.new_ids(), F.blur(geom, kernel), (), R.OVER)


def _general_frame(kernel, blob):
    import jax.numpy as jnp

    scene = [_filter_obj(kernel), blob] + _statics()
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, W, H)))
    top = np.zeros((H, W, 4), np.int32)
    x0, y0, x1, y1 = spr.box
    m = np.asarray(spr.mask)
    r4 = np.asarray(spr.rgba)
    for rr in range(max(1, y0), min(H, y1) + 1):
        for cc in range(max(1, x0), min(W, x1) + 1):
            if m[rr - y0, cc - x0]:
                top[rr - 1, cc - 1] = r4[rr - y0, cc - x0]
    # Over the white backdrop the FrameBuffer starts from.
    white = np.full((H, W, 4), 255, np.int32)
    return np.asarray(C.over_rgba(jnp.asarray(top), jnp.asarray(white)))


def test_blit_blur_matches_general_renderer():
    kernel = rconvolve.mkgaussian(RADIUS)

    # Fast path: one full-frame composite with the blob, then the loop.
    fb = FrameBuffer(W, H, C.white)
    statics_spr = [s for s in (full_sprite_of_object(o) for o in _statics()) if s]

    f_alpha = _f_alpha(kernel)
    positions = [(40, 50), (47, 53), (54, 56), (61, 59)]
    blob0 = full_sprite_of_object(_blob_at(*positions[0]))

    # Initial frame: composite the whole stack, then apply the filter fully.
    fb.composite((1, 1, W, H), [blob0] + statics_spr)
    fb.apply_blur(f_alpha, kernel)
    got = fb.read()
    want = _general_frame(kernel, _blob_at(*positions[0]))
    assert (got == want).all(), "initial frame mismatch"

    spr = blob0
    for k, (cx, cy) in enumerate(positions[1:], start=1):
        dxy = (positions[k][0] - positions[k - 1][0], positions[k][1] - positions[k - 1][1])
        prev_box = spr.box
        spr = translate_sprite(dxy[0], dxy[1], spr)
        dirty = box_union(prev_box, spr.box)
        fb.recomposite_blur(dirty, [spr] + statics_spr, f_alpha, kernel)
        got = fb.read()
        cache.clear()
        want = _general_frame(kernel, _blob_at(cx, cy))
        assert (got == want).all(), f"frame {k} mismatch"


def test_bound_layers_match_unbound():
    """BoundLayers (planes baked into the program) must be pixel-identical
    to the argument-passing kernels, for both the plain and blur paths."""
    from coherence_tpu.raster.framepath import BoundLayers

    kernel = rconvolve.mkgaussian(RADIUS)
    statics_spr = [s for s in (full_sprite_of_object(o) for o in _statics()) if s]
    f_alpha = _f_alpha(kernel)
    blob0 = full_sprite_of_object(_blob_at(40, 50))
    moved = translate_sprite(9, 4, blob0)
    dirty = box_union(blob0.box, moved.box)

    fbs = []
    for bound in (None, BoundLayers([blob0] + statics_spr)):
        fb = FrameBuffer(W, H, C.white)
        fb.composite((1, 1, W, H), [blob0] + statics_spr)
        fb.apply_blur(f_alpha, kernel)
        fb.recomposite_blur(dirty, [moved] + statics_spr, f_alpha, kernel, bound=bound)
        fb.recomposite(moved.box, [moved] + statics_spr, bound=bound)
        fbs.append(fb.read())
    assert (fbs[0] == fbs[1]).all()


def test_tiled_filtered_display_matches_general():
    """The tiled animated path (DeviceView content + FilteredDisplay blend:
    in-place atlas piece updates, dirty-tile recomposite, windowed
    blur-blend) must match the general renderer frame for frame."""
    from coherence_tpu.scene.fastframe import DeviceView, FilteredDisplay

    kernel = rconvolve.mkgaussian(RADIUS)
    view = DeviceView(W, H)
    view.set_scene(_statics())
    blob_obj = _blob_at(40, 50)
    view.add_object(blob_obj, index=0)
    view.make_animated(blob_obj.idset)
    f_alpha = _f_alpha(kernel)
    disp = FilteredDisplay(view, f_alpha, kernel)
    disp.full_refresh()
    got = disp.read()
    cache.clear()
    want = _general_frame(kernel, _blob_at(40, 50))
    assert (got == want).all(), "initial tiled frame mismatch"

    positions = [(40, 50), (47, 53), (54, 56)]
    for k in range(1, len(positions)):
        dx = positions[k][0] - positions[k - 1][0]
        dy = positions[k][1] - positions[k - 1][1]
        if k % 2 == 1:
            prev_box = view.sprites[blob_obj.idset].box
            view.translate_object(blob_obj.idset, dx, dy)
            dirty = box_union(prev_box, view.sprites[blob_obj.idset].box)
            disp.step(dirty)
        else:
            # The fused single-dispatch frame must be identical.
            disp.step_animated(blob_obj.idset, dx, dy)
        got = disp.read()
        cache.clear()
        want = _general_frame(kernel, _blob_at(*positions[k]))
        assert (got == want).all(), f"tiled frame {k} mismatch"


def test_prewarm_animated_is_stateless_and_loop_matches():
    """prewarm_animated loads the loop programs on throwaway buffers: it
    must install no scene/display state, and the real fused step after it
    must still match the general renderer frame."""
    from coherence_tpu.scene.fastframe import (
        DeviceView,
        FilteredDisplay,
        prewarm_animated,
    )

    kernel = rconvolve.mkgaussian(RADIUS)
    view = DeviceView(W, H)
    view.set_scene(_statics())
    blob_obj = _blob_at(40, 50)
    view.add_object(blob_obj, index=0)
    view.make_animated(blob_obj.idset)
    pieces_before = {k: list(v) for k, v in view.ts.pieces.items()}
    dirty_before = set(view.dirty)
    prewarm_animated(view, kernel, blob_obj.idset, 7, 3)
    assert {k: list(v) for k, v in view.ts.pieces.items()} == pieces_before
    assert view.dirty == dirty_before

    f_alpha = _f_alpha(kernel)
    disp = FilteredDisplay(view, f_alpha, kernel)
    disp.full_refresh()
    disp.step_animated(blob_obj.idset, 7, 3)
    got = disp.read()
    cache.clear()
    want = _general_frame(kernel, _blob_at(47, 53))
    assert (got == want).all(), "post-prewarm fused step mismatch"


def test_step_animated_blends_preexisting_dirty_tiles():
    """ADVICE r2: tiles dirtied by OTHER edits before a fused step_animated
    call must get their displayed (filtered) pixels refreshed too, not just
    fresh content under a stale blur blend."""
    from coherence_tpu.scene.fastframe import DeviceView, FilteredDisplay

    kernel = rconvolve.mkgaussian(RADIUS)
    statics = _statics()
    view = DeviceView(W, H)
    view.set_scene(statics)
    blob_obj = _blob_at(40, 50)
    view.add_object(blob_obj, index=0)
    view.make_animated(blob_obj.idset)
    f_alpha = _f_alpha(kernel)
    disp = FilteredDisplay(view, f_alpha, kernel)
    disp.full_refresh()

    # Another edit: recolour the first static INSIDE the filter rect,
    # marking its tiles dirty without rendering.
    new_static = rect_obj(C.dissolve(C.darkorange, delta=220), 50, 35, 40, 30)
    view.replace_object(statics[0].idset, new_static)
    assert view.dirty, "precondition: edit must leave dirty tiles pending"

    # Fused animated step; its window is far from the recoloured rect.
    disp.step_animated(blob_obj.idset, 7, 3)

    got = disp.read()
    cache.clear()
    scene = [_filter_obj(kernel), _blob_at(47, 53), new_static] + statics[1:]
    import jax.numpy as jnp

    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, W, H)))
    top = np.zeros((H, W, 4), np.int32)
    x0, y0, x1, y1 = spr.box
    m = np.asarray(spr.mask)
    r4 = np.asarray(spr.rgba)
    for rr in range(max(1, y0), min(H, y1) + 1):
        for cc in range(max(1, x0), min(W, x1) + 1):
            if m[rr - y0, cc - x0]:
                top[rr - 1, cc - 1] = r4[rr - y0, cc - x0]
    white = np.full((H, W, 4), 255, np.int32)
    want = np.asarray(C.over_rgba(jnp.asarray(top), jnp.asarray(white)))
    assert (got == want).all(), "stale filtered pixels over the edited rect"


def test_blit_blur_dirty_crossing_filter_edge():
    """Dirty boxes straddling the filter rect's border must update both the
    blurred interior and the plain exterior correctly."""
    kernel = rconvolve.mkgaussian(RADIUS)
    fb = FrameBuffer(W, H, C.white)
    statics_spr = [s for s in (full_sprite_of_object(o) for o in _statics()) if s]

    # Start outside the filter rect, step across its left edge.
    f_alpha = _f_alpha(kernel)
    positions = [(18, 60), (26, 61), (34, 62)]
    blob0 = full_sprite_of_object(_blob_at(*positions[0]))
    fb.composite((1, 1, W, H), [blob0] + statics_spr)
    fb.apply_blur(f_alpha, kernel)
    spr = blob0
    for k in range(1, len(positions)):
        dxy = (positions[k][0] - positions[k - 1][0], positions[k][1] - positions[k - 1][1])
        prev_box = spr.box
        spr = translate_sprite(dxy[0], dxy[1], spr)
        fb.recomposite_blur(
            box_union(prev_box, spr.box), [spr] + statics_spr, f_alpha, kernel
        )
    got = fb.read()
    cache.clear()
    want = _general_frame(kernel, _blob_at(*positions[-1]))
    assert (got == want).all()


def test_play_animated_matches_sequential_steps():
    """The one-dispatch scanned playback (_play_animated_kernel) must be
    pixel-identical to calling step_animated per delta — display plane,
    content frame, and subsequent stepping behaviour — and its captured
    planes must equal the sequential displays at the capture points."""
    from coherence_tpu.scene.fastframe import DeviceView, FilteredDisplay

    kernel = rconvolve.mkgaussian(RADIUS)
    f_alpha = _f_alpha(kernel)
    deltas = [(7, 3), (7, 3), (-7, -3), (7, 3)]

    views = []
    for _ in range(2):
        view = DeviceView(W, H)
        view.set_scene(_statics())
        blob_obj = _blob_at(40, 50)
        view.add_object(blob_obj, index=0)
        view.make_animated(blob_obj.idset)
        disp = FilteredDisplay(view, f_alpha, kernel)
        disp.full_refresh()
        views.append((view, disp, blob_obj.idset))

    (v1, d1, k1), (v2, d2, k2) = views
    seq_caps = []
    for i, (dx, dy) in enumerate(deltas):
        d1.step_animated(k1, dx, dy)
        if (i + 1) % 2 == 0:
            seq_caps.append(np.asarray(d1.rgba, np.uint8))
    frames = d2.play_animated(k2, deltas, capture_every=2)

    assert (np.asarray(d1.rgba) == np.asarray(d2.rgba)).all()
    assert (np.asarray(v1.frame) == np.asarray(v2.frame)).all()
    assert frames is not None and frames.shape[0] == 2
    assert (np.asarray(frames) == np.stack(seq_caps)).all()
    # The scanned path must leave consistent host state: one more fused
    # step on each must still agree.
    d1.step_animated(k1, 5, 2)
    d2.step_animated(k2, 5, 2)
    assert (np.asarray(d1.rgba) == np.asarray(d2.rgba)).all()


def test_play_animated_fallback_paths():
    """Pending non-animated dirt or an unreserved key must route through
    the sequential fallback and still produce identical pixels."""
    from coherence_tpu.scene.fastframe import DeviceView, FilteredDisplay

    kernel = rconvolve.mkgaussian(RADIUS)
    f_alpha = _f_alpha(kernel)
    deltas = [(7, 3), (-7, -3)]

    views = []
    for _ in range(2):
        view = DeviceView(W, H)
        view.set_scene(_statics())
        blob_obj = _blob_at(40, 50)
        view.add_object(blob_obj, index=0)  # NOT make_animated -> unreserved
        disp = FilteredDisplay(view, f_alpha, kernel)
        disp.full_refresh()
        views.append((view, disp, blob_obj.idset))

    (v1, d1, k1), (v2, d2, k2) = views
    for dx, dy in deltas:
        d1.step_animated(k1, dx, dy)
    got = d2.play_animated(k2, deltas)
    assert got is None
    assert (np.asarray(d1.rgba) == np.asarray(d2.rgba)).all()

    # require_scan: measurement callers (bench.py device-rate metric) must
    # get a loud error instead of silently timing the sequential path.
    import pytest

    with pytest.raises(RuntimeError, match="scan unavailable"):
        d2.play_animated(k2, deltas, require_scan=True)
