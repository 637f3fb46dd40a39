"""Device-resident fast frame path.

The general renderer (scene.render) mirrors the reference's per-object
control flow, which costs host<->device round-trips per object — fine on a
locally attached chip, fatal over a remote tunnel and needless for the
common interactive case.  This module provides the TPU-native frame path:

  * per frame, the host does *box arithmetic only* (no device syncs) to find
    the objects whose bounds meet the dirty region, front-to-back;
  * their cached rasters are reprojected into the dirty window (asynchronous
    shift kernels) and stacked into a (K, h, w, ...) layer pack;
  * ONE fused jitted scan composites the pack front-to-back with an
    occupancy plane (the `caf over` + newly-opaque semantics of
    render.ml:1291-1308 — early termination happens by masking, which on a
    TPU is cheaper than branching), and writes the window back into the
    donated framebuffer.

Total per frame: ~K+2 asynchronous dispatches, zero synchronizations.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import colour as C
from . import region
from .region import Box, Sprite, box_intersect, box_wh, bucket_hw

@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("hb", "wb"))
def _composite_window_fused(frame, offs, oy, ox, ry0, rx0, h, w, *layers, hb, wb):
    """Front-to-back composite of K sprites into frame[oy:, ox:] with the
    per-layer window shift fused in.  layers = (rgba0, mask0, rgba1, mask1,
    ...) raw bucketed sprite planes (rgba 0 outside mask, mask False in
    padding — the region invariants make reading padding harmless); offs:
    (K, 2) int32 per-layer (dy, dx) of the sprite origin in window coords.
    The logical window is rows [ry0, ry0+h) x cols [rx0, rx0+w) of the
    bucketed (hb, wb) block: painting is clipped to it so sprites reaching
    into the bucket-padding ring never double-blend over frame content that
    already contains them (ADVICE r1).  Static shapes: one XLA program per
    (window bucket, layer-shape tuple).  Semantics identical to the
    layer-pack scan (caf-over + newly-opaque, render.ml:1291-1308)."""
    rows = jnp.arange(hb)[:, None]
    cols = jnp.arange(wb)[None, :]
    inwin = (rows >= ry0) & (rows < ry0 + h) & (cols >= rx0) & (cols < rx0 + w)
    acc = _fold_layers(offs, layers, inwin, hb, wb)
    window = jax.lax.dynamic_slice(frame, (oy, ox, 0), (hb, wb, 4))
    out = C.over_rgba(acc, window)
    return jax.lax.dynamic_update_slice(frame, out, (oy, ox, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _clear_window_kernel(frame, bg, oy, ox, h, w):
    H, W = frame.shape[:2]
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    inwin = (yy >= oy) & (yy < oy + h) & (xx >= ox) & (xx < ox + w)
    return jnp.where(inwin[..., None], bg, frame)


class BoundLayers:
    """A scene layer stack bound into per-frame kernels as PROGRAM CONSTANTS.

    Passing K layers as call arguments costs per-call marshalling of 2K
    buffer handles over the device transport (~1.3 ms at K=132 on the
    tunnel).  Binding bakes the (immutable) layer planes into the compiled
    executable: per-frame arguments shrink to the frame + a (K, 2) offset
    array + scalars.  Bind once per scene; rebind if any layer's CONTENT
    changes (translation does not — offsets are per-call)."""

    def __init__(self, layers: Sequence[Sprite]):
        self.layers: List[Sprite] = [s for s in layers if s is not None]
        self.flat: tuple = tuple(x for s in self.layers for x in (s.rgba, s.mask))
        self._fns = {}

    def fn(self, key, make):
        got = self._fns.get(key)
        if got is None:
            got = self._fns[key] = make()
        return got


class FrameBuffer:
    """A device framebuffer with incremental window compositing."""

    def __init__(self, width: int, height: int, bg_colour: int):
        self.width = width
        self.height = height
        self.bg = jnp.asarray(C.rgba_of_colour(bg_colour), dtype=jnp.int32)
        self.rgba = jnp.broadcast_to(self.bg, (height, width, 4)).astype(jnp.int32)
        # box of the framebuffer in scene coords (1-based like the reference)
        self.box: Box = (1, 1, width, height)

    def clear_window(self, box: Box):
        ib = box_intersect(box, self.box)
        if ib is None:
            return
        w, h = box_wh(ib)
        self.rgba = _clear_window_kernel(
            self.rgba, self.bg, ib[1] - 1, ib[0] - 1, h, w
        )

    def composite(self, box: Box, layers: Sequence[Sprite]):
        """Composite sprites (front-to-back) into the window `box` — ONE
        dispatch per call: reprojection (per-layer shift into the window) is
        fused into the kernel instead of two eager shift calls per sprite,
        so a chunk of K sprites costs 1 device round trip, not 2K+1."""
        ib = box_intersect(box, self.box)
        if ib is None:
            return
        if not layers:
            return
        w, h = box_wh(ib)
        hb, wb = bucket_hw(h, w)
        # Clamp the bucketed window to the framebuffer so the dynamic slice
        # in the kernel stays in range; content past `box` is clear anyway.
        hb = min(hb, self.height)
        wb = min(wb, self.width)
        oy = min(ib[1] - 1, self.height - hb)
        ox = min(ib[0] - 1, self.width - wb)
        offs = [(s.box[1] - (oy + 1), s.box[0] - (ox + 1)) for s in layers]
        flat = []
        for s in layers:
            flat.append(s.rgba)
            flat.append(s.mask)
        self.rgba = _composite_window_fused(
            self.rgba,
            jnp.asarray(offs, jnp.int32),
            oy,
            ox,
            ib[1] - 1 - oy,
            ib[0] - 1 - ox,
            h,
            w,
            *flat,
            hb=hb,
            wb=wb,
        )

    def read(self) -> np.ndarray:
        return np.asarray(self.rgba)

    def _window(self, box: Box):
        """Bucketed device window covering box: (oy, ox, ry0, rx0, h, w, hb, wb)."""
        w, h = box_wh(box)
        hb, wb = bucket_hw(h, w)
        hb = min(hb, self.height)
        wb = min(wb, self.width)
        oy = min(box[1] - 1, self.height - hb)
        ox = min(box[0] - 1, self.width - wb)
        return oy, ox, box[1] - 1 - oy, box[0] - 1 - ox, h, w, hb, wb

    def _layer_pack(
        self, layers: Sequence[Sprite], win: Box, oy: int, ox: int, prefilter: bool
    ):
        """Front-to-back layers meeting `win`, flattened for the kernels.
        prefilter=False keeps every layer (out-of-window layers contribute
        nothing in-kernel) so a fixed layer list compiles ONE program for a
        whole animation loop instead of one per box-overlap combination."""
        keep = [
            s
            for s in layers
            if s is not None and (not prefilter or box_intersect(s.box, win))
        ]
        offs = [(s.box[1] - (oy + 1), s.box[0] - (ox + 1)) for s in keep]
        flat = []
        for s in keep:
            flat.append(s.rgba)
            flat.append(s.mask)
        offs_arr = (
            jnp.asarray(offs, jnp.int32) if offs else jnp.zeros((0, 2), jnp.int32)
        )
        return offs_arr, flat

    def recomposite(
        self,
        box: Box,
        layers: Sequence[Sprite],
        prefilter: bool = True,
        bound: Optional[BoundLayers] = None,
    ):
        """Replace the window `box` with the front-to-back fold of `layers`
        over the background colour — the incremental re-render of a dirty
        region.  `layers` is the scene's full front-to-back layer list (or
        any superset of those meeting the box); box filtering happens here.

        Bit-exactness note: integer `over` is NOT associative, so painting a
        sprite over a pre-composited background snapshot diverges (±1) from
        the reference's front-to-back fold wherever two translucent layers
        stack (e.g. a sprite crossing another object's AA fringe).  Hence
        dirty windows recomposite the layer stack left-to-right exactly as
        render_scene's caf-over fold (render.ml:1310-1335), in ONE fused
        dispatch.

        With `bound` (a BoundLayers built from this exact layer stack —
        same arrays, same order; only boxes may differ, e.g. translated
        sprites), the layer planes live inside the compiled program and the
        per-frame call ships only offsets — the fastest animated path."""
        ib = box_intersect(box, self.box)
        if ib is None:
            return
        oy, ox, ry0, rx0, h, w, hb, wb = self._window(ib)
        if bound is not None:
            offs = _bound_offsets(layers, oy, ox)
            fn = bound.fn(
                ("recomposite", hb, wb),
                lambda: _make_bound_recomposite(bound.flat, hb, wb),
            )
            self.rgba = fn(self.rgba, offs, self.bg, oy, ox, ry0, rx0, h, w)
            return
        offs, flat = self._layer_pack(layers, ib, oy, ox, prefilter)
        self.rgba = _recomposite_window_kernel(
            self.rgba, offs, self.bg, oy, ox, ry0, rx0, h, w, *flat, hb=hb, wb=wb
        )

    def apply_blur(self, f_alpha, kernel):
        """Blend the blur of the current frame into the filter geometry's
        alpha plane (the blur filter's initial full application;
        filters.ml:247-261 + the blend' of render.ml:1248-1265)."""
        self.rgba = _apply_blur_rect_kernel(
            self.rgba, f_alpha, weights=tuple(kernel.values), total=kernel.total
        )

    def recomposite_blur(
        self,
        dirty: Box,
        layers: Sequence[Sprite],
        f_alpha,
        kernel,
        prefilter: bool = True,
        bound: Optional[BoundLayers] = None,
    ):
        """One-dispatch animated frame with a live blur filter: the window
        (dirty bloated by 2*radius) is recomposited from the scene's layer
        stack (same exact fold as `recomposite`), the changed part of the
        filter re-convolved, and the result alpha-blended by the filter
        geometry's alpha plane — all in a single fused kernel.  f_alpha:
        (height, width) int32 device plane of the filter geometry's PURE-AA
        alpha (fastframe.alpha_plane_of_object)."""
        got = blur_window(dirty, self.box, kernel.radius, self.height, self.width)
        if got is None:
            return
        d, oy, ox, ry0, rx0, h, w, hb, wb, d_box = got
        # Logical window box (for layer box filtering).
        d2 = (ox + 1 + rx0, oy + 1 + ry0, ox + rx0 + w, oy + ry0 + h)
        if bound is not None:
            offs = _bound_offsets(layers, oy, ox)
            weights, total = tuple(kernel.values), kernel.total
            fn = bound.fn(
                ("recomposite_blur", hb, wb, weights, total),
                lambda: _make_bound_recomposite_blur(bound.flat, hb, wb, weights, total),
            )
            self.rgba = fn(
                self.rgba, offs, self.bg, f_alpha, oy, ox, ry0, rx0, h, w, d_box
            )
            return
        offs, flat = self._layer_pack(layers, d2, oy, ox, prefilter)
        self.rgba = _recomposite_blur_kernel(
            self.rgba,
            offs,
            self.bg,
            f_alpha,
            oy,
            ox,
            ry0,
            rx0,
            h,
            w,
            d_box,
            *flat,
            hb=hb,
            wb=wb,
            weights=tuple(kernel.values),
            total=kernel.total,
        )


def blur_window(dirty: Box, logical: Box, radius: int, height: int, width: int):
    """Shared dirty-window geometry for the blur paths: returns
    (d, oy, ox, ry0, rx0, h, w, hb, wb, d_box) or None when `dirty` misses
    `logical`.  The window is the dirty box bloated by 2*radius (clamped),
    bucketed, and clamped to the frame; d_box is the dirty rect in WINDOW
    coordinates (row0, col0, row1, col1 inclusive) as an int32 numpy array
    (np args ride the jit dispatch).  Used by FrameBuffer.recomposite_blur
    and fastframe.FilteredDisplay.step/step_animated — one copy of the
    bloat/clamp arithmetic, so the bit-identical blur paths cannot drift."""
    d = box_intersect(dirty, logical)
    if d is None:
        return None
    d2 = box_intersect(
        (d[0] - 2 * radius, d[1] - 2 * radius, d[2] + 2 * radius, d[3] + 2 * radius),
        logical,
    )
    w, h = box_wh(d2)
    hb, wb = bucket_hw(h, w)
    hb = min(hb, height)
    wb = min(wb, width)
    oy = min(d2[1] - 1, height - hb)
    ox = min(d2[0] - 1, width - wb)
    d_box = np.asarray(
        [d[1] - 1 - oy, d[0] - 1 - ox, d[3] - 1 - oy, d[2] - 1 - ox], np.int32
    )
    return d, oy, ox, d2[1] - 1 - oy, d2[0] - 1 - ox, h, w, hb, wb, d_box


def conv_blend_window(content, f_alpha_win, inwin, rows, cols, d_box, weights, total):
    """The blur filter's window pass, shared by every blur path: exact
    separable integer convolution of `content` (convolve.ml:115-158 via
    convolve._conv1d_exact/_setcanvas_xy) and the blend' of
    render.ml:1248-1265 — out = dissolve(scene, 255-a) + dissolve(blur, a)
    — with the changed mask in_d | (bloat(in_d, r) & a>0), clipped to the
    logical window.  Returns (changed, blended)."""
    from .convolve import _conv1d_exact, _setcanvas_xy

    cx = _setcanvas_xy(_conv1d_exact(content, weights=weights, axis=1), total)
    cy = _setcanvas_xy(_conv1d_exact(cx, weights=weights, axis=0), total)
    radius = len(weights) // 2

    def rect(b0, b1, b2, b3):
        return (rows >= b0) & (rows <= b2) & (cols >= b1) & (cols <= b3)

    in_d = rect(d_box[0], d_box[1], d_box[2], d_box[3])
    in_blur = rect(
        d_box[0] - radius, d_box[1] - radius, d_box[2] + radius, d_box[3] + radius
    )
    changed = (in_d | (in_blur & (f_alpha_win > 0))) & inwin
    blended = C.dissolve_rgba(content, 255 - f_alpha_win) + C.dissolve_rgba(
        cy, f_alpha_win
    )
    return changed, blended


def _bound_offsets(layers: Sequence[Sprite], oy: int, ox: int):
    """(K, 2) per-layer window offsets from the LIVE sprite list (boxes may
    have moved since binding; arrays must not have)."""
    return jnp.asarray(
        [
            (s.box[1] - (oy + 1), s.box[0] - (ox + 1))
            for s in layers
            if s is not None
        ],
        jnp.int32,
    )


def _make_bound_recomposite(flat, hb, wb):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def fn(frame, offs, bg, oy, ox, ry0, rx0, h, w):
        return _recomposite_window_impl(
            frame, offs, bg, oy, ox, ry0, rx0, h, w, flat, hb, wb
        )

    return fn


def _make_bound_recomposite_blur(flat, hb, wb, weights, total):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def fn(frame, offs, bg, f_alpha, oy, ox, ry0, rx0, h, w, d_box):
        return _recomposite_blur_impl(
            frame, offs, bg, f_alpha, oy, ox, ry0, rx0, h, w, d_box, flat,
            hb=hb, wb=wb, weights=weights, total=total,
        )

    return fn


def fold_layers_carry(offs, layers, acc, open_mask, covered):
    """Front-to-back caf-over fold of a layer pack with early-termination
    masking (render.ml:1291-1308 semantics) and a painted-union plane —
    the ONE fold body shared by the window recomposite kernels and the
    batched group compositor (chunking with this carry is identity for a
    left fold).  Returns (acc, open_mask, covered)."""
    hb, wb = open_mask.shape
    for i in range(len(layers) // 2):
        rgba, mask = layers[2 * i], layers[2 * i + 1]
        hs, ws = mask.shape
        iy = jnp.arange(hb) - offs[i, 0]
        ix = jnp.arange(wb) - offs[i, 1]
        vy = (iy >= 0) & (iy < hs)
        vx = (ix >= 0) & (ix < ws)
        m = mask[jnp.clip(iy, 0, hs - 1), :][:, jnp.clip(ix, 0, ws - 1)]
        m = m & vy[:, None] & vx[None, :]
        r = rgba[jnp.clip(iy, 0, hs - 1), :, :][:, jnp.clip(ix, 0, ws - 1), :]
        paint = m & open_mask
        blended = C.over_rgba(acc, r)
        acc = jnp.where(paint[..., None], blended, acc)
        covered = covered | paint
        open_mask = open_mask & ~(paint & (acc[..., 3] == 255))
    return acc, open_mask, covered


def _fold_layers(offs, layers, inwin, hb, wb):
    """Fresh fold clipped to the logical window (the recomposite kernels)."""
    acc, _, _ = fold_layers_carry(
        offs,
        layers,
        jnp.zeros((hb, wb, 4), dtype=jnp.int32),
        inwin,
        jnp.zeros((hb, wb), dtype=bool),
    )
    return acc


def _recomposite_window_impl(frame, offs, bg, oy, ox, ry0, rx0, h, w, layers, hb, wb):
    rows = jnp.arange(hb)[:, None]
    cols = jnp.arange(wb)[None, :]
    inwin = (rows >= ry0) & (rows < ry0 + h) & (cols >= rx0) & (cols < rx0 + w)
    acc = _fold_layers(offs, layers, inwin, hb, wb)
    window = jax.lax.dynamic_slice(frame, (oy, ox, 0), (hb, wb, 4))
    base = jnp.where(inwin[..., None], jnp.broadcast_to(bg, (hb, wb, 4)), window)
    out = C.over_rgba(acc, base)
    return jax.lax.dynamic_update_slice(frame, out, (oy, ox, 0))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("hb", "wb"))
def _recomposite_window_kernel(frame, offs, bg, oy, ox, ry0, rx0, h, w, *layers, hb, wb):
    return _recomposite_window_impl(
        frame, offs, bg, oy, ox, ry0, rx0, h, w, layers, hb, wb
    )


@functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=("hb", "wb", "weights", "total")
)
def _recomposite_blur_kernel(
    frame, offs, bg, f_alpha, oy, ox, ry0, rx0, h, w, d_box, *layers, hb, wb, weights, total
):
    return _recomposite_blur_impl(
        frame, offs, bg, f_alpha, oy, ox, ry0, rx0, h, w, d_box, layers,
        hb=hb, wb=wb, weights=weights, total=total,
    )


def _recomposite_blur_impl(
    frame, offs, bg, f_alpha, oy, ox, ry0, rx0, h, w, d_box, layers, *, hb, wb, weights, total
):
    """One-dispatch animated frame WITH a live blur filter: recomposite the
    window content from the layer stack (exact front-to-back fold over the
    background colour), run the exact separable integer convolution (the
    XYKernel semantics of convolve.ml:115-158 via convolve._conv1d_exact/
    _setcanvas_xy), and blend by the filter geometry's alpha plane exactly
    as the general renderer's blend' (render.ml:1248-1265): out =
    dissolve(scene, 255-a) + dissolve(blurred, a) — so the filter's
    antialiased border matches the filter-recursion path bit for bit.

    f_alpha: (H, W) int32 full-frame alpha plane of the filter geometry.
    d_box: (4,) int32 dirty rect in WINDOW coordinates (row0, col0, row1,
    col1 inclusive).  The window must be the dirty box bloated by 2*radius
    (clamped to the frame): blended writes go to bloat(dirty, r) ∩
    (alpha > 0) ∪ dirty, whose convolution support stays inside the
    logical window (where content is true recomposited scene), so neither
    SAME-zero padding nor the stale bucket-padding ring ever leaks into
    written pixels (and AT frame borders zero padding equals the
    reference's clear-canvas border, convolve.ml:239-258)."""
    rows = jnp.arange(hb)[:, None]
    cols = jnp.arange(wb)[None, :]
    inwin = (rows >= ry0) & (rows < ry0 + h) & (cols >= rx0) & (cols < rx0 + w)
    acc = _fold_layers(offs, layers, inwin, hb, wb)
    frame_win = jax.lax.dynamic_slice(frame, (oy, ox, 0), (hb, wb, 4))
    base = jnp.where(inwin[..., None], jnp.broadcast_to(bg, (hb, wb, 4)), frame_win)
    content = C.over_rgba(acc, base)
    fa = jax.lax.dynamic_slice(f_alpha, (oy, ox), (hb, wb))
    changed, blended = conv_blend_window(
        content, fa, inwin, rows, cols, d_box, weights, total
    )
    out = jnp.where(changed[..., None], blended, frame_win)
    return jax.lax.dynamic_update_slice(frame, out, (oy, ox, 0))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("weights", "total"))
def _apply_blur_rect_kernel(frame, f_alpha, *, weights, total):
    """Full-frame pass: blend the blur of the frame into the filter
    geometry's alpha plane (used once after the initial composite; frames
    thereafter maintain it incrementally via _recomposite_blur_kernel)."""
    from .convolve import _conv1d_exact, _setcanvas_xy

    cx = _setcanvas_xy(_conv1d_exact(frame, weights=weights, axis=1), total)
    cy = _setcanvas_xy(_conv1d_exact(cx, weights=weights, axis=0), total)
    fa = f_alpha[..., None]
    blended = C.dissolve_rgba(frame, 255 - f_alpha) + C.dissolve_rgba(cy, f_alpha)
    return jnp.where(fa > 0, blended, frame)
