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
    acc = jnp.zeros((hb, wb, 4), dtype=jnp.int32)
    open_mask = inwin
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
        open_mask = open_mask & ~(paint & (acc[..., 3] == 255))
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

    def snapshot(self):
        """Immutable copy of the current contents (e.g. as a static
        background plane for animated-sprite coherence)."""
        return self.rgba + 0

    def blit_over_background(self, background, spr: Sprite, dirty: Box):
        """One-dispatch animated-sprite frame: restore the dirty window from
        `background` (the composited static scene below the sprite) and paint
        the sprite over it.  This is the device form of the reference's
        translated-object fast path (cache.ml TranslatedObject + dirty-region
        rendering): no re-rasterization, no per-object traffic."""
        ib = box_intersect(dirty, self.box)
        if ib is None:
            return
        w, h = box_wh(ib)
        hb, wb = bucket_hw(h, w)
        hb = min(hb, self.height)
        wb = min(wb, self.width)
        oy = min(ib[1] - 1, self.height - hb)
        ox = min(ib[0] - 1, self.width - wb)
        # Sprite offset within the window (window scene origin = (ox+1, oy+1)).
        dy = spr.box[1] - (oy + 1)
        dx = spr.box[0] - (ox + 1)
        self.rgba = _blit_over_bg_kernel(
            self.rgba, background, spr.rgba, spr.mask, dy, dx, oy, ox, hb=hb, wb=wb
        )


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("hb", "wb"))
def _blit_over_bg_kernel(frame, background, rgba, mask, dy, dx, oy, ox, *, hb, wb):
    hs, ws = mask.shape
    iy = jnp.arange(hb) - dy
    ix = jnp.arange(wb) - dx
    vy = (iy >= 0) & (iy < hs)
    vx = (ix >= 0) & (ix < ws)
    m = mask[jnp.clip(iy, 0, hs - 1), :][:, jnp.clip(ix, 0, ws - 1)]
    m = m & vy[:, None] & vx[None, :]
    r = rgba[jnp.clip(iy, 0, hs - 1), :, :][:, jnp.clip(ix, 0, ws - 1), :]
    bg_win = jax.lax.dynamic_slice(background, (oy, ox, 0), (hb, wb, 4))
    out = jnp.where(m[..., None], C.over_rgba(r, bg_win), bg_win)
    return jax.lax.dynamic_update_slice(frame, out, (oy, ox, 0))
