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

# Layer-count buckets: pad K to the next of these so the scan compiles a
# handful of times.
_K_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def _k_bucket(k: int) -> int:
    for b in _K_BUCKETS:
        if k <= b:
            return b
    return ((k + 127) // 128) * 128


@functools.partial(jax.jit, donate_argnums=(0,))
def _composite_window_kernel(frame, layers_rgba, layers_mask, oy, ox):
    """Composite a front-to-back layer pack into frame[oy:, ox:].

    layers_rgba: (K, h, w, 4) int32; layers_mask: (K, h, w) bool; layer 0 is
    topmost.  The pack accumulates top-down exactly like the renderer's
    `caf over` fold; the result then goes `over` the existing frame content
    (which plays the role of anything beneath the dirty region — callers
    clear the window first when re-rendering from scratch).
    """
    k, h, w = layers_mask.shape
    acc = jnp.zeros((h, w, 4), dtype=jnp.int32)
    open_mask = jnp.ones((h, w), dtype=bool)

    def body(carry, layer):
        acc, open_mask = carry
        rgba, mask = layer
        paint = mask & open_mask
        blended = C.over_rgba(acc, rgba)
        acc = jnp.where(paint[..., None], blended, acc)
        open_mask = open_mask & ~(paint & (acc[..., 3] == 255))
        return (acc, open_mask), None

    (acc, open_mask), _ = jax.lax.scan(body, (acc, open_mask), (layers_rgba, layers_mask))
    window = jax.lax.dynamic_slice(frame, (oy, ox, 0), (h, w, 4))
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
        """Composite sprites (front-to-back) into the window `box`."""
        ib = box_intersect(box, self.box)
        if ib is None:
            return
        w, h = box_wh(ib)
        hb, wb = bucket_hw(h, w)
        # Clamp the bucketed window to the framebuffer so the dynamic slice
        # in the kernel stays in range; content past `box` is clear anyway.
        hb = min(hb, self.height)
        wb = min(wb, self.width)
        oy = min(ib[1] - 1, self.height - hb)
        ox = min(ib[0] - 1, self.width - wb)
        wbox = (ox + 1, oy + 1, ox + wb, oy + hb)
        k = _k_bucket(max(1, len(layers)))
        rgba_stack = []
        mask_stack = []
        for s in layers:
            m = region._reproject_mask(s, wbox, hb, wb)
            r = region._reproject_rgba(s, wbox, hb, wb)
            mask_stack.append(m)
            rgba_stack.append(r)
        while len(rgba_stack) < k:
            rgba_stack.append(jnp.zeros((hb, wb, 4), dtype=jnp.int32))
            mask_stack.append(jnp.zeros((hb, wb), dtype=bool))
        layers_rgba = jnp.stack(rgba_stack)
        layers_mask = jnp.stack(mask_stack)
        self.rgba = _composite_window_kernel(self.rgba, layers_rgba, layers_mask, oy, ox)

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
