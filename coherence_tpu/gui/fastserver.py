"""TPU-backed display server: the reference's two-endpoint architecture
(engine.ml:208-252 paint semantics, main.py:219-226 client blits) with
frames produced by the fused tiled/animated device path (DeviceView +
FilteredDisplay) instead of the general renderer.

Speaks the same byte wire protocol (gui/wire.py) through WindowSystem /
RemoteDisplay, so any client — HeadlessClient, tkclient, or a real widget
toolkit — works unmodified.  Per drag event: ONE fused device dispatch
(atlas piece update + dirty-tile recomposite + blur blend,
fastframe.step_animated, bit-identical to the general renderer per
tests/test_blit_blur.py), then ONLY the rewritten display window is read
back and shipped as a RefreshWindow — the client-observed latency is
dispatch + window readback + socket, independent of frame size.

This is the serving configuration for interactive workloads: the general
Engine (gui/app.py) keeps full reference semantics (arbitrary scene
edits, tools, undo); FastSession serves the hot interactive loop — drag
an animated object under a live filter — at device rate.
"""

from __future__ import annotations

import functools
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..raster import convolve as rconvolve
from ..raster.region import bucket_hw
from ..scene import render as R
from ..scene.fastframe import (
    DeviceView,
    FilteredDisplay,
    alpha_plane_of_object,
    tiled_sprite_of_object,
)
from . import window as W
from .window import RemoteDisplay


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _window_rgb_kernel(rgba, y0, x0, *, h, w):
    """Bucketed window of the display plane as uint8 RGB (device-side
    slice + channel drop: ship h*w*3 bytes, not the whole frame)."""
    win = lax.dynamic_slice(rgba, (y0, x0, 0), (h, w, 4))
    return win[..., :3].astype(jnp.uint8)


class FastSession:
    """One window serving an animated-object-under-filter scene.

    scene_objs: static content (front-to-back); blob: the draggable
    animated object (topmost); f_geom: the blur filter's lens geometry.
    The caller owns the connection; run() drives the event loop until the
    client closes."""

    def __init__(
        self,
        connection,
        width: int,
        height: int,
        scene_objs,
        blob: R.Obj,
        f_geom: R.Obj,
        blur_radius: int = 5,
        atlas_cap: Optional[int] = None,
        staged=None,
        name: str = "coherence (tpu)",
        warm_blur_radii=(),  # e.g. (1, 2, 3, 4, 5, 6) for a live slider
    ):
        self.width, self.height = width, height
        self.wx = W.WindowSystem(display=RemoteDisplay(connection))
        self.wx.poll()  # AppStartup
        self.win = self.wx.make_window(name, width, height, 0, 0, 0, 0)

        view = DeviceView(width, height, **(
            {"atlas_cap": atlas_cap} if atlas_cap else {}
        ))
        f_alpha = alpha_plane_of_object(f_geom, width, height)
        view.set_scene(list(scene_objs), tiled=True, staged=staged)
        blob_spr = tiled_sprite_of_object(blob, view.pw, view.ph)
        self.blob_key = blob.idset
        view.sprites[self.blob_key] = blob_spr
        view.order.insert(0, self.blob_key)
        view.make_animated(self.blob_key)
        self.view = view
        self.f_alpha = f_alpha
        # Lens support box (1-based inclusive): a blur-radius change only
        # alters pixels where the filter alpha is nonzero, so the slider
        # reblends + ships THIS window, not the frame.
        al = np.asarray(f_alpha) > 0
        ys, xs = np.where(al.any(1))[0], np.where(al.any(0))[0]
        self.lens_box = (
            (int(xs[0]) + 1, int(ys[0]) + 1, int(xs[-1]) + 1, int(ys[-1]) + 1)
            if ys.size
            else None
        )
        self.disp = FilteredDisplay(view, f_alpha, rconvolve.mkgaussian(blur_radius))
        self.disp.full_refresh()
        self.dragging = False
        self.last_xy = (0, 0)
        self.ship_full()
        if warm_blur_radii and view.mesh is None:
            self._warm_blur(tuple(warm_blur_radii))

    def _warm_blur(self, radii) -> None:
        """Load the per-radius blur-blend programs before serving starts:
        each radius is a distinct XLA program (static conv weights +
        bucketed window dims), and on the remote transport a first use
        costs a 1-7 s program load — the slider's p95 without this.  One
        short-lived thread per radius (loads from separate threads
        overlap), all joined before the event loop runs; outputs are
        discarded."""
        from ..raster.framepath import blur_window
        from ..scene.fastframe import _blur_blend_window_kernel

        if self.lens_box is None:
            return

        def one(r):
            try:
                k = rconvolve.mkgaussian(max(1, int(r)))
                got = blur_window(
                    self.lens_box, (1, 1, self.width, self.height),
                    k.radius, self.height, self.width,
                )
                if got is None:
                    return
                _d, oy, ox, ry0, rx0, h, w, hb, wb, d_box = got
                # Throwaway operands: the kernel DONATES the display plane
                # (feeding the live disp.rgba here would delete it).
                _blur_blend_window_kernel(
                    jnp.zeros_like(self.disp.rgba),
                    jnp.zeros_like(self.view.frame),
                    self.f_alpha,
                    oy, ox, ry0, rx0, h, w, d_box, hb=hb, wb=wb,
                    weights=tuple(k.values), total=k.total,
                )
            except Exception:  # noqa: BLE001 — warm-up must never kill serving
                pass

        ths = [threading.Thread(target=one, args=(r,)) for r in radii]
        for t in ths:
            t.start()
        for t in ths:
            t.join()

    # --- pixel shipping -------------------------------------------------------

    def ship_window(self, x0: int, y0: int, x1: int, y1: int) -> None:
        """Read [x0..x1] x [y0..y1] (1-based inclusive box) of the display
        plane and RefreshWindow it to the client (synchronous: returns
        when the client has the pixels — the latency the user feels)."""
        x0 = max(1, x0); y0 = max(1, y0)
        x1 = min(self.width, x1); y1 = min(self.height, y1)
        if x0 > x1 or y0 > y1:
            return
        h, w = y1 - y0 + 1, x1 - x0 + 1
        hb, wb = bucket_hw(h, w)
        hb, wb = min(hb, self.height), min(wb, self.width)
        # Clamp the bucketed window inside the plane; blit the WHOLE
        # bucket (its extra rows/cols re-ship unchanged pixels).
        r0 = min(y0 - 1, self.height - hb)
        c0 = min(x0 - 1, self.width - wb)
        rgb = np.asarray(
            _window_rgb_kernel(
                self.disp.rgba, jnp.int32(r0), jnp.int32(c0), h=hb, w=wb
            )
        )
        fb = self.wx.framebuffers[self.win]
        fb[r0 : r0 + hb, c0 : c0 + wb] = rgb
        self.wx.refresh_window(self.win, (c0, r0, c0 + wb - 1, r0 + hb - 1))

    def ship_full(self) -> None:
        self.ship_window(1, 1, self.width, self.height)

    # --- interactions -----------------------------------------------------------

    def drag_step(self, dx: int, dy: int) -> None:
        """ONE fused device dispatch, then ship only the rewritten window."""
        prev = self.view.sprites[self.blob_key].box
        self.disp.step_animated(self.blob_key, dx, dy)
        now = self.view.sprites[self.blob_key].box
        r = self.disp.kernel.radius
        x0 = min(prev[0], now[0]) - 2 * r
        y0 = min(prev[1], now[1]) - 2 * r
        x1 = max(prev[2], now[2]) + 2 * r
        y1 = max(prev[3], now[3]) + 2 * r
        self.ship_window(x0, y0, x1, y1)

    def set_blur(self, v: int) -> None:
        """Radius change: reblend + ship ONLY the lens window (content is
        untouched; pixels outside the filter alpha cannot change)."""
        self.disp.kernel = rconvolve.mkgaussian(max(1, int(v)))
        if self.lens_box is None:
            return
        self.disp.step(self.lens_box)
        self.ship_window(*self.lens_box)

    def _hit_blob(self, x: int, y: int) -> bool:
        x0, y0, x1, y1 = self.view.sprites[self.blob_key].box
        return x0 - 1 <= x <= x1 and y0 - 1 <= y <= y1

    # --- event loop --------------------------------------------------------------

    def handle(self, e) -> bool:
        """One event; returns False when the session should end."""
        kind = e[0]
        if kind in (W.APP_CLOSE, W.WINDOW_CLOSED):
            return False
        if kind == W.PAINT_RECT:
            _, _w, x, y, pw, ph = e
            self.ship_window(x + 1, y + 1, x + pw, y + ph)
        elif kind == W.LEFT_DOWN:
            _, _w, x, y = e
            self.dragging = self._hit_blob(x, y)
            self.last_xy = (x, y)
        elif kind == W.LEFT_DRAGGING:
            _, _w, x, y = e
            if self.dragging:
                lx, ly = self.last_xy
                if (x, y) != (lx, ly):
                    self.drag_step(x - lx, y - ly)
            self.last_xy = (x, y)
        elif kind == W.LEFT_UP:
            self.dragging = False
        elif kind == W.BLUR_SLIDER:
            self.set_blur(e[2])
        return True

    def run(self, max_events: Optional[int] = None) -> None:
        n = 0
        try:
            while max_events is None or n < max_events:
                e = self.wx.poll()
                if e[0] == W.NULL_EVENT:
                    continue
                if not self.handle(e):
                    break
                n += 1
        finally:
            try:
                self.wx.close_application()  # tell the client we're done
            except Exception:
                pass
