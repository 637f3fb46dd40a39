"""End-to-end interactive session benchmark THROUGH the display protocol.

The reference's reason to exist is redraw-at-mouse-drag rate through a TCP
socket to a GUI process (engine.ml:208-221 paints the minimal update region,
main.py:219-226 blits it).  Every other bench number here is an
engine-internal frame loop; this one measures what the USER sees: the
latency from a client input event to the repainted pixels arriving back at
the client, over the real wire protocol, with the real engine event loop,
picking, selection handles, undo recording and cache coherence in the path.

Session (per resolution):
  1. click the translucent blob (render-based picking), then drag it
     N_DRAG steps — per-step latency = LeftDragging sent -> RefreshWindow
     pixels landed client-side;
  2. move the blur slider over the selection (changeblur re-filters the
     object and repaints its bloated dirty window);
  3. rubberband-zoom into the lion with the Zoom tool (full-window
     re-render at the new transform), then right-click to zoom back out.

Engine and client run as two threads of one process connected by a real
localhost TCP socket (exactly test_checkpoint_client.py's topology — the
reference also ran both processes on one box).  Prints one JSON line per
resolution with median/p95 latencies and the client-observed drag fps.

Usage: python benchmarks/session.py [1080p|4k|demo|all]
"""

import json
import os
import socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DRAG = 100
N_WARM = 8
BLUR_STEPS = [1, 2, 3, 4, 5, 6, 5, 4, 3, 2]


def _cache_cfg():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass


def blob_coords(W: int, H: int):
    return int(W * 0.22), int(H * 0.25), max(24, H // 18)


def build_scene(W: int, H: int):
    """Lion scaled to the window + blur-filter band + draggable blob."""
    import coherence_tpu.colour as C
    import coherence_tpu.transform as tr
    from coherence_tpu import ident
    from coherence_tpu.geometry import shapes as gshapes
    from coherence_tpu.raster import convolve as rconvolve
    from coherence_tpu.raster import fills as rfills
    from coherence_tpu.scene import examples as E, filters as F, render as R

    lion = E.smalllion()
    xmin, xmax, ymin, ymax = R.bounds_of_basicshape(lion)
    scale = (H * 0.9) / max(xmax - xmin, ymax - ymin)
    lion_obj = R.transform_renderobject_many(
        [
            tr.Translate(W * 0.05, H * 0.95),
            tr.Scale((0.0, 0.0), 1.0, -1.0),
            tr.Scale((0.0, 0.0), scale, scale),
            tr.Translate(-xmin, -ymin),
        ],
        lion,
    )
    # Blur-filter band over the middle of the lion (filters.ml:247-261).
    filt = R.Obj(
        ident.new_ids(),
        F.blur(
            R.Basic(
                rfills.plain(C.white),
                R.rectangle(W * 0.30, H * 0.45, W * 0.40, H * 0.25),
            ),
            rconvolve.mkgaussian(3),
        ),
        (),
        R.OVER,
    )
    # Draggable translucent blob, clear of the filter so picking hits it.
    bx, by, br = blob_coords(W, H)
    blob = R.Obj(
        ident.new_ids(),
        R.Basic(
            rfills.plain(C.dissolve(C.red, delta=160)),
            R.PathShape(gshapes.circle(float(bx), float(by), float(br))),
        ),
        (),
        R.OVER,
    )
    return [blob, filt, lion_obj], (bx, by, br)


def engine_thread(conn, W, H, ready, fail, scene_override=None):
    """Engine endpoint: build the view, paint it, then serve events.

    The WHOLE thread body runs under the host-compute placement policy
    (utils/placement.py): over the tunneled device the scene build, the
    first paint and every per-event dirty render execute on the in-process
    CPU backend (Engine.run applies the policy too, but the build and first
    paint happen before it).  Thread-local, so a fused fast session on the
    accelerator can share the process."""
    try:
        from coherence_tpu.gui.app import Engine, background_obj
        from coherence_tpu.gui.window import RemoteDisplay
        from coherence_tpu.raster import region
        from coherence_tpu.scene import render as R
        from coherence_tpu.utils import placement

        with placement.engine_host_compute() as on_host:
            ready["engine_host_compute"] = bool(on_host)
            eng = Engine(display=RemoteDisplay(conn))
            if scene_override is not None:
                scene = scene_override[0]
            else:
                scene, _ = build_scene(W, H)
            view = R.View(
                scene=scene,
                pages=[],
                background=[background_obj()],
                master_update=region.shape_of_box((0, 0, W, H)),
            )
            eng.views.append(view)
            view.window = eng.wx.make_window("session", W, H, 0, 0, 0, 0)
            eng.force_update_whole(view)
            ready["t_first_paint"] = time.perf_counter()
            eng.run()
    except Exception as e:  # noqa: BLE001 — surfaced by the driver thread
        fail.append(e)


class TimingClient:
    """HeadlessClient wrapper that timestamps pixel arrivals."""

    def __init__(self, conn, fail=None):
        from coherence_tpu.gui import client as cl

        outer = self

        class _C(cl.HeadlessClient):
            def _on_refresh(self, w):
                outer.refreshes += 1
                outer.last_refresh = time.perf_counter()

        self.c = _C(conn)
        self.refreshes = 0
        self.last_refresh = 0.0
        self.fail = fail if fail is not None else []

    def await_refresh(self, min_new: int = 1) -> float:
        """Serve messages until >= min_new refreshes arrive; returns the
        arrival time of the last one (pixels already in the window image)."""
        target = self.refreshes + min_new
        while self.refreshes < target:
            if not self.c.handle_one():
                # The engine thread sends AppClose from its finally BEFORE
                # its except records the error — give it a moment.
                for _ in range(50):
                    if self.fail:
                        raise self.fail[0]
                    time.sleep(0.1)
                raise RuntimeError("engine closed mid-session")
        return self.last_refresh

    def drain(self):
        """Serve whatever is pending without blocking (extra refreshes from
        a multi-repaint action fold into the current step, not the next)."""
        self.c.pump()

    def barrier(self, win: int):
        """Full engine sync: a 1x1 PaintRect repaints through the whole
        pipeline, and FIFO event order means every prior event has been
        completely handled (including ones with no repaint of their own,
        e.g. a first-click selection) when its refresh lands."""
        # 2x2: refresh_window skips degenerate (1-wide) rects.
        self.c.paint(win, 0, 0, 2, 2)
        self.await_refresh()
        self.drain()


def _stats(xs):
    xs = sorted(xs)
    med = xs[len(xs) // 2]
    p95 = xs[min(len(xs) - 1, int(len(xs) * 0.95))]
    return med, p95


def run_session(W: int, H: int, label: str, n_drag: int = None,
                n_warm: int = None, blur_steps=None, scene=None):
    """Engine-mode session.  Returns the result dict (also printed as one
    JSON line).  `n_drag`/`n_warm`/`blur_steps` default to the module
    constants; `scene` overrides the built scene with
    (objects, (bx, by, br)) for cheap CI runs."""
    n_drag = N_DRAG if n_drag is None else n_drag
    n_warm = N_WARM if n_warm is None else n_warm
    blur_steps = BLUR_STEPS if blur_steps is None else blur_steps
    _cache_cfg()
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    from coherence_tpu.gui import talk

    ready, fail = {}, []
    t_build0 = time.perf_counter()
    client_conn = None
    eng_t = None
    try:
        # Engine connects as the benchmark's second endpoint.
        def _accept():
            sock, _ = server.accept()
            ready["engine_conn"] = talk.Connection(sock)

        acc = threading.Thread(target=_accept)
        acc.start()
        client_conn = talk.connect(port)
        acc.join()
        server.close()
        eng_t = threading.Thread(
            target=engine_thread,
            args=(ready["engine_conn"], W, H, ready, fail, scene),
        )
        eng_t.start()

        tc = TimingClient(client_conn, fail)
        c = tc.c
        tc.await_refresh()  # initial full paint landed client-side
        tc.drain()
        if fail:
            raise fail[0]
        first_paint_s = time.perf_counter() - t_build0
        win = next(iter(c.windows))
        bx, by, br = scene[1] if scene is not None else blob_coords(W, H)

        # --- phase 1: pick + drag -----------------------------------------
        c.mouse = (bx, by)
        c.send_event("LeftDown", win, bx, by)
        tc.barrier(win)  # picking done (a first click repaints nothing)
        drag_lat = []
        x, y = bx, by
        for k in range(n_warm + n_drag):
            dx, dy = (5, 3) if (k // 40) % 2 == 0 else (-5, -3)
            x, y = x + dx, y + dy
            t0 = time.perf_counter()
            c.mouse = (x, y)
            c.send_event("LeftDragging", win, x, y)
            t1 = tc.await_refresh()
            tc.drain()
            if k >= n_warm:  # first steps mint program shapes
                drag_lat.append(t1 - t0)
        c.send_event("LeftUp", win, x, y)
        tc.barrier(win)

        # --- wire floor: 2x2 PaintRect round trips (see run_fast_session)
        floor_lat = []
        for _ in range(11):
            t0 = time.perf_counter()
            c.paint(win, 0, 0, 2, 2)
            t1 = tc.await_refresh()
            tc.drain()
            floor_lat.append(t1 - t0)

        # --- phase 2: blur slider over the selection ----------------------
        blur_lat = []
        for v in blur_steps:
            t0 = time.perf_counter()
            c.send_event("BlurSlider", win, v)
            t1 = tc.await_refresh()
            tc.drain()
            blur_lat.append(t1 - t0)
        c.send_event("BlurSlider", win, 0)
        tc.await_refresh()
        tc.barrier(win)

        # --- phase 3: rubberband zoom (full re-render), then zoom out -----
        c.send_event("Button", 2, win)  # wire order: (button, window)
        tc.barrier(win)  # tool switched (no repaint of its own)
        zx0, zy0 = int(W * 0.3), int(H * 0.3)
        zx1, zy1 = int(W * 0.7), int(H * 0.7)
        c.mouse = (zx0, zy0)
        c.send_event("LeftDown", win, zx0, zy0)
        tc.barrier(win)  # the 1px rubberband seed repaint is skipped
        for fx in (0.4, 0.55, 0.7):
            px, py = int(W * fx), int(H * fx)
            c.mouse = (px, py)
            c.send_event("LeftDragging", win, px, py)
            tc.await_refresh()
        tc.drain()
        t0 = time.perf_counter()
        c.mouse = (zx1, zy1)
        c.send_event("LeftUp", win, zx1, zy1)
        zoom_in_s = tc.await_refresh() - t0
        tc.drain()
        t0 = time.perf_counter()
        c.mouse = (W // 2, H // 2)
        c.send_event("RightDown", win, W // 2, H // 2)
        c.send_event("RightUp", win, W // 2, H // 2)
        zoom_out_s = tc.await_refresh() - t0
        tc.drain()

        c.send_event("AppClose")
        while c.running and c.handle_one():
            pass
    finally:
        if client_conn is not None:
            client_conn.close()
        if eng_t is not None:
            eng_t.join(timeout=60)
    if fail:
        raise fail[0]

    dmed, dp95 = _stats(drag_lat)
    bmed, bp95 = _stats(blur_lat)
    fmed, _ = _stats(floor_lat)
    result = {
        "metric": f"session_{label}_drag_fps_at_client",
        "value": round(1.0 / dmed, 1),
        "unit": "fps",
        "vs_baseline": round((1.0 / dmed) / 60.0, 3),
        "extra": {
            "drag_latency_ms": {
                "median": round(dmed * 1e3, 2),
                "p95": round(dp95 * 1e3, 2),
            },
            "wire_floor_ms": round(fmed * 1e3, 2),
            "blur_slider_latency_ms": {
                "median": round(bmed * 1e3, 2),
                "p95": round(bp95 * 1e3, 2),
            },
            "zoom_in_s": round(zoom_in_s, 3),
            "zoom_out_s": round(zoom_out_s, 3),
            "first_paint_s": round(first_paint_s, 2),
            "drag_steps": n_drag,
            "resolution": f"{W}x{H}",
            # True when the scalar renderer ran on the in-process CPU
            # backend (utils/placement.py): the artifact must say which
            # placement produced these numbers.
            "host_compute": bool(ready.get("engine_host_compute", False)),
        },
    }
    print(json.dumps(result), flush=True)
    return result


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "1080p"
    sizes = {"demo": (646, 400), "1080p": (1920, 1080), "4k": (3840, 2160)}
    for key in [which] if which != "all" else list(sizes):
        if key.startswith("fast"):
            W, H = sizes[key[4:]]
            run_fast_session(W, H, key[4:])
        else:
            W, H = sizes[key]
            run_session(W, H, key)




# --- TPU-path session: FastSession (gui/fastserver.py) ------------------------


def fast_scene(W: int, H: int):
    """Same visual session as build_scene, split for FastSession: static
    lion objects, the draggable blob (animated reserved slot), and the
    blur lens geometry (the filter itself lives in FilteredDisplay)."""
    import coherence_tpu.colour as C
    import coherence_tpu.transform as tr
    from coherence_tpu import ident
    from coherence_tpu.geometry import shapes as gshapes
    from coherence_tpu.raster import fills as rfills
    from coherence_tpu.scene import examples as E, render as R

    lion = E.smalllion()
    xmin, xmax, ymin, ymax = R.bounds_of_basicshape(lion)
    scale = (H * 0.9) / max(xmax - xmin, ymax - ymin)
    lion_obj = R.transform_renderobject_many(
        [
            tr.Translate(W * 0.05, H * 0.95),
            tr.Scale((0.0, 0.0), 1.0, -1.0),
            tr.Scale((0.0, 0.0), scale, scale),
            tr.Translate(-xmin, -ymin),
        ],
        lion,
    )
    objs = list(lion_obj.geometry.objects)
    bx, by, br = blob_coords(W, H)
    blob = R.Obj(
        ident.new_ids(),
        R.Basic(
            rfills.plain(C.dissolve(C.red, delta=160)),
            R.PathShape(gshapes.circle(0.0, 0.0, float(br))),
        ),
        (tr.Translate(float(bx), float(by)),),
        R.OVER,
    )
    f_geom = R.Obj(
        ident.new_ids(),
        R.Basic(
            rfills.plain(C.white),
            R.rectangle(W * 0.30, H * 0.45, W * 0.40, H * 0.25),
        ),
        (),
        R.OVER,
    )
    return objs, blob, f_geom, (bx, by, br)


def run_fast_session(W: int, H: int, label: str, n_drag: int = None,
                     n_warm: int = None, blur_steps=None, scene=None,
                     check_pixels: bool = False):
    """The serving configuration: FastSession (TPU fused animated path)
    behind the same wire protocol; the client measures event -> pixels.
    Drag + blur-slider phases (zoom is config 5's scene-rebuild metric).

    Returns the result dict (also printed as one JSON line).  `scene`
    overrides the lion scene with (objs, blob, f_geom, (bx, by, br));
    `check_pixels` asserts the client-side window equals the server's
    display plane after the drag and blur phases (the CI behavior smoke)."""
    n_drag = N_DRAG if n_drag is None else n_drag
    n_warm = N_WARM if n_warm is None else n_warm
    blur_steps = BLUR_STEPS if blur_steps is None else blur_steps
    _cache_cfg()
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    from coherence_tpu.gui import talk

    ready, fail = {}, []
    t_build0 = time.perf_counter()
    client_conn = None
    srv_t = None
    try:
        def _accept():
            sock, _ = server.accept()
            ready["conn"] = talk.Connection(sock)

        acc = threading.Thread(target=_accept)
        acc.start()
        client_conn = talk.connect(port)
        acc.join()
        server.close()

        objs, blob, f_geom, (bx, by, br) = (
            scene if scene is not None else fast_scene(W, H)
        )

        def server_thread():
            try:
                from coherence_tpu.gui.fastserver import FastSession

                sess = FastSession(
                    ready["conn"], W, H, objs, blob, f_geom, blur_radius=3,
                    warm_blur_radii=sorted(set(blur_steps)),
                )
                ready["sess"] = sess
                sess.run()
            except Exception as e:  # noqa: BLE001
                fail.append(e)

        srv_t = threading.Thread(target=server_thread)
        srv_t.start()

        tc = TimingClient(client_conn, fail)
        c = tc.c
        c.app_start()  # FastSession blocks on this handshake (fastserver.py:75)
        tc.await_refresh()  # initial full frame landed client-side
        tc.drain()
        if fail:
            raise fail[0]
        first_paint_s = time.perf_counter() - t_build0
        win = next(iter(c.windows))

        def _assert_pixels():
            """Client-side window equals the server's display plane — the
            wire protocol shipped exactly the pixels the engine rendered."""
            import numpy as _np

            srv = _np.asarray(ready["sess"].disp.rgba)[..., :3].astype(_np.uint8)
            cli = c.windows[win].image[:H, :W]
            if not _np.array_equal(cli, srv):
                raise AssertionError(
                    f"client pixels diverge from the server display plane: "
                    f"{int((cli != srv).any(-1).sum())} pixels"
                )

        # --- drag phase (each LeftDragging -> exactly one window refresh)
        c.mouse = (bx, by)
        c.send_event("LeftDown", win, bx, by)
        drag_lat = []
        x, y = bx, by
        for k in range(n_warm + n_drag):
            dx, dy = (5, 3) if (k // 40) % 2 == 0 else (-5, -3)
            x, y = x + dx, y + dy
            t0 = time.perf_counter()
            c.mouse = (x, y)
            c.send_event("LeftDragging", win, x, y)
            t1 = tc.await_refresh()
            tc.drain()
            if k >= n_warm:
                drag_lat.append(t1 - t0)
        c.send_event("LeftUp", win, x, y)
        if check_pixels:
            _assert_pixels()

        # --- wire floor: event -> tiny-window readback -> pixels, no
        # scene work (a 2x2 PaintRect).  The irreducible per-event cost
        # of this transport; drag latency - floor = actual frame work.
        floor_lat = []
        for _ in range(11):
            t0 = time.perf_counter()
            c.paint(win, 0, 0, 2, 2)
            t1 = tc.await_refresh()
            tc.drain()
            floor_lat.append(t1 - t0)

        # --- blur slider (lens-window reblend + lens-window ship each)
        blur_lat = []
        for v in blur_steps:
            t0 = time.perf_counter()
            c.send_event("BlurSlider", win, v)
            t1 = tc.await_refresh()
            tc.drain()
            blur_lat.append(t1 - t0)
        if check_pixels:
            _assert_pixels()

        c.send_event("AppClose")
        while c.running and c.handle_one():
            pass
    finally:
        if client_conn is not None:
            client_conn.close()
        if srv_t is not None:
            srv_t.join(timeout=120)
    if fail:
        raise fail[0]

    dmed, dp95 = _stats(drag_lat)
    bmed, bp95 = _stats(blur_lat)
    fmed, _ = _stats(floor_lat)
    result = {
        "metric": f"session_fast_{label}_drag_fps_at_client",
        "value": round(1.0 / dmed, 1),
        "unit": "fps",
        "vs_baseline": round((1.0 / dmed) / 60.0, 3),
        "extra": {
            "drag_latency_ms": {
                "median": round(dmed * 1e3, 2),
                "p95": round(dp95 * 1e3, 2),
            },
            "wire_floor_ms": round(fmed * 1e3, 2),
            "blur_slider_latency_ms": {
                "median": round(bmed * 1e3, 2),
                "p95": round(bp95 * 1e3, 2),
            },
            "first_paint_s": round(first_paint_s, 2),
            "drag_steps": n_drag,
            "resolution": f"{W}x{H}",
        },
    }
    print(json.dumps(result), flush=True)
    return result

if __name__ == "__main__":
    main()
