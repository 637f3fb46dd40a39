"""TPU-backed display server (gui/fastserver.py) over the real wire.

FastSession serves the fused animated path through the reference wire
protocol; the client-side pixels after a drag must equal the server's
display plane exactly (which tests/test_blit_blur.py pins to the general
renderer), and a drag must reship only a window, not the frame."""

import socket
import threading

import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu import ident, transform as tr
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.gui import client as cl
from coherence_tpu.gui import talk
from coherence_tpu.raster import fills as rfills
from coherence_tpu.scene import cache
from coherence_tpu.scene import render as R

W_, H_ = 320, 200


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def _scene():
    objs = [
        R.mkrectangle(20.0, 30.0, 180.0, 120.0,
                      rfills.plain(C.dissolve(C.teal, delta=200))),
        R.Obj(ident.new_ids(),
              R.Basic(rfills.plain(C.gold),
                      R.PathShape(gshapes.circle(220.0, 120.0, 45.0))),
              (), R.OVER),
    ]
    blob = R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.dissolve(C.crimson, delta=170)),
                R.PathShape(gshapes.circle(0.0, 0.0, 22.0))),
        (tr.Translate(80.0, 100.0),),
        R.OVER,
    )
    f_geom = R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.white), R.rectangle(120.0, 60.0, 120.0, 80.0)),
        (), R.OVER,
    )
    return objs, blob, f_geom


def _run_pair():
    """(client, session, threads): a connected FastSession + HeadlessClient."""
    from coherence_tpu.gui.fastserver import FastSession

    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    state = {}

    def client_thread():
        conn = talk.connect(port)
        c = cl.HeadlessClient(conn)
        c.refresh_count = 0
        c._on_refresh = lambda w: setattr(c, "refresh_count", c.refresh_count + 1)
        state["client"] = c
        c.app_start()
        while c.running:
            if not c.handle_one():
                break
        conn.close()

    ct = threading.Thread(target=client_thread, daemon=True)
    ct.start()
    sock, _ = server.accept()
    server.close()
    objs, blob, f_geom = _scene()
    sess_holder = {}
    fail = []

    def server_thread():
        try:
            sess = FastSession(
                talk.Connection(sock), W_, H_, objs, blob, f_geom, blur_radius=3
            )
            sess_holder["sess"] = sess
            ready.set()
            sess.run()
        except BaseException as e:  # surfaces in the main thread
            fail.append(e)
            ready.set()

    ready = threading.Event()
    st = threading.Thread(target=server_thread, daemon=True)
    st.start()
    ready.wait(timeout=300)
    if fail:
        raise fail[0]
    return state, sess_holder["sess"], ct, st, fail


def _client_win(state, sess):
    # the client indexes windows by the same ids the server minted
    return state["client"].windows[sess.win]


def _server_truth(sess):
    return np.asarray(sess.disp.rgba)[..., :3].astype(np.uint8)


def _sync(state, sess, timeout=600.0):
    """Barrier: poison the client's top-left 2x2 (background — only a
    trailing PaintRect repaints it), send that paint, and wait for the
    poison to clear.  The server handles events in order, so the paint's
    RefreshWindow landing means every queued edit landed too (first drags
    JIT-compile the fused kernel — allow minutes on CPU)."""
    import time

    win = _client_win(state, sess)
    win.image[0:2, 0:2] = 7  # never a scene colour here (white bg)
    state["client"].paint(sess.win, 0, 0, 2, 2)
    deadline = time.time() + timeout
    while (win.image[0:2, 0:2] == 7).any():
        if time.time() > deadline:
            raise AssertionError("sync barrier timed out")
        time.sleep(0.02)


def test_session_drag_ships_exact_windows():
    state, sess, ct, st, fail = _run_pair()
    c = state["client"]
    _sync(state, sess)
    img0 = _client_win(state, sess).image.copy()
    np.testing.assert_array_equal(
        img0[:H_, :W_], _server_truth(sess)
    )

    # Drag the blob: LeftDown on it, three dragging steps, LeftUp.
    bx0, by0, bx1, by1 = sess.view.sprites[sess.blob_key].box
    cx, cy = (bx0 + bx1) // 2, (by0 + by1) // 2
    c.send_event("LeftDown", sess.win, cx, cy)
    for step, (dx, dy) in enumerate([(9, 4), (-5, 7), (12, -6)], 1):
        cx, cy = cx + dx, cy + dy
        c.send_event("LeftDragging", sess.win, cx, cy)
    c.send_event("LeftUp", sess.win, cx, cy)
    _sync(state, sess)
    img = _client_win(state, sess).image
    np.testing.assert_array_equal(img[:H_, :W_], _server_truth(sess))
    assert not np.array_equal(img0, img)  # the blob visibly moved

    # Blur slider: full reship, still exact.
    c.send_event("BlurSlider", sess.win, 5)
    _sync(state, sess)
    np.testing.assert_array_equal(
        _client_win(state, sess).image[:H_, :W_], _server_truth(sess)
    )

    c.send_event("AppClose")
    st.join(timeout=60)
    assert not fail
    ct.join(timeout=60)


def test_drag_reships_window_not_frame():
    state, sess, ct, st, fail = _run_pair()
    c = state["client"]
    _sync(state, sess)
    refreshes = []
    win = _client_win(state, sess)
    orig = win.image.copy()

    bx0, by0, bx1, by1 = sess.view.sprites[sess.blob_key].box
    cx, cy = (bx0 + bx1) // 2, (by0 + by1) // 2
    c.send_event("LeftDown", sess.win, cx, cy)
    c.send_event("LeftDragging", sess.win, cx + 6, cy + 3)
    c.send_event("LeftUp", sess.win, cx + 6, cy + 3)
    _sync(state, sess)
    diff = np.argwhere((win.image != orig).any(-1))
    assert len(diff) > 0
    ys, xs = diff[:, 0], diff[:, 1]
    # Changed pixels confined to the blob's bloated union window, far
    # smaller than the frame.
    r = sess.disp.kernel.radius
    assert ys.max() - ys.min() <= (by1 - by0 + 1) + 3 + 4 * r + 64
    assert xs.max() - xs.min() <= (bx1 - bx0 + 1) + 6 + 4 * r + 64

    c.send_event("AppClose")
    st.join(timeout=60)
    assert not fail
    ct.join(timeout=60)
