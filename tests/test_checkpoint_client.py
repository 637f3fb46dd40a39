"""Scene checkpoint round-trips and the full socket display client loop."""

import threading

import numpy as np
import pytest

import coherence_tpu.colour as C
import coherence_tpu.transform as tr
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.gui import client as cl
from coherence_tpu.gui import talk
from coherence_tpu.gui.app import Engine, background_obj
from coherence_tpu.gui.window import RemoteDisplay
from coherence_tpu.raster import convolve as rconvolve
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, checkpoint as CK, examples as E, filters as F, render as R


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def _render96(scene):
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 96, 96)))
    out = np.zeros((96, 96, 4), np.int32)
    if spr is None:
        return out
    w, h = spr.wh
    m = np.asarray(spr.mask)[:h, :w]
    r = np.asarray(spr.rgba)[:h, :w]
    ox, oy = spr.box[0] - 1, spr.box[1] - 1
    sub = out[oy : oy + h, ox : ox + w]
    sub[m] = r[m]
    return out


def test_scene_checkpoint_roundtrip_renders_identically():
    scene = [
        R.Obj(
            ident.new_ids(),
            R.Basic(
                rfills.gradient((10.0, 10.0), (80.0, 80.0), True, True, C.red, C.blue),
                R.PathShape(gshapes.circle(40.0, 40.0, 25.0)),
            ),
            (tr.Translate(5.0, 0.0),),
            R.PreTrans(0.8, R.OVER),
        ),
        R.Obj(
            ident.new_ids(),
            F.blur(
                R.Basic(rfills.plain(C.white), R.rectangle(20, 20, 30, 30)),
                rconvolve.mkgaussian(2),
            ),
            (),
            R.OVER,
        ),
        R.Obj(
            ident.new_ids(),
            R.Basic(
                rfills.plain(C.green),
                R.CPG(
                    R.EXCLUSIVE_OR,
                    R.PathShape(gshapes.circle(40.0, 60.0, 15.0)),
                    R.PathShape(gshapes.circle(55.0, 60.0, 15.0)),
                ),
            ),
            (),
            R.OVER,
        ),
    ]
    js = CK.scene_to_json(scene)
    scene2 = CK.scene_from_json(js)
    a = _render96(scene)
    cache.clear()
    b = _render96(scene2)
    assert np.array_equal(a, b)


def test_view_checkpoint_roundtrip(tmp_path):
    view = R.View(
        scene=[
            R.Obj(
                ident.new_ids(),
                R.Basic(rfills.plain(C.purple), R.rectangle(10, 10, 30, 30)),
                (),
                R.OVER,
            )
        ],
        pages=[],
        background=[background_obj()],
        master_update=region.shape_of_box((0, 0, 100, 100)),
    )
    p = str(tmp_path / "view.json")
    CK.save_view(p, view)
    v2 = CK.load_view(p)
    assert len(v2.scene) == 1 and len(v2.background) == 1
    assert v2.master_update.box == (0, 0, 100, 100)


def test_brush_and_filter_recipe_roundtrip():
    pth = gshapes.circle(30.0, 30.0, 10.0)
    scene = [
        R.Obj(ident.new_ids(), F.monochrome(R.Basic(rfills.plain(C.white), R.rectangle(20, 20, 20, 20))), (), R.OVER),
        R.Obj(
            ident.new_ids(),
            R.Basic(
                rfills.plain(C.gold),
                R.BrushStroke(((0.6, ("gaussian", 5.0)), pth)),
            ),
            (),
            R.OVER,
        ),
    ]
    scene2 = CK.scene_from_json(CK.scene_to_json(scene))
    assert isinstance(scene2[0].geometry, R.FilterG)
    assert isinstance(scene2[1].geometry.shape, R.BrushStroke)
    a = _render96(scene)
    cache.clear()
    b = _render96(scene2)
    assert np.array_equal(a, b)


def test_remote_display_end_to_end():
    """Engine with RemoteDisplay <-> HeadlessClient over a real socket: the
    full reference architecture (two endpoints, wire protocol, synchronous
    RPC, pixel traffic)."""
    import socket

    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    client_state = {}

    def client_thread():
        conn = talk.connect(port)
        c = cl.HeadlessClient(conn)
        client_state["client"] = c
        c.app_start()
        # Serve until the engine closes the app.
        while c.running:
            if not c.handle_one():
                break
        conn.close()

    t = threading.Thread(target=client_thread)
    t.start()
    sock, _ = server.accept()
    server.close()
    conn = talk.Connection(sock)
    eng = Engine(display=RemoteDisplay(conn))
    # Build a window + scene through the protocol.
    view = R.View(
        scene=[
            R.Obj(
                ident.new_ids(),
                R.Basic(rfills.plain(C.red), R.rectangle(20.0, 20.0, 40.0, 40.0)),
                (),
                R.OVER,
            )
        ],
        pages=[],
        background=[background_obj()],
        master_update=region.shape_of_box((0, 0, 200, 200)),
    )
    eng.views.append(view)
    # First event from the client is AppStart.
    e = eng.wx.poll()
    assert e[0] == "AppStartup" or e[0] == "Internal"
    view.window = eng.wx.make_window("remote", 200, 200, 0, 0, 0, 0)
    eng.render_rect(view.window, 0, 0, 200, 200)
    # Pump any remaining client work, then close the app.
    eng.wx.close_application()
    t.join(timeout=30)
    assert not t.is_alive()
    c = client_state["client"]
    win = c.windows[view.window]
    assert tuple(win.image[40, 40]) == (255, 0, 0)
    # Background (light grey) around the rect.
    assert tuple(win.image[5, 5]) == tuple(C.rgba_of_colour(C.lightgrey)[:3])
    # PNG dump of the client-side window decodes to the same pixels.
    import tempfile

    from coherence_tpu.utils.png import read_png

    with tempfile.NamedTemporaryFile(suffix=".png") as f:
        c.save_png(view.window, f.name)
        back = read_png(f.name)
    assert np.array_equal(back, win.image)


def test_tkclient_helpers():
    """TkClient's pure helpers (no display needed): PPM encoding accepted
    by tk.PhotoImage's format, wx keycode mapping parity."""
    import numpy as np

    from coherence_tpu.gui import tkclient, window as W

    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 0] = (255, 0, 0)
    data = tkclient.ppm_bytes(img)
    assert data.startswith(b"P6\n3 2\n255\n") and len(data) == 11 + 18

    for sym, code in [("Escape", 27), ("Left", 314), ("a", 65), ("Z", 90)]:
        got = tkclient._keycode_of_keysym(sym)
        assert got == code
        # The engine decodes it back to the same key name family.
        assert W.key_of_keycode(got) in (sym.capitalize() if len(sym) > 1 else sym.upper(), sym.upper(), "Escape", "Left")
    assert tkclient._keycode_of_keysym("F13") is None


def test_tkclient_headless_display_optional():
    """Constructing TkClient needs a display; headless CI skips."""
    import pytest

    tk = pytest.importorskip("tkinter")
    try:
        root = tk.Tk()
    except Exception:
        pytest.skip("no display")
    root.destroy()
