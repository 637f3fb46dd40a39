"""GUI wire protocol, transport, window system and engine interaction tests."""

import socket
import threading

import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.gui import app as A
from coherence_tpu.gui import talk, wire
from coherence_tpu.gui import window as W
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, render as R


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


# --- wire format -------------------------------------------------------------


def test_wire_roundtrip():
    vals = [
        None,
        True,
        False,
        42,
        -7,
        b"hello",
        ["Startup", b"\x00\x01\xff", 3, [1, None, False]],
        [],
    ]
    for v in vals:
        framed = wire.marshall(v)
        n, out = wire.unmarshall(framed)
        assert n == len(framed)

        def norm(x):
            if isinstance(x, str):
                return x.encode("latin1")
            if isinstance(x, list):
                return [norm(y) for y in x]
            return x

        assert out == norm(v)


def test_wire_incremental():
    frames = wire.marshall([1, 2]) + wire.marshall(b"xy")
    # Partial prefix -> None.
    assert wire.unmarshall(frames[:3]) is None
    n, v1 = wire.unmarshall(frames)
    assert v1 == [1, 2]
    n2, v2 = wire.unmarshall(frames[n:])
    assert v2 == b"xy"


def test_wire_format_bytes_exact():
    # Int frame: length 5, tag 2, big-endian payload.
    assert wire.marshall(258) == b"\x00\x00\x00\x05\x02\x00\x00\x01\x02"
    # Unit: length 1, tag 1.
    assert wire.marshall(None) == b"\x00\x00\x00\x01\x01"
    # Bool true: tag 4, 1.
    assert wire.marshall(True) == b"\x00\x00\x00\x02\x04\x01"
    # String "ab": tag 3 + len + data.
    assert wire.marshall(b"ab") == b"\x00\x00\x00\x07\x03\x00\x00\x00\x02ab"


# --- transport ----------------------------------------------------------------


def test_talk_roundtrip_over_socket():
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    results = {}

    def client():
        conn = talk.connect(port)
        conn.send(["AppStart"])
        results["got"] = conn.poll()
        conn.close()

    t = threading.Thread(target=client)
    t.start()
    sock, _ = server.accept()
    conn = talk.Connection(sock)
    assert conn.poll() == [b"AppStart"]
    conn.send(["MakeWindow", 7])
    t.join()
    assert results["got"] == [b"MakeWindow", 7]
    conn.close()
    server.close()


# --- window system --------------------------------------------------------------


def test_plot_sprite_and_refresh():
    ws = W.WindowSystem()
    w = ws.make_window("t", 100, 100, 0, 0, 0, 0)
    spr = region.fillshape(region.shape_of_box((10, 10, 19, 19)), rfills.plain(C.red))
    ws.plot_sprite(w, 0, 0, spr)
    fb = ws.framebuffers[w]
    assert tuple(fb[10, 10]) == (255, 0, 0)
    assert tuple(fb[9, 9]) == (0, 0, 0)
    ws.refresh_window(w, (10, 10, 19, 19))
    assert ws.display.refreshed[-1] == (w, (10, 10, 10, 10))


# --- engine interaction ------------------------------------------------------


def make_engine_with_scene():
    eng = A.Engine()
    view = R.View(
        scene=[],
        pages=[],
        window=W.nullwindow,
        background=[A.background_obj()],
        selections=R.null_selection,
        master_update=region.shape_of_box((0, 0, 300, 300)),
        rubberband=None,
        tool=W.Select,
    )
    red = R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.red), R.PathShape(gshapes.circle(80.0, 80.0, 30.0))),
        (),
        R.OVER,
    )
    blue = R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.blue), R.rectangle(150.0, 150.0, 60.0, 40.0)),
        (),
        R.OVER,
    )
    view.scene = [red, blue]
    eng.views.append(view)
    view.window = eng.wx.make_window("test", 300, 300, 0, 0, 0, 0)
    return eng, view, red, blue


def test_engine_paint_and_pick_select():
    eng, view, red, blue = make_engine_with_scene()
    eng.event_handler((W.PAINT_RECT, view.window, 0, 0, 300, 300))
    fb = eng.wx.framebuffers[view.window]
    assert tuple(fb[80, 80]) == (255, 0, 0)
    assert tuple(fb[170, 160]) == (0, 0, 255)
    # Click the red circle: it becomes the selection.
    eng.wx.display.mouse = (80, 80)
    eng.event_handler((W.LEFT_DOWN, view.window, 80, 80))
    assert R.is_selected(view.selections, red)
    eng.event_handler((W.LEFT_UP, view.window, 80, 80))
    assert eng.state.dragging == A.DragNone


def test_engine_drag_moves_object():
    eng, view, red, blue = make_engine_with_scene()
    eng.event_handler((W.PAINT_RECT, view.window, 0, 0, 300, 300))
    eng.wx.display.mouse = (80, 80)
    eng.event_handler((W.LEFT_DOWN, view.window, 80, 80))
    eng.wx.display.mouse = (100, 90)
    eng.event_handler((W.LEFT_DRAGGING, view.window, 100, 90))
    eng.wx.display.mouse = (100, 90)
    eng.event_handler((W.LEFT_UP, view.window, 100, 90))
    moved = view.scene[0]
    xmin, xmax, ymin, ymax = R.bounds_of_basicshape(moved)
    # The circle (was centred at 80,80 radius 30) moved by (20, 10).
    assert abs((xmin + xmax) / 2 - 100) <= 2
    assert abs((ymin + ymax) / 2 - 90) <= 2
    # Framebuffer updated: new centre red, old left edge no longer red.
    fb = eng.wx.framebuffers[view.window]
    assert tuple(fb[90, 100]) == (255, 0, 0)


def test_engine_rubberband_selects_multiple():
    eng, view, red, blue = make_engine_with_scene()
    eng.event_handler((W.PAINT_RECT, view.window, 0, 0, 300, 300))
    eng.wx.display.mouse = (20, 20)
    eng.event_handler((W.LEFT_DOWN, view.window, 20, 20))
    assert eng.state.dragging[0] == "rubberband"
    eng.wx.display.mouse = (250, 250)
    eng.event_handler((W.LEFT_DRAGGING, view.window, 250, 250))
    eng.wx.display.mouse = (250, 250)
    eng.event_handler((W.LEFT_UP, view.window, 250, 250))
    assert R.is_selected(view.selections, red)
    assert R.is_selected(view.selections, blue)


def test_engine_zoom_doubles():
    eng, view, red, blue = make_engine_with_scene()
    eng.event_handler((W.PAINT_RECT, view.window, 0, 0, 300, 300))
    eng.event_handler((W.BUTTON_CLICKED, view.window, 2))  # zoom tool
    assert view.tool == W.Zoom
    eng.wx.display.mouse = (150, 150)
    eng.event_handler((W.LEFT_DOWN, view.window, 150, 150))
    eng.wx.display.mouse = (150, 150)
    eng.event_handler((W.LEFT_UP, view.window, 150, 150))
    xmin, xmax, ymin, ymax = R.bounds_of_basicshape(view.scene[0])
    # The red circle's diameter doubled (60 -> ~120).
    assert 110 <= xmax - xmin <= 130


def test_engine_undo_restores_scene():
    eng, view, red, blue = make_engine_with_scene()
    eng.event_handler((W.PAINT_RECT, view.window, 0, 0, 300, 300))
    before = list(view.scene)
    eng.wx.display.mouse = (80, 80)
    eng.event_handler((W.LEFT_DOWN, view.window, 80, 80))
    eng.wx.display.mouse = (120, 120)
    eng.event_handler((W.LEFT_DRAGGING, view.window, 120, 120))
    eng.event_handler((W.LEFT_UP, view.window, 120, 120))
    assert view.scene != before
    eng.wx.command_down = True
    eng.event_handler((W.KEY_UP, view.window, "Z"))
    assert [o.idset for o in view.scene] == [o.idset for o in before]


def test_engine_nudge_and_escape():
    eng, view, red, blue = make_engine_with_scene()
    eng.event_handler((W.PAINT_RECT, view.window, 0, 0, 300, 300))
    eng.wx.display.mouse = (80, 80)
    eng.event_handler((W.LEFT_DOWN, view.window, 80, 80))
    eng.event_handler((W.LEFT_UP, view.window, 80, 80))
    b0 = R.bounds_of_basicshape(view.scene[0])
    eng.event_handler((W.KEY_DOWN, view.window, W.Right))
    b1 = R.bounds_of_basicshape(view.scene[0])
    assert b1[0] == b0[0] + 1
    # Escape with no drag deselects.
    eng.event_handler((W.KEY_DOWN, view.window, W.Escape))
    assert view.selections == R.null_selection


def test_engine_to_top_bottom():
    eng, view, red, blue = make_engine_with_scene()
    eng.event_handler((W.PAINT_RECT, view.window, 0, 0, 300, 300))
    eng.wx.display.mouse = (80, 80)
    eng.event_handler((W.LEFT_DOWN, view.window, 80, 80))
    eng.event_handler((W.LEFT_UP, view.window, 80, 80))
    eng.event_handler((W.BUTTON_CLICKED, view.window, 4))  # to bottom
    assert view.scene[-1].idset == red.idset
    eng.event_handler((W.BUTTON_CLICKED, view.window, 3))  # to top
    assert view.scene[0].idset == red.idset


def test_engine_blur_slider():
    eng, view, red, blue = make_engine_with_scene()
    eng.event_handler((W.PAINT_RECT, view.window, 0, 0, 300, 300))
    eng.wx.display.mouse = (80, 80)
    eng.event_handler((W.LEFT_DOWN, view.window, 80, 80))
    eng.event_handler((W.LEFT_UP, view.window, 80, 80))
    eng.event_handler((W.BLUR_SLIDER, view.window, 2))
    sel = [o for o in view.scene if R.is_selected(view.selections, o)]
    assert len(sel) == 1 and isinstance(sel[0].geometry, R.Convolved)
    eng.event_handler((W.BLUR_SLIDER, view.window, 0))
    sel = [o for o in view.scene if R.is_selected(view.selections, o)]
    assert not isinstance(sel[0].geometry, R.Convolved)


def test_engine_trans_slider():
    eng, view, red, blue = make_engine_with_scene()
    eng.event_handler((W.PAINT_RECT, view.window, 0, 0, 300, 300))
    eng.wx.display.mouse = (170, 160)
    eng.event_handler((W.LEFT_DOWN, view.window, 170, 160))
    eng.event_handler((W.LEFT_UP, view.window, 170, 160))
    eng.event_handler((W.TRANS_SLIDER, view.window, 128))
    sel = [o for o in view.scene if R.is_selected(view.selections, o)]
    assert isinstance(sel[0].compop, R.PreTrans)
    fb = eng.wx.framebuffers[view.window]
    # Translucent blue over light grey background is no longer pure blue.
    assert tuple(fb[170, 160]) != (0, 0, 255)


def test_frag_debug_window_mirrors_fragments():
    eng = A.Engine(frag_debug=True)
    eng.frag_window = eng.wx.make_window("Sprite Debug window", 600, 740, 0, 0, 0, 0)
    view = R.View(
        scene=[
            R.Obj(
                ident.new_ids(),
                R.Basic(rfills.plain(C.red), R.rectangle(20.0, 20.0, 30.0, 30.0)),
                (),
                R.OVER,
            )
        ],
        pages=[],
        background=[A.background_obj()],
        master_update=region.shape_of_box((0, 0, 200, 200)),
    )
    eng.views.append(view)
    view.window = eng.wx.make_window("main", 200, 200, 0, 0, 0, 0)
    eng.force_update(True, ident.new_ids(), view, region.shape_of_box((0, 0, 200, 200)))
    fb = eng.wx.framebuffers[eng.frag_window]
    # The debug window received the same fragment pixels.
    assert tuple(fb[30, 30]) == (255, 0, 0)
    assert eng.old_debug_coords is not None


def test_opendemos_filter_borders():
    """The Minimal Rendering demo frames each of the three filter objects
    with a 1-px dissolved-black stroked border (engine.ml:1315-1332,
    1361-1368): border objects precede their filter object, share its
    transform, and render visible stroke pixels."""
    eng = A.Engine()
    eng.opendemos()
    view = eng.views[0]
    scene = view.scene
    for i in (0, 2, 4):
        border, obj = scene[i], scene[i + 1]
        assert isinstance(border.geometry, R.Basic)
        assert isinstance(border.geometry.shape, R.StrokedPathShape)
        spec = border.geometry.shape.spec
        assert spec.linewidth == 1.0 and spec.join == gshapes.MitredJoin
        assert border.transform == obj.transform
        inner = obj.geometry.filter.geometry
        assert border.geometry.shape.path is inner.shape.path
    # The first border strokes the wireframe filter's circle: rendering it
    # alone must paint ring pixels.
    border = scene[0]
    box = R.bounds_of_basicshape(border)
    spr = R.render_simple_scene([border], region.shape_of_box(box))
    canvas = region.flatten_sprite(0, spr, C.clear)
    arr = np.asarray(canvas.rgba)
    assert (arr[..., 3] > 0).any()
