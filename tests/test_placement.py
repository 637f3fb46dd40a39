"""Host-compute placement policy (utils/placement.py).

Over a tunneled accelerator the interactive engine pins default placement to
the in-process CPU backend; a host-attached deployment turns it off.  These
tests prove the property the policy depends on: the scalar renderer is
placement-NEUTRAL — a full interactive session (paint, pick, drag, blur
slider, rubberband zoom) run with every array pinned to a NON-default
virtual CPU device produces bit-identical framebuffer pixels, and no op in
the path silently escapes to the default device (escapes either raise a
mixed-committed-device error or show up in the cache-device sweep here).
"""

import jax
import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.gui import app as A
from coherence_tpu.gui import window as W
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.scene import cache
from coherence_tpu.scene import render as R
from coherence_tpu.utils import placement


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def _scene_devices():
    """Every device referenced by any raster in the coherence cache."""
    devs = set()
    for entry in cache._cache.values():
        if not isinstance(entry, cache.CacheObject):
            continue
        for pair in (entry.shape, entry.sprite):
            if pair is None:
                continue
            for item in pair:
                for attr in ("mask", "rgba"):
                    arr = getattr(item, attr, None)
                    if arr is not None and hasattr(arr, "devices"):
                        devs |= set(arr.devices())
    return devs


def _drive_session(device):
    """A full interactive engine session via the real event handlers.

    Returns (framebuffer copy, cache devices, policy-active flag)."""
    with placement.engine_host_compute(
        enabled=device is not None, device=device
    ) as active:
        eng = A.Engine()
        view = R.View(
            scene=[],
            pages=[],
            window=W.nullwindow,
            background=[A.background_obj()],
            selections=R.null_selection,
            master_update=region.shape_of_box((0, 0, 200, 200)),
            rubberband=None,
            tool=W.Select,
        )
        red = R.Obj(
            ident.new_ids(),
            R.Basic(
                rfills.plain(C.dissolve(C.red, delta=200)),
                R.PathShape(gshapes.circle(60.0, 60.0, 25.0)),
            ),
            (),
            R.OVER,
        )
        blue = R.Obj(
            ident.new_ids(),
            R.Basic(rfills.plain(C.blue), R.rectangle(90.0, 90.0, 60.0, 40.0)),
            (),
            R.OVER,
        )
        view.scene = [red, blue]
        eng.views.append(view)
        view.window = eng.wx.make_window("t", 200, 200, 0, 0, 0, 0)
        eng.event_handler((W.PAINT_RECT, view.window, 0, 0, 200, 200))
        # Pick + drag the translucent circle across the rectangle.
        eng.wx.display.mouse = (60, 60)
        eng.event_handler((W.LEFT_DOWN, view.window, 60, 60))
        for x, y in ((70, 65), (82, 72), (95, 80)):
            eng.wx.display.mouse = (x, y)
            eng.event_handler((W.LEFT_DRAGGING, view.window, x, y))
        eng.event_handler((W.LEFT_UP, view.window, 95, 80))
        # Blur slider over the selection (filter path), then back to 0.
        eng.event_handler((W.BLUR_SLIDER, view.window, 3))
        eng.event_handler((W.BLUR_SLIDER, view.window, 0))
        # Rubberband zoom in (full re-render of the transformed scene).
        eng.event_handler((W.BUTTON_CLICKED, view.window, 2))
        eng.wx.display.mouse = (40, 40)
        eng.event_handler((W.LEFT_DOWN, view.window, 40, 40))
        eng.wx.display.mouse = (150, 150)
        eng.event_handler((W.LEFT_DRAGGING, view.window, 150, 150))
        eng.event_handler((W.LEFT_UP, view.window, 150, 150))
        fb = eng.wx.framebuffers[view.window].copy()
        devs = _scene_devices()
    return fb, devs, active


def test_engine_session_placement_neutral():
    fb_default, _, active = _drive_session(None)
    assert not active  # default backend is cpu in tests: policy is a no-op
    cache.clear()
    dev1 = jax.devices("cpu")[1]
    fb_pinned, devs, active = _drive_session(dev1)
    assert active
    assert np.array_equal(fb_default, fb_pinned)
    # Every cached raster the session produced lives on the pinned device:
    # nothing escaped to the default device.
    assert devs, "session produced no cached rasters to witness placement"
    assert devs == {dev1}, devs


def test_policy_resolution():
    # Tests force the CPU backend, so auto policy is off...
    with placement.engine_host_compute() as on:
        assert not on
    # ...the flag gates it even when explicitly enabled is requested via
    # policy, and an explicit device always wins.
    dev1 = jax.devices("cpu")[1]
    with placement.engine_host_compute(device=dev1) as on:
        assert on
        assert placement.compute_platform() == "cpu"
        x = region.shape_of_box((0, 0, 3, 3)).mask
        assert set(x.devices()) == {dev1}


def test_aa_dtype_resolves_per_platform():
    from coherence_tpu.raster import aa

    # On the CPU backend the coverage GEMM runs f32; the bf16 fork is the
    # accelerator path (verified bit-exact on hardware by utils/tpu_smoke).
    assert aa.matmul_dtype("cpu") == np.float32
    assert aa.matmul_dtype("tpu") == jax.numpy.bfloat16
    assert aa.matmul_dtype() == np.float32
