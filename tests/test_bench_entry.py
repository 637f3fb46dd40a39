"""Import-and-surface smoke for the driver's round-end entry points.

The driver runs ``bench.py`` (and we run ``benchmarks/*``) on the real TPU
only at the end of a round; nothing else in CI imports them.  A refactor in
the package that renames a hook these scripts reach for (several are
deliberately private — the microbench slope-times individual sub-kernels)
would otherwise surface only on hardware, after the round is over.  This
test imports every bench entry module and asserts the exact surface they
consume still exists.  It executes no device code (conftest forces the CPU
backend and module import only configures the compilation cache).
"""

import importlib.util
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(modname, path):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench_mod():
    return _load("bench_smoke", os.path.join(ROOT, "bench.py"))


def test_bench_surface(bench_mod):
    # The driver calls main(); build() is the shared scene constructor the
    # microbenches reuse.
    assert callable(bench_mod.main)
    assert callable(bench_mod.build)


def test_benchmark_scripts_import():
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        for name in ("run", "session", "micro_runs", "micro_animated"):
            mod = _load(
                f"benchmarks_smoke_{name}",
                os.path.join(ROOT, "benchmarks", f"{name}.py"),
            )
            assert callable(mod.main)
        sess = _load("benchmarks_smoke_sess2",
                     os.path.join(ROOT, "benchmarks", "session.py"))
        assert callable(sess.run_session)
        assert callable(sess.run_fast_session)
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))


def _tiny_scene(W, H):
    """3-object scene for the CI session smoke: rect + circle + the
    draggable blob + blur lens geometry (mirrors benchmarks/session.py's
    fast_scene shape contract)."""
    import coherence_tpu.colour as C
    import coherence_tpu.transform as tr
    from coherence_tpu import ident
    from coherence_tpu.geometry import shapes as gshapes
    from coherence_tpu.raster import fills as rfills
    from coherence_tpu.scene import render as R

    objs = [
        R.mkrectangle(10.0, 12.0, 90.0, 70.0,
                      rfills.plain(C.dissolve(C.teal, delta=200))),
        R.Obj(ident.new_ids(),
              R.Basic(rfills.plain(C.gold),
                      R.PathShape(gshapes.circle(120.0, 70.0, 25.0))),
              (), R.OVER),
    ]
    bx, by, br = 50, 55, 14
    blob = R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.dissolve(C.crimson, delta=170)),
                R.PathShape(gshapes.circle(0.0, 0.0, float(br)))),
        (tr.Translate(float(bx), float(by)),),
        R.OVER,
    )
    f_geom = R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.white), R.rectangle(70.0, 30.0, 70.0, 50.0)),
        (), R.OVER,
    )
    return objs, blob, f_geom, (bx, by, br)


def test_session_bench_behavior_fast():
    """A REAL tiny FastSession run through benchmarks/session.py's own
    measurement path: engine + client threads over a localhost socket,
    client-pixel equality asserted, metrics nonzero.  A session.py that
    computes wrong/empty metrics fails here instead of burning a hardware
    round (VERDICT r4 item 6)."""
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        sess = _load("benchmarks_behavior_sess",
                     os.path.join(ROOT, "benchmarks", "session.py"))
        W, H = 192, 120
        res = sess.run_fast_session(
            W, H, "ci", n_drag=3, n_warm=1, blur_steps=[2, 3],
            scene=_tiny_scene(W, H), check_pixels=True,
        )
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))
    assert res["metric"] == "session_fast_ci_drag_fps_at_client"
    assert res["value"] > 0
    ex = res["extra"]
    assert ex["drag_latency_ms"]["median"] > 0
    assert ex["drag_latency_ms"]["p95"] >= ex["drag_latency_ms"]["median"]
    assert ex["blur_slider_latency_ms"]["median"] > 0
    assert ex["resolution"] == f"{W}x{H}"


def test_session_bench_behavior_engine():
    """Engine-mode session (gui/app.py event loop + picking + undo in the
    path) at tiny scale: metrics present and nonzero, all three phases
    (drag, blur slider, rubberband zoom) complete over the socket."""
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        sess = _load("benchmarks_behavior_sess_eng",
                     os.path.join(ROOT, "benchmarks", "session.py"))
        W, H = 192, 120
        objs, blob, f_geom, (bx, by, br) = _tiny_scene(W, H)
        res = sess.run_session(
            W, H, "ci", n_drag=3, n_warm=1, blur_steps=[2, 3],
            scene=([blob] + objs, (bx, by, br)),
        )
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))
    assert res["metric"] == "session_ci_drag_fps_at_client"
    assert res["value"] > 0
    ex = res["extra"]
    assert ex["drag_latency_ms"]["median"] > 0
    assert ex["blur_slider_latency_ms"]["median"] > 0
    assert ex["zoom_in_s"] > 0 and ex["zoom_out_s"] > 0


def test_private_hooks_the_benches_reach_for():
    """benchmarks/micro_animated.py and bench.py stage frames through these
    exact names; keep them pinned so a rename fails here, not on the TPU."""
    from coherence_tpu.raster import framepath, tiled_scene
    from coherence_tpu.scene import fastframe as ff

    assert callable(framepath.blur_window)
    assert callable(tiled_scene._render_dirty_tiles)
    assert callable(tiled_scene._shatter_into_kernel)
    # Fused-step kernels are jitted wrappers: the microbench calls
    # .__wrapped__ on the sub-kernels to scan them un-jitted.
    assert hasattr(tiled_scene._render_dirty_tiles, "__wrapped__")
    assert hasattr(tiled_scene._shatter_into_kernel, "__wrapped__")
    assert callable(ff.translate_sprite)
    assert callable(ff._tiled_interpret)
    assert callable(ff._animated_blur_frame_kernel)
    assert hasattr(ff._blur_blend_window_kernel, "__wrapped__")
    assert callable(tiled_scene.TiledScene._inplace_args)
    assert callable(tiled_scene.TiledScene._dirty_args)
    assert callable(ff.FilteredDisplay._window_tiles)
    # The smoke gate bench.py wires into the driver JSON.
    from coherence_tpu.utils import tpu_smoke

    assert callable(tpu_smoke.run)
