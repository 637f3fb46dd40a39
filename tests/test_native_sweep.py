"""Differential tests: the native C++ host-geometry stage vs the NumPy
formulations it transcribes (geometry/path.py bezier subdivision,
raster/scanline._edge_spans, raster/tile_raster tile expansion+grouping).

The native implementations are required to be BIT-identical — same float64
rounding (compiled with -ffp-contract=off), same array orders — so every
comparison here is exact equality, not tolerance."""

import numpy as np
import pytest

from coherence_tpu import native_lib
from coherence_tpu.geometry import path as gpath
from coherence_tpu.geometry.path import EVEN_ODD, NONZERO
from coherence_tpu.raster import scanline, tile_raster
from coherence_tpu.raster.tile_raster import TileBuild

pytestmark = pytest.mark.skipif(
    not native_lib.available(), reason="native library unavailable"
)


def test_bezier_subdivide_native_bitwise():
    rng = np.random.default_rng(7)
    for trial in range(400):
        scale = 10.0 ** rng.integers(-2, 5)
        pts = rng.normal(0, scale, 8)
        if trial % 17 == 0:
            pts[0:2] = pts[6:8]  # degenerate: chord endpoints coincide
        if trial % 29 == 0:
            pts[2:4] = pts[0:2]  # control on endpoint
        p1, p2, p3, p4 = (
            (pts[0], pts[1]),
            (pts[2], pts[3]),
            (pts[4], pts[5]),
            (pts[6], pts[7]),
        )
        py = gpath.bezier_subdivide(gpath.f_accuracy, p1, p2, p3, p4)
        pyarr = np.array([(a[0], a[1], b[0], b[1]) for a, b in py])
        chords, counts = native_lib.bezier_subdivide_batch(
            np.array([[*p1, *p2, *p3, *p4]]), gpath.curve_accuracy
        )
        assert counts[0] == len(py)
        assert np.array_equal(pyarr, chords, equal_nan=True)


def test_bezier_batch_splicing():
    # Multiple beziers in one call: per-bezier counts slice the chord
    # stream back in order.
    rng = np.random.default_rng(1)
    ctrl = rng.normal(0, 50, (10, 8))
    chords, counts = native_lib.bezier_subdivide_batch(ctrl, gpath.curve_accuracy)
    assert int(counts.sum()) == chords.shape[0]
    off = 0
    for row, c in zip(ctrl, counts):
        py = gpath.bezier_subdivide(
            gpath.f_accuracy,
            (row[0], row[1]),
            (row[2], row[3]),
            (row[4], row[5]),
            (row[6], row[7]),
        )
        assert len(py) == c
        assert np.array_equal(
            np.array([(a[0], a[1], b[0], b[1]) for a, b in py]),
            chords[off : off + c],
        )
        off += c


def test_edgelist_of_path_native_equals_python(monkeypatch):
    from coherence_tpu.geometry import shapes as gshapes

    paths = [
        gshapes.circle(40.0, 30.0, 17.3),
        gshapes.circle(10.0, 10.0, 2.0),
        gpath.Path(
            NONZERO,
            (
                gpath.Subpath(
                    False,
                    True,
                    (
                        gpath.Straight((0.0, 0.0), (30.0, 5.0)),
                        gpath.Bezier((30.0, 5.0), (40.0, 20.0), (10.0, 35.0), (0.0, 30.0)),
                        gpath.Straight((0.0, 30.0), (0.0, 0.0)),
                    ),
                ),
            ),
        ),
    ]
    for p in paths:
        fast = gpath.edgelist_of_path(p)
        monkeypatch.setattr(native_lib, "_load", lambda: None)
        slow = gpath.edgelist_of_path(p)
        monkeypatch.undo()
        assert np.array_equal(fast, slow)


def _numpy_edge_spans(edges, winding, ext, rows_clip):
    old = scanline.use_native
    scanline.use_native = False
    try:
        return scanline._edge_spans(edges, winding, ext, rows_clip=rows_clip)
    finally:
        scanline.use_native = old


def test_edge_spans_native_bitwise():
    rng = np.random.default_rng(11)
    for trial in range(300):
        n = int(rng.integers(1, 40))
        edges = rng.integers(-3000, 3000, (n, 4)).astype(np.int64)
        if trial % 5 == 0:
            edges[:, 3] = edges[:, 1]  # horizontal edges
        winding = NONZERO if trial % 2 else EVEN_ODD
        ext = 16 if trial % 3 else 0
        clip = (
            None
            if trial % 4
            else (int(rng.integers(-50, 0)), int(rng.integers(0, 60)))
        )
        a = _numpy_edge_spans(edges, winding, ext, clip)
        b = scanline._edge_spans(edges, winding, ext, rows_clip=clip)
        assert (a is None) == (b is None)
        if a is None:
            continue
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_sweep_stage_native_bitwise(monkeypatch):
    """Whole staged output (capacity classes, tile ids, per-tile span
    arrays) equal between the fused native path and pure NumPy."""
    rng = np.random.default_rng(3)
    monkeypatch.setattr(tile_raster, "_SWEEP_CACHE_MAX_BYTES", 0)
    for trial in range(60):
        nty, ntx = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        n = int(rng.integers(3, 30))
        pts = rng.integers(-2000, 2000 + 64 * 32 * 5, (n, 2))
        edges = np.concatenate([pts, np.roll(pts, -1, axis=0)], axis=1).astype(
            np.int64
        )
        sw = NONZERO if trial % 2 else EVEN_ODD
        aw = EVEN_ODD if trial % 3 else NONZERO
        a = TileBuild(nty, ntx)._sweep_stage(edges, sw, aw)
        monkeypatch.setattr(scanline, "use_native", False)
        monkeypatch.setattr(native_lib, "_load", lambda: None)
        b = TileBuild(nty, ntx)._sweep_stage(edges, sw, aw)
        monkeypatch.undo()
        monkeypatch.setattr(tile_raster, "_SWEEP_CACHE_MAX_BYTES", 0)
        assert (a is False) == (b is False)
        if a is False:
            continue
        ea, ia = a
        eb, ib = b
        assert len(ea) == len(eb) and len(ia) == len(ib)
        for (ca, ta, *fa), (cb, tb, *fb) in zip(ea, eb):
            assert ca == cb and ta == tb
            for xa, xb in zip(fa, fb):
                for va, vb in zip(xa, xb):
                    assert np.array_equal(va, vb)
        for (ta, xa), (tb, xb) in zip(ia, ib):
            assert ta == tb
            for va, vb in zip(xa, xb):
                assert np.array_equal(va, vb)
