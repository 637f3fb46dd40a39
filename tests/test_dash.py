"""Dash-pattern splitting (PDF 8.4.3.6) — BEYOND REFERENCE: the reference
captures path_dash into its graphic tree (pdfgraphics.mli:93) but strokes
solid; here geometry/dash.py splits the path before stroking."""

import math

import numpy as np

from coherence_tpu.geometry import dash as gdash
from coherence_tpu.geometry import path as gpath
from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import mkpage
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, pdfscene, render as R


def _line(x0, y0, x1, y1, winding=None):
    w = winding or gpath.NONZERO
    return gpath.Path(
        w, (gpath.Subpath(False, False, (gpath.Straight((x0, y0), (x1, y1)),)),)
    )


def _intervals(p):
    """Sorted (start_x, end_x) spans of a dashed horizontal line."""
    out = []
    for sub in p.subpaths:
        xs = [sub.segments[0].a[0]] + [s.b[0] for s in sub.segments]
        out.append((min(xs), max(xs)))
    return sorted(out)


def _total_len(p):
    t = 0.0
    for sub in p.subpaths:
        for s in sub.segments:
            t += math.hypot(s.b[0] - s.a[0], s.b[1] - s.a[1])
    return t


def test_even_pattern_basic():
    d = gdash.dash_path(_line(0, 0, 100, 0), [10, 10])
    spans = _intervals(d)
    assert len(spans) == 5
    for i, (a, b) in enumerate(spans):
        assert abs(a - 20 * i) < 1e-9 and abs(b - (20 * i + 10)) < 1e-9


def test_phase_shifts_pattern():
    d = gdash.dash_path(_line(0, 0, 40, 0), [10, 10], phase=5)
    spans = _intervals(d)
    # phase 5: on for 5 (0..5), off (5..15), on (15..25), off, on (35..40)
    assert [(round(a), round(b)) for a, b in spans] == [(0, 5), (15, 25), (35, 40)]


def test_odd_pattern_second_pass_parity():
    # [3] = on 3 / off 3 (cycle 6).  phase=4 lands in the OFF half of the
    # first repetition: off until 2, on 2..5, off 5..8, on 8..10.
    d = gdash.dash_path(_line(0, 0, 10, 0), [3], phase=4)
    spans = _intervals(d)
    assert [(round(a), round(b)) for a, b in spans] == [(2, 5), (8, 10)]


def test_on_length_conserved():
    # Half of every [5,5] cycle is "on"; a 100-length line keeps 50.
    d = gdash.dash_path(_line(0, 0, 100, 0), [5, 5])
    assert abs(_total_len(d) - 50.0) < 1e-6


def test_degenerate_patterns_are_solid():
    p = _line(0, 0, 10, 0)
    assert gdash.dash_path(p, []) is p
    assert gdash.dash_path(p, [0.0, 0.0]) is p
    assert gdash.dash_path(p, [4.0, -1.0]) is p


def test_closed_subpath_dashes_explicit_closing_edge():
    # Closing edges are EXPLICIT segments in this codebase (`h` appends
    # one; the stroker never strokes an implicit closure) — dash follows
    # the same convention and walks only the listed segments.
    sq = gpath.Path(
        gpath.NONZERO,
        (
            gpath.Subpath(
                False,
                True,
                (
                    gpath.Straight((0, 0), (10, 0)),
                    gpath.Straight((10, 0), (10, 10)),
                    gpath.Straight((10, 10), (0, 10)),
                    gpath.Straight((0, 10), (0, 0)),
                ),
            ),
        ),
    )
    d = gdash.dash_path(sq, [4, 4])
    assert abs(_total_len(d) - 20.0) < 1e-6
    closing = [
        s
        for sub in d.subpaths
        for s in sub.segments
        if abs(s.a[0]) < 1e-9 and abs(s.b[0]) < 1e-9
    ]
    assert closing, "explicit closing edge received dashes"
    # Without the explicit 4th edge nothing walks it.
    open3 = gpath.Path(gpath.NONZERO, (gpath.Subpath(False, True, sq.subpaths[0].segments[:3]),))
    d3 = gdash.dash_path(open3, [4, 4])
    # 3 edges = 30 long: on [0,4)+[8,12)+[16,20)+[24,28) = 16.
    assert abs(_total_len(d3) - 16.0) < 1e-6


def test_fully_off_is_empty_path():
    d = gdash.dash_path(_line(0, 0, 10, 0), [0.0, 5.0])
    assert d.subpaths == ()


def test_curve_dash_length():
    # A full circle of radius r via 4 kappa quarters: dashed total ~= half
    # the circumference.
    from coherence_tpu.geometry import shapes as gshapes

    circ = gshapes.circle(50.0, 50.0, 20.0)
    per = 2 * math.pi * 20.0
    d = gdash.dash_path(circ, [per / 16, per / 16])
    assert abs(_total_len(d) - per / 2) / per < 0.01


def _page_dict(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def test_pdf_d_operator_captured_and_written():
    content = b"[4 2] 1 d 2 w 0 0 0 RG 10 50 m 90 50 l S"
    pdf = mkpage(content, mediabox=(0, 0, 100, 100))
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    paths = [e for e in g.elements if isinstance(e, PG.GPath)]
    assert len(paths) == 1
    arr, phase = paths[0].attributes.path_dash
    assert [round(v, 6) for v in arr] == [4, 2] and abs(phase - 1) < 1e-9
    # Writer round-trips the d operator.
    pdf2 = PG.page_of_graphic(g, mediabox=(0, 0, 100, 100))
    g2 = PG.graphic_of_page(pdf2, _page_dict(pdf2))
    paths2 = [e for e in g2.elements if isinstance(e, PG.GPath)]
    arr2, phase2 = paths2[0].attributes.path_dash
    assert [round(v, 6) for v in arr2] == [4, 2] and abs(phase2 - 1) < 1e-9


def test_dashed_stroke_renders_with_gaps():
    cache.clear()
    content = b"[10 10] 0 d 4 w 1 0 0 RG 10 50 m 90 50 l S"
    solid = b"4 w 1 0 0 RG 10 50 m 90 50 l S"
    covered = {}
    for name, body in (("dash", content), ("solid", solid)):
        pdf = mkpage(body, mediabox=(0, 0, 100, 100))
        g = PG.graphic_of_page(pdf, _page_dict(pdf))
        scene = pdfscene.scene_of_graphic(pdf, g)
        spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 100, 100)))
        assert spr is not None
        m = np.asarray(spr.mask)
        x0, y0, _, _ = spr.box
        row = m[50 - y0] if 50 - y0 < m.shape[0] else m[m.shape[0] // 2]
        covered[name] = (int(m.sum()), x0, row)
    assert covered["dash"][0] < covered["solid"][0] * 0.7
    # The first gap (user x in 20..30 -> device x likewise; y flip keeps x)
    x0 = covered["dash"][1]
    row = covered["dash"][2]

    def on(x):
        i = x - x0
        return bool(row[i]) if 0 <= i < len(row) else False

    assert on(15) and not on(25) and on(35), (on(15), on(25), on(35))
    cache.clear()
