"""Page /Rotate (PDF 7.7.3.3) display orientation — BEYOND REFERENCE:
engine.ml:1200-1229 ignores the attribute; here openfile rotates content
into display orientation and swaps the page box for 90/270."""

import numpy as np
import pytest

from coherence_tpu.gui import app as A, window as W
from coherence_tpu.io.pdf import mkpage, pdf_to_file
from coherence_tpu.scene import cache


def _mk(tmp_path, rotate):
    # Landscape 200x100 page; red square near the origin corner (10..40),
    # green square at the far-x end (160..190 x 10..40).
    pdf = mkpage(
        b"1 0 0 rg 10 10 30 30 re f 0 1 0 rg 160 10 30 30 re f",
        mediabox=(0, 0, 200, 100),
    )
    if rotate:
        pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
        pdf.resolve(pages["Kids"][0])["Rotate"] = rotate
    p = tmp_path / f"rot{rotate}.pdf"
    pdf_to_file(pdf, str(p))
    return str(p)


def _open(path):
    cache.clear()
    eng = A.Engine()
    eng.openfile(path)
    return eng.views[0]


def _page_dims(view):
    """(w, h) of the white page rectangle among view.pages."""
    import coherence_tpu.colour as C
    from coherence_tpu.scene import render as R

    for o in view.pages:
        g = o.geometry
        if isinstance(g, R.Primitive) and g.colour == C.white:
            x0, x1, y0, y1 = R.proper_bounds(o)  # (x0, x1, y0, y1)!
            return (round(x1 - x0), round(y1 - y0))
    raise AssertionError("no white page object")


def _centres(view):
    """(x, y) centroids of the red and green objects in view coords."""
    out = {}
    for o in view.scene:
        from coherence_tpu.scene import render as R

        x0, x1, y0, y1 = R.proper_bounds(o)  # (x0, x1, y0, y1)!
        fill = o.geometry.fill
        col = getattr(fill, "colour", None)
        import coherence_tpu.colour as C

        if col is not None:
            r, g, b, a = C.rgba_of_colour(col)
            key = "red" if r > g else "green"
            out[key] = ((x0 + x1) / 2.0, (y0 + y1) / 2.0)
    return out


def test_rotate_0_baseline(tmp_path):
    v = _open(_mk(tmp_path, 0))
    c = _centres(v)
    # y-flip about the page: user y 10..40 -> view y near the page BOTTOM
    # (high y).  Page box spans view x 100..300, y 100..200.
    assert abs(c["red"][0] - 125) < 2 and abs(c["red"][1] - 175) < 2, c
    assert abs(c["green"][0] - 275) < 2 and abs(c["green"][1] - 175) < 2, c
    assert _page_dims(v) == (200, 100)


def test_rotate_90_swaps_box_and_turns_content(tmp_path):
    v = _open(_mk(tmp_path, 90))
    c = _centres(v)
    # 90 cw: the user-origin corner shows top-left; red (near origin, low
    # user y) lands near display (y=25, x_disp = 200-25=175) -> view
    # (100+25, 100+(200-175)) = (125, 125).  Green (x~175) -> display
    # y'=175 high -> view y near the bottom.
    assert _page_dims(v) == (100, 200)
    assert abs(c["red"][0] - 125) < 2 and abs(c["red"][1] - 125) < 2, c
    assert abs(c["green"][0] - 125) < 2 and abs(c["green"][1] - 275) < 2, c


def test_rotate_180(tmp_path):
    v = _open(_mk(tmp_path, 180))
    c = _centres(v)
    # 180: red moves to the far corner, mirrored both ways.
    assert _page_dims(v) == (200, 100)
    assert abs(c["red"][0] - 275) < 2 and abs(c["red"][1] - 125) < 2, c
    assert abs(c["green"][0] - 125) < 2 and abs(c["green"][1] - 125) < 2, c


def test_rotate_270(tmp_path):
    v = _open(_mk(tmp_path, 270))
    c = _centres(v)
    assert _page_dims(v) == (100, 200)
    assert abs(c["red"][0] - 175) < 2 and abs(c["red"][1] - 275) < 2, c
    assert abs(c["green"][0] - 175) < 2 and abs(c["green"][1] - 125) < 2, c
