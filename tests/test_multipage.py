"""Multi-page navigation (PageUp/PageDown) — BEYOND REFERENCE: the
reference's openfile renders page 1 only (engine.ml:1200-1229)."""

import coherence_tpu.colour as C
from coherence_tpu.gui import app as A, window as W
from coherence_tpu.scene import cache, render as R


def _two_page_pdf(tmp_path):
    data = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        b"2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n"
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
        b"/Contents 4 0 R >> endobj\n"
        b"4 0 obj << /Length 25 >> stream\n"
        b"1 0 0 rg 10 10 30 30 re f\nendstream endobj\n"
        b"5 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
        b"/Contents 6 0 R >> endobj\n"
        b"6 0 obj << /Length 26 >> stream\n"
        b"0 0 1 rg 50 50 100 30 re f\nendstream endobj\n"
        b"trailer << /Root 1 0 R /Size 7 >>\n%%EOF\n"
    )
    p = tmp_path / "two.pdf"
    p.write_bytes(data)
    return str(p)


def _fill_colours(view):
    out = []
    for o in view.scene:
        col = getattr(getattr(o.geometry, "fill", None), "colour", None)
        if col is not None:
            out.append(C.rgba_of_colour(col)[:3])
    return out


def _page_w(view):
    for o in view.pages:
        g = o.geometry
        if isinstance(g, R.Primitive) and g.colour == C.white:
            x0, x1, _, _ = R.proper_bounds(o)
            return round(x1 - x0)


def test_pagedown_swaps_scene_and_box(tmp_path):
    cache.clear()
    eng = A.Engine()
    eng.openfile(_two_page_pdf(tmp_path))
    view = eng.views[0]
    win = view.window
    assert _fill_colours(view) == [(255, 0, 0)]
    assert _page_w(view) == 100
    assert eng.docs[win][1:] == [0, 2]

    eng.event_handler((W.KEY_DOWN, win, W.PageDown))
    assert _fill_colours(view) == [(0, 0, 255)]
    assert _page_w(view) == 200
    assert eng.docs[win][1] == 1
    assert eng.wx.display.windows[win].status == "Page 2/2"
    assert eng.wx.display.refreshed, "page flip forced a repaint"

    # Clamped at the last page; PageUp returns.
    eng.event_handler((W.KEY_DOWN, win, W.PageDown))
    assert eng.docs[win][1] == 1
    eng.event_handler((W.KEY_DOWN, win, W.PageUp))
    assert _fill_colours(view) == [(255, 0, 0)]
    assert _page_w(view) == 100
    cache.clear()


def test_single_page_navigation_noop(tmp_path):
    from coherence_tpu.io.pdf import mkpage, pdf_to_file

    cache.clear()
    pdf = mkpage(b"0 1 0 rg 10 10 30 30 re f", mediabox=(0, 0, 100, 100))
    p = tmp_path / "one.pdf"
    pdf_to_file(pdf, str(p))
    eng = A.Engine()
    eng.openfile(str(p))
    view = eng.views[0]
    before = _fill_colours(view)
    eng.event_handler((W.KEY_DOWN, view.window, W.PageDown))
    assert _fill_colours(view) == before and eng.docs[view.window][1] == 0
    cache.clear()
