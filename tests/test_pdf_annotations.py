"""Annotation appearance streams (PDF 12.5.5) — BEYOND REFERENCE: the
reference interprets page content streams only; here visible annotations'
/AP /N forms paint, mapped BBox-through-Matrix onto /Rect."""

import numpy as np

from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, Stream, mkpage
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, pdfscene, render as R


def _page_dict(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def _form(content: bytes, bbox, matrix=None) -> Stream:
    d = {
        "Type": Name("XObject"),
        "Subtype": Name("Form"),
        "BBox": list(bbox),
        "Resources": {},
    }
    if matrix:
        d["Matrix"] = list(matrix)
    return Stream(d, content)


def _annot(rect, ap_n, subtype="Square", extra=None):
    d = {
        "Type": Name("Annot"),
        "Subtype": Name(subtype),
        "Rect": list(rect),
        "AP": {"N": ap_n},
    }
    if extra:
        d.update(extra)
    return d


def _mk(annots, content=b""):
    pdf = mkpage(content, mediabox=(0, 0, 100, 100))
    page = _page_dict(pdf)
    page["Annots"] = annots
    return pdf


def _render(pdf):
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert scene
    # scene_of_graphic returns paint order; scenes are front-to-back
    # (element 0 topmost) so reverse like the engine does (app.py:778).
    spr = R.render_simple_scene(
        list(reversed(scene)), region.shape_of_box((1, 1, 100, 100))
    )
    assert spr is not None
    return spr


def _at(spr, x, y):
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    iy, ix = y - y0, x - x0
    if 0 <= iy < r4.shape[0] and 0 <= ix < r4.shape[1]:
        return r4[iy, ix]
    return np.zeros(4, np.int64)


def test_appearance_maps_bbox_to_rect():
    cache.clear()
    # Form draws a full-BBox red square in its own 0..10 space; Rect places
    # it at 20..60 x 30..70, so the scale is applied by algorithm 8.1.
    form = _form(b"1 0 0 rg 0 0 10 10 re f", (0, 0, 10, 10))
    pdf = _mk([_annot((20, 30, 60, 70), form)])
    spr = _render(pdf)
    assert _at(spr, 40, 50)[0] > 200
    assert _at(spr, 22, 32)[3] > 200 and _at(spr, 58, 68)[3] > 200
    assert _at(spr, 15, 50)[3] < 30 and _at(spr, 65, 50)[3] < 30
    cache.clear()


def test_hidden_and_popup_skipped():
    cache.clear()
    form = _form(b"0 1 0 rg 0 0 10 10 re f", (0, 0, 10, 10))
    pdf = _mk(
        [
            _annot((10, 10, 30, 30), form, extra={"F": 2}),  # Hidden
            _annot((40, 40, 60, 60), form, subtype="Popup"),
            _annot((70, 70, 90, 90), form),  # visible
        ]
    )
    spr = _render(pdf)
    assert _at(spr, 20, 20)[3] < 30
    assert _at(spr, 50, 50)[3] < 30
    assert _at(spr, 80, 80)[1] > 200
    cache.clear()


def test_appearance_state_selected_by_AS():
    cache.clear()
    on = _form(b"0 0 1 rg 0 0 10 10 re f", (0, 0, 10, 10))
    off = _form(b"", (0, 0, 10, 10))
    a = _annot((30, 30, 70, 70), {"On": on, "Off": off}, subtype="Widget",
               extra={"AS": Name("On")})
    spr = _render(_mk([a]))
    assert _at(spr, 50, 50)[2] > 200
    cache.clear()


def test_form_matrix_composes():
    cache.clear()
    # Matrix scales the BBox by 2; algorithm 8.1 still lands it on Rect.
    form = _form(b"1 0 0 rg 0 0 10 10 re f", (0, 0, 10, 10),
                 matrix=(2, 0, 0, 2, 5, 5))
    pdf = _mk([_annot((20, 20, 40, 40), form)])
    spr = _render(pdf)
    assert _at(spr, 30, 30)[0] > 200
    assert _at(spr, 45, 30)[3] < 30
    cache.clear()


def test_annots_paint_over_page_content():
    cache.clear()
    form = _form(b"0 0 1 rg 0 0 10 10 re f", (0, 0, 10, 10))
    pdf = _mk([_annot((40, 40, 60, 60), form)],
              content=b"1 0 0 rg 10 10 80 80 re f")
    spr = _render(pdf)
    assert _at(spr, 50, 50)[2] > 200  # annot blue over page red
    assert _at(spr, 20, 20)[0] > 200
    cache.clear()
