"""Type 3 fonts (PDF 9.6.4) — glyphs are content streams interpreted
through the page machinery.  BEYOND REFERENCE: the reference captures
TextBlocks (pdfgraphics.mli:134) but never rasterizes any font."""

import numpy as np

from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, Stream, mkpage
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, pdfscene, render as R


def _type3_font(charprocs, diffs, widths, first_char=97):
    return {
        "Type": Name("Font"),
        "Subtype": Name("Type3"),
        "FontBBox": [0, 0, 1000, 1000],
        "FontMatrix": [0.001, 0.0, 0.0, 0.001, 0.0, 0.0],
        "CharProcs": charprocs,
        "Encoding": {"Type": Name("Encoding"), "Differences": diffs},
        "FirstChar": first_char,
        "LastChar": first_char + len(widths) - 1,
        "Widths": widths,
        "Resources": {},
    }


def _page_dict(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def _render(pdf, box=(1, 1, 200, 200)):
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert scene, "Type3 text produced scene objects"
    spr = R.render_simple_scene(scene, region.shape_of_box(box))
    assert spr is not None
    return spr


def _rgba_at(spr, x, y):
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    iy, ix = y - y0, x - x0
    if 0 <= iy < r4.shape[0] and 0 <= ix < r4.shape[1]:
        return r4[iy, ix]
    return np.zeros(4, np.int64)


def test_type3_stencil_paints_text_colour():
    cache.clear()
    # d1 glyph: colour ops inside are IGNORED; paints with the Tf-time red.
    sq = Stream({}, b"750 0 0 0 750 750 d1 0 1 0 rg 0 0 750 750 re f")
    font = _type3_font({"square": sq}, [97, Name("square")], [1000])
    content = b"BT /F1 50 Tf 1 0 0 rg 20 100 Td (a) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 200, 200), resources={"Font": {"F1": font}})
    spr = _render(pdf)
    # Glyph square in user space (no y-flip in scene_of_graphic; the engine
    # flips at openfile): (20,100)-(57.5,137.5).
    px = _rgba_at(spr, 35, 120)
    assert px[3] > 200 and px[0] > 200 and px[1] < 50, px  # red, not green
    assert _rgba_at(spr, 70, 120)[3] < 30  # right of the glyph: empty
    cache.clear()


def test_type3_d0_keeps_glyph_colours():
    cache.clear()
    sq = Stream({}, b"750 0 d0 0 0 1 rg 0 0 750 750 re f")
    font = _type3_font({"square": sq}, [97, Name("square")], [1000])
    content = b"BT /F1 50 Tf 1 0 0 rg 20 100 Td (a) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 200, 200), resources={"Font": {"F1": font}})
    spr = _render(pdf)
    px = _rgba_at(spr, 35, 120)
    assert px[3] > 200 and px[2] > 200 and px[0] < 50, px  # glyph's own blue
    cache.clear()


def test_type3_widths_advance_in_glyph_space():
    cache.clear()
    sq = Stream({}, b"500 0 0 0 500 750 d1 0 0 500 750 re f")
    # width 1000 glyph units * FontMatrix -> 1 text unit -> 50 user units
    font = _type3_font({"bar": sq}, [97, Name("bar")], [1000])
    content = b"BT /F1 50 Tf 0 0 0 rg 20 100 Td (aa) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 200, 200), resources={"Font": {"F1": font}})
    spr = _render(pdf)
    # Bars at user x 20-45 and 70-95 (second advanced by 50), y 100-137.5.
    assert _rgba_at(spr, 30, 120)[3] > 200
    assert _rgba_at(spr, 55, 120)[3] < 30  # the gap between bars
    assert _rgba_at(spr, 80, 120)[3] > 200
    cache.clear()


def test_type3_unmapped_code_advances_without_paint():
    cache.clear()
    sq = Stream({}, b"1000 0 0 0 750 750 d1 0 0 750 750 re f")
    font = _type3_font({"square": sq}, [97, Name("square")], [1000, 1000])
    # 'b' (98) has a width but no CharProc mapping: advances silently.
    content = b"BT /F1 50 Tf 0 0 0 rg 20 100 Td (ba) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 200, 200), resources={"Font": {"F1": font}})
    spr = _render(pdf)
    assert _rgba_at(spr, 35, 120)[3] < 30  # 'b' cell empty
    assert _rgba_at(spr, 85, 120)[3] > 200  # 'a' painted one advance later
    cache.clear()
