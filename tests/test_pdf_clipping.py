"""Clip paths apply to painted content — BEYOND REFERENCE: the reference's
scene_of_graphic discards Clip elements (render.ml:1558-1560 converts the
children unclipped); here scene/pdfscene intersects each painted shape with
the active clip stack via CPG INTERSECTION geometry, skipping rectangular
clips that already contain the paint (the ubiquitous page-box clip)."""

import io
import zlib

import numpy as np
import pytest

from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, Stream, mkpage
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, pdfscene, render as R


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def _page_dict(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def _scene(pdf):
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    return pdfscene.scene_of_graphic(pdf, g)


def _render(pdf, box=(1, 1, 100, 100)):
    scene = _scene(pdf)
    assert scene
    spr = R.render_simple_scene(list(reversed(scene)), region.shape_of_box(box))
    assert spr is not None
    return scene, spr


def _texel(spr, x, y):
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    m = np.asarray(spr.mask)
    iy, ix = y - y0, x - x0
    if 0 <= iy < r4.shape[0] and 0 <= ix < r4.shape[1]:
        return tuple(int(v) for v in r4[iy, ix]), bool(m[iy, ix])
    return (0, 0, 0, 0), False


def test_rect_clip_restricts_fill():
    content = b"q 20 20 40 40 re W n 1 0 0 rg 0 0 100 100 re f Q"
    pdf = mkpage(content, mediabox=(0, 0, 100, 100))
    scene, spr = _render(pdf)
    # the fill escapes the clip in neither direction
    assert _texel(spr, 40, 40) == ((255, 0, 0, 255), True)  # inside
    assert not _texel(spr, 70, 40)[1], "right of clip must be unpainted"
    assert not _texel(spr, 40, 70)[1], "above clip must be unpainted"
    assert not _texel(spr, 10, 10)[1], "below/left of clip must be unpainted"
    # the clipped object is CPG geometry
    assert isinstance(scene[0].geometry.shape, R.CPG)


def test_containing_rect_clip_is_skipped():
    # Page-box style clip fully containing the paint: no CPG wrapping.
    content = b"q 0 0 100 100 re W n 0 0 1 rg 20 20 30 30 re f Q"
    pdf = mkpage(content, mediabox=(0, 0, 100, 100))
    scene, spr = _render(pdf)
    assert isinstance(scene[0].geometry.shape, R.PathShape)
    assert _texel(spr, 30, 30) == ((0, 0, 255, 255), True)


def test_nested_clips_intersect():
    content = (b"q 10 10 50 50 re W n "
               b"q 30 30 60 60 re W n "
               b"0 1 0 rg 0 0 100 100 re f Q Q")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100))
    scene, spr = _render(pdf)
    assert _texel(spr, 45, 45) == ((0, 255, 0, 255), True)  # in both
    assert not _texel(spr, 20, 20)[1], "only in outer clip"
    assert not _texel(spr, 70, 70)[1], "only in inner clip"


def test_triangle_clip_on_image():
    raw = bytes([255, 0, 0] * 4)  # 2x2 solid red
    img = Stream(
        {"Type": Name("XObject"), "Subtype": Name("Image"),
         "Width": 2, "Height": 2, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceRGB"), "Filter": Name("FlateDecode")},
        zlib.compress(raw),
    )
    # Clip to the lower-left triangle of the placed square.
    content = (b"q 10 10 m 90 10 l 10 90 l h W n "
               b"q 80 0 0 80 10 10 cm /Im0 Do Q Q")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"XObject": {"Im0": img}})
    scene, spr = _render(pdf)
    assert _texel(spr, 25, 25)[0] == (255, 0, 0, 255)  # inside triangle
    assert not _texel(spr, 80, 80)[1], "clipped corner must be unpainted"
    assert isinstance(scene[0].geometry.shape, R.CPG)


def test_evenodd_clip_leaves_hole():
    # Two concentric rects, even-odd: the ring clips, the hole does not.
    content = (b"q 10 10 80 80 re 35 35 30 30 re W* n "
               b"0 0 0 rg 0 0 100 100 re f Q")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100))
    _, spr = _render(pdf)
    assert _texel(spr, 20, 50)[1], "ring paints"
    assert not _texel(spr, 50, 50)[1], "even-odd hole stays clear"


def test_stroke_clipped():
    content = (b"q 0 0 50 100 re W n "
               b"8 w 1 0 1 RG 10 50 m 90 50 l S Q")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100))
    _, spr = _render(pdf)
    assert _texel(spr, 30, 50)[1], "stroke inside the clip paints"
    assert not _texel(spr, 70, 50)[1], "stroke right of the clip is cut"


_HELV = {"Type": Name("Font"), "Subtype": Name("Type1"),
         "BaseFont": Name("Helvetica")}


def test_text_clip_mode7_gates_fill():
    # Tr 7: the glyphs paint nothing themselves but clip the later fill.
    content = (b"q BT /F0 80 Tf 3 Tr 10 20 Td (III) Tj ET "
               b"1 0 0 rg 0 0 100 100 re f Q")
    pdf7 = mkpage(content.replace(b"3 Tr", b"7 Tr"), mediabox=(0, 0, 100, 100),
                  resources={"Font": {"F0": _HELV}})
    g7 = PG.graphic_of_page(pdf7, _page_dict(pdf7))
    assert any(isinstance(el, PG.TextClip) for el in g7.elements)
    _, spr = _render(pdf7)
    x0, y0, _, _ = spr.box
    m = np.asarray(spr.mask)
    w = min(m.shape[1], 99)
    h = min(m.shape[0], 99)
    covered = int(m[:h, :w].sum())
    # the fill survives only inside glyph stems: a small fraction of 100x100
    assert 100 < covered < 4000, covered
    # Tr 3 form: invisible text, NO clip -> the fill covers everything.
    pdf3 = mkpage(content, mediabox=(0, 0, 100, 100),
                  resources={"Font": {"F0": _HELV}})
    g3 = PG.graphic_of_page(pdf3, _page_dict(pdf3))
    assert not any(isinstance(el, PG.TextClip) for el in g3.elements)
    _, spr3 = _render(pdf3)
    assert _texel(spr3, 90, 90)[1], "no text clip: fill covers the corner"


def test_text_clip_released_by_grestore():
    content = (b"q BT /F0 80 Tf 7 Tr 10 20 Td (I) Tj ET "
               b"1 0 0 rg 0 0 100 100 re f Q "
               b"0 0 1 rg 70 70 20 20 re f")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"Font": {"F0": _HELV}})
    _, spr = _render(pdf)
    got, cov = _texel(spr, 80, 80)
    assert cov and got == (0, 0, 255, 255), "post-Q paint is unclipped"


def test_text_clip_mode4_paints_and_clips():
    content = (b"q BT /F0 80 Tf 4 Tr 0 0 0 rg 10 20 Td (I) Tj ET "
               b"1 0 0 rg 0 40 100 20 re f Q")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"Font": {"F0": _HELV}})
    _, spr = _render(pdf)
    m = np.asarray(spr.mask)
    # the glyph painted (there IS coverage), and the band fill adds nothing
    # outside the glyph: total coverage equals the glyph's own coverage.
    scene = pdfscene.scene_of_graphic(pdf, PG.graphic_of_page(pdf, _page_dict(pdf)))
    assert len(scene) == 2  # glyph paint + clipped band
    assert m.sum() > 50
    assert not _texel(spr, 90, 50)[1], "band outside the glyph is clipped"


def test_text_clip_writer_roundtrip():
    content = (b"q BT /F0 60 Tf 7 Tr 5 30 Td (II) Tj ET "
               b"0 1 0 rg 0 0 100 100 re f Q")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"Font": {"F0": _HELV}})
    g1 = PG.graphic_of_page(pdf, _page_dict(pdf))
    pdf2 = PG.page_of_graphic(g1, mediabox=(0, 0, 100, 100))
    # the round-tripped page needs the font resource for outline derivation
    pdf2.objects[3]["Resources"]["Font"] = {"F0": _HELV}
    g2 = PG.graphic_of_page(pdf2, _page_dict(pdf2))
    tc1 = [el for el in g1.elements if isinstance(el, PG.TextClip)]
    tc2 = [el for el in g2.elements if isinstance(el, PG.TextClip)]
    assert len(tc1) == 1 and len(tc2) == 1
    s1 = pdfscene.scene_of_graphic(pdf, g1)
    cache.clear()
    s2 = pdfscene.scene_of_graphic(pdf2, g2)
    a = R.render_simple_scene(list(reversed(s1)), region.shape_of_box((1, 1, 100, 100)))
    cache.clear()
    b = R.render_simple_scene(list(reversed(s2)), region.shape_of_box((1, 1, 100, 100)))
    assert (a is None) == (b is None)
    if a is not None:
        assert np.array_equal(np.asarray(a.mask), np.asarray(b.mask))


def test_shading_respects_outer_clip():
    # Inner clip is the paint geometry; an outer non-containing clip must
    # also cut the shading.
    sh = {
        "ShadingType": 2, "ColorSpace": Name("DeviceRGB"),
        "Coords": [0.0, 0.0, 100.0, 0.0],
        "Function": {"FunctionType": 2, "Domain": [0.0, 1.0],
                     "C0": [1.0, 0.0, 0.0], "C1": [0.0, 0.0, 1.0], "N": 1.0},
        "Extend": [True, True],
    }
    content = (b"q 0 0 100 40 re W n "
               b"q 20 20 60 60 re W n /Sh0 sh Q Q")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"Shading": {"Sh0": sh}})
    _, spr = _render(pdf)
    inside, cov = _texel(spr, 50, 30)  # in both clips
    assert cov and inside[3] == 255
    assert not _texel(spr, 50, 60)[1], "outer clip cuts the shading"
    assert not _texel(spr, 10, 30)[1], "inner clip still applies"
