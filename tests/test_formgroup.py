"""Transparency groups (PDF 11.6.6) — BEYOND REFERENCE: a Form XObject
with /Group /S /Transparency under a group-level constant alpha or blend
mode composites its children to ONE sprite first (Group geometry), then
the alpha dissolves / the blend applies once to the result.  Per-element
application double-darkens self-overlapping groups (any Inkscape object
with opacity < 100%)."""

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


def _render(pdf, box=(1, 1, 100, 100)):
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert scene
    spr = R.render_simple_scene(list(reversed(scene)), region.shape_of_box(box))
    assert spr is not None
    return g, spr


def _texel(spr, x, y):
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    m = np.asarray(spr.mask)
    return tuple(int(v) for v in r4[y - y0, x - x0]), bool(m[y - y0, x - x0])


def _form(content, group=True):
    d = {"Type": Name("XObject"), "Subtype": Name("Form"),
         "BBox": [0, 0, 100, 100]}
    if group:
        d["Group"] = {"Type": Name("Group"), "S": Name("Transparency")}
    return Stream(d, content)


# Two overlapping opaque red squares: 20-60 and 40-80 (overlap 40-60).
OVERLAP = b"1 0 0 rg 20 20 40 40 re f 40 40 40 40 re f"


def test_group_alpha_is_uniform_across_self_overlap():
    form = _form(OVERLAP)
    gs = {"Type": Name("ExtGState"), "ca": 0.5}
    pdf = mkpage(b"1 1 1 rg 0 0 100 100 re f /GS0 gs /Fm0 Do",
                 mediabox=(0, 0, 100, 100),
                 resources={"ExtGState": {"GS0": gs},
                            "XObject": {"Fm0": form}})
    g, spr = _render(pdf)
    assert any(isinstance(el, PG.FormGroup) for el in g.elements)
    solo, _ = _texel(spr, 30, 30)    # only the first square
    both, _ = _texel(spr, 50, 50)    # the overlap
    white, _ = _texel(spr, 90, 90)   # backdrop
    assert white == (255, 255, 255, 255)
    assert solo == both, (solo, both)  # ONE alpha application, no seam
    # dissolve(red, 127) over white: r=255, g=b=255-127=128
    assert solo == (255, 128, 128, 255), solo


def test_inline_form_keeps_per_element_alpha():
    # No /Group: the reference-style inline path applies ca per element, so
    # the overlap darkens (two dissolved reds over each other).
    form = _form(OVERLAP, group=False)
    gs = {"Type": Name("ExtGState"), "ca": 0.5}
    pdf = mkpage(b"1 1 1 rg 0 0 100 100 re f /GS0 gs /Fm0 Do",
                 mediabox=(0, 0, 100, 100),
                 resources={"ExtGState": {"GS0": gs},
                            "XObject": {"Fm0": form}})
    g, spr = _render(pdf)
    assert not any(isinstance(el, PG.FormGroup) for el in g.elements)
    solo, _ = _texel(spr, 30, 30)
    both, _ = _texel(spr, 50, 50)
    assert solo != both  # the double application is visible in the overlap


def test_group_blend_applies_once():
    def div255(i):
        return (i + (i >> 8) + 1) >> 8

    form = _form(OVERLAP)
    gs = {"Type": Name("ExtGState"), "BM": Name("Multiply")}
    pdf = mkpage(b"0 0 1 rg 0 0 100 100 re f /GS0 gs /Fm0 Do",
                 mediabox=(0, 0, 100, 100),
                 resources={"ExtGState": {"GS0": gs},
                            "XObject": {"Fm0": form}})
    _, spr = _render(pdf)
    solo, _ = _texel(spr, 30, 30)
    both, _ = _texel(spr, 50, 50)
    assert solo == both, (solo, both)  # multiply ONCE even in the overlap
    exp = tuple(div255(a * b) for a, b in zip((0, 0, 255), (255, 0, 0))) + (255,)
    assert solo == exp, (solo, exp)


def test_group_survives_graphic_transform():
    form = _form(b"1 0 0 rg 20 20 40 40 re f")
    gs = {"Type": Name("ExtGState"), "ca": 0.25}
    pdf = mkpage(b"/GS0 gs /Fm0 Do", mediabox=(0, 0, 100, 100),
                 resources={"ExtGState": {"GS0": gs},
                            "XObject": {"Fm0": form}})
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    import coherence_tpu.transform as tr

    g2 = PG.transform_graphic([tr.Translate(5.0, 5.0)], g)
    fg = [el for el in g2.elements if isinstance(el, PG.FormGroup)]
    assert len(fg) == 1 and fg[0].ca == 0.25
    scene = pdfscene.scene_of_graphic(pdf, g2)
    spr = R.render_simple_scene(list(reversed(scene)), region.shape_of_box((1, 1, 100, 100)))
    got, cov = _texel(spr, 45, 45)  # translated square interior
    assert cov and got[3] == 63, got  # 0.25 * 255 truncated
