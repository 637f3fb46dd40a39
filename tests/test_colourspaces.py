"""Extended colourspaces for path colours, shadings, and images.

The reference routes colour operators through camlpdf's Pdfspace
(pdfgraphics.ml colour handling); here sc/scn components in
Indexed/Separation/DeviceN/Lab spaces convert to DeviceRGB at read time
(io/pdfgraphics.py resolve_cs/device_colour), shadings carry a
deep-resolved converter (Shading.cs_conv), and images decode Lab via the
CIE inverse transform (io/pdfimages.py)."""

import numpy as np
import zlib

import coherence_tpu.colour as C
from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, Stream, mkpage
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, pdfscene, render as R

import pytest


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def _page(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def _render(pdf, box):
    g = PG.graphic_of_page(pdf, _page(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    spr = R.render_simple_scene(scene, region.shape_of_box(box))
    assert spr is not None
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)

    def texel(x, y):
        return tuple(r4[y - y0, x - x0])

    return scene, texel


TINT_RED = {
    "FunctionType": 2,
    "Domain": [0.0, 1.0],
    "C0": [0.0, 0.0, 0.0],
    "C1": [1.0, 0.0, 0.0],
    "N": 1,
}


def test_separation_scn_path_colour():
    """1.0 scn in [/Separation /Spot /DeviceRGB f] fills with f(1) = red."""
    pdf = mkpage(
        b"/CS0 cs 1 scn 2 2 20 20 re f",
        mediabox=(0, 0, 30, 30),
        resources={
            "ColorSpace": {
                "CS0": [Name("Separation"), Name("Spot"), Name("DeviceRGB"), TINT_RED]
            }
        },
    )
    _, texel = _render(pdf, (1, 1, 30, 30))
    assert texel(10, 10) == (255, 0, 0, 255)


def test_separation_half_tint_matches_eval():
    pdf = mkpage(
        b"/CS0 cs 0.5 scn 2 2 20 20 re f",
        mediabox=(0, 0, 30, 30),
        resources={
            "ColorSpace": {
                "CS0": [Name("Separation"), Name("Spot"), Name("DeviceRGB"), TINT_RED]
            }
        },
    )
    _, texel = _render(pdf, (1, 1, 30, 30))
    expect = C.rgba_of_colour(C.colour_of_rgba_float(0.5, 0.0, 0.0, 1.0))
    assert texel(10, 10) == expect


def test_indexed_scn_path_colour():
    """2 scn in an Indexed space picks palette entry 2 (blue)."""
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    pdf = mkpage(
        b"/CS0 cs 2 scn 2 2 20 20 re f",
        mediabox=(0, 0, 30, 30),
        resources={
            "ColorSpace": {"CS0": [Name("Indexed"), Name("DeviceRGB"), 2, palette]}
        },
    )
    _, texel = _render(pdf, (1, 1, 30, 30))
    assert texel(10, 10) == (0, 0, 255, 255)


def test_lab_scn_white_and_black():
    """L*=100 a*=b*=0 is white; L*=0 is black (PDF 8.6.5.4)."""
    cs = [Name("Lab"), {"WhitePoint": [0.9505, 1.0, 1.089]}]
    pdf = mkpage(
        b"/CS0 cs 100 0 0 scn 2 2 10 10 re f /CS0 cs 0 0 0 scn 14 2 10 10 re f",
        mediabox=(0, 0, 30, 30),
        resources={"ColorSpace": {"CS0": cs}},
    )
    _, texel = _render(pdf, (1, 1, 30, 30))
    w = texel(6, 6)
    assert all(v >= 253 for v in w[:3]) and w[3] == 255
    assert texel(18, 6) == (0, 0, 0, 255)


def test_devicen_scn_path_colour():
    """DeviceN with two colorants through a Type-2 sum into DeviceRGB."""
    # A calculator function mapping (a, b) -> (a, b, 0).
    fn = Stream(
        {
            "FunctionType": 4,
            "Domain": [0.0, 1.0, 0.0, 1.0],
            "Range": [0.0, 1.0, 0.0, 1.0, 0.0, 1.0],
        },
        b"{ 0 }",
    )
    pdf = mkpage(
        b"/CS0 cs 0.25 0.75 scn 2 2 20 20 re f",
        mediabox=(0, 0, 30, 30),
        resources={
            "ColorSpace": {
                "CS0": [
                    Name("DeviceN"),
                    [Name("A"), Name("B")],
                    Name("DeviceRGB"),
                    fn,
                ]
            }
        },
    )
    _, texel = _render(pdf, (1, 1, 30, 30))
    expect = C.rgba_of_colour(C.colour_of_rgba_float(0.25, 0.75, 0.0, 1.0))
    assert texel(10, 10) == expect


def test_separation_axial_shading_endpoints():
    """An axial shading in a Separation space converts its endpoint tints
    through the tint transform (Shading.cs_conv)."""
    sh = {
        "ShadingType": 2,
        "ColorSpace": [Name("Separation"), Name("Spot"), Name("DeviceRGB"), TINT_RED],
        "Coords": [0.0, 0.0, 100.0, 0.0],
        "Extend": [True, True],
        "Function": {
            "FunctionType": 2,
            "Domain": [0.0, 1.0],
            "C0": [0.0],
            "C1": [1.0],
            "N": 1,
        },
    }
    pdf = mkpage(
        b"/Pattern cs /P0 scn 0 0 100 30 re f",
        mediabox=(0, 0, 100, 30),
        resources={"Pattern": {"P0": {"PatternType": 2, "Shading": sh}}},
    )
    g = PG.graphic_of_page(pdf, _page(pdf))
    el = g.elements[0]
    pat = el.attributes.path_fill[1]
    assert pat.shading.cs_conv is not None
    fill = pdfscene.fill_of_shading_pattern(pat, 1.0)
    # Endpoint colours: tint 0 -> black, tint 1 -> red.
    assert C.rgba_of_colour(fill.cs) == (0, 0, 0, 255)
    assert C.rgba_of_colour(fill.ce) == (255, 0, 0, 255)


def test_lab_image_decodes():
    """An 8-bpc Lab image with default Decode: (255,128,128) ~ white,
    (0,128,128) = black."""
    raw = bytes([255, 128, 128, 0, 128, 128])
    img = Stream(
        {
            "Type": Name("XObject"),
            "Subtype": Name("Image"),
            "Width": 2,
            "Height": 1,
            "BitsPerComponent": 8,
            "ColorSpace": [Name("Lab"), {"WhitePoint": [0.9505, 1.0, 1.089]}],
            "Filter": Name("FlateDecode"),
        },
        zlib.compress(raw),
    )
    pdf = mkpage(
        b"q 20 0 0 20 5 5 cm /Im0 Do Q",
        mediabox=(0, 0, 40, 40),
        resources={"XObject": {"Im0": img}},
    )
    _, texel = _render(pdf, (1, 1, 40, 40))
    left = texel(8, 15)
    right = texel(22, 15)
    assert all(v >= 248 for v in left[:3]) and left[3] == 255
    assert all(v <= 6 for v in right[:3]) and right[3] == 255


def test_unknown_named_cs_falls_back():
    """A cs naming a missing resource falls back to DeviceRGB semantics
    without raising."""
    pdf = mkpage(
        b"/Nope cs 1 0 0 scn 2 2 20 20 re f",
        mediabox=(0, 0, 30, 30),
        resources={},
    )
    _, texel = _render(pdf, (1, 1, 30, 30))
    assert texel(10, 10) == (255, 0, 0, 255)
