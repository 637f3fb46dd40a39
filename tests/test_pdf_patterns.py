"""Tiling patterns (PDF 8.7.3) paint for real — BEYOND REFERENCE: the
reference's read_tiling_pattern is the stub `Tiling` (pdfgraphics.ml:598),
so patterned paths there fall back to nothing.  Here the cell content
stream parses into graphic elements, rasterizes once through the real
renderer, and tiles as a TextureFill."""

import numpy as np

import coherence_tpu.colour as C
from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, Stream, mkpage
from coherence_tpu.raster import fills as rfills, region
from coherence_tpu.scene import cache, pdfscene, render as R


def _tiling_stream(d, content: bytes) -> Stream:
    base = {
        "Type": Name("Pattern"),
        "PatternType": 1,
        "PaintType": 1,
        "TilingType": 1,
        "BBox": [0.0, 0.0, 10.0, 10.0],
        "XStep": 10.0,
        "YStep": 10.0,
        "Resources": {},
    }
    base.update(d)
    return Stream(base, content)


def _page_dict(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def _mkdoc_coloured():
    # Cell: a red square over the lower-left pattern-space quadrant.
    pat = _tiling_stream({}, b"1 0 0 rg 0 0 5 5 re f")
    content = b"""
/Pattern cs /T0 scn
0 0 40 40 re f
"""
    resources = {"Pattern": {"T0": pat}}
    return mkpage(content, mediabox=(0, 0, 60, 60), resources=resources)


def test_parse_tiling_pattern():
    pdf = _mkdoc_coloured()
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    paths = [e for e in g.elements if isinstance(e, PG.GPath)]
    assert len(paths) == 1
    cs, pat = paths[0].attributes.path_fill
    assert cs == "Pattern" and isinstance(pat, PG.TilingPattern)
    assert pat.coloured and pat.bbox == (0.0, 0.0, 10.0, 10.0)
    assert pat.xstep == 10.0 and pat.ystep == 10.0
    assert pat.elements, "cell content stream parsed into elements"
    cell_paths = [e for e in pat.elements if isinstance(e, PG.GPath)]
    assert cell_paths and cell_paths[0].attributes.path_fill is not None


def test_tiling_pattern_renders_periodically():
    cache.clear()
    pdf = _mkdoc_coloured()
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    fills = [o.geometry.fill for o in scene]
    assert any(isinstance(f, rfills.TextureFill) for f in fills)
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 60, 60)))
    assert spr is not None
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    m = np.asarray(spr.mask)

    def texel(x, y):
        return r4[y - y0, x - x0], m[y - y0, x - x0]

    # Red squares live where (x mod 10) < 5 and (y mod 10) < 5 (pattern
    # space = page space here).  Sample cell interiors away from edges.
    red, mr = texel(3, 3)
    assert mr and red[0] > 200 and red[1] < 50, red
    red2, mr2 = texel(23, 33)
    assert mr2 and red2[0] > 200, red2
    # The other quadrants are unpainted (transparent texture under the
    # path's coverage -> alpha 0).
    gap, _ = texel(8, 8)
    assert gap[3] < 30, gap
    gap2, _ = texel(28, 37)
    assert gap2[3] < 30, gap2
    # Periodicity: same phase, same colour.
    a, _ = texel(13, 13)
    b, _ = texel(33, 23)
    assert (a == red).all() and (b == red).all(), (a, b, red)
    cache.clear()


def test_uncoloured_tiling_pattern_tints():
    """PaintType 2: the cell's coverage tints with the scn colour."""
    cache.clear()
    pat = _tiling_stream({"PaintType": 2}, b"0 0 6 6 re f")
    content = b"""
/P1 cs 0 0 1 /T0 scn
0 0 30 30 re f
"""
    resources = {
        "Pattern": {"T0": pat},
        "ColorSpace": {"P1": [Name("Pattern"), Name("DeviceRGB")]},
    }
    pdf = mkpage(content, mediabox=(0, 0, 40, 40), resources=resources)
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    paths = [e for e in g.elements if isinstance(e, PG.GPath)]
    _, pt = paths[0].attributes.path_fill
    assert isinstance(pt, PG.TilingPattern) and not pt.coloured
    assert pt.colour is not None and list(pt.colour[1]) == [0.0, 0.0, 1.0]
    scene = pdfscene.scene_of_graphic(pdf, g)
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 40, 40)))
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    inside = r4[3 - y0, 3 - x0]
    assert inside[2] > 200 and inside[0] < 50, inside  # blue tint
    cache.clear()


def test_texture_fill_transform_and_changecolour():
    tex = np.zeros((4, 4, 4), dtype=np.int64)
    tex[:2, :2] = np.array(C.rgba_of_colour(C.red))
    f = rfills.texture(tex, (0.0, 0.0, 4.0, 4.0), 4.0, 4.0, (1, 0, 0, 1, 0, 0))
    img = f.image((0, 0, 7, 7), 8, 8)
    assert img.shape == (8, 8, 4)
    # Texel row 0 = TOP of the bbox (max pattern y): at y=3 (v=3) we are in
    # the top half -> red left half; at y=1 the bottom half -> transparent.
    assert img[3, 1, 0] > 200 and img[3, 1, 3] > 200
    assert img[1, 1, 3] == 0
    # Periodic in both axes.
    assert (img[3, 1] == img[3 + 4, 1 + 4]).all()

    import coherence_tpu.transform as ctr

    g = f.transform([ctr.Translate(2.0, 0.0)])
    img2 = g.image((0, 0, 7, 7), 8, 8)
    assert (img2[3, 3] == img[3, 1]).all()

    h = f.changecolour(lambda c: C.blue if c == C.red else c)
    img3 = h.image((0, 0, 7, 7), 8, 8)
    assert img3[3, 1, 2] > 200 and img3[3, 1, 0] < 50


def test_tiling_pattern_roundtrip():
    """page_of_graphic re-serializes the tiling cell as a pattern stream
    (hoisted to an indirect object) and the reader reconstructs it."""
    from coherence_tpu.io.pdf import pdf_of_bytes, pdf_to_bytes

    pdf = _mkdoc_coloured()
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    out = PG.page_of_graphic(g, mediabox=(0, 0, 60, 60))
    pdf2 = pdf_of_bytes(pdf_to_bytes(out))
    g2 = PG.graphic_of_page(pdf2, _page_dict(pdf2))
    paths = [e for e in g2.elements if isinstance(e, PG.GPath)]
    assert paths and paths[0].attributes.path_fill is not None
    _, pat2 = paths[0].attributes.path_fill
    assert isinstance(pat2, PG.TilingPattern)
    assert pat2.bbox == (0.0, 0.0, 10.0, 10.0)
    assert pat2.xstep == 10.0 and pat2.ystep == 10.0
    cell2 = [e for e in pat2.elements if isinstance(e, PG.GPath)]
    assert cell2 and cell2[0].attributes.path_fill is not None
    cs, vals = cell2[0].attributes.path_fill
    assert list(vals) == [1.0, 0.0, 0.0]

    # Uncoloured round-trip keeps the tint components.
    pat = _tiling_stream({"PaintType": 2}, b"0 0 6 6 re f")
    content = b"/P1 cs 0 0 1 /T0 scn 0 0 30 30 re f"
    resources = {
        "Pattern": {"T0": pat},
        "ColorSpace": {"P1": [Name("Pattern"), Name("DeviceRGB")]},
    }
    pdfu = mkpage(content, mediabox=(0, 0, 40, 40), resources=resources)
    gu = PG.graphic_of_page(pdfu, _page_dict(pdfu))
    outu = PG.page_of_graphic(gu, mediabox=(0, 0, 40, 40))
    pdfu2 = pdf_of_bytes(pdf_to_bytes(outu))
    gu2 = PG.graphic_of_page(pdfu2, _page_dict(pdfu2))
    pu = [e for e in gu2.elements if isinstance(e, PG.GPath)][0]
    _, patu2 = pu.attributes.path_fill
    assert isinstance(patu2, PG.TilingPattern) and not patu2.coloured
    assert patu2.colour is not None and list(patu2.colour[1]) == [0.0, 0.0, 1.0]


def test_tiling_pattern_empty_cell_falls_back():
    pat = _tiling_stream({}, b"")
    content = b"/Pattern cs /T0 scn 0 0 20 20 re f"
    pdf = mkpage(content, mediabox=(0, 0, 30, 30), resources={"Pattern": {"T0": pat}})
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert scene, "degenerate pattern still paints (gray stub)"
    assert isinstance(scene[-1].geometry.fill, rfills.PlainFill)
