"""PDF blend modes (PDF 32000-1 §11.3.5) — BEYOND REFERENCE: the reference
composites with Porter/Duff `over` only (colour.ml:310-328) and ignores
ExtGState /BM.  Here scene/filters.blendmode paints every standard mode via
the filter pipeline, io/pdfgraphics captures /BM onto every element kind,
and the writer round-trips it through ExtGState resources."""

import math

import numpy as np
import pytest

import coherence_tpu.colour as C
import coherence_tpu.ident as ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, mkpage
from coherence_tpu.raster import blend as rblend
from coherence_tpu.raster import fills as rfills, region
from coherence_tpu.scene import cache, checkpoint, filters as F, pdfscene, render as R


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


# ---------------------------------------------------------------------------
# Independent float transcription of the spec formulas (PDF 32000-1 tables
# 136/137 and §11.3.5.3), used as the oracle for the integer/jnp versions.
# ---------------------------------------------------------------------------


def _ref_separable(mode, cb, cs):
    x, y = cb / 255.0, cs / 255.0
    if mode == "Multiply":
        r = x * y
    elif mode == "Screen":
        r = x + y - x * y
    elif mode == "Overlay":
        r = _ref_separable("HardLight", cs, cb) / 255.0
    elif mode == "Darken":
        r = min(x, y)
    elif mode == "Lighten":
        r = max(x, y)
    elif mode == "ColorDodge":
        r = 0.0 if x == 0 else (1.0 if y == 1 else min(1.0, x / (1.0 - y)))
    elif mode == "ColorBurn":
        r = 1.0 if x == 1 else (0.0 if y == 0 else 1.0 - min(1.0, (1.0 - x) / y))
    elif mode == "HardLight":
        r = x * 2 * y if y <= 0.5 else x + (2 * y - 1) - x * (2 * y - 1)
    elif mode == "SoftLight":
        if y <= 0.5:
            r = x - (1 - 2 * y) * x * (1 - x)
        else:
            d = ((16 * x - 12) * x + 4) * x if x <= 0.25 else math.sqrt(x)
            r = x + (2 * y - 1) * (d - x)
    elif mode == "Difference":
        r = abs(x - y)
    else:  # Exclusion
        r = x + y - 2 * x * y
    return r * 255.0


def _ref_lum(c):
    return 0.3 * c[0] + 0.59 * c[1] + 0.11 * c[2]


def _ref_clipcolor(c):
    l = _ref_lum(c)
    n, x = min(c), max(c)
    if n < 0:
        c = [l + (ch - l) * l / (l - n) for ch in c]
    if x > 1:
        c = [l + (ch - l) * (1 - l) / (x - l) for ch in c]
    return c


def _ref_setlum(c, l):
    d = l - _ref_lum(c)
    return _ref_clipcolor([ch + d for ch in c])


def _ref_setsat(c, s):
    mn, mx = min(c), max(c)
    if mx > mn:
        return [(ch - mn) * s / (mx - mn) for ch in c]
    return [0.0, 0.0, 0.0]


def _ref_nonseparable(mode, cb, cs):
    x = [v / 255.0 for v in cb]
    y = [v / 255.0 for v in cs]
    sat = lambda c: max(c) - min(c)
    if mode == "Hue":
        r = _ref_setlum(_ref_setsat(y, sat(x)), _ref_lum(x))
    elif mode == "Saturation":
        r = _ref_setlum(_ref_setsat(x, sat(y)), _ref_lum(x))
    elif mode == "Color":
        r = _ref_setlum(y, _ref_lum(x))
    else:  # Luminosity
        r = _ref_setlum(x, _ref_lum(y))
    return [v * 255.0 for v in r]


SEPARABLE = ["Multiply", "Screen", "Overlay", "Darken", "Lighten", "ColorDodge",
             "ColorBurn", "HardLight", "SoftLight", "Difference", "Exclusion"]
NONSEPARABLE = ["Hue", "Saturation", "Color", "Luminosity"]


@pytest.mark.parametrize("mode", SEPARABLE)
def test_separable_formulas_match_spec(mode):
    rng = np.random.RandomState(7)
    cb = rng.randint(0, 256, size=(64, 3)).astype(np.int32)
    cs = rng.randint(0, 256, size=(64, 3)).astype(np.int32)
    # Include the boundary cases the spec special-cases.
    edges = np.array([[0, 255, 128], [255, 0, 64], [0, 0, 0], [255, 255, 255]],
                     np.int32)
    cb = np.concatenate([cb, edges, edges])
    cs = np.concatenate([cs, edges, edges[::-1]])
    got = np.asarray(rblend.BLEND_MODES[mode](cb, cs))
    want = np.vectorize(lambda x, y: _ref_separable(mode, float(x), float(y)))(cb, cs)
    assert np.max(np.abs(got - want)) <= 1.0, (mode, np.max(np.abs(got - want)))


@pytest.mark.parametrize("mode", NONSEPARABLE)
def test_nonseparable_formulas_match_spec(mode):
    rng = np.random.RandomState(11)
    cb = rng.randint(0, 256, size=(40, 3)).astype(np.int32)
    cs = rng.randint(0, 256, size=(40, 3)).astype(np.int32)
    got = np.asarray(rblend.BLEND_MODES[mode](cb, cs))
    want = np.array(
        [_ref_nonseparable(mode, list(map(float, b)), list(map(float, s)))
         for b, s in zip(cb, cs)]
    )
    assert np.max(np.abs(got - want)) <= 1.0, (mode, np.max(np.abs(got - want)))


# ---------------------------------------------------------------------------
# Scene-level compositing through the filter pipeline
# ---------------------------------------------------------------------------


def _blend_obj(x, y, w, h, colour, mode):
    geom = R.Basic(rfills.plain(colour), R.PathShape(gshapes.rectangle(x, y, w, h)))
    return R.Obj(ident.new_ids(), F.blendmode(geom, mode), (), R.OVER)


def _texel(spr, x, y):
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    m = np.asarray(spr.mask)
    iy, ix = y - y0, x - x0
    return tuple(int(v) for v in r4[iy, ix]), bool(m[iy, ix])


def _div255(i):
    return (i + (i >> 8) + 1) >> 8


def test_multiply_scene_exact():
    cb = (100, 150, 200)
    cs = (50, 250, 30)
    below = R.mkrectangle(2, 2, 20, 20, rfills.plain(C.colour_of_rgba(*cb, 255)))
    top = _blend_obj(10, 10, 20, 20, C.colour_of_rgba(*cs, 255), "Multiply")
    spr = R.render_simple_scene([top, below], region.shape_of_box((1, 1, 40, 40)))
    exp = tuple(_div255(a * b) for a, b in zip(cb, cs)) + (255,)
    assert _texel(spr, 15, 15) == (exp, True)
    # Source-only region paints the plain source colour ...
    assert _texel(spr, 25, 25) == ((50, 250, 30, 255), True)
    # ... and the backdrop is untouched outside the blend object.
    assert _texel(spr, 5, 5) == ((100, 150, 200, 255), True)


@pytest.mark.parametrize("mode", ["Screen", "Darken", "Difference", "Luminosity"])
def test_modes_scene_interior_matches_formula(mode):
    cb = (40, 120, 220)
    cs = (200, 80, 60)
    below = R.mkrectangle(2, 2, 30, 30, rfills.plain(C.colour_of_rgba(*cb, 255)))
    top = _blend_obj(5, 5, 20, 20, C.colour_of_rgba(*cs, 255), mode)
    spr = R.render_simple_scene([top, below], region.shape_of_box((1, 1, 40, 40)))
    got, covered = _texel(spr, 15, 15)
    assert covered
    if mode in SEPARABLE:
        want = [_ref_separable(mode, float(b), float(s)) for b, s in zip(cb, cs)]
    else:
        want = _ref_nonseparable(mode, list(map(float, cb)), list(map(float, cs)))
    assert got[3] == 255
    assert max(abs(g - w) for g, w in zip(got[:3], want)) <= 1.0, (got, want)


def test_blend_with_source_alpha_lerps_backdrop():
    # A half-transparent Multiply source: C = (1-as)·Cb + as·Multiply(Cb,Cs).
    cb = (200, 100, 40)
    cs = (90, 180, 250)
    a = 127
    below = R.mkrectangle(2, 2, 30, 30, rfills.plain(C.colour_of_rgba(*cb, 255)))
    src_col = C.dissolve(C.colour_of_rgba(*cs, 255), delta=a)
    top = _blend_obj(5, 5, 20, 20, src_col, "Multiply")
    spr = R.render_simple_scene([top, below], region.shape_of_box((1, 1, 40, 40)))
    got, covered = _texel(spr, 15, 15)
    assert covered
    asf = a / 255.0
    want = [
        (1 - asf) * b + asf * _ref_separable("Multiply", float(b), float(s))
        for b, s in zip(cb, cs)
    ]
    assert got[3] == 255
    # dissolve+unpremul round-trips within a couple of LSBs.
    assert max(abs(g - w) for g, w in zip(got[:3], want)) <= 2.0, (got, want)


def test_blend_over_empty_backdrop_paints_source():
    top = _blend_obj(5, 5, 20, 20, C.colour_of_rgba(10, 20, 30, 255), "Difference")
    spr = R.render_simple_scene([top], region.shape_of_box((1, 1, 40, 40)))
    assert _texel(spr, 15, 15) == ((10, 20, 30, 255), True)


def test_checkpoint_roundtrip_preserves_blend():
    below = R.mkrectangle(2, 2, 20, 20, rfills.plain(C.colour_of_rgba(10, 200, 90, 255)))
    top = _blend_obj(10, 10, 20, 20, C.colour_of_rgba(240, 40, 0, 255), "Exclusion")
    scene = [top, below]
    blob = checkpoint.scene_to_json(scene)
    scene2 = checkpoint.scene_from_json(blob)
    box = region.shape_of_box((1, 1, 40, 40))
    a = R.render_simple_scene(scene, box)
    cache.clear()
    b = R.render_simple_scene(scene2, box)
    assert np.array_equal(np.asarray(a.rgba), np.asarray(b.rgba))


# ---------------------------------------------------------------------------
# PDF end-to-end: /BM capture, paint, and writer round-trip
# ---------------------------------------------------------------------------


def _page_dict(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def _render_pdf(pdf, box=(1, 1, 100, 100)):
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert scene
    spr = R.render_simple_scene(list(reversed(scene)), region.shape_of_box(box))
    assert spr is not None
    return g, spr


def test_pdf_bm_multiply_end_to_end():
    content = (b"0.4 0.6 0.8 rg 0 0 60 100 re f "
               b"/GS0 gs 1 0.5 0 rg 30 20 60 60 re f")
    gs = {"Type": Name("ExtGState"), "BM": Name("Multiply")}
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"ExtGState": {"GS0": gs}})
    g, spr = _render_pdf(pdf)
    paths = [el for el in g.elements if isinstance(el, PG.GPath)]
    assert [p.attributes.path_blend for p in paths] == ["Normal", "Multiply"]
    got, covered = _texel(spr, 45, 50)  # overlap
    assert covered
    cb = [round(0.4 * 255), round(0.6 * 255), round(0.8 * 255)]
    cs = [255, int(0.5 * 255), 0]
    want = [_ref_separable("Multiply", float(b), float(s)) for b, s in zip(cb, cs)]
    assert max(abs(gt - w) for gt, w in zip(got[:3], want)) <= 2.0, (got, want)
    solo, _ = _texel(spr, 75, 50)  # blend over bare page: plain source
    assert solo[:3] == (255, 127, 0), solo


def test_pdf_bm_array_form_and_unknown_name():
    content = (b"/GA gs 0 0 1 rg 0 0 50 50 re f "
               b"/GU gs 1 0 0 rg 50 0 50 50 re f")
    res = {"ExtGState": {
        "GA": {"BM": [Name("Darken"), Name("Compatible")]},
        "GU": {"BM": Name("NotARealMode")},
    }}
    pdf = mkpage(content, mediabox=(0, 0, 100, 100), resources=res)
    g, spr = _render_pdf(pdf, box=(1, 1, 100, 50))
    paths = [el for el in g.elements if isinstance(el, PG.GPath)]
    assert paths[0].attributes.path_blend == "Darken"
    assert paths[1].attributes.path_blend == "NotARealMode"
    # The unknown mode paints as Normal (PDF 11.3.5): plain red shows.
    got, covered = _texel(spr, 75, 25)
    assert covered and got == (255, 0, 0, 255), got


def test_writer_roundtrips_blend_and_alpha():
    content = (b"0.2 0.4 0.6 rg 0 0 60 100 re f "
               b"/GS0 gs 0 1 0 rg 30 20 60 60 re f")
    gs = {"Type": Name("ExtGState"), "BM": Name("Screen"), "ca": 0.5}
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"ExtGState": {"GS0": gs}})
    g1, spr1 = _render_pdf(pdf)
    pdf2 = PG.page_of_graphic(g1, mediabox=(0, 0, 100, 100))
    g2, spr2 = _render_pdf(pdf2)
    p1 = [el for el in g1.elements if isinstance(el, PG.GPath)]
    p2 = [el for el in g2.elements if isinstance(el, PG.GPath)]
    assert [p.attributes.path_blend for p in p2] == \
        [p.attributes.path_blend for p in p1]
    assert [p.attributes.path_transparency.fill_transparency for p in p2] == \
        [p.attributes.path_transparency.fill_transparency for p in p1]
    assert np.array_equal(np.asarray(spr1.rgba), np.asarray(spr2.rgba))
