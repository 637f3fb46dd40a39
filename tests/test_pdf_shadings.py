"""PDF shadings and patterns (pdfgraphics.mli:33-127): the `sh` operator
and Pattern-colourspace fills parse into shading dataclasses, round-trip
through page_of_graphic, and render as gradient fills."""

import numpy as np

import coherence_tpu.colour as C
from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, mkpage, pdf_of_bytes, pdf_to_bytes
from coherence_tpu.raster import fills as rfills, region
from coherence_tpu.scene import cache, pdfscene, render as R


AXIAL = {
    "ShadingType": 2,
    "ColorSpace": Name("DeviceRGB"),
    "Coords": [10.0, 0.0, 60.0, 0.0],
    "Domain": [0.0, 1.0],
    "Extend": [True, False],
    "Function": {
        "FunctionType": 2,
        "Domain": [0.0, 1.0],
        "C0": [1.0, 0.0, 0.0],
        "C1": [0.0, 0.0, 1.0],
        "N": 1,
    },
}

RADIAL = {
    "ShadingType": 3,
    "ColorSpace": Name("DeviceGray"),
    "Coords": [40.0, 40.0, 0.0, 40.0, 40.0, 25.0],
    "Function": {
        "FunctionType": 3,
        "Domain": [0.0, 1.0],
        "Functions": [
            {"FunctionType": 2, "Domain": [0.0, 1.0], "C0": [1.0], "C1": [0.5], "N": 1},
            {"FunctionType": 2, "Domain": [0.0, 1.0], "C0": [0.5], "C1": [0.0], "N": 1},
        ],
        "Bounds": [0.5],
        "Encode": [0.0, 1.0, 0.0, 1.0],
    },
}


def _mkdoc():
    content = b"""
/Pattern cs /P0 scn
10 10 60 40 re f
q 1 0 0 1 5 5 cm /Sh0 sh Q
"""
    resources = {
        "Shading": {"Sh0": dict(RADIAL)},
        "Pattern": {
            "P0": {
                "PatternType": 2,
                "Matrix": [1.0, 0.0, 0.0, 1.0, 2.0, 3.0],
                "Shading": dict(AXIAL),
            }
        },
    }
    return mkpage(content, mediabox=(0, 0, 100, 80), resources=resources)


def _page_dict(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def test_parse_shading_and_pattern():
    pdf = _mkdoc()
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    paths = [e for e in g.elements if isinstance(e, PG.GPath)]
    shs = [e for e in g.elements if isinstance(e, PG.GShading)]
    assert len(paths) == 1 and len(shs) == 1

    cs, pat = paths[0].attributes.path_fill
    assert cs == "Pattern" and isinstance(pat, PG.ShadingPattern)
    ax = pat.shading.kind
    assert isinstance(ax, PG.AxialShadingK)
    assert ax.coords == (10.0, 0.0, 60.0, 0.0)
    assert ax.extend == (True, False)
    assert pat.shading.matrix == (1.0, 0.0, 0.0, 1.0, 2.0, 3.0)
    f = ax.functions[0]
    assert f.kind == 2 and f.c0 == (1.0, 0.0, 0.0) and f.c1 == (0.0, 0.0, 1.0)
    # Function evaluation: midpoint is the linear mix.
    assert PG.eval_function(f, 0.5) == [0.5, 0.0, 0.5]

    rad = shs[0].shading.kind
    assert isinstance(rad, PG.RadialShadingK)
    assert rad.coords == (40.0, 40.0, 0.0, 40.0, 40.0, 25.0)
    f3 = rad.functions[0]
    assert f3.kind == 3 and f3.bounds == (0.5,)
    assert PG.eval_function(f3, 0.25) == [0.75]  # first stitched segment
    assert PG.eval_function(f3, 0.75) == [0.25]  # second
    # The sh element captured the CTM in force (the q..cm).
    assert shs[0].transform == (1.0, 0.0, 0.0, 1.0, 5.0, 5.0)


def test_shading_roundtrip():
    pdf = _mkdoc()
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    out = PG.page_of_graphic(g, mediabox=(0, 0, 100, 80))
    pdf2 = pdf_of_bytes(pdf_to_bytes(out))
    g2 = PG.graphic_of_page(pdf2, _page_dict(pdf2))

    def summary(gx):
        pats = [
            e.attributes.path_fill[1].shading.kind
            for e in gx.elements
            if isinstance(e, PG.GPath) and e.attributes.path_fill is not None
        ]
        shs = [e.shading.kind for e in gx.elements if isinstance(e, PG.GShading)]
        return pats, shs

    p1, s1 = summary(g)
    p2, s2 = summary(g2)
    assert p1 == p2, (p1, p2)
    assert s1 == s2, (s1, s2)


def test_shading_pattern_renders_as_gradient():
    cache.clear()
    pdf = _mkdoc()
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    fills = [o.geometry.fill for o in scene]
    assert any(isinstance(f, rfills.GradientFill) for f in fills)
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 100, 80)))
    x0, y0, _, _ = spr.box
    m = np.asarray(spr.mask)
    r4 = np.asarray(spr.rgba)
    # Row inside the rect: red at the left edge of the gradient, blue at
    # the right (Coords 10..60, C0 red -> C1 blue).
    y = 30 - y0
    left = r4[y, 12 - x0]
    right = r4[y, 58 - x0]
    assert m[y, 12 - x0] and m[y, 58 - x0]
    assert left[0] > 200 and left[2] < 60, left  # red end
    assert right[2] > 200 and right[0] < 60, right  # blue end
    cache.clear()


def test_stroke_pattern_roundtrip():
    """A path STROKED with a shading pattern must survive page_of_graphic
    (the writer used to assume numeric stroke components and crash)."""
    content = b"""
/Pattern CS /P0 SCN
3 w
15 15 m 70 40 l S
"""
    resources = {
        "Pattern": {"P0": {"PatternType": 2, "Shading": dict(AXIAL)}}
    }
    pdf = mkpage(content, mediabox=(0, 0, 100, 80), resources=resources)
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    lines = [
        e for e in g.elements
        if isinstance(e, PG.GPath) and e.attributes.path_line is not None
    ]
    assert lines and isinstance(lines[0].attributes.path_line[1], PG.ShadingPattern)
    out = PG.page_of_graphic(g, mediabox=(0, 0, 100, 80))
    pdf2 = pdf_of_bytes(pdf_to_bytes(out))
    g2 = PG.graphic_of_page(pdf2, _page_dict(pdf2))
    lines2 = [
        e for e in g2.elements
        if isinstance(e, PG.GPath) and e.attributes.path_line is not None
    ]
    assert lines2 and isinstance(lines2[0].attributes.path_line[1], PG.ShadingPattern)
    assert (
        lines2[0].attributes.path_line[1].shading.kind
        == lines[0].attributes.path_line[1].shading.kind
    )


def test_function_range_clamps_and_type3_defaults():
    """Outputs clamp to /Range; a Type-3 with missing /Encode uses the
    spec default instead of crashing; out-of-[0,1] components never reach
    the colour constructor."""
    f2 = PG.PdfFunction(2, (0.0, 1.0), c0=(-0.5,), c1=(1.5,), n=1.0, range=(0.0, 1.0))
    assert PG.eval_function(f2, 0.0) == [0.0]
    assert PG.eval_function(f2, 1.0) == [1.0]
    f3 = PG.PdfFunction(
        3, (0.0, 1.0),
        functions=(PG.PdfFunction(2, (0.0, 1.0), c0=(0.0,), c1=(2.0,), n=1.0),),
        bounds=(), encode=(),
    )
    assert PG.eval_function(f3, 0.5) == [1.0]  # default encode [0, 1]
    from coherence_tpu.scene.pdfscene import _colour_of_components

    col = _colour_of_components(Name("DeviceRGB"), [1.7, -0.2, 0.5], 1.0)
    assert isinstance(col, int)


def test_sh_paints_through_clip():
    """A `sh` inside a clip becomes a gradient-filled object of the clip
    geometry (beyond the reference, whose scene_of_graphic drops sh)."""
    cache.clear()
    content = b"""
q
20 20 50 30 re W n
/Sh1 sh
Q
"""
    resources = {"Shading": {"Sh1": dict(AXIAL)}}
    pdf = mkpage(content, mediabox=(0, 0, 100, 80), resources=resources)
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    grads = [o for o in scene if isinstance(o.geometry.fill, rfills.GradientFill)]
    assert grads, "sh inside clip produced no gradient object"
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 100, 80)))
    x0, y0, _, _ = spr.box
    m = np.asarray(spr.mask)
    r4 = np.asarray(spr.rgba)
    y = 35 - y0
    # Inside the clip rect: red toward the gradient start, bluer to the right.
    left = r4[y, 22 - x0]
    right = r4[y, 58 - x0]
    assert m[y, 22 - x0] and m[y, 58 - x0]
    assert left[0] > left[2] and right[2] > right[0], (left, right)
    # Outside the clip: nothing painted (the sprite's bounds stay within
    # the clip rect plus the AA fringe).
    bx0, by0, bx1, by1 = spr.box
    assert by0 >= 19 and by1 <= 51 and bx0 >= 19 and bx1 <= 71, spr.box
    cache.clear()


def test_transform_graphic_moves_shading_with_clip():
    """ADVICE r2: transform_graphic must compose the transform into GShading
    (matrix + clip + ctm) so the gradient stays registered with its clip —
    the y-flip into raster orientation otherwise leaves the gradient in the
    old space while the clip moves."""
    from coherence_tpu import transform as ctr

    content = b"""
q
20 20 50 30 re W n
/Sh1 sh
Q
"""
    resources = {"Shading": {"Sh1": dict(AXIAL)}}
    pdf = mkpage(content, mediabox=(0, 0, 100, 80), resources=resources)
    g = PG.graphic_of_page(pdf, _page_dict(pdf))

    t = [ctr.Translate(7.0, -3.0)]
    g2 = PG.transform_graphic(t, g)

    def find_sh(elements):
        for el in elements:
            if isinstance(el, PG.GShading):
                return el
            if isinstance(el, (PG.Clip, PG.MCSection)):
                got = find_sh(el.elements)
                if got is not None:
                    return got
        return None

    sh1, sh2 = find_sh(g.elements), find_sh(g2.elements)
    assert sh1 is not None and sh2 is not None
    # The shading matrix picked up the translation...
    assert sh2.shading.matrix[4] == sh1.shading.matrix[4] + 7.0
    assert sh2.shading.matrix[5] == sh1.shading.matrix[5] - 3.0
    # ...and so did the element ctm and the captured clip path.
    assert sh2.transform[4] == sh1.transform[4] + 7.0
    if sh1.clip is not None:
        p1 = sh1.clip.subpaths[0].segments[0].frm
        p2 = sh2.clip.subpaths[0].segments[0].frm
        assert p2[0] == p1[0] + 7.0 and p2[1] == p1[1] - 3.0
    # Rendering the transformed graphic: gradient direction follows.
    cache.clear()
    scene = pdfscene.scene_of_graphic(pdf, g2)
    grads = [o for o in scene if isinstance(o.geometry.fill, rfills.GradientFill)]
    assert grads
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 100, 80)))
    x0, y0, _, _ = spr.box
    m = np.asarray(spr.mask)
    r4 = np.asarray(spr.rgba)
    y = 32 - y0  # 35 - 3
    left = r4[y, 29 - x0]  # 22 + 7
    right = r4[y, 65 - x0]  # 58 + 7
    assert m[y, 29 - x0] and m[y, 65 - x0]
    assert left[0] > left[2] and right[2] > right[0], (left, right)
    cache.clear()


def test_noncentric_radial_two_circle_sweep():
    """Offset start circle (the 'highlight' form) renders as the exact
    two-circle sweep: start colour near the start centre, end colour on the
    end rim, nothing outside both circles when neither extend is set."""
    import math as _math

    from coherence_tpu.raster.fills import RadialFill2

    # Start: tiny circle at (30, 40); end: r=25 at (50, 40).
    f = RadialFill2(
        (30.0, 40.0), (31.0, 40.0), (50.0, 40.0), (75.0, 40.0),
        False, False, C.white, C.black,
    )
    img = f.image((0, 0, 99, 79), 80, 100)

    def px(x, y):
        return img[y, x]

    near_start = px(31, 40)  # on the start circle's rim: s = 0
    assert near_start[0] > 200, near_start  # white end
    on_end_rim = px(73, 40)
    assert on_end_rim[3] > 200 and on_end_rim[0] < 40, on_end_rim  # black
    outside = px(2, 5)
    assert outside[3] == 0, outside  # transparent (no extend)
    # STRICT PDF semantics: with Extend[0] false the start circle's
    # interior is a hole (no s >= 0 circle passes through its centre).
    assert px(30, 40)[3] == 0
    # Monotone darkening along the sweep axis.
    vals = [int(px(x, 40)[0]) for x in (32, 40, 50, 60, 70)]
    assert all(a >= b for a, b in zip(vals, vals[1:])), vals

    # With ext_s, the backward sweep covers the start interior with the
    # start colour.
    f_s = RadialFill2(
        (30.0, 40.0), (31.0, 40.0), (50.0, 40.0), (75.0, 40.0),
        True, False, C.white, C.black,
    )
    img_s = f_s.image((0, 0, 99, 79), 80, 100)
    assert img_s[40, 30][0] > 200

    # With ext_e, the outside region takes the end colour.
    f2 = RadialFill2(
        (30.0, 40.0), (31.0, 40.0), (50.0, 40.0), (75.0, 40.0),
        False, True, C.white, C.black,
    )
    img2 = f2.image((0, 0, 99, 79), 80, 100)
    assert img2[5, 2, 3] > 200 and img2[5, 2, 0] < 40

    # A PDF radial with offset centres produces a RadialFill2 scene fill.
    rad = {
        "ShadingType": 3,
        "ColorSpace": Name("DeviceGray"),
        "Coords": [30.0, 40.0, 1.0, 50.0, 40.0, 25.0],
        "Function": {
            "FunctionType": 2, "Domain": [0.0, 1.0],
            "C0": [1.0], "C1": [0.0], "N": 1,
        },
    }
    content = b"/Pattern cs /P0 scn 0 0 90 70 re f"
    pdf = mkpage(
        content, mediabox=(0, 0, 100, 80),
        resources={"Pattern": {"P0": {"PatternType": 2, "Shading": rad}}},
    )
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert any(isinstance(o.geometry.fill, RadialFill2) for o in scene)


def test_function_shading_type1_renders():
    """Type 1 (function-based) shading paints its sampled f(x, y) ramp —
    BEYOND REFERENCE: the reference drops every shading at render time."""
    from coherence_tpu.io.pdf import Stream

    cache.clear()
    fn = Stream(
        {
            "FunctionType": 4,
            "Domain": [0.0, 100.0, 0.0, 100.0],
            "Range": [0.0, 1.0, 0.0, 1.0, 0.0, 1.0],
        },
        b"{ pop 100 div 0 0 }",  # r = x/100, g = b = 0
    )
    sh = Stream(
        {
            "ShadingType": 1,
            "ColorSpace": Name("DeviceRGB"),
            "Domain": [0.0, 100.0, 0.0, 100.0],
            "Function": fn,
        },
        b"",
    )
    pdf = mkpage(
        b"/Sh0 sh", mediabox=(0, 0, 100, 80), resources={"Shading": {"Sh0": sh}}
    )
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert scene
    assert any(isinstance(o.geometry.fill, rfills.ImageFill) for o in scene)
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 100, 80)))
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)

    def at(x, y):
        return r4[y - y0, x - x0]

    left = at(10, 40)
    right = at(90, 40)
    assert left[3] > 200 and right[3] > 200
    assert left[0] < 60 and right[0] > 190, (left, right)  # x ramp
    mid = at(50, 40)
    assert 90 < mid[0] < 160, mid
    cache.clear()


def test_function_shading_type1_function_array_renders():
    """Type 1 with /Function as an ARRAY of n one-out functions (one per
    colour component, PDF 8.7.4.5.2) — outputs concatenate per component."""
    from coherence_tpu.io.pdf import Stream

    cache.clear()
    mk = lambda body: Stream(
        {
            "FunctionType": 4,
            "Domain": [0.0, 100.0, 0.0, 100.0],
            "Range": [0.0, 1.0],
        },
        body,
    )
    fns = [
        mk(b"{ pop 100 div }"),          # r = x/100
        mk(b"{ pop pop 0 }"),            # g = 0
        mk(b"{ pop 100 div neg 1 add }"),  # b = 1 - x/100
    ]
    sh = Stream(
        {
            "ShadingType": 1,
            "ColorSpace": Name("DeviceRGB"),
            "Domain": [0.0, 100.0, 0.0, 100.0],
            "Function": fns,
        },
        b"",
    )
    pdf = mkpage(
        b"/Sh0 sh", mediabox=(0, 0, 100, 80), resources={"Shading": {"Sh0": sh}}
    )
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert scene
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 100, 80)))
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    left = r4[40 - y0, 10 - x0]
    right = r4[40 - y0, 90 - x0]
    assert left[3] > 200 and right[3] > 200
    assert left[0] < 60 and left[2] > 190, left    # blue at x=10
    assert right[0] > 190 and right[2] < 60, right  # red at x=90
    # The writer round-trips the array form.
    out = PG.page_of_graphic(g, mediabox=(0, 0, 100, 80))
    pdf2 = pdf_of_bytes(pdf_to_bytes(out))
    g2 = PG.graphic_of_page(pdf2, _page_dict(pdf2))
    sh2 = next(e for e in g2.elements if isinstance(e, PG.GShading))
    assert isinstance(sh2.shading.kind.function, tuple)
    assert len(sh2.shading.kind.function) == 3
    cache.clear()
