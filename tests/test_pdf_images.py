"""PDF raster images paint for real — BEYOND REFERENCE: the reference
parses Image/GraphicInlineImage elements (pdfgraphics.mli:139-140) but its
scene_of_graphic drops them (render.ml:1524-1565 consumes paths/clips
only).  Here io/pdfimages decodes the samples and scene/pdfscene paints
them through an ImageFill over the ctm-placed unit square."""

import io
import zlib

import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io import pdfimages as PI
from coherence_tpu.io.pdf import Name, Stream, mkpage
from coherence_tpu.raster import fills as rfills, region
from coherence_tpu.scene import cache, pdfscene, render as R


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
    m = np.asarray(spr.mask)

    def texel(x, y):
        return r4[y - y0, x - x0], m[y - y0, x - x0]

    return scene, texel


def _img_stream(d, raw, compress=True):
    base = {"Type": Name("XObject"), "Subtype": Name("Image")}
    base.update(d)
    if compress:
        base["Filter"] = Name("FlateDecode")
        raw = zlib.compress(raw)
    return Stream(base, raw)


def test_rgb_xobject_renders_with_orientation():
    """8-bpc DeviceRGB 2x2: sample row 0 paints the TOP of the placed
    square (PDF 8.9.5.2 image space)."""
    raw = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    img = _img_stream(
        {"Width": 2, "Height": 2, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceRGB")},
        raw,
    )
    pdf = mkpage(
        b"q 20 0 0 20 5 5 cm /Im0 Do Q",
        mediabox=(0, 0, 40, 40),
        resources={"XObject": {"Im0": img}},
    )
    scene, texel = _render(pdf, (1, 1, 40, 40))
    assert [type(o.geometry.fill).__name__ for o in scene] == ["ImageFill"]
    # Placement: x,y in [5,25]; image row 0 = (red, green) at the top.
    assert tuple(texel(8, 22)[0]) == (255, 0, 0, 255)  # top-left red
    assert tuple(texel(22, 22)[0]) == (0, 255, 0, 255)  # top-right green
    assert tuple(texel(8, 8)[0]) == (0, 0, 255, 255)  # bottom-left blue
    assert tuple(texel(22, 8)[0]) == (255, 255, 255, 255)
    assert texel(2, 2)[0][3] == 0  # outside the quad


def test_scene_transform_moves_image_and_fill_together():
    """transform_renderobject_many composes into ImageFill.matrix like the
    gradient fills: after the engine-style y-flip the image's top row still
    lands at the top of the (moved) quad."""
    raw = bytes([255, 0, 0, 0, 0, 255])  # 1x2: red over blue
    img = _img_stream(
        {"Width": 1, "Height": 2, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceRGB")},
        raw,
    )
    pdf = mkpage(
        b"q 10 0 0 10 10 10 cm /Im0 Do Q",
        mediabox=(0, 0, 40, 40),
        resources={"XObject": {"Im0": img}},
    )
    from coherence_tpu import transform as tr

    g = PG.graphic_of_page(pdf, _page(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    flip = [tr.Translate(0.0, 40.0), tr.Scale((0.0, 0.0), 1.0, -1.0)]
    scene = [R.transform_renderobject_many(flip, o) for o in scene]
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 40, 40)))
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    # PDF y [10,20] flips to raster y [20,30]; image top (red) was at PDF
    # y~20, now raster y~20 (the flip swaps which end is "up"): the red
    # half must now sit at the LOWER raster y of the quad.
    top = r4[22 - y0, 15 - x0]
    bot = r4[28 - y0, 15 - x0]
    assert tuple(top) == (255, 0, 0, 255), top
    assert tuple(bot) == (0, 0, 255, 255), bot


def test_indexed_4bpc_unpacking():
    """Indexed DeviceRGB, 4 bits per sample, odd width (row padding)."""
    lookup = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # 0=red 1=green 2=blue
    # 3x2 indices: (0,1,2) / (2,1,0); rows pad to whole bytes.
    raw = bytes([0x01, 0x20, 0x21, 0x00])
    img = _img_stream(
        {"Width": 3, "Height": 2, "BitsPerComponent": 4,
         "ColorSpace": [Name("Indexed"), Name("DeviceRGB"), 2, lookup]},
        raw,
    )
    pdf = mkpage(
        b"q 30 0 0 20 0 0 cm /Im0 Do Q",
        mediabox=(0, 0, 30, 20),
        resources={"XObject": {"Im0": img}},
    )
    _, texel = _render(pdf, (1, 1, 30, 20))
    # Top row (raster-space y high): red green blue; bottom: blue green red.
    assert tuple(texel(5, 15)[0]) == (255, 0, 0, 255)
    assert tuple(texel(15, 15)[0]) == (0, 255, 0, 255)
    assert tuple(texel(25, 15)[0]) == (0, 0, 255, 255)
    assert tuple(texel(5, 5)[0]) == (0, 0, 255, 255)
    assert tuple(texel(25, 5)[0]) == (255, 0, 0, 255)


def test_gray_1bpc_decode_flip():
    """1-bpc DeviceGray with /Decode [1 0] inverts the samples."""
    raw = bytes([0b10000000])  # 1x1... use 2x1: bits 1,0
    raw = bytes([0b10000000, 0b00000000])  # row0: 1,0 ; row1: 0,0 (2x2)
    img = _img_stream(
        {"Width": 2, "Height": 2, "BitsPerComponent": 1,
         "ColorSpace": Name("DeviceGray"), "Decode": [1, 0]},
        raw,
        compress=False,
    )
    tex = PI.rgba_of_image(None, img.dict, img.raw)
    # Decode [1 0]: sample 1 -> 0.0 (black), sample 0 -> 1.0 (white).
    assert tuple(tex[0, 0]) == (0, 0, 0, 255)
    assert tuple(tex[0, 1]) == (255, 255, 255, 255)
    assert tuple(tex[1, 0]) == (255, 255, 255, 255)


def test_image_mask_paints_current_fill():
    """/ImageMask true paints the nonstroke colour through 0-samples."""
    # 2x2 mask: paint main diagonal (samples 0 paint by default Decode).
    raw = bytes([0b01000000, 0b10000000])
    img = _img_stream(
        {"Width": 2, "Height": 2, "ImageMask": True}, raw
    )
    pdf = mkpage(
        b"q 0 0 1 rg 20 0 0 20 0 0 cm /Im0 Do Q",
        mediabox=(0, 0, 20, 20),
        resources={"XObject": {"Im0": img}},
    )
    g = PG.graphic_of_page(pdf, _page(pdf))
    el = [e for e in g.elements if isinstance(e, PG.Image)][0]
    assert el.attributes.image_fill is not None
    _, texel = _render(pdf, (1, 1, 20, 20))
    # Sample (0,0)=0 paints blue at the TOP-left; (1,1)=0 at bottom-right.
    assert tuple(texel(5, 15)[0]) == (0, 0, 255, 255)
    assert tuple(texel(15, 5)[0]) == (0, 0, 255, 255)
    assert texel(15, 15)[0][3] == 0  # unpainted stays transparent
    assert texel(5, 5)[0][3] == 0


def test_inline_image_abbreviated_keys_and_hex_filter():
    content = (
        b"q 16 0 0 16 2 2 cm BI /W 2 /H 1 /BPC 8 /CS /RGB /F /AHx "
        b"ID ff000000ff00> EI Q"
    )
    pdf = mkpage(content, mediabox=(0, 0, 20, 20))
    g = PG.graphic_of_page(pdf, _page(pdf))
    inls = [e for e in g.elements if isinstance(e, PG.GraphicInlineImage)]
    assert len(inls) == 1
    _, texel = _render(pdf, (1, 1, 20, 20))
    assert tuple(texel(5, 10)[0]) == (255, 0, 0, 255)
    assert tuple(texel(14, 10)[0]) == (0, 255, 0, 255)


def test_smask_alpha_premultiplies():
    smask = _img_stream(
        {"Width": 2, "Height": 1, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceGray")},
        bytes([255, 0]),
    )
    d = {
        "Width": 2, "Height": 1, "BitsPerComponent": 8,
        "ColorSpace": Name("DeviceRGB"), "SMask": smask,
    }
    tex = PI.rgba_of_image(None, d, bytes([255, 0, 0, 0, 255, 0]))
    assert tuple(tex[0, 0]) == (255, 0, 0, 255)
    assert tuple(tex[0, 1]) == (0, 0, 0, 0)  # alpha 0 premultiplies to 0


def test_cmyk_collapse_matches_reference_formula():
    d = {
        "Width": 1, "Height": 1, "BitsPerComponent": 8,
        "ColorSpace": Name("DeviceCMYK"),
    }
    tex = PI.rgba_of_image(None, d, bytes([0, 255, 255, 0]))  # pure cyan=0?
    # c=0, m=1, y=1, k=0 -> r=1, g=0, b=0 (render.ml:1476-1479 formula).
    assert tuple(tex[0, 0]) == (255, 0, 0, 255)


def test_separation_tint_function():
    """/Separation with a Type-2 tint onto DeviceRGB evaluates the ramp."""
    tint = {
        "FunctionType": 2, "Domain": [0.0, 1.0],
        "C0": [1.0, 1.0, 1.0], "C1": [1.0, 0.0, 0.0], "N": 1,
    }
    d = {
        "Width": 2, "Height": 1, "BitsPerComponent": 8,
        "ColorSpace": [Name("Separation"), Name("Spot"),
                       Name("DeviceRGB"), tint],
    }
    pdf = mkpage(b"", mediabox=(0, 0, 10, 10))  # resolver for the function
    tex = PI.rgba_of_image(pdf, d, bytes([0, 255]))
    assert tuple(tex[0, 0]) == (255, 255, 255, 255)  # tint 0 -> C0 white
    assert tuple(tex[0, 1]) == (255, 0, 0, 255)  # tint 1 -> C1 red


def test_dct_decode_via_pil():
    PIL = pytest.importorskip("PIL.Image")
    buf = io.BytesIO()
    arr = np.zeros((8, 8, 3), np.uint8)
    arr[:, :4] = (255, 0, 0)
    arr[:, 4:] = (0, 0, 255)
    PIL.fromarray(arr).save(buf, format="JPEG", quality=95)
    img = Stream(
        {"Type": Name("XObject"), "Subtype": Name("Image"),
         "Width": 8, "Height": 8, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceRGB"), "Filter": Name("DCTDecode")},
        buf.getvalue(),
    )
    tex = PI.rgba_of_image(None, img.dict, img.raw)
    assert tex.shape == (8, 8, 4)
    l = tex[4, 1]
    r = tex[4, 6]
    assert l[0] > 200 and l[2] < 80, l  # JPEG is lossy: loose bounds
    assert r[2] > 200 and r[0] < 80, r


def test_jpx_decode_via_pil():
    """JPXDecode (PDF 7.4.9): PIL's default JPEG2000 encode is the lossless
    reversible 5-3 wavelet, so pixels round-trip exactly."""
    PIL = pytest.importorskip("PIL.Image")
    arr = np.zeros((8, 8, 3), np.uint8)
    arr[:, :4] = (255, 0, 0)
    arr[:, 4:] = (0, 0, 255)
    buf = io.BytesIO()
    PIL.fromarray(arr).save(buf, format="JPEG2000")
    img = Stream(
        {"Type": Name("XObject"), "Subtype": Name("Image"),
         "Width": 8, "Height": 8, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceRGB"), "Filter": Name("JPXDecode")},
        buf.getvalue(),
    )
    tex = PI.rgba_of_image(None, img.dict, img.raw)
    assert tex.shape == (8, 8, 4)
    assert tuple(tex[4, 1]) == (255, 0, 0, 255)
    assert tuple(tex[4, 6]) == (0, 0, 255, 255)


def test_jpx_grayscale_end_to_end():
    """A grayscale JP2 placed by Do paints exact gray levels."""
    PIL = pytest.importorskip("PIL.Image")
    g = np.full((4, 4), 0, np.uint8)
    g[:, 2:] = 200
    buf = io.BytesIO()
    PIL.fromarray(g, mode="L").save(buf, format="JPEG2000")
    img = Stream(
        {"Type": Name("XObject"), "Subtype": Name("Image"),
         "Width": 4, "Height": 4, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceGray"), "Filter": Name("JPXDecode")},
        buf.getvalue(),
    )
    pdf = mkpage(
        b"q 8 0 0 8 1 1 cm /Im0 Do Q",
        mediabox=(0, 0, 10, 10),
        resources={"XObject": {"Im0": img}},
    )
    _, texel = _render(pdf, (1, 1, 10, 10))
    rgba_l, m_l = texel(2, 5)
    rgba_r, m_r = texel(7, 5)
    assert m_l and m_r
    assert tuple(rgba_l) == (0, 0, 0, 255)
    assert tuple(rgba_r) == (200, 200, 200, 255)


def test_unsupported_image_falls_back_to_gray_quad():
    img = Stream(
        {"Type": Name("XObject"), "Subtype": Name("Image"),
         "Width": 2, "Height": 2, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceRGB"), "Filter": Name("JBIG2Decode")},
        b"\x00\x01",
    )
    pdf = mkpage(
        b"q 10 0 0 10 0 0 cm /Im0 Do Q",
        mediabox=(0, 0, 10, 10),
        resources={"XObject": {"Im0": img}},
    )
    scene, texel = _render(pdf, (1, 1, 10, 10))
    assert [type(o.geometry.fill).__name__ for o in scene] == ["PlainFill"]
    assert texel(5, 5)[1]  # the placeholder quad still covers the area


def test_image_fill_changecolour_and_single():
    tex = np.zeros((2, 2, 4), dtype=np.int64)
    tex[0, 0] = np.array(C.rgba_of_colour(C.red))
    f = rfills.image_fill(tex, (10.0, 0.0, 0.0, 10.0, 0.0, 0.0))
    # single() at a pixel inside the top-left texel.
    assert f.single(2, 8) == C.red
    assert f.single(8, 2) == C.clear
    g = f.changecolour(lambda c: C.blue if c == C.red else c)
    assert g.single(2, 8) == C.blue
