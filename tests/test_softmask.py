"""ExtGState /SMask soft masks (PDF 11.6.5) — BEYOND REFERENCE: the
reference ignores gstate soft masks; here the /G group renders through
the normal pipeline into a MaskedFill modulating the paint's alpha."""

import numpy as np

from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, Stream, mkpage
from coherence_tpu.raster import fills as rfills, region
from coherence_tpu.scene import cache, pdfscene, render as R


def _page_dict(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def _smask_gs(group_content, bbox, s="Luminosity"):
    group = Stream(
        {
            "Type": Name("XObject"),
            "Subtype": Name("Form"),
            "BBox": list(bbox),
            "Group": {"Type": Name("Group"), "S": Name("Transparency")},
            "Resources": {},
        },
        group_content,
    )
    return {"Type": Name("ExtGState"),
            "SMask": {"Type": Name("Mask"), "S": Name(s), "G": group}}


def _render(pdf, box=(1, 1, 100, 100)):
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert scene
    spr = R.render_simple_scene(list(reversed(scene)), region.shape_of_box(box))
    assert spr is not None
    return spr


def _at(spr, x, y):
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    iy, ix = y - y0, x - x0
    if 0 <= iy < r4.shape[0] and 0 <= ix < r4.shape[1]:
        return r4[iy, ix]
    return np.zeros(4, np.int64)


def test_luminosity_mask_gates_fill():
    cache.clear()
    # Mask group: white square over the left half only -> paint shows on
    # the left, is masked out (luminosity 0) on the right.
    gs = _smask_gs(b"1 1 1 rg 0 0 50 100 re f", (0, 0, 100, 100))
    content = b"/GS0 gs 1 0 0 rg 10 10 80 80 re f"
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"ExtGState": {"GS0": gs}})
    spr = _render(pdf)
    left = _at(spr, 30, 50)
    right = _at(spr, 70, 50)
    assert left[3] > 200 and left[0] > 200, left
    assert right[3] < 30, right
    cache.clear()


def test_luminosity_gray_is_partial():
    cache.clear()
    # 50% gray mask -> roughly half alpha.
    gs = _smask_gs(b"0.5 g 0 0 100 100 re f", (0, 0, 100, 100))
    content = b"/GS0 gs 0 0 1 rg 10 10 80 80 re f"
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"ExtGState": {"GS0": gs}})
    spr = _render(pdf)
    px = _at(spr, 50, 50)
    assert 90 < px[3] < 160, px
    cache.clear()


def test_smask_none_paints_everything():
    cache.clear()
    gs0 = _smask_gs(b"1 1 1 rg 0 0 50 100 re f", (0, 0, 100, 100))
    content = b"/GS0 gs /GSN gs 1 0 0 rg 10 10 80 80 re f"
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"ExtGState": {
                     "GS0": gs0,
                     "GSN": {"Type": Name("ExtGState"), "SMask": Name("None")},
                 }})
    spr = _render(pdf)
    assert _at(spr, 70, 50)[3] > 200  # right half paints: mask cleared
    cache.clear()


def test_alpha_kind_uses_coverage():
    cache.clear()
    # Alpha mask: a BLACK square still has coverage 1 -> paint shows where
    # the group painted, regardless of its colour.
    gs = _smask_gs(b"0 0 0 rg 0 0 50 100 re f", (0, 0, 100, 100), s="Alpha")
    content = b"/GS0 gs 1 0 0 rg 10 10 80 80 re f"
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"ExtGState": {"GS0": gs}})
    spr = _render(pdf)
    assert _at(spr, 30, 50)[3] > 200
    assert _at(spr, 70, 50)[3] < 30
    cache.clear()


def test_maskedfill_transform_tracks_flip():
    # The openfile flip transform must move the mask with the fill.
    base = rfills.plain(0x7FFFFFFF & 0)  # black
    import coherence_tpu.colour as C
    import coherence_tpu.transform as tr

    base = rfills.plain(C.red)
    mask = np.zeros((10, 10), dtype=np.int64)
    mask[:, :5] = 255  # left half in mask space
    mf = rfills.MaskedFill(base, mask, (10.0, 0.0, 0.0, 10.0, 0.0, 0.0))
    img = mf.image((0, 0, 9, 9), 10, 10)
    assert img[5, 2, 3] > 200 and img[5, 7, 3] == 0
    flipped = mf.transform([tr.Scale((5.0, 0.0), -1.0, 1.0)])  # mirror x about 5
    img2 = flipped.image((0, 0, 9, 9), 10, 10)
    assert img2[5, 7, 3] > 200 and img2[5, 2, 3] == 0
