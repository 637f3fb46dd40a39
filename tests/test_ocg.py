"""Optional content groups (PDF 8.11) — BEYOND REFERENCE: camlpdf has no
optional-content logic.  Content gated by BDC /OC sections, XObject /OC
entries, and annotation /OC entries is dropped when its group is OFF in
the document's default configuration (/OCProperties /D)."""

import zlib

import numpy as np
import pytest

from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, Ref, Stream, mkpage
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, pdfscene, render as R


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def _with_ocgs(pdf, groups, on=(), off=(), base=None, ocmds=None):
    """Add OCG objects named in `groups` (name -> object number) and the
    default-config /OCProperties; returns {name: Ref}."""
    num = 10
    refs = {}
    for g in groups:
        pdf.objects[num] = {"Type": Name("OCG"), "Name": g}
        refs[g] = Ref(num)
        num += 1
    if ocmds:
        for name, (members, p) in ocmds.items():
            pdf.objects[num] = {
                "Type": Name("OCMD"),
                "OCGs": [refs[m] for m in members],
                "P": Name(p),
            }
            refs[name] = Ref(num)
            num += 1
    d = {}
    if base is not None:
        d["BaseState"] = Name(base)
    if on:
        d["ON"] = [refs[g] for g in on]
    if off:
        d["OFF"] = [refs[g] for g in off]
    pdf.objects[1]["OCProperties"] = {
        "OCGs": [refs[g] for g in groups], "D": d,
    }
    return refs


def _page_dict(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def _render(pdf, box=(1, 1, 100, 100)):
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    spr = R.render_simple_scene(list(reversed(scene)), region.shape_of_box(box))
    return g, spr


def _covered(spr, x, y):
    if spr is None:
        return False
    x0, y0, _, _ = spr.box
    m = np.asarray(spr.mask)
    iy, ix = y - y0, x - x0
    return bool(m[iy, ix]) if 0 <= iy < m.shape[0] and 0 <= ix < m.shape[1] else False


CONTENT = (b"/OC /L0 BDC 1 0 0 rg 0 0 40 40 re f EMC "
           b"/OC /L1 BDC 0 0 1 rg 60 60 40 40 re f EMC")


def _two_layer_pdf(**cfg):
    pdf = mkpage(CONTENT, mediabox=(0, 0, 100, 100),
                 resources={"Properties": {}})
    refs = _with_ocgs(pdf, ["g0", "g1"], **cfg)
    pdf.objects[3]["Resources"]["Properties"] = {"L0": refs["g0"], "L1": refs["g1"]}
    return pdf


def test_off_group_content_dropped():
    pdf = _two_layer_pdf(off=["g0"])
    g, spr = _render(pdf)
    assert not _covered(spr, 20, 20), "OFF layer must not paint"
    assert _covered(spr, 80, 80), "default-ON layer paints"


def test_no_ocproperties_everything_paints():
    pdf = mkpage(CONTENT, mediabox=(0, 0, 100, 100),
                 resources={"Properties": {}})
    # Groups referenced but no /OCProperties: all visible.
    refs = {"L0": Ref(10), "L1": Ref(11)}
    pdf.objects[10] = {"Type": Name("OCG"), "Name": "g0"}
    pdf.objects[11] = {"Type": Name("OCG"), "Name": "g1"}
    pdf.objects[3]["Resources"]["Properties"] = refs
    _, spr = _render(pdf)
    assert _covered(spr, 20, 20) and _covered(spr, 80, 80)


def test_basestate_off_with_on_list():
    pdf = _two_layer_pdf(base="OFF", on=["g1"])
    _, spr = _render(pdf)
    assert not _covered(spr, 20, 20)
    assert _covered(spr, 80, 80)


def test_ocmd_policies():
    content = (b"/OC /M0 BDC 1 0 0 rg 0 0 40 40 re f EMC "
               b"/OC /M1 BDC 0 0 1 rg 60 60 40 40 re f EMC")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"Properties": {}})
    refs = _with_ocgs(
        pdf, ["g0", "g1"], off=["g0"],
        ocmds={"m_allon": (["g0", "g1"], "AllOn"),
               "m_anyon": (["g0", "g1"], "AnyOn")},
    )
    pdf.objects[3]["Resources"]["Properties"] = {
        "M0": refs["m_allon"], "M1": refs["m_anyon"],
    }
    _, spr = _render(pdf)
    assert not _covered(spr, 20, 20), "AllOn with one OFF member hides"
    assert _covered(spr, 80, 80), "AnyOn with one ON member shows"


def test_xobject_oc_gates_image():
    raw = zlib.compress(bytes([0, 200, 0] * 4))
    img = Stream(
        {"Type": Name("XObject"), "Subtype": Name("Image"),
         "Width": 2, "Height": 2, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceRGB"), "Filter": Name("FlateDecode"),
         "OC": None},  # patched below
        raw,
    )
    pdf = mkpage(b"q 40 0 0 40 10 10 cm /Im0 Do Q",
                 mediabox=(0, 0, 100, 100),
                 resources={"XObject": {"Im0": img}})
    refs = _with_ocgs(pdf, ["g0"], off=["g0"])
    img.dict["OC"] = refs["g0"]
    g, spr = _render(pdf)
    assert not any(isinstance(el, PG.Image) for el in g.elements)
    assert spr is None or not _covered(spr, 30, 30)


def test_annotation_oc_skipped():
    ap = Stream(
        {"Type": Name("XObject"), "Subtype": Name("Form"),
         "BBox": [0, 0, 10, 10]},
        b"1 0 0 rg 0 0 10 10 re f",
    )
    pdf = mkpage(b"", mediabox=(0, 0, 100, 100))
    refs = _with_ocgs(pdf, ["g0"], off=["g0"])
    pdf.objects[3]["Annots"] = [
        {"Subtype": Name("Square"), "Rect": [10, 10, 30, 30],
         "AP": {"N": ap}, "OC": refs["g0"]}
    ]
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    assert not g.elements, "annotation with OFF group must not paint"
