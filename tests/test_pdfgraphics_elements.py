"""Graphic-element tree fidelity: Clip scoping, TextBlock capture,
Image/inline-image elements, and writer round-trip (parity:
pdfgraphics.ml graphic_elt, pdfgraphics.mli:132-141)."""

from coherence_tpu.io import pdf as P
from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu import transform as tr


def _first_page(pdf):
    root = pdf.resolve(pdf.trailer["Root"])
    pages = pdf.resolve(root["Pages"])
    return pdf.resolve(pages["Kids"][0])


def _graphic_of_content(content: bytes):
    pdf = P.mkpage(content)
    return PG.graphic_of_page(pdf, _first_page(pdf))


CONTENT = b"""
q
1 0 0 1 10 20 cm
0 0 100 100 re W n
1 0 0 rg 10 10 30 30 re f
BT /F1 12 Tf 2 Tr 100 700 Td (Hello (world)) Tj T* [(a) -120 (b)] TJ ET
Q
0 1 0 rg 5 5 10 10 re f
/Sec BMC 0 0 1 rg 1 1 2 2 re f EMC
q 2 0 0 2 0 0 cm BI /W 2 /H 2 /BPC 8 /CS /RGB ID \x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b EI Q
"""


def test_clip_scopes_to_matching_q():
    g = _graphic_of_content(CONTENT)
    clip = g.elements[0]
    assert isinstance(clip, PG.Clip)
    assert clip.path.winding == "nonzero"
    # The fill and the text block are inside the clip; the later fill is not.
    assert isinstance(clip.elements[0], PG.GPath)
    assert isinstance(clip.elements[1], PG.TextBlock)
    assert isinstance(g.elements[1], PG.GPath)


def test_textblock_capture():
    g = _graphic_of_content(CONTENT)
    tb = g.elements[0].elements[1]
    ops = [b[1][0] for b in tb.blocks]
    assert ops == ["Tf", "Tr", "Td", "Tj", "T*", "TJ"]
    # Text render mode in force per op (Tr 2 takes effect at the Tr op).
    modes = [b[0].textmode for b in tb.blocks]
    assert modes == [0, 2, 2, 2, 2, 2]
    # CTM at BT (inside the q ... cm).
    assert tb.transform == (1.0, 0.0, 0.0, 1.0, 10.0, 20.0)
    # String operand is unescaped.
    tj = tb.blocks[3][1][1]
    assert tj == [b"Hello (world)"]


def test_mcsection_and_inline_image():
    g = _graphic_of_content(CONTENT)
    mc = g.elements[2]
    assert isinstance(mc, PG.MCSection) and mc.name == "Sec"
    assert isinstance(mc.elements[0], PG.GPath)
    im = g.elements[3]
    assert isinstance(im, PG.GraphicInlineImage)
    assert im.dict["W"] == 2 and im.dict["H"] == 2
    assert im.data == bytes(range(12))
    assert im.transform == (2.0, 0.0, 0.0, 2.0, 0.0, 0.0)


def test_image_xobject_element():
    img = P.Stream(
        {"Subtype": P.Name("Image"), "Width": 1, "Height": 1},
        b"\x00",
    )
    pdf2 = P.mkpage(
        b"q /GS gs 3 0 0 3 7 9 cm /Im1 Do Q",
        resources={
            "XObject": {"Im1": P.Ref(9)},
            "ExtGState": {"GS": {"ca": 0.25}},
        },
    )
    pdf2.objects[9] = img
    g = PG.graphic_of_page(pdf2, _first_page(pdf2))
    el = g.elements[0]
    assert isinstance(el, PG.Image)
    assert el.objnum == 9 and el.name == "Im1"
    assert el.attributes.image_transform == (3.0, 0.0, 0.0, 3.0, 7.0, 9.0)
    assert el.attributes.image_transparency == 0.25


def test_writer_round_trip_preserves_structure():
    g = _graphic_of_content(CONTENT)
    pdf2 = PG.page_of_graphic(g)
    g2 = PG.graphic_of_page(pdf2, _first_page(pdf2))

    def skeleton(els):
        out = []
        for el in els:
            if isinstance(el, PG.Clip):
                out.append(("clip", el.path.winding, skeleton(el.elements)))
            elif isinstance(el, PG.MCSection):
                out.append(("mc", el.name, skeleton(el.elements)))
            elif isinstance(el, PG.TextBlock):
                out.append(
                    ("text", el.transform, [(b[1][0], tuple(map(repr, b[1][1]))) for b in el.blocks])
                )
            elif isinstance(el, PG.GraphicInlineImage):
                out.append(("inline", tuple(sorted(el.dict)), el.data, el.transform))
            elif isinstance(el, PG.GPath):
                out.append(("path", el.path.winding, len(el.path.subpaths)))
        return out

    assert skeleton(g.elements) == skeleton(g2.elements)


def test_transform_graphic_composes_placement_matrices():
    g = _graphic_of_content(CONTENT)
    g2 = PG.transform_graphic([tr.Translate(5.0, -3.0)], g)
    tb = g2.elements[0].elements[1]
    assert tb.transform == (1.0, 0.0, 0.0, 1.0, 15.0, 17.0)
    im = g2.elements[3]
    assert im.transform == (2.0, 0.0, 0.0, 2.0, 5.0, -3.0)


def test_writer_round_trips_binary_data_exactly():
    # latin1 encoding must invert the latin1 capture: high bytes survive.
    content = b"q 1 0 0 1 0 0 cm BI /W 2 /H 1 /BPC 8 /CS /RGB ID \x80\xff\x41\xc3\x00\x01 EI Q"
    g = _graphic_of_content(content)
    im = g.elements[0]
    assert im.data == b"\x80\xff\x41\xc3\x00\x01"
    pdf2 = PG.page_of_graphic(g)
    g2 = PG.graphic_of_page(pdf2, _first_page(pdf2))
    assert g2.elements[0].data == im.data


def test_stale_clip_does_not_survive_Q():
    # W followed by a non-n paint: the clip candidate is consumed by the
    # painting operator (PDF 8.5.4) and never resurfaces.
    g = _graphic_of_content(
        b"q 0 0 50 50 re W f Q 1 0 0 rg 1 1 2 2 re f 5 5 6 6 re n"
    )
    kinds = [type(e).__name__ for e in g.elements]
    assert "Clip" not in kinds, kinds
    assert kinds[0] == "GPath" and kinds[1] == "GPath"


def test_clip_candidate_not_resurrected_by_Q():
    # The pending clip is not part of the q/Q-saved state: after the n
    # inside q consumes it, the restoring Q must not bring it back for the
    # later bare n.
    g = _graphic_of_content(
        b"0 0 50 50 re W q n Q 5 5 6 6 re n 1 0 0 rg 1 1 2 2 re f"
    )
    kinds = [type(e).__name__ for e in g.elements]
    assert kinds.count("Clip") == 1, kinds
    assert isinstance(g.elements[-1], PG.GPath)  # fill at top level, unclipped


def test_inline_image_exact_length_with_embedded_EI():
    # Unfiltered image whose data contains ' EI ' and abuts the terminator:
    # the computed byte length must win over delimiter scanning.
    data = b"A EI \x00\xff\x80KLMN"  # 12 bytes = 2x2 RGB
    content = b"BI /W 2 /H 2 /BPC 8 /CS /RGB ID " + data + b"EI\n0 1 0 rg 5 5 10 10 re f"
    g = _graphic_of_content(content)
    im, path = g.elements[0], g.elements[1]
    assert isinstance(im, PG.GraphicInlineImage)
    assert im.data == data
    assert isinstance(path, PG.GPath)  # the fill after EI is not swallowed


def test_bdc_properties_preserved():
    g = _graphic_of_content(b"/OC << /MCID 0 >> BDC 0 0 1 rg 1 1 2 2 re f EMC")
    mc = g.elements[0]
    assert isinstance(mc, PG.MCSectionProperties)
    assert mc.name == "OC" and mc.properties == {"MCID": 0}
    assert isinstance(mc.elements[0], PG.GPath)
    # Round trip keeps the properties.
    pdf2 = PG.page_of_graphic(g)
    g2 = PG.graphic_of_page(pdf2, _first_page(pdf2))
    mc2 = g2.elements[0]
    assert isinstance(mc2, PG.MCSectionProperties)
    assert mc2.properties == {"MCID": 0}


def test_writer_copies_image_xobjects_across():
    """page_of_graphic(pdf=src) copies image XObjects into the output —
    raw bytes untouched, the dependency graph (indirect /SMask here)
    rewritten to fresh object numbers (the reference's camlpdf writer
    copies objects the same way)."""
    import zlib

    import numpy as np

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (8, 6, 3), np.uint8).tobytes()
    al = rng.integers(0, 256, (8, 6), np.uint8).tobytes()
    res = {"XObject": {"ImA": P.Ref(5)}}
    pdf = P.mkpage(b"q 60 0 0 80 10 700 cm /ImA Do Q", resources=res)
    pdf.objects[6] = P.Stream(
        {"Type": P.Name("XObject"), "Subtype": P.Name("Image"),
         "Width": 6, "Height": 8, "BitsPerComponent": 8,
         "ColorSpace": P.Name("DeviceGray"),
         "Filter": P.Name("FlateDecode")},
        zlib.compress(al),
    )
    pdf.objects[5] = P.Stream(
        {"Type": P.Name("XObject"), "Subtype": P.Name("Image"),
         "Width": 6, "Height": 8, "BitsPerComponent": 8,
         "ColorSpace": P.Name("DeviceRGB"), "SMask": P.Ref(6),
         "Filter": P.Name("FlateDecode")},
        zlib.compress(px),
    )
    g = PG.graphic_of_page(pdf, _first_page(pdf))
    assert sum(isinstance(el, PG.Image) for el in g.elements) == 1

    out = PG.page_of_graphic(g, pdf=pdf)
    data = P.pdf_to_bytes(out)
    pdf2 = P.pdf_of_bytes(data)
    g2 = PG.graphic_of_page(pdf2, _first_page(pdf2))
    imgs = [el for el in g2.elements if isinstance(el, PG.Image)]
    assert len(imgs) == 1
    st = pdf2.resolve(P.Ref(imgs[0].objnum))
    assert st.raw == zlib.compress(px)  # bytes copied untouched
    sm = pdf2.resolve(st.dict["SMask"])
    assert isinstance(sm, P.Stream) and sm.raw == zlib.compress(al)
    # placement carried through
    assert imgs[0].attributes.image_transform == (60.0, 0.0, 0.0, 80.0, 10.0, 700.0)


def test_writer_drops_images_without_source_doc():
    res = {"XObject": {"ImA": P.Ref(5)}}
    pdf = P.mkpage(b"q 10 0 0 10 0 0 cm /ImA Do Q", resources=res)
    pdf.objects[5] = P.Stream(
        {"Type": P.Name("XObject"), "Subtype": P.Name("Image"),
         "Width": 1, "Height": 1, "BitsPerComponent": 8,
         "ColorSpace": P.Name("DeviceGray")},
        b"\x80",
    )
    g = PG.graphic_of_page(pdf, _first_page(pdf))
    out = PG.page_of_graphic(g)  # no pdf= -> image dropped, no crash
    g2 = PG.graphic_of_page(out, _first_page(out))
    assert not any(isinstance(el, PG.Image) for el in g2.elements)
