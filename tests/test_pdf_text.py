"""PDF text paints for real — BEYOND REFERENCE: the reference captures
BT..ET runs (pdfgraphics.mli:134) but scene_of_graphic drops them
(render.ml:1524-1565); here glyph outlines from embedded TrueType programs
(io/truetype.py) — or installed DejaVu fallbacks for non-embedded faces —
render through the exact AA rasterizer (scene/pdftext.py)."""

import os
import zlib

import numpy as np
import pytest

from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io import truetype as TT
from coherence_tpu.io.pdf import Name, Stream, mkpage
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, pdfscene, render as R

DEJAVU = TT.fallback_font_path("Helvetica")
needs_font = pytest.mark.skipif(DEJAVU is None, reason="no DejaVu installed")


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
    return scene, spr


def _mask_of(spr, box):
    x0, y0, x1, y1 = box
    out = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
    if spr is None:
        return out
    sx0, sy0, sx1, sy1 = spr.box
    m = np.asarray(spr.mask)
    for yy in range(max(y0, sy0), min(y1, sy1) + 1):
        for xx in range(max(x0, sx0), min(x1, sx1) + 1):
            out[yy - y0, xx - x0] = m[yy - sy0, xx - sx0]
    return out


# --- truetype parser ----------------------------------------------------------


@needs_font
def test_truetype_parses_glyphs_and_metrics():
    f = TT.TrueTypeFont(open(DEJAVU, "rb").read())
    assert f.units_per_em == 2048 and f.num_glyphs > 1000
    gid = f.gid_of_unicode(ord("A"))
    assert gid > 0
    loops = f.glyph_segments(gid)
    assert len(loops) == 2  # outer triangle + counter
    assert f.advance(gid) > 0
    # Composite glyph (é) resolves its components.
    ge = f.gid_of_unicode(ord("é"))
    assert ge > 0 and len(f.glyph_segments(ge)) >= 3
    # Space has no outline but a real advance.
    sp = f.gid_of_unicode(32)
    assert f.glyph_segments(sp) == [] and f.advance(sp) > 0


@needs_font
def test_truetype_quadratics_become_exact_cubics():
    from coherence_tpu.geometry.path import Bezier

    f = TT.TrueTypeFont(open(DEJAVU, "rb").read())
    loops = f.glyph_segments(f.gid_of_unicode(ord("o")))
    beziers = [s for loop in loops for s in loop if isinstance(s, Bezier)]
    assert beziers, "round glyph should contain curves"
    for b in beziers[:8]:
        # Control points sit at exact 1/3 blends only if derived from a
        # quadratic: reconstruct q from c1 and from c2; they must agree.
        q1 = tuple(b.p1[i] + 1.5 * (b.p2[i] - b.p1[i]) for i in range(2))
        q2 = tuple(b.p4[i] + 1.5 * (b.p3[i] - b.p4[i]) for i in range(2))
        assert abs(q1[0] - q2[0]) < 1e-6 and abs(q1[1] - q2[1]) < 1e-6


# --- layout + rendering -------------------------------------------------------


@needs_font
def test_fallback_text_renders_and_advances():
    content = b"BT /F1 48 Tf 10 30 Td 1 0 0 rg (Hi) Tj ET"
    resources = {"Font": {"F1": {"Type": Name("Font"), "Subtype": Name("Type1"),
                                 "BaseFont": Name("Helvetica")}}}
    pdf = mkpage(content, mediabox=(0, 0, 200, 100), resources=resources)
    scene, spr = _render(pdf, (1, 1, 200, 100))
    assert len(scene) == 1 and spr is not None
    r4 = np.asarray(spr.rgba)
    m = np.asarray(spr.mask)
    assert int(m.sum()) > 300
    assert int(((r4[..., 0] > 200) & m).sum()) > 300  # painted red
    # Ascenders of a 48pt line from baseline y=30 stay under y=80.
    assert spr.box[1] >= 25 and spr.box[3] <= 80
    # 'H' and 'i' are disjoint: a vertical gap column exists inside the box.
    cols = _mask_of(spr, (spr.box[0], spr.box[1], spr.box[2], spr.box[3]))
    empty_cols = (~cols.any(axis=0)).sum()
    assert empty_cols >= 1


@needs_font
def test_embedded_truetype_simple_font_with_widths():
    data = open(DEJAVU, "rb").read()
    ff = Stream({"Filter": Name("FlateDecode"), "Length1": len(data)},
                zlib.compress(data))
    fd = {
        "Type": Name("Font"), "Subtype": Name("TrueType"),
        "BaseFont": Name("AAAAAA+DejaVuSans"),
        "FirstChar": 65, "Widths": [500, 500],  # A, B narrow on purpose
        "FontDescriptor": {"Type": Name("FontDescriptor"), "FontFile2": ff},
    }
    content = b"BT /F1 40 Tf 10 30 Td (AB) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 200, 100),
                 resources={"Font": {"F1": fd}})
    scene, spr = _render(pdf, (1, 1, 200, 100))
    assert spr is not None
    # /Widths 500/1000 * 40pt = 20pt advance: B starts at x=30.  DejaVu's
    # own 'A' advance would be ~27pt; assert the /Widths one took effect by
    # checking the total extent stays under 10 + 20 + width('B' glyph).
    assert spr.box[0] >= 10 and spr.box[2] <= 62, spr.box


@needs_font
def test_type0_identity_h_renders():
    data = open(DEJAVU, "rb").read()
    f = TT.TrueTypeFont(data)
    gA = f.gid_of_unicode(ord("A"))
    ff = Stream({"Filter": Name("FlateDecode"), "Length1": len(data)},
                zlib.compress(data))
    font = {
        "Type": Name("Font"), "Subtype": Name("Type0"),
        "BaseFont": Name("DejaVuSans"), "Encoding": Name("Identity-H"),
        "DescendantFonts": [{
            "Type": Name("Font"), "Subtype": Name("CIDFontType2"),
            "BaseFont": Name("DejaVuSans"), "DW": 1000,
            "W": [gA, [700]],
            "CIDSystemInfo": {"Registry": b"Adobe", "Ordering": b"Identity"},
            "FontDescriptor": {"Type": Name("FontDescriptor"), "FontFile2": ff},
        }],
    }
    code = bytes([gA >> 8, gA & 255])
    content = b"BT /F1 50 Tf 20 20 Td <" + code.hex().encode() + b"> Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 120, 100),
                 resources={"Font": {"F1": font}})
    scene, spr = _render(pdf, (1, 1, 120, 100))
    assert spr is not None and len(scene) == 1
    m = np.asarray(spr.mask)
    assert int(m.sum()) > 200  # the A painted
    # Interior counter of 'A' is a hole (nonzero winding worked): the
    # mid-height row has >= 2 runs.
    midrow = m[m.shape[0] // 3]
    runs = np.diff(midrow.astype(int)).clip(0).sum()
    assert runs >= 2, "expected two strokes of the A at 1/3 height"


@needs_font
def test_tj_kerning_and_multiline():
    resources = {"Font": {"F1": {"Type": Name("Font"), "Subtype": Name("Type1"),
                                 "BaseFont": Name("Helvetica")}}}
    # Two lines via TL/T*; TJ applies a -2000/1000*size shift between (x)(x).
    content = (b"BT /F1 20 Tf 14 TL 10 60 Td"
               b" [(x) -2000 (x)] TJ T* (x) Tj ET")
    pdf = mkpage(content, mediabox=(0, 0, 200, 100), resources=resources)
    scene, spr = _render(pdf, (1, 1, 200, 100))
    assert spr is not None
    m = _mask_of(spr, (1, 1, 200, 100))
    ys, xs = np.nonzero(m)
    # Kern of -2000 moves the second x right by 40pt beyond the first's
    # ~11pt advance: two clusters around x~12 and x~62.
    first = xs[xs < 40]
    second = xs[(xs > 45) & (xs < 90)]
    assert len(first) and len(second), (xs.min(), xs.max())
    # Second line 14pt below the first (T* with TL=14).
    rows = np.unique(ys)
    assert rows.max() - rows.min() <= 40
    top_line = m[:, :40].any(axis=1)
    both = np.nonzero(top_line)[0]
    assert both.size and both.max() - both.min() >= 15  # two baselines


@needs_font
def test_text_render_mode_3_invisible_but_advances():
    resources = {"Font": {"F1": {"Type": Name("Font"), "Subtype": Name("Type1"),
                                 "BaseFont": Name("Helvetica")}}}
    content = b"BT /F1 30 Tf 10 40 Td 3 Tr (A) Tj 0 Tr (B) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 120, 100), resources=resources)
    scene, spr = _render(pdf, (1, 1, 120, 100))
    assert spr is not None and len(scene) == 1  # only the B painted
    # The B begins after the invisible A's advance (~20pt at 30pt size).
    assert spr.box[0] >= 26, spr.box


@needs_font
def test_cff_fontfile3_falls_back_not_crashes():
    fd = {
        "Type": Name("Font"), "Subtype": Name("Type1"),
        "BaseFont": Name("Times-Roman"),
        "FontDescriptor": {
            "Type": Name("FontDescriptor"),
            # Garbage CFF program: parser must reject, layout must fall back.
            "FontFile3": Stream({"Subtype": Name("Type1C")}, b"\x01\x00\x04\x01"),
        },
    }
    content = b"BT /F1 24 Tf 10 30 Td (ok) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 100, 60),
                 resources={"Font": {"F1": fd}})
    scene, spr = _render(pdf, (1, 1, 100, 60))
    assert spr is not None and int(np.asarray(spr.mask).sum()) > 50


# --- CFF / Type2 charstrings ---------------------------------------------------

OTF = "/opt/venv/lib/python3.12/site-packages/pygame/tests/fixtures/fonts/PyGameMono.otf"
needs_otf = pytest.mark.skipif(not os.path.exists(OTF), reason="no OTF fixture")


@needs_otf
def test_otto_cff_outlines_parse():
    from coherence_tpu.io.truetype import TrueTypeFont

    f = TrueTypeFont(open(OTF, "rb").read())
    assert f.cff is not None and f.units_per_em == 1000
    gB = f.gid_of_unicode(ord("B"))
    loops = f.glyph_segments(gB)
    assert len(loops) == 3  # B outline + two counters
    assert f.advance(gB) == 1000  # mono face
    # charset name lookup on the bare CFF
    assert f.cff.gid_of_name("A") == f.gid_of_unicode(ord("A"))


@needs_otf
def test_embedded_bare_cff_fontfile3_renders():
    """FontFile3 carrying bare CFF: outlines come from the Type2
    interpreter, code->gid via the charset glyph names."""
    from coherence_tpu.io.truetype import TrueTypeFont

    data = open(OTF, "rb").read()
    f = TrueTypeFont(data)
    off, ln = f.tables[b"CFF "]
    cff_bytes = data[off : off + ln]
    ff = Stream({"Subtype": Name("Type1C"), "Filter": Name("FlateDecode")},
                zlib.compress(cff_bytes))
    fd = {
        "Type": Name("Font"), "Subtype": Name("Type1"),
        "BaseFont": Name("PyGameMono"),
        "FontDescriptor": {"Type": Name("FontDescriptor"), "FontFile3": ff},
    }
    content = b"BT /F1 40 Tf 10 30 Td (AB) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 200, 100),
                 resources={"Font": {"F1": fd}})
    scene, spr = _render(pdf, (1, 1, 200, 100))
    assert spr is not None and len(scene) == 1
    m = np.asarray(spr.mask)
    assert int(m.sum()) > 400
    # Mono advances: 'B' starts 40pt after 'A' at size 40 (width 1000/1000);
    # the AA softness bleeds ~1px beyond the pen origin.
    assert spr.box[0] >= 8 and spr.box[2] >= 60, spr.box


def test_type2_charstring_interpreter_handcrafted():
    """A crafted charstring: width + rmoveto/hlineto box with a hintmask —
    checks width extraction, alternating linetos, and hintmask skipping."""
    from coherence_tpu.io.cff import CFFFont, _bias
    import struct as _s

    def num(v):
        assert -107 <= v <= 107
        return bytes([v + 139])

    # charstring: width 550, box via rmoveto + alternating h/vlineto,
    # endchar (contour auto-closes).
    cs = (
        b"\x1c" + _s.pack(">h", 550)       # width
        + num(100) + num(100) + b"\x15"    # rmoveto
        + num(80) + b"\x06"                # hlineto (x += 80)
        + num(60) + b"\x07"                # vlineto (y += 60)
        + b"\x1c" + _s.pack(">h", -80) + b"\x06"  # hlineto back
        + b"\x0e"                          # endchar
    )
    font = _mk_min_cff([b"\x0e", cs])      # gid 0 = .notdef, gid 1 = box
    f = CFFFont(font)
    assert f.num_glyphs == 2
    loops = f.glyph_segments(1)
    assert len(loops) == 1
    from coherence_tpu.geometry.path import Straight

    segs = loops[0]
    assert all(isinstance(s, Straight) for s in segs)
    pts = [s.a for s in segs] + [segs[-1].b]
    assert (100.0, 100.0) in pts and (180.0, 100.0) in pts
    assert (180.0, 160.0) in pts and (100.0, 160.0) in pts
    assert f.advance(1) == 550.0


def _mk_min_cff(charstrings):
    """Minimal single-font CFF container around the given charstrings."""
    import struct as _s

    def index(items):
        if not items:
            return b"\x00\x00"
        offs = [1]
        for it in items:
            offs.append(offs[-1] + len(it))
        osz = 1 if offs[-1] < 256 else 2
        fmt = ">B" if osz == 1 else ">H"
        out = _s.pack(">HB", len(items), osz)
        for o in offs:
            out += _s.pack(fmt, o)
        return out + b"".join(items)

    header = b"\x01\x00\x04\x01"
    name_idx = index([b"Mini"])
    string_idx = index([])
    gsubr_idx = index([])
    private = b""  # empty private dict
    # Top DICT needs CharStrings (op 17) and Private (op 18) offsets; build
    # with placeholders then patch (two passes with fixed 5-byte ints).
    def int5(v):
        return b"\x1d" + _s.pack(">i", v)

    for _ in range(2):
        top = int5(0) + b"\x11"  # CharStrings placeholder
        top = int5(len(private)) + int5(0) + b"\x12" + top  # Private
        top_idx = index([top])
        base = len(header) + len(name_idx) + len(top_idx) + len(string_idx) + len(gsubr_idx)
        priv_off = base
        cs_off = base + len(private)
        top = int5(len(private)) + int5(priv_off) + b"\x12" + int5(cs_off) + b"\x11"
        top_idx = index([top])
        base2 = len(header) + len(name_idx) + len(top_idx) + len(string_idx) + len(gsubr_idx)
        if base2 == base:
            break
    return header + name_idx + top_idx + string_idx + gsubr_idx + private + index(charstrings)


# --- review-fix regressions ----------------------------------------------------


@needs_font
def test_page_level_tf_and_sticky_state_across_blocks():
    """Text-state ops are legal OUTSIDE BT..ET and persist across blocks
    (PDF 9.3.1): /F1 set at page level must reach the first block, and the
    second block inherits it too."""
    resources = {"Font": {"F1": {"Type": Name("Font"), "Subtype": Name("Type1"),
                                 "BaseFont": Name("Helvetica")}}}
    content = (b"/F1 30 Tf "
               b"BT 10 60 Td (A) Tj ET "
               b"BT 10 20 Td (B) Tj ET")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100), resources=resources)
    scene, spr = _render(pdf, (1, 1, 100, 100))
    assert len(scene) == 2 and spr is not None
    m = _mask_of(spr, (1, 1, 100, 100))
    rows = np.nonzero(m.any(axis=1))[0]
    assert rows.max() - rows.min() > 30  # both lines painted


@needs_font
def test_encoding_differences_remaps_codes():
    """/Encoding /Differences: code 65 shows 'zero', not 'A'."""
    resources = {"Font": {"F1": {
        "Type": Name("Font"), "Subtype": Name("Type1"),
        "BaseFont": Name("Helvetica"),
        "Encoding": {"Type": Name("Encoding"),
                     "Differences": [65, Name("zero")]},
    }}}
    content = b"BT /F1 40 Tf 10 30 Td (A) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 100, 100), resources=resources)
    scene, spr = _render(pdf, (1, 1, 100, 100))
    assert spr is not None
    # Same show without Differences paints the 'A'; with them it must be
    # the 'zero' glyph — different mask.
    plain = {"Font": {"F1": {"Type": Name("Font"), "Subtype": Name("Type1"),
                             "BaseFont": Name("Helvetica")}}}
    pdf2 = mkpage(content, mediabox=(0, 0, 100, 100), resources=plain)
    _, spr2 = _render(pdf2, (1, 1, 100, 100))
    assert spr2 is not None
    zero_m = _mask_of(spr, (1, 1, 100, 100))
    a_m = _mask_of(spr2, (1, 1, 100, 100))
    assert zero_m.any() and a_m.any()
    assert (zero_m != a_m).any(), "Differences had no effect"
    # And it really is the zero: render '0' directly and compare exactly.
    pdf3 = mkpage(b"BT /F1 40 Tf 10 30 Td (0) Tj ET",
                  mediabox=(0, 0, 100, 100), resources=plain)
    _, spr3 = _render(pdf3, (1, 1, 100, 100))
    assert (zero_m == _mask_of(spr3, (1, 1, 100, 100))).all()


@needs_font
def test_text_fill_alpha_from_extgstate():
    """/ca from ExtGState makes text translucent (like the image path)."""
    resources = {
        "Font": {"F1": {"Type": Name("Font"), "Subtype": Name("Type1"),
                        "BaseFont": Name("Helvetica")}},
        "ExtGState": {"GS0": {"Type": Name("ExtGState"), "ca": 0.25}},
    }
    content = b"/GS0 gs BT /F1 60 Tf 10 25 Td 1 0 0 rg (H) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 100, 100), resources=resources)
    scene, spr = _render(pdf, (1, 1, 100, 100))
    assert spr is not None
    r4 = np.asarray(spr.rgba)
    m = np.asarray(spr.mask)
    amax = int(r4[..., 3][m].max())
    assert amax <= 70, f"alpha {amax}: /ca 0.25 not applied"


def test_flex1_vertical_endpoint_snaps_to_start_x():
    """Type2 flex1 with |dy| > |dx| ends at the pre-flex x (spec), not at
    x5 — a drifted endpoint would slash the glyph on contour close."""
    from coherence_tpu.io.cff import CFFFont
    import struct as _s

    def num(v):
        assert -107 <= v <= 107
        return bytes([v + 139])

    # rmoveto to (0,0); flex1 args: dx1..dy5 sum to dx=10 (< dy=100), d6=5.
    cs = (
        num(0) + num(0) + b"\x15"  # rmoveto
        + num(2) + num(20) + num(2) + num(20) + num(2) + num(20)
        + num(2) + num(20) + num(2) + num(20) + num(5)
        + b"\x0c\x25"              # flex1
        + b"\x0e"                  # endchar
    )
    f = CFFFont(_mk_min_cff([b"\x0e", cs]))
    loops = f.glyph_segments(1)
    assert loops, "flex1 contour missing"
    last = loops[0][-1]
    # The final segment ends where the contour closes; the flex1 endpoint
    # must be x == 0 (start x), y == 100 + 5.
    from coherence_tpu.geometry.path import Bezier

    bez = [s for s in loops[0] if isinstance(s, Bezier)]
    assert bez, "flex1 must emit curves"
    end = bez[-1].p4
    assert end[0] == 0.0 and end[1] == 105.0, end


def test_inline_image_named_colourspace_resolves():
    """BI /CS /Cs1 referencing the page /ColorSpace dict: the Indexed
    array is inlined at capture so decoding sees real indexed samples."""
    lookup = bytes([255, 0, 0, 0, 0, 255])  # 0=red 1=blue
    resources = {
        "ColorSpace": {"Cs1": [Name("Indexed"), Name("DeviceRGB"), 1, lookup]}
    }
    content = (b"q 16 0 0 16 0 0 cm BI /W 2 /H 1 /BPC 8 /CS /Cs1 "
               b"ID \x00\x01 EI Q")
    pdf = mkpage(content, mediabox=(0, 0, 16, 16), resources=resources)
    scene, spr = _render(pdf, (1, 1, 16, 16))
    assert spr is not None
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    left = r4[8 - y0, 4 - x0]
    right = r4[8 - y0, 12 - x0]
    assert tuple(left) == (255, 0, 0, 255), left
    assert tuple(right) == (0, 0, 255, 255), right


def test_type0_identity_v_stacks_vertically():
    """Identity-V (WMode 1): glyphs advance downward by DW2/W2, the
    position vector centres each glyph on the vertical baseline
    (PDF 9.7.4.3; BEYOND REFERENCE — the reference never rasterizes
    fonts)."""
    data = open(DEJAVU, "rb").read()
    f = TT.TrueTypeFont(data)
    gH = f.gid_of_unicode(ord("H"))
    ff = Stream({"Filter": Name("FlateDecode"), "Length1": len(data)},
                zlib.compress(data))
    font = {
        "Type": Name("Font"), "Subtype": Name("Type0"),
        "BaseFont": Name("DejaVuSans"), "Encoding": Name("Identity-V"),
        "DescendantFonts": [{
            "Type": Name("Font"), "Subtype": Name("CIDFontType2"),
            "BaseFont": Name("DejaVuSans"), "DW": 1000,
            "DW2": [880, -1000],
            "CIDSystemInfo": {"Registry": b"Adobe", "Ordering": b"Identity"},
            "FontDescriptor": {"Type": Name("FontDescriptor"), "FontFile2": ff},
        }],
    }
    code = bytes([gH >> 8, gH & 255]) * 2  # "HH"
    content = b"BT /F1 30 Tf 60 160 Td <" + code.hex().encode() + b"> Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 120, 200),
                 resources={"Font": {"F1": font}})
    scene, spr = _render(pdf, (1, 1, 120, 200))
    assert spr is not None
    m = np.asarray(spr.mask)
    ys, xs = np.nonzero(m)
    ys = ys + spr.box[1]
    xs = xs + spr.box[0]
    # two glyph clusters stacked in y, none in x
    yspan = ys.max() - ys.min()
    xspan = xs.max() - xs.min()
    assert yspan > 40, (yspan, "second glyph placed a full em below")
    assert xspan < 30, (xspan, "no horizontal advance in vertical mode")
    # row histogram shows a gap between the two glyphs
    rows = np.zeros(201, dtype=int)
    for y in ys:
        rows[y] += 1
    nz = np.nonzero(rows)[0]
    gaps = (np.diff(nz) > 3).sum()
    assert gaps >= 1, "two vertically separated glyphs"


def test_type0_w2_overrides_vertical_advance():
    data = open(DEJAVU, "rb").read()
    f = TT.TrueTypeFont(data)
    gH = f.gid_of_unicode(ord("H"))
    ff = Stream({"Filter": Name("FlateDecode"), "Length1": len(data)},
                zlib.compress(data))

    def make(w2):
        child = {
            "Type": Name("Font"), "Subtype": Name("CIDFontType2"),
            "BaseFont": Name("DejaVuSans"), "DW": 1000,
            "CIDSystemInfo": {"Registry": b"Adobe", "Ordering": b"Identity"},
            "FontDescriptor": {"Type": Name("FontDescriptor"),
                               "FontFile2": ff},
        }
        if w2 is not None:
            child["W2"] = w2
        font = {
            "Type": Name("Font"), "Subtype": Name("Type0"),
            "BaseFont": Name("DejaVuSans"), "Encoding": Name("Identity-V"),
            "DescendantFonts": [child],
        }
        code = bytes([gH >> 8, gH & 255]) * 2
        content = (b"BT /F1 30 Tf 60 160 Td <" + code.hex().encode()
                   + b"> Tj ET")
        pdf = mkpage(content, mediabox=(0, 0, 120, 200),
                     resources={"Font": {"F1": font}})
        _, spr = _render(pdf, (1, 1, 120, 200))
        ys = np.nonzero(np.asarray(spr.mask))[0] + spr.box[1]
        return ys.max() - ys.min()

    # halving the vertical displacement tightens the stack
    tight = make([gH, [-500, 300, 880]])
    loose = make(None)  # DW2 default -1000
    assert tight < loose - 8, (tight, loose)


def test_parse_embedded_cmap():
    from coherence_tpu.io import cmap as CM

    src = b"""%!PS-Adobe-3.0 Resource-CMap
/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/Identity-H usecmap
/CMapName /Custom-V def
/WMode 1 def
2 begincodespacerange
<00> <7F>
<8140> <9FFC>
endcodespacerange
2 begincidrange
<20> <7E> 1
<8140> <817E> 633
endcidrange
1 begincidchar
<8230> 1000
endcidchar
endcmap
CMapName currentdict /CMap defineresource pop
end end"""
    cm = CM.parse_cmap(src)
    assert cm.wmode == 1
    assert cm.base is CM.IDENTITY_H
    # 1-byte space, 2-byte kanji range
    assert cm.split(b"\x20\x81\x41\x7e") == [(1, 0x20), (2, 0x8141), (1, 0x7E)]
    assert cm.cid(1, 0x20) == 1
    assert cm.cid(1, 0x7E) == 95
    assert cm.cid(2, 0x8141) == 634
    assert cm.cid(2, 0x8230) == 1000
    # unmapped codes fall through to the usecmap base
    assert cm.cid(2, 0xBEEF) == 0xBEEF


def test_type0_embedded_cmap_renders_single_byte_codes():
    """An embedded CMap with a 1-byte codespace maps latin bytes to CIDs;
    the glyph paints identically to the Identity-H 2-byte form."""
    data = open(DEJAVU, "rb").read()
    f = TT.TrueTypeFont(data)
    gA = f.gid_of_unicode(ord("A"))
    ff = Stream({"Filter": Name("FlateDecode"), "Length1": len(data)},
                zlib.compress(data))
    cmap_src = ("""/CIDInit /ProcSet findresource begin
begincmap
/WMode 0 def
1 begincodespacerange
<00> <FF>
endcodespacerange
1 begincidchar
<41> %d
endcidchar
endcmap end""" % gA).encode()
    child = {
        "Type": Name("Font"), "Subtype": Name("CIDFontType2"),
        "BaseFont": Name("DejaVuSans"), "DW": 700,
        "CIDSystemInfo": {"Registry": b"Adobe", "Ordering": b"Identity"},
        "FontDescriptor": {"Type": Name("FontDescriptor"), "FontFile2": ff},
    }
    font = {
        "Type": Name("Font"), "Subtype": Name("Type0"),
        "BaseFont": Name("DejaVuSans"),
        "Encoding": Stream({}, cmap_src),
        "DescendantFonts": [child],
    }
    content = b"BT /F1 50 Tf 20 20 Td (A) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 120, 100),
                 resources={"Font": {"F1": font}})
    scene, spr = _render(pdf, (1, 1, 120, 100))
    assert spr is not None and len(scene) == 1
    m = np.asarray(spr.mask)
    assert int(m.sum()) > 200
    midrow = m[m.shape[0] // 3]
    runs = np.diff(midrow.astype(int)).clip(0).sum()
    assert runs >= 2, "two strokes of the A"
