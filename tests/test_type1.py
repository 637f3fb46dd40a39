"""Type 1 font programs (io/type1.py) — synthetic eexec-encrypted fonts
exercising PFB/PFA framing, Subrs, charstring ops, seac, builtin encoding,
and a full PDF text render.  BEYOND REFERENCE: the reference never
rasterizes fonts."""

import struct

import numpy as np

from coherence_tpu.io.type1 import STANDARD_ENCODING, Type1Font
from coherence_tpu.geometry.path import Bezier, Straight


def _encrypt(plain: bytes, r: int) -> bytes:
    out = bytearray()
    for p in plain:
        c = p ^ (r >> 8)
        out.append(c)
        r = ((c + r) * 52845 + 22719) & 0xFFFF
    return bytes(out)


def _num(v) -> bytes:
    v = int(v)
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([247 + (v >> 8), v & 255])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([251 + (v >> 8), v & 255])
    return b"\xff" + struct.pack(">i", v)


def _cs(*tokens) -> bytes:
    """Charstring from numbers and op tuples ('op', byte) / ('esc', byte)."""
    out = bytearray()
    for t in tokens:
        if isinstance(t, (int, float)):
            out += _num(t)
        elif t[0] == "esc":
            out += bytes([12, t[1]])
        else:
            out += bytes([t[1]])
    return bytes(out)


OP = {
    "hsbw": ("op", 13), "rmoveto": ("op", 21), "rlineto": ("op", 5),
    "closepath": ("op", 9), "endchar": ("op", 14), "callsubr": ("op", 10),
    "return": ("op", 11), "rrcurveto": ("op", 8),
    "seac": ("esc", 6), "div": ("esc", 12),
}


def _charstring_entry(name: str, plain: bytes) -> bytes:
    enc = b"XXXX" + plain  # 4 lenIV pad bytes
    enc = _encrypt(enc, 4330)
    return b"/" + name.encode() + b" " + str(len(enc)).encode() + b" RD " + enc + b" ND\n"


def _subr_entry(i: int, plain: bytes) -> bytes:
    enc = _encrypt(b"XXXX" + plain, 4330)
    return (
        b"dup " + str(i).encode() + b" " + str(len(enc)).encode()
        + b" RD " + enc + b" NP\n"
    )


def _build_font(glyphs, subrs=(), encoding_puts=(), pfb=False) -> bytes:
    clear = (
        b"%!FontType1-1.0: TestFont 001.001\n"
        b"/FontName /TestFont def\n"
        b"/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n"
        b"/Encoding 256 array\n"
        b"0 1 255 {1 index exch /.notdef put} for\n"
        + b"".join(
            b"dup " + str(c).encode() + b" /" + n.encode() + b" put\n"
            for c, n in encoding_puts
        )
        + b"readonly def\ncurrentdict end\ncurrentfile eexec\n"
    )
    priv = b"/lenIV 4 def\n"
    if subrs:
        priv += b"/Subrs " + str(len(subrs)).encode() + b" array\n"
        for i, s in enumerate(subrs):
            priv += _subr_entry(i, s)
    priv += b"/CharStrings " + str(len(glyphs)).encode() + b" dict dup begin\n"
    for name, plain in glyphs:
        priv += _charstring_entry(name, plain)
    priv += b"end\nmark currentfile closefile\n"
    binary = _encrypt(b"YYYY" + priv, 55665)
    if pfb:
        return (
            b"\x80\x01" + struct.pack("<I", len(clear)) + clear
            + b"\x80\x02" + struct.pack("<I", len(binary)) + binary
            + b"\x80\x03"
        )
    return clear + binary


SQUARE = _cs(
    50, 600, OP["hsbw"],
    100, 100, OP["rmoveto"],
    500, 0, OP["rlineto"],
    0, 500, OP["rlineto"],
    -500, 0, OP["rlineto"],
    OP["closepath"], OP["endchar"],
)
NOTDEF = _cs(0, 500, OP["hsbw"], OP["endchar"])


def _loop_bounds(loops):
    xs, ys = [], []
    for loop in loops:
        for s in loop:
            pts = (s.a, s.b) if isinstance(s, Straight) else (s.p1, s.p4)
            for p in pts:
                xs.append(p[0])
                ys.append(p[1])
    return min(xs), min(ys), max(xs), max(ys)


def test_parse_and_square_outline():
    data = _build_font(
        [(".notdef", NOTDEF), ("square", SQUARE)], encoding_puts=[(97, "square")]
    )
    f = Type1Font(data)
    assert f.units_per_em == 1000
    gid = f.gid_of_name("square")
    assert gid != 0
    loops = f.glyph_segments(gid)
    assert len(loops) == 1 and len(loops[0]) == 4
    assert _loop_bounds(loops) == (150, 100, 650, 600)
    assert f.advance(gid) == 600
    assert f.gid_of_builtin_code(97) == gid
    assert f.gid_of_builtin_code(98) == 0


def test_pfb_framing_and_hex_eexec():
    glyphs = [(".notdef", NOTDEF), ("square", SQUARE)]
    f = Type1Font(_build_font(glyphs, pfb=True))
    assert f.gid_of_name("square") != 0
    # hex eexec body (PFA form)
    raw = _build_font(glyphs)
    i = raw.find(b"eexec") + 5
    hexed = raw[:i] + b"\n" + raw[i:].lstrip(b"\n").hex().encode()
    f2 = Type1Font(hexed)
    assert _loop_bounds(f2.glyph_segments(f2.gid_of_name("square"))) == (
        150, 100, 650, 600,
    )


def test_subr_call_and_curves():
    sub = _cs(500, 0, OP["rlineto"], OP["return"])
    glyph = _cs(
        0, 700, OP["hsbw"],
        0, 0, OP["rmoveto"],
        0, OP["callsubr"],
        0, 100, 100, 0, 0, 100, OP["rrcurveto"],
        OP["closepath"], OP["endchar"],
    )
    f = Type1Font(_build_font([(".notdef", NOTDEF), ("g", glyph)], subrs=[sub]))
    loops = f.glyph_segments(f.gid_of_name("g"))
    kinds = [type(s).__name__ for s in loops[0]]
    assert kinds[0] == "Straight" and "Bezier" in kinds
    bez = [s for s in loops[0] if isinstance(s, Bezier)][0]
    assert bez.p1 == (500, 0) and bez.p4 == (600, 200)


def test_seac_composite():
    acute = _cs(
        50, 300, OP["hsbw"],
        0, 700, OP["rmoveto"],
        100, 0, OP["rlineto"],
        0, 100, OP["rlineto"],
        -100, 0, OP["rlineto"],
        OP["closepath"], OP["endchar"],
    )
    # aacute = seac(asb=50, adx=250, ady=50, bchar='a'(97), achar=194=/acute)
    comp = _cs(50, 600, OP["hsbw"], 50, 250, 50, 97, 194, OP["seac"], OP["endchar"])
    assert STANDARD_ENCODING[194] == "acute"
    f = Type1Font(
        _build_font(
            [(".notdef", NOTDEF), ("a", SQUARE), ("acute", acute), ("aacute", comp)]
        )
    )
    loops = f.glyph_segments(f.gid_of_name("aacute"))
    assert len(loops) == 2
    base = _loop_bounds([loops[0]])
    acc = _loop_bounds([loops[1]])
    assert base == (150, 100, 650, 600)
    # accent at its own coords translated by (adx - asb, ady) = (200, 50)
    assert acc == (50 + 200, 700 + 50, 150 + 200, 800 + 50)


def test_type1_renders_through_pdf_text():
    from coherence_tpu.io import pdfgraphics as PG
    from coherence_tpu.io.pdf import Name, Stream, mkpage
    from coherence_tpu.raster import region
    from coherence_tpu.scene import cache, pdfscene, render as R

    cache.clear()
    program = _build_font(
        [(".notdef", NOTDEF), ("square", SQUARE)], encoding_puts=[(97, "square")]
    )
    font = {
        "Type": Name("Font"),
        "Subtype": Name("Type1"),
        "BaseFont": Name("TestFont"),
        "FirstChar": 97,
        "LastChar": 97,
        "Widths": [600],
        "FontDescriptor": {
            "Type": Name("FontDescriptor"),
            "FontName": Name("TestFont"),
            "Flags": 4,
            "FontFile": Stream({"Length1": 0, "Length2": 0, "Length3": 0}, program),
        },
    }
    content = b"BT /F1 100 Tf 0 0 1 rg 20 40 Td (a) Tj ET"
    pdf = mkpage(content, mediabox=(0, 0, 200, 200), resources={"Font": {"F1": font}})
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    g = PG.graphic_of_page(pdf, pdf.resolve(pages["Kids"][0]))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert scene
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 200, 200)))
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)

    def at(x, y):
        iy, ix = y - y0, x - x0
        if 0 <= iy < r4.shape[0] and 0 <= ix < r4.shape[1]:
            return r4[iy, ix]
        return np.zeros(4, np.int64)

    # square glyph: user x 35..85 (150..650/1000*100 + 20), y 50..100
    px = at(60, 75)
    assert px[3] > 200 and px[2] > 200, px
    assert at(120, 75)[3] < 30
    cache.clear()
