"""JBIG2Decode (ITU-T T.88) — BEYOND REFERENCE: camlpdf's Pdfcodec has no
JBIG2.  No system encoder/oracle exists in this image, so the decoder is
validated by round-trip against the module's own spec-inverse encoder
(MQ coder, integer procedures, generic regions) plus hand-built segment
streams exercising the embedded-in-PDF profile (page info, generic
regions incl. MMR, symbol dictionaries, text regions)."""

import struct
import zlib

import numpy as np
import pytest

from coherence_tpu.io import jbig2 as J


def rnd(seed=0):
    return np.random.RandomState(seed)


# ---------------------------------------------------------------------------
# Coder round-trips
# ---------------------------------------------------------------------------


def test_mq_roundtrip_random_and_skewed():
    rng = rnd(1)
    for p in (0.5, 0.05, 0.95):
        bits = (rng.rand(20000) < p).astype(int).tolist()
        labels = rng.randint(0, 1 << 16, 20000).tolist()
        enc = J.MQEncoder()
        cxe = J.Contexts(1 << 16)
        for b, l in zip(bits, labels):
            enc.encode(cxe, l, b)
        data = enc.flush()
        dec = J.MQDecoder(data)
        cxd = J.Contexts(1 << 16)
        assert [dec.decode(cxd, l) for l in labels] == bits
        if p != 0.5:
            assert len(data) < 20000 // 8  # entropy coding actually compresses


def test_integer_procedure_ranges_and_oob():
    vals = [0, 1, -1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
            100000, -4436, J.OOB, 7, -250, 2**31 - 1 - 4436]
    enc = J.MQEncoder()
    cxe = J.Contexts(512)
    ie = J.IntEncoder(enc)
    for v in vals:
        ie.encode_int(cxe, v)
    dec = J.MQDecoder(enc.flush())
    cxd = J.Contexts(512)
    for v in vals:
        got = J.decode_int(dec, cxd)
        assert (got is J.OOB) if v is J.OOB else got == v


def test_iaid_roundtrip():
    enc = J.MQEncoder()
    cxe = J.Contexts(1 << 9)
    ie = J.IntEncoder(enc)
    ids = [0, 5, 255, 17, 1, 254]
    for i in ids:
        ie.encode_iaid(cxe, i, 8)
    dec = J.MQDecoder(enc.flush())
    cxd = J.Contexts(1 << 9)
    assert [J.decode_iaid(dec, cxd, 8) for _ in ids] == ids


@pytest.mark.parametrize("template", [0, 1, 2, 3])
@pytest.mark.parametrize("tpgdon", [False, True])
def test_generic_region_roundtrip(template, tpgdon):
    rng = rnd(template * 2 + tpgdon)
    bm = (rng.rand(40, 53) < 0.3).astype(np.uint8)
    bm[10:14] = bm[9]  # identical rows exercise TPGDON
    enc = J.MQEncoder()
    cxe = J.Contexts(1 << 16)
    J.encode_generic(enc, cxe, bm, template, None, tpgdon)
    dec = J.MQDecoder(enc.flush())
    cxd = J.Contexts(1 << 16)
    out = J.decode_generic(dec, cxd, 53, 40, template, J.NOMINAL_AT[template], tpgdon)
    assert np.array_equal(out, bm)


def test_generic_region_custom_at():
    rng = rnd(9)
    bm = (rng.rand(30, 30) < 0.4).astype(np.uint8)
    at = [(1, -1), (-1, -1), (1, -2), (-3, -2)]
    enc = J.MQEncoder()
    cxe = J.Contexts(1 << 16)
    J.encode_generic(enc, cxe, bm, 0, at, False)
    dec = J.MQDecoder(enc.flush())
    cxd = J.Contexts(1 << 16)
    assert np.array_equal(J.decode_generic(dec, cxd, 30, 30, 0, at, False), bm)


# ---------------------------------------------------------------------------
# Segment stream builders (test-side encoders for the embedded profile)
# ---------------------------------------------------------------------------


def seg(number, type_, referred, page, data):
    head = struct.pack(">IB", number, type_)
    head += bytes([len(referred) << 5])
    for r in referred:
        head += bytes([r])  # segment numbers kept <= 256 in tests
    head += bytes([page])
    head += struct.pack(">I", len(data))
    return head + data


def page_info(w, h, default_pixel=0):
    return seg(1, 48, [], 1,
               struct.pack(">IIII", w, h, 0, 0) + bytes([default_pixel << 2]) + b"\0\0")


def generic_region_seg(bm, x=0, y=0, op=0, template=0, tpgdon=False, number=2):
    h, w = bm.shape
    enc = J.MQEncoder()
    cxe = J.Contexts(1 << 16)
    J.encode_generic(enc, cxe, bm, template, None, tpgdon)
    at = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_AT[template])
    data = (struct.pack(">IIII", w, h, x, y) + bytes([op])
            + bytes([(template << 1) | (8 if tpgdon else 0)]) + at + enc.flush())
    return seg(number, 38, [], 1, data)


def symbol_dict_seg(symbols, number=2):
    """Arith symbol dictionary: one height class per distinct height."""
    enc = J.MQEncoder()
    ints = {}

    def ctx(name):
        return ints.setdefault(name, J.Contexts(512))

    ie = J.IntEncoder(enc)
    gb = J.Contexts(1 << 16)
    hcheight = 0
    by_height = {}
    ordered = []
    for s in symbols:
        by_height.setdefault(s.shape[0], []).append(s)
    for hgt in sorted(by_height):
        ie.encode_int(ctx("IADH"), hgt - hcheight)
        hcheight = hgt
        symwidth = 0
        for s in by_height[hgt]:
            ie.encode_int(ctx("IADW"), s.shape[1] - symwidth)
            symwidth = s.shape[1]
            J.encode_generic(enc, gb, s, 0, None, False)
            ordered.append(s)
        ie.encode_int(ctx("IADW"), J.OOB)
    # export all symbols: run of 0 unexported, then all exported
    ie.encode_int(ctx("IAEX"), 0)
    ie.encode_int(ctx("IAEX"), len(symbols))
    at = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_AT[0])
    data = (struct.pack(">H", 0) + at
            + struct.pack(">II", len(symbols), len(symbols)) + enc.flush())
    return seg(number, 0, [], 1, data), ordered


def text_region_seg(w, h, placements, nsyms, widths=(), refcorner=1, number=3,
                    referred=(2,), x=0, y=0, op=0):
    """placements: list of (t, [(s, symbol_id), ...]) strips (SBSTRIPS=1).
    ``widths[sid]`` mirrors the decoder's CURS advance of width-1 after
    each placement when computing the IADS deltas."""
    symcodelen = max(1, (nsyms - 1).bit_length()) if nsyms else 1
    enc = J.MQEncoder()
    ints = {}

    def ctx(name):
        return ints.setdefault(name, J.Contexts(512))

    iaid = J.Contexts(1 << (symcodelen + 1))
    ie = J.IntEncoder(enc)
    ie.encode_int(ctx("IADT"), 0)  # STRIPT = 0
    lastt = 0
    firsts = 0
    ninst = 0
    for t, strip in placements:
        ie.encode_int(ctx("IADT"), t - lastt)
        lastt = t
        curs = None
        for s, sid in strip:
            if curs is None:
                ie.encode_int(ctx("IAFS"), s - firsts)
                firsts = s
            else:
                ie.encode_int(ctx("IADS"), s - curs)
            ie.encode_iaid(iaid, sid, symcodelen)
            ninst += 1
            wi = widths[sid] if widths else 1
            curs = s + wi - 1  # the decoder's post-placement CURS
        ie.encode_int(ctx("IADS"), J.OOB)
    flags = (0 << 0) | (0 << 2) | (refcorner << 4)
    data = (struct.pack(">IIII", w, h, x, y) + bytes([op])
            + struct.pack(">H", flags) + struct.pack(">I", ninst) + enc.flush())
    return seg(number, 6, list(referred), 1, data)


# ---------------------------------------------------------------------------
# Full-stream decoding
# ---------------------------------------------------------------------------


def _unpack(packed: bytes, w, h):
    """decode_jbig2 output (inverted: 0 = black) -> (h, w) 1 = black."""
    rows = np.frombuffer(packed, dtype=np.uint8).reshape(h, -1)
    return 1 - np.unpackbits(rows, axis=1)[:, :w]


def test_full_stream_generic_region():
    rng = rnd(4)
    bm = (rng.rand(24, 37) < 0.35).astype(np.uint8)
    stream = page_info(37, 24) + generic_region_seg(bm)
    out = _unpack(J.decode_jbig2(stream, None, 37, 24), 37, 24)
    assert np.array_equal(out, bm)


def test_full_stream_region_offset_and_or():
    rng = rnd(5)
    bm = (rng.rand(10, 10) < 0.5).astype(np.uint8)
    stream = page_info(32, 20) + generic_region_seg(bm, x=5, y=7)
    out = _unpack(J.decode_jbig2(stream, None, 32, 20), 32, 20)
    assert np.array_equal(out[7:17, 5:15], bm)
    out[7:17, 5:15] = 0
    assert not out.any()


def test_globals_split_symbol_dict_and_text_region():
    # Two symbols: a solid 4x6 box and an L shape, placed twice each.
    box = np.ones((6, 4), dtype=np.uint8)
    ell = np.zeros((6, 5), dtype=np.uint8)
    ell[:, 0] = 1
    ell[5, :] = 1
    dict_seg, ordered = symbol_dict_seg([box, ell])
    assert ordered[0].shape == (6, 4)
    # strip T=2: box at S=1, ell at S=10; strip T=12: ell at S=0
    text = text_region_seg(
        40, 30,
        [(2, [(1, 0), (10, 1)]), (12, [(0, 1)])],
        nsyms=2, widths=(4, 5),
    )
    globals_data = page_info(40, 30) + dict_seg
    out = _unpack(J.decode_jbig2(text, globals_data, 40, 30), 40, 30)
    expect = np.zeros((30, 40), dtype=np.uint8)
    J._compose(expect, box, 1, 2, 0)
    J._compose(expect, ell, 10, 2, 0)
    J._compose(expect, ell, 0, 12, 0)
    assert np.array_equal(out, expect)


def test_text_region_bottomleft_refcorner():
    bar = np.ones((3, 2), dtype=np.uint8)
    dict_seg, _ = symbol_dict_seg([bar])
    text = text_region_seg(20, 10, [(5, [(4, 0)])], nsyms=1, widths=(2,), refcorner=0)
    stream = page_info(20, 10) + dict_seg + text
    out = _unpack(J.decode_jbig2(stream, None, 20, 10), 20, 10)
    expect = np.zeros((10, 20), dtype=np.uint8)
    expect[3:6, 4:6] = 1  # bottom row at T=5
    assert np.array_equal(out, expect)


def test_page_default_pixel_and_xor():
    bm = np.zeros((8, 8), dtype=np.uint8)
    bm[2:6, 2:6] = 1
    stream = page_info(8, 8, default_pixel=1) + generic_region_seg(bm, op=2)
    out = _unpack(J.decode_jbig2(stream, None, 8, 8), 8, 8)
    assert np.array_equal(out, 1 ^ bm)


def test_mmr_generic_region():
    from coherence_tpu.io import ccitt

    rng = rnd(8)
    bm = np.zeros((16, 24), dtype=np.uint8)
    bm[4:12, 6:20] = 1
    bm[8, :] = 1
    # encode with the repo's G4 encoder (1 = black convention)
    packed = np.packbits(1 - bm, axis=1).tobytes()  # encoder wants 0=black?
    enc = ccitt.ccitt_encode_g4(np.asarray(bm, dtype=np.uint8), columns=24)
    data = (struct.pack(">IIII", 24, 16, 0, 0) + bytes([0]) + bytes([1]) + enc)
    stream = page_info(24, 16) + seg(2, 38, [], 1, data)
    out = _unpack(J.decode_jbig2(stream, None, 24, 16), 24, 16)
    assert np.array_equal(out, bm)


def test_unsupported_and_truncated_raise():
    # Huffman AGGREGATE symbol coding (REFAGGNINST > 1) is unsupported:
    # SDHUFF|SDREFAGG dict whose first symbol says REFAGGNINST=2.
    bw = BitWriter()
    huff_write(bw, J.standard_table(4), 6)  # DH
    huff_write(bw, J.standard_table(2), 5)  # DW
    huff_write(bw, J.standard_table(1), 2)  # REFAGGNINST = 2
    rat = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_R_AT)
    data = (struct.pack(">H", 1 | (1 << 1)) + rat + struct.pack(">II", 1, 1)
            + bw.tobytes())
    stream = page_info(4, 4) + seg(2, 0, [], 1, data)
    with pytest.raises(ValueError):
        J.decode_jbig2(stream, None, 4, 4)
    # Truncated Huffman dictionary: body runs out of bits, decode fails
    # loudly instead of hanging.
    data = struct.pack(">H", 1) + struct.pack(">II", 1, 1)
    stream = page_info(4, 4) + seg(2, 0, [], 1, data)
    with pytest.raises(ValueError):
        J.decode_jbig2(stream, None, 4, 4)


# ---------------------------------------------------------------------------
# PDF integration
# ---------------------------------------------------------------------------


def test_jbig2_image_xobject_renders():
    from coherence_tpu.io import pdfgraphics as PG
    from coherence_tpu.io.pdf import Name, Stream, mkpage
    from coherence_tpu.raster import region
    from coherence_tpu.scene import cache, pdfscene, render as R

    cache.clear()
    bm = np.zeros((8, 8), dtype=np.uint8)
    bm[:, :4] = 1  # left half black
    payload = page_info(8, 8) + generic_region_seg(bm)
    img = Stream(
        {"Type": Name("XObject"), "Subtype": Name("Image"),
         "Width": 8, "Height": 8, "BitsPerComponent": 1,
         "ColorSpace": Name("DeviceGray"), "Filter": Name("JBIG2Decode")},
        payload,
    )
    pdf = mkpage(b"q 80 0 0 80 10 10 cm /Im0 Do Q", mediabox=(0, 0, 100, 100),
                 resources={"XObject": {"Im0": img}})
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    page = pdf.resolve(pages["Kids"][0])
    g = PG.graphic_of_page(pdf, page)
    scene = pdfscene.scene_of_graphic(pdf, g)
    spr = R.render_simple_scene(list(reversed(scene)), region.shape_of_box((1, 1, 100, 100)))
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    left = tuple(int(v) for v in r4[50 - y0, 30 - x0])
    right = tuple(int(v) for v in r4[50 - y0, 70 - x0])
    assert left == (0, 0, 0, 255), left       # JBIG2 1 -> black
    assert right == (255, 255, 255, 255), right
    cache.clear()


def test_jbig2_globals_via_decodeparms():
    from coherence_tpu.io import pdfimages as PI
    from coherence_tpu.io.pdf import Name, Stream, mkpage

    box = np.ones((4, 4), dtype=np.uint8)
    dict_seg, _ = symbol_dict_seg([box])
    text = text_region_seg(8, 8, [(2, [(1, 0)])], nsyms=1, widths=(4,))
    gstream = Stream({}, page_info(8, 8) + dict_seg)
    img_d = {"Type": Name("XObject"), "Subtype": Name("Image"),
             "Width": 8, "Height": 8, "BitsPerComponent": 1,
             "ColorSpace": Name("DeviceGray"),
             "Filter": Name("JBIG2Decode"),
             "DecodeParms": {"JBIG2Globals": gstream}}
    pdf = mkpage(b"", mediabox=(0, 0, 10, 10))
    tex = PI.rgba_of_image(pdf, img_d, text)
    assert tex.shape == (8, 8, 4)
    # black box at (x=1, y=2)..(4, 5), white elsewhere
    assert tuple(tex[3, 2]) == (0, 0, 0, 255)
    assert tuple(tex[0, 0]) == (255, 255, 255, 255)


def test_native_generic_region_matches_python():
    from coherence_tpu import native_lib

    if not native_lib.available():
        pytest.skip("native library unavailable")
    rng = rnd(13)
    for trial in range(10):
        tmpl = trial % 4
        tp = trial % 2 == 1
        h, w = int(rng.randint(8, 50)), int(rng.randint(8, 70))
        bm = (rng.rand(h, w) < float(rng.choice([0.1, 0.5, 0.9]))).astype(np.uint8)
        at = (J.NOMINAL_AT[tmpl] if trial % 3
              else [(-1, -1)] * [4, 1, 1, 1][tmpl])
        enc = J.MQEncoder()
        cxe = J.Contexts(1 << 16)
        J.encode_generic(enc, cxe, bm, tmpl, at, tp)
        data = enc.flush()
        mq = J.MQDecoder(data)
        cxd = J.Contexts(1 << 16)
        py = J.decode_generic(mq, cxd, w, h, tmpl, at, tp)
        nat = native_lib.jbig2_generic_region(data, w, h, tmpl, at, tp)
        assert nat is not NotImplemented
        assert np.array_equal(py, bm) and np.array_equal(nat, bm), (trial, tmpl, tp)


# ---------------------------------------------------------------------------
# Refinement coding (T.88 6.3): round-trips + refined text regions +
# refinement/aggregate symbol dictionaries + refinement region segments
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("template", [0, 1])
@pytest.mark.parametrize("tpgron", [False, True])
def test_refinement_roundtrip(template, tpgron):
    rng = rnd(20 + template * 2 + tpgron)
    ref = (rng.rand(20, 25) < 0.4).astype(np.uint8)
    bm = np.zeros((22, 27), np.uint8)
    bm[1:21, 1:26] = ref  # mostly the reference, shifted
    bm[5, 5] ^= 1
    bm[0, :] = 0
    for dx, dy in ((0, 0), (-1, 2), (3, -2)):
        enc = J.MQEncoder()
        cxe = J.Contexts(1 << 13)
        J.encode_refinement(enc, cxe, bm, template, None, ref, dx, dy, tpgron)
        dec = J.MQDecoder(enc.flush())
        cxd = J.Contexts(1 << 13)
        out = J.decode_refinement(dec, cxd, 27, 22, template, None, ref,
                                  dx, dy, tpgron)
        assert np.array_equal(out, bm), (template, tpgron, dx, dy)


def test_refinement_custom_at():
    rng = rnd(31)
    ref = (rng.rand(12, 14) < 0.5).astype(np.uint8)
    bm = ref.copy()
    bm[3, 4] ^= 1
    at = [(-2, -1), (2, 1)]
    enc = J.MQEncoder()
    cxe = J.Contexts(1 << 13)
    J.encode_refinement(enc, cxe, bm, 0, at, ref, 0, 0, False)
    dec = J.MQDecoder(enc.flush())
    cxd = J.Contexts(1 << 13)
    out = J.decode_refinement(dec, cxd, 14, 12, 0, at, ref, 0, 0, False)
    assert np.array_equal(out, bm)


class _TextEnc:
    """Mirror of decode_text_region's context/coordinate state for building
    refining text-region payloads (shared-context capable)."""

    def __init__(self, nsyms_total, enc=None, ints=None, iaid=None, gr=None):
        self.enc = enc or J.MQEncoder()
        self.ints = ints if ints is not None else {}
        self.symcodelen = (max(1, (nsyms_total - 1).bit_length())
                           if nsyms_total > 1 else 1)
        self.iaid = iaid or J.Contexts(1 << (self.symcodelen + 1))
        self.gr = gr or J.Contexts(1 << 13)
        self.ie = J.IntEncoder(self.enc)

    def ctx(self, name):
        return self.ints.setdefault(name, J.Contexts(512))

    def body(self, placements, symbols, refinements=None, rtemplate=0,
             rat=None):
        """placements: [(t, [(s, sid), ...])]; refinements: {(strip_i, k):
        (bitmap, rdw, rdh, rdx, rdy)} refining symbols[sid]."""
        ie, enc = self.ie, self.enc
        ie.encode_int(self.ctx("IADT"), 0)  # STRIPT = 0
        lastt = 0
        firsts = 0
        ninst = 0
        for si, (t, strip) in enumerate(placements):
            ie.encode_int(self.ctx("IADT"), t - lastt)
            lastt = t
            curs = None
            for k, (s, sid) in enumerate(strip):
                if curs is None:
                    ie.encode_int(self.ctx("IAFS"), s - firsts)
                    firsts = s
                else:
                    ie.encode_int(self.ctx("IADS"), s - curs)
                ie.encode_iaid(self.iaid, sid, self.symcodelen)
                refn = (refinements or {}).get((si, k))
                if refinements is not None:
                    ie.encode_int(self.ctx("IARI"), 0 if refn is None else 1)
                if refn is not None:
                    bm, rdw, rdh, rdx, rdy = refn
                    ie.encode_int(self.ctx("IARDW"), rdw)
                    ie.encode_int(self.ctx("IARDH"), rdh)
                    ie.encode_int(self.ctx("IARDX"), rdx)
                    ie.encode_int(self.ctx("IARDY"), rdy)
                    J.encode_refinement(
                        enc, self.gr, bm, rtemplate, rat, symbols[sid],
                        (rdw >> 1) + rdx, (rdh >> 1) + rdy, False)
                    wi = bm.shape[1]
                else:
                    wi = symbols[sid].shape[1]
                ninst += 1
                curs = s + wi - 1
            ie.encode_int(self.ctx("IADS"), J.OOB)
        return ninst


def test_text_region_refined_instance():
    base = np.zeros((5, 4), np.uint8)
    base[:, 0] = 1
    base[0, :] = 1  # an open corner glyph
    refined = np.zeros((6, 6), np.uint8)
    refined[1:6, 1:5] = base
    refined[5, 5] = 1  # grown + dot
    te = _TextEnc(1)
    ninst = te.body(
        [(2, [(1, 0), (12, 0)])], [base],
        refinements={(0, 1): (refined, 2, 1, 0, 0)},
    )
    flags = (1 << 1) | (1 << 4)  # SBREFINE, refcorner TOPLEFT
    rat = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_R_AT)
    data = (struct.pack(">IIII", 30, 12, 0, 0) + bytes([0])
            + struct.pack(">H", flags) + rat + struct.pack(">I", ninst)
            + te.enc.flush())
    dict_seg, _ = symbol_dict_seg([base])
    stream = page_info(30, 12) + dict_seg + seg(3, 6, [2], 1, data)
    out = _unpack(J.decode_jbig2(stream, None, 30, 12), 30, 12)
    expect = np.zeros((12, 30), np.uint8)
    J._compose(expect, base, 1, 2, 0)
    J._compose(expect, refined, 12, 2, 0)
    assert np.array_equal(out, expect)


def _refagg_dict_seg(base_symbols, new_specs, number=3, referred=(2,)):
    """SDREFAGG=1 symbol dictionary refining base_symbols.  new_specs:
    [(bitmap, sid, rdx, rdy)] — each new symbol refines base sid."""
    enc = J.MQEncoder()
    ints = {}

    def ctx(name):
        return ints.setdefault(name, J.Contexts(512))

    ie = J.IntEncoder(enc)
    total = len(base_symbols) + len(new_specs)
    symcodelen = max(1, (total - 1).bit_length()) if total > 1 else 1
    iaid = J.Contexts(1 << (symcodelen + 1))
    gr = J.Contexts(1 << 13)
    hcheight = 0
    by_h = {}
    for spec in new_specs:
        by_h.setdefault(spec[0].shape[0], []).append(spec)
    allsofar = list(base_symbols)
    for hgt in sorted(by_h):
        ie.encode_int(ctx("IADH"), hgt - hcheight)
        hcheight = hgt
        symwidth = 0
        for bm, sid, rdx, rdy in by_h[hgt]:
            ie.encode_int(ctx("IADW"), bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            ie.encode_int(ctx("IAAI"), 1)  # REFAGGNINST = 1
            ie.encode_iaid(iaid, sid, symcodelen)
            ie.encode_int(ctx("IARDX"), rdx)
            ie.encode_int(ctx("IARDY"), rdy)
            J.encode_refinement(enc, gr, bm, 0, None, allsofar[sid],
                                rdx, rdy, False)
            allsofar.append(bm)
        ie.encode_int(ctx("IADW"), J.OOB)
    ie.encode_int(ctx("IAEX"), 0)
    ie.encode_int(ctx("IAEX"), total)  # export everything
    flags = 1 << 1  # SDREFAGG
    at = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_AT[0])
    rat = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_R_AT)
    data = (struct.pack(">H", flags) + at + rat
            + struct.pack(">II", total, len(new_specs)) + enc.flush())
    return seg(number, 0, list(referred), 1, data)


def test_symbol_dict_refagg_refines_imported_symbol():
    base = np.zeros((6, 5), np.uint8)
    base[:, 2] = 1
    base[3, :] = 1  # a plus sign
    bold = np.zeros((6, 5), np.uint8)
    bold[:, 1:4] = 1
    bold[2:5, :] = 1  # thicker plus, same size
    base_dict, _ = symbol_dict_seg([base], number=2)
    ref_dict = _refagg_dict_seg([base], [(bold, 0, 0, 0)], number=3,
                                referred=(2,))
    # text region uses BOTH exported symbols (base id 0, bold id 1)
    text = text_region_seg(24, 10, [(2, [(1, 0), (10, 1)])], nsyms=2,
                           widths=(5, 5), number=4, referred=(3,))
    stream = page_info(24, 10) + base_dict + ref_dict + text
    out = _unpack(J.decode_jbig2(stream, None, 24, 10), 24, 10)
    expect = np.zeros((10, 24), np.uint8)
    J._compose(expect, base, 1, 2, 0)
    J._compose(expect, bold, 10, 2, 0)
    assert np.array_equal(out, expect)


def test_symbol_dict_refagg_aggregate_text_region():
    dot = np.ones((3, 3), np.uint8)
    dot[1, 1] = 0  # ring
    # New 8x12 symbol = two refining instances of the ring composed by an
    # embedded text region (REFAGGNINST=2), the second instance refined.
    grown = np.zeros((4, 4), np.uint8)
    grown[:3, :3] = dot
    grown[3, 3] = 1
    enc = J.MQEncoder()
    ints = {}

    def ctx(name):
        return ints.setdefault(name, J.Contexts(512))

    ie = J.IntEncoder(enc)
    total = 1 + 1
    symcodelen = max(1, (total - 1).bit_length())
    iaid = J.Contexts(1 << (symcodelen + 1))
    gr = J.Contexts(1 << 13)
    ie.encode_int(ctx("IADH"), 8)  # height class 8
    ie.encode_int(ctx("IADW"), 12)  # one new 12-wide symbol
    ie.encode_int(ctx("IAAI"), 2)  # REFAGGNINST = 2 -> embedded text region
    te = _TextEnc(total, enc=enc, ints=ints, iaid=iaid, gr=gr)
    te.body(
        [(0, [(0, 0)]), (4, [(7, 0)])], [dot],
        refinements={(1, 0): (grown, 1, 1, 0, 0)},
    )
    ie.encode_int(ctx("IADW"), J.OOB)
    ie.encode_int(ctx("IAEX"), 1)  # don't export the input ring
    ie.encode_int(ctx("IAEX"), 1)  # export the aggregate symbol
    flags = 1 << 1
    at = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_AT[0])
    rat = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_R_AT)
    data = (struct.pack(">H", flags) + at + rat
            + struct.pack(">II", 1, 1) + enc.flush())
    base_dict, _ = symbol_dict_seg([dot], number=2)
    agg_dict = seg(3, 0, [2], 1, data)
    text = text_region_seg(20, 12, [(1, [(2, 0)])], nsyms=1, widths=(12,),
                           number=4, referred=(3,))
    stream = page_info(20, 12) + base_dict + agg_dict + text
    out = _unpack(J.decode_jbig2(stream, None, 20, 12), 20, 12)
    agg = np.zeros((8, 12), np.uint8)
    J._compose(agg, dot, 0, 0, 0)
    J._compose(agg, grown, 7, 4, 0)
    expect = np.zeros((12, 20), np.uint8)
    J._compose(expect, agg, 2, 1, 0)
    assert np.array_equal(out, expect)


def test_refinement_region_segment_refines_page():
    rng = rnd(40)
    bm = (rng.rand(10, 16) < 0.4).astype(np.uint8)
    refined = bm.copy()
    refined[4:6, 4:8] ^= 1
    enc = J.MQEncoder()
    cxe = J.Contexts(1 << 13)
    J.encode_refinement(enc, cxe, refined, 0, None, bm, 0, 0, False)
    rat = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_R_AT)
    data = (struct.pack(">IIII", 16, 10, 2, 3) + bytes([0])
            + bytes([0]) + rat + enc.flush())
    stream = (page_info(24, 16) + generic_region_seg(bm, x=2, y=3)
              + seg(3, 42, [], 1, data))
    out = _unpack(J.decode_jbig2(stream, None, 24, 16), 24, 16)
    expect = np.zeros((16, 24), np.uint8)
    J._compose(expect, refined, 2, 3, 4)
    assert np.array_equal(out, expect)


# ---------------------------------------------------------------------------
# Huffman coding (Annex B): table structure, round-trips, full streams
# ---------------------------------------------------------------------------


def test_standard_tables_structure():
    """Independent structural validation of the transcribed Annex B tables:
    (1) the (RANGELEN, RANGELOW) pairs tile the value line contiguously
    between the lower- and upper-range lines; (2) the prefix lengths form a
    complete prefix code (Kraft sum == 1) for every table except B.10."""
    for n, lines in J._STD_TABLES.items():
        kraft = sum(2.0 ** -l[0] for l in lines)
        if n == 10:
            assert kraft < 1.0, n
        else:
            assert kraft == 1.0, (n, kraft)
        normals = [l for l in lines if len(l) == 3]
        normals.sort(key=lambda l: l[2])
        for a, b in zip(normals, normals[1:]):
            assert a[2] + (1 << a[1]) == b[2], (n, a, b)
        lowers = [l for l in lines if len(l) > 3 and l[3] == "L"]
        uppers = [l for l in lines if len(l) > 3 and l[3] == "U"]
        if lowers:
            assert lowers[0][2] == normals[0][2] - 1, n
        if uppers:
            assert uppers[0][2] == normals[-1][2] + (1 << normals[-1][1]), n
        # canonical assignment must be collision-free
        t = J.standard_table(n)
        assert len(t.codes) == len([l for l in lines if l[0] > 0])


class BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, v, n):
        for k in range(n - 1, -1, -1):
            self.bits.append((v >> k) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def append_bytes(self, data):
        self.align()
        for b in data:
            self.write(b, 8)

    def tobytes(self):
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for b in self.bits[i : i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)


def huff_write(bw, table, value):
    """Inverse of HuffmanTable.decode: emit the prefix + range bits."""
    inv = {id(l): lc for lc, l in table.codes.items()}
    line = None
    if value is J.OOB:
        line = next(l for l in table.lines if l[3] == "O")
        extra = (0, 0)
    else:
        for l in table.lines:
            if l[3] == "" and l[2] <= value < l[2] + (1 << l[1]):
                line = l
                extra = (value - l[2], l[1])
                break
        if line is None:
            for l in table.lines:
                if l[3] == "L" and value <= l[2]:
                    line = l
                    extra = (l[2] - value, 32)
                    break
                if l[3] == "U" and value >= l[2]:
                    line = l
                    extra = (value - l[2], 32)
                    break
    assert line is not None, value
    length, code = inv[id(line)]
    bw.write(code, length)
    bw.write(extra[0], extra[1])


@pytest.mark.parametrize("n", sorted(J._STD_TABLES))
def test_standard_table_roundtrip(n):
    t = J.standard_table(n)
    values = []
    for l in t.lines:
        if l[3] == "":
            values += [l[2], l[2] + (1 << l[1]) - 1]
        elif l[3] == "L":
            values += [l[2], l[2] - 1000]
        elif l[3] == "U":
            values += [l[2], l[2] + 123456]
        else:
            values.append(J.OOB)
    bw = BitWriter()
    for v in values:
        huff_write(bw, t, v)
    r = J.BitReader(bw.tobytes())
    for v in values:
        got = t.decode(r)
        assert (got is J.OOB) if v is J.OOB else got == v, (n, v, got)


def test_custom_table_segment_roundtrip():
    # B.2-style custom table over [0, 16) with OOB.
    bw = BitWriter()
    # lines: ranges 0..3 (rangelen 2, preflen 1), 4..15 (rangelen ~, preflen 2)
    for preflen, rangelen in ((1, 2), (2, 2), (3, 3)):
        bw.write(preflen, 4)  # HTPS = 4 bits (flags value 3)
        bw.write(rangelen, 4)
    bw.write(5, 4)  # lower-range preflen
    bw.write(5, 4)  # upper-range preflen
    bw.write(4, 4)  # OOB preflen  (Kraft: 1/2+1/4+1/8+2/32+1/16 = 1)
    flags = 1 | (3 << 1) | (3 << 4)  # HTOOB, HTPS=4, HTRS=4
    data = bytes([flags]) + struct.pack(">ii", 0, 16) + bw.tobytes()
    t = J.parse_table_segment(data)
    vals = [0, 3, 4, 7, 8, 15, -1, -50, 16, 999, J.OOB]
    bw2 = BitWriter()
    for v in vals:
        huff_write(bw2, t, v)
    r = J.BitReader(bw2.tobytes())
    for v in vals:
        got = t.decode(r)
        assert (got is J.OOB) if v is J.OOB else got == v, v


def test_symbol_code_table_runcodes():
    # 5 symbols with lengths [1, 2, 0, 3, 3] via direct runcodes.
    bw = BitWriter()
    # runcode table: codes 0..34; give lengths so used codes exist:
    runlens = [0] * 35
    for c in (0, 1, 2, 3):
        runlens[c] = 2  # runcodes 0,1,2,3 each 2 bits
    for v in runlens:
        bw.write(v, 4)
    runtab = J.HuffmanTable([(runlens[i], 0, i) for i in range(35)
                             if runlens[i] > 0])
    for codelen in (1, 2, 0, 3, 3):
        huff_write(bw, runtab, codelen)
    r = J.BitReader(bw.tobytes())
    t = J.read_symbol_code_table(r, 5)
    # decode: write each symbol index and read it back
    bw2 = BitWriter()
    for sid in (0, 1, 3, 4, 4, 0):
        huff_write(bw2, t, sid)
    r2 = J.BitReader(bw2.tobytes())
    for sid in (0, 1, 3, 4, 4, 0):
        assert t.decode(r2) == sid


def huffman_symbol_dict_seg(symbols, number=2, mmr=False):
    """SDHUFF=1 dictionary, standard tables, one height class per height,
    collective bitmaps raw (BMSIZE=0) or MMR.  Widths must ascend within a
    height class."""
    from coherence_tpu.io import ccitt

    bw = BitWriter()
    b1, b2, b4 = (J.standard_table(n) for n in (1, 2, 4))
    by_height = {}
    for s in symbols:
        by_height.setdefault(s.shape[0], []).append(s)
    hcheight = 0
    for hgt in sorted(by_height):
        huff_write(bw, b4, hgt - hcheight)
        hcheight = hgt
        symwidth = 0
        for s in by_height[hgt]:
            huff_write(bw, b2, s.shape[1] - symwidth)
            symwidth = s.shape[1]
        huff_write(bw, b2, J.OOB)
        coll = np.concatenate(by_height[hgt], axis=1)
        if mmr:
            payload = ccitt.ccitt_encode_g4(coll, columns=coll.shape[1])
            huff_write(bw, b1, len(payload))
            bw.append_bytes(payload)
        else:
            huff_write(bw, b1, 0)
            bw.append_bytes(np.packbits(coll, axis=1).tobytes())
    huff_write(bw, b1, 0)
    huff_write(bw, b1, len(symbols))  # export all
    flags = 1  # SDHUFF, all selectors standard
    data = (struct.pack(">H", flags)
            + struct.pack(">II", len(symbols), len(symbols)) + bw.tobytes())
    ordered = [s for hgt in sorted(by_height) for s in by_height[hgt]]
    return seg(number, 0, [], 1, data), ordered


def huffman_text_region_seg(w, h, placements, symbols, number=3,
                            referred=(2,), refinements=None, refcorner=1,
                            x=0, y=0):
    """SBHUFF=1 text region, standard tables (FS B.6, DS B.8, DT B.11),
    equal-length symbol codes.  refinements: {(strip_i, k): (bitmap, rdw,
    rdh, rdx, rdy)}."""
    nsyms = len(symbols)
    L = max(1, (nsyms - 1).bit_length()) if nsyms > 1 else 1
    bw = BitWriter()
    runlens = [0] * 35
    runlens[L] = 1  # single runcode: "length L", canonical code 0 (1 bit)
    for v in runlens:
        bw.write(v, 4)
    for _ in range(nsyms):
        bw.write(0, 1)
    bw.align()
    b1, b6, b8, b11, b15 = (J.standard_table(n) for n in (1, 6, 8, 11, 15))
    huff_write(bw, b11, 1)  # STRIPT = -1
    stript = -1
    firsts = 0
    ninst = 0
    refine = refinements is not None
    for si, (t, strip) in enumerate(placements):
        huff_write(bw, b11, t - stript)
        stript = t
        curs = None
        for k, (s, sid) in enumerate(strip):
            if curs is None:
                huff_write(bw, b6, s - firsts)
                firsts = s
            else:
                huff_write(bw, b8, s - curs)
            bw.write(sid, L)
            refn = (refinements or {}).get((si, k))
            if refine:
                bw.write(0 if refn is None else 1, 1)
            if refn is not None:
                bm, rdw, rdh, rdx, rdy = refn
                for tab, v in ((b15, rdw), (b15, rdh), (b15, rdx), (b15, rdy)):
                    huff_write(bw, tab, v)
                enc = J.MQEncoder()
                gr = J.Contexts(1 << 13)
                J.encode_refinement(enc, gr, bm, 0, None, symbols[sid],
                                    (rdw >> 1) + rdx, (rdh >> 1) + rdy, False)
                payload = enc.flush()
                huff_write(bw, b1, len(payload))
                bw.append_bytes(payload)
                wi = bm.shape[1]
            else:
                wi = symbols[sid].shape[1]
            ninst += 1
            curs = s + wi - 1
        huff_write(bw, b8, J.OOB)
    flags = 1 | ((1 if refine else 0) << 1) | (refcorner << 4)
    # RDW/RDH/RDX/RDY selectors = 1 (Table B.15), matching the writer above
    hflags = (1 << 6) | (1 << 8) | (1 << 10) | (1 << 12) if refine else 0
    rat = (b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_R_AT)
           if refine else b"")
    data = (struct.pack(">IIII", w, h, x, y) + bytes([0])
            + struct.pack(">H", flags) + struct.pack(">H", hflags) + rat
            + struct.pack(">I", ninst) + bw.tobytes())
    return seg(number, 6, list(referred), 1, data)


@pytest.mark.parametrize("mmr", [False, True])
def test_huffman_symbol_dict_and_text_region(mmr):
    box = np.ones((6, 4), dtype=np.uint8)
    ell = np.zeros((6, 5), dtype=np.uint8)
    ell[:, 0] = 1
    ell[5, :] = 1
    tee = np.zeros((8, 5), dtype=np.uint8)
    tee[0, :] = 1
    tee[:, 2] = 1
    dict_seg, ordered = huffman_symbol_dict_seg([box, ell, tee], mmr=mmr)
    assert [s.shape for s in ordered] == [(6, 4), (6, 5), (8, 5)]
    text = huffman_text_region_seg(
        40, 30, [(2, [(1, 0), (10, 1)]), (14, [(3, 2)])], ordered)
    stream = page_info(40, 30) + dict_seg + text
    out = _unpack(J.decode_jbig2(stream, None, 40, 30), 40, 30)
    expect = np.zeros((30, 40), dtype=np.uint8)
    J._compose(expect, box, 1, 2, 0)
    J._compose(expect, ell, 10, 2, 0)
    J._compose(expect, tee, 3, 14, 0)
    assert np.array_equal(out, expect)


def test_huffman_text_region_refined_instance():
    base = np.zeros((5, 4), np.uint8)
    base[:, 0] = 1
    base[0, :] = 1
    refined = np.zeros((6, 6), np.uint8)
    refined[1:6, 1:5] = base
    refined[5, 5] = 1
    dict_seg, ordered = huffman_symbol_dict_seg([base])
    text = huffman_text_region_seg(
        30, 12, [(2, [(1, 0), (12, 0)])], ordered,
        refinements={(0, 1): (refined, 2, 1, 0, 0)})
    stream = page_info(30, 12) + dict_seg + text
    out = _unpack(J.decode_jbig2(stream, None, 30, 12), 30, 12)
    expect = np.zeros((12, 30), np.uint8)
    J._compose(expect, base, 1, 2, 0)
    J._compose(expect, refined, 12, 2, 0)
    assert np.array_equal(out, expect)


def test_huffman_refagg_symbol_dict():
    base = np.zeros((6, 5), np.uint8)
    base[:, 2] = 1
    base[3, :] = 1
    bold = np.zeros((6, 5), np.uint8)
    bold[:, 1:4] = 1
    bold[2:5, :] = 1
    base_dict, _ = huffman_symbol_dict_seg([base], number=2)
    # SDHUFF+SDREFAGG dictionary: one new symbol refining import id 0.
    bw = BitWriter()
    b1, b2, b4, b15 = (J.standard_table(n) for n in (1, 2, 4, 15))
    huff_write(bw, b4, 6)   # DH: height 6
    huff_write(bw, b2, 5)   # DW: width 5
    huff_write(bw, b1, 1)   # REFAGGNINST = 1
    symcodelen = 1  # total symbols = 2
    bw.write(0, symcodelen)  # refine import id 0
    huff_write(bw, b15, 0)  # RDX
    huff_write(bw, b15, 0)  # RDY
    enc = J.MQEncoder()
    gr = J.Contexts(1 << 13)
    J.encode_refinement(enc, gr, bold, 0, None, base, 0, 0, False)
    payload = enc.flush()
    huff_write(bw, b1, len(payload))
    bw.append_bytes(payload)
    huff_write(bw, b2, J.OOB)  # end height class
    huff_write(bw, b1, 0)
    huff_write(bw, b1, 2)  # export both
    flags = 1 | (1 << 1)  # SDHUFF | SDREFAGG
    rat = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_R_AT)
    data = (struct.pack(">H", flags) + rat + struct.pack(">II", 2, 1)
            + bw.tobytes())
    ref_dict = seg(3, 0, [2], 1, data)
    text = text_region_seg(24, 10, [(2, [(1, 0), (10, 1)])], nsyms=2,
                           widths=(5, 5), number=4, referred=(3,))
    stream = page_info(24, 10) + base_dict + ref_dict + text
    out = _unpack(J.decode_jbig2(stream, None, 24, 10), 24, 10)
    expect = np.zeros((10, 24), np.uint8)
    J._compose(expect, base, 1, 2, 0)
    J._compose(expect, bold, 10, 2, 0)
    assert np.array_equal(out, expect)


def _huffman_aggregate_stream():
    """Full stream for an SDHUFF+SDREFAGG dictionary whose new symbol is an
    embedded two-instance text region; returns (stream, base, refined)."""
    base = np.zeros((6, 5), np.uint8)
    base[:, 2] = 1
    base[3, :] = 1
    refined = np.zeros((6, 6), np.uint8)
    refined[:, :5] = base
    refined[0, 5] = 1
    refined[5, 5] = 1
    base_dict, _ = huffman_symbol_dict_seg([base], number=2)

    bw = BitWriter()
    b1, b2, b4, b6, b8, b11, b15 = (
        J.standard_table(n) for n in (1, 2, 4, 6, 8, 11, 15))
    huff_write(bw, b4, 6)    # DH: height class 6
    huff_write(bw, b2, 12)   # DW: aggregate symbol is 6x12
    huff_write(bw, b1, 2)    # REFAGGNINST = 2
    symcodelen = 1           # total symbols = 1 input + 1 new
    # Embedded text region (no symbol-ID code table, no alignment).
    huff_write(bw, b11, 1)   # STRIPT = -1
    huff_write(bw, b11, 1)   # strip at T = 0
    huff_write(bw, b6, 0)    # FS: S = 0
    bw.write(0, symcodelen)  # symbol id 0 (the import)
    bw.write(0, 1)           # RI = 0: plain placement
    huff_write(bw, b8, 2)    # DS: next S = curs(4) + 2 = 6
    bw.write(0, symcodelen)  # symbol id 0 again
    bw.write(1, 1)           # RI = 1: refined instance
    for v in (1, 0, 0, 0):   # RDW/RDH/RDX/RDY (refined is 6x6)
        huff_write(bw, b15, v)
    enc = J.MQEncoder()
    gr = J.Contexts(1 << 13)
    J.encode_refinement(enc, gr, refined, 0, None, base, 0, 0, False)
    payload = enc.flush()
    huff_write(bw, b1, len(payload))  # RSIZE (B.1)
    bw.append_bytes(payload)          # byte-aligned MQ refinement data
    huff_write(bw, b8, J.OOB)         # end of strip
    huff_write(bw, b2, J.OOB)         # end of height class
    huff_write(bw, b1, 0)    # export runs: skip 0
    huff_write(bw, b1, 2)    # export both symbols
    flags = 1 | (1 << 1)     # SDHUFF | SDREFAGG
    rat = b"".join(struct.pack(">bb", ax, ay) for ax, ay in J.NOMINAL_R_AT)
    data = (struct.pack(">H", flags) + rat + struct.pack(">II", 2, 1)
            + bw.tobytes())
    agg_dict = seg(3, 0, [2], 1, data)
    text = text_region_seg(30, 10, [(2, [(1, 0), (8, 1)])], nsyms=2,
                           widths=(5, 12), number=4, referred=(3,))
    return page_info(30, 10) + base_dict + agg_dict + text, base, refined


def test_huffman_aggregate_symbol_dict():
    """SDHUFF + SDREFAGG with REFAGGNINST > 1: the new symbol decodes as an
    embedded Huffman text region (6.5.8.2.1, Table 17) of two instances —
    the imported symbol placed plain, then a refined copy beside it."""
    stream, base, refined = _huffman_aggregate_stream()
    aggregate = np.zeros((6, 12), np.uint8)
    J._compose(aggregate, base, 0, 0, 0)
    J._compose(aggregate, refined, 6, 0, 0)
    out = _unpack(J.decode_jbig2(stream, None, 30, 10), 30, 10)
    expect = np.zeros((10, 30), np.uint8)
    J._compose(expect, base, 1, 2, 0)
    J._compose(expect, aggregate, 8, 2, 0)
    assert np.array_equal(out, expect)


def test_huffman_custom_table_in_text_region():
    # Custom DT table (selector 3) carried by a type-53 segment.
    bw = BitWriter()
    for preflen, rangelen in ((1, 2), (2, 2), (3, 3)):
        bw.write(preflen, 4)
        bw.write(rangelen, 4)
    bw.write(5, 4)
    bw.write(5, 4)
    flags = (3 << 1) | (3 << 4)  # no OOB, HTPS=4, HTRS=4
    tab_data = bytes([flags]) + struct.pack(">ii", 0, 16) + bw.tobytes()
    tab_seg = seg(5, 53, [], 1, tab_data)
    custom_dt = J.parse_table_segment(tab_data)

    bar = np.ones((3, 2), dtype=np.uint8)
    dict_seg, ordered = huffman_symbol_dict_seg([bar], number=2)
    # hand-build the text region with DT = custom (selector 3)
    bw2 = BitWriter()
    runlens = [0] * 35
    runlens[1] = 1
    for v in runlens:
        bw2.write(v, 4)
    bw2.write(0, 1)  # one symbol, code length 1
    bw2.align()
    b6, b8 = J.standard_table(6), J.standard_table(8)
    huff_write(bw2, custom_dt, 0)  # STRIPT = 0 (custom table encodes 0!)
    huff_write(bw2, custom_dt, 5)  # strip at T=5
    huff_write(bw2, b6, 4)         # FS: S=4
    bw2.write(0, 1)                # symbol id 0
    huff_write(bw2, b8, J.OOB)
    flags = 1 | (0 << 4)  # SBHUFF, refcorner BOTTOMLEFT
    hflags = 3 << 4  # DT selector = custom
    data = (struct.pack(">IIII", 20, 10, 0, 0) + bytes([0])
            + struct.pack(">H", flags) + struct.pack(">H", hflags)
            + struct.pack(">I", 1) + bw2.tobytes())
    text = seg(4, 6, [2, 5], 1, data)
    stream = page_info(20, 10) + dict_seg + tab_seg + text
    out = _unpack(J.decode_jbig2(stream, None, 20, 10), 20, 10)
    expect = np.zeros((10, 20), np.uint8)
    expect[3:6, 4:6] = 1  # bottom at T=5
    assert np.array_equal(out, expect)


# ---------------------------------------------------------------------------
# Pattern dictionaries + halftone regions (6.6/6.7)
# ---------------------------------------------------------------------------


def pattern_dict_seg(hdpw, hdph, npat, number=2, mmr=False, seed=7):
    """Random patterns; returns (segment, patterns)."""
    from coherence_tpu.io import ccitt

    rng = rnd(seed)
    # graded density patterns (pattern k ~ k/npat coverage)
    pats = []
    for k in range(npat):
        p = (rng.rand(hdph, hdpw) < (k / max(1, npat - 1))).astype(np.uint8)
        pats.append(p)
    coll = np.concatenate(pats, axis=1)
    template = 0
    if mmr:
        payload = ccitt.ccitt_encode_g4(coll, columns=coll.shape[1])
    else:
        enc = J.MQEncoder()
        cx = J.Contexts(1 << 16)
        at = [(-hdpw, 0), (-3, -1), (2, -2), (-2, -2)]
        J.encode_generic(enc, cx, coll, template, at, False)
        payload = enc.flush()
    flags = (1 if mmr else 0) | (template << 1)
    data = (bytes([flags, hdpw, hdph]) + struct.pack(">I", npat - 1)
            + payload)
    return seg(number, 16, [], 1, data), pats


def halftone_region_seg(w, h, gray, npat, hdpw, hdph, number=3, referred=(2,),
                        hgx=0, hgy=0, hrx=None, hry=0, mmr=False,
                        enableskip=False, x=0, y=0):
    """Encode the gray-coded bitplanes of ``gray`` (hgh, hgw)."""
    from coherence_tpu.io import ccitt

    hgh, hgw = gray.shape
    if hrx is None:
        hrx = hdpw << 8  # dense grid: one pattern width per cell
    bits = max(1, (npat - 1).bit_length())
    g = gray ^ (gray >> 1)
    planes = [((g >> (bits - 1 - j)) & 1).astype(np.uint8)
              for j in range(bits)]
    template = 0
    skip = None
    if enableskip:
        mg = np.arange(hgh, dtype=np.int64)[:, None]
        ng = np.arange(hgw, dtype=np.int64)[None, :]
        cx_ = (hgx + mg * hry + ng * hrx) >> 8
        cy_ = (hgy + mg * hrx - ng * hry) >> 8
        skip = ((cx_ + hdpw <= 0) | (cx_ >= w) | (cy_ + hdph <= 0)
                | (cy_ >= h)).astype(np.uint8)
    if mmr:
        allrows = np.concatenate(planes, axis=0)
        payload = ccitt.ccitt_encode_g4(allrows, columns=hgw)
    else:
        enc = J.MQEncoder()
        cx = J.Contexts(1 << 16)
        at = [(3, -1), (-3, -1), (2, -2), (-2, -2)]
        for p in planes:
            if skip is not None:
                p = p * (1 - skip)  # skipped pixels encode as 0
            J.encode_generic(enc, cx, p, template, at, False)
        payload = enc.flush()
    flags = ((1 if mmr else 0) | (template << 1)
             | ((1 if enableskip else 0) << 3) | (0 << 4) | (0 << 7))
    data = (struct.pack(">IIII", w, h, x, y) + bytes([0]) + bytes([flags])
            + struct.pack(">IIii", hgw, hgh, hgx, hgy)
            + struct.pack(">HH", hrx, hry) + payload)
    return seg(number, 22, list(referred), 1, data)


@pytest.mark.parametrize("mmr", [False, True])
def test_halftone_region_renders_grayscale(mmr):
    rng = rnd(11)
    hdpw = hdph = 4
    npat = 8
    dict_seg, pats = pattern_dict_seg(hdpw, hdph, npat, mmr=mmr)
    gray = rng.randint(0, npat, (5, 6)).astype(np.int64)
    ht = halftone_region_seg(24, 20, gray, npat, hdpw, hdph, mmr=mmr)
    stream = page_info(24, 20) + dict_seg + ht
    out = _unpack(J.decode_jbig2(stream, None, 24, 20), 24, 20)
    expect = np.zeros((20, 24), np.uint8)
    for m in range(5):
        for n in range(6):
            J._compose(expect, pats[int(gray[m, n])], n * 4, m * 4, 0)
    assert np.array_equal(out, expect)


def test_halftone_skewed_grid_and_skip():
    rng = rnd(12)
    hdpw = hdph = 3
    npat = 4
    dict_seg, pats = pattern_dict_seg(hdpw, hdph, npat)
    hgw, hgh = 7, 6
    gray = rng.randint(0, npat, (hgh, hgw)).astype(np.int64)
    hgx, hgy = -2 << 8, 1 << 8
    hrx, hry = (3 << 8) + 64, 32  # slightly skewed grid
    ht = halftone_region_seg(20, 18, gray, npat, hdpw, hdph, hgx=hgx,
                             hgy=hgy, hrx=hrx, hry=hry, enableskip=True)
    stream = page_info(20, 18) + dict_seg + ht
    out = _unpack(J.decode_jbig2(stream, None, 20, 18), 20, 18)
    expect = np.zeros((18, 20), np.uint8)
    for m in range(hgh):
        for n in range(hgw):
            px = (hgx + m * hry + n * hrx) >> 8
            py = (hgy + m * hrx - n * hry) >> 8
            if px + hdpw <= 0 or px >= 20 or py + hdph <= 0 or py >= 18:
                continue
            J._compose(expect, pats[int(gray[m, n])], px, py, 0)
    assert np.array_equal(out, expect)


def test_corrupted_streams_fail_cleanly():
    """Truncations and byte flips over every stream family must either
    decode or raise promptly — never hang or crash the process (the PDF
    image layer catches and falls back to the gray placeholder)."""
    rng = rnd(99)
    streams = []
    bm = (rng.rand(16, 20) < 0.4).astype(np.uint8)
    streams.append(page_info(20, 16) + generic_region_seg(bm))
    box = np.ones((6, 4), dtype=np.uint8)
    d1, o1 = symbol_dict_seg([box])
    streams.append(page_info(20, 16) + d1
                   + text_region_seg(20, 16, [(2, [(1, 0)])], nsyms=1,
                                     widths=(4,)))
    d2, o2 = huffman_symbol_dict_seg([box], mmr=True)
    streams.append(page_info(20, 16) + d2
                   + huffman_text_region_seg(20, 16, [(2, [(1, 0)])], o2))
    pd, pats = pattern_dict_seg(4, 4, 4)
    gray = rng.randint(0, 4, (3, 4)).astype(np.int64)
    streams.append(page_info(20, 16) + pd
                   + halftone_region_seg(20, 16, gray, 4, 4, 4))
    streams.append(_huffman_aggregate_stream()[0])
    for si, stream in enumerate(streams):
        for trial in range(60):
            mode = trial % 3
            data = bytearray(stream)
            if mode == 0:
                data = data[: rng.randint(1, len(data))]
            elif mode == 1:
                data[rng.randint(0, len(data))] ^= 1 << rng.randint(0, 8)
            else:
                data = data[: rng.randint(1, len(data))]
                if data:
                    data[rng.randint(0, len(data))] ^= 0xFF
            try:
                J.decode_jbig2(bytes(data), None, 20, 16)
            except Exception:
                pass  # clean failure is fine; hanging is not
