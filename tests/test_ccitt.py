"""CCITTFaxDecode (PDF 7.4.6, ITU-T T.4/T.6) — parity with camlpdf's
Pdfcodec CCITT support.  Decode is cross-validated against libtiff (via
PIL's group3/group4 TIFF writers) and round-tripped against the included
Group-4 encoder; a CCITT-compressed image XObject renders end-to-end."""

import io
import zlib

import numpy as np
import pytest

from coherence_tpu.io.ccitt import ccitt_decode, ccitt_encode_g4
from coherence_tpu.io.pdf import Name, Stream, mkpage
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, pdfscene, render as R
from coherence_tpu.io import pdfgraphics as PG


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def _unpack(data, cols, rows):
    """Packed decoder output -> (rows, cols) ints with 1 = black
    (PDF default BlackIs1=false stores black as 0)."""
    a = np.unpackbits(np.frombuffer(data, np.uint8).reshape(rows, -1), axis=1)
    return 1 - a[:, :cols]


def _unpack_raw(data, cols, rows):
    """Packed decoder output -> raw bits (PDF convention: fax-white = 1)."""
    a = np.unpackbits(np.frombuffer(data, np.uint8).reshape(rows, -1), axis=1)
    return a[:, :cols]


def _tiff_strips(bm, compression):
    """Encode 1=black bitmap with libtiff; return [(raw, nrows)] strips.
    libtiff codes buffer-0 bits as fax-white and PIL mode '1' stores
    black pixels as buffer-0, so image-black pixels arrive as fax-white
    runs: the decoder's RAW bits (fax-white=1) equal bm directly."""
    from PIL import Image

    h, w = bm.shape
    img = Image.fromarray(((1 - bm) * 255).astype(np.uint8)).convert("1")
    buf = io.BytesIO()
    img.save(buf, format="TIFF", compression=compression)
    buf.seek(0)
    tif = Image.open(buf)
    rps = tif.tag_v2.get(278, h)
    raw = buf.getvalue()
    out = []
    for i, (o, c) in enumerate(zip(tif.tag_v2[273], tif.tag_v2[279])):
        out.append((raw[o : o + c], min(rps, h - i * rps)))
    return out, int(tif.tag_v2.get(292, 0))


def _decode_strips(strips, k, w):
    return b"".join(ccitt_decode(raw, k=k, columns=w, rows=n) for raw, n in strips)


def test_g4_roundtrip_own_encoder_fuzz():
    rng = np.random.default_rng(0)
    for _ in range(25):
        w = int(rng.integers(1, 90))
        h = int(rng.integers(1, 40))
        bm = (rng.random((h, w)) < rng.random()).astype(int)
        enc = ccitt_encode_g4([list(r) for r in bm], w)
        got = _unpack(ccitt_decode(enc, k=-1, columns=w, rows=h), w, h)
        assert (got == bm).all()


def test_g4_matches_libtiff():
    rng = np.random.default_rng(1)
    for _ in range(8):
        w = int(rng.integers(8, 220))
        h = int(rng.integers(1, 70))
        bm = (rng.random((h, w)) < 0.35).astype(np.uint8)
        strips, _ = _tiff_strips(bm, "group4")
        got = _unpack_raw(_decode_strips(strips, -1, w), w, h)
        assert (got == bm).all()


def test_g3_matches_libtiff():
    rng = np.random.default_rng(2)
    for _ in range(6):
        w = int(rng.integers(8, 300))
        h = int(rng.integers(1, 60))
        bm = (rng.random((h, w)) < 0.35).astype(np.uint8)
        strips, t4opts = _tiff_strips(bm, "group3")
        k = 1 if (t4opts & 1) else 0
        got = _unpack_raw(_decode_strips(strips, k, w), w, h)
        assert (got == bm).all()


def test_g4_structured_page():
    """A scan-like page (rules + a box) through multi-strip libtiff G4."""
    w, h = 1728, 400
    bm = np.zeros((h, w), np.uint8)
    bm[50:350, 100:200] = 1
    bm[::7, :] = 1
    strips, _ = _tiff_strips(bm, "group4")
    got = _unpack_raw(_decode_strips(strips, -1, w), w, h)
    assert (got == bm).all()


def test_black_is_1_inverts():
    bm = np.array([[1, 0, 1, 1, 0, 0, 0, 1]], dtype=int)
    enc = ccitt_encode_g4([list(bm[0])], 8)
    d0 = ccitt_decode(enc, k=-1, columns=8, rows=1, black_is_1=False)
    d1 = ccitt_decode(enc, k=-1, columns=8, rows=1, black_is_1=True)
    assert d0[0] ^ d1[0] == 0xFF


def test_ccitt_image_xobject_renders():
    """A G4-compressed 1-bpc DeviceGray XObject paints through the image
    pipeline: black pixels are 0 (BlackIs1 default) = gray 0."""
    w, h = 16, 8
    bm = np.zeros((h, w), np.uint8)
    bm[:, :8] = 1  # left half black
    enc = ccitt_encode_g4([list(r) for r in bm], w)
    img = Stream(
        {
            "Type": Name("XObject"),
            "Subtype": Name("Image"),
            "Width": w,
            "Height": h,
            "BitsPerComponent": 1,
            "ColorSpace": Name("DeviceGray"),
            "Filter": Name("CCITTFaxDecode"),
            "DecodeParms": {"K": -1, "Columns": w, "Rows": h},
        },
        enc,
    )
    pdf = mkpage(
        b"q 32 0 0 16 4 4 cm /Im0 Do Q",
        mediabox=(0, 0, 40, 24),
        resources={"XObject": {"Im0": img}},
    )
    g = PG.graphic_of_page(pdf, pdf.resolve(
        pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])["Kids"][0]))
    scene = pdfscene.scene_of_graphic(pdf, g)
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 40, 24)))
    assert spr is not None
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    # placed quad x in [4,36]; left half (image x<8) black, right white
    assert tuple(r4[12 - y0, 10 - x0]) == (0, 0, 0, 255)
    assert tuple(r4[12 - y0, 30 - x0]) == (255, 255, 255, 255)
