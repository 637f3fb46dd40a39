"""JPX breadth (VERDICT r4 item 4): subsampling, palettes, and every
codeblock style, decoded by io/jp2.py and cross-checked against the
PIL/OpenJPEG oracle.

PIL cannot ENCODE any of these features, so vectors come from the
first-party encoder io/jp2enc.py; each file is decoded by BOTH decoders
and compared exactly (lossless 5/3 end to end).  The encoder work also
exposed two latent decoder bugs now regression-guarded here: the 5/3
synthesis dropped the even sample below an odd region origin
(jp2._sr_1d), and precinct->band mapping halved the CLIPPED precinct
rect where OpenJPEG halves the lattice cell (jp2._precincts) — both
only reachable through offset tiles at deep decomposition levels.

Parity: camlpdf's JPXDecode passthrough tolerance,
/root/reference/Makefile:20.
"""

import io

import numpy as np
import pytest

from coherence_tpu.io import jp2 as J2
from coherence_tpu.io import jp2enc as E

PIL = pytest.importorskip("PIL.Image")


def _pil(data, mode=None):
    im = PIL.open(io.BytesIO(data))
    if mode:
        im = im.convert(mode)
    a = np.asarray(im)
    return a[..., None] if a.ndim == 2 else a


def _rng(seed):
    return np.random.default_rng(seed)


def _check(planes, pil_mode=None, **kw):
    """Encode -> decode with both decoders; all planes must round-trip
    exactly and match PIL exactly."""
    planes = [np.asarray(p, np.int64) for p in planes]
    data = E.encode(planes, **kw)
    img = J2.decode(data)
    for got, want in zip(img.planes, planes):
        assert np.array_equal(got, want), "self round-trip not exact"
    ref = _pil(data, pil_mode)
    # PIL/OpenJPEG replicates subsampled components onto the full grid;
    # full_planes() is that same mapping.
    mine = np.stack(img.full_planes(), -1)
    assert mine.shape == ref.shape, (mine.shape, ref.shape)
    assert np.array_equal(mine, ref), (
        f"PIL differs: {int((mine != ref).any(-1).sum())} px"
    )
    return img


# ---------------------------------------------------------------------------
# Codeblock styles (T.800 COD flags)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "style",
    [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x05, 0x09, 0x0D, 0x3F],
    ids=["bypass", "resetctx", "termall", "vsc", "pterm", "segsym",
         "bypass+termall", "bypass+vsc", "bypass+termall+vsc", "all"],
)
def test_codeblock_styles(style):
    g = _rng(style).integers(0, 256, (40, 56), np.uint8)
    _check([g], cbstyle=style)


def test_bypass_small_codeblocks():
    # 16x16 codeblocks: many blocks, raw segments ending mid-byte.
    a = [_rng(20).integers(0, 256, (33, 47), np.uint8) for _ in range(3)]
    _check(a, cbstyle=0x01, cb_size=(16, 16))


def test_styles_smooth_content():
    # Long runs: run-length cleanup mode + mostly-empty raw passes.
    y, x = np.mgrid[0:48, 0:40]
    smooth = ((x + y) // 4 % 256).astype(np.uint8)
    for st in (0x01, 0x0D, 0x3F):
        _check([smooth], cbstyle=st)


# ---------------------------------------------------------------------------
# Component subsampling
# ---------------------------------------------------------------------------


def test_subsampling_420():
    r = _rng(30)
    y = r.integers(0, 256, (40, 56), np.uint8)
    cb = r.integers(0, 256, (20, 28), np.uint8)
    cr = r.integers(0, 256, (20, 28), np.uint8)
    img = _check([y, cb, cr], subs=[(1, 1), (2, 2), (2, 2)])
    # full_planes replicates each chroma sample over its 2x2 cell
    fp = img.full_planes()
    assert fp[1].shape == (40, 56)
    assert np.array_equal(fp[1][::2, ::2], cb)
    assert np.array_equal(fp[1][1::2, 1::2], cb)


def test_subsampling_422_odd_dims():
    # No PIL cross-check here: PIL's Jpeg2KImagePlugin mis-packs
    # subsampled components whose doubled width (54) exceeds an odd
    # image width (53) — rows bleed boundary samples (verified: its
    # "extra" leading pixels are the previous row's last chroma sample).
    # The ceil-division size and replication mapping asserted below are
    # T.800 B.2, and the even-dims cases cross-check PIL exactly.
    r = _rng(31)
    y = r.integers(0, 256, (37, 53), np.uint8)
    c1 = r.integers(0, 256, (37, 27), np.uint8)  # ceil(53/2)
    c2 = r.integers(0, 256, (37, 27), np.uint8)
    planes = [np.asarray(p, np.int64) for p in (y, c1, c2)]
    data = E.encode(planes, subs=[(1, 1), (2, 1), (2, 1)])
    img = J2.decode(data)
    for got, want in zip(img.planes, planes):
        assert np.array_equal(got, want)
    fp = img.full_planes()
    assert fp[1].shape == (37, 53)
    assert np.array_equal(fp[1][:, ::2], c1)
    assert np.array_equal(fp[1][:, 1::2], c1[:, :26])


def test_subsampling_with_tiles_and_styles():
    r = _rng(32)
    y = r.integers(0, 256, (32, 48), np.uint8)
    cb = r.integers(0, 256, (16, 24), np.uint8)
    cr = r.integers(0, 256, (16, 24), np.uint8)
    _check([y, cb, cr], subs=[(1, 1), (2, 2), (2, 2)], tile=(16, 16),
           cbstyle=0x01)


# ---------------------------------------------------------------------------
# Palettes (pclr/cmap)
# ---------------------------------------------------------------------------


def test_palette_rgb():
    r = _rng(40)
    pal = r.integers(0, 256, (16, 3), np.uint8)
    idx = r.integers(0, 16, (24, 31), np.uint8)
    data = E.encode([idx.astype(np.int64)], palette=pal)
    img = J2.decode(data)
    assert len(img.planes) == 3
    want = pal[idx]
    mine = np.stack(img.planes, -1)
    assert np.array_equal(mine, want)
    assert np.array_equal(mine, _pil(data, "RGB"))
    rgb, alpha = img.rgba8()
    assert alpha is None and rgb.shape == (24, 31, 3)


def test_palette_256_entries():
    r = _rng(41)
    pal = r.integers(0, 256, (256, 3), np.uint8)
    idx = r.integers(0, 256, (19, 23), np.uint8)
    data = E.encode([idx.astype(np.int64)], palette=pal)
    img = J2.decode(data)
    assert np.array_equal(np.stack(img.planes, -1), pal[idx])
    assert np.array_equal(np.stack(img.planes, -1), _pil(data, "RGB"))


def test_palette_out_of_range_index_clamps():
    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    idx = np.full((4, 4), 7, np.uint8)
    data = bytearray(E.encode([idx.astype(np.int64)], palette=pal))
    img = J2.decode(bytes(data))  # in-range file decodes fine
    assert img.planes[0][0, 0] == pal[7, 0]


# ---------------------------------------------------------------------------
# Tiling regressions (the two latent decoder bugs)
# ---------------------------------------------------------------------------


def test_offset_tiles_deep_levels():
    # Tile origin 16 with 5 decomposition levels reaches odd-origin
    # regions: exercises the _sr_1d odd-i0 even-step fix AND the
    # precinct-lattice band mapping fix.  PIL cross-checks both.
    a = _rng(50).integers(0, 256, (33, 47), np.uint8)
    for lv in (4, 5):
        _check([a], tile=(16, 16), levels=lv)


def test_tiles_rgb_mct():
    a = [_rng(51).integers(0, 256, (33, 47), np.uint8) for _ in range(3)]
    _check(a, tile=(16, 16), mct=True)


def test_raw_codestream_no_container():
    a = _rng(52).integers(0, 256, (21, 17), np.uint8)
    data = E.encode([a.astype(np.int64)], container=False)
    assert data[:2] == b"\xff\x4f"
    assert np.array_equal(J2.decode(data).planes[0], a)


# ---------------------------------------------------------------------------
# Robustness of the new paths
# ---------------------------------------------------------------------------


def test_styled_streams_corruption_fails_cleanly():
    a = _rng(60).integers(0, 256, (24, 24), np.uint8)
    data = E.encode([a.astype(np.int64)], cbstyle=0x3F)
    for cut in (30, len(data) // 2):
        try:
            J2.decode(data[:cut])
        except ValueError:
            pass
    rng = _rng(61)
    for _ in range(30):
        mut = bytearray(data)
        i = int(rng.integers(0, len(mut)))
        mut[i] ^= 1 << int(rng.integers(0, 8))
        try:
            J2.decode(bytes(mut))  # any pixels fine; no hang/crash
        except ValueError:
            pass


@pytest.mark.parametrize("prog", [3, 4], ids=["PCRL", "CPRL"])
def test_position_progressions(prog):
    a = [_rng(90 + prog).integers(0, 256, (33, 40), np.uint8)
         for _ in range(3)]
    _check(a, prog=prog)


def test_poc_progression_order_changes():
    # Two POC entries: resolutions 0-1 CPRL first, the rest RLCP — the
    # B.12.2 volume walk with the no-repeat rule; also by-component
    # splits, tiles, and combined with bypass+vsc codeblock styles.
    a = [_rng(91).integers(0, 256, (33, 40), np.uint8) for _ in range(3)]
    _check(a, poc=[(0, 0, 1, 2, 3, 4), (2, 0, 1, 6, 3, 1)])
    _check(a, poc=[(0, 0, 1, 6, 1, 0), (0, 1, 1, 6, 3, 4)])
    _check(a, tile=(16, 16), poc=[(0, 0, 1, 3, 3, 2), (3, 0, 1, 6, 3, 0)])
    _check(a, cbstyle=0x09, poc=[(0, 0, 1, 2, 3, 4), (2, 0, 1, 6, 3, 1)])


def test_sycc_converts_to_rgb():
    # colr enum 18 (sYCC): rgba8 applies the BT.601 full-range matrix;
    # OpenJPEG truncates where we round, so within 2 codes.
    r = _rng(80)
    y = r.integers(16, 240, (24, 32), np.uint8)
    cb = r.integers(16, 240, (24, 32), np.uint8)
    cr = r.integers(16, 240, (24, 32), np.uint8)
    for subs, planes in [
        (None, (y, cb, cr)),
        ([(1, 1), (2, 2), (2, 2)], (y, cb[::2, ::2], cr[::2, ::2])),
    ]:
        data = E.encode(
            [np.asarray(p, np.int64) for p in planes],
            subs=subs, enum_cs=18,
        )
        img = J2.decode(data)
        assert img.colorspace == "ycc"
        rgb, _ = img.rgba8()
        mine = np.round(rgb * 255).astype(np.int32)
        ref = _pil(data, "RGB").astype(np.int32)
        assert np.abs(mine - ref).max() <= 2


def test_pdf_jpx_subsampled_paints():
    # A subsampled JPX through the PDF image path (pdfimages.rgba_of_image).
    from coherence_tpu.io import pdfimages as PI
    from coherence_tpu.io.pdf import Name, Stream

    r = _rng(70)
    y = r.integers(0, 256, (16, 24), np.uint8)
    cb = r.integers(0, 256, (8, 12), np.uint8)
    cr = r.integers(0, 256, (8, 12), np.uint8)
    data = E.encode([y, cb, cr], subs=[(1, 1), (2, 2), (2, 2)])
    img = Stream(
        {"Type": Name("XObject"), "Subtype": Name("Image"),
         "Width": 24, "Height": 16, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceRGB"), "Filter": Name("JPXDecode")},
        bytes(data),
    )
    tex = PI.rgba_of_image(None, img.dict, img.raw)
    assert tex.shape == (16, 24, 4)
    # channel 0 is full-res Y exactly; chroma replicated
    assert np.array_equal(tex[..., 0], y)
    assert np.array_equal(tex[::2, ::2, 1], cb)
