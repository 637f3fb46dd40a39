"""From-scratch JPEG decoder (io/jpeg.py) vs the PIL/libjpeg oracle.

The decoder must be BYTE-IDENTICAL to libjpeg's default decode path
(islow IDCT + fancy upsampling + fixed-point colour) on every JPEG PIL
can produce, and must fail cleanly (ValueError, never a hang or crash)
on corrupted streams — the same bar as io/jbig2.py / io/ccitt.py.

Parity: camlpdf links a full codec surface into the reference
(/root/reference/Makefile:20); DCTDecode is the most common image codec
in real PDFs.
"""

import io

import numpy as np
import pytest

from coherence_tpu.io import jpeg as J

PIL = pytest.importorskip("PIL.Image")


def _pil_bytes(arr, mode="RGB", **save_kw):
    im = PIL.fromarray(arr, mode)
    buf = io.BytesIO()
    im.save(buf, "JPEG", **save_kw)
    return buf.getvalue()


def _pil_decode(data):
    ref = np.asarray(PIL.open(io.BytesIO(data)))
    if ref.ndim == 2:
        ref = ref[..., None]
    return ref


def _assert_identical(data):
    got = J.decode(data).pixels
    ref = _pil_decode(data)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def _noise(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, (h, w, c) if c > 1 else (h, w), dtype=np.uint8)
    return a


def _smooth(h, w):
    x = np.linspace(0, 6, w)[None, :]
    y = np.linspace(0, 6, h)[:, None]
    arr = np.stack(
        [np.sin(x + y), np.cos(x * y / 3), np.sin(x) * np.cos(y)], -1
    )
    return ((arr + 1) * 127.5).astype(np.uint8)


# --- baseline / progressive / subsampling ------------------------------------


@pytest.mark.parametrize("subsampling", [0, 1, 2])
@pytest.mark.parametrize("size", [(48, 64), (13, 17), (8, 8)])
def test_baseline_subsampling(size, subsampling):
    h, w = size
    _assert_identical(
        _pil_bytes(_noise(h, w), quality=85, subsampling=subsampling)
    )


@pytest.mark.parametrize("subsampling", [0, 2])
@pytest.mark.parametrize("size", [(48, 64), (13, 17)])
def test_progressive(size, subsampling):
    h, w = size
    _assert_identical(
        _pil_bytes(
            _noise(h, w), quality=80, progressive=True, subsampling=subsampling
        )
    )


@pytest.mark.parametrize(
    "size", [(1, 1), (1, 33), (33, 1), (2, 40), (40, 2), (3, 40), (5, 7)]
)
def test_tiny_and_threshold_sizes(size):
    # w<=2 downsampled chroma takes libjpeg's plain-replication path
    # (fancy only when downsampled_width > 2, jdsample.c); w=3 is the
    # first fancy width.  Heights exercise the h2v2 row pairing.
    h, w = size
    for ss in (0, 1, 2):
        _assert_identical(
            _pil_bytes(_smooth(h, w), quality=85, subsampling=ss)
        )
    _assert_identical(_pil_bytes(_smooth(h, w), quality=85, progressive=True))


def test_grayscale_baseline_and_progressive():
    for kw in ({}, {"progressive": True}):
        _assert_identical(
            _pil_bytes(_noise(48, 64, c=1), mode="L", quality=90, **kw)
        )


def test_quality_extremes():
    # quality=1 forces huge quant values; q100 keeps everything.
    _assert_identical(_pil_bytes(_noise(24, 31), quality=1, subsampling=2))
    _assert_identical(_pil_bytes(_noise(24, 31), quality=100, subsampling=0))


def test_optimized_huffman():
    _assert_identical(
        _pil_bytes(_noise(40, 40), quality=92, optimize=True, subsampling=2)
    )
    _assert_identical(
        _pil_bytes(_noise(40, 40), quality=92, optimize=True, progressive=True)
    )


def test_restart_markers():
    arr = _noise(120, 160)
    for kw in (
        {"restart_marker_blocks": 1},
        {"restart_marker_blocks": 5},
        {"restart_marker_rows": 1},
        {"restart_marker_blocks": 3, "progressive": True},
    ):
        _assert_identical(_pil_bytes(arr, quality=80, subsampling=2, **kw))


def test_rgb_no_transform():
    # keep_rgb writes an Adobe APP14 transform=0 JPEG (components stay RGB).
    _assert_identical(_pil_bytes(_noise(32, 32), quality=85, keep_rgb=True))


def test_cmyk_adobe():
    im = PIL.fromarray(_noise(48, 64)).convert("CMYK")
    for kw in ({}, {"progressive": True}):
        buf = io.BytesIO()
        im.save(buf, "JPEG", quality=85, **kw)
        data = buf.getvalue()
        dec = J.decode(data)
        assert dec.n_components == 4
        # PIL's CMYK unpacker un-inverts Adobe JPEGs; ours returns true
        # CMYK directly — the two must agree byte-for-byte.
        np.testing.assert_array_equal(dec.pixels, _pil_decode(data))


# --- structure / metadata ------------------------------------------------------


def test_decoded_metadata():
    d = J.decode(_pil_bytes(_noise(16, 16), quality=85))
    assert d.n_components == 3
    d = J.decode(_pil_bytes(_noise(16, 16, c=1), mode="L", quality=85))
    assert d.n_components == 1


def test_not_a_jpeg():
    with pytest.raises(ValueError):
        J.decode(b"not a jpeg at all")
    with pytest.raises(ValueError):
        J.decode(b"")


def test_corruption_fuzz_fails_cleanly():
    # Mutated streams must raise ValueError or decode to SOME array —
    # never hang, never raise anything else (same bar as JBIG2 fuzz).
    base = bytearray(_pil_bytes(_noise(24, 24), quality=80, subsampling=2))
    rng = np.random.default_rng(42)
    for _ in range(120):
        data = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            i = int(rng.integers(2, len(data)))
            data[i] = int(rng.integers(0, 256))
        try:
            out = J.decode(bytes(data))
            assert out.pixels.dtype == np.uint8
        except ValueError:
            pass


def test_truncation_fuzz_fails_cleanly():
    base = _pil_bytes(_noise(24, 24), quality=80, progressive=True)
    for n in range(2, len(base), max(1, len(base) // 60)):
        try:
            J.decode(base[:n])
        except ValueError:
            pass


# --- the PDF DCTDecode path goes through io/jpeg.py ----------------------------


def test_pdfimages_dct_uses_from_scratch_decoder(monkeypatch):
    from coherence_tpu.io import pdfimages

    called = {}
    real = J.decode

    def spy(data):
        called["yes"] = True
        return real(data)

    monkeypatch.setattr(J, "decode", spy)
    data = _pil_bytes(_noise(8, 8), quality=85)
    rgb, alpha = pdfimages._pil_rgb("DCTDecode", data, 8, 8)
    assert called.get("yes")
    assert rgb.shape == (8, 8, 3) and alpha is None
    ref = _pil_decode(data).astype(np.float64) / 255.0
    np.testing.assert_array_equal(rgb, ref)
