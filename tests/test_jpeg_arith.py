"""Arithmetic-coded JPEG (SOF9/SOF10) decode vs the PIL/libjpeg oracle.

Vectors are synthesized by tests/_arithenc.py (nothing bundled can encode
arithmetic JPEGs); each file is decoded by BOTH io/jpeg.py and PIL
(libjpeg-turbo, which ships the arithmetic decoder) and the pixel output
must be byte-identical — the same bar as the Huffman paths in
test_jpeg.py.  Corruption must fail cleanly (ValueError, never a hang).

Parity: camlpdf's DCTDecode passthrough covers the full T.81 codec
surface (/root/reference/Makefile:20); VERDICT r4 item 7.
"""

import io

import numpy as np
import pytest

from coherence_tpu.io import jpeg as J

from _arithenc import encode_jpeg_arith

PIL = pytest.importorskip("PIL.Image")


def _pil(data, ndim):
    im = PIL.open(io.BytesIO(data))
    ref = np.asarray(im.convert("L" if ndim == 2 else "RGB"))
    return ref[..., None] if ref.ndim == 2 else ref


def _check(img, **kw):
    data = encode_jpeg_arith(img, **kw)
    got = J.decode(data).pixels
    ref = _pil(data, img.ndim)
    assert got.shape == ref.shape
    assert np.array_equal(got, ref), (
        f"maxdiff {int(np.abs(got.astype(int) - ref.astype(int)).max())}"
    )
    return data


def _rng(seed):
    return np.random.default_rng(seed)


def test_sequential_gray():
    _check(_rng(1).integers(0, 256, (24, 17), np.uint8))


def test_sequential_rgb():
    _check(_rng(2).integers(0, 256, (16, 16, 3), np.uint8))


def test_sequential_subsampled_420():
    _check(_rng(3).integers(0, 256, (33, 29, 3), np.uint8),
           sampling=[(2, 2), (1, 1), (1, 1)])


def test_sequential_subsampled_422():
    _check(_rng(4).integers(0, 256, (16, 24, 3), np.uint8),
           sampling=[(2, 1), (1, 1), (1, 1)])


def test_sequential_restart_interval():
    _check(_rng(5).integers(0, 256, (40, 40), np.uint8), restart_interval=3)


def test_sequential_restart_interleaved():
    _check(_rng(6).integers(0, 256, (35, 37, 3), np.uint8),
           sampling=[(2, 2), (1, 1), (1, 1)], restart_interval=2)


def test_dac_conditioning():
    # Non-default L/U/Kx exercise the DAC marker and both conditioning
    # bounds in the DC context classifier.
    _check(_rng(7).integers(0, 256, (24, 24), np.uint8),
           dac={"dc": (1, 3), "ac": 12})


def test_progressive_gray():
    _check(_rng(8).integers(0, 256, (24, 17), np.uint8), progressive=True)


def test_progressive_rgb():
    _check(_rng(9).integers(0, 256, (21, 19, 3), np.uint8), progressive=True)


def test_progressive_subsampled():
    _check(_rng(10).integers(0, 256, (30, 26, 3), np.uint8),
           progressive=True, sampling=[(2, 2), (1, 1), (1, 1)])


def test_progressive_restart():
    _check(_rng(11).integers(0, 256, (26, 22), np.uint8),
           progressive=True, restart_interval=2)


def test_smooth_content():
    # Long zero runs / EOB-heavy blocks hit the run-mode branches.
    smooth = (np.mgrid[0:40, 0:40].sum(0) * 3 % 256).astype(np.uint8)
    _check(smooth)
    _check(smooth, progressive=True)


def test_truncation_and_bitflips_fail_cleanly():
    data = encode_jpeg_arith(_rng(12).integers(0, 256, (16, 16), np.uint8))
    for cut in (4, len(data) // 3, len(data) // 2):
        try:
            J.decode(data[:cut])  # zero-fed tail pixels are acceptable
        except ValueError:
            pass
    rng = _rng(13)
    for _ in range(40):
        mut = bytearray(data)
        i = int(rng.integers(2, len(mut)))
        mut[i] ^= 1 << int(rng.integers(0, 8))
        try:
            J.decode(bytes(mut))  # any pixels are fine; no hang/crash
        except ValueError:
            pass
