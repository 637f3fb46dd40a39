"""From-scratch JPEG 2000 decoder (io/jp2.py) vs the PIL/OpenJPEG oracle.

Reversible (5/3) streams must decode EXACTLY; irreversible (9/7) within
one code of OpenJPEG (both implementations round the same real-valued
reconstruction, so they may differ by 1 at .5 boundaries).  Corrupted
streams must fail cleanly (ValueError, never a hang or crash) — the same
bar as io/jpeg.py / io/jbig2.py / io/ccitt.py.

Parity: camlpdf links a full codec surface into the reference
(/root/reference/Makefile:20); JPXDecode is PDF 7.4.9.
"""

import io

import numpy as np
import pytest

from coherence_tpu.io import jp2 as J2

PIL = pytest.importorskip("PIL.Image")


def _encode(arr, mode="RGB", **save_kw):
    im = PIL.fromarray(arr, mode)
    buf = io.BytesIO()
    im.save(buf, "JPEG2000", **save_kw)
    return buf.getvalue()


def _planes(img):
    """Decoder output as (h, w, n) uint8 with alpha (if any) last."""
    order = [i for i in range(len(img.planes)) if i != img.alpha_index]
    if img.alpha_index is not None:
        order.append(img.alpha_index)
    return np.stack([img.planes[i] for i in order], axis=-1).astype(np.uint8)


def _pil_decode(data):
    ref = np.asarray(PIL.open(io.BytesIO(data)))
    if ref.ndim == 2:
        ref = ref[..., None]
    return ref


def _assert_match(data, atol=0):
    got = _planes(J2.decode(data))
    ref = _pil_decode(data)
    assert got.shape == ref.shape
    diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= atol, (
        f"max diff {diff.max()} > {atol} at "
        f"{np.unravel_index(diff.argmax(), diff.shape)}"
    )


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# Reversible 5/3: exact
# ---------------------------------------------------------------------------


def test_lossless_rgb_noise():
    a = _rng(1).integers(0, 256, (37, 53, 3), dtype=np.uint8)
    _assert_match(_encode(a, irreversible=False))


def test_lossless_gray():
    a = _rng(2).integers(0, 256, (41, 29), dtype=np.uint8)
    _assert_match(_encode(a, "L", irreversible=False))


def test_lossless_rgba_cdef_alpha():
    a = _rng(3).integers(0, 256, (24, 31, 4), dtype=np.uint8)
    data = _encode(a, "RGBA", irreversible=False)
    img = J2.decode(data)
    assert img.alpha_index is not None
    _assert_match(data)


def test_lossless_smooth_gradient():
    # Smooth content exercises long zero-runs / insignificant codeblocks.
    y, x = np.mgrid[0:64, 0:80]
    a = np.stack([(x * 3) % 256, (y * 2) % 256, ((x + y)) % 256], -1).astype(
        np.uint8
    )
    _assert_match(_encode(a, irreversible=False))


def test_raw_j2k_codestream():
    a = _rng(4).integers(0, 256, (19, 23, 3), dtype=np.uint8)
    _assert_match(_encode(a, irreversible=False, no_jp2=True))


def test_multiple_tiles():
    a = _rng(5).integers(0, 256, (50, 70, 3), dtype=np.uint8)
    _assert_match(_encode(a, irreversible=False, tile_size=(16, 16)))


@pytest.mark.parametrize("prog", ["LRCP", "RLCP", "RPCL"])
def test_progression_orders(prog):
    a = _rng(6).integers(0, 256, (33, 47, 3), dtype=np.uint8)
    _assert_match(_encode(a, irreversible=False, progression=prog))


def test_num_resolutions():
    a = _rng(7).integers(0, 256, (40, 40, 3), dtype=np.uint8)
    for nres in (1, 3, 6):
        _assert_match(_encode(a, irreversible=False, num_resolutions=nres))


def test_odd_and_tiny_dims():
    for shape in [(1, 1), (1, 7), (5, 1), (3, 3), (2, 9)]:
        a = _rng(sum(shape)).integers(0, 256, shape + (3,), dtype=np.uint8)
        _assert_match(_encode(a, irreversible=False))


def test_quality_layers_lossless_final():
    # Multiple layers, last lossless: full decode is still exact.
    a = _rng(8).integers(0, 256, (30, 30, 3), dtype=np.uint8)
    _assert_match(_encode(a, irreversible=False, quality_layers=[80, 40, 0]))


# ---------------------------------------------------------------------------
# Irreversible 9/7: within one code of OpenJPEG
# ---------------------------------------------------------------------------


def test_irreversible_rgb():
    a = _rng(9).integers(0, 256, (37, 53, 3), dtype=np.uint8)
    _assert_match(_encode(a, irreversible=True), atol=1)


def test_irreversible_gray_quality():
    a = _rng(10).integers(0, 256, (48, 32), dtype=np.uint8)
    _assert_match(_encode(a, "L", irreversible=True, quality_layers=[45]), atol=1)


def test_irreversible_tiled():
    a = _rng(11).integers(0, 256, (40, 56, 3), dtype=np.uint8)
    _assert_match(
        _encode(a, irreversible=True, tile_size=(32, 32), quality_layers=[50]),
        atol=1,
    )


# ---------------------------------------------------------------------------
# Robustness: corruption fails cleanly
# ---------------------------------------------------------------------------


def test_truncation_raises_cleanly():
    a = _rng(12).integers(0, 256, (20, 20, 3), dtype=np.uint8)
    data = _encode(a, irreversible=False)
    for cut in (4, len(data) // 3, len(data) // 2):
        with pytest.raises(ValueError):
            J2.decode(data[:cut])


def test_byte_flip_never_hangs():
    a = _rng(13).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = bytearray(_encode(a, irreversible=False))
    rng = _rng(14)
    for _ in range(40):
        mut = bytearray(data)
        i = int(rng.integers(0, len(mut)))
        mut[i] ^= 1 << int(rng.integers(0, 8))
        try:
            J2.decode(bytes(mut))  # any pixels are fine; no hang/crash
        except ValueError:
            pass


def test_garbage_raises():
    with pytest.raises(ValueError):
        J2.decode(b"not a jp2 stream at all")
    with pytest.raises(ValueError):
        J2.decode(b"")
