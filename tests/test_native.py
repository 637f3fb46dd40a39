"""Native runtime tests: C++ path vs pure-Python fallback equivalence."""

import numpy as np
import pytest

from coherence_tpu import native_lib as N
from coherence_tpu.gui import wire

RNG = np.random.default_rng(5)


def random_boxes(n):
    x0 = RNG.integers(-50, 200, n)
    y0 = RNG.integers(-50, 200, n)
    w = RNG.integers(0, 80, n)
    h = RNG.integers(0, 80, n)
    return np.stack([x0, y0, x0 + w, y0 + h], axis=-1).astype(np.int32)


def test_native_builds():
    assert N.available(), "native library failed to build"


def test_overlap_filter_matches_python():
    boxes = random_boxes(500)
    q = (20, 30, 120, 140)
    got = N.boxes_overlap_filter(boxes, q)
    expect = (
        (boxes[:, 0] <= q[2]) & (q[0] <= boxes[:, 2]) & (boxes[:, 1] <= q[3]) & (q[1] <= boxes[:, 3])
    )
    assert np.array_equal(got, expect)


def test_union_reduce():
    boxes = random_boxes(100)
    got = N.boxes_union_reduce(boxes)
    assert got == (
        int(boxes[:, 0].min()), int(boxes[:, 1].min()),
        int(boxes[:, 2].max()), int(boxes[:, 3].max()),
    )


def test_blit_masked_rgb():
    fb = np.zeros((40, 60, 3), dtype=np.uint8)
    rgba = RNG.integers(0, 256, (10, 12, 4)).astype(np.int32)
    mask = RNG.random((10, 12)) < 0.5
    N.blit_masked_rgb(fb, rgba, mask, 5, 7)
    expect = np.zeros_like(fb)
    sub = expect[5:15, 7:19]
    sub[mask] = rgba[..., :3].astype(np.uint8)[mask]
    assert np.array_equal(fb, expect)
    # Clipped blit at a negative offset does not crash and clips correctly.
    fb2 = np.zeros((40, 60, 3), dtype=np.uint8)
    N.blit_masked_rgb(fb2, rgba, mask, -3, -4)
    expect2 = np.zeros_like(fb2)
    sub2 = expect2[0:7, 0:8]
    m2 = mask[3:, 4:]
    sub2[m2] = rgba[3:, 4:, :3].astype(np.uint8)[m2]
    assert np.array_equal(fb2, expect2)


def test_encode_refresh_frame_matches_python_wire():
    fb = RNG.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    frame = N.encode_refresh_frame(fb, 3, 5, 7, 11, 13)
    data = fb[7:20, 5:16].tobytes()
    expect = wire.marshall(["RefreshWindow", 3, 5, 7, 11, 13, data])
    assert frame == expect
    # And it round-trips through the decoder.
    n, v = wire.unmarshall(frame)
    assert v[0] == b"RefreshWindow" and v[1:6] == [3, 5, 7, 11, 13] and v[6] == data


def test_fb_diff_bbox():
    a = np.zeros((30, 40, 3), dtype=np.uint8)
    b = a.copy()
    assert N.fb_diff_bbox(a, b) is None
    b[10, 5] = [1, 2, 3]
    b[20, 33] = [4, 5, 6]
    assert N.fb_diff_bbox(a, b) == (5, 10, 33, 20)
