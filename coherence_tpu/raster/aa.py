"""Correlated-matte antialiasing (parity: reference ``polygon.ml:611-750``).

The reference precomputes a 32x32 truncated-Gaussian filter table, rasterizes
the polygon again at ``res/2 = 16``x scale, and for every fringe pixel sums
table entries under the scaled coverage mask within the 32x32 footprint —
i.e. AA coverage is exactly a **stride-16 valid convolution of the scaled
binary mask with the integer table**.  That is what we compute, on the MXU:
the mask in bf16 (0/1 exact), the table in bf16 (integers ≤ 255 exact), f32
accumulation (all partial sums are integers < 2^24, hence exact in any
order), so the per-pixel counts are bit-identical to the reference's nested
table lookups.

Opacity extraction follows ``polygon.ml:645-652``:
``opacity = (count*256 + volume/2) / volume`` with
``volume = (sum(table) * 256) / 255`` (integer division).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import colour as C
from . import region, scanline
from .region import NULL_SPRITE, Shape, Sprite, sprite_of_mask_rgba

# Antialiasing oversampling resolution and softness (polygon.ml:22-26).
res = 32
softness = 2.0
_H = res // 2  # 16: the scale factor of the AA mask (polygon.ml:676)


def _make_maintable() -> np.ndarray:
    """The truncated Gaussian on [-3, 3]^2, x255 (polygon.ml:616-629)."""
    t = np.zeros((res, res), dtype=np.int64)
    for x in range(1, res + 1):
        for y in range(1, res + 1):
            fx = ((x - 1) * 6.0) / (res - 1) - 3.0
            fy = ((y - 1) * 6.0) / (res - 1) - 3.0
            t[x - 1, y - 1] = int(math.exp(-(fx * fx + fy * fy) / softness) * 255.0)
    return t


maintable = _make_maintable()

# Volume under the footprint (polygon.ml:645-647): gaussian 1 res 1 res / 255.
volume = int(maintable.sum()) * 256 // 255


def opacity_of_tableval(t: int) -> int:
    """polygon.ml:650-652."""
    return (t + volume // 2) // volume


# The stride-16 32x32-footprint filter as a matmul: the footprint decomposes
# into the 2x2 neighbouring 16x16 blocks of the stride lattice, so
#   coverage[j, k] = sum_{db,da in {0,1}} <B[j+db, k+da, :], Wq[db, da]>
# where B are the mask's 16x16 blocks flattened to 256-vectors and Wq the
# kernel quadrants.  One (n, 256) @ (256, 4) matmul per tile — MXU-native on
# TPU, fast-compiling everywhere, and exact (0/1 inputs, integer weights
# <= 255, f32 partial sums < 2^24).  Weight at (row offset v, col offset u)
# is maintable[u][v] (see pixel_coverage polygon.ml:694-705: the first table
# index is x).
_K2 = maintable.T  # (v, u)
_WQ = np.stack(
    [
        _K2[0:_H, 0:_H].reshape(-1),
        _K2[0:_H, _H : 2 * _H].reshape(-1),
        _K2[_H : 2 * _H, 0:_H].reshape(-1),
        _K2[_H : 2 * _H, _H : 2 * _H].reshape(-1),
    ],
    axis=1,
)  # (256, 4): quadrant order (db, da) = (0,0), (0,1), (1,0), (1,1)
def matmul_dtype(platform: Optional[str] = None):
    """The coverage-GEMM input dtype for an execution platform: bf16 on an
    accelerator (MXU-native; 0/1 masks and integer weights <= 255 are exact),
    f32 on CPU (same exactness, faster there).  Resolved per CALL, not at
    import: one process can run the scalar path on the host and the fused
    path on the TPU at once (utils/placement.py)."""
    if platform is None:
        from ..utils import placement

        platform = placement.compute_platform()
    return jnp.float32 if platform == "cpu" else jnp.bfloat16


@functools.partial(jax.jit, static_argnames=("h", "w", "bf16"))
def _coverage_counts_jit(t_mask, *, h: int, w: int, bf16: bool):
    dt = jnp.bfloat16 if bf16 else jnp.float32
    # Trace-time constant: materializes on the executing device with the
    # program, never transferred between backends.
    wq = jnp.asarray(_WQ, dtype=dt)
    b = t_mask.reshape(h + 1, _H, w + 1, _H).transpose(0, 2, 1, 3)
    # Flatten the batch dims: XLA CPU compiles a (n, 256) @ (256, 4) GEMM in
    # seconds but takes ~100 s on the equivalent (h+1, w+1, 256) batched dot
    # (measured at h=w=128); same products, same per-element order, so
    # results are bit-identical.
    b = b.reshape((h + 1) * (w + 1), _H * _H).astype(dt)
    p = jnp.dot(b, wq, preferred_element_type=jnp.float32)
    p = p.reshape(h + 1, w + 1, 4)
    cov = p[:h, :w, 0] + p[:h, 1:, 1] + p[1:, :w, 2] + p[1:, 1:, 3]
    counts = jnp.round(cov).astype(jnp.int32)
    # opacity_of_tableval fused in (polygon.ml:650-652).
    return (counts * 256 + volume // 2) // volume


def _coverage_counts(t_mask, *, h: int, w: int, bf16: Optional[bool] = None):
    """Gaussian-table coverage sums of the scaled mask.

    t_mask: bool (16h+16, 16w+16) — scaled samples with origin at scaled
    coords (16*y0 - 32, 16*x0 - 32) for the pixel box origin (x0, y0).
    Returns int32 (h, w) per-pixel opacities (0..255).

    The dtype flag resolves OUTSIDE the jit cache (here, at call/trace
    time): a ``bf16=None`` default baked into the jit key would reuse a
    stale program when the same process later dispatches on the other
    backend.
    """
    if bf16 is None:
        bf16 = matmul_dtype() == jnp.bfloat16
    return _coverage_counts_jit(t_mask, h=h, w=w, bf16=bf16)


# Cap on the conv input size before we fall back to row-band chunking.
_MAX_T_ELEMS = 48 * 1024 * 1024  # bf16 elements (~96 MB)

# Span lists are padded to pow2 buckets so XLA compiles per bucket.
_SPAN_BUCKET_MIN = 512


def span_bucket(n: int, floor: int = _SPAN_BUCKET_MIN) -> int:
    """Pow2 bucket with a floor, so jit programs are reused across sizes."""
    return max(floor, 1 << (max(1, n) - 1).bit_length())


_span_bucket = span_bucket


def coverage_counts_from_spans_impl(rr, cc, vv, tr0, tc0, rmax, cmax, h, w):
    """Gaussian-table coverage from scaled-mask span lists (traceable body;
    call inside jit — see the jitted wrapper below).

    rr/cc/vv: int32 (2K,) difference-array scatter entries in absolute scaled
    coordinates (start col s carries +1, end col e+1 carries -1; padding rows
    are negative and dropped).  tr0/tc0: the t-plane origin in scaled coords.
    rmax/cmax: the logical extent inside the (16h+16, 16w+16) plane — spans
    are clipped to it so bucket padding contributes nothing.  Returns int32
    (h, w) per-pixel opacities (0..255).
    """
    th, tw = _H * h + _H, _H * w + _H
    r = rr - tr0
    # Out-of-window rows (above: r < 0, or beyond the logical extent:
    # r >= rmax) must be remapped to a LARGE positive index: with
    # mode="drop" JAX follows numpy semantics and WRAPS negative indices
    # (r = -1 would scatter into the plane's last row), so spans above a
    # chunked band's origin would alias into the band as phantom coverage.
    r = jnp.where((r >= 0) & (r < rmax), r, 1 << 30)
    c = jnp.clip(cc - tc0, 0, jnp.minimum(cmax, tw))
    diff = jnp.zeros((th, tw + 1), jnp.int32).at[r, c].add(vv, mode="drop")
    t_mask = jnp.cumsum(diff, axis=1)[:, :-1] > 0
    return _coverage_counts(t_mask, h=h, w=w)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _coverage_counts_from_spans(rr, cc, vv, tr0, tc0, rmax, cmax, *, h, w):
    return coverage_counts_from_spans_impl(rr, cc, vv, tr0, tc0, rmax, cmax, h, w)


def spans_to_scatter_np(scaled, kb: Optional[int] = None):
    """Host (rr, cc, vv) int32 scatter triples for the span difference
    array, padded to a pow2 bucket (pad rows are -2^30: below any shifted
    origin).  `scaled` may be None (all padding)."""
    rows, ss, ee = scaled if scaled is not None else (np.zeros(0),) * 3
    k = rows.shape[0]
    if kb is None:
        kb = _span_bucket(2 * k)
    assert 2 * k <= kb, (k, kb)
    rr = np.full(kb, -(1 << 30), dtype=np.int32)
    cc = np.zeros(kb, dtype=np.int32)
    vv = np.zeros(kb, dtype=np.int32)
    rr[:k] = rows
    rr[k : 2 * k] = rows
    cc[:k] = ss
    cc[k : 2 * k] = ee + 1
    vv[:k] = 1
    vv[k : 2 * k] = -1
    return rr, cc, vv


def _spans_to_scatter(scaled):
    rr, cc, vv = spans_to_scatter_np(scaled)
    return jnp.asarray(rr), jnp.asarray(cc), jnp.asarray(vv)


def coverage_opacity_bucketed(shape_box, scaled) -> jnp.ndarray:
    """Per-pixel AA opacity (0..255) over the pixel box `shape_box`, returned
    at the region bucket size ``bucket_hw(h, w)`` (values beyond the logical
    extent are zero).

    `scaled` is (rows, s, e) from scanline.scaled_spans_of_edgelist, in
    absolute scaled-pixel coordinates, or None for an empty mask.  The dense
    16x plane is expanded on device from the spans (a scatter + row cumsum),
    so only the span lists cross the host↔device link.

    All device shapes are bucketed so XLA compiles one kernel per bucket, not
    one per object.
    """
    x0, y0, x1, y1 = shape_box
    w, h = x1 - x0 + 1, y1 - y0 + 1
    hb, wb = region.bucket_hw(h, w)
    if scaled is None:
        return jnp.zeros((hb, wb), dtype=jnp.int32)
    rr, cc, vv = _spans_to_scatter(scaled)
    tc0 = _H * x0 - 2 * _H
    cmax = _H * w + _H  # logical column extent inside the t plane

    def band_opacity(by0: int, bh: int):
        """Opacity for pixel rows [y0+by0 .. y0+by0+bh-1] (bucketed bh)."""
        tr0 = _H * (y0 + by0) - 2 * _H  # t-plane origin in scaled coords
        rem = h - by0  # logical pixel rows remaining in this band
        rmax = (_H * min(bh, rem) + _H) if rem > 0 else 0
        return _coverage_counts_from_spans(
            rr, cc, vv,
            jnp.int32(tr0), jnp.int32(tc0), jnp.int32(rmax), jnp.int32(cmax),
            h=bh, w=wb,
        )

    t_elems = (_H * hb + _H) * (_H * wb + _H)
    if t_elems <= _MAX_T_ELEMS:
        return band_opacity(0, hb)
    # Chunk by bucketed row bands that tile hb exactly (hb is a power of two).
    band_h = 8
    while (_H * band_h * 2 + _H) * (_H * wb + _H) <= _MAX_T_ELEMS and band_h < hb:
        band_h *= 2
    chunks = [band_opacity(by, band_h) for by in range(0, hb, band_h)]
    return jnp.concatenate(chunks, axis=0)


def coverage_opacity(shape_box, scaled) -> jnp.ndarray:
    """Unbucketed (h, w) opacity — convenience for tests."""
    x0, y0, x1, y1 = shape_box
    w, h = x1 - x0 + 1, y1 - y0 + 1
    return coverage_opacity_bucketed(shape_box, scaled)[:h, :w]


@jax.jit
def _aa_sprite_rgba(mask, opacity, fill_rgba):
    dissolved = C.dissolve_rgba(fill_rgba, opacity)
    return jnp.where(mask[..., None], dissolved, 0)


def polygon_sprite_edgelist(fill, shp, edges: np.ndarray, winding: str):
    """AA sprite of an edge list within shape `shp` (polygon.ml:729-746).

    Every pixel of `shp` gets ``dissolve(fill(x, y), opacity)`` where opacity
    is the Gaussian-filtered coverage of the 16x-scaled polygon.
    """
    if shp is None:
        return NULL_SPRITE
    scaled = scanline.scaled_spans_of_edgelist(edges, winding, _H)
    H, W = shp.mask.shape
    opacity = coverage_opacity_bucketed(shp.box, scaled)
    assert opacity.shape == (H, W), (opacity.shape, shp.mask.shape)
    fill_rgba = fill.image_device(shp.box, H, W)
    rgba = _aa_sprite_rgba(shp.mask, opacity, fill_rgba)
    return Sprite(shp.box, shp.mask, rgba)


def polygon_sprite(fill, shp, path):
    """AA sprite of a path (polygon.ml:748-750)."""
    from ..geometry.path import edgelist_of_path

    return polygon_sprite_edgelist(fill, shp, edgelist_of_path(path), path.winding)
