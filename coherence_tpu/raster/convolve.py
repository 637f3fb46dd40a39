"""Convolution kernels over sprites (parity: reference ``convolve.ml``).

Three kernel classes with the reference's exact integer arithmetic:

* ``UnitKernel r``  — box kernel; the reference slides a window in O(1)/pixel
  (convolve.ml:160-204); here an exact box sum via two 1D passes.
* ``XYKernel``      — separable (e.g. Gaussian, convolve.ml:57-70): 1D x-pass
  then 1D y-pass with per-pass integer division and the reference's channel
  clamping quirk (r and g clamped to alpha, b NOT — convolve.ml:115-119).
* ``FullKernel``    — dense square kernel.  (The reference's per-point writer
  has an index bug, convolve.ml:108 writes (y-1, y-1); we implement the
  intended (y-1, x-1).)

Passes run as XLA convolutions in f32 with integer weights.  When a pass's
maximum possible accumulator exceeds 2^24 (f32 exact-integer range) the
weights are split into high/low bytes and two exact convolutions are summed
in int32, keeping results bit-identical to integer arithmetic at any radius.

Semantics of convolving "within a shape" (convolve.ml:207-232): the x-pass
writes only pixels inside the shape (reads may come from outside), and the
y-pass reads that mixed canvas — reproduced with masked selects.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .. import colour as C
from . import region
from .region import NULL_SPRITE, Canvas, Shape, Sprite


@dataclass(frozen=True)
class FullKernel:
    radius: int
    total: int
    values: tuple  # (2r+1, 2r+1) nested tuples of ints


@dataclass(frozen=True)
class XYKernel:
    radius: int
    total: int
    values: tuple  # (2r+1,) ints


@dataclass(frozen=True)
class UnitKernel:
    radius: int


Kernel = Union[FullKernel, XYKernel, UnitKernel]


def mkunit(r: int) -> UnitKernel:
    if r <= 0:
        raise ValueError("mkunit: radius must be positive")
    return UnitKernel(r)


def mkxy(r: int, f) -> XYKernel:
    if r <= 0:
        raise ValueError("mkxy: radius must be positive")
    vals = tuple(f(i - r) for i in range(2 * r + 1))
    return XYKernel(r, sum(vals), vals)


def mkfull(r: int, f) -> FullKernel:
    if r <= 0:
        raise ValueError("mkfull: radius must be positive")
    rows = tuple(tuple(f(i - r, j - r) for i in range(2 * r + 1)) for j in range(2 * r + 1))
    return FullKernel(r, sum(map(sum, rows)), rows)


def _gaussian(r: int, x: int, y: int) -> int:
    # convolve.ml:60-64: 4r^2 * exp(-(x/r)^2 - (y/r)^2) / 2, rounded.
    sq = lambda v: v * v
    g = math.exp(-(sq(x / r) + sq(y / r))) / 2.0
    return int(4 * r * r * g + 0.5)


def mkgaussian(r: int) -> XYKernel:
    """Gaussian separable kernel (convolve.ml:67-70)."""
    return mkxy(r, lambda x: _gaussian(r, x, 0))


def radius_of_kernel(k: Kernel) -> int:
    return k.radius


# ---------------------------------------------------------------------------
# Exact integer 1D/2D convolution via f32 convs (with hi/lo split if needed)
# ---------------------------------------------------------------------------


def _weight_limbs(w) -> list:
    """Base-256 digit planes of non-negative integer weights.

    Exactness on the MXU by construction: TPU convs at DEFAULT precision
    truncate f32 inputs to bf16, which represents integers exactly only up
    to 256 — a weight like 319 (the radius-16 Gaussian table) silently
    loses bits.  Splitting every weight into 8-bit digits makes each
    multiplicand bf16-exact, each product < 2^16, and each per-limb f32
    accumulator sum(digits)*255 < 2^24 for any realistic tap count, so the
    DEFAULT-precision conv is bit-exact without paying for HIGHEST."""
    w = [int(v) for v in np.asarray(w, dtype=np.int64).reshape(-1)]
    assert all(v >= 0 for v in w), "weights must be non-negative"
    limbs = []
    shift = 0
    while any(v >> shift for v in w) or shift == 0:
        digits = [(v >> shift) & 0xFF for v in w]
        assert sum(digits) * 255 < (1 << 24), "limb accumulator overflow"
        limbs.append((shift, digits))
        shift += 8
    return limbs


@functools.partial(jax.jit, static_argnames=("weights", "axis"))
def _conv1d_exact(img, *, weights: tuple, axis: int):
    """Exact integer correlation of int32 (H, W, 4) along axis (0=y, 1=x)
    with SAME zero padding.  weights: tuple of python ints (non-negative);
    input values must fit in a byte (0..255)."""
    w = np.asarray(weights, dtype=np.int64)
    x = img.astype(jnp.float32)
    n = len(weights)
    pad = (n - 1) // 2

    def conv_with(wvals):
        k = jnp.asarray(np.asarray(wvals, dtype=np.float32))
        kern = k.reshape(n, 1, 1, 1) if axis == 0 else k.reshape(1, n, 1, 1)
        padding = ((pad, pad), (0, 0)) if axis == 0 else ((0, 0), (pad, pad))
        out = jax.lax.conv_general_dilated(
            x.transpose(2, 0, 1)[:, :, :, None],  # channels as batch: (4,H,W,1)
            kern,
            window_strides=(1, 1),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return out[:, :, :, 0].transpose(1, 2, 0)

    total = None
    for shift, digits in _weight_limbs(w):
        part = jnp.round(conv_with(digits)).astype(jnp.int32) << shift
        total = part if total is None else total + part
    return total


@functools.partial(jax.jit, static_argnames=("weights",))
def _conv2d_exact(img, *, weights: tuple):
    """Exact integer 2D correlation of int32 (H, W, 4), SAME zero padding.
    Byte-limb split as in _conv1d_exact (MXU bf16-exactness)."""
    w = np.asarray(weights, dtype=np.int64)
    n = w.shape[0]
    x = img.astype(jnp.float32)
    pad = (n - 1) // 2

    def conv_with(wvals):
        k = jnp.asarray(np.asarray(wvals, dtype=np.float32).reshape(n, n, 1, 1))
        out = jax.lax.conv_general_dilated(
            x.transpose(2, 0, 1)[:, :, :, None],
            k,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return out[:, :, :, 0].transpose(1, 2, 0)

    total = None
    for shift, digits in _weight_limbs(w):
        part = jnp.round(conv_with(digits)).astype(jnp.int32) << shift
        total = part if total is None else total + part
    return total


def _setcanvas_xy(sums, total: int):
    """Integer divide + the reference's channel clamp (convolve.ml:115-119):
    r, g clamped to alpha; b deliberately NOT (the `min tb tb` quirk)."""
    q = sums // total
    ta = q[..., 3]
    tr = jnp.minimum(ta, q[..., 0])
    tg = jnp.minimum(ta, q[..., 1])
    tb = q[..., 2]
    return jnp.stack([tr, tg, tb, ta], axis=-1)


@functools.partial(jax.jit, static_argnames=("kind", "weights", "radius", "total"))
def _convolve_canvas_jit(c, mask_big, *, kind, weights, radius, total):
    """The whole within-shape convolve as ONE program: the mask crop, the
    conv passes, the integer divides/clamps and the where-combines all fuse
    (eager, each combine materialized a full-bucket temporary — ~80 ms per
    1080p-band blur event on the host path)."""
    m = mask_big[: c.shape[0], : c.shape[1]][..., None]
    if kind == "full":
        sums = _conv2d_exact(c, weights=weights)
        return jnp.where(m, sums // total, c)
    if kind == "xy":
        sums_x = _conv1d_exact(c, weights=weights, axis=1)
        cx = jnp.where(m, _setcanvas_xy(sums_x, total), c)
        sums_y = _conv1d_exact(cx, weights=weights, axis=0)
        return jnp.where(m, _setcanvas_xy(sums_y, total), cx)
    # UnitKernel: box blur, plain integer division, no clamping
    # (convolve.ml:160-204 uses rgba tuples + div4).
    n = 2 * radius + 1
    ones = tuple([1] * n)
    sums_x = _conv1d_exact(c, weights=ones, axis=1)
    cx = jnp.where(m, sums_x // n, c)
    sums_y = _conv1d_exact(cx, weights=ones, axis=0)
    return jnp.where(m, sums_y // n, cx)


def convolve_canvas(kernel: Kernel, canvas_rgba, shape_mask):
    """Convolve within shape_mask (bool, >= HxW) — convolve.ml:207-232."""
    c = jnp.asarray(canvas_rgba, jnp.int32)
    if isinstance(kernel, FullKernel):
        kind, weights, radius, total = "full", kernel.values, 0, kernel.total
    elif isinstance(kernel, XYKernel):
        kind, weights, radius, total = "xy", kernel.values, 0, kernel.total
    else:
        kind, weights, radius, total = "unit", None, kernel.radius, 0
    return _convolve_canvas_jit(
        c, shape_mask, kind=kind, weights=weights, radius=radius, total=total
    )


def convolve_sprite(kernel: Kernel, sprite):
    """Flatten -> convolve -> pick up (convolve.ml:239-258)."""
    if sprite is None:
        return NULL_SPRITE
    r = radius_of_kernel(kernel)
    canvas = region.flatten_sprite(2 * r, sprite, C.clear)
    shape = region.bloat(r, r, region.shape_of_sprite(sprite))
    return _convolve_pickup(kernel, canvas, shape, shape)


def convolve_sprite_in_shape(kernel: Kernel, sprite, shape, pickup_shape):
    """Partial variant for filters (convolve.ml:265-296)."""
    if sprite is None:
        return NULL_SPRITE
    r = radius_of_kernel(kernel)
    canvas = region.flatten_sprite(2 * r, sprite, C.clear)
    return _convolve_pickup(kernel, canvas, shape, pickup_shape)


def _convolve_pickup(kernel: Kernel, canvas: Canvas, shape, pickup_shape):
    if shape is None or pickup_shape is None:
        return NULL_SPRITE
    ox, oy = canvas.origin
    H, W = canvas.height, canvas.width
    # Shape mask expressed over the canvas extent.
    canvas_box = (ox, oy, ox + W - 1, oy + H - 1)
    wb, hb = region.box_wh(canvas_box)
    Hb, Wb = region.bucket_hw(hb, wb)
    # Unsliced bucket mask: the crop to (H, W) happens inside the jitted
    # convolve program, not as an eager full-bucket copy.
    m = region._reproject_mask(shape, canvas_box, Hb, Wb)
    out = convolve_canvas(kernel, canvas.rgba, m)
    # Pickup shape must lie within the canvas (guaranteed by flatten border).
    ps = region.shape_intersection(pickup_shape, region.shape_of_box(canvas_box))
    if ps is None:
        return NULL_SPRITE
    return region.pickup(ps, Canvas(out, canvas.origin))
