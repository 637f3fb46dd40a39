"""Shapes and sprites as dense device rasters (parity: reference ``sprite.ml``).

The reference's core data structure is a nested run-length span list — a
1999-era CPU representation built to avoid touching pixels.  A TPU wants
dense, regular, tile-shaped work, so here:

* a **Shape** (``sprite.ml:23-54`` shape) is a pixel bounding box plus a dense
  boolean coverage mask on device, padded to bucketed (pow2) array sizes so
  jitted kernels compile once per bucket, not once per object;
* a **Sprite** adds a premultiplied-RGBA ``int32`` plane over the same box;
  its mask records *where it was rendered* (which may include fully
  transparent AA pixels), mirroring the span structure's "defined" region.

Operation parity map:
  shape_union / shape_difference / shape_intersection
                        <- sprite.ml:1172-1662 (set algebra on span lists)
  caf                   <- sprite.ml:723-1170 (compose-and-filter: composite
                           two sprites AND report the shape of result pixels
                           satisfying a predicate, in one fused pass)
  fillshape             <- sprite.ml:158-175
  shape_of_sprite       <- sprite.ml:177-189
  portion               <- sprite.ml:592-721
  translate_*           <- sprite.ml:469-501 (pure box shift; O(1))
  boxshape / boxsprite  <- sprite.ml:542-590 (tight bbox recompute)
  bloat / erode         <- sprite.ml:1741-1877 (box-kernel dilation/erosion;
                           here jax.lax.reduce_window max/min)
  flatten_sprite/pickup <- sprite.ml:1664-1739
  point_in_shape        <- sprite.ml:1970-1994
  shapesize/spritesize  <- sprite.ml:402-457 (bytes, for cache accounting)
  shapecheck/spritecheck<- sprite.ml:14-16,216-239 (invariant checking)

Boxes use the reference's coordinates: ``(x0, y0, x1, y1)`` inclusive pixel
indices; ``mask[y - y0, x - x0]``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import colour as C

Box = Tuple[int, int, int, int]  # x0, y0, x1, y1 inclusive

# Like the reference's Sprite.debug_spritecheck (sprite.ml:16): when set,
# structural invariants are verified on the results of major operations.
debug_spritecheck = False


# ---------------------------------------------------------------------------
# Box algebra.  This also subsumes the reference's only use of the GPC C
# clipper: every call site feeds it axis-aligned boxes (render.ml:328-349),
# so union/intersection of rectangles is all that is required.
# ---------------------------------------------------------------------------


def box_union(a: Box, b: Box) -> Box:
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    return (min(ax0, bx0), min(ay0, by0), max(ax1, bx1), max(ay1, by1))


def box_intersect(a: Box, b: Box) -> Optional[Box]:
    ax0, ay0, ax1, ay1 = a
    bx0, by0, bx1, by1 = b
    x0, y0 = max(ax0, bx0), max(ay0, by0)
    x1, y1 = min(ax1, bx1), min(ay1, by1)
    if x0 > x1 or y0 > y1:
        return None
    return (x0, y0, x1, y1)


def box_overlap(a: Box, b: Box) -> bool:
    return box_intersect(a, b) is not None


def box_wh(b: Box) -> Tuple[int, int]:
    return b[2] - b[0] + 1, b[3] - b[1] + 1


# ---------------------------------------------------------------------------
# Bucketed padding: pow2 sizes so each jitted op compiles O(log) times.
# ---------------------------------------------------------------------------

_MIN_H, _MIN_W = 8, 128


def _bucket(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def bucket_hw(h: int, w: int) -> Tuple[int, int]:
    return _bucket(h, _MIN_H), _bucket(w, _MIN_W)


def _pad_mask(mask: np.ndarray) -> jnp.ndarray:
    h, w = mask.shape
    H, W = bucket_hw(h, w)
    out = np.zeros((H, W), dtype=bool)
    out[:h, :w] = mask
    return jnp.asarray(out)


# ---------------------------------------------------------------------------
# Shape / Sprite containers
# ---------------------------------------------------------------------------


@dataclass
class Shape:
    box: Box
    mask: jnp.ndarray  # bool (H, W) bucketed; False outside logical extent
    # Memoized emptiness: None = unknown (computing it is a host<->device
    # sync, so it is deferred until control flow actually needs it).
    empty_known: Optional[bool] = None
    # True when the mask is KNOWN to cover the whole box (a filled
    # rectangle).  Window clips, master updates and bloated rectangles are
    # all full boxes, so set algebra against them reduces to box algebra
    # with no mask programs at all — the dense-raster answer to what the
    # reference's span lists got structurally for free (a rectangle span
    # list is O(rows)).  False merely means "unknown": every fast path
    # keyed on it is conservative.
    full_box: bool = False

    @property
    def wh(self) -> Tuple[int, int]:
        return box_wh(self.box)

    def mask_np(self) -> np.ndarray:
        w, h = self.wh
        return np.asarray(self.mask)[:h, :w]


@dataclass
class Sprite:
    box: Box
    mask: jnp.ndarray  # bool (H, W): where the sprite is defined
    rgba: jnp.ndarray  # int32 (H, W, 4) premultiplied; 0 outside mask

    @property
    def wh(self) -> Tuple[int, int]:
        return box_wh(self.box)


NULL_SHAPE: Optional[Shape] = None
NULL_SPRITE: Optional[Sprite] = None


def is_null_shape(s) -> bool:
    """True for None or a shape whose mask is empty (memoized; this is the
    only place raster emptiness forces a device sync)."""
    if s is None:
        return True
    if s.empty_known is None:
        s.empty_known = not bool(_any(s.mask))
    return s.empty_known


def is_null_sprite(s) -> bool:
    return s is None


def shape_of_mask(box: Box, mask: np.ndarray) -> Optional[Shape]:
    """Build a Shape from a host mask over `box` (tightening not applied).

    Rectangle detection is free here (host mask, one `all()`): every
    scanline-rasterized axis-aligned rectangle — filter bands, backgrounds,
    window-shaped paths — enters the set algebra flagged, so ops against it
    are box math (never a device sync; see the full_box field)."""
    if mask.size == 0 or not mask.any():
        return NULL_SHAPE
    w, h = box_wh(box)
    assert mask.shape == (h, w), (mask.shape, box)
    return Shape(
        box, _pad_mask(mask), empty_known=False, full_box=bool(mask.all())
    )


def shape_of_box(box: Box) -> Shape:
    """Fully-covered rectangular shape."""
    w, h = box_wh(box)
    return Shape(
        box, _pad_mask(np.ones((h, w), dtype=bool)), empty_known=False, full_box=True
    )


def shapecheck(s) -> bool:
    """Structural invariants (ref sprite.ml:216-239): padding clear, box sane."""
    if s is None:
        return True
    w, h = s.wh
    m = np.asarray(s.mask)
    if m[h:, :].any() or m[:, w:].any():
        return False
    return True


def spritecheck(s) -> bool:
    if s is None:
        return True
    if not shapecheck(s):
        return False
    rgba = np.asarray(s.rgba)
    mask = np.asarray(s.mask)
    # Colour must be clear outside the defined mask.
    return not rgba[~mask].any()


# ---------------------------------------------------------------------------
# Jitted kernel helpers
# ---------------------------------------------------------------------------


# The workhorse of box realignment: ``out[r, c] = src[r - dy, c - dx]`` with
# dynamic offsets and out-of-range reads as zero/False.  Because offsets are
# *traced* scalars and only the (bucketed) array shapes are static, XLA
# compiles one kernel per bucket pair — not one per object geometry.
# Content leakage past the intended logical window is harmless by
# construction: sources are zero outside their logical extent, and every
# consumer masks with an operand whose own content is bounded by its box.


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _shift_mask(mask, dy, dx, hv, wv, *, H, W):
    """out[r, c] = mask[r - dy, c - dx], clipped to out window r < hv, c < wv."""
    hs, ws = mask.shape
    iy = jnp.arange(H) - dy
    ix = jnp.arange(W) - dx
    vy = (iy >= 0) & (iy < hs) & (jnp.arange(H) < hv)
    vx = (ix >= 0) & (ix < ws) & (jnp.arange(W) < wv)
    g = mask[jnp.clip(iy, 0, hs - 1), :][:, jnp.clip(ix, 0, ws - 1)]
    return g & vy[:, None] & vx[None, :]


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _shift_rgba(rgba, dy, dx, hv, wv, *, H, W):
    hs, ws = rgba.shape[:2]
    iy = jnp.arange(H) - dy
    ix = jnp.arange(W) - dx
    vy = (iy >= 0) & (iy < hs) & (jnp.arange(H) < hv)
    vx = (ix >= 0) & (ix < ws) & (jnp.arange(W) < wv)
    g = rgba[jnp.clip(iy, 0, hs - 1), :, :][:, jnp.clip(ix, 0, ws - 1), :]
    return jnp.where((vy[:, None] & vx[None, :])[..., None], g, 0)


def _embed_mask(mask, oy, ox, *, h, w, H, W):
    # Window (oy + h, ox + w): source content is bounded by its box anyway.
    return _shift_mask(mask, oy, ox, oy + h, ox + w, H=H, W=W)


def _embed_rgba(rgba, oy, ox, *, h, w, H, W):
    return _shift_rgba(rgba, oy, ox, oy + h, ox + w, H=H, W=W)


def _extract_mask(mask, oy, ox, *, h, w, H, W):
    return _shift_mask(mask, -oy, -ox, h, w, H=H, W=W)


def _extract_rgba(rgba, oy, ox, *, h, w, H, W):
    return _shift_rgba(rgba, -oy, -ox, h, w, H=H, W=W)


def _crop_embed_mask(mask, sy, sx, dy, dx, *, h, w, H, W):
    # One of (sy, dy) and one of (sx, dx) is always 0 for box intersections,
    # so the upper-bound window in _shift_mask fully determines the crop.
    return _shift_mask(mask, dy - sy, dx - sx, dy + h, dx + w, H=H, W=W)


def _crop_embed_rgba(rgba, sy, sx, dy, dx, *, h, w, H, W):
    return _shift_rgba(rgba, dy - sy, dx - sx, dy + h, dx + w, H=H, W=W)


def _reproject_mask(s: Shape, box: Box, H: int, W: int):
    """s.mask expressed over `box`'s bucketed (H, W) array (crop + embed)."""
    if s.box == box and s.mask.shape == (H, W):
        # Identity reprojection — the accumulator case in every composite
        # fold (its box IS the target box).  Safe by the padding invariant:
        # mask content beyond the logical extent is always False.
        return s.mask
    ib = box_intersect(s.box, box)
    if ib is None:
        return jnp.zeros((H, W), dtype=bool)
    w, h = box_wh(ib)
    return _crop_embed_mask(
        s.mask,
        ib[1] - s.box[1],
        ib[0] - s.box[0],
        ib[1] - box[1],
        ib[0] - box[0],
        h=h,
        w=w,
        H=H,
        W=W,
    )


def _reproject_rgba(s: Sprite, box: Box, H: int, W: int):
    if s.box == box and s.rgba.shape[:2] == (H, W):
        return s.rgba  # identity (rgba is zero outside the mask)
    ib = box_intersect(s.box, box)
    if ib is None:
        return jnp.zeros((H, W, 4), dtype=jnp.int32)
    w, h = box_wh(ib)
    return _crop_embed_rgba(
        s.rgba,
        ib[1] - s.box[1],
        ib[0] - s.box[0],
        ib[1] - box[1],
        ib[0] - box[0],
        h=h,
        w=w,
        H=H,
        W=W,
    )


def _align_masks(a: Shape, b: Shape, box: Box):
    """Both masks expressed over the bucketed array of `box`."""
    w, h = box_wh(box)
    H, W = bucket_hw(h, w)
    return _reproject_mask(a, box, H, W), _reproject_mask(b, box, H, W)


@jax.jit
def _or(a, b):
    return jnp.logical_or(a, b)


@jax.jit
def _andnot(a, b):
    return jnp.logical_and(a, jnp.logical_not(b))


@jax.jit
def _and(a, b):
    return jnp.logical_and(a, b)


@jax.jit
def _any(a):
    return jnp.any(a)


def shape_any(s) -> bool:
    return not is_null_shape(s)


def _maybe_null(box: Box, mask) -> Optional[Shape]:
    # Deferred emptiness: return the shape without syncing; consumers that
    # need truth go through is_null_shape (memoized, one sync max).
    return Shape(box, mask)


def _box_inside(inner: Box, outer: Box) -> bool:
    return (
        inner[0] >= outer[0]
        and inner[1] >= outer[1]
        and inner[2] <= outer[2]
        and inner[3] <= outer[3]
    )


def shape_union(a, b):
    """a ||| b (ref sprite.ml:1172-1293)."""
    if a is None:
        return b
    if b is None:
        return a
    # Full-box absorption: anything inside a filled rectangle adds nothing.
    if a.full_box and _box_inside(b.box, a.box):
        return a
    if b.full_box and _box_inside(a.box, b.box):
        return b
    box = box_union(a.box, b.box)
    ma, mb = _align_masks(a, b, box)
    return Shape(box, _or(ma, mb))


def shape_difference(a, b):
    """a --- b (ref sprite.ml:1295-1512)."""
    if a is None:
        return NULL_SHAPE
    if b is None:
        return a
    if not box_overlap(a.box, b.box):
        return a
    # Subtracting a filled rectangle that covers all of `a` empties it.
    if b.full_box and _box_inside(a.box, b.box):
        return NULL_SHAPE
    box = a.box
    ma, mb = _align_masks(a, b, box)
    return _maybe_null(box, _andnot(ma, mb))


def _crop_shape(s, ibox: Box):
    """s's mask restricted to ibox ⊆ s.box (no second operand)."""
    if ibox == s.box:
        return s
    w, h = box_wh(ibox)
    H, W = bucket_hw(h, w)
    m = _extract_mask(s.mask, ibox[1] - s.box[1], ibox[0] - s.box[0], h=h, w=w, H=H, W=W)
    return Shape(ibox, m, empty_known=False if s.full_box else None,
                 full_box=s.full_box)


def shape_intersection(a, b):
    """a &&& b (ref sprite.ml:1514-1662)."""
    if a is None or b is None:
        return NULL_SHAPE
    ibox = box_intersect(a.box, b.box)
    if ibox is None:
        return NULL_SHAPE
    # Intersecting with a filled rectangle is a crop — the everyday case
    # (window clips, master updates) costs box math + at most one shift.
    if b.full_box:
        return _crop_shape(a, ibox)
    if a.full_box:
        return _crop_shape(b, ibox)
    w, h = box_wh(ibox)
    H, W = bucket_hw(h, w)
    ma = _extract_mask(a.mask, ibox[1] - a.box[1], ibox[0] - a.box[0], h=h, w=w, H=H, W=W)
    mb = _extract_mask(b.mask, ibox[1] - b.box[1], ibox[0] - b.box[0], h=h, w=w, H=H, W=W)
    return _maybe_null(ibox, _and(ma, mb))


def shape_intersects(a, b) -> bool:
    if a is None or b is None:
        return False
    if not box_overlap(a.box, b.box):
        return False
    return not is_null_shape(shape_intersection(a, b))


def translate_shape(dx: int, dy: int, s):
    """Translate — a pure box shift (ref sprite.ml:469-501), O(1) here."""
    if s is None:
        return NULL_SHAPE
    x0, y0, x1, y1 = s.box
    return Shape(
        (x0 + dx, y0 + dy, x1 + dx, y1 + dy), s.mask, s.empty_known, s.full_box
    )


def translate_sprite(dx: int, dy: int, s):
    if s is None:
        return NULL_SPRITE
    x0, y0, x1, y1 = s.box
    return Sprite((x0 + dx, y0 + dy, x1 + dx, y1 + dy), s.mask, s.rgba)


@jax.jit
def _tight_bounds(mask):
    rows = jnp.any(mask, axis=1)
    cols = jnp.any(mask, axis=0)
    ny = jnp.arange(mask.shape[0])
    nx = jnp.arange(mask.shape[1])
    y0 = jnp.min(jnp.where(rows, ny, mask.shape[0]))
    y1 = jnp.max(jnp.where(rows, ny, -1))
    x0 = jnp.min(jnp.where(cols, nx, mask.shape[1]))
    x1 = jnp.max(jnp.where(cols, nx, -1))
    return jnp.stack([x0, y0, x1, y1])


def boxshape(s):
    """Recompute a tight bounding box (ref sprite.ml:542-590)."""
    if s is None:
        return NULL_SHAPE
    if s.full_box:  # already tight by definition
        s.empty_known = False
        return s
    bx0, by0, bx1, by1 = (int(v) for v in np.asarray(_tight_bounds(s.mask)))
    if bx1 < bx0:
        return NULL_SHAPE
    x0, y0, _, _ = s.box
    newbox = (x0 + bx0, y0 + by0, x0 + bx1, y0 + by1)
    if newbox == s.box:
        s.empty_known = False
        return s
    w, h = box_wh(newbox)
    H, W = bucket_hw(h, w)
    mask = _extract_mask(s.mask, by0, bx0, h=h, w=w, H=H, W=W)
    return Shape(newbox, mask, empty_known=False)


def boxsprite(s):
    if s is None:
        return NULL_SPRITE
    bx0, by0, bx1, by1 = (int(v) for v in np.asarray(_tight_bounds(s.mask)))
    if bx1 < bx0:
        return NULL_SPRITE
    x0, y0, _, _ = s.box
    newbox = (x0 + bx0, y0 + by0, x0 + bx1, y0 + by1)
    if newbox == s.box:
        return s
    w, h = box_wh(newbox)
    H, W = bucket_hw(h, w)
    mask = _extract_mask(s.mask, by0, bx0, h=h, w=w, H=H, W=W)
    rgba = _extract_rgba(s.rgba, by0, bx0, h=h, w=w, H=H, W=W)
    return Sprite(newbox, mask, rgba)


# ---------------------------------------------------------------------------
# Sprites
# ---------------------------------------------------------------------------


def shape_of_sprite(s):
    """Defined region of a sprite (ref sprite.ml:177-189)."""
    if s is None:
        return NULL_SHAPE
    return Shape(s.box, s.mask)


@jax.jit
def _masked_rgba(mask, rgba):
    return jnp.where(mask[..., None], rgba, 0)


def sprite_of_mask_rgba(box: Box, mask, rgba) -> Sprite:
    return Sprite(box, mask, _masked_rgba(mask, rgba))


def fillshape(shape, fill) -> Optional[Sprite]:
    """Fill every pixel of a shape with a fill (ref sprite.ml:158-175).

    `fill` is a Fill from raster.fills: its ``image(box, H, W)`` returns the
    (H, W, 4) int32 colour plane for the box's pixel grid.
    """
    if shape is None:
        return NULL_SPRITE
    H, W = shape.mask.shape
    rgba = fill.image_device(shape.box, H, W)
    return sprite_of_mask_rgba(shape.box, shape.mask, rgba)


def portion(s, shp):
    """Restrict a sprite to a shape (ref sprite.ml:592-721)."""
    if s is None or shp is None:
        return NULL_SPRITE
    ibox = box_intersect(s.box, shp.box)
    if ibox is None:
        return NULL_SPRITE
    w, h = box_wh(ibox)
    H, W = bucket_hw(h, w)
    ms = _extract_mask(s.mask, ibox[1] - s.box[1], ibox[0] - s.box[0], h=h, w=w, H=H, W=W)
    mp = _extract_mask(shp.mask, ibox[1] - shp.box[1], ibox[0] - shp.box[0], h=h, w=w, H=H, W=W)
    rgba = _extract_rgba(s.rgba, ibox[1] - s.box[1], ibox[0] - s.box[0], h=h, w=w, H=H, W=W)
    mask = _and(ms, mp)
    return sprite_of_mask_rgba(ibox, mask, rgba)


def sprite_map(f: Callable, s):
    """Map a (traceable) colour-array function over a sprite
    (ref sprite.ml:245-374 sprite_map)."""
    if s is None:
        return NULL_SPRITE
    rgba = f(s.rgba)
    return sprite_of_mask_rgba(s.box, s.mask, jnp.asarray(rgba, jnp.int32))


def map_coords(f: Callable, s):
    """Map f(ygrid, xgrid, rgba) over a sprite (ref sprite.ml map_coords,
    used by the CPG fill application render.ml:976-981)."""
    if s is None:
        return NULL_SPRITE
    H, W = s.mask.shape
    x0, y0, _, _ = s.box
    ys = y0 + jnp.arange(H, dtype=jnp.int32)[:, None]
    xs = x0 + jnp.arange(W, dtype=jnp.int32)[None, :]
    rgba = f(jnp.broadcast_to(ys, (H, W)), jnp.broadcast_to(xs, (H, W)), s.rgba)
    return sprite_of_mask_rgba(s.box, s.mask, jnp.asarray(rgba, jnp.int32))


# ---------------------------------------------------------------------------
# caf — compose and filter (ref sprite.ml:723-1170)
# ---------------------------------------------------------------------------

# Named compositing operators usable inside jit.  Each maps (a_rgba, b_rgba)
# -> rgba on int32 (..., 4) arrays; `a` is the upper operand as in
# Colour.over a b (a over b).
_CAF_OPS = {}


def register_caf_op(name: str, fn: Callable):
    _CAF_OPS[name] = fn


register_caf_op("over", C.over_rgba)
register_caf_op("alpha_over", C.alpha_over_rgba)
register_caf_op("plus", C.pd_plus_rgba)
# 'nocover' asserts disjointness (checked on host when debug_spritecheck);
# the overlap region is empty so any value works — use b.
register_caf_op("nocover", lambda a, b: b)


def _pred_opaque(rgba):
    return rgba[..., 3] == 255


_CAF_PREDS = {"opaque": _pred_opaque}


@functools.partial(jax.jit, static_argnames=("op", "pred"))
def _caf_kernel(ma, ra, mb, rb, *, op: str, pred: str):
    both = jnp.logical_and(ma, mb)
    any_ = jnp.logical_or(ma, mb)
    composed = _CAF_OPS[op](ra, rb)
    rgba = jnp.where(
        both[..., None], composed, jnp.where(ma[..., None], ra, jnp.where(mb[..., None], rb, 0))
    )
    f = jnp.logical_and(any_, _CAF_PREDS[pred](rgba))
    return rgba, any_, f


def caf(op: str, pred: str, a, b):
    """Composite sprite `a` onto sprite `b` with operator `op`, returning
    (result sprite, shape of result pixels satisfying `pred`).

    Mirrors ``Sprite.caf`` (sprite.ml:723-1170): the predicate (e.g. "now
    opaque") is evaluated over every defined pixel of the result, which is
    what drives the renderer's early termination (render.ml:1291-1308).
    """
    if a is None and b is None:
        return NULL_SPRITE, NULL_SHAPE
    if a is None:
        a_box = b.box
    elif b is None:
        a_box = a.box
    else:
        a_box = box_union(a.box, b.box)
    box = a_box
    w, h = box_wh(box)
    H, W = bucket_hw(h, w)

    def embed(s):
        if s is None:
            z = jnp.zeros((H, W), dtype=bool)
            return z, jnp.zeros((H, W, 4), dtype=jnp.int32)
        return _reproject_mask(s, box, H, W), _reproject_rgba(s, box, H, W)

    ma, ra = embed(a)
    mb, rb = embed(b)
    if debug_spritecheck and op == "nocover":
        if bool(_any(_and(ma, mb))):
            raise C.Nocover("caf nocover: operands overlap")
    rgba, mask, f = _caf_kernel(ma, ra, mb, rb, op=op, pred=pred)
    spr = Sprite(box, mask, rgba)
    fshape = _maybe_null(box, f)
    return spr, fshape


# ---------------------------------------------------------------------------
# bloat / erode (ref sprite.ml:1741-1877)
# ---------------------------------------------------------------------------


def _box_count(m_int, rx, ry):
    """Separable box-window sum of an int32 plane with DYNAMIC radii —
    one compiled program per plane bucket for every (rx, ry), instead of a
    reduce_window recompile per radius (zoomed brushes/filters were paying a
    fresh XLA compile for each new radius).  Cells outside the array count
    as zero (the clipped prefix-sum reads are exact for that convention)."""
    H, W = m_int.shape
    # Row pass: windowed sum over columns [x-rx, x+rx].
    c = jnp.cumsum(m_int, axis=1)
    xx = jnp.arange(W)
    hi = c[:, jnp.clip(xx + rx, 0, W - 1)]
    lo_idx = xx - rx - 1
    lo = jnp.where(lo_idx >= 0, c[:, jnp.clip(lo_idx, 0, W - 1)], 0)
    row = hi - lo
    # Column pass: windowed sum over rows [y-ry, y+ry].
    c2 = jnp.cumsum(row, axis=0)
    yy = jnp.arange(H)
    hi2 = c2[jnp.clip(yy + ry, 0, H - 1), :]
    lo_idx2 = yy - ry - 1
    lo2 = jnp.where(
        (lo_idx2 >= 0)[:, None], c2[jnp.clip(lo_idx2, 0, H - 1), :], 0
    )
    return hi2 - lo2


@jax.jit
def _dilate(mask, rx, ry):
    return _box_count(mask.astype(jnp.int32), rx, ry) > 0


def bloat(rx: int, ry: int, s):
    """Morphological dilation by a (2rx+1, 2ry+1) box kernel
    (ref sprite.ml:1741-1864).  The result box grows by (rx, ry)."""
    if s is None:
        return NULL_SHAPE
    if rx == 0 and ry == 0:
        return s
    x0, y0, x1, y1 = s.box
    nbox = (x0 - rx, y0 - ry, x1 + rx, y1 + ry)
    if s.full_box:
        # Dilation of a filled rectangle by a box kernel is the expanded
        # filled rectangle, exactly.
        return shape_of_box(nbox)
    w, h = box_wh(nbox)
    H, W = bucket_hw(h, w)
    hs, ws = s.wh[1], s.wh[0]
    m = _embed_mask(s.mask, ry, rx, h=hs, w=ws, H=H, W=W)
    return Shape(nbox, _dilate(m, rx, ry))


@jax.jit
def _erode_k(mask, h, w, rx, ry):
    # Treat outside-the-logical-(h, w)-extent as uncovered: a window that
    # contains any uncovered cell (or sticks past the logical extent — the
    # `interior` term) erodes away.
    yy = jnp.arange(mask.shape[0])
    xx = jnp.arange(mask.shape[1])
    logical = (yy[:, None] < h) & (xx[None, :] < w)
    uncovered = (~mask & logical).astype(jnp.int32)
    interior = (
        (yy[:, None] >= ry)
        & (yy[:, None] < h - ry)
        & (xx[None, :] >= rx)
        & (xx[None, :] < w - rx)
    )
    return (_box_count(uncovered, rx, ry) == 0) & interior


def erode(rx: int, ry: int, s):
    """Morphological erosion (ref sprite.ml:1866-1877, via complement)."""
    if s is None:
        return NULL_SHAPE
    if rx == 0 and ry == 0:
        return s
    w, h = box_wh(s.box)
    return _maybe_null(s.box, _erode_k(s.mask, h, w, rx, ry))


# ---------------------------------------------------------------------------
# Canvas interop (ref sprite.ml:1664-1739, canvas.ml)
# ---------------------------------------------------------------------------


@dataclass
class Canvas:
    """Dense premultiplied-RGBA canvas (ref canvas.ml).

    ``rgba`` is (H, W, 4) int32.  ``origin`` gives the scene coordinates of
    pixel (0, 0) (the reference's canvases are 1-based with external origin
    bookkeeping; we carry it explicitly)."""

    rgba: jnp.ndarray
    origin: Tuple[int, int] = (1, 1)  # (x, y) scene coords of rgba[0, 0]

    @property
    def width(self) -> int:
        return self.rgba.shape[1]

    @property
    def height(self) -> int:
        return self.rgba.shape[0]


def newcanvasclear(w: int, h: int) -> Canvas:
    return Canvas(jnp.zeros((h, w, 4), dtype=jnp.int32))


def newcanvas(w: int, h: int, colour: int = 0) -> Canvas:
    """Canvas filled with a colour (ref canvas.ml newcanvas)."""
    vec = jnp.asarray(C.rgba_of_colour(colour), dtype=jnp.int32)
    return Canvas(jnp.broadcast_to(vec, (h, w, 4)).astype(jnp.int32))


def copycanvas(c: Canvas) -> Canvas:
    """Independent copy (ref canvas.ml:41-47)."""
    return Canvas(c.rgba + 0, c.origin)


def subcopy(src: Canvas, dst: Canvas, x: int, y: int, w: int, h: int) -> Canvas:
    """Copy a w*h window of `src` starting at its 1-based (x, y) into a new
    canvas shaped like `dst` (ref canvas.ml:49-58 subcopy).  Raises if the
    window exceeds the source, like the reference."""
    if x < 1 or y < 1 or x - 1 + w > src.width or y - 1 + h > src.height:
        raise ValueError("subcopy: window outside source canvas")
    sub = jax.lax.dynamic_slice(src.rgba, (y - 1, x - 1, 0), (h, w, 4))
    out = jax.lax.dynamic_update_slice(dst.rgba, sub, (0, 0, 0))
    return Canvas(out, dst.origin)


def flatten_sprite(border: int, s, bg_colour: int) -> Canvas:
    """Sprite -> canvas with a border of bg pixels (ref sprite.ml:1664-1704).

    The canvas origin is (x0 - border, y0 - border) in scene coordinates.
    """
    if s is None:
        raise ValueError("flatten_sprite: null sprite")
    x0, y0, x1, y1 = s.box
    w, h = box_wh(s.box)
    bgvec = jnp.array(C.rgba_of_colour(bg_colour), dtype=jnp.int32)
    H, W = h + 2 * border, w + 2 * border
    out = jnp.broadcast_to(bgvec, (H, W, 4)).astype(jnp.int32)
    inner = jnp.where(s.mask[:h, :w, None], s.rgba[:h, :w], bgvec)
    out = jax.lax.dynamic_update_slice(out, inner, (border, border, 0))
    return Canvas(out, origin=(x0 - border, y0 - border))


def pickup(shape, canvas: Canvas):
    """Pick up pixels of `shape` from a canvas (ref sprite.ml:1706-1739).

    The reference threads explicit (dx, dy) offsets through its 1-based
    canvases; here the canvas carries its scene-space ``origin`` so scene
    pixel (x, y) is read at ``canvas.rgba[y - oy, x - ox]``.  The shape must
    lie within the canvas extent.
    """
    if shape is None:
        return NULL_SPRITE
    x0, y0, x1, y1 = shape.box
    ox, oy = canvas.origin
    col0, row0 = x0 - ox, y0 - oy
    w, h = box_wh(shape.box)
    assert 0 <= col0 and 0 <= row0 and col0 + w <= canvas.width and row0 + h <= canvas.height, (
        "pickup: shape outside canvas",
        shape.box,
        canvas.origin,
        (canvas.width, canvas.height),
    )
    H, W = shape.mask.shape
    rgba = _shift_rgba(canvas.rgba, -row0, -col0, h, w, H=H, W=W)
    return sprite_of_mask_rgba(shape.box, shape.mask, rgba)


def point_in_shape(s, pt: Tuple[int, int]) -> bool:
    """Point membership (ref sprite.ml:1970-1994)."""
    if s is None:
        return False
    x, y = pt
    x0, y0, x1, y1 = s.box
    if not (x0 <= x <= x1 and y0 <= y <= y1):
        return False
    return bool(s.mask[y - y0, x - x0])


# ---------------------------------------------------------------------------
# Span extraction (ref sprite.ml:1879-1968 — the spanlist views Convolve
# consumed; here provided for API parity, diagnostics and host-side tools)
# ---------------------------------------------------------------------------


def spanlist_of_shape(s) -> list:
    """Horizontal spans [(x, y, length), ...] of a shape
    (ref sprite.ml spanlist_of_shape)."""
    if s is None:
        return []
    m = s.mask_np()
    x0, y0, _, _ = s.box
    out = []
    ys, xs = np.nonzero(m)
    if len(ys) == 0:
        return []
    order = np.lexsort((xs, ys))
    ys, xs = ys[order], xs[order]
    new_run = np.ones(len(ys), dtype=bool)
    new_run[1:] = (ys[1:] != ys[:-1]) | (xs[1:] != xs[:-1] + 1)
    first = np.flatnonzero(new_run)
    last = np.append(first[1:] - 1, len(xs) - 1)
    for f, l in zip(first, last):
        out.append((int(xs[f]) + x0, int(ys[f]) + y0, int(l - f) + 1))
    return out


def depthspanlist_of_shape(s) -> list:
    """Vertical spans [(x, y, depth), ...] (ref depthspanlist_of_shape)."""
    if s is None:
        return []
    m = s.mask_np().T  # columns become rows
    x0, y0, _, _ = s.box
    out = []
    xs_, ys_ = np.nonzero(m)
    if len(xs_) == 0:
        return []
    order = np.lexsort((ys_, xs_))
    xs_, ys_ = xs_[order], ys_[order]
    new_run = np.ones(len(xs_), dtype=bool)
    new_run[1:] = (xs_[1:] != xs_[:-1]) | (ys_[1:] != ys_[:-1] + 1)
    first = np.flatnonzero(new_run)
    last = np.append(first[1:] - 1, len(ys_) - 1)
    for f, l in zip(first, last):
        out.append((int(xs_[f]) + x0, int(ys_[f]) + y0, int(l - f) + 1))
    return out


def shapespan_iter(minx, maxx, miny, maxy, f, s) -> None:
    """Iterate spans clipped to a window, calling f(x, y, length)
    (ref sprite.ml:147-154)."""
    for (x, y, l) in spanlist_of_shape(s):
        if y < miny or y > maxy:
            continue
        e = x + l - 1
        cs, ce = max(x, minx), min(e, maxx)
        if cs <= ce:
            f(cs, y, ce - cs + 1)


# ---------------------------------------------------------------------------
# Size estimators for cache accounting (ref sprite.ml:402-457)
# ---------------------------------------------------------------------------


def shapesize(s) -> int:
    if s is None:
        return 0
    return int(s.mask.size)  # 1 byte per bool


def spritesize(s) -> int:
    if s is None:
        return 0
    return int(s.mask.size + s.rgba.size * 4)
