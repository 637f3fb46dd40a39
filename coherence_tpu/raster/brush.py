"""Brushes, brushstrokes and smearing (parity: reference ``brush.ml``).

A brush is (opacity, kind) with kind Gaussian(radius) or Dummy(rx, ry)
(brush.ml:14-19); a brushstroke pairs a brush with a path.  Strokes stamp the
brush at points spaced width/20 along the path (brush.ml:126-131), compositing
alphas with ``alpha_over``; the fill is applied afterwards by dissolving the
fill colour by the accumulated alpha (brush.ml:176-222).

TPU mapping: the brush canvas is a small host-built table; stamping runs as a
``lax.scan`` over the stamp points with dynamic-slice updates on a device
canvas — sequential (matching the reference's stamping order and rounding)
but fully on-device with two dispatches per stroke.
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import colour as C
from .. import transform as tr
from ..geometry import path as gpath
from . import aa as raa
from . import region
from .region import NULL_SHAPE, NULL_SPRITE, Canvas, Shape, Sprite

GAUSSIAN = "gaussian"
DUMMY = "dummy"

# brushkind: (GAUSSIAN, radius: float) | (DUMMY, rx: int, ry: int)
# brush:     (opacity: float, brushkind)
# brushstroke: (brush, path)


def mkround(radius: float, opacity: float):
    """Round Gaussian brush (brush.ml:66-67)."""
    return (opacity, (GAUSSIAN, radius))


def mkdummy(brushstroke):
    """Dummy shadow of a brushstroke (brush.ml:70-72)."""
    brush, path = brushstroke
    w, h = sizeof_brush(brush)
    return ((1.0, (DUMMY, (w - 1) // 2, (h - 1) // 2)), path)


def sizeof_brush(brush) -> Tuple[int, int]:
    """Width/height of the brush canvas, always odd (brush.ml:25-28)."""
    _, kind = brush
    if kind[0] == GAUSSIAN:
        w = int(math.ceil(kind[1])) * 2 + 1
        return w, w
    return kind[1] * 2 + 1, kind[2] * 2 + 1


def transform_brushkind(m, kind):
    """Affine transform of a brush kind (brush.ml:39-48)."""
    if kind[0] == GAUSSIAN:
        sx, sy = _scaleof(m)
        return (GAUSSIAN, kind[1] * ((abs(sx) + abs(sy)) / 2.0))
    sx, sy = _scaleof(m)
    w2 = kind[1] * ((sx + sy) / 2.0)
    h2 = kind[2] * ((sx + sy) / 2.0)
    return (DUMMY, int(w2 + 0.5), int(h2 + 0.5))


def _scaleof(op):
    if isinstance(op, tr.Scale):
        return op.sx, op.sy
    return 1.0, 1.0


def transform_brush(m, brush):
    opacity, kind = brush
    return opacity, transform_brushkind(m, kind)


def transform_brush_many(brush, ops):
    for op in reversed(list(ops) if isinstance(ops, list) else [ops]):
        brush = transform_brush(op, brush)
    return brush


def transform_brushstroke(m, brushstroke):
    brush, path = brushstroke
    ops = m if isinstance(m, list) else [m]
    return transform_brush_many(brush, ops), gpath.transform_path(m, path)


def _g(x: float, y: float, r: float) -> float:
    # brush.ml:60-63
    r = r / 2.0
    return 255.0 * math.exp(-((x / r) ** 2 + (y / r) ** 2))


def drawround_alpha(radius: float, opacity: float) -> np.ndarray:
    """Alpha plane of a round Gaussian brush stamped with `opacity`
    (brush.ml:75-92 with colour = white: every channel equals the alpha)."""
    assert radius >= 0.0 and 0.0 <= opacity <= 1.0
    intop = int(opacity * 255.0)
    intr = int(math.ceil(radius))
    size = intr * 2 + 1
    out = np.zeros((size, size), dtype=np.int32)
    for yy in range(size):
        for xx in range(size):
            v = int(_g(float(xx - intr), float(yy - intr), radius))
            # dissolve(dissolve(colour, intop), v) on the alpha channel:
            a = C.div255(255 * intop) if intop not in (0, 255) else (0 if intop == 0 else 255)
            av = C.div255(a * v) if v not in (0, 255) else (0 if v == 0 else a)
            out[yy, xx] = av
    return out


def drawbrush_rgba(brush, colour: int) -> np.ndarray:
    """Brush canvas as (h, w, 4) int32 colours (brush.ml:94-99)."""
    opacity, kind = brush
    if kind[0] != GAUSSIAN:
        raise ValueError("cannot draw a dummy brush")
    radius = kind[1]
    intop = int(opacity * 255.0)
    intr = int(math.ceil(radius))
    size = intr * 2 + 1
    out = np.zeros((size, size, 4), dtype=np.int32)
    base = C.dissolve(colour, delta=intop)
    for yy in range(size):
        for xx in range(size):
            v = int(_g(float(xx - intr), float(yy - intr), radius))
            out[yy, xx] = C.rgba_of_colour(C.dissolve(base, delta=v))
    return out


def points_of_brushstroke(brushstroke) -> List[Tuple[float, float]]:
    """Stamp points at spacing width/20 (brush.ml:126-131)."""
    brush, path = brushstroke
    w, _ = sizeof_brush(brush)
    return gpath.points_on_path(w / 20.0, path)


def _int_points(points):
    return [(int(math.floor(x + 0.5)), int(math.floor(y + 0.5))) for (x, y) in points]


def shape_of_brushstroke(brushstroke):
    """Shape of a brushstroke: stamp-point mask bloated by the brush radius;
    minshape is Null (brush.ml:135-173)."""
    brush, _ = brushstroke
    points = _int_points(points_of_brushstroke(brushstroke))
    if not points:
        return NULL_SHAPE, NULL_SHAPE
    w, h = sizeof_brush(brush)
    wr, hr = (w - 1) // 2, (h - 1) // 2
    xs = np.array([p[0] for p in points])
    ys = np.array([p[1] for p in points])
    x0, x1 = int(xs.min()), int(xs.max())
    y0, y1 = int(ys.min()), int(ys.max())
    mask = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
    mask[ys - y0, xs - x0] = True
    base = region.shape_of_mask((x0, y0, x1, y1), mask)
    return region.bloat(wr, hr, base), NULL_SHAPE


def bounds_brushstroke(brushstroke):
    """Integer bounds (brush.ml:225-232)."""
    brush, path = brushstroke
    w, h = sizeof_brush(brush)
    w, h = w // 2, h // 2
    minx, maxx, miny, maxy = gpath.bounds_polygon(path)
    return minx - w, maxx + w, miny - h, maxy + h


# ---------------------------------------------------------------------------
# Device stamping
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bh", "bw"))
def _stamp_scan_alpha(canvas_a, brush_a, offsets, valid, *, bh: int, bw: int):
    """Sequentially alpha_over-stamp `brush_a` (bh, bw) at each (row, col)
    offset into canvas_a (H, W).  offsets: (N, 2) int32 top-left corners;
    valid: (N,) bool — padding stamps (pow2 point-count bucket) are no-ops.
    All operand shapes are bucketed by the caller so the program is reused
    across strokes/zoom levels instead of recompiling per stroke size."""

    def body(canvas, ov):
        off, v = ov
        patch = jax.lax.dynamic_slice(canvas, (off[0], off[1]), (bh, bw))
        aa = brush_a
        ab = patch
        blended = jnp.where(
            (aa == 0) | ~v, ab, jnp.where(aa == 255, aa, C.prelerp_arr(ab, aa, aa))
        )
        canvas = jax.lax.dynamic_update_slice(canvas, blended, (off[0], off[1]))
        return canvas, None

    out, _ = jax.lax.scan(body, canvas_a, (offsets, valid))
    return out


def sprite_of_brushstroke(brushstroke, fill, shp):
    """Rasterize a brushstroke within shape `shp` (brush.ml:176-222)."""
    brush, path = brushstroke
    opacity, kind = brush
    if kind[0] == DUMMY:
        base, _ = shape_of_brushstroke(brushstroke)
        from . import fills as _fills

        return region.fillshape(base, _fills.plain(C.white))
    if shp is None:
        return NULL_SPRITE
    bw, bh = sizeof_brush(brush)
    bwr, bhr = (bw - 1) // 2, (bh - 1) // 2
    bloated = region.bloat(bwr, bhr, shp)
    points = _int_points(points_of_brushstroke(brushstroke))
    # Filter stamp points to the bloated shape with ONE mask readback:
    # per-point region.point_in_shape would cost one device sync per stamp
    # (thousands for a long stroke over a remote transport).
    if points and bloated is not None:
        parr = np.asarray(points, np.int64)
        bx0, by0, bx1, by1 = bloated.box
        inb = (
            (parr[:, 0] >= bx0)
            & (parr[:, 0] <= bx1)
            & (parr[:, 1] >= by0)
            & (parr[:, 1] <= by1)
        )
        m = np.asarray(bloated.mask)
        keep = np.zeros(len(points), dtype=bool)
        sel = np.nonzero(inb)[0]
        keep[sel] = m[parr[sel, 1] - by0, parr[sel, 0] - bx0]
        points = [points[i] for i in np.nonzero(keep)[0]]
    elif bloated is None:
        points = []
    bloatedtwice = region.bloat(bwr, bhr, bloated)
    if bloatedtwice is None:
        raise ValueError("sprite_of_brushstroke: internal inconsistency")
    x0, y0, x1, y1 = bloatedtwice.box
    Hc, Wc = y1 - y0 + 1, x1 - x0 + 1
    # Bucket EVERY operand shape (canvas, brush plane, point count) so the
    # scan program is one-per-bucket-combo, not one-per-stroke: unbucketed,
    # each new stroke/zoom size paid a fresh XLA compile (~40 s observed).
    # The canvas bucket includes the brush padding as slack so a padded
    # patch slice near the bottom/right edge never hits dynamic_slice's
    # start clamping (which would shift the stamp).
    bhb, bwb = region.bucket_hw(bh, bw)
    Hb, Wb = region.bucket_hw(Hc + (bhb - bh), Wc + (bwb - bw))
    canvas_a = jnp.zeros((Hb, Wb), dtype=jnp.int32)
    if points:
        balpha = drawround_alpha(kind[1], opacity)
        bpad = np.zeros((bhb, bwb), dtype=np.int32)
        bpad[:bh, :bw] = balpha
        brush_a = jnp.asarray(bpad)
        nb = raa.span_bucket(len(points), floor=8)
        offs = np.zeros((nb, 2), dtype=np.int32)
        offs[: len(points)] = [
            [py - y0 - bhr, px - x0 - bwr] for (px, py) in points
        ]
        valid = np.zeros(nb, dtype=bool)
        valid[: len(points)] = True
        canvas_a = _stamp_scan_alpha(
            canvas_a, brush_a, jnp.asarray(offs), jnp.asarray(valid), bh=bhb, bw=bwb
        )
    # Apply the fill: dissolve fill colour by the accumulated alpha, within shp.
    H, W = shp.mask.shape
    w, h = shp.wh
    sx0, sy0 = shp.box[0], shp.box[1]
    alpha = jax.lax.dynamic_slice(canvas_a, (sy0 - y0, sx0 - x0), (h, w))
    alpha_full = jnp.zeros((H, W), dtype=jnp.int32).at[:h, :w].set(alpha)
    fill_rgba = fill.image_device(shp.box, H, W)
    rgba = jnp.where(shp.mask[..., None], C.dissolve_rgba(fill_rgba, alpha_full), 0)
    return Sprite(shp.box, shp.mask, rgba)


# ---------------------------------------------------------------------------
# Smearing (brush.ml:236-331)
# ---------------------------------------------------------------------------


def points_of_brushstroke_smear(brushstroke):
    """Subdivide to points on adjacent pixels (brush.ml:239-254)."""
    _, path = brushstroke

    def adjacent(p1, p2, p3, p4):
        return math.dist(p1, p4) <= 2.0

    pts = []
    for sp in path.subpaths:
        for seg in sp.segments:
            if isinstance(seg, gpath.Straight):
                p = ((seg.a[0] + seg.b[0]) / 2.0, (seg.a[1] + seg.b[1]) / 2.0)
                edges = gpath.bezier_subdivide(adjacent, seg.a, p, p, seg.b)
            else:
                edges = gpath.bezier_subdivide(adjacent, seg.p1, seg.p2, seg.p3, seg.p4)
            pts.extend(a for a, _ in edges)
    return pts


def find_smear_directions(points):
    """Direction (toward previous point) per deduped int point
    (brush.ml:263-278)."""
    if not points:
        return []
    ipts = [(int(x), int(y)) for (x, y) in points]
    dedup = [ipts[0]]
    for p in ipts[1:]:
        if p != dedup[-1]:
            dedup.append(p)

    def sgn(v):
        return -1 if v > 0 else (1 if v < 0 else 0)

    prevs = [dedup[0]] + dedup[:-1]
    return [
        ((x, y), (sgn(x - px), sgn(y - py)))
        for (x, y), (px, py) in zip(dedup, prevs)
    ]


@functools.partial(jax.jit, static_argnames=("bh", "bw", "lbh", "lbw"))
def _smear_scan(canvas, opac_a, offsets, dirs, valid, *, bh, bw, lbh, lbw):
    """Smear pass: for each point, read a brush-sized patch shifted by -dir,
    then dissolve it over the patch at the point, weighted by the opacity
    brush (brush.ml:308-328).  (bh, bw) are the BUCKETED patch dims, (lbh,
    lbw) the logical brush dims: at alpha 0 the smear writes the shifted
    src (dissolve_between semantics), so padding rows/cols must explicitly
    restore dst — unlike the stamp scan, zero alpha is not a no-op here.
    valid marks real stamp points (pow2 point-count bucket)."""
    inplane = (
        (jnp.arange(bh)[:, None] < lbh) & (jnp.arange(bw)[None, :] < lbw)
    )[..., None]

    def body(cv, odv):
        off, d, v = odv
        src = jax.lax.dynamic_slice(cv, (off[0] - d[1], off[1] - d[0], 0), (bh, bw, 4))
        dst = jax.lax.dynamic_slice(cv, (off[0], off[1], 0), (bh, bw, 4))
        al = opac_a[..., None]
        # dissolve_between ~a:dst src ~alpha:opacbrush_alpha
        mixed = C.dissolve_rgba(dst, al) + C.dissolve_rgba(src, 255 - al)
        blended = jnp.where(al == 0, src, jnp.where(al == 255, dst, mixed))
        blended = jnp.where(inplane & v, blended, dst)
        cv = jax.lax.dynamic_update_slice(cv, blended, (off[0], off[1], 0))
        return cv, None

    out, _ = jax.lax.scan(body, canvas, (offsets, dirs, valid))
    return out


def smear(spr, brushstroke):
    """Smear a sprite along a brushstroke (brush.ml:281-331)."""
    from . import fills as _fills

    brush, path = brushstroke
    # 0. Flesh the sprite out to the brushstroke's shape.
    shp, _ = shape_of_brushstroke(brushstroke)
    filler = region.fillshape(shp, _fills.plain(C.clear)) if shp is not None else None
    if filler is not None:
        spr, _ = region.caf("over", "opaque", spr, filler)
    if spr is None:
        return spr
    bw, bh = sizeof_brush(brush)
    radx, rady = (bw - 1) // 2, (bh - 1) // 2
    points = points_of_brushstroke_smear(brushstroke)
    if not points:
        return spr
    pwd = find_smear_directions(points)
    canvas = region.flatten_sprite(max(radx, rady) * 2 + 2, spr, C.clear)
    ox, oy = canvas.origin
    offsets = []
    dirs = []
    for (x, y), (dx, dy) in pwd:
        # Top-left corner of the brush patch centred at (x+1, y+1) in the
        # reference's shifted coordinates; clip stamps falling outside.
        row = (y - oy) - rady + 1
        col = (x - ox) - radx + 1
        if (
            0 <= row - 1 - abs(dy)
            and 0 <= col - 1 - abs(dx)
            and row + bh + 1 <= canvas.height
            and col + bw + 1 <= canvas.width
        ):
            offsets.append([row, col])
            dirs.append([dx, dy])
    if not offsets:
        return spr
    opac = drawround_alpha(brush[1][1], 1.0) if brush[1][0] == GAUSSIAN else np.full(
        (bh, bw), 255, np.int32
    )
    # Bucket the patch plane, point count, and canvas (with patch-padding
    # slack against dynamic_slice start clamping) so the scan program is
    # reused across stroke sizes instead of recompiling per stroke.
    bhb, bwb = region.bucket_hw(bh, bw)
    opad = np.zeros((bhb, bwb), np.int32)
    opad[:bh, :bw] = opac
    ch, cw = canvas.rgba.shape[:2]
    Hb, Wb = region.bucket_hw(ch + (bhb - bh), cw + (bwb - bw))
    cv = jnp.zeros((Hb, Wb, 4), jnp.int32).at[:ch, :cw].set(canvas.rgba)
    nb = raa.span_bucket(len(offsets), floor=8)
    offs_np = np.zeros((nb, 2), np.int32)
    offs_np[: len(offsets)] = offsets
    dirs_np = np.zeros((nb, 2), np.int32)
    dirs_np[: len(dirs)] = dirs
    valid_np = np.zeros(nb, bool)
    valid_np[: len(offsets)] = True
    offs = jnp.asarray(offs_np)
    ds = jnp.asarray(dirs_np)
    valid = jnp.asarray(valid_np)
    opac_a = jnp.asarray(opad)
    for _ in range(2):  # the reference smears twice (brush.ml:308)
        cv = _smear_scan(cv, opac_a, offs, ds, valid, bh=bhb, bw=bwb, lbh=bh, lbw=bw)
    out_shape = region.shape_of_sprite(spr)
    return region.pickup(out_shape, Canvas(cv[:ch, :cw], canvas.origin))
