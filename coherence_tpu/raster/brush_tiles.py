"""Batched brush-stroke rasterization at atlas-tile granularity.

The scalar brush pipeline (brush.ml:176-222 semantics:
raster/brush.sprite_of_brushstroke) costs several device round trips per
stroke — two `bloat` dispatches, a mask readback for the stamp-point
filter, the stamp scan, the fill dissolve, then pack + shatter into tile
pieces — ~0.3-1 s each over a remote transport.  A zoom step re-pays that
for every visible stroke.

This module rasterizes a GROUP of strokes in ONE dispatch, directly into
the (TILE_H, TILE_W) pieces raster/tiled_scene's atlas ingests:

  * host: stamp points (polygon.ml:144-218 spacing w/20 via
    points_on_path), the shape box (point bbox grown by the brush radius,
    the `bloat` of brush.ml:135-173), and the grid-clipped tile set;
  * device, one jitted program per static bucket combo: a lax.scan
    alpha_over-stamps each stroke's Gaussian patch (same order + integer
    arithmetic as the scalar scan, so values are bit-identical), the
    stroke SHAPE mask is the box-window dilation of the stamp-point
    scatter plane (exactly region.bloat's _box_count > 0), the plain fill
    dissolves by the accumulated alpha inside the mask, and every
    (stroke, tile) piece is sliced out packed.

Pixel parity with the scalar path is structural: same stamp sequence per
pixel (alpha_over per pixel only involves the stamps covering it; stamps
that cannot touch the grid-clipped plane are dropped), same div255
arithmetic, same dilation mask, same dissolve — guarded by
tests/test_brush_tiles.py against full_sprite_of_object + add_object.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import colour as C
from . import aa as raa
from . import region
from .brush import (
    GAUSSIAN,
    _int_points,
    drawround_alpha,
    points_of_brushstroke,
    sizeof_brush,
)
from .pallas_compositor import TILE_H, TILE_W, pack_rgba

# Host coords >= this sentinel are dropped by the in-kernel scatter
# (mode="drop" drops too-large indices; negatives would wrap, so the host
# pre-filters them to the sentinel).
_FAR = 32767


@functools.partial(
    jax.jit, static_argnames=("hp", "wp", "bhb", "bwb", "s", "p")
)
def _brush_group_kernel(
    brushes, offsets, valid, pts, fills, radii, piece_meta, *, hp, wp, bhb, bwb, s, p
):
    """One dispatch rasterizing `s` strokes into `p` tile pieces.

    brushes: (s, bhb, bwb) int32 Gaussian alpha patches (zero-padded).
    offsets: (s, n, 2) int32 patch top-left corners in plane coords.
    valid:   (s, n) bool — padding / out-of-plane stamps are no-ops.
    pts:     (s, n, 2) int32 stamp-point plane coords (_FAR = dropped).
    fills:   (s, 4) int32 premultiplied plain-fill rgba.
    radii:   (s, 2) int32 (wr, hr) box-dilation radii.
    piece_meta: (p, 3) int32 (stroke index, plane row, plane col).
    Returns (p, TILE_H, TILE_W) packed u32 pieces.
    """

    def one_stroke(args):
        brush_a, offs, val, pt, f4, r2 = args

        def body(canvas, ov):
            off, v = ov
            patch = lax.dynamic_slice(canvas, (off[0], off[1]), (bhb, bwb))
            aa = brush_a
            blended = jnp.where(
                (aa == 0) | ~v,
                patch,
                jnp.where(aa == 255, aa, C.prelerp_arr(patch, aa, aa)),
            )
            return lax.dynamic_update_slice(canvas, blended, (off[0], off[1])), None

        alpha, _ = lax.scan(body, jnp.zeros((hp, wp), jnp.int32), (offs, val))
        ptplane = (
            jnp.zeros((hp, wp), jnp.int32)
            .at[pt[:, 0], pt[:, 1]]
            .add(1, mode="drop")
        )
        mask = region._box_count(ptplane, r2[0], r2[1]) > 0
        rgba = jnp.where(
            mask[..., None],
            C.dissolve_rgba(f4[None, None, :], alpha),
            0,
        )
        return pack_rgba(rgba)

    planes = lax.map(one_stroke, (brushes, offsets, valid, pts, fills, radii))

    def one_piece(m):
        return lax.dynamic_slice(
            planes, (m[0], m[1], m[2]), (1, TILE_H, TILE_W)
        )[0]

    return lax.map(one_piece, piece_meta)



class BrushTileBuild:
    """Accumulate plain-filled Gaussian brush strokes; flush rasterizes
    every group with one kernel call and returns (blocks, registry)
    compatible with TiledScene.add_rastered.  Keys whose strokes produce
    no visible pieces appear in the registry with an empty list."""

    def __init__(self, nty: int, ntx: int):
        self.nty, self.ntx = nty, ntx
        # static-bucket key -> list of per-stroke host data
        self.groups: Dict[tuple, list] = {}
        self.empty_keys: List[object] = []

    def add_stroke(self, key, brushstroke, fill4) -> bool:
        """Sweep one stroke's host data.  Returns False when the stroke is
        unsupported (caller falls back to the scalar path)."""
        brush, _path = brushstroke
        opacity, kind = brush
        if kind[0] != GAUSSIAN:
            return False
        points = _int_points(points_of_brushstroke(brushstroke))
        if not points:
            self.empty_keys.append(key)
            return True
        bw, bh = sizeof_brush(brush)
        wr, hr = (bw - 1) // 2, (bh - 1) // 2
        parr = np.asarray(points, np.int64)
        x0, y0 = int(parr[:, 0].min()), int(parr[:, 1].min())
        x1, y1 = int(parr[:, 0].max()), int(parr[:, 1].max())
        # Shape box = point bbox grown by the brush radii (region.bloat).
        sx0, sy0, sx1, sy1 = x0 - wr, y0 - hr, x1 + wr, y1 + hr
        tx_lo = max(0, (sx0 - 1) // TILE_W)
        tx_hi = min(self.ntx - 1, (sx1 - 1) // TILE_W)
        ty_lo = max(0, (sy0 - 1) // TILE_H)
        ty_hi = min(self.nty - 1, (sy1 - 1) // TILE_H)
        if tx_hi < tx_lo or ty_hi < ty_lo:
            self.empty_keys.append(key)
            return True
        th, tw = ty_hi - ty_lo + 1, tx_hi - tx_lo + 1
        bhb, bwb = region.bucket_hw(bh, bw)
        th_b, tw_b = raa.span_bucket(th, floor=1), raa.span_bucket(tw, floor=1)
        hp = bhb + th_b * TILE_H + 2 * bhb
        wp = bwb + tw_b * TILE_W + 2 * bwb
        # Plane row 0 / col 0 in 1-based frame pixels.
        oy0 = ty_lo * TILE_H + 1 - bhb
        ox0 = tx_lo * TILE_W + 1 - bwb
        offs = np.stack(
            [parr[:, 1] - hr - oy0, parr[:, 0] - wr - ox0], axis=1
        ).astype(np.int32)
        # A stamp is kept iff its (bh, bw) patch can touch the REAL tile
        # region rows [bhb, bhb + th*TILE_H) x cols [bwb, bwb + tw*TILE_W)
        # — kept offsets are then always in-bounds for the padded patch
        # (no dynamic_slice clamping), and dropped stamps cannot touch any
        # piece pixel.
        val = (
            (offs[:, 0] + bh > bhb)
            & (offs[:, 0] < bhb + th * TILE_H)
            & (offs[:, 1] + bw > bwb)
            & (offs[:, 1] < bwb + tw * TILE_W)
        )
        offs[~val] = 0
        pt = np.stack([parr[:, 1] - oy0, parr[:, 0] - ox0], axis=1).astype(
            np.int32
        )
        outside = (
            (pt[:, 0] < 0) | (pt[:, 0] >= hp) | (pt[:, 1] < 0) | (pt[:, 1] >= wp)
        )
        pt[outside] = _FAR
        npb = raa.span_bucket(len(points), floor=8)
        gkey = (hp, wp, bhb, bwb, npb)
        pieces = [
            (ty * self.ntx + tx, bhb + (ty - ty_lo) * TILE_H, bwb + (tx - tx_lo) * TILE_W)
            for ty in range(ty_lo, ty_hi + 1)
            for tx in range(tx_lo, tx_hi + 1)
        ]
        balpha = drawround_alpha(kind[1], opacity)
        bpad = np.zeros((bhb, bwb), np.int32)
        bpad[:bh, :bw] = balpha
        self.groups.setdefault(gkey, []).append(
            (key, bpad, offs, val, pt, np.asarray(fill4, np.int32), (wr, hr), pieces)
        )
        return True

    def flush(self):
        """Returns (blocks, registry): blocks list of (p, TILE_H, TILE_W)
        u32 device arrays; registry key -> [(tile, block_id, slot)]."""
        blocks = []
        registry: Dict[object, List[Tuple[int, int, int]]] = {}
        for key in self.empty_keys:
            registry.setdefault(key, [])
        for (hp, wp, bhb, bwb, npb), items in sorted(self.groups.items()):
            sb = raa.span_bucket(len(items), floor=1)
            brushes = np.zeros((sb, bhb, bwb), np.int32)
            offsets = np.zeros((sb, npb, 2), np.int32)
            valid = np.zeros((sb, npb), bool)
            pts = np.full((sb, npb, 2), _FAR, np.int32)
            fills = np.zeros((sb, 4), np.int32)
            radii = np.zeros((sb, 2), np.int32)
            metas: List[List[int]] = []
            for si, (key, bpad, offs, val, pt, f4, (wr, hr), pieces) in enumerate(
                items
            ):
                n = offs.shape[0]
                brushes[si] = bpad
                offsets[si, :n] = offs
                valid[si, :n] = val
                pts[si, :n] = pt
                fills[si] = f4
                radii[si] = (wr, hr)
                registry.setdefault(key, [])
                for tile, oy, ox in pieces:
                    registry[key].append((tile, len(blocks), len(metas)))
                    metas.append([si, oy, ox])
            pb = raa.span_bucket(len(metas), floor=8)
            meta = np.zeros((pb, 3), np.int32)
            meta[: len(metas)] = metas
            blocks.append(
                _brush_group_kernel(
                    jnp.asarray(brushes),
                    jnp.asarray(offsets),
                    jnp.asarray(valid),
                    jnp.asarray(pts),
                    jnp.asarray(fills),
                    jnp.asarray(radii),
                    jnp.asarray(meta),
                    hp=hp,
                    wp=wp,
                    bhb=bhb,
                    bwb=bwb,
                    s=sb,
                    p=pb,
                )
            )
        return blocks, registry
