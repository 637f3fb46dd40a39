"""Device-resident scene view: the production fast path for interaction.

Couples the scene model to the sparse tiled-scene Pallas compositor
(raster/tiled_scene): every object's full raster is computed once through
the general pipeline (interior fill + Gaussian-matte AA fringe, exactly as
render.ml:1198-1213), shattered into the frame-aligned atlas, and frames —
full or dirty-tile-restricted — re-render in one kernel dispatch.

Coherence operations:
  * translate an object: re-shatter its existing raster (a vmapped shift;
    no re-rasterization — the device analogue of cache.ml's
    TranslatedObject);
  * edit an object: re-rasterize just it, re-shatter;
  * any change marks the union of old+new tile footprints dirty; only those
    tiles composite on the next frame.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import colour as C
from ..geometry import path as gpath
from ..geometry import shapes as gshapes
from ..raster import aa as raa
from ..raster import brush as rbrush
from ..raster import fills as rfills
from ..raster import region, scanline
from ..raster.pallas_compositor import TILE_H, TILE_W, pack_rgba, unpack_rgba
from ..raster.region import NULL_SPRITE, translate_sprite
from ..raster.scanline import _HALF
from ..raster.tiled_scene import TiledScene, _default_interpret as _tiled_interpret
from . import render as R


def pretrace_view_programs(width: int, height: int, atlas_cap: int,
                           blur_radius: Optional[int] = None) -> None:
    """Pre-trace every fixed-shape program a DeviceView(atlas_cap=...) +
    FilteredDisplay session dispatches, using ShapeDtypeStructs only — pure
    Python, touches NO device, and fully populates jit's jaxpr cache (the
    later real calls skip straight to lower/load).  On the remote TPU
    transport the first device op of a process pays a 40-300 s one-time
    backend init; calling this from a thread during that window removes
    ~8 s of GIL-serialized tracing from the post-init build critical path.

    Covers: background plane, unpack-crop, the gather-free full-frame
    render, the combined tile-raster build, and (when blur_radius is
    given) the full-frame blur blend."""
    from ..raster import framepath as _rfp
    from ..raster import tile_raster as _tr
    from ..raster import tiled_scene as _tsm

    S = jax.ShapeDtypeStruct
    pw = ((width + TILE_W - 1) // TILE_W) * TILE_W
    ph = ((height + TILE_H - 1) // TILE_H) * TILE_H
    nty, ntx = ph // TILE_H, pw // TILE_W
    _background_kernel.trace(S((4,), np.int32), h=ph, w=pw)
    _unpack_crop_kernel.trace(S((ph, pw), np.uint32), h=height, w=width)
    _tr._combined_build_kernel.trace(
        S((_tr._FLAT_LEN,), np.int16), S((_tr._FILL_LEN,), np.int32)
    )
    _tsm._render_tiles_atlas.trace(
        S((nty * ntx + 1,), np.int32),
        S((atlas_cap,), np.int32),
        S((ph, pw), np.uint32),
        S((atlas_cap, TILE_H, TILE_W), np.uint32),
        nty=nty,
        ntx=ntx,
        interpret=False,
    )
    # The initial content render (full_refresh: every tile dirty) rides the
    # dirty kernel at these predictable buckets.
    ns = 8
    while ns < nty * ntx:
        ns *= 2
    ni = 8
    while ni < atlas_cap:
        ni *= 2
    _tsm._render_dirty_tiles.trace(
        S((2 * ns,), np.int32),
        S((2 * ns,), np.int32),
        S((ni,), np.int32),
        S((ph, pw), np.uint32),
        S((ph, pw), np.uint32),
        S((atlas_cap, TILE_H, TILE_W), np.uint32),
        n_slots=ns,
        interpret=False,
    )
    _copy_atlas_kernel.trace(S((atlas_cap, TILE_H, TILE_W), np.uint32))
    for n in (8, 16, 32, 64, 128, 256):
        _tsm._paste_block_kernel.trace(
            S((atlas_cap, TILE_H, TILE_W), np.uint32),
            S((n, TILE_H, TILE_W), np.uint32),
            0,
        )
    if blur_radius is not None:
        from ..raster.convolve import mkgaussian

        k = mkgaussian(blur_radius)
        _rfp._apply_blur_rect_kernel.trace(
            S((height, width, 4), np.int32),
            S((height, width), np.int32),
            weights=tuple(k.values),
            total=k.total,
        )


def full_sprite_of_object(o: R.Obj, whole_scene=None):
    """An object's complete raster: direct-filled interior + AA fringe,
    composed with one fused caf (the spriteof pipeline of render.ml:1198-1213
    without the update-shape restriction)."""
    shp, minshp = R.shape_of_basicshape(o)
    if shp is None:
        return NULL_SPRITE
    maxshape = region.shape_difference(shp, minshp)
    fill = R.fillin_obj(o).transform(list(o.transform))
    fringe = (
        R.sprite_of_basicshape(o, maxshape, whole_scene or [o])
        if maxshape is not None
        else None
    )
    interior = region.fillshape(minshp, fill) if minshp is not None else None
    spr, _ = region.caf("nocover", "opaque", interior, fringe)
    return spr


# ---------------------------------------------------------------------------
# Batched scene build
# ---------------------------------------------------------------------------
#
# Building a scene object-by-object costs ~8 device round trips per object
# (mask transfers, eager set ops, AA dispatch, caf) — each round trip is
# milliseconds over a remote transport.  For the common case (plain-filled
# paths and stroked paths) the whole interior+AA pipeline is instead fused
# into ONE jitted call per bucket group: host-side scanline sweeps emit span
# lists, the group's spans/geometry/colours stack into a handful of
# transfers, and a lax.map inside the kernel expands masks, computes the
# exact Gaussian AA coverage, and colours every object's raster.  Pixel
# values are identical to full_sprite_of_object (same spans, same table
# sums, same integer dissolve).


def _batch_extract(o: R.Obj):
    """(edges, shape_winding, aa_winding, fill_rgba4) for objects the fused
    group kernel supports, else None (falls back to the scalar path)."""
    g = o.geometry
    if not isinstance(g, R.Basic):
        return None
    f = g.fill
    if type(f) is not rfills.PlainFill or f.kind != rfills.PLAIN:
        return None
    sk = R.transform_shapekind(o.transform, g.shape)
    if isinstance(sk, R.PathShape):
        edges = gpath.edgelist_of_path(sk.path)
        return edges, sk.path.winding, sk.path.winding, f._rgba
    if isinstance(sk, R.StrokedPathShape):
        # Shape uses nonzero, the AA matte even-odd (render.ml:1002-1008).
        edges = gshapes.strokepath(sk.spec, sk.path)
        return edges, gpath.NONZERO, gpath.EVEN_ODD, f._rgba
    return None


@functools.partial(jax.jit, static_argnames=("hb", "wb", "B"))
def _build_group_kernel(cov, cross, aaspans, geo, fills, *, hb, wb, B):
    """One dispatch building B sprites of bucket (hb, wb).

    cov/cross/aaspans: int32 (B, 3, k) difference-scatter triples [rr, cc,
    vv] (1x pixel spans for coverage / winding crossings; 16x scaled spans
    for the AA matte).  geo: (B, 4) int32 [x0, y0, w, h] tightened boxes.
    fills: (B, 4) int32 premultiplied plain-fill colours.
    Returns B (hb, wb) bool masks and B (hb, wb, 4) int32 rgba planes.
    """

    def one(args):
        cov1, cross1, aa1, g, f4 = args  # (3, k) each: [rr, cc, vv]
        c_rr, c_cc, c_vv = cov1[0], cov1[1], cov1[2]
        x_rr, x_cc, x_vv = cross1[0], cross1[1], cross1[2]
        a_rr, a_cc, a_vv = aa1[0], aa1[1], aa1[2]
        x0, y0, w, h = g[0], g[1], g[2], g[3]

        def mask1x(rr, cc, vv):
            r = rr - y0
            # Out-of-extent rows remap to a LARGE positive index: with
            # mode="drop" a -1 would WRAP to the last row (numpy semantics).
            r = jnp.where((r >= 0) & (r < h), r, 1 << 30)
            c = jnp.clip(cc - x0, 0, w)
            diff = jnp.zeros((hb, wb + 1), jnp.int32).at[r, c].add(vv, mode="drop")
            return jnp.cumsum(diff, axis=1)[:, :-1] > 0

        covm = mask1x(c_rr, c_cc, c_vv)
        crossm = mask1x(x_rr, x_cc, x_vv)
        smask = covm | crossm  # shape = coverage ∪ crossings
        mmask = crossm & ~covm  # minshape = shape − coverage
        sc = raa._H
        opacity = raa.coverage_counts_from_spans_impl(
            a_rr, a_cc, a_vv,
            sc * y0 - 2 * sc, sc * x0 - 2 * sc,
            sc * h + sc, sc * w + sc,
            hb, wb,
        )
        fringe = smask & ~mmask
        colour = f4[None, None, :]
        dissolved = C.dissolve_rgba(colour, opacity)
        rgba = jnp.where(
            mmask[..., None], colour, jnp.where(fringe[..., None], dissolved, 0)
        )
        return smask, mmask, rgba

    masks, minmasks, rgbas = lax.map(one, (cov, cross, aaspans, geo, fills))
    return (
        [masks[i] for i in range(B)],
        [minmasks[i] for i in range(B)],
        [rgbas[i] for i in range(B)],
    )


def _group_b(n: int) -> int:
    """Pow2 batch bucket so group compiles are reused across scenes."""
    return raa.span_bucket(n, floor=1)


def _minshape_empty(rows, cov_s, cov_e, x_rows, x_s, x_e, h: int, w: int) -> bool:
    """True iff (crossings − coverage) is empty — host span expansion at 1x
    (the minshape rule of polygon.ml:520-528).  Inputs are box-relative."""

    def dense(rr, ss, ee):
        diff = np.zeros((h, w + 1), dtype=np.int32)
        np.add.at(diff, (rr, np.clip(ss, 0, w)), 1)
        np.add.at(diff, (rr, np.clip(ee + 1, 0, w)), -1)
        return np.cumsum(diff, axis=1)[:, :-1] > 0

    if x_rows.size == 0:
        return True
    cov = dense(rows, cov_s, cov_e)
    cross = dense(x_rows, x_s, x_e)
    return not bool((cross & ~cov).any())


def full_sprites_of_objects(objs) -> List[object]:
    """Batched ``full_sprite_of_object`` over a scene: one fused device
    dispatch per (bucket, span-capacity) group for plain-filled paths and
    stroked paths; anything else falls through to the scalar pipeline.

    Returns a sprite (or None for empty/degenerate) per object, in order.
    """
    out: List[object] = [None] * len(objs)
    # group key -> list of (index, cov_np, cross_np, aa_np, geo, fill)
    groups: Dict[tuple, list] = {}
    for i, o in enumerate(objs):
        ext = _batch_extract(o)
        if ext is None:
            out[i] = full_sprite_of_object(o)
            continue
        edges, shape_w, aa_w, f4 = ext
        spans = scanline._edge_spans(
            np.asarray(edges, dtype=np.int64), shape_w, _HALF
        )
        if spans is None:
            continue  # empty -> None sprite
        rows, cov_s, cov_e, x_rows, x_s, x_e = spans
        if rows.size == 0:
            continue
        x0 = int(min(cov_s.min(), x_s.min() if x_s.size else cov_s.min()))
        x1 = int(max(cov_e.max(), x_e.max() if x_e.size else cov_e.max()))
        y0 = int(rows.min())
        y1 = int(rows.max())
        w, h = x1 - x0 + 1, y1 - y0 + 1
        # Minshape emptiness, host-side (cheap 1x span expansion): empty
        # interiors seed NULL_SHAPE below, exactly like the scalar path.
        min_empty = _minshape_empty(
            rows - y0, cov_s - x0, cov_e - x0, x_rows - y0, x_s - x0, x_e - x0, h, w
        )
        hb, wb = region.bucket_hw(h, w)
        if (raa._H * hb + raa._H) * (raa._H * wb + raa._H) > raa._MAX_T_ELEMS:
            out[i] = full_sprite_of_object(o)  # needs row-band chunking
            continue
        aa = scanline.scaled_spans_of_edgelist(edges, aa_w, raa._H)
        kc = raa.span_bucket(2 * rows.size)
        kx = raa.span_bucket(2 * x_rows.size)
        ka = raa.span_bucket(2 * (aa[0].shape[0] if aa is not None else 0))
        key = (hb, wb, kc, kx, ka)
        groups.setdefault(key, []).append(
            (
                i,
                raa.spans_to_scatter_np((rows, cov_s, cov_e), kc),
                raa.spans_to_scatter_np((x_rows, x_s, x_e), kx),
                raa.spans_to_scatter_np(aa, ka),
                np.array([x0, y0, w, h], dtype=np.int32),
                np.asarray(f4, dtype=np.int32),
                (x0, y0, x1, y1),
                min_empty,
            )
        )

    for (hb, wb, kc, kx, ka), items in groups.items():
        B = _group_b(len(items))
        # Pad with empty entries (all-padding spans produce empty masks).
        pad = B - len(items)
        empty_c = raa.spans_to_scatter_np(None, kc)
        empty_x = raa.spans_to_scatter_np(None, kx)
        empty_a = raa.spans_to_scatter_np(None, ka)
        zgeo = np.array([0, 0, 1, 1], dtype=np.int32)
        zfill = np.zeros(4, dtype=np.int32)

        def stack(sel, empty):
            # (B, 3, k): one transfer per span family.
            e = np.stack(empty)
            return jnp.asarray(
                np.stack([np.stack(it[sel]) for it in items] + [e] * pad)
            )

        cov = stack(1, empty_c)
        cross = stack(2, empty_x)
        aasp = stack(3, empty_a)
        geo = jnp.asarray(np.stack([it[4] for it in items] + [zgeo] * pad))
        fills = jnp.asarray(np.stack([it[5] for it in items] + [zfill] * pad))
        masks, minmasks, rgbas = _build_group_kernel(
            cov, cross, aasp, geo, fills, hb=hb, wb=wb, B=B
        )
        for j, it in enumerate(items):
            i = it[0]
            box = it[6]
            out[i] = region.Sprite(box, masks[j], rgbas[j])
            # Seed the shape cache so later interactions (pick, dirty
            # regions, replace) skip the host scanline sweep, matching the
            # warm-cache behavior of the scalar path.  Empty minshapes seed
            # NULL_SHAPE (as the scalar path caches them); non-empty ones
            # keep the shape's box (untightened) — box-aware ops make that
            # harmless — with emptiness known, avoiding a later lazy sync.
            if R.cache.usecache and R.cache.getshape(objs[i].idset) is None:
                minshp = (
                    region.NULL_SHAPE
                    if it[7]
                    else region.Shape(box, minmasks[j], empty_known=False)
                )
                R.cache.addshape(
                    objs[i].idset,
                    region.Shape(box, masks[j], empty_known=False),
                    minshp,
                )
    return out


def _brush_extract(o: R.Obj):
    """(brushstroke, fill_rgba4) for plain-filled Gaussian brush strokes
    the batched brush-tile kernel supports, else None."""
    g = o.geometry
    if not isinstance(g, R.Basic):
        return None
    f = g.fill
    if type(f) is not rfills.PlainFill or f.kind != rfills.PLAIN:
        return None
    sk = R.transform_shapekind(o.transform, g.shape)
    if not isinstance(sk, R.BrushStroke):
        return None
    _, kind = sk.brushstroke[0]
    if kind[0] != rbrush.GAUSSIAN:
        return None
    return sk.brushstroke, f._rgba


# Scene-build cache (build_tiled_scene): content digest -> (atlas
# snapshot, n_pieces, positional piece lists).  Four entries cover the
# zoom tool's speculative set (both zoom directions prefetched from idle,
# DeviceView.prefetch_zoom_candidates) plus the current and last-visited
# scales; each holds one atlas-sized device buffer.
from collections import OrderedDict as _OrderedDict

_SCENE_BUILD_CACHE: "dict" = _OrderedDict()
_SCENE_BUILD_CACHE_MAX = 4

# Hit-rate accounting for cacheable builds (VERDICT r3 item 7: "measure
# hit rate in the config-5 session").
_SCENE_BUILD_CACHE_STATS = {"hits": 0, "misses": 0}


def scene_build_cache_stats(reset: bool = False) -> dict:
    out = dict(_SCENE_BUILD_CACHE_STATS)
    if reset:
        _SCENE_BUILD_CACHE_STATS["hits"] = 0
        _SCENE_BUILD_CACHE_STATS["misses"] = 0
    return out


@jax.jit
def _copy_atlas_kernel(a):
    """Materialize a DISTINCT device copy (snapshots must survive the
    donated in-place mutations the live atlas sees)."""
    return a + jnp.uint32(0)


def scene_build_cache_clear() -> None:
    _SCENE_BUILD_CACHE.clear()


def _scene_digest_update(h, tag: bytes, *parts) -> None:
    # Every variable-length piece is length-framed (and arrays carry their
    # dtype+shape) so distinct part sequences can never concatenate to the
    # same byte stream — the digest is a content ADDRESS; an alias would
    # silently restore the wrong scene's atlas snapshot.
    h.update(len(tag).to_bytes(4, "big"))
    h.update(tag)
    for p in parts:
        if isinstance(p, np.ndarray):
            head = repr((p.dtype.str, p.shape)).encode()
            h.update(len(head).to_bytes(4, "big"))
            h.update(head)
            b = np.ascontiguousarray(p).tobytes()
        else:
            b = repr(p).encode()
        h.update(len(b).to_bytes(8, "big"))
        h.update(b)


def stage_tiled_scene(nty: int, ntx: int, width: int, height: int, keyed_objs,
                      prefill_combined: bool = False):
    """The pure-HOST half of build_tiled_scene: sweep every object and
    stage its spans into tile work items.  Needs no device and no live
    backend — callers with a slow backend bring-up (the remote TPU
    transport's one-time init is 40-300 s) run this on a thread DURING it,
    so the device half (flush + paste) is all that remains afterwards.

    prefill_combined: also run the combined-program flat-buffer staging
    here (pass True when the flush will take the combined route — TPU
    backend, >= 64 items; this function must not ask jax itself, since
    querying the backend would trigger the very init it runs during).

    Returns (tb, bb, handled, fallback, culled, digest): the tile and
    brush builders with staged items, keys rasterized by them, [(key,
    obj)] needing the scalar fallback, keys culled as offscreen/empty,
    and a CONTENT digest of the whole staged scene (None when a fallback
    object makes the content non-digestible) — the scene-build cache key
    (build_tiled_scene)."""
    import hashlib

    from ..raster.brush_tiles import BrushTileBuild
    from ..raster.tile_raster import TileBuild

    W, H = width, height
    tb = TileBuild(nty, ntx)
    bb = BrushTileBuild(nty, ntx)
    fallback = []
    handled = []
    culled = []
    h = hashlib.blake2b(digest_size=16)
    _scene_digest_update(h, b"grid", nty, ntx, W, H)
    digestible = True
    for key, o in keyed_objs:
        ext = _batch_extract(o)
        if ext is None:
            # Cull fallback objects wholly outside the grid (the grid is
            # the viewport — the reference also only redraws the visible
            # window, engine.ml:208-221): a zoomed-in scene's offscreen
            # brush strokes otherwise pay the full scalar pipeline.
            xmin, xmax, ymin, ymax = R.bounds_of_basicshape(o)
            if xmax < -1 or xmin > W + 2 or ymax < -1 or ymin > H + 2:
                culled.append(key)
                _scene_digest_update(h, b"cull")
                continue
            bext = _brush_extract(o)
            if bext is not None and bb.add_stroke(key, *bext):
                # Hash the brushstroke STRUCTURE (frozen dataclasses with
                # exact float reprs) — it fully determines the staged
                # stamps, and repr is O(segments) where re-walking
                # points_of_brushstroke would repeat add_stroke's dominant
                # per-stroke cost.
                brushstroke, fill4 = bext
                _scene_digest_update(h, b"brush", brushstroke, fill4)
                continue
            fallback.append((key, o))
            digestible = False
            continue
        edges, sw, aw, fill4 = ext
        if len(edges):
            e = np.asarray(edges, dtype=np.int64)
            # Subbin -> conservative pixel bounds (the correlated AA matte
            # extends half a pixel; +-2 pixels is safely beyond it).
            if (
                e[:, [0, 2]].max() // 32 < -2
                or e[:, [0, 2]].min() // 32 > W + 2
                or e[:, [1, 3]].max() // 32 < -2
                or e[:, [1, 3]].min() // 32 > H + 2
            ):
                culled.append(key)
                _scene_digest_update(h, b"cull")
                continue
        if not tb.add_object(key, *ext):
            fallback.append((key, o))
            digestible = False
        else:
            handled.append(key)
            _scene_digest_update(
                h, b"tile", np.asarray(edges, np.int64), sw, aw, fill4
            )
    if prefill_combined:
        tb.prefill_combined()
    digest = h.digest() if digestible else None
    return tb, bb, handled, fallback, culled, digest


def build_tiled_scene(ts: TiledScene, keyed_objs, staged=None) -> None:
    """Batched scene ingestion into a TiledScene via the tile-normalized
    rasterizer (raster/tile_raster): ONE jitted kernel per span-capacity
    class rasterizes every supported object's pieces directly at atlas tile
    granularity — a handful of XLA programs for the whole scene instead of
    one per (box bucket, span capacity) group.  Plain-filled Gaussian brush
    strokes batch through the brush-tile kernel (raster/brush_tiles); other
    unsupported or too-complex objects fall back to the scalar pipeline +
    shatter.

    keyed_objs: [(key, R.Obj)] front-to-back or any order (piece lists are
    per-key; compositing order comes from the caller's order list).
    staged: a stage_tiled_scene result for these objects, if the host
    sweep already ran (e.g. during backend bring-up).
    """

    import os as _os
    import time as _time

    _dbg = _os.environ.get("BENCH_DEBUG")
    _t0 = _time.time()

    def _tick(label):
        nonlocal _t0
        if _dbg:
            now = _time.time()
            print(f"#   build: {label}: {now - _t0:.1f}s", flush=True)
            _t0 = now

    if staged is None:
        staged = stage_tiled_scene(ts.nty, ts.ntx, ts.width, ts.height, keyed_objs)
    tb, bb, handled, fallback, culled, digest = staged
    _tick(f"host sweep+stage ({len(keyed_objs)} objects, {len(fallback)} fallback)")

    # Scene-build cache: a previously built scene CONTENT (same staged
    # spans/brushes/grid — the digest is content-addressed, so the zoom
    # tool toggling between 2x scales hits it with brand-new object ids)
    # restores in two device ops: copy the snapshotted atlas + reinstall
    # the piece lists positionally.  Only exact, fully-digestible builds
    # into an EMPTY TiledScene participate.
    cacheable = digest is not None and ts._n_pieces == 0 and not ts.pieces
    if cacheable:
        hit = _SCENE_BUILD_CACHE.get(digest)
        # A preallocated-capacity ts keeps its program shape keys: only
        # restore a snapshot of the SAME capacity.
        if hit is not None and (
            ts._data is None or hit[0].shape == ts._data.shape
        ):
            snap_data, snap_n, snap_entries = hit
            _SCENE_BUILD_CACHE.move_to_end(digest)
            _SCENE_BUILD_CACHE_STATS["hits"] += 1
            ts._data = _copy_atlas_kernel(snap_data)
            ts._n_pieces = snap_n
            ts._free_runs = []
            for (key, _o), entries in zip(keyed_objs, snap_entries):
                ts.pieces[key] = entries
            _tick("scene-build cache restore (atlas copy + piece lists)")
            return
        _SCENE_BUILD_CACHE_STATS["misses"] += 1

    for key in culled:
        ts.pieces[key] = []
    # Brush kernels flush on a side thread CONCURRENTLY with the tile
    # flush: at a first-visit zoom scale the brush group's bucket combo
    # (hp, wp, patch, n-points) is often a program shape this process has
    # not loaded yet, and program loads from separate threads overlap
    # (CLAUDE.md program-load economics) — serialized, the load tail sat
    # on the zoom step's critical path.  Atlas pastes stay sequential on
    # this thread (slot allocation mutates ts).
    import threading as _threading

    bres: dict = {}

    def _brush_flush():
        try:
            bres["b"] = bb.flush()
        except BaseException as e:  # re-raised on the main thread below
            bres["err"] = e

    bth = _threading.Thread(target=_brush_flush, daemon=True)
    bth.start()
    blocks, registry = tb.flush()
    _tick("tile flush (stack+upload+dispatch)")
    ts.add_rastered(registry, blocks)
    _tick("paste into atlas")
    bth.join()
    if "err" in bres:
        raise bres["err"]
    bblocks, bregistry = bres["b"]
    ts.add_rastered(bregistry, bblocks)
    _tick("brush flush+paste")
    for key in handled:
        ts.pieces.setdefault(key, [])  # swept-empty objects have no pieces
    for key, o in fallback:
        spr = full_sprite_of_object(o)
        if spr is not None:
            ts.add_object(key, spr)
        else:
            ts.pieces[key] = []
    _tick(f"fallback scalar path ({len(fallback)} objects)")

    if cacheable and _SCENE_BUILD_CACHE_MAX > 0:
        # Snapshot AFTER the whole build; the copy isolates the snapshot
        # from later donated in-place mutations (animated slots, edits).
        snap_entries = [list(ts.pieces.get(key, ())) for key, _o in keyed_objs]
        _SCENE_BUILD_CACHE[digest] = (
            _copy_atlas_kernel(ts.atlas()),
            ts._n_pieces,
            snap_entries,
        )
        while len(_SCENE_BUILD_CACHE) > _SCENE_BUILD_CACHE_MAX:
            _SCENE_BUILD_CACHE.popitem(last=False)


def prewarm_brush_zoom(keyed_objs, nty: int, ntx: int, tmats_list=None,
                       width: int = None, height: int = None) -> None:
    """Load the brush-tile kernel programs a ZOOM STEP would mint, before
    the user zooms.

    The brush program key (raster/brush_tiles._brush_group_kernel's static
    args) depends on the brush's padded-size bucket and the stroke's tile
    footprint bucket — both change with scale, so the first visit of a zoom
    scale minted fresh brush programs whose ~1-2 s load (or an XLA compile
    on a cache-cold machine) landed INSIDE the interactive step:
    build_tiled_scene overlaps the brush flush with the tile flush, but the
    load tail exceeded that window (measured 1.2 s of the 2.6 s first-visit
    4K zoom).  This stages the scene's brush strokes under each transform
    in `tmats_list` (default: 2x in and 0.5x out about the grid centre —
    the engine zoom tool's click steps, engine.ml:1083-1090) into scratch
    builders and flushes them, discarding the pieces: the flush dispatches
    exactly the programs the real zoom will use (strokes that land
    off-grid stage empty, like the real build).  Call from an idle/side
    thread after a scene build."""
    from .. import transform as tr
    from ..raster.brush_tiles import BrushTileBuild

    if tmats_list is None:
        # Scale about the LOGICAL frame centre when the caller gives it —
        # the engine zoom tool uses W/2, H/2 of the frame, and at non
        # tile-multiple sizes (4K: H=2160 pads to 2176) the padded-grid
        # centre is off by half the padding, enough to shift strokes near
        # a tile boundary into a different footprint bucket (i.e. a brush
        # program this prewarm would then NOT have loaded).
        w = (width if width is not None else ntx * TILE_W) / 2.0
        h = (height if height is not None else nty * TILE_H) / 2.0
        tmats_list = [
            [tr.Translate(w, h), tr.Scale((0.0, 0.0), s, s), tr.Translate(-w, -h)]
            for s in (2.0, 0.5)
        ]
    brushy = [(k, o) for k, o in keyed_objs if _brush_extract(o) is not None]
    if not brushy:
        return
    for tmats in tmats_list:
        bb = BrushTileBuild(nty, ntx)
        for key, o in brushy:
            bext = _brush_extract(R.transform_renderobject_many(list(tmats), o))
            if bext is not None:
                bb.add_stroke(key, *bext)
        bb.flush()


def tiled_sprite_of_object(o: R.Obj, width: int, height: int):
    """One object's Sprite assembled from tile-kernel pieces — the cheap
    path when the tile-class programs are already compiled (e.g. the scene
    was just built with build_tiled_scene): reuses them instead of paying
    the scalar pipeline's per-bucket program zoo.

    The mask is (alpha > 0): pixels the scalar path keeps in the mask at
    opacity 0 drop out, which is bit-neutral under `over` (prelerp with a
    clear source is the identity).  Frame-grid aligned: `width`/`height`
    must be tile multiples; parts outside fall away (content is clipped to
    the grid like TiledScene.add_object)."""
    from ..raster.tile_raster import TileBuild

    nty, ntx = height // TILE_H, width // TILE_W
    ext = _batch_extract(o)
    if ext is None:
        return full_sprite_of_object(o)
    tb = TileBuild(nty, ntx)
    if not tb.add_object("k", *ext):
        return full_sprite_of_object(o)
    # combined=False: one object stages a handful of items; the combined
    # path would stage and upload the full fixed-chunk flat buffer (~30 MB
    # of padding) for them.  The small pow2-bucket programs this loads are
    # cheap relative to that upload and reusable across calls.
    blocks, registry = tb.flush(combined=False)
    pieces = registry.get("k", [])
    if not pieces:
        return None
    # Host-side assembly (one readback per block, one device push): a
    # per-piece eager dynamic_update_slice chain would cost one transport
    # round trip per piece.
    block_arrays = [np.asarray(b) for b in blocks]
    return _sprite_from_tile_pieces(pieces, block_arrays, ntx)


def _sprite_from_tile_pieces(pieces, block_arrays, ntx: int):
    """Assemble a Sprite from tile pieces on the host.  pieces: [(tile,
    block_id, slot)]; block_arrays: list of (n, TILE_H, TILE_W) uint32
    numpy arrays.  Mask is (alpha > 0), bit-neutral under `over`."""
    from ..raster.pallas_compositor import TILE_H, TILE_W

    tys = [t // ntx for t, _, _ in pieces]
    txs = [t % ntx for t, _, _ in pieces]
    ty0, tx0 = min(tys), min(txs)
    th, tw = max(tys) - ty0 + 1, max(txs) - tx0 + 1
    packed = np.zeros((th * TILE_H, tw * TILE_W), np.uint32)
    for t, b, s in pieces:
        ty, tx = t // ntx - ty0, t % ntx - tx0
        packed[ty * TILE_H : (ty + 1) * TILE_H, tx * TILE_W : (tx + 1) * TILE_W] = (
            block_arrays[b][s]
        )
    rgba = np.stack(
        [packed & 0xFF, (packed >> 8) & 0xFF, (packed >> 16) & 0xFF, packed >> 24],
        axis=-1,
    ).astype(np.int32)
    mask = rgba[..., 3] > 0
    box = (
        tx0 * TILE_W + 1,
        ty0 * TILE_H + 1,
        (tx0 + tw) * TILE_W,
        (ty0 + th) * TILE_H,
    )
    return region.Sprite(box, jnp.asarray(mask), jnp.asarray(rgba))


_GROUP_FOLD_CHUNK = 16


@functools.partial(jax.jit, static_argnames=("hb", "wb"))
def _group_fold_chunk(acc, open_mask, covered, offs, *layers, hb, wb):
    """Continue a front-to-back caf-over fold over one chunk of layers
    (the ONE shared fold body, framepath.fold_layers_carry); chunking with
    the (acc, open, covered) carry is identity for a left fold."""
    from ..raster.framepath import fold_layers_carry

    return fold_layers_carry(offs, layers, acc, open_mask, covered)


def group_sprite_batched(objs, shp):
    """A Group's rendered sprite via the batched pipeline: rasterize every
    member with full_sprites_of_objects (one fused dispatch per bucket
    group), then fold them front-to-back restricted to `shp` in a few
    chunked kernel calls — replacing the per-member render_scene fold
    (render.ml:1310-1335), whose per-object dispatch chains and growing
    accumulator buckets dominate a cold scene build.  Bit-identical: same
    sprites (fuzz-tested vs the scalar path), same left fold, same
    restriction; group-internal early termination happens by masking.

    Returns NotImplemented when any member is unsupported (non-Basic,
    non-plain fill, or a compop the fold does not model) — the caller
    falls back to the per-object path."""
    if shp is None:
        return region.NULL_SPRITE
    for o in objs:
        if o.compop is not R.OVER or _batch_extract(o) is None:
            return NotImplemented
    sprites = full_sprites_of_objects(objs)
    layers = [s for s in sprites if s is not None]
    if not layers:
        return region.NULL_SPRITE
    H, W = shp.mask.shape
    box = shp.box
    acc = jnp.zeros((H, W, 4), jnp.int32)
    open_mask = shp.mask
    covered = jnp.zeros((H, W), bool)
    for lo in range(0, len(layers), _GROUP_FOLD_CHUNK):
        chunk = layers[lo : lo + _GROUP_FOLD_CHUNK]
        offs = np.asarray(
            [(s.box[1] - box[1], s.box[0] - box[0]) for s in chunk], np.int32
        )
        flat = []
        for s in chunk:
            flat.append(s.rgba)
            flat.append(s.mask)
        acc, open_mask, covered = _group_fold_chunk(
            acc, open_mask, covered, offs, *flat, hb=H, wb=W
        )
    rgba = jnp.where(covered[..., None], acc, 0)
    return region.Sprite(box, covered, rgba)


def sprites_of_keys(ts: TiledScene, keys):
    """Materialize per-object Sprites from a built TiledScene's atlas pieces
    — ONE atlas readback + numpy assembly + one device push per object, so
    a scene built with build_tiled_scene (a handful of XLA programs) also
    yields the per-layer sprites the framepath window kernels fold, without
    re-paying the scalar pipeline's per-bucket program zoo.

    Boxes are tile-aligned; mask is (alpha > 0), which is bit-neutral under
    `over` (premultiplied clear pixels are the identity source)."""
    atlas = [np.asarray(ts.atlas())]  # (n, TILE_H, TILE_W) uint32
    out = []
    for key in keys:
        pieces = ts.pieces.get(key)
        if not pieces:
            out.append(None)
            continue
        out.append(
            _sprite_from_tile_pieces([(t, 0, e) for t, e in pieces], atlas, ts.ntx)
        )
    return out


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _paste_alpha(alpha_src, dy, dx, *, H, W):
    hs, ws = alpha_src.shape
    iy = jnp.arange(H) - dy
    ix = jnp.arange(W) - dx
    vy = (iy >= 0) & (iy < hs)
    vx = (ix >= 0) & (ix < ws)
    g = alpha_src[jnp.clip(iy, 0, hs - 1), :][:, jnp.clip(ix, 0, ws - 1)]
    return jnp.where(vy[:, None] & vx[None, :], g, 0)


def alpha_plane_of_object(o: R.Obj, width: int, height: int):
    """(height, width) int32 alpha plane of an object's raster — the filter
    geometry alpha that blend' weights by (render.ml:1248-1265).

    Must match the general renderer's `sprite_of_basicshape` (render.ml:1097)
    BIT-EXACTLY, which rasterizes pure AA coverage with NO minshape shortcut:
    geometrically-interior pixels within the Gaussian softness bleed of an
    edge get alpha < 255 (e.g. 240 one pixel inside an axis-aligned edge).
    The tile/batched fast paths use the minshape split (interior = flat 255),
    so they are wrong here by design — this is a once-per-filter setup cost,
    not a per-frame one, so the general path's dispatch cost is fine."""
    shp = R.shapeonly_of_basicshape(o)
    spr = R.sprite_of_basicshape(o, shp, [o])
    if spr is None or region.is_null_sprite(spr):
        return jnp.zeros((height, width), jnp.int32)
    alpha = jnp.where(spr.mask, spr.rgba[..., 3], 0)
    return _paste_alpha(alpha, spr.box[1] - 1, spr.box[0] - 1, H=height, W=width)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _background_kernel(bgvec, *, h, w):
    """(h, w) packed-u32 constant-colour plane from a (4,) int32 vector."""
    return pack_rgba(jnp.broadcast_to(bgvec, (h, w, 4)).astype(jnp.int32))


class DeviceView:
    """A window-sized packed framebuffer + tiled scene with dirty tracking."""

    def __init__(self, width: int, height: int, bg_colour: int = None,
                 atlas_cap: int = None):
        # Round up to tile multiples; the logical window is (width, height).
        self.width, self.height = width, height
        self.pw = ((width + TILE_W - 1) // TILE_W) * TILE_W
        self.ph = ((height + TILE_H - 1) // TILE_H) * TILE_H
        self.ts = TiledScene(self.pw, self.ph)
        if atlas_cap:
            # Preallocate atlas capacity: every downstream program's shape
            # key (full/dirty render, fused animated frame) is then fixed
            # before the scene exists — loadable ahead of the build and
            # shared across scenes that fit the capacity.
            self.ts._ensure(atlas_cap)
        bg = bg_colour if bg_colour is not None else C.white
        bgvec = jnp.asarray(C.rgba_of_colour(bg), jnp.int32)
        # ONE jitted program (not ~10 eager ops — each eager op on a remote
        # transport is a round trip plus a first-time tiny-program load).
        self.background = _background_kernel(bgvec, h=self.ph, w=self.pw)
        # A DISTINCT buffer (same program, second execution): the dirty
        # render donates `frame` while reading `background` — aliasing them
        # would be `f(a, donate(a))`.
        self.frame = _background_kernel(bgvec, h=self.ph, w=self.pw)
        self.order: List[object] = []  # idsets front-to-back
        self.sprites: Dict[object, object] = {}
        # key -> source R.Obj: tiled builds materialize no Sprite, so
        # edits that need the geometry (translate of a tiled object)
        # re-rasterize from here.
        self.objs: Dict[object, R.Obj] = {}
        self.dirty: Set[int] = set(range(self.ts.nty * self.ts.ntx))
        self.mesh = None
        self._interpret = False

    def use_mesh(self, mesh, interpret: bool = False):
        """Shard this view's frame by tile rows over `mesh` (the production
        multi-chip path): full renders go through render_sharded, dirty
        renders through render_dirty_sharded — per-band Pallas kernels over
        a BANDED atlas (`raster.tiled_scene.BandedAtlas`: each device holds
        only its band's referenced pieces, ~1/n_dev of the global atlas
        bytes), zero cross-device traffic.  `interpret` runs the Pallas
        kernels in interpret mode (CPU meshes)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        assert self.ts.nty % mesh.devices.size == 0, (mesh, self.ts.nty)
        self.mesh = mesh
        self._interpret = interpret
        sh = NamedSharding(mesh, P(mesh.axis_names[0], None))
        self.background = jax.device_put(self.background, sh)
        self.frame = jax.device_put(self.frame, sh)

    # --- scene maintenance ----------------------------------------------------

    def _tiles_of(self, key) -> Set[int]:
        return {tile for tile, _ in self.ts.pieces.get(key, ())}

    def set_scene(self, scene: List[R.Obj], tiled: bool = False, staged=None):
        """(Re)build from a scene list (front-to-back), batch-rasterized.

        tiled=True uses the tile-normalized rasterizer (a handful of XLA
        programs for the whole scene — the fast cold start); it does not
        materialize per-object Sprites, so the first translate_object on
        such an object re-rasterizes from the retained geometry (further
        moves then shift the materialized Sprite).  staged: a
        stage_tiled_scene result for `scene`, if the host sweep already
        ran (overlapped with backend bring-up)."""
        self.order = []
        if tiled:
            keyed = [(o.idset, o) for o in scene]
            build_tiled_scene(self.ts, keyed, staged=staged)
            for o in scene:
                self.sprites[o.idset] = None
                self.objs[o.idset] = o
                self.order.append(o.idset)
                self.dirty |= self._tiles_of(o.idset)
            return
        sprites = full_sprites_of_objects(list(scene))
        for o, spr in zip(scene, sprites):
            self._install(o, spr, None)

    def reset_scene(self, scene: List[R.Obj], tiled: bool = False, staged=None):
        """Replace the WHOLE scene in place (interactive zoom/pan — the
        reference transforms the scene and redraws, engine.ml:1015-1057):
        unlike constructing a fresh DeviceView, this keeps the device
        allocations (atlas capacity, background plane) and every loaded
        program (shape keys are capacity-bucketed), so only the new
        scene's sweep + flush + render are paid."""
        self.ts.reset()
        self.sprites = {}
        self.dirty = set(range(self.ts.nty * self.ts.ntx))
        self.set_scene(scene, tiled=tiled, staged=staged)

    def prefetch_scene(self, scene: List[R.Obj]) -> None:
        """Speculatively build `scene` into the scene-build cache — e.g.
        the 2x-zoomed scene the user is likely to visit next — from an
        idle/side thread.  A later reset_scene(scene', tiled=True) whose
        staged CONTENT matches (the digest is content-addressed, so the
        zoom tool re-deriving the same transform hits even with brand-new
        object ids) then restores in one atlas copy (~0.15 s at 4K)
        instead of a full stage+upload+build (~1-2.5 s first visit).

        The live view is untouched: the build runs into a scratch
        TiledScene preallocated to the live atlas capacity (the cache
        restore requires matching snapshot/atlas shapes).  Scenes with
        scalar-fallback objects are not digestible and are skipped after
        the host staging pass (no device work)."""
        if _SCENE_BUILD_CACHE_MAX <= 0:
            return
        keyed = [(o.idset, o) for o in scene]
        ts = TiledScene(self.pw, self.ph)
        if self.ts._data is not None:
            ts._ensure(int(self.ts._data.shape[0]))
        staged = stage_tiled_scene(ts.nty, ts.ntx, ts.width, ts.height, keyed)
        digest = staged[5]
        if digest is None or digest in _SCENE_BUILD_CACHE:
            return
        build_tiled_scene(ts, keyed, staged=staged)

    def prefetch_zoom_candidates(
        self,
        scene: List[R.Obj],
        cx: Optional[float] = None,
        cy: Optional[float] = None,
        factors=(2.0, 0.5),
    ) -> None:
        """Speculatively build the scenes the zoom tool would produce next
        (VERDICT r3 item 7): for each factor, the whole-scene scale about
        the viewport centre, staged + built into the scene-build cache
        from idle time.  Uses the zoom tool's exact transform recipe
        (translate-scale-translate composed via transform_renderobject_many,
        engine.ml:1015-1057 semantics) so the content digest of a real
        later zoom step matches bit-for-bit and restores in one atlas
        copy.  Run this from an idle/side thread; the live view is
        untouched."""
        from .. import transform as tr

        # Logical frame centre — NOT the tile-padded pw/ph: the zoom tool
        # scales about width/2, height/2, and the content digest only
        # matches if the transform floats are bit-identical.
        cx = self.width / 2.0 if cx is None else float(cx)
        cy = self.height / 2.0 if cy is None else float(cy)
        for f in factors:
            tmat = [
                tr.Translate(cx, cy),
                tr.Scale((0.0, 0.0), float(f), float(f)),
                tr.Translate(-cx, -cy),
            ]
            self.prefetch_scene(
                [R.transform_renderobject_many(tmat, o) for o in scene]
            )

    def add_object(self, o: R.Obj, index: Optional[int] = None):
        self._install(o, full_sprite_of_object(o), index)

    def _install(self, o: R.Obj, spr, index: Optional[int]):
        key = o.idset
        self.objs[key] = o
        if spr is not None:
            self.ts.add_object(key, spr)
            self.sprites[key] = spr
        else:
            self.ts.pieces[key] = []
            self.sprites[key] = None
        if index is None:
            self.order.append(key)
        else:
            self.order.insert(index, key)
        self.dirty |= self._tiles_of(key)

    def make_animated(self, key):
        """Reserve in-place atlas slots for an object that will move every
        frame: translate_object then updates its pieces with one fused
        dispatch into a fixed-size atlas, instead of appending a new block
        (which would regrow and re-concatenate the atlas per frame)."""
        spr = self.sprites.get(key)
        if spr is None:
            raise ValueError("make_animated: object has no materialized sprite")
        hs, ws = spr.mask.shape
        cap = ((hs + TILE_H - 1) // TILE_H + 1) * ((ws + TILE_W - 1) // TILE_W + 1)
        self.ts.reserve_slots(key, cap)
        self.ts.update_object_inplace(key, spr)
        self.dirty |= self._tiles_of(key)

    def translate_object(self, key, dx: int, dy: int):
        """Move an object by whole pixels: reuse its raster (box shift) and
        re-shatter — no re-rasterization.  Animated objects (make_animated)
        update their reserved atlas slots in place."""
        old_tiles = self._tiles_of(key)
        spr = self.sprites.get(key)
        if spr is None:
            # Tiled builds materialize no Sprite: re-rasterize from the
            # retained geometry with the translate composed in (the tile
            # programs are already loaded, so this is one cheap dispatch;
            # afterwards the materialized Sprite makes further moves plain
            # box shifts).  Also covers an offscreen-culled object moving
            # back onto the grid.
            o = self.objs.get(key)
            if o is None:
                return
            # translate_renderobject mints NEW idsets (idset == content is
            # the render-cache invariant; the alias it registers lets the
            # scalar path reuse the stored raster translated).  The VIEW
            # key stays `key` — sprites/pieces/order are keyed by it.
            o2 = R.translate_renderobject(dx, dy, o)
            self.objs[key] = o2
            spr2 = tiled_sprite_of_object(o2, self.pw, self.ph)
            self.sprites[key] = spr2
            if spr2 is not None and not region.is_null_sprite(spr2):
                self.ts.add_object(key, spr2)
            else:
                self.ts.set_empty(key)  # frees the old pieces' slots
            self.dirty |= old_tiles | self._tiles_of(key)
            return
        moved = translate_sprite(dx, dy, spr)
        self.sprites[key] = moved
        if key in self.ts._reserved:
            self.ts.update_object_inplace(key, moved)
        else:
            self.ts.add_object(key, moved)  # replaces the piece list
        self.dirty |= old_tiles | self._tiles_of(key)

    def replace_object(self, key, o: R.Obj):
        """Re-rasterize an edited object in place."""
        old_tiles = self._tiles_of(key)
        spr = full_sprite_of_object(o)
        self.sprites[o.idset] = spr
        self.objs[o.idset] = o
        if spr is not None:
            self.ts.add_object(o.idset, spr)
        else:
            self.ts.pieces[o.idset] = []
        self.order = [o.idset if k == key else k for k in self.order]
        if key != o.idset:
            self.sprites.pop(key, None)
            self.objs.pop(key, None)
            # The old key's pieces are no longer in the order: free their
            # atlas slots (they leaked before).
            self.ts.remove_object(key)
        self.dirty |= old_tiles | self._tiles_of(o.idset)

    def remove_object(self, key) -> None:
        """Delete an object from the scene: its tiles go dirty and its
        atlas slots (the whole reserved run for an animated object) return
        to the free pool — the atlas never grows from delete/re-add churn."""
        self.dirty |= self._tiles_of(key)
        self.ts.remove_object(key)
        self.order = [k for k in self.order if k != key]
        self.sprites.pop(key, None)
        self.objs.pop(key, None)

    def restack(self, new_order: List[object]):
        """Depth changes: tiles where relative order changed go dirty."""
        moved = {
            k
            for k, (a, b) in enumerate(zip(self.order, new_order))
            if a != b
        }
        for idx in moved:
            self.dirty |= self._tiles_of(self.order[idx])
            self.dirty |= self._tiles_of(new_order[idx])
        self.order = list(new_order)

    # --- rendering -------------------------------------------------------------

    def render(self, full: bool = False) -> None:
        """Composite dirty tiles (or everything) into the frame buffer."""
        from ..raster.tiled_scene import render_dirty_sharded, render_sharded

        if full:
            if self.mesh is not None:
                self.frame = render_sharded(
                    self.ts, self.background, self.order, self.mesh,
                    interpret=self._interpret,
                )
            else:
                starts, idxs = self.ts.build_lists(self.order)
                # Gather-free atlas kernel: at the HBM listed-bytes floor
                # on full frames (see _kernel_atlas_row).
                self.frame = self.ts.render_full(self.background, starts, idxs)
        else:
            if not self.dirty:
                return
            # In-place dirty-tile re-render: the grid runs only over the
            # dirty list (frame is donated into the kernel).
            if self.mesh is not None:
                self.frame = render_dirty_sharded(
                    self.ts, self.frame, self.background, self.order,
                    sorted(self.dirty), self.mesh, interpret=self._interpret,
                )
            else:
                self.frame = self.ts.render_dirty(
                    self.frame, self.background, self.order, sorted(self.dirty)
                )
        self.dirty.clear()

    def read(self) -> np.ndarray:
        """(height, width, 4) uint8 RGBA of the logical window."""
        rgba = unpack_rgba(self.frame)
        return np.asarray(rgba, dtype=np.uint8)[: self.height, : self.width]


# ---------------------------------------------------------------------------
# Blur-filtered display: a display plane maintained as the blur-filter blend
# of a DeviceView's (unfiltered) tiled content.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=("hb", "wb", "weights", "total")
)
def _blur_blend_window_kernel(
    display, content_packed, f_alpha, oy, ox, ry0, rx0, h, w, d_box, *, hb, wb, weights, total
):
    """Blend the blur of the CONTENT plane into the display window — the
    per-frame filter pass of the tiled animated path.  Semantics match
    framepath._recomposite_blur_impl's conv+blend stage exactly (the exact
    separable integer convolution of convolve.ml:115-158 and the blend' of
    render.ml:1248-1265); the content fold itself already happened in the
    tiled compositor (render_dirty), which performs the same front-to-back
    caf-over fold per tile.

    d_box: (4,) int32 dirty rect in WINDOW coords (row0, col0, row1, col1
    inclusive).  The window must be the dirty box bloated by 2*radius and
    the content tiles covering it must be freshly recomposited, so the
    convolution support of every written pixel reads true scene content."""
    from ..raster.framepath import conv_blend_window

    win = lax.dynamic_slice(content_packed, (oy, ox), (hb, wb))
    content = unpack_rgba(win)
    rows = jnp.arange(hb)[:, None]
    cols = jnp.arange(wb)[None, :]
    inwin = (rows >= ry0) & (rows < ry0 + h) & (cols >= rx0) & (cols < rx0 + w)
    fa = lax.dynamic_slice(f_alpha, (oy, ox), (hb, wb))
    changed, blended = conv_blend_window(
        content, fa, inwin, rows, cols, d_box, weights, total
    )
    display_win = lax.dynamic_slice(display, (oy, ox, 0), (hb, wb, 4))
    out = jnp.where(changed[..., None], blended, display_win)
    return lax.dynamic_update_slice(display, out, (oy, ox, 0))


@functools.lru_cache(maxsize=8)
def _blur_blend_window_mesh_jit(mesh):
    """The window blur-blend jitted with a row-sharded display output: the
    same integer math as _blur_blend_window_kernel (bit-exact), but the
    display plane stays distributed over the mesh — XLA inserts the halo
    collectives where the window's conv support crosses shard borders
    (SURVEY §5.8)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh3 = NamedSharding(mesh, P(mesh.axis_names[0], None, None))
    return jax.jit(
        _blur_blend_window_kernel.__wrapped__,
        donate_argnums=(0,),
        static_argnames=("hb", "wb", "weights", "total"),
        out_shardings=sh3,
    )


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _unpack_crop_kernel(packed, *, h, w):
    return unpack_rgba(packed)[:h, :w]


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1, 2),
    static_argnames=("n_slots", "hb", "wb", "weights", "total", "interpret"),
)
def _animated_blur_frame_kernel(
    atlas, content, display, rgba, oys, oxs, base, coords, spans, idxs, bg,
    f_alpha, oy, ox, ry0, rx0, h, w, d_box,
    *, n_slots, hb, wb, weights, total, interpret=False,
):
    """ONE dispatch for a whole animated-with-filter frame: shatter the
    moved object's raster into its reserved atlas slots, recomposite the
    dirty content tiles (Pallas), and blur-blend the dirty window into the
    display — the fusion of the three per-frame kernels (atlas/content/
    display all donated)."""
    from ..raster.tiled_scene import _render_dirty_tiles, _shatter_into_kernel

    atlas = _shatter_into_kernel.__wrapped__(atlas, rgba, oys, oxs, base)
    content = _render_dirty_tiles.__wrapped__(
        coords, spans, idxs, bg, content, atlas, n_slots=n_slots,
        interpret=interpret,
    )
    display = _blur_blend_window_kernel.__wrapped__(
        display, content, f_alpha, oy, ox, ry0, rx0, h, w, d_box,
        hb=hb, wb=wb, weights=weights, total=total,
    )
    return atlas, content, display


@functools.partial(
    jax.jit,
    donate_argnums=(0, 1, 2),
    static_argnames=(
        "n_slots", "hb", "wb", "weights", "total", "interpret", "capture_every",
    ),
)
def _play_animated_kernel(
    atlas, content, display, rgba, base, bg, f_alpha,
    oys_t, oxs_t, coords_t, spans_t, idxs_t, win_t, dbox_t,
    *, n_slots, hb, wb, weights, total, interpret=False, capture_every=0,
):
    """Render a WHOLE animation device-side: `lax.scan` of the fused
    animated-with-filter frame over per-step host-staged scalars (shatter
    offsets, dirty-tile lists, blur-window geometry), carrying
    (atlas, content, display).  One dispatch for T frames — playback at
    device rate instead of tunnel-dispatch rate (each host dispatch costs
    ~0.4-2 ms on this transport; the fused frame itself is tens of us).
    With capture_every=k, emits every k-th display plane as packed RGBA
    uint8 ((T//k, H, W, 4) — 2 MB/frame at 1080p); 0 captures nothing.
    No reference analogue (engine.ml steps one event at a time); this is
    the TPU-native offline-playback/export mode."""

    def one(carry, xs):
        atlas, content, display = carry
        oys, oxs, coords, spans, idxs, win, d_box = xs
        atlas, content, display = _animated_blur_frame_kernel.__wrapped__(
            atlas, content, display, rgba, oys, oxs, base, coords, spans,
            idxs, bg, f_alpha, win[0], win[1], win[2], win[3], win[4], win[5],
            d_box, n_slots=n_slots, hb=hb, wb=wb, weights=weights,
            total=total, interpret=interpret,
        )
        return (atlas, content, display), None

    xs = (oys_t, oxs_t, coords_t, spans_t, idxs_t, win_t, dbox_t)
    if not capture_every:
        carry, _ = jax.lax.scan(one, (atlas, content, display), xs)
        return carry, None

    k = capture_every
    n_chunks = oys_t.shape[0] // k
    xs_chunked = jax.tree_util.tree_map(
        lambda a: a.reshape((n_chunks, k) + a.shape[1:]), xs
    )

    def chunk(carry, xs_c):
        carry, _ = jax.lax.scan(one, carry, xs_c)
        return carry, carry[2].astype(jnp.uint8)

    carry, frames = jax.lax.scan(chunk, (atlas, content, display), xs_chunked)
    return carry, frames


def prewarm_animated(view: "DeviceView", kernel, key, dx: int, dy: int) -> None:
    """Load the animated loop's XLA programs before the loop runs, using
    throwaway zero buffers with exactly the shapes and statics the live
    calls will use; installs NO view/display state.  On the remote TPU
    transport each distinct program pays a one-time ~1-7 s load, so calling
    this from a side thread once the scene is final (after make_animated)
    overlaps those loads with the remaining build work.  Covers the FUSED
    animated-with-filter frame (step_animated) and the unfused plain pair
    (translate_object's in-place shatter + the dirty-tile recomposite)."""
    from ..raster.framepath import blur_window
    from ..raster.tiled_scene import _render_dirty_tiles, _shatter_into_kernel

    ts = view.ts
    spr = view.sprites.get(key)
    if spr is None or key not in ts._reserved or view.mesh is not None:
        return
    moved = translate_sprite(dx, dy, spr)
    got = ts._inplace_args(key, moved)
    if got is None:
        return
    oys, oxs, base, entries = got
    old_tiles = {t for t, _ in ts.pieces.get(key, ())}
    new_tiles = {t for t, _ in entries}
    interp = _tiled_interpret()

    # The three loop programs are independent; their first calls each block
    # on trace + compile-cache load, so issue them from separate threads
    # (loads on the remote transport overlap — measured 10.2 s serial ->
    # 1.8 s threaded for comparable program sets).
    import threading

    def _plain():
        # Plain (unfused) loop: in-place shatter + dirty-tile recomposite.
        zatlas = jnp.zeros(ts.atlas().shape, jnp.uint32)
        zatlas = _shatter_into_kernel(zatlas, moved.rgba, oys, oxs, base)
        plain = ts._dirty_args(
            view.order, old_tiles | new_tiles, pieces_override={key: entries}
        )
        if plain is not None:
            coords, spans, idxs, n_slots = plain
            _render_dirty_tiles(
                coords, spans, idxs, view.background,
                jnp.zeros((view.ph, view.pw), jnp.uint32), zatlas,
                n_slots=n_slots, interpret=interp,
            )

    def _fused():
        # Fused animated-with-filter frame (mirrors step_animated's staging
        # with view.dirty empty — the steady state of the animated loop).
        box = (1, 1, view.width, view.height)
        dirty_box = region.box_union(spr.box, moved.box)
        win = blur_window(dirty_box, box, kernel.radius, view.height, view.width)
        if win is None:
            return
        _, oy, ox, ry0, rx0, h, w, hb, wb, d_box = win
        probe = FilteredDisplay(view, None, kernel)
        dirty_tiles = (
            old_tiles | new_tiles | probe._window_tiles(oy, ox, ry0, rx0, h, w)
        )
        got2 = ts._dirty_args(view.order, dirty_tiles, pieces_override={key: entries})
        if got2 is None:
            return
        coords, spans, idxs, n_slots = got2
        _animated_blur_frame_kernel(
            jnp.zeros(ts.atlas().shape, jnp.uint32),
            jnp.zeros((view.ph, view.pw), jnp.uint32),
            jnp.zeros((view.height, view.width, 4), jnp.int32),
            moved.rgba, oys, oxs, base, coords, spans, idxs,
            view.background,
            jnp.zeros((view.height, view.width), jnp.int32),
            oy, ox, ry0, rx0, h, w, d_box,
            n_slots=n_slots, hb=hb, wb=wb,
            weights=tuple(kernel.values), total=kernel.total,
            interpret=interp,
        )

    threads = [threading.Thread(target=f, daemon=True) for f in (_plain, _fused)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()


class FilteredDisplay:
    """Display = blur(content) blended by a filter geometry's alpha plane.

    Drives the tiled animated path: the DeviceView's frame is the exact
    UNFILTERED scene content (per-tile front-to-back folds); this class
    derives the displayed frame by blending the blur filter into it —
    full-frame once, then incrementally per dirty window (3 dispatches per
    animated frame: atlas piece update + dirty-tile recomposite + blur
    blend).  Bit-identical to the general renderer's filter recursion
    (tests/test_blit_blur.py)."""

    def __init__(self, view: DeviceView, f_alpha, kernel):
        self.view = view
        self.f_alpha = f_alpha
        self.kernel = kernel
        self.rgba = None  # (height, width, 4) int32 display plane
        self.box = (1, 1, view.width, view.height)

    def full_refresh(self):
        """Initial full application: render pending content, blur-blend
        everywhere.  Under a mesh the display plane comes out row-sharded.

        Content renders through the DIRTY path (after set_scene/reset_scene
        every tile is dirty, so this IS a full content render): the dirty
        kernel's program is a fraction of the run-contiguous full-frame
        pair's size, and on the remote TPU transport program-load latency
        scales with program size — a cold start that only ever needs one
        full frame should not wait on the big throughput kernel's load
        (render(full=True) keeps it for steady-state full-frame work)."""
        from ..raster.framepath import _apply_blur_rect_kernel

        self.view.render()
        content = _unpack_crop_kernel(
            self.view.frame, h=self.view.height, w=self.view.width
        )
        self.rgba = _apply_blur_rect_kernel(
            content,
            self.f_alpha,
            weights=tuple(self.kernel.values),
            total=self.kernel.total,
        )
        if self.view.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            mesh = self.view.mesh
            self.rgba = jax.device_put(
                self.rgba, NamedSharding(mesh, P(mesh.axis_names[0], None, None))
            )

    def _window_tiles(self, oy, ox, ry0, rx0, h, w):
        """Tiles covering the logical window (whose content must be fresh
        for the conv support)."""
        ntx = self.view.ts.ntx
        x0, y0 = ox + rx0, oy + ry0  # 0-based
        tx_lo, tx_hi = x0 // TILE_W, (x0 + w - 1) // TILE_W
        ty_lo, ty_hi = y0 // TILE_H, (y0 + h - 1) // TILE_H
        return {
            ty * ntx + tx
            for ty in range(ty_lo, ty_hi + 1)
            for tx in range(tx_lo, tx_hi + 1)
        }

    def step(self, dirty: Box) -> None:
        """One animated frame: recomposite the content tiles covering
        bloat(dirty, 2r), then blur-blend the dirty window into the
        display."""
        from ..raster.framepath import blur_window

        got = blur_window(
            dirty, self.box, self.kernel.radius, self.view.height, self.view.width
        )
        if got is None:
            self.view.render()
            return
        d, oy, ox, ry0, rx0, h, w, hb, wb, d_box = got
        # Content tiles covering the conv support must be fresh.
        self.view.dirty |= self._window_tiles(oy, ox, ry0, rx0, h, w)
        self.view.render()
        blend = (
            _blur_blend_window_mesh_jit(self.view.mesh)
            if self.view.mesh is not None
            else _blur_blend_window_kernel
        )
        self.rgba = blend(
            self.rgba,
            self.view.frame,
            self.f_alpha,
            oy,
            ox,
            ry0,
            rx0,
            h,
            w,
            d_box,
            hb=hb,
            wb=wb,
            weights=tuple(self.kernel.values),
            total=self.kernel.total,
        )

    def step_animated(self, key, dx: int, dy: int):
        """Move one animated object and refresh the filtered display in ONE
        fused dispatch (atlas update + dirty-tile recomposite + blur
        blend).  Semantically identical to translate_object + step — the
        same three kernels, fused.  Falls back to that pair when the
        object is not reserved (make_animated); under a mesh the same
        three stages run SHARDED (_step_animated_sharded)."""
        view = self.view
        spr = view.sprites.get(key)
        if spr is None:
            return
        if key not in view.ts._reserved:
            prev_box = spr.box
            view.translate_object(key, dx, dy)
            self.step(region.box_union(prev_box, view.sprites[key].box))
            return
        if view.mesh is not None:
            self._step_animated_sharded(key, dx, dy)
            return
        ts = view.ts
        moved = translate_sprite(dx, dy, spr)
        got = ts._inplace_args(key, moved)
        if got is None:
            prev_box = spr.box
            view.translate_object(key, dx, dy)
            self.step(region.box_union(prev_box, view.sprites[key].box))
            return
        from ..raster.framepath import blur_window

        oys, oxs, base, entries = got
        dirty_box = region.box_union(spr.box, moved.box)
        # Pre-existing dirty tiles (other edits) get fresh CONTENT below;
        # fold their extent into the blend window too, or their displayed
        # (filtered) pixels would stay permanently stale.
        for t in view.dirty:
            ty, tx = t // ts.ntx, t % ts.ntx
            tile_box = (
                tx * TILE_W + 1,
                ty * TILE_H + 1,
                min(view.width, (tx + 1) * TILE_W),
                min(view.height, (ty + 1) * TILE_H),
            )
            dirty_box = region.box_union(dirty_box, tile_box)
        win = blur_window(
            dirty_box, self.box, self.kernel.radius, view.height, view.width
        )
        if win is None:
            view.sprites[key] = moved
            ts.update_object_inplace(key, moved)
            return
        d, oy, ox, ry0, rx0, h, w, hb, wb, d_box = win
        dirty_tiles = view.dirty | self._window_tiles(oy, ox, ry0, rx0, h, w)
        dirty_tiles |= {t for t, _ in ts.pieces.get(key, ())}
        dirty_tiles |= {t for t, _ in entries}
        coords, spans, idxs, n_slots = ts._dirty_args(
            view.order, dirty_tiles, pieces_override={key: entries}
        )
        atlas, content, display = _animated_blur_frame_kernel(
            ts.atlas(),
            view.frame,
            self.rgba,
            moved.rgba,
            oys,
            oxs,
            base,
            coords,
            spans,
            idxs,
            view.background,
            self.f_alpha,
            oy,
            ox,
            ry0,
            rx0,
            h,
            w,
            d_box,
            n_slots=n_slots,
            hb=hb,
            wb=wb,
            weights=tuple(self.kernel.values),
            total=self.kernel.total,
            interpret=_tiled_interpret(),
        )
        ts._data = atlas
        ts.pieces[key] = entries
        view.sprites[key] = moved
        view.frame = content
        view.dirty.clear()
        self.rgba = display

    def play_animated(self, key, deltas, capture_every: int = 0,
                      require_scan: bool = False):
        """Render a whole animation of per-step (dx, dy) moves of `key` in
        ONE device dispatch (`lax.scan` of the fused animated-with-filter
        frame; see _play_animated_kernel).  Semantically identical to
        calling step_animated per delta; this path exists because each
        host dispatch costs ~0.4-2 ms on the remote transport while the
        fused frame itself is tens of us — offline playback and export
        should run at device rate.  Returns the captured
        (len(deltas)//capture_every, H, W, 4) uint8 planes when
        capture_every > 0 (it must divide len(deltas)), else None.

        Falls back to sequential step_animated when the scan cannot be
        staged uniformly: pending non-animated dirt, a mesh, an
        unreserved key, a step leaving the reserved capacity, or blur
        windows straddling bucket sizes.  require_scan=True raises
        RuntimeError (with the reason) instead of falling back — callers
        that MEASURE the scanned path (bench.py's device-rate metric)
        must not silently time the sequential one."""
        view = self.view
        ts = view.ts
        spr = view.sprites.get(key)
        if capture_every and len(deltas) % capture_every:
            raise ValueError("capture_every must divide len(deltas)")

        def fallback(reason):
            if require_scan:
                raise RuntimeError(f"play_animated scan unavailable: {reason}")
            frames = []
            for i, (dx, dy) in enumerate(deltas):
                self.step_animated(key, dx, dy)
                if capture_every and (i + 1) % capture_every == 0:
                    frames.append(np.asarray(self.rgba, np.uint8))
            return np.stack(frames) if capture_every else None

        if (
            spr is None
            or key not in ts._reserved
            or view.mesh is not None
            or view.dirty
            or not deltas
        ):
            return fallback("unreserved key, mesh, pending dirt, or no deltas")

        from ..raster.framepath import blur_window

        # Host-stage every step; all shapes/statics must be uniform.
        prev = spr
        prev_entries = list(ts.pieces.get(key, ()))
        steps = []
        statics = None
        for dx, dy in deltas:
            moved = translate_sprite(dx, dy, prev)
            try:
                got = ts._inplace_args(key, moved)
            except ValueError:  # step outgrows the reserved capacity
                got = None
            if got is None:
                return fallback("step leaves the reserved slot capacity")
            oys, oxs, base, entries = got
            dirty_box = region.box_union(prev.box, moved.box)
            win = blur_window(
                dirty_box, self.box, self.kernel.radius, view.height, view.width
            )
            if win is None:
                return fallback("empty blur window")
            d, oy, ox, ry0, rx0, h, w, hb, wb, d_box = win
            if statics is None:
                statics = (base, hb, wb)
            elif statics != (base, hb, wb):
                return fallback("blur windows straddle bucket sizes")
            dirty_tiles = self._window_tiles(oy, ox, ry0, rx0, h, w)
            dirty_tiles |= {t for t, _ in prev_entries}
            dirty_tiles |= {t for t, _ in entries}
            args = ts._dirty_args(
                view.order, dirty_tiles, pieces_override={key: entries}
            )
            if args is None:
                return fallback("dirty args unavailable for a step")
            coords, spans, idxs, n_slots = args
            steps.append(
                (oys, oxs, coords, spans, idxs,
                 np.asarray([oy, ox, ry0, rx0, h, w], np.int32), d_box, n_slots)
            )
            prev, prev_entries = moved, entries

        base, hb, wb = statics
        # Re-pad every step to the widest slot/entry buckets (padding
        # slots idempotently duplicate the last dirty tile; padding
        # entries are never read past spans).
        ns = max(s[-1] for s in steps)
        ni = max(s[4].shape[0] for s in steps)

        def repad(coords, spans, idxs):
            if coords.shape[0] < 2 * ns:
                c = np.empty(2 * ns, np.int32)
                s = np.empty(2 * ns, np.int32)
                c[: coords.shape[0]] = coords
                s[: spans.shape[0]] = spans
                c[coords.shape[0] :: 2] = coords[-2]
                c[coords.shape[0] + 1 :: 2] = coords[-1]
                s[spans.shape[0] :: 2] = spans[-2]
                s[spans.shape[0] + 1 :: 2] = spans[-1]
                coords, spans = c, s
            if idxs.shape[0] < ni:
                idxs = np.concatenate(
                    [idxs, np.zeros(ni - idxs.shape[0], np.int32)]
                )
            return coords, spans, idxs

        stacked = []
        for oys, oxs, coords, spans, idxs, win6, d_box, _ in steps:
            coords, spans, idxs = repad(coords, spans, idxs)
            stacked.append((oys, oxs, coords, spans, idxs, win6, d_box))
        cols = [np.stack(c) for c in zip(*stacked)]

        (atlas, content, display), frames = _play_animated_kernel(
            ts.atlas(), view.frame, self.rgba, spr.rgba, base,
            view.background, self.f_alpha, *cols,
            n_slots=ns, hb=hb, wb=wb, weights=tuple(self.kernel.values),
            total=self.kernel.total, interpret=_tiled_interpret(),
            capture_every=capture_every,
        )
        ts._data = atlas
        ts.pieces[key] = prev_entries
        view.sprites[key] = prev
        view.frame = content
        self.rgba = display
        return frames

    def _step_animated_sharded(self, key, dx: int, dy: int):
        """The animated-with-filter frame under a mesh: banded reserved-slot
        atlas update + sharded dirty-tile recomposite + sharded blur blend
        — the same three stages as the fused unsharded dispatch, each one
        distributed (content, display AND atlas all stay row-sharded; the
        blend's conv halos cross shard borders as XLA collectives).
        Bit-identical to translate_object + step."""
        from ..raster import tiled_scene as TSmod
        from ..raster.framepath import blur_window

        view = self.view
        ts = view.ts
        spr = view.sprites.get(key)
        moved = translate_sprite(dx, dy, spr)
        got = ts._inplace_args(key, moved)
        if got is None:
            prev_box = spr.box
            view.translate_object(key, dx, dy)
            self.step(region.box_union(prev_box, view.sprites[key].box))
            return
        oys, oxs, base, entries = got
        # Grab (or rebuild) the banded atlas BEFORE installing the new
        # pieces — then keep it valid with an in-place reserved-slot write.
        banded = TSmod._banded_of(ts, view.mesh)
        # The unsharded global atlas is the source of truth for future
        # banded rebuilds (and for leaving the mesh); keep it in step.
        atlas = TSmod._shatter_into_kernel(ts.atlas(), moved.rgba, oys, oxs, base)
        ts._data = atlas
        old_tiles = {t for t, _ in ts.pieces.get(key, ())}
        ts.pieces[key] = entries
        banded.update_inplace(ts, key, moved.rgba, entries, oys, oxs, view.mesh)
        banded.version = ts.pieces.version
        view.sprites[key] = moved

        dirty_box = region.box_union(spr.box, moved.box)
        for t in view.dirty:
            ty, tx = t // ts.ntx, t % ts.ntx
            tile_box = (
                tx * TILE_W + 1,
                ty * TILE_H + 1,
                min(view.width, (tx + 1) * TILE_W),
                min(view.height, (ty + 1) * TILE_H),
            )
            dirty_box = region.box_union(dirty_box, tile_box)
        win = blur_window(
            dirty_box, self.box, self.kernel.radius, view.height, view.width
        )
        view.dirty |= old_tiles | {t for t, _ in entries}
        if win is None:
            view.render()
            return
        d, oy, ox, ry0, rx0, h, w, hb, wb, d_box = win
        view.dirty |= self._window_tiles(oy, ox, ry0, rx0, h, w)
        view.render()
        self.rgba = _blur_blend_window_mesh_jit(view.mesh)(
            self.rgba,
            view.frame,
            self.f_alpha,
            oy,
            ox,
            ry0,
            rx0,
            h,
            w,
            d_box,
            hb=hb,
            wb=wb,
            weights=tuple(self.kernel.values),
            total=self.kernel.total,
        )

    def read(self) -> np.ndarray:
        return np.asarray(self.rgba)
