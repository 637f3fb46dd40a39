"""Tile-normalized batched rasterizer: objects -> fixed-size atlas pieces.

The bucketed per-object build (scene/fastframe._build_group_kernel) compiles
one XLA program per (box bucket, span-capacity) group — ~32 distinct
programs for the lion scene, each costing ~1 s of first-dispatch latency on
a remote TPU transport.  This module replaces it for the tiled-scene path
with a shape-NORMALIZED design: every object is rasterized directly into
frame-aligned TILE_H x TILE_W pieces (the unit of raster/tiled_scene's
atlas), so the whole scene builds with a handful of programs total:

  * the host scanline sweep runs once per object (exact integer spans, the
    same sweeps the general renderer uses: scanline._edge_spans at 1x and
    16x — parity with polygon.ml:520-528 and polygon.ml:673-705);
  * spans are assigned to the tiles they overlap (vectorized numpy; AA
    spans go only to tiles that have fringe pixels — interior tiles need no
    Gaussian table work at all, polygon.ml:707-746 only evaluates coverage
    on the non-interior spans);
  * per (object, tile) work items batch by a small number of span-capacity
    classes; ONE jitted kernel per class rasterizes every item: scatter the
    difference triples, cumsum to masks, Gaussian-matte AA via the stride-16
    table matmul (raster/aa), colour, and pack.

Pixel values are bit-identical to full_sprite_of_object: same span lists,
same table sums, same integer dissolve (tests/test_tile_raster.py).
"""

from __future__ import annotations

import functools
import threading
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .. import colour as C
from . import aa as raa
from .pallas_compositor import TILE_H, TILE_W, pack_rgba

_H = raa._H  # 16
_TTH = _H * TILE_H + _H  # scaled t-plane rows per tile (1040)
_TTW = _H * TILE_W + _H  # scaled t-plane cols per tile (2064)
# Padding row index: any value >= every plane height (<= _TTH = 1040) is
# dropped by the scatter's mode="drop"; int16-representable so the span
# triples upload as (2, k) int16 instead of (3, k) int32 (3x less wire
# traffic — the spans are the dominant upload of a cold scene build).
_PAD_ROW = 32767

# Span-capacity classes: (K1 for each 1x family, KA for the 16x AA family).
# K1/KA grow by 2x per class; items pick the smallest fit.  A finer ladder
# bounds per-item padding at 2x (a 4x ladder shipped ~8x the real span
# payload for a typical scene — measured 47 MB shipped vs ~6 MB real on the
# 1080p lion; at ~45 MB/s of tunnel upload bandwidth padding is cold-start
# wall time).  The number of distinct XLA programs stays bounded by
# len(_CLASSES) x len(N buckets), independent of scene content.
_CLASSES = [(256, 4096), (512, 8192), (1024, 16384), (2048, 32768), (4096, 65536)]
# Interior pieces (no AA fringe in the tile) carry only crossing spans.
_K_INTERIOR = 256


def _scatter_mask(rc, h: int, w: int):
    """bool (h, w) mask from a (2, k) int16 difference-span pair array:
    row 0 = scatter rows, row 1 = scatter cols; the +-1 values are implied
    by slot position (first k/2 slots add +1 at span starts, last k/2 add
    -1 past span ends — the _pairs layout).  Padding rows use _PAD_ROW =
    32767, which is >= every plane height and dropped by mode="drop"
    (negatives would WRAP — callers must pre-filter)."""
    k = rc.shape[1]
    rr = rc[0].astype(jnp.int32)
    cc = rc[1].astype(jnp.int32)
    vv = jnp.where(jnp.arange(k) < k // 2, 1, -1)
    diff = jnp.zeros((h, w + 1), jnp.int32).at[rr, cc].add(vv, mode="drop")
    return jnp.cumsum(diff, axis=1)[:, :-1] > 0


def _edge_impl(cov, cross, aasp, fills):
    """Rasterize edge-tile pieces: (n, 2, K1) cov/cross pairs, (n, 2, KA)
    AA pairs (all tile-relative), (n, 4) plain premultiplied fills.
    Returns (n, TILE_H, TILE_W) packed u32 pieces."""

    def one(args):
        cov1, cross1, aa1, f4 = args
        covm = _scatter_mask(cov1, TILE_H, TILE_W)
        crossm = _scatter_mask(cross1, TILE_H, TILE_W)
        mmask = crossm & ~covm  # interior (minshape rule, polygon.ml:520-528)
        fringe = covm  # shape - minshape == coverage spans
        tmask = _scatter_mask(aa1, _TTH, _TTW)
        opacity = raa._coverage_counts(tmask, h=TILE_H, w=TILE_W)
        colour = f4[None, None, :]
        dissolved = C.dissolve_rgba(colour, opacity)
        rgba = jnp.where(
            mmask[..., None], colour, jnp.where(fringe[..., None], dissolved, 0)
        )
        return pack_rgba(rgba)

    return lax.map(one, (cov, cross, aasp, fills))


def _interior_impl(cross, fills):
    """Rasterize interior pieces (no fringe in the tile): colour where the
    crossing mask covers.  (n, 2, K) pairs, (n, 4) fills."""

    def one(args):
        cross1, f4 = args
        crossm = _scatter_mask(cross1, TILE_H, TILE_W)
        return pack_rgba(jnp.where(crossm[..., None], f4[None, None, :], 0))

    return lax.map(one, (cross, fills))


@functools.partial(jax.jit, static_argnames=("n",))
def _edge_tile_kernel(cov, cross, aasp, fills, *, n: int):
    return _edge_impl(cov, cross, aasp, fills)


@functools.partial(jax.jit, static_argnames=("n",))
def _interior_tile_kernel(cross, fills, *, n: int):
    return _interior_impl(cross, fills)


# Fixed batch sizes per capacity class (and for the interior family): once
# an item count reaches its chunk, work dispatches in fixed-`chunk` batches,
# so the XLA program SHAPES of any big scene build are scene-independent —
# `warmup()` can preload them on the remote transport while the host is
# still sweeping geometry.  Small counts keep their pow2 bucket (tests and
# tiny scenes stay cheap on CPU).
_CHUNKS = [256, 256, 128, 32, 8]
_CHUNK_INTERIOR = 32


def _flat_layout():
    """Static slot layout of the single flat int16 upload buffer holding
    every family's difference-pair array (cov, cross, aa per class, then
    the interior cross), and of the flat int32 fills buffer.  One upload
    shape for the whole combined build: the remote transport pays a
    one-time per-shape transfer setup, and one transfer has no per-call
    overhead per family."""
    segs = []
    off = 0
    for cls, chunk in enumerate(_CHUNKS):
        k1, ka = _CLASSES[cls]
        for k in (k1, k1, ka):
            segs.append((off, (chunk, 2, k)))
            off += chunk * 2 * k
    segs.append((off, (_CHUNK_INTERIOR, 2, _K_INTERIOR)))
    off += _CHUNK_INTERIOR * 2 * _K_INTERIOR
    fsegs = []
    foff = 0
    for chunk in list(_CHUNKS) + [_CHUNK_INTERIOR]:
        fsegs.append((foff, (chunk, 4)))
        foff += chunk * 4
    return segs, off, fsegs, foff


_FLAT_SEGS, _FLAT_LEN, _FILL_SEGS, _FILL_LEN = _flat_layout()


@jax.jit
def _combined_build_kernel(flat16, flat32):
    """Every build family in ONE XLA program fed by ONE flat pair buffer
    and ONE flat fills buffer.  On the remote TPU transport each distinct
    program pays a one-time load latency (~2.5 s measured) and each
    distinct transfer shape a one-time setup, so a cold scene build loads
    one program and one upload shape instead of one per family.  Shapes
    are the fixed chunks (_CHUNKS/_CHUNK_INTERIOR), so the program is
    scene-independent and warmup() preloads it."""

    def seg(i):
        off, shape = _FLAT_SEGS[i]
        n = shape[0] * shape[1] * shape[2]
        return lax.slice(flat16, (off,), (off + n,)).reshape(shape)

    def fills(i):
        off, shape = _FILL_SEGS[i]
        n = shape[0] * shape[1]
        return lax.slice(flat32, (off,), (off + n,)).reshape(shape)

    outs = []
    for cls in range(len(_CHUNKS)):
        outs.append(
            _edge_impl(seg(3 * cls), seg(3 * cls + 1), seg(3 * cls + 2), fills(cls))
        )
    outs.append(_interior_impl(seg(3 * len(_CHUNKS)), fills(len(_CHUNKS))))
    return tuple(outs)


def _n_bucket(n: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return b


def _batches(items: list, chunk: int, force_chunk: bool = False) -> list:
    """[(batch_items, n_bucket)] per the fixed-chunk rule above.

    force_chunk pads even a small batch to the full fixed chunk, CLOSING
    the program set: with pow2 buckets, a zoom step that shifts items
    across capacity classes can mint a batch size never seen before —
    one fresh XLA compile (measured 123 s for a first-visit 2x zoom at
    4K) or program load right in an interactive step.  The price is
    padding upload, bounded by one chunk per family (~1-5 MB).  Used
    whenever the combined path is active (big scene on TPU)."""
    nb = _n_bucket(len(items))
    if nb < chunk:
        return [(items, chunk if force_chunk else nb)]
    return [
        (items[i : i + chunk], chunk) for i in range(0, len(items), chunk)
    ]


def warmup():
    """Dispatch the combined build program once with empty work, ASYNC (no
    blocking): on the remote TPU transport each distinct program pays a
    one-time load latency (~2.5 s), so issuing it first lets the load
    overlap the host-side scene preparation.  All-zero flat buffers are
    valid empty work: a zero pair scatters +1 and -1 at the same cell
    (0, 0), so every difference mask nets to empty.  Built ON DEVICE (jnp
    zeros) — shipping tens of MB of host zeros through the tunnel would
    compete with the real build's uploads, defeating the warmup.  Returns
    the output arrays so a caller may optionally block on them."""
    return _combined_build_kernel(
        jnp.zeros(_FLAT_LEN, jnp.int16), jnp.zeros(_FILL_LEN, jnp.int32)
    )


def warmup_chunk_programs() -> None:
    """Load the per-class fixed-chunk batch programs — the rest-batch
    programs beyond the combined first chunk.  With `_batches`'
    force_chunk these 6 programs CLOSE the tile-kernel program set: once
    they are loaded, no scene build at ANY zoom scale can stall on a
    fresh tile-program compile/load.  Zero work (all-zero pairs net to
    empty masks), inputs built on device, one thread per program so the
    loads overlap; blocks until all are loaded."""
    import threading

    def one_edge(cls):
        k1, ka = _CLASSES[cls]
        chunk = _CHUNKS[cls]
        _edge_tile_kernel(
            jnp.zeros((chunk, 2, k1), jnp.int16),
            jnp.zeros((chunk, 2, k1), jnp.int16),
            jnp.zeros((chunk, 2, ka), jnp.int16),
            jnp.zeros((chunk, 4), jnp.int32),
            n=chunk,
        )

    def one_interior():
        _interior_tile_kernel(
            jnp.zeros((_CHUNK_INTERIOR, 2, _K_INTERIOR), jnp.int16),
            jnp.zeros((_CHUNK_INTERIOR, 4), jnp.int32),
            n=_CHUNK_INTERIOR,
        )

    threads = [
        threading.Thread(target=one_edge, args=(cls,), daemon=True)
        for cls in range(len(_CHUNKS))
    ] + [threading.Thread(target=one_interior, daemon=True)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()


def _expand_1x(rows, ss, ee, nty: int, ntx: int):
    """Assign 1x pixel spans (absolute 1-based coords) to the tiles they
    overlap.  Returns (tile, r_rel, s_rel, e_rel) int64 arrays, one entry
    per (span, overlapped tile)."""
    rows = np.asarray(rows, np.int64)
    ss = np.asarray(ss, np.int64)
    ee = np.asarray(ee, np.int64)
    band = (rows - 1) // TILE_H
    tx_lo = np.maximum((ss - 1) // TILE_W, 0)
    tx_hi = np.minimum((ee - 1) // TILE_W, ntx - 1)
    keep = (band >= 0) & (band < nty) & (tx_hi >= tx_lo) & (ee >= 1)
    rows, ss, ee = rows[keep], ss[keep], ee[keep]
    band, tx_lo, tx_hi = band[keep], tx_lo[keep], tx_hi[keep]
    if rows.size == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, z
    counts = tx_hi - tx_lo + 1
    idx = np.repeat(np.arange(rows.shape[0]), counts)
    within = np.arange(int(counts.sum())) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
    )
    tx = tx_lo[idx] + within
    col0 = tx * TILE_W + 1  # first 1-based pixel column of the tile
    r_rel = rows[idx] - (band[idx] * TILE_H + 1)
    s_rel = np.maximum(ss[idx] - col0, 0)
    e_rel = np.minimum(ee[idx] - col0, TILE_W - 1)
    return band[idx] * ntx + tx, r_rel, s_rel, e_rel


def _expand_aa(rows, ss, ee, nty: int, ntx: int, edge_tiles: np.ndarray):
    """Assign 16x scaled spans to the edge tiles whose t-plane windows they
    overlap (window rows [1024*ty-16, 1024*ty+1024), cols [2048*tx-16,
    2048*tx+2048) for TILE 64x128 at scale 16).  edge_tiles: bool
    (nty*ntx,) — only pieces with fringe pixels need AA spans.  Returns
    (tile, r_rel, s_rel, e_rel)."""
    rows = np.asarray(rows, np.int64)
    ss = np.asarray(ss, np.int64)
    ee = np.asarray(ee, np.int64)
    hstep = _H * TILE_H  # 1024
    wstep = _H * TILE_W  # 2048
    # Row band candidates: ty with hstep*ty - _H <= r <= hstep*ty + hstep - 1.
    outs = []
    for cand in (0, 1):
        ty = (rows + _H) // hstep - cand
        rowok = (
            (ty >= 0)
            & (ty < nty)
            & (hstep * ty - _H <= rows)
            & (rows <= hstep * ty + hstep - 1)
        )
        r, s, e, t = rows[rowok], ss[rowok], ee[rowok], ty[rowok]
        # Column tiles: tx with wstep*tx - _H <= e and s <= wstep*tx + wstep - 1.
        tx_lo = np.maximum(-(-(s - (wstep - 1)) // wstep), 0)  # ceil
        tx_hi = np.minimum((e + _H) // wstep, ntx - 1)
        keep = tx_hi >= tx_lo
        r, s, e, t = r[keep], s[keep], e[keep], t[keep]
        tx_lo, tx_hi = tx_lo[keep], tx_hi[keep]
        if r.size == 0:
            z = np.zeros(0, np.int64)
            outs.append((z, z, z, z))
            continue
        counts = tx_hi - tx_lo + 1
        idx = np.repeat(np.arange(r.shape[0]), counts)
        within = np.arange(int(counts.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        tx = tx_lo[idx] + within
        tile = t[idx] * ntx + tx
        keep2 = edge_tiles[tile]
        idx, tx, tile = idx[keep2], tx[keep2], tile[keep2]
        tr0 = hstep * t[idx] - _H
        tc0 = wstep * tx - _H
        r_rel = r[idx] - tr0
        s_rel = np.clip(s[idx] - tc0, 0, _TTW - 1)
        e_rel = np.clip(e[idx] - tc0, 0, _TTW - 1)
        outs.append((tile, r_rel, s_rel, e_rel))
    return tuple(np.concatenate(parts) for parts in zip(*outs))


def _group_slices(tiles: np.ndarray):
    """Sort entry arrays by tile id; yield (tile, lo, hi) per group."""
    if tiles.size == 0:
        return np.zeros(0, np.int64), []
    order = np.argsort(tiles, kind="stable")
    sorted_tiles = tiles[order]
    bounds = np.flatnonzero(np.diff(sorted_tiles)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [sorted_tiles.shape[0]]])
    return order, [
        (int(sorted_tiles[s]), s, e) for s, e in zip(starts, ends)
    ]


def _fills_stack(fills, nb: int) -> np.ndarray:
    """(nb, 4) int32 fill batch, tail zero-padded."""
    out = np.zeros((nb, 4), np.int32)
    for i, f in enumerate(fills):
        out[i] = f
    return out


def _pairs_fill(out: np.ndarray, spans) -> None:
    """Fill a preallocated (nb, 2, k) int16 view with difference pairs from
    raw (r, s, e) span tuples, tail slots padded."""
    out[:, 0] = _PAD_ROW
    out[:, 1] = 0
    k = out.shape[2]
    half = k // 2
    for i, (r, s, e) in enumerate(spans):
        n = r.shape[0]
        out[i, 0, :n] = r
        out[i, 0, half : half + n] = r
        out[i, 1, :n] = s
        out[i, 1, half : half + n] = e + 1


def _pairs_stack(spans, nb: int, k: int) -> np.ndarray:
    """(nb, 2, k) int16 difference-pair batch from raw (r, s, e) span
    tuples, tail slots padded.  ONE preallocated fill — the per-item
    `_triples` + `np.stack` formulation copied ~50 MB twice per 4K scene
    build, the dominant host cost of an interactive zoom re-rasterize."""
    out = np.empty((nb, 2, k), np.int16)
    _pairs_fill(out, spans)
    return out


# --- sweep cache ----------------------------------------------------------
# Content-addressed memo of TileBuild._sweep_stage results: (edge bytes,
# windings, grid) -> staged per-tile spans.  Byte-capped LRU; exact-bytes
# keys mean a hit is bit-identical by construction (no invalidation).

_SWEEP_CACHE: "OrderedDict" = OrderedDict()
_SWEEP_CACHE_LOCK = threading.Lock()
_SWEEP_CACHE_MAX_BYTES = 256 << 20
_SWEEP_CACHE_BYTES = [0]
sweep_cache_stats = {"hits": 0, "misses": 0}


def _sweep_entry_bytes(ck, val) -> int:
    n = len(ck[0]) + 64
    if val is not False:
        for part in val:
            for item in part:
                for x in item:
                    if isinstance(x, tuple):
                        n += sum(a.nbytes for a in x)
    return n


def _sweep_cache_get(ck):
    with _SWEEP_CACHE_LOCK:
        got = _SWEEP_CACHE.get(ck)
        if got is None:
            sweep_cache_stats["misses"] += 1
            return None
        sweep_cache_stats["hits"] += 1
        _SWEEP_CACHE.move_to_end(ck)
        return got[0]


def _sweep_cache_put(ck, val) -> None:
    nb = _sweep_entry_bytes(ck, val)
    if nb > _SWEEP_CACHE_MAX_BYTES // 8:
        return  # one huge object must not evict the whole working set
    with _SWEEP_CACHE_LOCK:
        old = _SWEEP_CACHE.pop(ck, None)
        if old is not None:
            _SWEEP_CACHE_BYTES[0] -= old[1]
        _SWEEP_CACHE[ck] = (val, nb)
        _SWEEP_CACHE_BYTES[0] += nb
        while _SWEEP_CACHE_BYTES[0] > _SWEEP_CACHE_MAX_BYTES and _SWEEP_CACHE:
            _, (_, evicted) = _SWEEP_CACHE.popitem(last=False)
            _SWEEP_CACHE_BYTES[0] -= evicted


def sweep_cache_clear() -> None:
    with _SWEEP_CACHE_LOCK:
        _SWEEP_CACHE.clear()
        _SWEEP_CACHE_BYTES[0] = 0
        sweep_cache_stats["hits"] = sweep_cache_stats["misses"] = 0


class TileBuild:
    """Accumulated batched work items, flushed with one kernel per class."""

    def __init__(self, nty: int, ntx: int):
        self.nty, self.ntx = nty, ntx
        # class id -> list of (owner_key, tile, cov, cross, aa, fill)
        self.edge_items: Dict[int, list] = {}
        # list of (owner_key, tile, cross, fill)
        self.interior_items: list = []
        # owner_key -> list of tiles (for registry building after flush)
        self.unsupported: List[object] = []
        # prefill_combined() result, consumed by flush(combined=True)
        self._prefilled = None

    def add_object(self, key, edges, shape_winding, aa_winding, fill4) -> bool:
        """Sweep + assign one object's spans to tile work items.  Returns
        False if the object exceeds every capacity class (caller falls back
        to the scalar path).

        The sweep result is memoized CONTENT-ADDRESSED (edge bytes +
        windings + grid) in a byte-capped LRU: the engine's zoom tool
        steps between 2x scales (engine.ml:1083-1090), so zooming back to
        a previously seen scale re-stages every object from the cache
        instead of re-sweeping — frame-to-frame coherence (cache.ml's
        thesis) applied to the host geometry stage.  Keys are exact bytes,
        so a hit is bit-identical by construction and needs no
        invalidation."""
        e64 = np.asarray(edges, dtype=np.int64)
        ck = (e64.tobytes(), shape_winding, aa_winding, self.nty, self.ntx)
        got = _sweep_cache_get(ck)
        if got is None:
            got = self._sweep_stage(e64, shape_winding, aa_winding)
            _sweep_cache_put(ck, got)
        if got is False:
            return False
        staged_edge, staged_interior = got
        for cls, tile, cov1, cross1, aa1 in staged_edge:
            self.edge_items.setdefault(cls, []).append(
                (key, tile, cov1, cross1, aa1, fill4)
            )
        for tile, cross1 in staged_interior:
            self.interior_items.append((key, tile, cross1, fill4))
        return True

    def _sweep_stage(self, e64, shape_winding, aa_winding):
        """The key-independent sweep + tile assignment: ([(cls, tile, cov,
        cross, aa)], [(tile, cross)]), or False when the object exceeds
        every capacity class.  Pure function of (e64, windings, grid) —
        the unit the sweep cache stores."""
        from . import scanline
        from .scanline import _HALF
        # The grid IS the viewport: sweep only rows that can land in it
        # (pixel rows 1..nty*TILE_H; span work for a zoomed-in scene's
        # offscreen extent is skipped on the host).
        spans = scanline._edge_spans(
            e64, shape_winding, _HALF, rows_clip=(1, self.nty * TILE_H)
        )
        if spans is None:
            return [], []  # empty object: no pieces
        rows, cov_s, cov_e, x_rows, x_s, x_e = spans
        if rows.size == 0 and x_rows.size == 0:
            return [], []

        from .. import native_lib

        covg = native_lib.expand_1x_grouped(
            rows, cov_s, cov_e, self.nty, self.ntx, TILE_H, TILE_W
        )
        if covg is not None:
            # Fused native expansion + grouping (bit-identical per-tile
            # span arrays; tests/test_native_sweep.py).
            crossg = native_lib.expand_1x_grouped(
                x_rows, x_s, x_e, self.nty, self.ntx, TILE_H, TILE_W
            )
            edge_tiles = np.zeros(self.nty * self.ntx, dtype=bool)
            if covg:
                edge_tiles[list(covg)] = True
            aa = scanline.scaled_spans_of_edgelist(
                e64, aa_winding, _H, rows_clip=(-_H, self.nty * _H * TILE_H - 1)
            )
            aag = {}
            if aa is not None and covg:
                aag = native_lib.expand_aa_grouped(
                    aa[0], aa[1], aa[2], self.nty, self.ntx,
                    _H * TILE_H, _H * TILE_W, _H, _TTW, edge_tiles,
                )
        else:
            cov_tile, cov_r, cov_ss, cov_ee = _expand_1x(
                rows, cov_s, cov_e, self.nty, self.ntx
            )
            x_tile, x_r, x_ss, x_ee = _expand_1x(
                x_rows, x_s, x_e, self.nty, self.ntx
            )
            n_tiles = self.nty * self.ntx
            edge_tiles = np.zeros(n_tiles, dtype=bool)
            edge_tiles[cov_tile] = True

            # Scaled rows that any edge tile's t-plane window can read
            # (_expand_aa windows: [hstep*ty - _H, hstep*ty + hstep - 1]).
            aa = scanline.scaled_spans_of_edgelist(
                e64, aa_winding, _H, rows_clip=(-_H, self.nty * _H * TILE_H - 1)
            )
            if aa is not None and edge_tiles.any():
                a_tile, a_r, a_ss, a_ee = _expand_aa(
                    aa[0], aa[1], aa[2], self.nty, self.ntx, edge_tiles
                )
            else:
                a_tile = np.zeros(0, np.int64)
                a_r = a_ss = a_ee = a_tile

            # Per-tile grouping for each family.
            def grouped(tiles, r, s, e):
                order, slices = _group_slices(tiles)
                rs, ss_, es = r[order], s[order], e[order]
                return {
                    t: (rs[lo:hi], ss_[lo:hi], es[lo:hi]) for t, lo, hi in slices
                }

            covg = grouped(cov_tile, cov_r, cov_ss, cov_ee)
            crossg = grouped(x_tile, x_r, x_ss, x_ee)
            aag = grouped(a_tile, a_r, a_ss, a_ee)

        # Validate capacities up front so a too-complex object falls back
        # atomically (no partial piece sets).
        staged_edge = []
        staged_interior = []
        for t in sorted(set(covg) | set(crossg)):
            cov1 = covg.get(t)
            cross1 = crossg.get(t, (np.zeros(0, np.int64),) * 3)
            if cov1 is None:
                if 2 * cross1[0].shape[0] > _K_INTERIOR:
                    return False
                staged_interior.append((t, cross1))
                continue
            aa1 = aag.get(t, (np.zeros(0, np.int64),) * 3)
            need1 = 2 * max(cov1[0].shape[0], cross1[0].shape[0])
            needa = 2 * aa1[0].shape[0]
            cls = None
            for ci, (k1, ka) in enumerate(_CLASSES):
                if need1 <= k1 and needa <= ka:
                    cls = ci
                    break
            if cls is None:
                return False
            staged_edge.append((cls, t, cov1, cross1, aa1))
        return staged_edge, staged_interior

    def _stage_combined(self):
        """Host staging for the combined-program path: fill ONE flat pair
        buffer + ONE flat fills buffer (static layout — a single upload
        shape and a single program for the whole first-chunk build) and
        split the overflow.  np (not device) buffers: the transfer rides
        the jit dispatch instead of paying eager round trips.  Returns
        (flat16, flat32, heads, iitems, edge_rest, interior_rest)."""
        flat16 = np.empty(_FLAT_LEN, np.int16)
        flat32 = np.zeros(_FILL_LEN, np.int32)

        def pair_view(i):
            off, shape = _FLAT_SEGS[i]
            n = shape[0] * shape[1] * shape[2]
            return flat16[off : off + n].reshape(shape)

        def fill_view(i):
            off, shape = _FILL_SEGS[i]
            return flat32[off : off + shape[0] * shape[1]].reshape(shape)

        heads = []
        edge_rest = {}
        for cls, chunk in enumerate(_CHUNKS):
            all_items = self.edge_items.get(cls, [])
            items, edge_rest[cls] = all_items[:chunk], all_items[chunk:]
            for fam, sel in ((0, 2), (1, 3), (2, 4)):
                _pairs_fill(pair_view(3 * cls + fam), [it[sel] for it in items])
            fv = fill_view(cls)
            for i, it in enumerate(items):
                fv[i] = it[5]
            heads.append(items)
        iitems = self.interior_items[:_CHUNK_INTERIOR]
        interior_rest = self.interior_items[_CHUNK_INTERIOR:]
        _pairs_fill(pair_view(3 * len(_CHUNKS)), [it[2] for it in iitems])
        fv = fill_view(len(_CHUNKS))
        for i, it in enumerate(iitems):
            fv[i] = it[3]
        return flat16, flat32, heads, iitems, edge_rest, interior_rest

    def prefill_combined(self) -> None:
        """Run the combined path's host staging AHEAD of flush — callers
        with a slow backend bring-up do this on the geometry thread during
        it, so flush's host half is just two device_puts.  Only useful when
        flush will take the combined route (TPU backend, >= 64 items)."""
        self._prefilled = self._stage_combined()

    def flush(self, combined: Optional[bool] = None):
        """Run the batched kernels.  Returns (blocks, registry): blocks is a
        list of (n, TILE_H, TILE_W) u32 device arrays; registry maps
        owner_key -> list of (tile, block_id, slot).

        `combined` routes the first fixed-chunk batch of every family
        through ONE XLA program (_combined_build_kernel) — defaulting to on
        for the TPU backend, where each distinct program costs ~2.5 s of
        one-time load latency on the remote transport, and off for CPU,
        where the zero-padded families would cost real interpret time."""
        if combined is None:
            # The combined program trades ONE program load for uploading the
            # full fixed-chunk flat buffer (~30 MB, mostly padding).  Below
            # a few dozen items the padding upload dwarfs the per-class
            # program loads it saves.
            n_items = sum(len(v) for v in self.edge_items.values()) + len(
                self.interior_items
            )
            combined = jax.default_backend() == "tpu" and n_items >= 64
        import os as _os
        import time as _time

        _dbg = _os.environ.get("BENCH_DEBUG")
        _t0 = [_time.time()]

        def _tick(label):
            if _dbg:
                now = _time.time()
                print(f"#     flush: {label}: {now - _t0[0]:.1f}s", flush=True)
                _t0[0] = now

        blocks = []
        registry: Dict[object, List[Tuple[int, int, int]]] = {}

        def reg(key, tile, block_id, slot):
            registry.setdefault(key, []).append((tile, block_id, slot))

        edge_rest: Dict[int, list] = self.edge_items
        interior_rest = self.interior_items
        prefilled, self._prefilled = self._prefilled, None
        if combined and (self.edge_items or self.interior_items):
            flat16, flat32, heads, iitems, edge_rest, interior_rest = (
                prefilled if prefilled is not None else self._stage_combined()
            )
            _tick("host staging fill")
            d16 = jax.device_put(flat16)
            d32 = jax.device_put(flat32)
            _tick("upload (device_put)")
            outs = _combined_build_kernel(d16, d32)
            _tick("combined dispatch (program wait)")
            for items, out in zip(heads + [iitems], outs):
                block_id = len(blocks)
                blocks.append(out)
                for slot, it in enumerate(items):
                    reg(it[0], it[1], block_id, slot)
            edge_rest = {c: v for c, v in edge_rest.items() if v}

        for cls in sorted(edge_rest):
            k1, ka = _CLASSES[cls]
            chunk = _CHUNKS[cls]
            for items, nb in _batches(edge_rest[cls], chunk, force_chunk=combined):
                cov = _pairs_stack([it[2] for it in items], nb, k1)
                cross = _pairs_stack([it[3] for it in items], nb, k1)
                aasp = _pairs_stack([it[4] for it in items], nb, ka)
                fills = _fills_stack([it[5] for it in items], nb)
                block_id = len(blocks)
                blocks.append(
                    _edge_tile_kernel(
                        jnp.asarray(cov),
                        jnp.asarray(cross),
                        jnp.asarray(aasp),
                        jnp.asarray(fills),
                        n=nb,
                    )
                )
                for slot, it in enumerate(items):
                    reg(it[0], it[1], block_id, slot)

        if interior_rest:
            for items, nb in _batches(
                interior_rest, _CHUNK_INTERIOR, force_chunk=combined
            ):
                cross = _pairs_stack([it[2] for it in items], nb, _K_INTERIOR)
                fills = _fills_stack([it[3] for it in items], nb)
                block_id = len(blocks)
                blocks.append(
                    _interior_tile_kernel(jnp.asarray(cross), jnp.asarray(fills), n=nb)
                )
                for slot, it in enumerate(items):
                    reg(it[0], it[1], block_id, slot)

        return blocks, registry
