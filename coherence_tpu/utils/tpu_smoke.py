"""Hardware kernel-verification gate: execute EVERY production Pallas/XLA
kernel once on the real chip and assert bit-equality against an independent
oracle, on a seeded scene.

The 474-test CPU suite runs Pallas in interpret mode only — it proves the
kernel SEMANTICS, not the Mosaic lowering.  This gate closes that gap:

* **Pallas kernels** (the tiled compositors): compiled Mosaic on the
  default (TPU) backend vs the SAME kernel in interpret mode on the
  in-process CPU backend.  All-integer math, so equality is bit-for-bit.
* **XLA kernels** (shatter/paste/build/brush/blur): the same jitted program
  compiled for CPU.  Integer programs must agree exactly; the f32 convs
  (`convolve._conv1d_exact`) are exact by construction for < 2^24
  accumulators, so a TPU bf16-matmul downgrade shows up as a mismatch.
* **Intra-device program pairs**: independent programs computing the same
  thing (per-piece vs run-contiguous vs atlas-row compositors; combined vs
  per-class build) must agree on the SAME device.

bench.py runs `run()` after its timed loops and carries
``extra.kernels_verified`` in the BENCH artifact; any failure exits
nonzero (the driver gate turns red).  On a CPU-only host (CI) the compiled
side also runs interpret — the harness still exercises every call path.

Reference semantics: render.ml:1310-1335 (front-to-back fold),
convolve.ml:115-158 (exact separable convolution), cache.ml translation
reuse (in-place shatter).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import numpy as np

# (name, fn, self_check): fn(seed, compiled) -> pytree of arrays.
# self_check=True: the fn validates internally on ONE device (used for
# intra-device program pairs that have no cross-backend oracle).
_CHECKS: List[Tuple[str, Callable, bool]] = []


def _check(name: str, self_check: bool = False):
    def deco(fn):
        _CHECKS.append((name, fn, self_check))
        return fn

    return deco


def _np(tree):
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def _assert_equal(name: str, a, b):
    an, bn = _np(a), _np(b)
    if not np.array_equal(an, bn):
        n = int((an != bn).sum())
        raise AssertionError(f"{name}: {n} mismatching values of {an.size}")


# ---------------------------------------------------------------------------
# Seeded inputs (numpy first; device arrays created on the caller's device)
# ---------------------------------------------------------------------------

_NTY, _NTX = 3, 2


def _seeded_sprites(seed: int, n_objs: int, W: int, H: int):
    """Deterministic random premultiplied sprites (1-based inclusive boxes,
    mask-zeroed rgba — the Sprite invariants of CLAUDE.md)."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_objs):
        w = int(rng.integers(24, 200))
        h = int(rng.integers(24, 150))
        x0 = int(rng.integers(-20, W - 20))
        y0 = int(rng.integers(-20, H - 20))
        box = (x0, y0, x0 + w - 1, y0 + h - 1)
        mask = rng.random((h, w)) < 0.8
        a = rng.integers(0, 256, (h, w, 1))
        if i % 3 == 0:
            a = np.full((h, w, 1), 255)  # opaque: exercises early termination
        rgb = rng.integers(0, 256, (h, w, 3)) * a // 255
        rgba = (np.concatenate([rgb, a], -1) * mask[..., None]).astype(np.int32)
        out.append((box, mask, rgba))
    return out


def _seeded_scene(seed: int, n_objs: int = 7):
    """TiledScene + front-to-back order + packed white background, built on
    the current default device (exercises _shatter_into_kernel per object)."""
    import jax.numpy as jnp

    from ..raster.pallas_compositor import TILE_H, TILE_W, pack_rgba
    from ..raster.region import Sprite
    from ..raster.tiled_scene import TiledScene

    W, H = _NTX * TILE_W, _NTY * TILE_H
    ts = TiledScene(W, H)
    order = []
    for i, (box, mask, rgba) in enumerate(_seeded_sprites(seed, n_objs, W, H)):
        key = ("o", i)
        ts.add_object(key, Sprite(box, mask, jnp.asarray(rgba)))
        order.append(key)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), dtype=jnp.int32))
    return ts, order, bg


# ---------------------------------------------------------------------------
# Tiled-scene compositor kernels (raster/tiled_scene.py)
# ---------------------------------------------------------------------------


@_check("shatter_into: atlas ingest (pack + shatter + paste)")
def _c_atlas(seed, compiled):
    ts, order, bg = _seeded_scene(seed)
    return {"atlas": ts.atlas()}


@_check("render: per-piece terminating kernel (_kernel)")
def _c_render(seed, compiled):
    from ..raster.tiled_scene import _render_tiles

    ts, order, bg = _seeded_scene(seed)
    starts, idxs = ts.build_lists(order)
    return _render_tiles(
        starts, idxs, bg, ts.atlas(), nty=ts.nty, ntx=ts.ntx,
        interpret=not compiled,
    )


@_check("render_runs: gather + run-contiguous pair (_kernel_runs_row)")
def _c_render_runs(seed, compiled):
    from ..raster.tiled_scene import _gather_runs_kernel, _render_tiles_runs

    ts, order, bg = _seeded_scene(seed)
    starts, idxs = ts.build_lists(order)
    runs = _gather_runs_kernel(ts.atlas(), idxs)
    frame = _render_tiles_runs(
        starts, bg, runs, nty=ts.nty, ntx=ts.ntx, interpret=not compiled
    )
    return {"runs": runs, "frame": frame}


@_check("render_full: gather-free atlas row kernel (_kernel_atlas_row)")
def _c_render_atlas(seed, compiled):
    from ..raster.tiled_scene import _render_tiles_atlas

    ts, order, bg = _seeded_scene(seed)
    starts, idxs = ts.build_lists(order)
    return _render_tiles_atlas(
        starts, idxs, bg, ts.atlas(), nty=ts.nty, ntx=ts.ntx,
        interpret=not compiled,
    )


@_check("compositor variants agree on-device", self_check=True)
def _c_variants(seed, compiled):
    from ..raster.tiled_scene import (
        _gather_runs_kernel,
        _render_tiles,
        _render_tiles_atlas,
        _render_tiles_runs,
    )

    ts, order, bg = _seeded_scene(seed)
    starts, idxs = ts.build_lists(order)
    interp = not compiled
    a = _render_tiles(
        starts, idxs, bg, ts.atlas(), nty=ts.nty, ntx=ts.ntx, interpret=interp
    )
    b = _render_tiles_runs(
        starts, bg, _gather_runs_kernel(ts.atlas(), idxs),
        nty=ts.nty, ntx=ts.ntx, interpret=interp,
    )
    c = _render_tiles_atlas(
        starts, idxs, bg, ts.atlas(), nty=ts.nty, ntx=ts.ntx, interpret=interp
    )
    _assert_equal("per-piece vs runs", a, b)
    _assert_equal("per-piece vs atlas-row", a, c)
    return a


@_check("render_dirty: compacted-grid kernel (_kernel_subset)", self_check=True)
def _c_dirty(seed, compiled):
    import jax.numpy as jnp

    from ..raster.pallas_compositor import TILE_H, TILE_W
    from ..raster.tiled_scene import _render_dirty_tiles, _render_tiles

    ts, order, bg = _seeded_scene(seed)
    rng = np.random.default_rng(seed + 101)
    n_tiles = ts.nty * ts.ntx
    dirty = sorted(
        rng.choice(n_tiles, size=max(1, n_tiles // 2), replace=False).tolist()
    )
    coords, spans, idxs, n_slots = ts._dirty_args(order, dirty)
    frame0 = rng.integers(0, 1 << 32, (ts.height, ts.width), dtype=np.uint32)
    out = _render_dirty_tiles(
        coords, spans, idxs, bg, jnp.asarray(frame0), ts.atlas(),
        n_slots=n_slots, interpret=not compiled,
    )
    # Dirty tiles must equal the full render there; clean tiles untouched.
    starts, fidxs = ts.build_lists(order)
    full = _render_tiles(
        starts, fidxs, bg, ts.atlas(), nty=ts.nty, ntx=ts.ntx,
        interpret=not compiled,
    )
    outn, fulln = _np(out), _np(full)
    dirtyset = set(dirty)
    for t in range(n_tiles):
        ty, tx = t // ts.ntx, t % ts.ntx
        sl = np.s_[ty * TILE_H : (ty + 1) * TILE_H, tx * TILE_W : (tx + 1) * TILE_W]
        want = fulln[sl] if t in dirtyset else frame0[sl]
        if not np.array_equal(outn[sl], want):
            raise AssertionError(
                f"dirty kernel tile {t} ({'dirty' if t in dirtyset else 'clean'}) "
                "diverges"
            )
    return out


@_check("layer compositor: Pallas early-termination vs XLA scan",
        self_check=True)
def _c_layers(seed, compiled):
    import jax.numpy as jnp

    from ..raster.pallas_compositor import (
        TILE_H,
        TILE_W,
        composite_layers_packed,
        composite_layers_xla,
        pack_rgba,
    )

    rng = np.random.default_rng(seed + 5)
    H, W, K = 2 * TILE_H, 2 * TILE_W, 5
    layers = []
    for k in range(K):
        mask = rng.random((H, W)) < (0.95 if k == 2 else 0.5)
        a = rng.integers(0, 256, (H, W, 1))
        if k == 2:
            a = np.full((H, W, 1), 255)  # opaque layer: early termination
        rgb = rng.integers(0, 256, (H, W, 3)) * a // 255
        layers.append((np.concatenate([rgb, a], -1) * mask[..., None]).astype(np.int32))
    lay = pack_rgba(jnp.asarray(np.stack(layers)))
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), dtype=jnp.int32))
    a = composite_layers_packed(bg, lay, interpret=not compiled)
    b = composite_layers_xla(bg, lay)
    _assert_equal("pallas vs xla layer compositor", a, b)
    return a


@_check("atlas block ops: paste + grow")
def _c_paste(seed, compiled):
    import jax.numpy as jnp

    from ..raster.pallas_compositor import TILE_H, TILE_W
    from ..raster.tiled_scene import _grow_atlas_kernel, _paste_block_kernel

    rng = np.random.default_rng(seed + 7)
    atlas = rng.integers(0, 1 << 32, (16, TILE_H, TILE_W), dtype=np.uint32)
    block = rng.integers(0, 1 << 32, (8, TILE_H, TILE_W), dtype=np.uint32)
    out = _paste_block_kernel(jnp.asarray(atlas), jnp.asarray(block), 5)
    grown = _grow_atlas_kernel(out, newcap=32)
    return {"pasted": out, "grown": grown}


# ---------------------------------------------------------------------------
# Tile-normalized batched build (raster/tile_raster.py)
# ---------------------------------------------------------------------------


def _seeded_build(seed: int):
    """A TileBuild staged with deterministic circles/rects/strokes."""
    import coherence_tpu.colour as C
    from ..geometry import shapes as gshapes
    from ..raster import fills as rfills
    from ..raster.pallas_compositor import TILE_H, TILE_W
    from ..raster.tile_raster import TileBuild
    from ..scene import render as R
    from ..scene.fastframe import _batch_extract
    from .. import ident

    W, H = _NTX * TILE_W, _NTY * TILE_H
    rng = np.random.default_rng(seed + 11)
    tb = TileBuild(_NTY, _NTX)
    keys = []
    for i in range(6):
        cx = float(rng.uniform(10, W - 10))
        cy = float(rng.uniform(10, H - 10))
        r = float(rng.uniform(8, 60))
        if i % 3 == 2:
            shape = R.rectangle(cx - r, cy - r, 2 * r, 1.5 * r)
        elif i % 3 == 1:
            shape = R.StrokedPathShape(
                gshapes.circle(cx, cy, r),
                gshapes.StrokeSpec(linewidth=3.0),
            )
        else:
            shape = R.PathShape(gshapes.circle(cx, cy, r))
        col = C.colour_of_rgba(
            int(rng.integers(0, 256)), int(rng.integers(0, 256)),
            int(rng.integers(0, 256)), int(rng.integers(60, 256)),
        )
        o = R.Obj(ident.new_ids(), R.Basic(rfills.plain(col), shape), (), R.OVER)
        ext = _batch_extract(o)
        assert ext is not None
        if tb.add_object(("t", i), *ext):
            keys.append(("t", i))
    return tb, keys


def _assemble(blocks, registry):
    """registry -> {str(key, tile): piece array} with device blocks."""
    got = {}
    bnp = [_np(b) for b in blocks]
    for key, entries in registry.items():
        for tile, block_id, slot in entries:
            got[f"{key}@{tile}"] = bnp[block_id][slot]
    return got


@_check("tile build: per-class edge+interior kernels")
def _c_tile_build(seed, compiled):
    tb, keys = _seeded_build(seed)
    blocks, registry = tb.flush(combined=False)
    return _assemble(blocks, registry)


@_check("tile build: combined program == per-class programs",
        self_check=True)
def _c_tile_combined(seed, compiled):
    if not compiled:
        # The combined program's fixed-chunk padding costs real interpret
        # time on CPU and is never the CPU production path.
        return np.zeros(1, np.int32)
    tb, keys = _seeded_build(seed)
    a = _assemble(*tb.flush(combined=True))
    b = _assemble(*tb.flush(combined=False))
    if sorted(a) != sorted(b):
        raise AssertionError("combined vs per-class: piece registries differ")
    for k in a:
        if not np.array_equal(a[k], b[k]):
            raise AssertionError(f"combined vs per-class piece {k} diverges")
    return np.zeros(1, np.int32)


@_check("brush group kernel (_brush_group_kernel)")
def _c_brush(seed, compiled):
    import coherence_tpu.colour as C
    from ..geometry import path as gpath
    from ..raster import brush as rbrush
    from ..raster import fills as rfills
    from ..raster.brush_tiles import BrushTileBuild
    from ..raster.pallas_compositor import TILE_H, TILE_W

    W, H = _NTX * TILE_W, _NTY * TILE_H
    rng = np.random.default_rng(seed + 13)
    bb = BrushTileBuild(_NTY, _NTX)
    for i in range(2):
        p0 = (float(rng.uniform(20, W - 20)), float(rng.uniform(20, H - 20)))
        p1 = (float(rng.uniform(20, W - 20)), float(rng.uniform(20, H - 20)))
        path = gpath.Path(
            gpath.EVEN_ODD,
            (gpath.Subpath(False, False, (gpath.Straight(p0, p1),)),),
        )
        stroke = (rbrush.mkround(9.0, 0.8), path)
        fill = rfills.plain(C.colour_of_rgba(200, 40, 90, 255))
        assert bb.add_stroke(("b", i), stroke, fill._rgba)
    blocks, registry = bb.flush()
    return _assemble(blocks, registry)


# ---------------------------------------------------------------------------
# Blur / filter kernels (raster/convolve.py, framepath.py, fastframe.py)
# ---------------------------------------------------------------------------


@_check("exact separable conv (_conv1d_exact, both axes + hi/lo split)")
def _c_conv(seed, compiled):
    import jax.numpy as jnp

    from ..raster.convolve import _conv1d_exact, _conv2d_exact, _setcanvas_xy, mkgaussian

    rng = np.random.default_rng(seed + 17)
    img = jnp.asarray(rng.integers(0, 256, (96, 160, 4)).astype(np.int32))
    k = mkgaussian(5)
    w = tuple(k.values)
    cx = _setcanvas_xy(_conv1d_exact(img, weights=w, axis=1), k.total)
    cy = _setcanvas_xy(_conv1d_exact(cx, weights=w, axis=0), k.total)
    # Multi-limb split: weights big enough that sum*255 >= 2^24.
    big = (70000, 140000, 70000)
    hl = _conv1d_exact(img, weights=big, axis=0)
    # Radius-16 Gaussian: weights like 265/319 are NOT bf16-exact — this is
    # the case the MXU silently truncates unless the byte-limb split engages
    # (caught by this gate on real hardware in round 4).
    k16 = mkgaussian(16)
    w16 = tuple(k16.values)
    g16 = _setcanvas_xy(_conv1d_exact(img, weights=w16, axis=1), k16.total)
    full = _conv2d_exact(img, weights=tuple(tuple(r) for r in np.ones((3, 3), np.int64)))
    w2 = tuple(tuple(int(v) for v in row) for row in
               np.outer([7, 305, 7], [1, 3, 1]))
    full_big = _conv2d_exact(img, weights=w2)
    return {"sep": cy, "hilo": hl, "g16": g16, "full2d": full,
            "full2d_big": full_big}


@_check("blur rect kernel (_apply_blur_rect_kernel)")
def _c_blur_rect(seed, compiled):
    import jax.numpy as jnp

    from ..raster.convolve import mkgaussian
    from ..raster.framepath import _apply_blur_rect_kernel

    rng = np.random.default_rng(seed + 19)
    H, W = 96, 160
    a = rng.integers(0, 256, (H, W, 1))
    rgb = rng.integers(0, 256, (H, W, 3)) * a // 255
    frame = jnp.asarray(np.concatenate([rgb, a], -1).astype(np.int32))
    f_alpha = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    k = mkgaussian(4)
    return _apply_blur_rect_kernel(
        frame, f_alpha, weights=tuple(k.values), total=k.total
    )


@_check("blur blend window kernel (_blur_blend_window_kernel)")
def _c_blur_window(seed, compiled):
    import jax.numpy as jnp

    from ..raster.convolve import mkgaussian
    from ..raster.framepath import blur_window
    from ..raster.pallas_compositor import TILE_H, TILE_W, pack_rgba
    from ..scene.fastframe import _blur_blend_window_kernel

    rng = np.random.default_rng(seed + 23)
    H, W = _NTY * TILE_H, _NTX * TILE_W
    k = mkgaussian(3)
    dirty = (40, 30, 170, 120)
    win = blur_window(dirty, (1, 1, W, H), k.radius, H, W)
    assert win is not None
    _, oy, ox, ry0, rx0, h, w, hb, wb, d_box = win
    a = rng.integers(0, 256, (H, W, 1))
    rgb = rng.integers(0, 256, (H, W, 3)) * a // 255
    content = pack_rgba(jnp.asarray(np.concatenate([rgb, a], -1).astype(np.int32)))
    display = jnp.asarray(rng.integers(0, 256, (H, W, 4)).astype(np.int32))
    f_alpha = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    return _blur_blend_window_kernel(
        display, content, f_alpha, oy, ox, ry0, rx0, h, w, d_box,
        hb=hb, wb=wb, weights=tuple(k.values), total=k.total,
    )


@_check("fused animated frame (_animated_blur_frame_kernel)")
def _c_fused(seed, compiled):
    import jax.numpy as jnp

    from ..raster.convolve import mkgaussian
    from ..raster.framepath import blur_window
    from ..raster.pallas_compositor import TILE_H, TILE_W
    from ..raster.region import Sprite
    from ..scene.fastframe import _animated_blur_frame_kernel

    ts, order, bg = _seeded_scene(seed)
    H, W = ts.height, ts.width
    rng = np.random.default_rng(seed + 29)
    # Animated object: reserved slots, in-place shatter of a random raster.
    bh, bw = 64, 128
    x0, y0 = 50, 40
    mask = rng.random((bh, bw)) < 0.7
    a = rng.integers(0, 256, (bh, bw, 1))
    rgb = rng.integers(0, 256, (bh, bw, 3)) * a // 255
    rgba = (np.concatenate([rgb, a], -1) * mask[..., None]).astype(np.int32)
    spr = Sprite((x0, y0, x0 + bw - 1, y0 + bh - 1), mask, jnp.asarray(rgba))
    key = ("anim",)
    cap = ((bh + TILE_H - 1) // TILE_H + 1) * ((bw + TILE_W - 1) // TILE_W + 1)
    ts.reserve_slots(key, cap)
    oys, oxs, base, entries = ts._inplace_args(key, spr)
    order = [key] + order
    k = mkgaussian(3)
    win = blur_window(spr.box, (1, 1, W, H), k.radius, H, W)
    assert win is not None
    _, oy, ox, ry0, rx0, h, w, hb, wb, d_box = win
    dirty = set(range(ts.nty * ts.ntx))  # every tile: maximal coverage
    coords, spans, idxs, n_slots = ts._dirty_args(
        order, dirty, pieces_override={key: entries}
    )
    atlas0 = jnp.array(ts.atlas())  # copy: the kernel donates
    content0 = jnp.asarray(
        rng.integers(0, 1 << 32, (H, W), dtype=np.uint32)
    )
    display0 = jnp.asarray(rng.integers(0, 256, (H, W, 4)).astype(np.int32))
    f_alpha = jnp.asarray(rng.integers(0, 256, (H, W)).astype(np.int32))
    atlas, content, display = _animated_blur_frame_kernel(
        atlas0, content0, display0, spr.rgba, oys, oxs, base,
        coords, spans, idxs, bg, f_alpha, oy, ox, ry0, rx0, h, w, d_box,
        n_slots=n_slots, hb=hb, wb=wb, weights=tuple(k.values),
        total=k.total, interpret=not compiled,
    )
    return {"atlas": atlas, "content": content, "display": display}


@_check("flagship entry step (_recomposite_blur_impl via entry())")
def _c_entry(seed, compiled):
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    ge = importlib.import_module("__graft_entry__")
    fn, args = ge.entry()
    return fn(*args)


@_check("morphology box count (region._box_count)")
def _c_morph(seed, compiled):
    import jax.numpy as jnp

    from ..raster import region

    rng = np.random.default_rng(seed + 31)
    plane = jnp.asarray((rng.random((96, 160)) < 0.1).astype(np.int32))
    return {
        "r1": region._box_count(plane, 1, 2),
        "r5": region._box_count(plane, 5, 5),
    }


@_check("background + unpack planes")
def _c_misc(seed, compiled):
    import jax.numpy as jnp

    import coherence_tpu.colour as C
    from ..raster.pallas_compositor import pack_rgba
    from ..scene.fastframe import _background_kernel, _unpack_crop_kernel

    rng = np.random.default_rng(seed + 37)
    bg = _background_kernel(
        jnp.asarray(C.rgba_of_colour(C.white), jnp.int32), h=128, w=256
    )
    packed = jnp.asarray(rng.integers(0, 1 << 32, (128, 256), dtype=np.uint32))
    crop = _unpack_crop_kernel(packed, h=100, w=200)
    rt = pack_rgba(crop)
    return {"bg": bg, "crop": crop, "rt": rt}


# ---------------------------------------------------------------------------
# General-renderer device programs (raster/region.py) — the scalar path every
# non-fast scene, icon render and session.py engine mode runs on TPU.
# Cross-backend: compiled on the default device vs the CPU oracle
# (VERDICT r4 item 2a).
# ---------------------------------------------------------------------------


def _mk_sprite(box, mask, rgba):
    import jax.numpy as jnp

    from ..raster import region

    m = region._pad_mask(mask)
    H, W = m.shape
    r = np.zeros((H, W, 4), np.int32)
    r[: mask.shape[0], : mask.shape[1]] = rgba
    return region.Sprite(box, m, jnp.asarray(r))


@_check("region ops: caf/set-algebra/shift/morphology/flatten-pickup")
def _c_region(seed, compiled):
    import coherence_tpu.colour as C
    from ..raster import fills as rfills, region

    # Deterministic random content over FIXED overlapping boxes (the random
    # placement of _seeded_sprites can miss, and several ops below require
    # a non-empty intersection).
    rng = np.random.default_rng(seed + 41)

    def mk(box):
        x0, y0, x1, y1 = box
        h, w = y1 - y0 + 1, x1 - x0 + 1
        mask = rng.random((h, w)) < 0.8
        a = rng.integers(0, 256, (h, w, 1))
        rgb = rng.integers(0, 256, (h, w, 3)) * a // 255
        rgba = (np.concatenate([rgb, a], -1) * mask[..., None]).astype(np.int32)
        return _mk_sprite(box, mask, rgba)

    s0 = mk((5, 8, 150, 120))
    s1 = mk((60, 40, 220, 170))  # overlaps s0
    s2 = mk((-10, -6, 90, 80))  # negative origin: signed shift gathers
    s3 = mk((30, 20, 140, 100))  # overlaps s2 and s3-translated
    out = {}
    # caf: compose-and-filter (sprite.ml:723-1170) — the renderobj hot op.
    spr, fshape = region.caf("over", "opaque", s0, s1)
    out["caf_over"] = {"rgba": spr.rgba, "mask": spr.mask, "f": fshape.mask}
    spr2, fshape2 = region.caf("plus", "opaque", s2, s3)
    out["caf_plus"] = {"rgba": spr2.rgba, "f": fshape2.mask}
    # Set algebra + the dynamic-offset shift gathers underneath.
    a, b = region.shape_of_sprite(s0), region.shape_of_sprite(s1)
    out["union"] = region.shape_union(a, b).mask
    out["diff"] = region.shape_difference(a, b).mask
    out["inter"] = region.shape_intersection(a, b).mask
    # portion + translated caf (different reproject offsets).
    out["portion"] = region.portion(s0, b).rgba
    t = region.translate_sprite(17, -9, s2)
    spr3, _ = region.caf("over", "opaque", t, s3)
    out["caf_translated"] = spr3.rgba
    # Morphology (bloat/erode) with asymmetric radii.
    out["bloat"] = region.bloat(3, 2, a).mask
    out["erode"] = region.erode(2, 1, a).mask
    # Tight-bounds recompute.
    bs = region.boxsprite(s1)
    if bs is not None:
        out["boxsprite"] = bs.rgba
    # flatten -> canvas -> pickup round trip (sprite.ml:1664-1739).
    canvas = region.flatten_sprite(4, s0, C.white)
    out["flatten"] = canvas.rgba
    x0, y0, x1, y1 = s0.box
    inner = region.shape_of_box((x0 + 2, y0 + 2, x1 - 2, y1 - 2))
    out["pickup"] = region.pickup(inner, canvas).rgba
    # fillshape with a gradient fill under a mask (_masked_rgba).
    g = rfills.gradient((float(x0), float(y0)), (float(x1), float(y1)),
                        True, True, C.red, C.blue)
    out["fill_gradient"] = region.fillshape(a, g).rgba
    return out


# ---------------------------------------------------------------------------
# AA coverage GEMM (raster/aa.py) — bf16 on TPU vs f32 on CPU by an
# import-time backend switch (aa.py:80): the one production program whose
# TPU/CPU dtypes deliberately differ.  Verified against an independent
# integer numpy oracle of the reference's table sums (polygon.ml:694-705),
# so a silent bf16 precision loss fails here (VERDICT r4 item 2a).
# ---------------------------------------------------------------------------


def _aa_oracle(box, scaled):
    """Exact integer table sums: cov[j,k] = sum over the 32x32 footprint of
    t_mask[16j+v, 16k+u] * maintable[u, v]; opacity per polygon.ml:650-652."""
    from ..raster import aa

    x0, y0, x1, y1 = box
    w, h = x1 - x0 + 1, y1 - y0 + 1
    Hs = aa._H
    th, tw = Hs * h + Hs, Hs * w + Hs
    tr0, tc0 = Hs * y0 - 2 * Hs, Hs * x0 - 2 * Hs
    t = np.zeros((th, tw), bool)
    rows, ss, ee = scaled
    for row, s, e in zip(rows, ss, ee):
        r = int(row) - tr0
        if 0 <= r < th:
            cs, ce = max(int(s) - tc0, 0), min(int(e) - tc0, tw - 1)
            if cs <= ce:
                t[r, cs : ce + 1] = True
    k2 = aa.maintable.T.astype(np.int64)  # (v, u)
    ti = t.astype(np.int64)
    cov = np.zeros((h, w), np.int64)
    for j in range(h):
        for k in range(w):
            cov[j, k] = (ti[Hs * j : Hs * j + 2 * Hs,
                            Hs * k : Hs * k + 2 * Hs] * k2).sum()
    return ((cov * 256 + aa.volume // 2) // aa.volume).astype(np.int32)


@_check("AA coverage GEMM vs integer table oracle (bf16-on-TPU fork)",
        self_check=True)
def _c_aa(seed, compiled):
    from ..geometry import path as gpath, shapes as gshapes
    from ..geometry.path import edgelist_of_path
    from ..raster import aa, scanline

    rng = np.random.default_rng(seed + 43)
    cases = []
    # A circle (curved edges, even-odd) and a self-overlapping star
    # (nonzero winding) at random subpixel positions.
    cx, cy, r = 20 + rng.random() * 3, 18 + rng.random() * 3, 14.3
    cases.append(gshapes.circle(cx, cy, r))
    pts = []
    for i in range(5):
        ang = i * 4 * np.pi / 5
        pts.append((24 + 17 * np.cos(ang) + rng.random(),
                    22 + 17 * np.sin(ang) + rng.random()))
    segs = tuple(
        gpath.Straight(pts[i], pts[(i + 1) % 5]) for i in range(5)
    )
    cases.append(gpath.Path(gpath.NONZERO, (gpath.Subpath(False, True, segs),)))
    got_last = None
    for i, path in enumerate(cases):
        edges = edgelist_of_path(path)
        scaled = scanline.scaled_spans_of_edgelist(edges, path.winding, aa._H)
        assert scaled is not None
        xs = np.concatenate([np.asarray(edges)[:, 0], np.asarray(edges)[:, 2]])
        ys = np.concatenate([np.asarray(edges)[:, 1], np.asarray(edges)[:, 3]])
        # Pixel box with AA margin around the subpixel edge extent.
        box = (
            int(np.floor(xs.min() / 32)) - 2,
            int(np.floor(ys.min() / 32)) - 2,
            int(np.ceil(xs.max() / 32)) + 2,
            int(np.ceil(ys.max() / 32)) + 2,
        )
        got = np.asarray(aa.coverage_opacity(box, scaled))
        want = _aa_oracle(box, scaled)
        if not np.array_equal(got, want):
            n = int((got != want).sum())
            raise AssertionError(
                f"case {i}: {n} of {got.size} AA opacities diverge from the "
                f"integer table oracle (max |d| = "
                f"{int(np.abs(got.astype(np.int64) - want).max())}) — the "
                f"{aa.matmul_dtype()} coverage GEMM is not exact"
            )
        got_last = got
    return got_last


# ---------------------------------------------------------------------------
# Sharded (multi-chip) program bodies on THIS device: a 1-device Mesh forces
# the shard_map Pallas kernels through the real lowering (Mosaic on TPU) —
# previously they only ever compiled on the virtual CPU mesh
# (VERDICT r4 item 2b).  Oracle: the unsharded production pipeline.
# ---------------------------------------------------------------------------


@_check("sharded bodies (1-device mesh): render/dirty/banded-animated",
        self_check=True)
def _c_sharded(seed, compiled):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ..raster.tiled_scene import _render_tiles, render_sharded

    interp = not compiled
    mesh = Mesh(np.array(jax.devices()[:1]), ("y",))

    # render_sharded vs the unsharded per-piece kernel.
    ts, order, bg = _seeded_scene(seed + 53)
    out = render_sharded(ts, bg, order, mesh, interpret=interp)
    starts, idxs = ts.build_lists(order)
    want = _render_tiles(
        starts, idxs, bg, ts.atlas(), nty=ts.nty, ntx=ts.ntx, interpret=interp
    )
    _assert_equal("render_sharded vs unsharded", out, want)

    # Production sharded view: full render + banded animated step with the
    # live blur filter (render_dirty_sharded + BandedAtlas.update_inplace +
    # the sharded blur blend) vs the identical unsharded run.
    import coherence_tpu.colour as C
    from .. import ident
    from ..geometry import shapes as gshapes
    from ..raster import fills as rfills
    from ..raster.convolve import mkgaussian
    from ..raster.pallas_compositor import TILE_H, TILE_W
    from ..scene import render as R
    from ..scene.fastframe import (
        DeviceView,
        FilteredDisplay,
        alpha_plane_of_object,
    )

    def scene():
        # Fresh idsets per run: the two views must not share cache entries.
        blob = R.Obj(
            ident.new_ids(),
            R.Basic(
                rfills.plain(C.dissolve(C.crimson, delta=170)),
                R.PathShape(gshapes.circle(40.0, 30.0, 12.0)),
            ),
            (),
            R.OVER,
        )
        rect = R.Obj(
            ident.new_ids(),
            R.Basic(rfills.plain(C.steelblue),
                    R.rectangle(10.0, 10.0, 90.0, 100.0)),
            (),
            R.OVER,
        )
        f_geom = R.Obj(
            ident.new_ids(),
            R.Basic(rfills.plain(C.white), R.rectangle(8.0, 8.0, 100.0, 110.0)),
            (),
            R.OVER,
        )
        return [blob, rect], f_geom

    def run_view(shard: bool):
        objs, f_geom = scene()
        view = DeviceView(TILE_W, 2 * TILE_H)
        view.set_scene(objs)
        if shard:
            view.use_mesh(mesh, interpret=interp)
        view.render(full=True)
        view.make_animated(objs[0].idset)
        f_alpha = alpha_plane_of_object(f_geom, view.width, view.height)
        disp = FilteredDisplay(view, f_alpha, mkgaussian(2))
        disp.full_refresh()
        disp.step_animated(objs[0].idset, 5, TILE_H // 2)  # crosses the band
        disp.step_animated(objs[0].idset, -3, 7)
        return disp.read()

    got, want = run_view(True), run_view(False)
    if not np.array_equal(got, want):
        raise AssertionError(
            f"sharded animated pipeline diverges from unsharded: "
            f"{int((got != want).any(-1).sum())} pixels"
        )
    return got


# ---------------------------------------------------------------------------
# Runner
# ---------------------------------------------------------------------------


def run(seed: int = 0, verbose: bool = False) -> Dict:
    """Run every check.  Returns {"kernels_verified": N, "compiled": bool,
    "failures": [(name, message)], "verified": [names]}."""
    import jax

    on_tpu = jax.default_backend() == "tpu"
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = None
    verified: List[str] = []
    failures: List[Tuple[str, str]] = []
    for name, fn, self_check in _CHECKS:
        try:
            got = _np(fn(seed, on_tpu))
            if not self_check:
                if cpu is None:
                    raise AssertionError("no CPU backend for the oracle")
                with jax.default_device(cpu):
                    want = _np(fn(seed, False))
                leaves_g, treedef_g = jax.tree_util.tree_flatten(got)
                leaves_w, treedef_w = jax.tree_util.tree_flatten(want)
                if treedef_g != treedef_w:
                    raise AssertionError("tree structure differs vs oracle")
                for i, (g, w) in enumerate(zip(leaves_g, leaves_w)):
                    if not np.array_equal(g, w):
                        n = int((np.asarray(g) != np.asarray(w)).sum())
                        raise AssertionError(
                            f"leaf {i}: {n} of {np.asarray(g).size} values "
                            "differ vs CPU oracle"
                        )
            verified.append(name)
            if verbose:
                print(f"ok   {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — every failure must be reported
            failures.append((name, f"{type(e).__name__}: {e}"))
            if verbose:
                print(f"FAIL {name}: {e}", flush=True)
    return {
        "kernels_verified": len(verified),
        "kernels_total": len(_CHECKS),
        "compiled": on_tpu,
        "verified": verified,
        "failures": failures,
    }


def main():
    import json
    import sys

    res = run(verbose=True)
    print(json.dumps({k: res[k] for k in ("kernels_verified", "kernels_total",
                                          "compiled", "failures")}))
    sys.exit(1 if res["failures"] else 0)


if __name__ == "__main__":
    main()
