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
