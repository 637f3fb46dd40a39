"""Microbenchmark: where does the fused animated-with-filter frame spend
its 0.43 ms?

Builds the bench.py headline scene (lion + blob + live blur at 1080p),
stages the same per-step scalars play_animated stages, then slope-times
`lax.scan` loops of each SUB-kernel of `_animated_blur_frame_kernel` in
isolation, plus the full fused frame as the control:

  shatter — the moved object's raster into its reserved atlas slots
  dirty   — the dirty-tile front-to-back recomposite (Pallas)
  blur    — the dirty-window re-convolve + alpha-blend into the display
  fused   — all three (== bench.py's device_frame_ms)

Timing rules (CLAUDE.md): per-frame time is the SLOPE between a short and
a long in-jit scan (per-dispatch sync cost cancels); iterations chain
through the scan carry (real data dependencies).  Run on the real TPU:

    python benchmarks/micro_animated.py [short] [long]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(t1: int = 40, t2: int = 440) -> None:
    import bench

    view, disp, blob_key, kernel, f_alpha = bench.build()

    import jax
    import jax.numpy as jnp

    from coherence_tpu.raster import region
    from coherence_tpu.raster.framepath import blur_window
    from coherence_tpu.raster.tiled_scene import (
        _render_dirty_tiles,
        _shatter_into_kernel,
    )
    from coherence_tpu.scene import fastframe as ff

    ts = view.ts
    spr = view.sprites[blob_key]

    # --- stage T2 steps exactly as play_animated does -----------------------
    deltas = [(7, 3), (-7, -3)] * (t2 // 2)
    prev = spr
    prev_entries = list(ts.pieces.get(blob_key, ()))
    steps = []
    statics = None
    for dx, dy in deltas:
        moved = ff.translate_sprite(dx, dy, prev)
        got = ts._inplace_args(blob_key, moved)
        assert got is not None
        oys, oxs, base, entries = got
        dirty_box = region.box_union(prev.box, moved.box)
        win = blur_window(dirty_box, disp.box, kernel.radius,
                          view.height, view.width)
        assert win is not None
        d, oy, ox, ry0, rx0, h, w, hb, wb, d_box = win
        if statics is None:
            statics = (base, hb, wb)
        assert statics == (base, hb, wb)
        dirty_tiles = disp._window_tiles(oy, ox, ry0, rx0, h, w)
        dirty_tiles |= {t for t, _ in prev_entries}
        dirty_tiles |= {t for t, _ in entries}
        coords, spans, idxs, n_slots = ts._dirty_args(
            view.order, dirty_tiles, pieces_override={blob_key: entries}
        )
        steps.append((oys, oxs, coords, spans, idxs,
                      np.asarray([oy, ox, ry0, rx0, h, w], np.int32),
                      d_box, n_slots))
        prev, prev_entries = moved, entries

    base, hb, wb = statics
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
            idxs = np.concatenate([idxs, np.zeros(ni - idxs.shape[0], np.int32)])
        return coords, spans, idxs

    stacked = []
    for oys, oxs, coords, spans, idxs, win6, d_box, _ in steps:
        coords, spans, idxs = repad(coords, spans, idxs)
        stacked.append((oys, oxs, coords, spans, idxs, win6, d_box))
    cols = [jnp.asarray(np.stack(c)) for c in zip(*stacked)]
    oys_t, oxs_t, coords_t, spans_t, idxs_t, win_t, dbox_t = cols

    atlas0 = ts.atlas()
    content0 = view.frame
    display0 = disp.rgba
    rgba = spr.rgba
    bg = view.background
    weights, total = tuple(kernel.values), kernel.total
    interp = ff._tiled_interpret()
    n_dirty = int(np.mean([len(set(map(tuple,
        np.asarray(s[2]).reshape(-1, 2).tolist()))) for s in steps[:8]]))
    avg_pieces = float(np.mean([s[4].shape[0] for s in steps[:8]]))
    print(f"# n_slots={ns} n_idx={ni} hb={hb} wb={wb} "
          f"~uniq_dirty_tiles={n_dirty} (idx bucket holds {avg_pieces:.0f})")

    # --- sub-kernel scans ----------------------------------------------------
    @functools.partial(jax.jit, static_argnames=("T",))
    def scan_shatter(atlas, *, T):
        def one(a, xs):
            oys, oxs = xs
            return _shatter_into_kernel.__wrapped__(a, rgba, oys, oxs, base), None
        a, _ = jax.lax.scan(one, atlas, (oys_t[:T], oxs_t[:T]))
        return a

    @functools.partial(jax.jit, static_argnames=("T",))
    def scan_dirty(content, *, T):
        def one(c, xs):
            coords, spans, idxs = xs
            c = _render_dirty_tiles.__wrapped__(
                coords, spans, idxs, bg, c, atlas0,
                n_slots=ns, interpret=interp)
            return c, None
        c, _ = jax.lax.scan(one, content, (coords_t[:T], spans_t[:T], idxs_t[:T]))
        return c

    @functools.partial(jax.jit, static_argnames=("T",))
    def scan_blur(display, *, T):
        def one(d, xs):
            win, d_box = xs
            d = ff._blur_blend_window_kernel.__wrapped__(
                d, content0, f_alpha, win[0], win[1], win[2], win[3],
                win[4], win[5], d_box, hb=hb, wb=wb,
                weights=weights, total=total)
            return d, None
        d, _ = jax.lax.scan(one, display, (win_t[:T], dbox_t[:T]))
        return d

    @functools.partial(jax.jit, static_argnames=("T",))
    def scan_fused(carry, *, T):
        def one(c, xs):
            atlas, content, display = c
            oys, oxs, coords, spans, idxs, win, d_box = xs
            out = ff._animated_blur_frame_kernel(
                atlas, content, display, rgba, oys, oxs, base, coords,
                spans, idxs, bg, f_alpha, win[0], win[1], win[2], win[3],
                win[4], win[5], d_box, n_slots=ns, hb=hb, wb=wb,
                weights=weights, total=total, interpret=interp)
            return out, None
        c, _ = jax.lax.scan(
            one, carry,
            tuple(x[:T] for x in (oys_t, oxs_t, coords_t, spans_t,
                                  idxs_t, win_t, dbox_t)))
        return c

    def force(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(jnp.sum(leaf[::64, ::64].astype(jnp.float32)))

    def measure(name, fn, arg):
        force(fn(arg, T=t1))   # compile + load, untimed
        force(fn(arg, T=t2))
        best = None
        for _ in range(3):
            s0 = time.time(); force(fn(arg, T=t1)); a = time.time() - s0
            s0 = time.time(); force(fn(arg, T=t2)); b = time.time() - s0
            d = (b - a) / (t2 - t1) * 1e3
            best = d if best is None else min(best, d)
        print(f"{name:8s} {best:8.4f} ms/frame")
        return best

    measure("shatter", scan_shatter, atlas0)
    measure("dirty", scan_dirty, content0)
    measure("blur", scan_blur, display0)
    measure("fused", scan_fused, (atlas0, content0, display0))


if __name__ == "__main__":
    a = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 440
    main(a, b)
