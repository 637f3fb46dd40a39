"""Microbenchmark: where does the full-frame recomposite spend its time?

Isolates, with in-jit chained loops, the components of
`TiledScene.render_runs` on the 4K/1006-primitive config-5 scene:

  gather   — `_gather_runs_kernel` (tile-major piece gather, XLA)
  row      — `_kernel_runs_row` Pallas kernel over pre-gathered runs
  runs     — full render_runs composite (gather + row)
  perpiece — the per-piece `_render_tiles` kernel (baseline)

Timing rules (CLAUDE.md): the axon tunnel's scalar sync costs ~73 ms with
heavy jitter, so per-iteration time is taken as the SLOPE between a short
and a long in-jit loop — the sync cost cancels exactly.  Iterations chain
through a dependency XLA cannot constant-fold (`where(x == magic, 1, 0)`
on a live value; `x & 0` folds to 0 and the chain hoists out of the
loop).  Run on the real TPU:

    python benchmarks/micro_runs.py [long_iters]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

MAGIC = 0xDEADBEEF  # never a packed colour that matters; unprovable to XLA


def main(n_long: int = 310) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    t0 = time.time()
    jnp.zeros(8).block_until_ready()
    dev = jax.devices()[0]
    print(
        f"# backend_init_s: {time.time() - t0:.1f}  "
        f"({jax.default_backend()}, {getattr(dev, 'device_kind', '?')})"
    )

    from coherence_tpu import colour as C
    from coherence_tpu import ident
    from coherence_tpu.geometry import shapes as gshapes
    from coherence_tpu.raster import fills as rfills
    from coherence_tpu.raster.tiled_scene import (
        _gather_runs_kernel,
        _render_tiles,
        _render_tiles_atlas,
        _render_tiles_runs,
    )
    from coherence_tpu.scene import render as R
    from coherence_tpu.scene.fastframe import DeviceView

    W, H = 3840, 2160
    rng = np.random.default_rng(7)

    def rand_colour(k):
        alpha = 255 if k % 3 else 150
        return C.dissolve(
            C.colour_of_rgba(*(int(v) for v in rng.integers(0, 256, 3)), 255),
            delta=alpha,
        )

    objs = []
    for k in range(1000):
        cx = float(rng.integers(60, W - 60))
        cy = float(rng.integers(60, H - 60))
        col = rand_colour(k)
        if k % 2 == 0:
            geom = R.PathShape(gshapes.circle(cx, cy, float(rng.integers(6, 30))))
        else:
            geom = R.rectangle(
                cx, cy, float(rng.integers(8, 56)), float(rng.integers(8, 56))
            )
        objs.append(
            R.Obj(ident.new_ids(), R.Basic(rfills.plain(col), geom), (), R.OVER)
        )

    t0 = time.time()
    view = DeviceView(W, H)
    view.set_scene(objs, tiled=True)
    print(f"# build_s: {time.time() - t0:.1f}")

    ts = view.ts
    starts, idxs = ts.build_lists(view.order)
    atlas = ts.atlas()
    bg = view.background
    nty, ntx = ts.nty, ts.ntx
    n_real = int(np.asarray(starts)[-1])
    print(
        f"# pieces: {n_real} listed, idx buffer {idxs.shape[0]}, "
        f"atlas cap {atlas.shape[0]}, grid {nty}x{ntx}"
    )

    from functools import partial

    interp = jax.default_backend() != "tpu"

    def dep_of(v):
        # int32 0 at runtime, unfoldable at compile time.
        return jnp.where(v == jnp.uint32(MAGIC), 1, 0).astype(jnp.int32)

    @partial(jax.jit, static_argnames=("iters",))
    def loop_runs(bg0, *, iters):
        def body(i, x):
            runs = _gather_runs_kernel.__wrapped__(atlas, idxs + dep_of(x[0, 0]))
            return _render_tiles_runs.__wrapped__(
                starts, x, runs, nty=nty, ntx=ntx, interpret=interp
            )

        return jax.lax.fori_loop(0, iters, body, bg0)

    @partial(jax.jit, static_argnames=("iters",))
    def loop_gather(bg0, *, iters):
        def body(i, carry):
            r, acc = carry
            r2 = _gather_runs_kernel.__wrapped__(atlas, idxs + dep_of(acc))
            return r2, acc ^ r2[0, 0, 0]

        r0 = _gather_runs_kernel.__wrapped__(atlas, idxs)
        r, acc = jax.lax.fori_loop(0, iters, body, (r0, jnp.uint32(0)))
        return r[:1, 0, 0] + acc

    runs_fixed = _gather_runs_kernel(atlas, idxs)

    @partial(jax.jit, static_argnames=("iters",))
    def loop_row(bg0, *, iters):
        def body(i, x):
            return _render_tiles_runs.__wrapped__(
                starts, x, runs_fixed, nty=nty, ntx=ntx, interpret=interp
            )

        return jax.lax.fori_loop(0, iters, body, bg0)

    @partial(jax.jit, static_argnames=("iters",))
    def loop_perpiece(bg0, *, iters):
        def body(i, x):
            return _render_tiles(
                starts, idxs, x, atlas, nty=nty, ntx=ntx, interpret=interp
            )

        return jax.lax.fori_loop(0, iters, body, bg0)

    def force(x):
        return int(jnp.sum(x[::64, ::64] & 0xFF)) if x.ndim == 2 else int(jnp.sum(x))

    n_short = 10

    def measure(name, fn):
        force(fn(bg, iters=n_short))  # compile+load short
        force(fn(bg, iters=n_long))  # compile+load long
        best = None
        for _ in range(3):
            t0 = time.time()
            force(fn(bg, iters=n_short))
            t_short = time.time() - t0
            t0 = time.time()
            force(fn(bg, iters=n_long))
            t_long = time.time() - t0
            dt = (t_long - t_short) / (n_long - n_short)
            best = dt if best is None else min(best, dt)
        ms = best * 1e3
        gpix = (W * H) / best / 1e9
        print(f"{name:9s} {ms:8.3f} ms/iter   {gpix:6.1f} Gpix/s")
        return ms

    @partial(jax.jit, static_argnames=("iters",))
    def loop_atlas(bg0, *, iters):
        def body(i, x):
            return _render_tiles_atlas.__wrapped__(
                starts, idxs, x, atlas, nty=nty, ntx=ntx, interpret=interp
            )

        return jax.lax.fori_loop(0, iters, body, bg0)

    measure("gather", loop_gather)
    measure("row", loop_row)
    measure("runs", loop_runs)
    measure("perpiece", loop_perpiece)
    measure("atlasrow", loop_atlas)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 310)
