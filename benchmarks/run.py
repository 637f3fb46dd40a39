"""BASELINE.md benchmark configs (python benchmarks/run.py [1-5|all]).

Each config prints one JSON line.  Timings force completion with scalar
readbacks (the axon transport's block_until_ready does not block).

  1  static lion 512x512, CPU backend (cold and cached render)
  2  100 overlapping opaque/translucent shapes: front-to-back HSR compositing
  3  animated sprite over static lion at 1080p (== bench.py headline)
  4  blur/convolve filter over a 1080p frame
  5  4K frame, 1000 primitives: full composite + dirty-window recomposite
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cache_cfg():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass


def emit(metric, value, unit, baseline, extra=None):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": round(value / baseline, 3) if baseline else None,
                "extra": extra or {},
            }
        )
    )


def config1():
    os.environ["JAX_PLATFORMS"] = "cpu"
    _cache_cfg()
    import jax.numpy as jnp

    import coherence_tpu.colour as C
    import coherence_tpu.transform as tr
    from coherence_tpu.raster import region
    from coherence_tpu.scene import cache, examples as E, render as R

    lion = E.smalllion()
    xmin, xmax, ymin, ymax = R.bounds_of_basicshape(lion)
    scale = 512.0 / max(xmax - xmin, ymax - ymin)
    obj = R.transform_renderobject_many(
        [
            tr.Translate(0.0, 512.0),
            tr.Scale((0.0, 0.0), 1.0, -1.0),
            tr.Scale((0.0, 0.0), scale, scale),
            tr.Translate(-xmin, -ymin),
        ],
        lion,
    )
    shape = region.shape_of_box((1, 1, 512, 512))
    t0 = time.time()
    spr = R.render_simple_scene([obj], shape)
    int(jnp.sum(spr.rgba))
    cold = time.time() - t0
    t0 = time.time()
    spr = R.render_simple_scene([obj], shape)
    int(jnp.sum(spr.rgba))
    warm = time.time() - t0
    emit(
        "lion512_cpu_cached_render_ms",
        warm * 1000,
        "ms",
        None,
        {"cold_s": round(cold, 1)},
    )


def config2():
    _cache_cfg()
    import jax
    import jax.numpy as jnp

    from coherence_tpu.raster import pallas_compositor as PC

    rng = np.random.default_rng(0)
    K, H, W = 100, 1088, 1920
    layers4 = np.zeros((K, H, W, 4), np.int32)
    for k in range(K):
        x0, y0 = rng.integers(0, W - 600), rng.integers(0, H - 500)
        w, h = rng.integers(150, 600), rng.integers(150, 500)
        a = 255 if k % 2 == 0 else 128
        col = (rng.integers(0, 256, 3) * a) // 255
        layers4[k, y0 : y0 + h, x0 : x0 + w, :3] = col
        layers4[k, y0 : y0 + h, x0 : x0 + w, 3] = a
    layers = PC.pack_rgba(jnp.asarray(layers4))
    bg = PC.pack_rgba(
        jnp.asarray(
            np.concatenate(
                [np.full((H, W, 3), 255), np.full((H, W, 1), 255)], -1
            ),
            jnp.int32,
        )
    )
    f = jax.jit(PC.composite_layers_xla)
    x = f(bg, layers)
    int(jnp.sum(x >> 24))
    n = 30
    t0 = time.time()
    x = bg
    for _ in range(n):
        x = f(x, layers)
    int(jnp.sum(x >> 24))
    dt = time.time() - t0
    fps = n / dt
    emit("hsr_100layers_1080p_fps", fps, "fps", 60.0, {"layers": K})


def config3():
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")],
        capture_output=True,
        text=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    print(line)


def config4():
    _cache_cfg()
    import jax
    import jax.numpy as jnp

    from coherence_tpu.raster import convolve as rconvolve

    rng = np.random.default_rng(0)
    H, W = 1088, 1920
    a = rng.integers(0, 256, (H, W, 1))
    rgb = (rng.integers(0, 256, (H, W, 3)) * a) // 255
    frame = jnp.asarray(np.concatenate([rgb, a], -1), jnp.int32)
    mask = jnp.ones((H, W), dtype=bool)
    k = rconvolve.mkgaussian(5)
    f = jax.jit(lambda fr: rconvolve.convolve_canvas(k, fr, mask))
    x = f(frame)
    int(jnp.sum(x))
    n = 30
    t0 = time.time()
    x = frame
    for _ in range(n):
        x = f(x)
    int(jnp.sum(x))
    fps = n / (time.time() - t0)
    emit("gaussian_blur_r5_1080p_fps", fps, "fps", 60.0, {})


def config5():
    _cache_cfg()
    import jax.numpy as jnp

    import coherence_tpu.colour as C
    from coherence_tpu.raster.pallas_compositor import pack_rgba
    from coherence_tpu.raster.tiled_scene import TiledScene

    # 1000 primitives; FULL-frame 4K re-render every frame through the
    # sparse tiled-scene Pallas kernel (per-tile front-to-back object lists,
    # early termination per tile).  A dense (K, H, W) stack would be ~33 GB.
    rng = np.random.default_rng(0)
    W, H = 3840, 2176
    ts = TiledScene(W, H)
    items = []
    order = []
    for k in range(1000):
        x0, y0 = int(rng.integers(1, W - 80)), int(rng.integers(1, H - 80))
        w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        alpha = 255 if k % 3 else 150
        col = C.dissolve(
            C.colour_of_rgba(*(int(v) for v in rng.integers(0, 256, 3)), 255),
            delta=alpha,
        )
        items.append((k, (x0, y0, x0 + w - 1, y0 + h - 1), C.rgba_of_colour(col)))
        order.append(k)
    ts.add_boxes(items)  # one device call for all 1000 primitives' pieces
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    starts, idxs = ts.build_lists(order)
    out = ts.render(bg, starts, idxs)
    int(jnp.sum(out >> 24))
    n = 30
    t0 = time.time()
    x = bg
    for _ in range(n):
        x = ts.render(x, starts, idxs)
    int(jnp.sum(x >> 24))
    t1 = time.time()
    t2 = time.time()
    int(jnp.sum(bg >> 24))
    t3 = time.time()
    dt = max(1e-9, (t1 - t0) - (t3 - t2))
    fps = n / dt
    emit(
        "fullframe_4k_1000prims_fps",
        fps,
        "fps",
        60.0,
        {"mpix_per_s": round(W * H * fps / 1e6), "pieces": sum(len(v) for v in ts.pieces.values())},
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cfgs = {"1": config1, "2": config2, "3": config3, "4": config4, "5": config5}
    if which == "all":
        for k in sorted(cfgs):
            cfgs[k]()
    else:
        cfgs[which]()


if __name__ == "__main__":
    main()
