"""Headline benchmark: animated sprite over the lion scene at 1920x1080 with
frame-to-frame coherence (BASELINE.md north star / config 3).

Per frame: a translucent blob translates across the lion; its raster is
reused via translation (a box shift), the dirty region is the union of its
old and new bounds, and only the dirty window recomposites — all device-side
with zero host syncs inside the timed loop (raster/framepath).

Prints ONE JSON line: fps vs the 60 fps target.
"""

import json
import os
import sys
import time

import numpy as np


def _setup_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass


_setup_cache()


def build():
    import jax.numpy as jnp

    import coherence_tpu.colour as C
    import coherence_tpu.transform as tr
    from coherence_tpu.geometry import shapes as gshapes
    from coherence_tpu.raster import fills as rfills
    from coherence_tpu.raster import region
    from coherence_tpu.raster.framepath import FrameBuffer
    from coherence_tpu.scene import examples as E
    from coherence_tpu.scene import render as R

    W, H = 1920, 1080

    # Lion scaled to fill 1080p, y-flipped into raster orientation.
    lion = E.smalllion()
    xmin, xmax, ymin, ymax = R.bounds_of_basicshape(lion)
    scale = min(W / (xmax - xmin), H / (ymax - ymin))
    lion = R.transform_renderobject_many(
        [
            tr.Translate(0.0, float(H)),
            tr.Scale((0.0, 0.0), 1.0, -1.0),
            tr.Scale((0.0, 0.0), scale, scale),
            tr.Translate(-xmin, -ymin),
        ],
        lion,
    )
    objs = list(lion.geometry.objects)

    # The moving blob: a translucent circle.
    blob = R.Obj(
        __import__("coherence_tpu.ident", fromlist=["new_ids"]).new_ids(),
        R.Basic(
            rfills.plain(C.dissolve(C.crimson, delta=170)),
            R.PathShape(gshapes.circle(0.0, 0.0, 60.0)),
        ),
        (tr.Translate(120.0, 400.0),),
        R.OVER,
    )

    # Precompute each object's full raster once (the per-object cache the
    # coherent renderer maintains; here materialized eagerly) — batched:
    # one fused device dispatch per bucket group instead of ~8 round trips
    # per object.
    from coherence_tpu.scene.fastframe import full_sprites_of_objects

    built = full_sprites_of_objects(objs + [blob])
    sprites = [s for s in built[:-1] if s is not None]
    boxes = [s.box for s in sprites]
    blob_spr = built[-1]

    fb = FrameBuffer(W, H, C.white)
    # Initial full render: composite bottom-up in chunks (right fold).
    full_box = (1, 1, W, H)
    chunk = 8
    for k in range(len(sprites), 0, -chunk):
        fb.composite(full_box, sprites[max(0, k - chunk) : k])
    return fb, sprites, boxes, blob_spr


def main():
    from coherence_tpu.raster.region import box_union, translate_sprite

    t0 = time.time()
    fb, sprites, boxes, blob_spr = build()
    fb.rgba.block_until_ready()
    build_time = time.time() - t0

    # Static scene below the animated sprite, composited once — the device
    # form of the reference's frame-to-frame coherence (the scene below the
    # LMO is unchanged between frames, so its raster is reused wholesale).
    background = fb.snapshot()

    # Animated loop: translate the blob along a diagonal; each frame restores
    # the dirty window (old ∪ new bounds) from the background and paints the
    # translated blob over it — ONE fused device dispatch, no syncs.
    def frame(k, prev_spr):
        dxy = (7, 3) if (k // 200) % 2 == 0 else (-7, -3)
        cur = translate_sprite(dxy[0], dxy[1], prev_spr)
        dirty = box_union(prev_spr.box, cur.box)
        fb.blit_over_background(background, cur, dirty)
        return cur

    import jax.numpy as jnp

    def force_done():
        # block_until_ready does not actually block on the axon transport;
        # a scalar readback of a value that depends on every frame does.
        return int(jnp.sum(fb.rgba[::64, ::64, 3]))

    # Warm up compiles.
    spr = blob_spr
    for k in range(3):
        spr = frame(k, spr)
    force_done()

    # Readback-overhead baseline (amortized out of the frame loop).
    t0 = time.time()
    force_done()
    readback_s = time.time() - t0

    # Median of 5 timed loops: the tunnel's dispatch-latency jitter over a
    # ~0.2s window is large, so a single loop is noisy by 2x.
    n_frames = 400
    results = []
    spr2 = spr
    for _rep in range(5):
        dirty_pix = 0
        t0 = time.time()
        for k in range(n_frames):
            prev_box = spr2.box
            spr2 = frame(k, spr2)
            d = box_union(prev_box, spr2.box)
            dirty_pix += (d[2] - d[0] + 1) * (d[3] - d[1] + 1)
        force_done()
        dt = max(1e-9, time.time() - t0 - readback_s)
        results.append((n_frames / dt, dirty_pix / dt / 1e6))
    results.sort()
    fps, mpix_s = results[len(results) // 2]

    result = {
        "metric": "lion_1080p_animated_sprite_fps",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
        "extra": {
            "dirty_mpix_per_s": round(mpix_s, 1),
            "build_s": round(build_time, 1),
            "frames": n_frames,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
