"""Tile-normalized batched rasterizer == scalar pipeline, pixel for pixel.

The tile path (raster/tile_raster) must produce the same composited frame
as shattering full_sprite_of_object rasters (the round-1 path), for the
same scenes: same span sweeps, same Gaussian table sums, same integer
dissolve (parity anchors polygon.ml:520-528, 694-746)."""

import numpy as np
import pytest

import coherence_tpu.colour as C
import coherence_tpu.transform as tr
from coherence_tpu.geometry import path as gpath
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster.pallas_compositor import pack_rgba
from coherence_tpu.raster.tiled_scene import TiledScene
from coherence_tpu.scene import render as R
from coherence_tpu.scene.fastframe import build_tiled_scene, full_sprite_of_object

import jax.numpy as jnp

W, H = 512, 256  # 4 x 4 tiles of 128 x 64


def _bg():
    return pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))


def _render_both(objs):
    """(tile-path frame, scalar-path frame) for a front-to-back scene."""
    keyed = [(i, o) for i, o in enumerate(objs)]
    order = [i for i, _ in keyed]

    ts_tile = TiledScene(W, H)
    build_tiled_scene(ts_tile, keyed)
    starts, idxs = ts_tile.build_lists(order)
    frame_tile = np.asarray(ts_tile.render(_bg(), starts, idxs))

    ts_ref = TiledScene(W, H)
    for key, o in keyed:
        spr = full_sprite_of_object(o)
        if spr is not None:
            ts_ref.add_object(key, spr)
        else:
            ts_ref.pieces[key] = []
    starts, idxs = ts_ref.build_lists(order)
    frame_ref = np.asarray(ts_ref.render(_bg(), starts, idxs))
    return frame_tile, frame_ref


def _poly(points, colour, winding=gpath.NONZERO, alpha=255):
    path = gpath.path_of_pointlist(winding, points)
    fill = rfills.plain(C.dissolve(colour, delta=alpha) if alpha != 255 else colour)
    return R.Obj(R.ident.new_ids(), R.Basic(fill, R.PathShape(path)), (), R.OVER)


def test_single_triangle_matches_scalar_path():
    o = _poly([(30.0, 20.0), (400.0, 60.0), (120.0, 200.0)], C.steelblue)
    got, want = _render_both([o])
    assert (got == want).all()


def test_mixed_scene_matches_scalar_path():
    objs = [
        _poly([(10.0, 10.0), (500.0, 30.0), (250.0, 250.0)], C.crimson, alpha=170),
        R.Obj(
            R.ident.new_ids(),
            R.Basic(rfills.plain(C.darkgreen), R.PathShape(gshapes.circle(300.0, 128.0, 90.0))),
            (),
            R.OVER,
        ),
        R.Obj(
            R.ident.new_ids(),
            R.Basic(
                rfills.plain(C.black),
                R.StrokedPathShape(
                    gpath.path_of_pointlist(
                        gpath.NONZERO, [(40.0, 220.0), (470.0, 40.0), (470.0, 41.0)]
                    ),
                    gshapes.StrokeSpec(linewidth=6.0),
                ),
            ),
            (),
            R.OVER,
        ),
        # Full-frame background rectangle: exercises interior tiles.
        _poly([(-20.0, -20.0), (600.0, -20.0), (600.0, 300.0), (-20.0, 300.0)], C.wheat),
    ]
    got, want = _render_both(objs)
    assert (got == want).all()


def test_evenodd_star_matches_scalar_path():
    pts = []
    import math

    for k in range(5):
        a = -math.pi / 2 + k * 4 * math.pi / 5
        pts.append((256.0 + 110.0 * math.cos(a), 128.0 + 110.0 * math.sin(a)))
    o = _poly(pts, C.purple, winding=gpath.EVEN_ODD)
    o2 = _poly(pts, C.purple, winding=gpath.NONZERO)
    got, want = _render_both([o, o2])
    assert (got == want).all()


def test_offscreen_clipping_matches_scalar_path():
    # Object partially left/above the frame and beyond the right edge.
    o = _poly([(-90.0, -40.0), (580.0, 10.0), (300.0, 290.0)], C.navy, alpha=200)
    got, want = _render_both([o])
    assert (got == want).all()


def test_random_scenes_match_scalar_path():
    rng = np.random.default_rng(7)
    for trial in range(4):
        objs = []
        for _ in range(6):
            n = int(rng.integers(3, 7))
            pts = [
                (float(rng.uniform(-40, W + 40)), float(rng.uniform(-40, H + 40)))
                for _ in range(n)
            ]
            colour = C.colour_of_rgba(*(int(v) for v in rng.integers(0, 256, 3)), 255)
            alpha = int(rng.integers(60, 256))
            winding = gpath.NONZERO if rng.integers(2) else gpath.EVEN_ODD
            objs.append(_poly(pts, colour, winding=winding, alpha=alpha))
        got, want = _render_both(objs)
        assert (got == want).all(), f"trial {trial}"


def test_chunked_aa_equals_unchunked():
    """Row-band chunking in coverage_opacity must equal the one-shot path.

    Regression: spans ABOVE a band's origin produced negative scatter rows,
    which mode="drop" WRAPS (numpy semantics) instead of dropping — bands
    after the first acquired phantom coverage (found round 2; the bug made
    every chunked object's AA fringe wrong below the first band)."""
    from coherence_tpu.raster import aa as raa
    from coherence_tpu.raster import scanline

    pts = [(-90.0, -40.0), (580.0, 10.0), (300.0, 290.0)]
    path = gpath.path_of_pointlist(gpath.NONZERO, pts)
    edges = np.asarray(gpath.edgelist_of_path(path), np.int64)
    aa_spans = scanline.scaled_spans_of_edgelist(edges, gpath.NONZERO, raa._H)
    box = (-90, -41, 580, 290)
    one_shot = np.asarray(raa.coverage_opacity(box, aa_spans))
    old = raa._MAX_T_ELEMS
    raa._MAX_T_ELEMS = 1 << 22  # force several row bands
    try:
        chunked = np.asarray(raa.coverage_opacity(box, aa_spans))
    finally:
        raa._MAX_T_ELEMS = old
    assert (chunked == one_shot).all()


def test_device_view_tiled_set_scene_matches():
    from coherence_tpu.scene.fastframe import DeviceView

    objs = [
        _poly([(10.0, 10.0), (500.0, 30.0), (250.0, 250.0)], C.crimson, alpha=170),
        _poly([(-20.0, -20.0), (600.0, -20.0), (600.0, 300.0), (-20.0, 300.0)], C.wheat),
    ]
    dv_t = DeviceView(W, H)
    dv_t.set_scene(objs, tiled=True)
    dv_t.render(full=True)
    dv_s = DeviceView(W, H)
    dv_s.set_scene(objs)
    dv_s.render(full=True)
    assert (dv_t.read() == dv_s.read()).all()


def test_fixed_chunk_batches_and_warmup():
    """Big scenes dispatch in fixed-chunk batches (scene-independent program
    shapes the warmup can preload); small counts keep pow2 buckets."""
    from coherence_tpu.raster import tile_raster as T

    small = list(range(5))
    assert T._batches(small, 256) == [(small, 8)]
    big = list(range(600))
    got = T._batches(big, 256)
    assert [nb for _, nb in got] == [256, 256, 256]
    assert sum(len(b) for b, _ in got) == 600
    assert [len(b) for b, _ in got] == [256, 256, 88]
    exact = list(range(256))
    assert T._batches(exact, 256) == [(exact, 256)]
    # force_chunk closes the program set: small batches pad to the full
    # chunk instead of minting a fresh pow2-bucket program shape.
    assert T._batches(small, 256, force_chunk=True) == [(small, 256)]
    assert T._batches(big, 256, force_chunk=True) == T._batches(big, 256)

    outs = T.warmup()  # must not raise; shapes are the fixed chunks
    assert outs[0].shape[0] == T._CHUNKS[0]
    assert outs[-1].shape[0] == T._CHUNK_INTERIOR


def test_combined_flush_matches_per_class():
    """flush(combined=True) — the one-program TPU cold-build path — must
    produce the same registered piece pixels as the per-class kernels."""

    from coherence_tpu.raster import tile_raster as T
    from coherence_tpu.raster.pallas_compositor import TILE_H, TILE_W

    from coherence_tpu.scene.fastframe import _batch_extract

    rng = np.random.default_rng(7)
    build = T.TileBuild(nty=3, ntx=3)
    for i in range(6):
        pts = [tuple(p) for p in rng.uniform(5, 350, size=(3, 2))]
        o = _poly(pts, C.crimson if i % 2 else C.steelblue, alpha=200)
        ext = _batch_extract(o)
        assert ext is not None
        ok = build.add_object(("o", i), *ext)
        assert ok
    b2 = T.TileBuild(build.nty, build.ntx)
    b2.edge_items = {c: list(v) for c, v in build.edge_items.items()}
    b2.interior_items = list(build.interior_items)

    b3 = T.TileBuild(build.nty, build.ntx)
    b3.edge_items = {c: list(v) for c, v in build.edge_items.items()}
    b3.interior_items = list(build.interior_items)
    b3.prefill_combined()  # the backend-bring-up overlap path

    blocks_a, reg_a = build.flush(combined=True)
    blocks_b, reg_b = b2.flush(combined=False)
    blocks_c, reg_c = b3.flush(combined=True)
    assert set(reg_a) == set(reg_b) == set(reg_c)
    for key in reg_a:
        pa = sorted(reg_a[key])
        pb = sorted(reg_b[key])
        pc = sorted(reg_c[key])
        assert (
            [t for t, _, _ in pa]
            == [t for t, _, _ in pb]
            == [t for t, _, _ in pc]
        )
        for (ta, ba, sa), (tb, bb, sb), (tc, bc, sc) in zip(pa, pb, pc):
            assert (
                np.asarray(blocks_a[ba][sa]) == np.asarray(blocks_b[bb][sb])
            ).all()
            assert (
                np.asarray(blocks_a[ba][sa]) == np.asarray(blocks_c[bc][sc])
            ).all()


def test_staged_set_scene_matches_inline():
    """set_scene(staged=stage_tiled_scene(...)) — the backend-bring-up
    overlap path — must be identical to inline staging: same pieces, same
    rendered frame."""
    from coherence_tpu.scene.fastframe import DeviceView, stage_tiled_scene

    objs = [
        _poly([(10.0, 10.0), (500.0, 30.0), (250.0, 250.0)], C.crimson, alpha=170),
        _poly([(-20.0, -20.0), (600.0, -20.0), (600.0, 300.0), (-20.0, 300.0)], C.wheat),
    ]
    dv_a = DeviceView(W, H)
    staged = stage_tiled_scene(
        dv_a.ts.nty, dv_a.ts.ntx, dv_a.pw, dv_a.ph, [(o.idset, o) for o in objs]
    )
    dv_a.set_scene(objs, tiled=True, staged=staged)
    dv_a.render(full=True)
    dv_b = DeviceView(W, H)
    dv_b.set_scene(objs, tiled=True)
    dv_b.render(full=True)
    for o in objs:
        assert dv_a.ts.pieces[o.idset] == dv_b.ts.pieces[o.idset]
    assert (dv_a.read() == dv_b.read()).all()


def test_reset_scene_matches_fresh_view():
    """reset_scene (the in-place zoom path) must render identically to a
    fresh DeviceView of the new scene, while reusing the atlas buffer."""
    from coherence_tpu.scene.fastframe import DeviceView

    scene_a = [
        _poly([(10.0, 10.0), (500.0, 30.0), (250.0, 250.0)], C.crimson, alpha=170),
        _poly([(-20.0, -20.0), (600.0, -20.0), (600.0, 300.0), (-20.0, 300.0)], C.wheat),
    ]
    # Scene B = A scaled 2x about the frame centre (a zoom step).
    zoom = [
        tr.Translate(W / 2.0, H / 2.0),
        tr.Scale((0.0, 0.0), 2.0, 2.0),
        tr.Translate(-W / 2.0, -H / 2.0),
    ]
    scene_b = [R.transform_renderobject_many(zoom, o) for o in scene_a]

    dv = DeviceView(W, H)
    dv.set_scene(scene_a, tiled=True)
    dv.render(full=True)
    cap_before = dv.ts.atlas().shape[0]
    dv.reset_scene(scene_b, tiled=True)
    dv.render(full=True)
    assert dv.ts.atlas().shape[0] >= cap_before  # buffer reused/grown, not shrunk

    fresh = DeviceView(W, H)
    fresh.set_scene(scene_b, tiled=True)
    fresh.render(full=True)
    assert (dv.read() == fresh.read()).all()


def test_sweep_cache_hit_is_identical():
    """Re-staging the same geometry must hit the content-addressed sweep
    cache and produce identical work items (the zoom-revisit coherence
    path)."""
    from coherence_tpu.raster import tile_raster as T

    o = _poly([(10.0, 10.0), (500.0, 30.0), (250.0, 250.0)], C.crimson, alpha=170)
    from coherence_tpu.scene.fastframe import _batch_extract

    ext = _batch_extract(o)
    T.sweep_cache_clear()
    b1 = T.TileBuild(nty=4, ntx=4)
    assert b1.add_object("a", *ext)
    assert T.sweep_cache_stats == {"hits": 0, "misses": 1}
    b2 = T.TileBuild(nty=4, ntx=4)
    assert b2.add_object("b", *ext)
    assert T.sweep_cache_stats == {"hits": 1, "misses": 1}
    for cls in b1.edge_items:
        for ia, ib in zip(b1.edge_items[cls], b2.edge_items[cls]):
            assert ia[1] == ib[1]  # same tile
            for fa, fb in zip(ia[2:5], ib[2:5]):
                for xa, xb in zip(fa, fb):
                    assert (xa == xb).all()
    # A different grid is a different key (rows_clip changes the sweep).
    b3 = T.TileBuild(nty=2, ntx=4)
    b3.add_object("c", *ext)
    assert T.sweep_cache_stats["misses"] == 2


def test_scene_build_cache_restores_identical_content():
    """Content-addressed scene-build cache: rebuilding a scene with the
    SAME staged content (new object ids — the zoom tool makes fresh
    transformed objects every step) must restore from the snapshot
    without dispatching any build kernel, pixel-identically; different
    content must rebuild."""
    import coherence_tpu.ident as ident
    from coherence_tpu.raster import tile_raster as TR
    from coherence_tpu.scene import fastframe as FF

    FF._SCENE_BUILD_CACHE_MAX = 2  # the autouse fixture disables + restores

    def mk_scene():
        # Fresh idsets each call, identical geometry/content.
        return [
            _poly([(10.0, 10.0), (500.0, 30.0), (250.0, 250.0)], C.crimson,
                  alpha=170),
            _poly([(30.0, 200.0), (600.0, 220.0), (300.0, 40.0)], C.wheat),
        ]

    dv1 = FF.DeviceView(W, H)
    dv1.set_scene(mk_scene(), tiled=True)
    dv1.render(full=True)
    ref = dv1.read()

    orig_flush = TR.TileBuild.flush

    def boom(self, combined=None):
        raise AssertionError("cache hit expected: flush must not run")

    dv2 = FF.DeviceView(W, H)
    TR.TileBuild.flush = boom
    try:
        dv2.set_scene(mk_scene(), tiled=True)  # restore path, no flush
    finally:
        TR.TileBuild.flush = orig_flush
    dv2.render(full=True)
    assert (dv2.read() == ref).all()

    # Mutating the live atlas must not corrupt the snapshot.
    k = dv2.order[0]
    dv2.replace_object(
        k, _poly([(50.0, 50.0), (400.0, 60.0), (200.0, 200.0)], C.steelblue)
    )
    dv2.render()
    dv3 = FF.DeviceView(W, H)
    dv3.set_scene(mk_scene(), tiled=True)
    dv3.render(full=True)
    assert (dv3.read() == ref).all()

    # Different content: must rebuild (cache key differs).
    other = [
        _poly([(12.0, 10.0), (500.0, 30.0), (250.0, 250.0)], C.crimson,
              alpha=170),
        _poly([(30.0, 200.0), (600.0, 220.0), (300.0, 40.0)], C.wheat),
    ]
    dv4 = FF.DeviceView(W, H)
    dv4.set_scene(other, tiled=True)
    dv4.render(full=True)
    assert not (dv4.read() == ref).all()


def test_prefetch_scene_makes_reset_a_cache_hit():
    """DeviceView.prefetch_scene builds a speculative scene into the
    scene-build cache without touching the live view; a later reset_scene
    whose staged content matches (fresh object ids) must restore without
    running any flush, pixel-identical to a from-scratch build."""
    from coherence_tpu.raster import tile_raster as TR
    from coherence_tpu.scene import fastframe as FF

    FF._SCENE_BUILD_CACHE_MAX = 2  # the autouse fixture disables + restores

    def scene_a():
        return [_poly([(10.0, 10.0), (500.0, 30.0), (250.0, 250.0)], C.crimson)]

    def scene_b():
        return [
            _poly([(30.0, 200.0), (600.0, 220.0), (300.0, 40.0)], C.wheat),
            _poly([(5.0, 5.0), (120.0, 10.0), (60.0, 90.0)], C.steelblue,
                  alpha=140),
        ]

    # Independent ground truth for scene B.
    dv_ref = FF.DeviceView(W, H)
    dv_ref.set_scene(scene_b(), tiled=True)
    dv_ref.render(full=True)
    ref = dv_ref.read()
    FF.scene_build_cache_clear()  # drop ground-truth's own entry

    dv = FF.DeviceView(W, H)
    dv.set_scene(scene_a(), tiled=True)
    dv.render(full=True)
    live_before = dv.read()
    dv.prefetch_scene(scene_b())  # new ids, same content as scene_b()
    # The live view is untouched by the prefetch.
    assert (dv.read() == live_before).all()

    orig_flush = TR.TileBuild.flush

    def boom(self, combined=None):
        raise AssertionError("cache hit expected: flush must not run")

    TR.TileBuild.flush = boom
    try:
        dv.reset_scene(scene_b(), tiled=True)
    finally:
        TR.TileBuild.flush = orig_flush
    dv.render(full=True)
    assert (dv.read() == ref).all()


def test_prefetch_zoom_candidates_hits_both_directions():
    """prefetch_zoom_candidates stages the zoom tool's 2x and 0.5x next
    scenes into the build cache from idle; a later real zoom step in
    EITHER direction (fresh object ids, tool-minted transforms) must
    restore without running any flush and count as a cache hit.

    Dims are deliberately NOT tile-aligned: the zoom tool scales about
    the LOGICAL frame centre, and a prefetch centred on the padded pw/ph
    mints different transform floats, so the digest silently misses
    (caught on hardware in the r4 config-5 run: hits=0)."""
    from coherence_tpu import transform as tr
    from coherence_tpu.raster import tile_raster as TR
    from coherence_tpu.scene import fastframe as FF
    from coherence_tpu.scene import render as R

    FF._SCENE_BUILD_CACHE_MAX = 4  # the autouse fixture disables + restores
    ZW, ZH = 500, 250  # pads to 512 x 256: centre != padded centre

    def base_scene():
        return [
            _poly([(10.0, 10.0), (500.0, 30.0), (250.0, 250.0)], C.crimson),
            _poly([(30.0, 200.0), (600.0, 220.0), (300.0, 40.0)], C.wheat,
                  alpha=150),
        ]

    def zoom_tmat(f):
        return [
            tr.Translate(ZW / 2.0, ZH / 2.0),
            tr.Scale((0.0, 0.0), f, f),
            tr.Translate(-ZW / 2.0, -ZH / 2.0),
        ]

    def zoomed(f):
        return [
            R.transform_renderobject_many(zoom_tmat(f), o) for o in base_scene()
        ]

    # Ground truths for both directions.
    refs = {}
    for f in (2.0, 0.5):
        dvr = FF.DeviceView(ZW, ZH)
        dvr.set_scene(zoomed(f), tiled=True)
        dvr.render(full=True)
        refs[f] = dvr.read()
    FF.scene_build_cache_clear()

    dv = FF.DeviceView(ZW, ZH)
    dv.set_scene(base_scene(), tiled=True)
    dv.render(full=True)
    FF.scene_build_cache_stats(reset=True)
    dv.prefetch_zoom_candidates(base_scene())

    orig_flush = TR.TileBuild.flush

    def boom(self, combined=None):
        raise AssertionError("cache hit expected: flush must not run")

    for f in (2.0, 0.5):
        TR.TileBuild.flush = boom
        try:
            dv.reset_scene(zoomed(f), tiled=True)
        finally:
            TR.TileBuild.flush = orig_flush
        dv.render(full=True)
        assert (dv.read() == refs[f]).all()
    stats = FF.scene_build_cache_stats()
    assert stats["hits"] == 2 and stats["misses"] >= 2  # 2 prefetch builds
