"""Sparse tiled-scene compositor tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import coherence_tpu.colour as C
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.raster import tiled_scene as TS
from coherence_tpu.raster.pallas_compositor import TILE_H, TILE_W, pack_rgba, unpack_rgba
from coherence_tpu.raster.region import shape_of_box

RNG = np.random.default_rng(4)


def _mk_scene(W, H, n_objs):
    ts = TS.TiledScene(W, H)
    order = []
    for k in range(n_objs):
        x0 = int(RNG.integers(1, W - 40))
        y0 = int(RNG.integers(1, H - 40))
        w = int(RNG.integers(8, 40))
        h = int(RNG.integers(8, 40))
        alpha = 255 if k % 3 else 150
        col = C.dissolve(
            C.colour_of_rgba(*(int(v) for v in RNG.integers(0, 256, 3)), 255), delta=alpha
        )
        spr = region.fillshape(shape_of_box((x0, y0, x0 + w - 1, y0 + h - 1)), rfills.plain(col))
        ts.add_object(k, spr)
        order.append(k)
    return ts, order


def _render_interpret(ts, bg, starts, idxs):
    # Swap the jitted pallas call for interpret mode via monkeypatching the
    # module-level _render_tiles at call time.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax

    grid = (ts.nty * ts.ntx,)
    return pl.pallas_call(
        TS._kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (TILE_H, TILE_W),
                    lambda t, starts, idxs, ntx=ts.ntx: (t // ntx, t % ntx),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (TILE_H, TILE_W),
                lambda t, starts, idxs, ntx=ts.ntx: (t // ntx, t % ntx),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((TS.N_BUF, TILE_H, TILE_W), jnp.uint32),
                pltpu.SemaphoreType.DMA((TS.N_BUF,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(bg.shape, jnp.uint32),
        interpret=True,
    )(starts, idxs, bg, ts.atlas())


def test_tiled_scene_matches_reference():
    W, H = TILE_W * 3, TILE_H * 3
    ts, order = _mk_scene(W, H, 25)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    starts, idxs = ts.build_lists(order)
    out = _render_interpret(ts, bg, starts, idxs)
    ref = TS.render_scene_xla_reference(ts, bg, order)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_tiled_scene_empty_tiles_show_background():
    W, H = TILE_W * 2, TILE_H * 2
    ts = TS.TiledScene(W, H)
    col = C.red
    spr = region.fillshape(shape_of_box((2, 2, 20, 20)), rfills.plain(col))
    ts.add_object("a", spr)
    bgv = pack_rgba(jnp.asarray(np.full((H, W, 4), 200), jnp.int32))
    starts, idxs = ts.build_lists(["a"])
    out = np.asarray(_render_interpret(ts, bgv, starts, idxs))
    # Bottom-right tile has no object: pure background.
    assert (out[TILE_H:, TILE_W:] == np.asarray(bgv)[TILE_H:, TILE_W:]).all()
    # Object pixel: red.
    rgba = np.asarray(unpack_rgba(jnp.asarray(out)))
    assert tuple(rgba[10, 10]) == C.rgba_of_colour(C.red)


def test_dirty_tile_restriction():
    W, H = TILE_W * 2, TILE_H * 2
    ts, order = _mk_scene(W, H, 8)
    starts_all, idxs_all = ts.build_lists(order)
    starts_none, idxs_none = ts.build_lists(order, dirty_tiles=[])
    assert int(starts_none[-1]) == 0
    starts_one, idxs_one = ts.build_lists(order, dirty_tiles=[0])
    assert int(starts_one[1]) == int(starts_one[-1])  # only tile 0 has entries


def test_shatter_alignment():
    W, H = TILE_W * 2, TILE_H * 2
    ts = TS.TiledScene(W, H)
    # An object crossing all four tiles.
    x0, y0 = TILE_W - 5, TILE_H - 5
    spr = region.fillshape(shape_of_box((x0, y0, x0 + 10, y0 + 10)), rfills.plain(C.blue))
    ts.add_object("x", spr)
    assert len(ts.pieces["x"]) == 4
    atlas = np.asarray(ts.atlas())
    # Reassemble and compare against a direct dense paste.
    full = np.zeros((H, W), np.uint32)
    for tile, entry in ts.pieces["x"]:
        ty, tx = tile // ts.ntx, tile % ts.ntx
        full[ty * TILE_H : (ty + 1) * TILE_H, tx * TILE_W : (tx + 1) * TILE_W] = atlas[entry]
    expect = np.zeros((H, W), np.uint32)
    packed = np.asarray(pack_rgba(spr.rgba))
    w, h = spr.wh
    expect[y0 - 1 : y0 - 1 + h, x0 - 1 : x0 - 1 + w] = packed[:h, :w]
    assert np.array_equal(full, expect)


def test_sharded_render_matches_reference():
    import jax.numpy as jnp

    from coherence_tpu.parallel import make_mesh

    W, H = TILE_W * 2, TILE_H * 8
    ts, order = _mk_scene(W, H, 20)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    mesh = make_mesh(8)
    out = TS.render_sharded(ts, bg, order, mesh, interpret=True)
    ref = TS.render_scene_xla_reference(ts, bg, order)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_render_dirty_subsets_match_full():
    """render_dirty == full re-render on the dirty tiles, untouched elsewhere.

    Drives _render_dirty_tiles directly (the production incremental path),
    explicitly including tile 0 dirty with 7 padding slots (the ADVICE-r1
    aliasing hazard: padding slots must idempotently re-render, never pass
    stale frame content through) and a single-tile dirty set."""
    W, H = TILE_W * 2, TILE_H * 2
    ts, order = _mk_scene(W, H, 10)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    frame0 = ts.render(bg, *ts.build_lists(order))
    # Scene change: topmost object removed -> dirty tiles must show the new
    # scene, clean tiles must keep the OLD frame (still showing the object).
    order2 = order[1:]
    full_new = np.asarray(ts.render(bg, *ts.build_lists(order2)))
    before = np.asarray(frame0)
    for dirty in ([0], [3], [0, 1], [1, 2], [0, 1, 2, 3]):
        frame = frame0 + 0  # fresh buffer: render_dirty donates its input
        out = np.asarray(ts.render_dirty(frame, bg, order2, dirty))
        expect = before.copy()
        for t in dirty:
            ty, tx = t // ts.ntx, t % ts.ntx
            sl = np.s_[ty * TILE_H : (ty + 1) * TILE_H, tx * TILE_W : (tx + 1) * TILE_W]
            expect[sl] = full_new[sl]
        assert np.array_equal(out, expect), f"dirty={dirty}"


def test_render_dirty_padding_slots_duplicate_last_tile():
    """The host-side list builder pads slots with the last dirty tile's
    coords+span (idempotence invariant the kernel relies on)."""
    W, H = TILE_W * 2, TILE_H * 2
    ts, order = _mk_scene(W, H, 6)
    import coherence_tpu.raster.tiled_scene as mod

    captured = {}
    orig = mod._render_dirty_tiles

    def spy(coords, spans, idxs, background, frame, atlas, **kw):
        captured["coords"] = np.asarray(coords)
        captured["spans"] = np.asarray(spans)
        return orig(coords, spans, idxs, background, frame, atlas, **kw)

    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    frame = ts.render(bg, *ts.build_lists(order)) + 0
    mod._render_dirty_tiles = spy
    try:
        ts.render_dirty(frame, bg, order, [0])
    finally:
        mod._render_dirty_tiles = orig
    coords, spans = captured["coords"], captured["spans"]
    # FLAT (2 * n_slots,) slot arrays: slot j at [2j, 2j+1].
    assert coords.shape == (16,) and spans.shape == (16,)
    assert (coords[0::2] == coords[0]).all() and (coords[1::2] == coords[1]).all(), (
        "padding must duplicate the dirty tile"
    )
    assert (spans[0::2] == spans[0]).all() and (spans[1::2] == spans[1]).all()


def test_add_boxes_matches_add_object():
    """Bulk box ingestion produces the same frame as per-object shattering."""
    import numpy as np

    import coherence_tpu.colour as C
    from coherence_tpu.raster import fills as rfills, region
    from coherence_tpu.raster.pallas_compositor import pack_rgba
    from coherence_tpu.raster.region import shape_of_box

    rng = np.random.default_rng(5)
    W, H = 4 * TILE_W, 3 * TILE_H
    a = TS.TiledScene(W, H)
    b = TS.TiledScene(W, H)
    items = []
    order = []
    for k in range(12):
        x0 = int(rng.integers(1, W - 40))
        y0 = int(rng.integers(1, H - 40))
        w = int(rng.integers(5, 200))
        h = int(rng.integers(5, 200))
        box = (x0, y0, min(W, x0 + w - 1), min(H, y0 + h - 1))
        col = C.dissolve(
            C.colour_of_rgba(*(int(v) for v in rng.integers(0, 256, 3)), 255),
            delta=150 if k % 2 else 255,
        )
        spr = region.fillshape(shape_of_box(box), rfills.plain(col))
        a.add_object(k, spr)
        items.append((k, box, C.rgba_of_colour(col)))
        order.append(k)
    b.add_boxes(items)
    bg = pack_rgba(jnp.broadcast_to(jnp.asarray([255, 255, 255, 255], jnp.int32), (H, W, 4)))
    fa = a.render(bg, *a.build_lists(order))
    fb = b.render(bg, *b.build_lists(order))
    assert np.array_equal(np.asarray(fa), np.asarray(fb))


def test_sharded_dirty_tiles_match_unsharded():
    """The PRODUCT multi-chip path: a mesh-sharded DeviceView's dirty-tile
    re-render must be pixel-equal to the unsharded view — across dirty
    subsets including tile 0, bands with no dirty tiles, and an animated
    in-place object move."""
    import jax.numpy as jnp

    from coherence_tpu.parallel import make_mesh
    from coherence_tpu.raster.region import shape_of_box

    W, H = TILE_W * 2, TILE_H * 8
    ts, order = _mk_scene(W, H, 24)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    mesh = make_mesh(8)
    frame_u = ts.render(bg, *ts.build_lists(order))
    frame_s = frame_u + 0

    for dirty in [
        {0},  # tile 0 only (the aliasing hazard slot), 7 bands idle
        {1, 3},  # one band partially dirty
        set(range(ts.nty * ts.ntx)),  # everything
        {ts.ntx * (ts.nty - 1) + 1},  # last band only
    ]:
        # Scene change: recolour the topmost object so dirty tiles differ.
        k = order[0]
        col = C.dissolve(C.colour_of_rgba(30 + len(dirty), 80, 160, 255), delta=200)
        x0, y0 = 5 + 3 * len(dirty), 9
        spr = region.fillshape(
            shape_of_box((x0, y0, x0 + 30, y0 + 30)), rfills.plain(col)
        )
        ts.add_object(k, spr)
        frame_u = ts.render_dirty(frame_u, bg, order, sorted(dirty))
        frame_s = TS.render_dirty_sharded(
            ts, frame_s, bg, order, sorted(dirty), mesh, interpret=True
        )
        assert np.array_equal(np.asarray(frame_u), np.asarray(frame_s)), dirty


def test_sharded_deviceview_matches_unsharded():
    """DeviceView.use_mesh: full render + translate_object dirty re-render
    sharded over an 8-device CPU mesh equals the unsharded view."""
    from coherence_tpu import ident
    from coherence_tpu.geometry import shapes as gshapes
    from coherence_tpu.parallel import make_mesh
    from coherence_tpu.scene import render as R
    from coherence_tpu.scene.fastframe import DeviceView

    W, H = TILE_W * 2, TILE_H * 8

    def build():
        v = DeviceView(W, H)
        scene = [
            R.Obj(
                ident.new_ids(),
                R.Basic(
                    rfills.plain(C.dissolve(C.crimson, delta=170)),
                    R.PathShape(gshapes.circle(60.0, 80.0, 25.0)),
                ),
                (),
                R.OVER,
            ),
            R.Obj(
                ident.new_ids(),
                R.Basic(rfills.plain(C.steelblue), R.rectangle(20.0, 40.0, 150.0, 300.0)),
                (),
                R.OVER,
            ),
        ]
        v.set_scene(scene)
        return v, scene

    v1, scene1 = build()
    v2, scene2 = build()
    v2.use_mesh(make_mesh(8), interpret=True)
    v1.render(full=True)
    v2.render(full=True)
    assert np.array_equal(v1.read(), v2.read())

    for (va, sc) in ((v1, scene1), (v2, scene2)):
        va.make_animated(sc[0].idset)
        va.render()
    assert np.array_equal(v1.read(), v2.read())

    for step in [(7, 30), (0, 64), (-3, -10)]:
        v1.translate_object(scene1[0].idset, *step)
        v2.translate_object(scene2[0].idset, *step)
        v1.render()
        v2.render()
        assert np.array_equal(v1.read(), v2.read()), step

    # A live blur filter over both views (sharded content feeds the blur
    # blend through cross-shard slices) stays pixel-equal too.
    from coherence_tpu.raster.convolve import mkgaussian
    from coherence_tpu.raster.region import box_union
    from coherence_tpu.scene.fastframe import FilteredDisplay, alpha_plane_of_object

    f_geom = R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.white), R.rectangle(10.0, 30.0, 200.0, 380.0)),
        (),
        R.OVER,
    )
    kernel = mkgaussian(2)
    f_alpha = alpha_plane_of_object(f_geom, W, H)
    disps = []
    for va, sc in ((v1, scene1), (v2, scene2)):
        d = FilteredDisplay(va, f_alpha, kernel)
        d.full_refresh()
        prev = va.sprites[sc[0].idset].box
        va.translate_object(sc[0].idset, 4, 9)
        d.step(box_union(prev, va.sprites[sc[0].idset].box))
        disps.append(d.read())
    assert np.array_equal(disps[0], disps[1])


def test_reserve_slots_on_empty_scene_keeps_indices_aligned():
    """reserve_slots before ANY object must not shift later atlas entry
    indices (atlas() synthesizes an unaccounted 1-slot dummy when empty;
    concatenating it would misalign every subsequent piece by one)."""
    import jax.numpy as jnp

    W, H = TILE_W, TILE_H
    ts = TS.TiledScene(W, H)
    ts.reserve_slots("anim", 2)
    col = C.dissolve(C.colour_of_rgba(200, 40, 40, 255), delta=255)
    spr = region.fillshape(shape_of_box((1, 1, W, H)), rfills.plain(col))
    ts.add_object("obj", spr)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    out = ts.render(bg, *ts.build_lists(["anim", "obj"]))
    got = np.asarray(unpack_rgba(out))
    # The object's colour, not blank reserved slots, must appear.
    assert (got[..., 0] > 150).all(), got[0, 0]


def test_piece_map_index_matches_brute_force():
    """The PieceMap reverse index (tile -> key -> entries) must stay
    consistent through adds, in-place replacement and deletion, and
    _dirty_args must produce exactly the lists the old O(total-pieces)
    walk did — same entries, same front-to-back order."""
    W, H = TILE_W * 4, TILE_H * 4
    ts, order = _mk_scene(W, H, 30)
    # Mutations: replace an object (new pieces), empty one, pop one.
    spr = region.fillshape(
        shape_of_box((1, 1, TILE_W + 10, TILE_H + 10)),
        rfills.plain(C.dissolve(C.colour_of_rgba(9, 9, 9, 255), delta=200)),
    )
    ts.add_object(order[3], spr)
    ts.pieces[order[5]] = []
    ts.pieces.pop(order[7])
    order = [k for k in order if k != order[7]]

    # Index consistency: rebuild from scratch and compare.
    want = {}
    for key, entries in ts.pieces.items():
        for tile, entry in entries:
            want.setdefault(tile, {}).setdefault(key, []).append(entry)
    got = {t: dict(d) for t, d in ts.pieces.by_tile.items() if d}
    assert got == want

    # _dirty_args equivalence with the brute-force builder.
    for dirty in ([0], [3, 5, 9], list(range(ts.ntx * ts.nty))):
        res = ts._dirty_args(order, dirty)
        assert res is not None
        coords, spans, idxs, n_slots = res
        per_tile = {t: [] for t in dirty}
        for key in order:
            for tile, entry in ts.pieces.get(key, ()):
                if tile in per_tile:
                    per_tile[tile].append(entry)
        for j, t in enumerate(sorted(set(dirty))):
            lo, hi = spans[2 * j], spans[2 * j + 1]  # flat slot arrays
            assert list(idxs[lo:hi]) == per_tile[t], (t, idxs[lo:hi], per_tile[t])

    # Override path (the fused animated step): entries swap in for the key.
    override = {order[0]: [(0, 999), (1, 998)]}
    coords, spans, idxs, n_slots = ts._dirty_args(order, [0, 1], override)
    per_tile = {0: [], 1: []}
    for key in order:
        entries = override[key] if key in override else ts.pieces.get(key, ())
        for tile, entry in entries:
            if tile in per_tile:
                per_tile[tile].append(entry)
    for j, t in enumerate((0, 1)):
        lo, hi = spans[2 * j], spans[2 * j + 1]
        assert list(idxs[lo:hi]) == per_tile[t]


def test_banded_atlas_memory_scales_with_devices():
    """VERDICT r2 missing #4: under a mesh the atlas must NOT replicate —
    each device holds ~1/n of the pieces (its band's statics + reserved
    blocks), and the sharded render stays pixel-equal."""
    from coherence_tpu.parallel import make_mesh

    W, H = TILE_W * 2, TILE_H * 8
    ts, order = _mk_scene(W, H, 160)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    mesh = make_mesh(8)

    want = np.asarray(ts.render(bg, *ts.build_lists(order)))
    got = np.asarray(TS.render_sharded(ts, bg, order, mesh, interpret=True))
    assert np.array_equal(want, got)

    banded = ts._banded
    replicated_bytes = int(ts.atlas().size) * 4
    per_dev_bytes = (banded.data.size // banded.n_dev) * 4
    # Random 40px objects on a 16-tile-tall frame: each band holds a small
    # fraction.  Require a real win, not exact 1/8 (pow2 padding + overlap).
    assert per_dev_bytes * 2 < replicated_bytes, (per_dev_bytes, replicated_bytes)
    # And the sharded array really is distributed, one shard per device.
    assert len(banded.data.sharding.device_set) == 8

    # Cache: a second sharded render with no scene change reuses the object;
    # a piece mutation rebuilds it.
    TS.render_sharded(ts, bg, order, mesh, interpret=True)
    assert ts._banded is banded
    spr = region.fillshape(
        shape_of_box((1, 1, 20, 20)),
        rfills.plain(C.dissolve(C.colour_of_rgba(1, 2, 3, 255), delta=255)),
    )
    ts.add_object(order[0], spr)
    want2 = np.asarray(ts.render(bg, *ts.build_lists(order)))
    got2 = np.asarray(TS.render_sharded(ts, bg, order, mesh, interpret=True))
    assert np.array_equal(want2, got2)
    assert ts._banded is not banded


def test_sharded_step_animated_crosses_bands_under_blur():
    """VERDICT r2 'done' gate for multi-chip scaling: an animated object
    crossing shard-band boundaries under a LIVE blur filter, driven by the
    sharded step_animated path (banded reserved-slot update + sharded dirty
    recomposite + sharded blend), pixel-equal to the unsharded fused step —
    with the banded atlas updated in place (no per-frame rebuild) and the
    display plane actually distributed."""
    from coherence_tpu import ident
    from coherence_tpu.geometry import shapes as gshapes
    from coherence_tpu.parallel import make_mesh
    from coherence_tpu.raster.convolve import mkgaussian
    from coherence_tpu.scene import render as R
    from coherence_tpu.scene.fastframe import (
        DeviceView,
        FilteredDisplay,
        alpha_plane_of_object,
    )

    W, H = TILE_W * 2, TILE_H * 8

    def build():
        v = DeviceView(W, H)
        blob = R.Obj(
            ident.new_ids(),
            R.Basic(
                rfills.plain(C.dissolve(C.crimson, delta=170)),
                R.PathShape(gshapes.circle(60.0, 50.0, 22.0)),
            ),
            (),
            R.OVER,
        )
        statics = [
            R.Obj(
                ident.new_ids(),
                R.Basic(
                    rfills.plain(C.steelblue),
                    R.rectangle(20.0, 30.0, 180.0, 420.0),
                ),
                (),
                R.OVER,
            ),
            R.Obj(
                ident.new_ids(),
                R.Basic(rfills.plain(C.white), R.rectangle(1.0, 1.0, float(W), float(H))),
                (),
                R.OVER,
            ),
        ]
        v.set_scene([blob] + statics)
        v.make_animated(blob.idset)
        return v, blob

    f_geom = R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.white), R.rectangle(10.0, 20.0, 220.0, 460.0)),
        (),
        R.OVER,
    )
    kernel = mkgaussian(2)
    f_alpha = alpha_plane_of_object(f_geom, W, H)

    v1, b1 = build()
    v2, b2 = build()
    mesh = make_mesh(8)
    v2.use_mesh(mesh, interpret=True)
    d1 = FilteredDisplay(v1, f_alpha, kernel)
    d2 = FilteredDisplay(v2, f_alpha, kernel)
    d1.full_refresh()
    d2.full_refresh()
    assert np.array_equal(d1.read(), d2.read()), "initial frame"
    assert len(d2.rgba.sharding.device_set) == 8, "display plane not sharded"

    # Each +40-row move crosses 64-row band borders repeatedly.
    banded_after_first = None
    for k, step in enumerate([(0, 40), (5, 40), (-3, 40), (2, 40), (0, 40)]):
        d1.step_animated(b1.idset, *step)
        d2.step_animated(b2.idset, *step)
        assert np.array_equal(d1.read(), d2.read()), f"frame {k}: {step}"
        if banded_after_first is None:
            banded_after_first = v2.ts._banded
        else:
            assert v2.ts._banded is banded_after_first, (
                "banded atlas rebuilt per frame — update_inplace not used"
            )
    # Per-device atlas stays a fraction of the replicated one.
    per_dev = v2.ts._banded.data.size // 8
    assert per_dev < v2.ts.atlas().size, (per_dev, v2.ts.atlas().size)


def test_render_runs_matches_render():
    """The run-contiguous full-frame kernel must be pixel-identical to the
    per-piece kernel, including early-termination (opaque stacks) and
    masked tail layers inside the last chunk."""
    import coherence_tpu.colour as C
    from coherence_tpu.raster import fills as rfills
    from coherence_tpu.raster.tiled_scene import TiledScene
    from coherence_tpu.scene import render as R
    from coherence_tpu.scene.fastframe import build_tiled_scene
    from coherence_tpu.geometry import path as gpath
    from coherence_tpu.raster.pallas_compositor import pack_rgba

    import jax.numpy as jnp
    import numpy as np

    W, H = 512, 256
    rng = np.random.default_rng(11)
    objs = []
    for k in range(12):
        n = int(rng.integers(3, 6))
        pts = [
            (float(rng.uniform(-40, W + 40)), float(rng.uniform(-40, H + 40)))
            for _ in range(n)
        ]
        colour = C.colour_of_rgba(*(int(v) for v in rng.integers(0, 256, 3)), 255)
        alpha = 255 if k % 2 else int(rng.integers(60, 256))  # opaque + translucent
        fill = rfills.plain(C.dissolve(colour, delta=alpha) if alpha != 255 else colour)
        path = gpath.path_of_pointlist(gpath.NONZERO, pts)
        objs.append(R.Obj(R.ident.new_ids(), R.Basic(fill, R.PathShape(path)), (), R.OVER))

    ts = TiledScene(W, H)
    build_tiled_scene(ts, [(i, o) for i, o in enumerate(objs)])
    order = list(range(len(objs)))
    starts, idxs = ts.build_lists(order)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    a = np.asarray(ts.render(bg, starts, idxs))
    b = np.asarray(ts.render_runs(bg, starts, idxs))
    assert (a == b).all()


def test_reset_invalidates_banded_atlas_cache():
    """reset() must drop the cached BandedAtlas: the fresh PieceMap's
    version restarts at 0, so a same-assignment-count rebuild (the
    interactive-zoom case reset() exists for) would otherwise collide
    with the old cache's version and serve the PREVIOUS scene's sharded
    atlas."""
    import jax
    from jax.sharding import Mesh

    W, H = TILE_W, TILE_H * 2
    ts, order = _mk_scene(W, H, 3)
    mesh = Mesh(np.array(jax.devices()[:2]), ("band",))
    b1 = TS._banded_of(ts, mesh)
    assert TS._banded_of(ts, mesh) is b1  # cache hit while unchanged

    ts.reset()
    # Rebuild with the SAME number of piece-list assignments.
    for k in range(3):
        spr = region.fillshape(
            shape_of_box((5 + k, 5, 24 + k, 24)), rfills.plain(C.steelblue)
        )
        ts.add_object(("new", k), spr)
    assert ts.pieces.version > 0
    b2 = TS._banded_of(ts, mesh)
    assert b2 is not b1, "reset() left a stale BandedAtlas in the cache"


def test_sharded_reset_scene_matches_fresh():
    """reset_scene under a LIVE mesh (the zoom path multi-chip): after an
    in-place whole-scene swap, the sharded render must equal a fresh
    unsharded view of the new scene — this is the end-to-end surface of
    the stale-BandedAtlas-after-reset bug (the banded cache must rebuild
    for the new scene's pieces, not serve the old scene's)."""
    from coherence_tpu import ident
    from coherence_tpu.geometry import shapes as gshapes
    from coherence_tpu.parallel import make_mesh
    from coherence_tpu.scene import render as R
    from coherence_tpu.scene.fastframe import DeviceView

    W, H = TILE_W * 2, TILE_H * 8

    def scene_a():
        return [
            R.Obj(
                ident.new_ids(),
                R.Basic(
                    rfills.plain(C.dissolve(C.crimson, delta=170)),
                    R.PathShape(gshapes.circle(60.0, 80.0, 25.0)),
                ),
                (),
                R.OVER,
            ),
            R.Obj(
                ident.new_ids(),
                R.Basic(rfills.plain(C.steelblue), R.rectangle(20.0, 40.0, 150.0, 300.0)),
                (),
                R.OVER,
            ),
        ]

    def scene_b():
        # Same OBJECT COUNT as scene_a (the version-collision case).
        return [
            R.Obj(
                ident.new_ids(),
                R.Basic(
                    rfills.plain(C.dissolve(C.darkorange, delta=200)),
                    R.PathShape(gshapes.circle(120.0, 300.0, 40.0)),
                ),
                (),
                R.OVER,
            ),
            R.Obj(
                ident.new_ids(),
                R.Basic(rfills.plain(C.wheat), R.rectangle(40.0, 100.0, 120.0, 200.0)),
                (),
                R.OVER,
            ),
        ]

    v = DeviceView(W, H)
    v.set_scene(scene_a())
    v.use_mesh(make_mesh(8), interpret=True)
    v.render(full=True)

    v.reset_scene(scene_b())
    v.render(full=True)
    got = v.read()

    fresh = DeviceView(W, H)
    fresh.set_scene(scene_b())
    fresh.render(full=True)
    assert np.array_equal(got, fresh.read())


def test_render_full_matches_render():
    """The gather-free atlas kernel must be pixel-identical to the
    per-piece kernel: random overlapping polygons (translucent + opaque),
    empty tiles (background passthrough), and tile depths straddling the
    _PP_TRIP switch boundaries."""
    import coherence_tpu.colour as C
    from coherence_tpu.raster import fills as rfills
    from coherence_tpu.raster.tiled_scene import TiledScene
    from coherence_tpu.scene import render as R
    from coherence_tpu.scene.fastframe import build_tiled_scene
    from coherence_tpu.geometry import path as gpath

    W, H = 512, 256
    rng = np.random.default_rng(23)
    objs = []
    for k in range(14):
        n = int(rng.integers(3, 6))
        pts = [
            (float(rng.uniform(-40, W + 40)), float(rng.uniform(-40, H + 40)))
            for _ in range(n)
        ]
        colour = C.colour_of_rgba(*(int(v) for v in rng.integers(0, 256, 3)), 255)
        alpha = 255 if k % 2 else int(rng.integers(60, 256))
        fill = rfills.plain(C.dissolve(colour, delta=alpha) if alpha != 255 else colour)
        path = gpath.path_of_pointlist(gpath.NONZERO, pts)
        objs.append(R.Obj(R.ident.new_ids(), R.Basic(fill, R.PathShape(path)), (), R.OVER))

    ts = TiledScene(W, H)
    build_tiled_scene(ts, [(i, o) for i, o in enumerate(objs)])
    order = list(range(len(objs)))
    starts, idxs = ts.build_lists(order)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    a = np.asarray(ts.render(bg, starts, idxs))
    b = np.asarray(ts.render_full(bg, starts, idxs))
    assert (a == b).all()


def test_render_full_deep_stack_pipeline():
    """A single tile stacking more pieces than _PP_AHEAD exercises the
    modular slot-reuse pipeline (wait -> composite -> reissue into the
    same slot) across several while trips; neighbouring empty tiles check
    the cross-tile chaining."""
    from coherence_tpu.raster import region as rregion
    from coherence_tpu.raster.tiled_scene import TiledScene, _PP_AHEAD

    W, H = TILE_W * 3, TILE_H
    ts = TiledScene(W, H)
    order = []
    depth = _PP_AHEAD + 5  # > lookahead, not a multiple of the trip size
    for k in range(depth):
        x0 = TILE_W + 1 + 2 * k
        col = C.dissolve(
            C.colour_of_rgba(int(40 + k * 7) % 256, 120, 200, 255), delta=140
        )
        spr = rregion.fillshape(
            shape_of_box((x0, 1 + k, x0 + 30, 1 + k + 30)), rfills.plain(col)
        )
        ts.add_object(k, spr)
        order.append(k)
    starts, idxs = ts.build_lists(order)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    a = np.asarray(ts.render(bg, starts, idxs))
    b = np.asarray(ts.render_full(bg, starts, idxs))
    assert (a == b).all()


def _mk_sprite(x0, y0, w, h, col=None, alpha=200):
    col = C.dissolve(C.steelblue, delta=alpha) if col is None else col
    return region.fillshape(
        shape_of_box((x0, y0, x0 + w - 1, y0 + h - 1)), rfills.plain(col)
    )


def test_slot_recycling_bounds_atlas_under_translate_churn():
    """A non-animated object replaced (translated) many times must recycle
    its atlas slots: capacity stays bounded and the final frame equals a
    fresh single-build of the same end state."""
    W, H = TILE_W * 3, TILE_H * 3
    ts = TS.TiledScene(W, H)
    ts.add_object("bg", _mk_sprite(1, 1, W, H, col=C.darkolivegreen, alpha=255))
    spr = _mk_sprite(10, 10, 90, 50)
    ts.add_object("mover", spr)
    cap0 = int(ts.atlas().shape[0])
    for step in range(40):
        dx = 3 if step % 2 == 0 else -2
        spr = region.translate_sprite(dx, 1, spr)
        ts.add_object("mover", spr)
    assert int(ts.atlas().shape[0]) == cap0, "atlas grew under churn"
    fresh = TS.TiledScene(W, H)
    fresh.add_object("bg", _mk_sprite(1, 1, W, H, col=C.darkolivegreen, alpha=255))
    fresh.add_object("mover", spr)
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    order = ["mover", "bg"]
    a = np.asarray(ts.render(bg, *ts.build_lists(order)))
    b = np.asarray(fresh.render(bg, *fresh.build_lists(order)))
    assert np.array_equal(a, b)


def test_remove_object_frees_slots_and_matches_rebuild():
    """remove_object returns slots to the pool; a subsequent add reuses
    them (no growth) and rendering matches a scene never containing the
    removed object."""
    W, H = TILE_W * 3, TILE_H * 3
    ts = TS.TiledScene(W, H)
    ts.add_object("a", _mk_sprite(5, 5, 60, 40))
    ts.add_object("victim", _mk_sprite(70, 30, 120, 80, col=C.crimson, alpha=255))
    ts.add_object("b", _mk_sprite(200, 100, 50, 50, col=C.gold, alpha=255))
    cap0 = int(ts.atlas().shape[0])
    n0 = ts._n_pieces
    ts.remove_object("victim")
    assert "victim" not in ts.pieces
    assert sum(ln for _, ln in ts._free_runs) > 0
    # Re-add an object of the same footprint: exact-fit reuse, no append.
    ts.add_object("victim2", _mk_sprite(70, 30, 120, 80, col=C.teal, alpha=255))
    assert ts._n_pieces == n0
    assert int(ts.atlas().shape[0]) == cap0

    fresh = TS.TiledScene(W, H)
    fresh.add_object("a", _mk_sprite(5, 5, 60, 40))
    fresh.add_object("victim2", _mk_sprite(70, 30, 120, 80, col=C.teal, alpha=255))
    fresh.add_object("b", _mk_sprite(200, 100, 50, 50, col=C.gold, alpha=255))
    bg = pack_rgba(jnp.asarray(np.full((H, W, 4), 255), jnp.int32))
    order = ["a", "victim2", "b"]
    a = np.asarray(ts.render(bg, *ts.build_lists(order)))
    b = np.asarray(fresh.render(bg, *fresh.build_lists(order)))
    assert np.array_equal(a, b)


def test_remove_reserved_object_frees_run():
    W, H = TILE_W * 2, TILE_H * 2
    ts = TS.TiledScene(W, H)
    ts.reserve_slots("anim", 6)
    ts.update_object_inplace("anim", _mk_sprite(20, 20, 30, 30))
    assert ts.pieces["anim"]
    ts.remove_object("anim")
    assert "anim" not in ts._reserved
    assert sum(ln for _, ln in ts._free_runs) >= 6


def test_free_alloc_run_bookkeeping_fuzz():
    """Pure host fuzz of the run allocator: allocations never overlap live
    allocations, the free list stays sorted/disjoint/coalesced, and
    double-free asserts."""
    rng = np.random.default_rng(7)
    ts = TS.TiledScene(TILE_W, TILE_H)
    ts._ensure(0)
    live = {}  # tag -> (base, k)
    for step in range(300):
        if live and rng.random() < 0.45:
            tag = list(live)[int(rng.integers(0, len(live)))]
            base, k = live.pop(tag)
            ts._free_entries([(0, base + j) for j in range(k)])
        else:
            k = int(rng.integers(1, 9))
            base = ts._alloc(k)
            span = set(range(base, base + k))
            for b2, k2 in live.values():
                assert not span & set(range(b2, b2 + k2)), "overlapping alloc"
            live[f"t{step}"] = (base, k)
        # free-list invariants
        prev_end = -1
        for start, ln in ts._free_runs:
            assert ln > 0 and start > prev_end, "unsorted/overlapping free runs"
            assert start + ln <= ts._n_pieces
            prev_end = start + ln  # abutting runs must have coalesced
        for start, ln in ts._free_runs:
            for b2, k2 in live.values():
                assert not (set(range(start, start + ln)) & set(range(b2, b2 + k2)))
    # double-free detection
    base = ts._alloc(3)
    ts._free_entries([(0, base + j) for j in range(3)])
    with pytest.raises(AssertionError):
        ts._free_entries([(0, base)])
