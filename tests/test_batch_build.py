"""Batched scene build (fastframe.full_sprites_of_objects) is pixel-exact
against the scalar interior+AA pipeline, including fallbacks."""

import numpy as np

import coherence_tpu.colour as C
import coherence_tpu.transform as tr
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import fills as rfills
from coherence_tpu.scene import fastframe as FF
from coherence_tpu.scene import render as R


def _obj(geom, t=()):
    return R.Obj(ident.new_ids(), geom, tuple(t), R.OVER)


def test_batch_build_matches_scalar():
    spec = gshapes.StrokeSpec(
        startcap=gshapes.RoundCap,
        join=gshapes.RoundJoin,
        endcap=gshapes.ButtCap,
        mitrelimit=10.0,
        linewidth=3.0,
    )
    objs = [
        _obj(R.Basic(rfills.plain(C.red), R.PathShape(gshapes.circle(30.0, 30.0, 20.0)))),
        _obj(
            R.Basic(
                rfills.plain(C.dissolve(C.blue, delta=120)),
                R.PathShape(gshapes.rectangle(5.0, 5.0, 40.0, 25.0)),
            )
        ),
        _obj(R.Basic(rfills.plain(C.green), R.StrokedPathShape(gshapes.circle(60.0, 40.0, 15.0), spec))),
        # Fancy fill -> scalar fallback inside the batch call.
        _obj(
            R.Basic(
                rfills.gradient((0.0, 0.0), (50.0, 0.0), True, True, C.red, C.blue),
                R.PathShape(gshapes.rectangle(10.0, 10.0, 30.0, 30.0)),
            )
        ),
        # Rotated object: nonzero winding path under a transform.
        _obj(
            R.Basic(rfills.plain(C.black), R.PathShape(gshapes.circle(90.0, 90.0, 35.0))),
            [tr.Rotate((90.0, 90.0), 0.3)],
        ),
    ]
    batch = FF.full_sprites_of_objects(objs)
    for i, o in enumerate(objs):
        ref = FF.full_sprite_of_object(o)
        got = batch[i]
        assert (ref is None) == (got is None), i
        if ref is None:
            continue
        assert ref.box == got.box, (i, ref.box, got.box)
        assert np.array_equal(np.asarray(ref.mask), np.asarray(got.mask)), i
        assert np.array_equal(np.asarray(ref.rgba), np.asarray(got.rgba)), i


def test_batch_seeds_cache_like_scalar():
    """Cache entries seeded by the batch build agree with the scalar path on
    minshape NULL-ness (empty interiors must seed NULL_SHAPE)."""
    from coherence_tpu.scene import cache

    spec = gshapes.StrokeSpec(
        startcap=gshapes.ButtCap,
        join=gshapes.BevelJoin,
        endcap=gshapes.ButtCap,
        mitrelimit=10.0,
        linewidth=0.6,  # hairline: empty interior
    )
    thin = _obj(
        R.Basic(rfills.plain(C.red), R.StrokedPathShape(gshapes.circle(30.0, 30.0, 12.0), spec))
    )
    fat = _obj(R.Basic(rfills.plain(C.blue), R.PathShape(gshapes.rectangle(5.0, 5.0, 30.0, 30.0))))
    cache.clear()
    FF.full_sprites_of_objects([thin, fat])
    got_thin = cache.getshape(thin.idset)
    got_fat = cache.getshape(fat.idset)
    assert got_thin is not None and got_fat is not None
    cache.clear()
    s_thin = R.shape_of_basicshape(thin)
    s_fat = R.shape_of_basicshape(fat)
    assert (got_thin[1] is None) == (s_thin[1] is None)
    assert got_thin[1] is None  # hairline stroke has no interior
    assert (got_fat[1] is None) == (s_fat[1] is None)
    assert got_fat[1] is not None
    cache.clear()
