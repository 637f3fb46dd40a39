"""Coherence cache behavior (eviction, stats, chained translations), span
lists, smear, icons, graphic transform, and the mesh dry run."""

import numpy as np
import pytest

import coherence_tpu.colour as C
import coherence_tpu.transform as tr
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.raster import brush as rbrush
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, render as R


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    saved = cache.properties.cachemaxsize
    yield
    cache.properties.cachemaxsize = saved
    cache.clear()


def mkshape(n=16):
    return region.shape_of_box((0, 0, n - 1, n - 1))


def test_cache_stats_and_lookup():
    s0 = cache.cachestats.shphit
    idset = ident.new_ids()
    assert cache.getshape(idset) is None
    cache.addshape(idset, mkshape(), None)
    got = cache.getshape(idset)
    assert got is not None and got[0].box == (0, 0, 15, 15)
    assert cache.cachestats.shphit > s0


def test_cache_eviction_prefers_sprites():
    cache.properties.cachemaxsize = 400_000
    spr = region.fillshape(mkshape(64), rfills.plain(C.red))
    keep_shape = ident.new_ids()
    cache.addshape(keep_shape, mkshape(64), None)
    ids = []
    for k in range(20):
        i = ident.new_ids()
        cache.addsprite(i, spr, mkshape(64))
        ids.append(i)
    # The cache stayed within bounds by dropping sprites.
    assert cache.properties.cachesize <= cache.properties.cachemaxsize
    dropped = sum(1 for i in ids if cache.getsprite(i) is None)
    assert dropped > 0


def test_cache_chained_translation():
    base = ident.new_ids()
    spr = region.fillshape(mkshape(8), rfills.plain(C.blue))
    cache.addsprite(base, spr, mkshape(8))
    t1 = ident.new_ids()
    cache.addtranslation(t1, base, 3, 4)
    t2 = ident.new_ids()
    cache.addtranslation(t2, t1, 10, -2)
    got = cache.getsprite(t2)
    assert got is not None
    assert got[0].box == (13, 2, 20, 9)
    # Writing a sprite through a translation stores it untranslated.
    spr2 = region.translate_sprite(13, 2, spr)
    cache.addsprite(t2, spr2, region.shape_of_sprite(spr2))
    back = cache.getsprite(base)
    assert back is not None and back[0].box == (0, 0, 7, 7)


def test_cache_state_string():
    i = ident.new_ids()
    cache.addshape(i, mkshape(), None)
    s = cache.string_of_cachestate()
    assert "Maximum size" in s and "shp?" in s


def test_spanlists():
    m = np.zeros((4, 10), dtype=bool)
    m[1, 2:5] = True
    m[1, 7:9] = True
    m[2, 2:5] = True
    s = region.shape_of_mask((10, 20, 19, 23), m)
    spans = region.spanlist_of_shape(s)
    assert (12, 21, 3) in spans and (17, 21, 2) in spans and (12, 22, 3) in spans
    dspans = region.depthspanlist_of_shape(s)
    assert (12, 21, 2) in dspans  # column 12, rows 21-22
    seen = []
    region.shapespan_iter(13, 17, 21, 21, lambda x, y, l: seen.append((x, y, l)), s)
    assert (13, 21, 2) in seen and (17, 21, 1) in seen


def test_smear_runs():
    path = gshapes.circle(30.0, 30.0, 8.0)
    stroke = (rbrush.mkround(5.0, 1.0), path)
    spr = region.fillshape(region.shape_of_box((15, 15, 45, 45)), rfills.plain(C.red))
    out = rbrush.smear(spr, stroke)
    assert out is not None
    rgba = np.asarray(out.rgba)
    assert rgba[..., 3].sum() > 0


def test_icons_render():
    import os

    from coherence_tpu.scene import examples as E, icons

    canvas = icons.icon_of_pdf(os.path.join(E.path, "pointer.pdf"))
    img = np.asarray(canvas.rgba)
    assert img.shape == (32, 32, 4)
    # The glyph is inked somewhere; outside it the icon is transparent
    # (the display composites via the separate alpha plane, main.py/wx style).
    assert (img[..., 3] > 128).any()
    assert (img[..., 3] == 0).any()
    from coherence_tpu.gui.window import alpha_bytes_of_canvas, rgb_bytes_of_canvas

    assert len(rgb_bytes_of_canvas(canvas)) == 32 * 32 * 3
    assert len(alpha_bytes_of_canvas(canvas)) == 32 * 32


def test_transform_graphic():
    import os

    from coherence_tpu.io import pdf as P, pdfgraphics as PG
    from coherence_tpu.scene import examples as E

    pdf = P.pdf_of_file(os.path.join(E.path, "logo.pdf"))
    g = PG.graphic_of_page(pdf, pdf.pages()[0])
    g2 = PG.transform_graphic([tr.Translate(100.0, 50.0)], g)

    def first_path(elements):
        for e in elements:
            if isinstance(e, PG.GPath):
                return e.path
            if hasattr(e, "elements"):
                p = first_path(e.elements)
                if p is not None:
                    return p
        return None

    p1 = first_path(g.elements)
    p2 = first_path(g2.elements)
    from coherence_tpu.geometry.path import path_proper_bounds

    b1 = path_proper_bounds(p1)
    b2 = path_proper_bounds(p2)
    assert abs(b2[0] - b1[0] - 100.0) < 1e-9
    assert abs(b2[2] - b1[2] - 50.0) < 1e-9


def test_mesh_dryrun_in_suite():
    """The driver's multi-chip gate, run hermetically: the child subprocess
    must get a true n-device CPU mesh (dryrun_multichip strips the axon
    sitecustomize clobber and asserts backend+device count itself), and the
    whole thing must stay within an interactive wall-time budget — round 2's
    version silently ran a 1-device mesh on the real TPU for ~30 minutes."""
    import time

    import __graft_entry__ as G

    t0 = time.monotonic()
    G.dryrun_multichip(8)
    G.dryrun_multichip(2)
    elapsed = time.monotonic() - t0
    assert elapsed < 300.0, f"dryrun took {elapsed:.0f}s — not running on CPU?"
