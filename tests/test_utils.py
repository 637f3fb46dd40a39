"""Utilities: profiling counters, debug PDFs, persistence, flags."""

import os

import numpy as np
import pytest

import coherence_tpu.colour as C
from coherence_tpu import ident
from coherence_tpu.geometry import shapes as gshapes
from coherence_tpu.io import pdf as P
from coherence_tpu.raster import fills as rfills
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, render as R
from coherence_tpu.utils import (
    add_debug_shape,
    add_debug_sprite,
    clear_debug,
    counter,
    counters,
    flags,
    load_shape,
    load_sprite,
    report,
    save_shape,
    save_sprite,
    time_block,
    write_debug_page,
    write_debug_pdf,
)
from coherence_tpu.utils import profiling


def test_counters_and_timers():
    profiling.reset()
    counter("x")
    counter("x", 2)
    with time_block("blk"):
        pass
    assert counters["x"] == 3
    assert "blk" in report()


def test_render_counters():
    profiling.reset()
    cache.clear()
    obj = R.Obj(
        ident.new_ids(),
        R.Basic(rfills.plain(C.red), R.rectangle(5, 5, 20, 20)),
        (),
        R.OVER,
    )
    R.render_simple_scene([obj], region.shape_of_box((1, 1, 40, 40)))
    assert counters["render.objects_visited"] >= 1


def test_sprite_persistence_roundtrip(tmp_path):
    spr = region.fillshape(region.shape_of_box((3, 4, 12, 13)), rfills.plain(C.green))
    p = str(tmp_path / "spr.npz")
    save_sprite(p, spr)
    back = load_sprite(p)
    assert back.box == spr.box
    assert np.array_equal(np.asarray(back.rgba), np.asarray(spr.rgba))
    p2 = str(tmp_path / "shp.npz")
    save_shape(p2, region.shape_of_sprite(spr))
    back2 = load_shape(p2)
    assert back2.box == spr.box


def test_debug_pdf_writes_parseable_pdf(tmp_path):
    clear_debug()
    spr = region.fillshape(region.shape_of_box((10, 10, 40, 30)), rfills.plain(C.blue))
    add_debug_sprite(spr)
    add_debug_shape(region.shape_of_box((50, 50, 70, 60)), dx=5)
    write_debug_page("page one")
    path = str(tmp_path / "debug.pdf")
    write_debug_pdf(path)
    pdf = P.pdf_of_file(path)
    pages = pdf.pages()
    assert len(pages) >= 1
    content = pdf.page_content(pages[0])
    assert b"Do" in content


def test_flags_registry():
    assert flags.get("cachemaxsize") > 0
    flags.set_flag("debug", True)
    assert flags.get("debug") is True
    flags.set_flag("debug", False)


def test_filter_debug_pdf(tmp_path):
    from coherence_tpu.scene import filters as F
    from coherence_tpu.scene import render as RR

    cache.clear()
    clear_debug()
    RR.pdf_filter_debug_active = True
    try:
        below = R.Obj(
            ident.new_ids(),
            R.Basic(rfills.plain(C.red), R.PathShape(gshapes.circle(30.0, 30.0, 10.0))),
            (),
            R.OVER,
        )
        mono = R.Obj(
            ident.new_ids(),
            F.monochrome(R.Basic(rfills.plain(C.white), R.rectangle(20, 20, 20, 20))),
            (),
            R.OVER,
        )
        R.render_simple_scene([mono, below], region.shape_of_box((1, 1, 60, 60)))
    finally:
        RR.pdf_filter_debug_active = False
    path = str(tmp_path / "filterdebug.pdf")
    write_debug_pdf(path)
    pdf = P.pdf_of_file(path)
    assert len(pdf.pages()) >= 1


def test_png_round_trip():
    import numpy as np

    from coherence_tpu.utils.png import png_bytes, read_png

    rng = np.random.default_rng(3)
    for shape in [(7, 5), (9, 4, 3), (6, 8, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        back = read_png(png_bytes(img))
        want = img if img.ndim != 3 or img.shape[2] != 1 else img[:, :, 0]
        assert np.array_equal(back, want)
