"""Demo scenes render (examples.ml parity) + golden-image regression for the
lion (BASELINE config 1: static lion scene on the CPU backend)."""

import os

import numpy as np
import pytest

import coherence_tpu.colour as C
import coherence_tpu.transform as tr
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, examples as E, pdfscene, render as R
from coherence_tpu.io import pdf as P
from coherence_tpu.io import pdfgraphics as PG

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(autouse=True)
def clear_cache():
    cache.clear()
    yield
    cache.clear()


def render_lion(size: int) -> np.ndarray:
    lion = E.smalllion()
    xmin, xmax, ymin, ymax = R.bounds_of_basicshape(lion)
    scale = size / max(xmax - xmin, ymax - ymin)
    obj = R.transform_renderobject_many(
        [
            tr.Translate(0.0, float(size)),
            tr.Scale((0.0, 0.0), 1.0, -1.0),
            tr.Scale((0.0, 0.0), scale, scale),
            tr.Translate(-xmin, -ymin),
        ],
        lion,
    )
    spr = R.render_simple_scene([obj], region.shape_of_box((1, 1, size, size)))
    canvas = region.flatten_sprite(0, spr, C.white)
    return np.asarray(canvas.rgba).astype(np.uint8)


def test_lion_golden_128():
    img = render_lion(128)
    path = os.path.join(GOLDEN_DIR, "lion128.npy")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.save(path, img)
        pytest.skip("golden created; rerun to compare")
    golden = np.load(path)
    assert np.array_equal(img, golden), (
        f"lion render changed: {int((img != golden).any(-1).sum())} pixels differ"
    )


def test_lion_render_is_deterministic():
    a = render_lion(96)
    cache.clear()
    b = render_lion(96)
    assert np.array_equal(a, b)


def test_example_objects_render():
    """Every examples.ml demo object renders without error and inks pixels."""
    makers = [
        ("cpg_example", E.cpg_example),
        ("radial_filled", E.radial_filled),
        ("wirecircle", E.wirecircle),
        ("q_shape", E.q_shape),
        ("logo", E.logo),
        ("redblob", E.redblob),
        ("blueblob", E.blueblob),
    ]
    for name, mk in makers:
        cache.clear()
        obj = mk()
        xmin, xmax, ymin, ymax = R.bounds_of_basicshape(obj)
        u = region.shape_of_box((xmin - 1, ymin - 1, xmax + 1, ymax + 1))
        spr = R.render_simple_scene([obj], u)
        assert spr is not None, name
        assert int(np.asarray(spr.rgba)[..., 3].sum()) > 0, name


def test_brush_examples_render():
    cache.clear()
    obj = E.curve()  # gold brushstroke along brushcurve.pdf
    xmin, xmax, ymin, ymax = R.bounds_of_basicshape(obj)
    u = region.shape_of_box((xmin, ymin, xmax, ymax))
    spr = R.render_simple_scene([obj], u)
    assert spr is not None
    rgba = np.asarray(spr.rgba)
    assert int(rgba[..., 3].sum()) > 0


def test_text_scene_loads_and_renders():
    cache.clear()
    obj = E.aatext()
    assert isinstance(obj.geometry, R.Group)
    assert len(obj.geometry.objects) >= 10
    xmin, xmax, ymin, ymax = R.bounds_of_basicshape(obj)
    # Render a small slice of the text.
    u = region.shape_of_box((xmin, ymin, xmin + 60, ymin + 40))
    spr = R.render_simple_scene([obj], u)
    assert spr is not None


def test_pdf_write_roundtrip():
    """page_of_graphic -> pdf bytes -> reparse -> same path count."""
    graphic, pdf = E.pdf_graphic_from_file(os.path.join(E.path, "lion.pdf"))
    n_paths = sum(1 for e in graphic.elements if isinstance(e, PG.GPath))
    out = PG.page_of_graphic(graphic)
    data = P.pdf_to_bytes(out)
    pdf2 = P.pdf_of_bytes(data)
    g2 = PG.graphic_of_page(pdf2, pdf2.pages()[0])
    n2 = sum(1 for e in g2.elements if isinstance(e, PG.GPath))
    assert n2 == n_paths
    # Bounds agree approximately.
    s1 = pdfscene.scene_of_graphic(pdf, graphic)
    s2 = pdfscene.scene_of_graphic(pdf2, g2)
    b1 = R.bounds_of_basicshape(R.mkgroup(s1))
    b2 = R.bounds_of_basicshape(R.mkgroup(s2))
    assert all(abs(x - y) <= 1 for x, y in zip(b1, b2))
