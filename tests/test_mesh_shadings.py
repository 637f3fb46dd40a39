"""Mesh shadings (PDF types 4-7) — BEYOND REFERENCE: camlpdf parses these
stream types but the reference drops all shadings at render time; here
they reduce to Gouraud triangles (io/pdfgraphics.py: _parse_mesh) and
rasterize on the host into an ImageFill (scene/pdfscene.py: fill_of_mesh)."""

import struct

import numpy as np

from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, Stream, mkpage
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, pdfscene, render as R


def _bits(pairs) -> bytes:
    acc = nb = 0
    out = bytearray()
    for v, w in pairs:
        acc = (acc << w) | (int(v) & ((1 << w) - 1))
        nb += w
        while nb >= 8:
            nb -= 8
            out.append((acc >> nb) & 0xFF)
    if nb:
        out.append((acc << (8 - nb)) & 0xFF)
    return bytes(out)


def _c16(v, lo=0.0, hi=120.0):
    return round((v - lo) / (hi - lo) * 65535)


def _c8(v):
    return round(v * 255)


_DECODE = [0, 120, 0, 120, 0, 1, 0, 1, 0, 1]


def _mesh_stream(st, data, extra=None):
    d = {
        "ShadingType": st,
        "ColorSpace": Name("DeviceRGB"),
        "BitsPerCoordinate": 16,
        "BitsPerComponent": 8,
        "Decode": list(_DECODE),
    }
    if st in (4, 6, 7):
        d["BitsPerFlag"] = 8
    if extra:
        d.update(extra)
    return Stream(d, data)


def _v4(flag, x, y, r, g, b):
    return [(flag, 8), (_c16(x), 16), (_c16(y), 16), (_c8(r), 8), (_c8(g), 8), (_c8(b), 8)]


def _page_dict(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def _render_sh(stream, box=(1, 1, 120, 120)):
    pdf = mkpage(b"/Sh0 sh", mediabox=(0, 0, 120, 120),
                 resources={"Shading": {"Sh0": stream}})
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    assert scene, "mesh shading produced scene objects"
    spr = R.render_simple_scene(scene, region.shape_of_box(box))
    assert spr is not None
    return spr


def _at(spr, x, y):
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    iy, ix = y - y0, x - x0
    if 0 <= iy < r4.shape[0] and 0 <= ix < r4.shape[1]:
        return r4[iy, ix]
    return np.zeros(4, np.int64)


def test_type4_parse():
    data = _bits(
        _v4(0, 0, 0, 1, 0, 0) + _v4(0, 100, 0, 0, 1, 0) + _v4(0, 50, 100, 0, 0, 1)
    )
    st = _mesh_stream(4, data)
    sh = PG.read_shading(
        type("P", (), {"resolve": staticmethod(lambda o: o)})(), PG._ID, {}, st
    )
    k = sh.kind
    assert isinstance(k, PG.MeshShadingK) and k.shading_type == 4
    assert len(k.triangles) == 1
    p0, p1, p2, c0, c1, c2 = k.triangles[0]
    assert abs(p0[0]) < 0.01 and abs(p1[0] - 100) < 0.01 and abs(p2[1] - 100) < 0.01
    assert c0[0] > 0.99 and c1[1] > 0.99 and c2[2] > 0.99


def test_type4_gouraud_render():
    cache.clear()
    data = _bits(
        _v4(0, 10, 10, 1, 0, 0) + _v4(0, 110, 10, 0, 1, 0) + _v4(0, 60, 110, 0, 0, 1)
    )
    spr = _render_sh(_mesh_stream(4, data))
    near_a = _at(spr, 15, 13)
    assert near_a[3] > 200 and near_a[0] > 180 and near_a[1] < 80, near_a
    near_b = _at(spr, 105, 13)
    assert near_b[1] > 180 and near_b[0] < 80, near_b
    near_c = _at(spr, 60, 105)
    assert near_c[2] > 180, near_c
    centre = _at(spr, 60, 45)
    assert centre[3] > 200 and all(40 < centre[i] < 140 for i in range(3)), centre
    # Outside the triangle (inside the bbox quad): transparent texture.
    assert _at(spr, 14, 100)[3] < 40
    cache.clear()


def test_type4_edge_flags_strip():
    # Triangle strip: flag 1 shares (vb, vc).
    data = _bits(
        _v4(0, 0, 0, 1, 0, 0)
        + _v4(0, 50, 0, 0, 1, 0)
        + _v4(0, 0, 50, 0, 0, 1)
        + _v4(1, 50, 50, 1, 1, 0)
    )
    st = _mesh_stream(4, data)
    sh = PG.read_shading(
        type("P", (), {"resolve": staticmethod(lambda o: o)})(), PG._ID, {}, st
    )
    assert len(sh.kind.triangles) == 2
    t2 = sh.kind.triangles[1]
    assert abs(t2[2][0] - 50) < 0.01 and abs(t2[2][1] - 50) < 0.01


def test_type5_lattice_render():
    cache.clear()
    # 2x2 lattice: red/green top row (y=110), blue/white bottom (y=10).
    row = lambda y, c1, c2: (
        [(_c16(10), 16), (_c16(y), 16)] + [(_c8(v), 8) for v in c1]
        + [(_c16(110), 16), (_c16(y), 16)] + [(_c8(v), 8) for v in c2]
    )
    data = _bits(row(110, (1, 0, 0), (0, 1, 0)) + row(10, (0, 0, 1), (1, 1, 1)))
    spr = _render_sh(_mesh_stream(5, data, {"VerticesPerRow": 2}))
    assert _at(spr, 14, 106)[0] > 180  # red corner
    assert _at(spr, 106, 106)[1] > 180  # green corner
    assert _at(spr, 14, 14)[2] > 180  # blue corner
    w = _at(spr, 106, 14)
    assert all(w[i] > 180 for i in range(3))  # white corner
    cache.clear()


def _coons_points(ax, ay, w):
    """12 boundary points of a flat square patch, thirds-spaced."""
    A = (ax, ay)
    B = (ax, ay + w)
    C = (ax + w, ay + w)
    D = (ax + w, ay)
    t = w / 3.0
    return [
        A, (ax, ay + t), (ax, ay + 2 * t), B,
        (ax + t, ay + w), (ax + 2 * t, ay + w), C,
        (ax + w, ay + 2 * t), (ax + w, ay + t), D,
        (ax + 2 * t, ay), (ax + t, ay),
    ]


def test_type6_coons_render():
    cache.clear()
    pts = _coons_points(10, 10, 100)
    cols = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1)]  # c1@A c2@B c3@C c4@D
    pairs = [(0, 8)]
    for (x, y) in pts:
        pairs += [(_c16(x), 16), (_c16(y), 16)]
    for c in cols:
        pairs += [(_c8(v), 8) for v in c]
    spr = _render_sh(_mesh_stream(6, _bits(pairs)))
    assert _at(spr, 14, 14)[0] > 180  # A red
    assert _at(spr, 14, 106)[1] > 180  # B green
    assert _at(spr, 106, 106)[2] > 180  # C blue
    wpx = _at(spr, 106, 14)
    assert all(wpx[i] > 180 for i in range(3))  # D white
    mid = _at(spr, 60, 60)
    assert mid[3] > 200 and all(40 < mid[i] < 160 for i in range(3)), mid
    cache.clear()


def test_mesh_with_function_colours():
    cache.clear()
    # Single parametric t through a Type 2 function black->red.
    fn = {
        "FunctionType": 2, "Domain": [0.0, 1.0],
        "C0": [0.0, 0.0, 0.0], "C1": [1.0, 0.0, 0.0], "N": 1,
    }
    decode = [0, 120, 0, 120, 0, 1]
    v = lambda flag, x, y, t: [
        (flag, 8), (_c16(x), 16), (_c16(y), 16), (_c8(t), 8)
    ]
    data = _bits(v(0, 10, 10, 0) + v(0, 110, 10, 1) + v(0, 60, 110, 1))
    st = _mesh_stream(4, data, {"Decode": decode, "Function": fn})
    spr = _render_sh(st)
    dark = _at(spr, 16, 14)
    bright = _at(spr, 104, 13)
    assert dark[3] > 200 and dark[0] < 60, dark
    assert bright[0] > 180, bright
    cache.clear()

def test_type7_tensor_render():
    cache.clear()
    # Flat tensor patch: boundary like the Coons square plus the four
    # interior points at their bilinear (thirds-grid) positions.
    ax, ay, w = 10, 10, 100
    t = w / 3.0
    pts = _coons_points(ax, ay, w) + [
        (ax + t, ay + t), (ax + t, ay + 2 * t),
        (ax + 2 * t, ay + 2 * t), (ax + 2 * t, ay + t),
    ]
    cols = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 1)]
    pairs = [(0, 8)]
    for (x, y) in pts:
        pairs += [(_c16(x), 16), (_c16(y), 16)]
    for c in cols:
        pairs += [(_c8(v), 8) for v in c]
    spr = _render_sh(_mesh_stream(7, _bits(pairs)))
    assert _at(spr, 14, 14)[0] > 180
    assert _at(spr, 14, 106)[1] > 180
    assert _at(spr, 106, 106)[2] > 180
    assert all(_at(spr, 106, 14)[i] > 180 for i in range(3))
    cache.clear()


def test_mesh_as_pattern_fill():
    cache.clear()
    # Pattern colourspace scn fill of a path with a mesh shading pattern.
    data = _bits(
        _v4(0, 0, 0, 1, 0, 0) + _v4(0, 120, 0, 0, 1, 0) + _v4(0, 60, 120, 0, 0, 1)
    )
    pat = {
        "PatternType": 2,
        "Shading": _mesh_stream(4, data),
    }
    content = b"/Pattern cs /P0 scn 20 20 80 40 re f"
    pdf = mkpage(content, mediabox=(0, 0, 120, 120),
                 resources={"Pattern": {"P0": pat}})
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 120, 120)))
    # Inside the rect: Gouraud colours (left reddish, right greenish).
    left = _at(spr, 30, 40)
    right = _at(spr, 90, 40)
    assert left[3] > 200 and left[0] > right[0], (left, right)
    assert right[1] > left[1], (left, right)
    # Outside the rect: nothing.
    assert _at(spr, 60, 80)[3] < 30
    cache.clear()

def test_mesh_writer_roundtrip():
    """page_of_graphic re-serializes a mesh as a type-4 stream that reads
    back to the same triangles."""
    from coherence_tpu.io.pdf import pdf_of_bytes, pdf_to_bytes

    data = _bits(
        _v4(0, 10, 10, 1, 0, 0) + _v4(0, 110, 10, 0, 1, 0) + _v4(0, 60, 110, 0, 0, 1)
    )
    pdf = mkpage(b"/Sh0 sh", mediabox=(0, 0, 120, 120),
                 resources={"Shading": {"Sh0": _mesh_stream(4, data)}})
    g = PG.graphic_of_page(pdf, _page_dict(pdf))
    sh_el = [e for e in g.elements if isinstance(e, PG.GShading)][0]
    assert isinstance(sh_el.shading.kind, PG.MeshShadingK)
    pdf2 = PG.page_of_graphic(g, mediabox=(0, 0, 120, 120))
    pdf3 = pdf_of_bytes(pdf_to_bytes(pdf2))
    g2 = PG.graphic_of_page(pdf3, _page_dict(pdf3))
    sh2 = [e for e in g2.elements if isinstance(e, PG.GShading)][0]
    k2 = sh2.shading.kind
    assert isinstance(k2, PG.MeshShadingK) and len(k2.triangles) == 1
    (p0, p1, p2, c0, c1, c2) = k2.triangles[0]
    ref = sh_el.shading.kind.triangles[0]
    for got, want in zip((p0, p1, p2), ref[:3]):
        assert abs(got[0] - want[0]) < 0.01 and abs(got[1] - want[1]) < 0.01
    for got, want in zip((c0, c1, c2), ref[3:]):
        assert all(abs(a - b) < 0.01 for a, b in zip(got, want))
