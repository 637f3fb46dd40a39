"""PDF graphic -> scene conversion (parity: render.ml:1476-1565).

Each path element becomes a filled object (nonzero/even-odd path) and/or a
stroked object with the PDF cap/join/linewidth; CMYK/Gray collapse to RGB
exactly as the reference's ``rgb_of_cmyk`` (render.ml:1476-1479)."""

from __future__ import annotations

from .. import colour as C
from .. import ident
from ..geometry import shapes as gshapes
from ..io import pdfgraphics as PG
from ..raster import fills as rfills
from . import render as R


def rgb_of_cmyk(c, m, y, k):
    return (
        1.0 - min(1.0, c * (1.0 - k) + k),
        1.0 - min(1.0, m * (1.0 - k) + k),
        1.0 - min(1.0, y * (1.0 - k) + k),
    )


def fill_of_pdf_colour(vals, transparency: float, colourspace: str) -> rfills.Fill:
    t = int(transparency * 255.0)
    if colourspace == PG.DEVICE_RGB and len(vals) == 3:
        r, g, b = vals
    elif colourspace == PG.DEVICE_CMYK and len(vals) == 4:
        r, g, b = rgb_of_cmyk(*vals)
    elif colourspace == PG.DEVICE_GRAY and len(vals) == 1:
        r = g = b = vals[0]
    else:
        return rfills.plain(C.red)  # colourspace mismatch fallback
    col = C.dissolve(C.colour_of_rgba_float(r, g, b, 1.0), delta=t)
    return rfills.plain(col)


def cap_of_pdfcap(c: int) -> str:
    return {0: gshapes.ButtCap, 1: gshapes.RoundCap, 2: gshapes.ProjectingCap}[c]


def join_of_pdfjoin(j: int) -> str:
    return {0: gshapes.MitredJoin, 1: gshapes.RoundJoin, 2: gshapes.BevelJoin}[j]


def scene_of_graphic(pdf, graphic: PG.Graphic):
    """Front-to-back scene from a graphic's elements (render.ml:1524-1565).

    Note the reference prepends line-then-fill per element and concatenates in
    element order; callers reverse for bottom-up stacking (examples.ml:163)."""

    def convert(elements):
        out = []
        for el in elements:
            if isinstance(el, PG.GPath):
                a = el.attributes
                if a.path_line is not None:
                    cs, vals = a.path_line
                    fill = fill_of_pdf_colour(
                        vals, a.path_transparency.line_transparency, cs
                    )
                    spec = gshapes.StrokeSpec(
                        startcap=cap_of_pdfcap(a.path_capstyle),
                        join=join_of_pdfjoin(a.path_joinstyle),
                        endcap=cap_of_pdfcap(a.path_capstyle),
                        mitrelimit=a.path_mitrelimit,
                        linewidth=a.path_linewidth,
                    )
                    out.append(
                        R.Obj(
                            ident.new_ids(),
                            R.Basic(fill, R.StrokedPathShape(el.path, spec)),
                            (),
                            R.OVER,
                        )
                    )
                if a.path_fill is not None:
                    cs, vals = a.path_fill
                    fill = fill_of_pdf_colour(
                        vals, a.path_transparency.fill_transparency, cs
                    )
                    out.append(
                        R.Obj(
                            ident.new_ids(),
                            R.Basic(fill, R.PathShape(el.path)),
                            (),
                            R.OVER,
                        )
                    )
            elif isinstance(el, (PG.MCSection, PG.MCSectionProperties, PG.Clip)):
                out.extend(convert(el.elements))
        return out

    return convert(graphic.elements)
