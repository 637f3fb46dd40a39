"""PDF content stream -> structured graphic (parity: vendored
``pdfgraphics.ml``: ``graphic_of_page`` and the ``process_op`` state
machine, plus the inverse ``page_of_graphic``).

Only the parts consumed by the renderer's ``scene_of_graphic``
(render.ml:1524-1565) are produced: path elements with fill/stroke colour,
winding rule, line caps/joins/width, and transparency; marked-content
sections and clips are passed through structurally; text and images are
skipped (the bundled scene assets store their text as outlined paths).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from ..geometry import path as gpath
from .pdf import Name, Pdf, Ref, Stream, _Lexer, _NUM_RE, _Parser, mkpage

# Colour spaces (Pdfspace parity — only the device spaces + ICC alternate).
DEVICE_RGB = "DeviceRGB"
DEVICE_CMYK = "DeviceCMYK"
DEVICE_GRAY = "DeviceGray"


@dataclass
class Transparency:
    fill_transparency: float = 1.0
    line_transparency: float = 1.0


@dataclass
class PathAttributes:
    """pdfgraphics.mli path attribute record (subset)."""

    path_fill: Optional[Tuple[str, List[float]]] = None
    path_line: Optional[Tuple[str, List[float]]] = None
    path_linewidth: float = 1.0
    path_capstyle: int = 0
    path_joinstyle: int = 0
    path_mitrelimit: float = 10.0
    path_transparency: Transparency = field(default_factory=Transparency)


@dataclass
class GPath:
    path: gpath.Path
    attributes: PathAttributes


@dataclass
class MCSection:
    name: str
    elements: list


@dataclass
class Clip:
    path: gpath.Path
    elements: list


@dataclass
class Graphic:
    elements: list
    resources: dict = field(default_factory=dict)


Matrix = Tuple[float, float, float, float, float, float]
_ID: Matrix = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(m: Matrix, n: Matrix) -> Matrix:
    a, b, c, d, e, f = m
    a2, b2, c2, d2, e2, f2 = n
    return (
        a2 * a + b2 * c,
        a2 * b + b2 * d,
        c2 * a + d2 * c,
        c2 * b + d2 * d,
        e2 * a + f2 * c + e,
        e2 * b + f2 * d + f,
    )


def _apply(m: Matrix, p):
    a, b, c, d, e, f = m
    x, y = p
    return (a * x + c * y + e, b * x + d * y + f)


@dataclass
class _GState:
    ctm: Matrix = _ID
    fill: Optional[Tuple[str, List[float]]] = (DEVICE_GRAY, [0.0])
    stroke: Optional[Tuple[str, List[float]]] = (DEVICE_GRAY, [0.0])
    linewidth: float = 1.0
    cap: int = 0
    join: int = 0
    mitre: float = 10.0
    ca: float = 1.0  # fill alpha
    CA: float = 1.0  # stroke alpha


def _tokenize(content: bytes):
    """Content stream token/operand stream."""
    lex = _Lexer(content)
    while True:
        save = lex.p
        tok = lex.next_token()
        if not tok:
            return
        yield tok, save


def graphic_of_page(pdf: Pdf, page: dict) -> Graphic:
    """Interpret a page's content streams (pdfgraphics.ml:1229)."""
    content = pdf.page_content(page)
    resources = pdf.resolve(page.get("Resources")) or {}
    elements = _process(pdf, content, resources, _GState())
    return Graphic(elements, resources)


def _scale_of(m: Matrix) -> float:
    a, b, c, d, _, _ = m
    det = abs(a * d - b * c)
    return math.sqrt(det)


def _process(pdf: Pdf, content: bytes, resources: dict, gs: _GState) -> list:
    elements: List[object] = []
    stack: List[object] = []  # operand stack
    gstack: List[_GState] = []
    subpaths: List[list] = []  # list of segment lists (float, post-CTM)
    current: List[object] = []
    start: Optional[Tuple[float, float]] = None
    cur: Optional[Tuple[float, float]] = None
    clip_pending = False

    import copy

    def num(v):
        return float(v)

    def moveto(p):
        nonlocal start, cur, current
        if current:
            subpaths.append(current)
        current = []
        start = cur2 = _apply(gs.ctm, p)
        cur = cur2

    def lineto(p):
        nonlocal cur
        q = _apply(gs.ctm, p)
        if cur is not None:
            current.append(gpath.Straight(cur, q))
        cur = q

    def curveto(p1, p2, p3):
        nonlocal cur
        q1, q2, q3 = _apply(gs.ctm, p1), _apply(gs.ctm, p2), _apply(gs.ctm, p3)
        current.append(gpath.Bezier(cur, q1, q2, q3))
        cur = q3

    def closepath():
        nonlocal cur
        if cur is not None and start is not None and cur != start:
            current.append(gpath.Straight(cur, start))
        cur = start

    def finish_path(winding) -> Optional[gpath.Path]:
        nonlocal subpaths, current, start, cur
        if current:
            subpaths.append(current)
        sps = [
            gpath.Subpath(False, True, tuple(s)) for s in subpaths if s
        ]
        subpaths, current, start, cur = [], [], None, None
        if not sps:
            return None
        return gpath.Path(winding, tuple(sps))

    def emit(path_fill, path_line, winding):
        nonlocal clip_pending
        p = finish_path(winding)
        if p is None:
            clip_pending = False
            return
        if path_fill or path_line:
            attrs = PathAttributes(
                path_fill=gs.fill if path_fill else None,
                path_line=gs.stroke if path_line else None,
                path_linewidth=gs.linewidth * _scale_of(gs.ctm),
                path_capstyle=gs.cap,
                path_joinstyle=gs.join,
                path_mitrelimit=gs.mitre,
                path_transparency=Transparency(gs.ca, gs.CA),
            )
            elements.append(GPath(p, attrs))
        if clip_pending:
            # Structural pass-through: subsequent elements are appended at
            # top level (full clip support is handled by the scene layer).
            clip_pending = False

    def resolve_cs(name_or_obj, resources):
        if isinstance(name_or_obj, Name):
            n = name_or_obj.v
            if n in (DEVICE_RGB, DEVICE_CMYK, DEVICE_GRAY):
                return n
            csd = pdf.resolve(resources.get("ColorSpace", {})) if resources else {}
            cs = pdf.resolve(csd.get(n)) if isinstance(csd, dict) else None
            if isinstance(cs, list) and cs and isinstance(cs[0], Name):
                if cs[0].v == "ICCBased" and len(cs) > 1:
                    icc = pdf.resolve(cs[1])
                    n_comp = pdf.resolve(icc.dict.get("N", 3)) if isinstance(icc, Stream) else 3
                    return {1: DEVICE_GRAY, 3: DEVICE_RGB, 4: DEVICE_CMYK}.get(n_comp, DEVICE_RGB)
                if cs[0].v in (DEVICE_RGB, DEVICE_CMYK, DEVICE_GRAY):
                    return cs[0].v
            return DEVICE_RGB
        return DEVICE_RGB

    fill_cs = DEVICE_GRAY
    stroke_cs = DEVICE_GRAY

    lex = _Lexer(content)
    while True:
        tok = lex.next_token()
        if not tok:
            break
        if tok in (b"<<",):
            lex.p -= 2
            p = _Parser(b"", 0)
            p.lex = lex
            stack.append(p._obj(lex.next_token()))
            continue
        if tok == b"[":
            p = _Parser(b"", 0)
            p.lex = lex
            stack.append(p._obj(tok))
            continue
        if tok.startswith(b"/"):
            stack.append(Name(tok[1:].decode("latin1")))
            continue
        if tok.startswith(b"(") or (tok.startswith(b"<") and not tok == b"<<"):
            stack.append(tok)
            continue
        if _NUM_RE.match(tok):
            stack.append(float(tok) if b"." in tok else int(tok))
            continue
        op = tok.decode("latin1", "replace")
        try:
            if op == "q":
                gstack.append(copy.deepcopy(gs))
            elif op == "Q":
                if gstack:
                    gs = gstack.pop()
            elif op == "cm":
                f2, e2, d2, c2, b2, a2 = (num(stack.pop()) for _ in range(6))
                gs.ctm = _mat_mul(gs.ctm, (a2, b2, c2, d2, e2, f2))
            elif op == "m":
                y, x = num(stack.pop()), num(stack.pop())
                moveto((x, y))
            elif op == "l":
                y, x = num(stack.pop()), num(stack.pop())
                lineto((x, y))
            elif op == "c":
                y3, x3, y2, x2, y1, x1 = (num(stack.pop()) for _ in range(6))
                curveto((x1, y1), (x2, y2), (x3, y3))
            elif op == "v":
                y3, x3, y2, x2 = (num(stack.pop()) for _ in range(4))
                q2, q3 = _apply(gs.ctm, (x2, y2)), _apply(gs.ctm, (x3, y3))
                current.append(gpath.Bezier(cur, cur, q2, q3))
                cur = q3
            elif op == "y":
                y3, x3, y1, x1 = (num(stack.pop()) for _ in range(4))
                curveto((x1, y1), (x3, y3), (x3, y3))
            elif op == "h":
                closepath()
            elif op == "re":
                hh, ww, y, x = (num(stack.pop()) for _ in range(4))
                moveto((x, y))
                lineto((x + ww, y))
                lineto((x + ww, y + hh))
                lineto((x, y + hh))
                closepath()
            elif op in ("f", "F"):
                emit(True, False, gpath.NONZERO)
            elif op == "f*":
                emit(True, False, gpath.EVEN_ODD)
            elif op == "B":
                emit(True, True, gpath.NONZERO)
            elif op == "B*":
                emit(True, True, gpath.EVEN_ODD)
            elif op == "b":
                closepath()
                emit(True, True, gpath.NONZERO)
            elif op == "b*":
                closepath()
                emit(True, True, gpath.EVEN_ODD)
            elif op == "S":
                emit(False, True, gpath.NONZERO)
            elif op == "s":
                closepath()
                emit(False, True, gpath.NONZERO)
            elif op == "n":
                emit(False, False, gpath.NONZERO)
            elif op in ("W", "W*"):
                clip_pending = True
            elif op == "g":
                gs.fill = (DEVICE_GRAY, [num(stack.pop())])
            elif op == "G":
                gs.stroke = (DEVICE_GRAY, [num(stack.pop())])
            elif op == "rg":
                b_, g_, r_ = (num(stack.pop()) for _ in range(3))
                gs.fill = (DEVICE_RGB, [r_, g_, b_])
            elif op == "RG":
                b_, g_, r_ = (num(stack.pop()) for _ in range(3))
                gs.stroke = (DEVICE_RGB, [r_, g_, b_])
            elif op == "k":
                kk, yy, mm, cc = (num(stack.pop()) for _ in range(4))
                gs.fill = (DEVICE_CMYK, [cc, mm, yy, kk])
            elif op == "K":
                kk, yy, mm, cc = (num(stack.pop()) for _ in range(4))
                gs.stroke = (DEVICE_CMYK, [cc, mm, yy, kk])
            elif op == "cs":
                fill_cs = resolve_cs(stack.pop(), resources)
            elif op == "CS":
                stroke_cs = resolve_cs(stack.pop(), resources)
            elif op in ("sc", "scn"):
                vals = []
                while stack and isinstance(stack[-1], (int, float)):
                    vals.append(num(stack.pop()))
                vals.reverse()
                if vals:
                    gs.fill = (fill_cs, vals)
            elif op in ("SC", "SCN"):
                vals = []
                while stack and isinstance(stack[-1], (int, float)):
                    vals.append(num(stack.pop()))
                vals.reverse()
                if vals:
                    gs.stroke = (stroke_cs, vals)
            elif op == "w":
                gs.linewidth = num(stack.pop())
            elif op == "J":
                gs.cap = int(stack.pop())
            elif op == "j":
                gs.join = int(stack.pop())
            elif op == "M":
                gs.mitre = num(stack.pop())
            elif op == "gs":
                name = stack.pop()
                egs = pdf.resolve(resources.get("ExtGState", {}))
                entry = pdf.resolve(egs.get(name.v)) if isinstance(egs, dict) else None
                if isinstance(entry, dict):
                    if "ca" in entry:
                        gs.ca = float(pdf.resolve(entry["ca"]))
                    if "CA" in entry:
                        gs.CA = float(pdf.resolve(entry["CA"]))
                    if "LW" in entry:
                        gs.linewidth = float(pdf.resolve(entry["LW"]))
            elif op == "Do":
                name = stack.pop()
                xod = pdf.resolve(resources.get("XObject", {}))
                xo = pdf.resolve(xod.get(name.v)) if isinstance(xod, dict) else None
                if isinstance(xo, Stream):
                    st = pdf.resolve(xo.dict.get("Subtype"))
                    if isinstance(st, Name) and st.v == "Form":
                        sub_res = pdf.resolve(xo.dict.get("Resources")) or resources
                        sub_gs = copy.deepcopy(gs)
                        mtx = pdf.resolve(xo.dict.get("Matrix"))
                        if isinstance(mtx, list) and len(mtx) == 6:
                            sub_gs.ctm = _mat_mul(sub_gs.ctm, tuple(float(v) for v in mtx))
                        elements.extend(_process(pdf, xo.decode(), sub_res, sub_gs))
            elif op == "BMC":
                stack.pop()
            elif op == "BDC":
                stack.pop()
                stack.pop()
            elif op in ("EMC", "BT", "ET"):
                pass
            else:
                # Unhandled operator: drop its operands.
                stack.clear()
        except IndexError:
            stack.clear()
    if current:
        subpaths.append(current)
    return elements


def transform_graphic(t, graphic: Graphic) -> Graphic:
    """Transform every path in a graphic (pdfgraphics.ml transform_graphic)."""

    def walk(elements):
        out = []
        for el in elements:
            if isinstance(el, GPath):
                out.append(GPath(gpath.transform_path(list(t), el.path), el.attributes))
            elif isinstance(el, MCSection):
                out.append(MCSection(el.name, walk(el.elements)))
            elif isinstance(el, Clip):
                out.append(Clip(gpath.transform_path(list(t), el.path), walk(el.elements)))
            else:
                out.append(el)
        return out

    return Graphic(walk(graphic.elements), graphic.resources)


# ---------------------------------------------------------------------------
# Inverse: structured graphic -> PDF page (pdfgraphics.ml page_of_graphic)
# ---------------------------------------------------------------------------


def _fmt(v: float) -> str:
    s = f"{v:.4f}".rstrip("0").rstrip(".")
    return s or "0"


def page_of_graphic(graphic: Graphic, mediabox=(0, 0, 612, 792)) -> Pdf:
    """Serialize path elements back to a one-page PDF."""
    ops: List[str] = []

    def emit_path(p: gpath.Path):
        for sp in p.subpaths:
            first = True
            for seg in sp.segments:
                if isinstance(seg, gpath.Straight):
                    if first:
                        ops.append(f"{_fmt(seg.a[0])} {_fmt(seg.a[1])} m")
                        first = False
                    ops.append(f"{_fmt(seg.b[0])} {_fmt(seg.b[1])} l")
                else:
                    if first:
                        ops.append(f"{_fmt(seg.p1[0])} {_fmt(seg.p1[1])} m")
                        first = False
                    ops.append(
                        f"{_fmt(seg.p2[0])} {_fmt(seg.p2[1])} "
                        f"{_fmt(seg.p3[0])} {_fmt(seg.p3[1])} "
                        f"{_fmt(seg.p4[0])} {_fmt(seg.p4[1])} c"
                    )
            if sp.closed:
                ops.append("h")

    def walk(elements):
        for el in elements:
            if isinstance(el, GPath):
                a = el.attributes
                if a.path_line is not None:
                    ops.append(f"{_fmt(a.path_linewidth)} w")
                    ops.append(f"{a.path_capstyle} J {a.path_joinstyle} j")
                if a.path_fill is not None:
                    cs, vals = a.path_fill
                    if cs == DEVICE_RGB:
                        ops.append(" ".join(map(_fmt, vals)) + " rg")
                    elif cs == DEVICE_GRAY:
                        ops.append(f"{_fmt(vals[0])} g")
                    else:
                        ops.append(" ".join(map(_fmt, vals)) + " k")
                if a.path_line is not None:
                    cs, vals = a.path_line
                    if cs == DEVICE_RGB:
                        ops.append(" ".join(map(_fmt, vals)) + " RG")
                    elif cs == DEVICE_GRAY:
                        ops.append(f"{_fmt(vals[0])} G")
                    else:
                        ops.append(" ".join(map(_fmt, vals)) + " K")
                emit_path(el.path)
                if el.attributes.path_fill is not None and el.attributes.path_line is not None:
                    ops.append("B" if el.path.winding == gpath.NONZERO else "B*")
                elif el.attributes.path_fill is not None:
                    ops.append("f" if el.path.winding == gpath.NONZERO else "f*")
                elif el.attributes.path_line is not None:
                    ops.append("S")
                else:
                    ops.append("n")
            elif isinstance(el, (MCSection, Clip)):
                walk(el.elements)

    walk(graphic.elements)
    return mkpage("\n".join(ops).encode(), mediabox=mediabox)
