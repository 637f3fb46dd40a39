"""Minimal classic-PDF reader/writer.

Replaces the reference's camlpdf object layer (Pdfread/Pdfwrite/Pdf/Pdfpage)
for the subset the renderer needs: classic cross-reference tables (all of the
bundled scene assets are classic, non-ObjStm PDFs), FlateDecode streams, the
page tree with inheritable attributes, and a small writer for debug output.

Object model: Python natives —
  dict          -> PDF dictionary (keys without the leading '/')
  list          -> PDF array
  Name("X")     -> /X
  Ref(n, g)     -> indirect reference
  bytes         -> PDF string
  int/float/bool/None
  Stream(d, raw)-> stream (lazily decoded)
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union


@dataclass(frozen=True)
class Name:
    v: str

    def __repr__(self):
        return f"/{self.v}"


@dataclass(frozen=True)
class Ref:
    num: int
    gen: int = 0


class Stream:
    def __init__(self, d: dict, raw: bytes, pdf: "Pdf" = None):
        self.dict = d
        self.raw = raw
        self._pdf = pdf
        self._decoded: Optional[bytes] = None

    def decode(self) -> bytes:
        if self._decoded is None:
            filt = self.dict.get("Filter")
            data = self.raw
            filters = []
            if isinstance(filt, Name):
                filters = [filt.v]
            elif isinstance(filt, list):
                filters = [f.v for f in filt]
            for f in filters:
                if f == "FlateDecode":
                    data = zlib.decompress(data)
                elif f in ("ASCIIHexDecode",):
                    hexstr = re.sub(rb"[^0-9A-Fa-f]", b"", data.split(b">")[0])
                    if len(hexstr) % 2:
                        hexstr += b"0"
                    data = bytes.fromhex(hexstr.decode())
                else:
                    raise ValueError(f"unsupported stream filter {f}")
            self._decoded = data
        return self._decoded


PdfObj = Union[dict, list, Name, Ref, bytes, int, float, bool, None, Stream]

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def skip_ws(self):
        d, n = self.d, len(self.d)
        while self.p < n:
            c = self.d[self.p]
            if c in _WS:
                self.p += 1
            elif c == 0x25:  # '%' comment
                while self.p < n and self.d[self.p] not in b"\r\n":
                    self.p += 1
            else:
                return

    def peek_token(self) -> bytes:
        save = self.p
        t = self.next_token()
        self.p = save
        return t

    def next_token(self) -> bytes:
        self.skip_ws()
        d, n = self.d, len(self.d)
        if self.p >= n:
            return b""
        c = d[self.p]
        if c == 0x3C and self.p + 1 < n and d[self.p + 1] == 0x3C:
            self.p += 2
            return b"<<"
        if c == 0x3E and self.p + 1 < n and d[self.p + 1] == 0x3E:
            self.p += 2
            return b">>"
        if c in b"[]{}":
            self.p += 1
            return bytes([c])
        if c == 0x2F:  # name
            start = self.p
            self.p += 1
            while self.p < n and d[self.p] not in _WS and d[self.p] not in _DELIM:
                self.p += 1
            return d[start : self.p]
        if c == 0x28:  # ( string
            return self._lex_string()
        if c == 0x3C:  # <hex string
            start = self.p
            self.p = d.index(b">", self.p) + 1
            return d[start : self.p]
        start = self.p
        while self.p < n and d[self.p] not in _WS and d[self.p] not in _DELIM:
            self.p += 1
        if self.p == start:
            self.p += 1
        return d[start : self.p]

    def _lex_string(self) -> bytes:
        d, n = self.d, len(self.d)
        start = self.p
        depth = 0
        while self.p < n:
            c = d[self.p]
            if c == 0x5C:
                self.p += 2
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.p += 1
                    return d[start : self.p]
            self.p += 1
        raise ValueError("unterminated string")


_NUM_RE = re.compile(rb"^[+-]?(\d+\.?\d*|\.\d+)$")


def _unescape_string(tok: bytes) -> bytes:
    body = tok[1:-1]
    out = bytearray()
    i = 0
    esc = {b"n"[0]: 10, b"r"[0]: 13, b"t"[0]: 9, b"b"[0]: 8, b"f"[0]: 12}
    while i < len(body):
        c = body[i]
        if c == 0x5C and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt in esc:
                out.append(esc[nxt])
                i += 2
            elif 0x30 <= nxt <= 0x37:
                j = i + 1
                oct_ = 0
                while j < len(body) and j < i + 4 and 0x30 <= body[j] <= 0x37:
                    oct_ = oct_ * 8 + (body[j] - 0x30)
                    j += 1
                out.append(oct_ & 0xFF)
                i = j
            else:
                out.append(nxt)
                i += 2
        else:
            out.append(c)
            i += 1
    return bytes(out)


class _Parser:
    def __init__(self, data: bytes, pos: int = 0):
        self.lex = _Lexer(data, pos)

    def parse(self) -> PdfObj:
        tok = self.lex.next_token()
        return self._obj(tok)

    def _obj(self, tok: bytes) -> PdfObj:
        if tok == b"<<":
            d = {}
            while True:
                k = self.lex.next_token()
                if k == b">>":
                    return d
                if not k.startswith(b"/"):
                    raise ValueError(f"bad dict key {k!r}")
                d[k[1:].decode("latin1")] = self.parse()
        if tok == b"[":
            arr = []
            while True:
                t = self.lex.peek_token()
                if t == b"]":
                    self.lex.next_token()
                    return arr
                arr.append(self.parse())
        if tok.startswith(b"/"):
            return Name(tok[1:].decode("latin1"))
        if tok == b"true":
            return True
        if tok == b"false":
            return False
        if tok == b"null":
            return None
        if tok.startswith(b"("):
            return _unescape_string(tok)
        if tok.startswith(b"<"):
            hexstr = re.sub(rb"[^0-9A-Fa-f]", b"", tok[1:-1])
            if len(hexstr) % 2:
                hexstr += b"0"
            return bytes.fromhex(hexstr.decode())
        if _NUM_RE.match(tok):
            # Could be "N G R" reference.
            save = self.lex.p
            t2 = self.lex.next_token()
            if _NUM_RE.match(t2) and b"." not in tok and b"." not in t2:
                t3 = self.lex.next_token()
                if t3 == b"R":
                    return Ref(int(tok), int(t2))
            self.lex.p = save
            if b"." in tok:
                return float(tok)
            return int(tok)
        raise ValueError(f"unexpected token {tok!r}")


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class Pdf:
    """An in-memory PDF document."""

    def __init__(self, objects: Dict[int, PdfObj], trailer: dict):
        self.objects = objects
        self.trailer = trailer

    # --- resolution -------------------------------------------------------

    def resolve(self, o: PdfObj) -> PdfObj:
        seen = 0
        while isinstance(o, Ref):
            o = self.objects.get(o.num)
            seen += 1
            if seen > 64:
                raise ValueError("reference cycle")
        return o

    def get(self, d: dict, key: str, default=None) -> PdfObj:
        return self.resolve(d.get(key, default)) if isinstance(d, dict) else default

    # --- page tree --------------------------------------------------------

    def catalog(self) -> dict:
        return self.resolve(self.trailer["Root"])

    def pages(self) -> List[dict]:
        """Flattened page list with inherited attributes (Pdfpage parity)."""
        root = self.resolve(self.catalog()["Pages"])
        out: List[dict] = []
        inheritable = ("Resources", "MediaBox", "CropBox", "Rotate")

        def walk(node: dict, inherited: dict):
            node = self.resolve(node)
            inh = dict(inherited)
            for k in inheritable:
                if k in node:
                    inh[k] = node[k]
            t = self.get(node, "Type")
            if isinstance(t, Name) and t.v == "Pages" or "Kids" in node:
                for kid in self.resolve(node.get("Kids", [])):
                    walk(kid, inh)
            else:
                page = dict(node)
                for k, v in inh.items():
                    page.setdefault(k, v)
                out.append(page)

        walk(root, {})
        return out

    def page_content(self, page: dict) -> bytes:
        """Concatenated decoded content streams of a page."""
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, Stream):
            return contents.decode()
        return b"\n".join(self.resolve(c).decode() for c in contents)


def pdf_of_bytes(data: bytes) -> Pdf:
    """Parse by scanning every `N G obj` (robust to broken/linearized xref).

    Handles classic PDFs — exactly the class of the bundled scene assets.
    """
    objects: Dict[int, PdfObj] = {}
    for m in _OBJ_RE.finditer(data):
        # Reject matches inside streams by attempting a parse; later
        # definitions override earlier ones (incremental updates).
        num = int(m.group(1))
        p = _Parser(data, m.end())
        try:
            obj = p.parse()
        except Exception:
            continue
        # stream?
        lex = p.lex
        save = lex.p
        tok = lex.next_token()
        if tok == b"stream" and isinstance(obj, dict):
            q = lex.p
            if data[q : q + 2] == b"\r\n":
                q += 2
            elif data[q : q + 1] == b"\n":
                q += 1
            length = obj.get("Length")
            if isinstance(length, Ref):
                # Resolve later: find the int object inline (common case:
                # defined after the stream).  Fall back to endstream scan.
                length = None
            if isinstance(length, int):
                raw = data[q : q + length]
            else:
                end = data.find(b"endstream", q)
                raw = data[q:end]
                # Strip the trailing EOL before `endstream`.
                while raw[-1:] in (b"\r", b"\n"):
                    raw = raw[:-1]
            obj = Stream(obj, raw)
        else:
            lex.p = save
        objects[num] = obj
    # Resolve Ref lengths now that all objects are known.
    for obj in objects.values():
        if isinstance(obj, Stream):
            length = obj.dict.get("Length")
            if isinstance(length, Ref) and isinstance(objects.get(length.num), int):
                obj.raw = obj.raw[: objects[length.num]]
    # Trailer(s): scan for `trailer` dicts; merge (later wins for Root).
    trailer: dict = {}
    for m in re.finditer(rb"trailer", data):
        try:
            t = _Parser(data, m.end()).parse()
            if isinstance(t, dict):
                trailer.update(t)
        except Exception:
            pass
    if "Root" not in trailer:
        # Some linearized files only have the Root in an xref-stream dict;
        # fall back: find an object with /Type /Catalog.
        for num, obj in objects.items():
            if isinstance(obj, dict):
                t = obj.get("Type")
                if isinstance(t, Name) and t.v == "Catalog":
                    trailer["Root"] = Ref(num)
                    break
    pdf = Pdf(objects, trailer)
    for obj in objects.values():
        if isinstance(obj, Stream):
            obj._pdf = pdf
    return pdf


def pdf_of_file(path: str) -> Pdf:
    with open(path, "rb") as f:
        return pdf_of_bytes(f.read())


# ---------------------------------------------------------------------------
# Writer (for debug PDFs and page_of_graphic round-trips)
# ---------------------------------------------------------------------------


def _ser(o: PdfObj) -> bytes:
    if isinstance(o, Stream):
        d = dict(o.dict)
        d["Length"] = len(o.raw)
        return _ser(d) + b"\nstream\n" + o.raw + b"\nendstream"
    if isinstance(o, dict):
        inner = b" ".join(b"/" + k.encode("latin1") + b" " + _ser(v) for k, v in o.items())
        return b"<< " + inner + b" >>"
    if isinstance(o, list):
        return b"[ " + b" ".join(_ser(v) for v in o) + b" ]"
    if isinstance(o, Name):
        return b"/" + o.v.encode("latin1")
    if isinstance(o, Ref):
        return f"{o.num} {o.gen} R".encode()
    if isinstance(o, bool):
        return b"true" if o else b"false"
    if o is None:
        return b"null"
    if isinstance(o, bytes):
        return b"(" + o.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)") + b")"
    if isinstance(o, float):
        return f"{o:.6f}".rstrip("0").rstrip(".").encode() or b"0"
    return str(o).encode()


def pdf_to_bytes(pdf: Pdf) -> bytes:
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(pdf.objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode()
        out += _ser(pdf.objects[num])
        out += b"\nendobj\n"
    xref_pos = len(out)
    maxnum = max(pdf.objects) if pdf.objects else 0
    out += f"xref\n0 {maxnum + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        if num in offsets:
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        else:
            out += b"0000000000 65535 f \n"
    trailer = dict(pdf.trailer)
    trailer["Size"] = maxnum + 1
    out += b"trailer\n" + _ser(trailer) + b"\n"
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def pdf_to_file(pdf: Pdf, path: str):
    with open(path, "wb") as f:
        f.write(pdf_to_bytes(pdf))


def mkpage(content: bytes, mediabox=(0, 0, 612, 792), resources=None) -> Pdf:
    """A one-page PDF around a content stream."""
    stream = Stream({}, zlib.compress(content))
    stream.dict["Filter"] = Name("FlateDecode")
    objects = {
        1: {"Type": Name("Catalog"), "Pages": Ref(2)},
        2: {"Type": Name("Pages"), "Kids": [Ref(3)], "Count": 1},
        3: {
            "Type": Name("Page"),
            "Parent": Ref(2),
            "MediaBox": list(mediabox),
            "Resources": resources or {},
            "Contents": Ref(4),
        },
        4: stream,
    }
    return Pdf(objects, {"Root": Ref(1)})
