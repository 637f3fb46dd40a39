"""From-scratch JPEG 2000 ENCODER (ITU-T T.800): reversible 5/3, one
quality layer, LRCP progression.

BEYOND REFERENCE: camlpdf only passes JPXDecode through
(/root/reference/Makefile:20); this writes it.  Two jobs:

1. Oracle vectors for io/jp2.py's breadth features — component
   subsampling, pclr/cmap palettes, and the bypass / termall / vsc /
   resetctx / pterm / segsym codeblock styles.  PIL's OpenJPEG plugin
   cannot ENCODE any of those, but it DECODES them all, so files
   produced here are decoded by both io/jp2.py and PIL and compared
   exactly (tests/test_jp2_breadth.py) — the same encoder-as-vector,
   decoder-vs-decoder scheme as tests/_arithenc.py for arithmetic JPEG.
2. A first-party lossless JPX compressor available to the PDF writer.

Shares the T.88 MQ coder (io/jbig2.py) and the EBCOT context tables /
segmentation rules with the decoder (io/jp2.py).  Lossless only: the
5/3 analysis here is the exact inverse of the decoder's F.3.7 synthesis,
so encode -> decode round-trips bit-for-bit (and OpenJPEG agrees).
"""

from __future__ import annotations

import math
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .jbig2 import Contexts, MQEncoder
from .jp2 import (
    _CTX_RL,
    _CTX_UNI,
    _N_CTX,
    _SC,
    _ZC_HH,
    _ZC_LL,
    _ceil_div,
    _pass_is_raw,
    _seg_maxpasses,
)

__all__ = ["encode"]


# ---------------------------------------------------------------------------
# Bit writers (packet headers and raw bypass segments share the 0xFF rule:
# a byte following 0xFF carries only 7 payload bits, MSB stuffed to 0)
# ---------------------------------------------------------------------------


class _Bits:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def _cap(self) -> int:
        return 7 if (self.out and self.out[-1] == 0xFF) else 8

    def bit(self, b: int):
        self.buf = (self.buf << 1) | (b & 1)
        self.n += 1
        if self.n == self._cap():
            self.out.append(self.buf)
            self.buf = 0
            self.n = 0

    def bits(self, v: int, n: int):
        for k in range(n - 1, -1, -1):
            self.bit((v >> k) & 1)

    def align(self):
        """Packet-header alignment (B.10.1): pad the byte, then emit the
        stuffed byte the reader's align() consumes after an 0xFF."""
        while self.n:
            self.bit(0)
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)

    def flush_raw(self) -> bytes:
        """Raw-segment termination: pad with 0s; a terminated segment
        must not end in 0xFF (the decoder feeds 1s past the end)."""
        while self.n:
            self.bit(0)
        if self.out and self.out[-1] == 0xFF:
            self.out.pop()
        return bytes(self.out)


# ---------------------------------------------------------------------------
# Tag-tree encoder (B.10.2), the exact mirror of jp2._TagTree.decode
# ---------------------------------------------------------------------------


class _TagTreeEnc:
    def __init__(self, w: int, h: int):
        self.levels: List[Tuple[int, int]] = []
        lw, lh = w, h
        while True:
            self.levels.append((lw, lh))
            if lw == 1 and lh == 1:
                break
            lw, lh = _ceil_div(lw, 2), _ceil_div(lh, 2)
        self.val = [
            np.zeros((lh_, lw_), dtype=np.int32) for lw_, lh_ in self.levels
        ]
        self.low = [
            np.zeros((lh_, lw_), dtype=np.int32) for lw_, lh_ in self.levels
        ]
        self.known = [
            np.zeros((lh_, lw_), dtype=bool) for lw_, lh_ in self.levels
        ]

    def set_values(self, leaves: np.ndarray):
        self.val[0][: leaves.shape[0], : leaves.shape[1]] = leaves
        # Internal nodes hold the min of their children; pad with a large
        # value so absent children never win.
        for lvl in range(1, len(self.levels)):
            lw, lh = self.levels[lvl]
            below = self.val[lvl - 1]
            big = np.full((2 * lh, 2 * lw), 1 << 30, dtype=np.int64)
            big[: below.shape[0], : below.shape[1]] = below
            self.val[lvl][:] = np.minimum.reduce(
                [big[0::2, 0::2], big[0::2, 1::2], big[1::2, 0::2], big[1::2, 1::2]]
            ).astype(np.int32)

    def encode(self, bw: _Bits, i: int, j: int, threshold: int):
        low = 0
        for lvl in range(len(self.levels) - 1, -1, -1):
            ii, jj = i >> lvl, j >> lvl
            if self.low[lvl][ii, jj] < low:
                self.low[lvl][ii, jj] = low
            while not self.known[lvl][ii, jj]:
                if self.low[lvl][ii, jj] >= threshold:
                    return
                if self.low[lvl][ii, jj] == self.val[lvl][ii, jj]:
                    bw.bit(1)
                    self.known[lvl][ii, jj] = True
                else:
                    bw.bit(0)
                    self.low[lvl][ii, jj] += 1
            low = self.val[lvl][ii, jj]
            if low >= threshold:
                return


# ---------------------------------------------------------------------------
# Forward 5/3 DWT (the exact inverse of jp2._sr_1d / _sr_2d)
# ---------------------------------------------------------------------------


def _ext_idx(n: int, left: int, right: int) -> np.ndarray:
    if n == 1:
        return np.zeros(left + 1 + right, dtype=np.int64)
    idx = np.arange(-left, n + right)
    period = 2 * (n - 1)
    idx = np.abs(idx) % period
    return np.where(idx >= n, period - idx, idx)


def _sd_1d(x: np.ndarray, i0: int, i1: int) -> np.ndarray:
    """1D analysis over [i0, i1): interleaved output (even=L, odd=H)."""
    n = i1 - i0
    if n == 1:
        return x.copy() if i0 % 2 == 0 else x * 2
    xe = x[_ext_idx(n, 4, 4)]
    o = i0 - 4
    y = xe.astype(np.int64).copy()
    # Y(2n+1) = X(2n+1) - floor((X(2n) + X(2n+2)) / 2), over a margin wide
    # enough for the even step below.
    start = i0 - 3 if (i0 - 3) % 2 == 1 else i0 - 2
    od = np.arange(start, i1 + 3, 2)
    y[od - o] = xe[od - o] - ((xe[od - 1 - o] + xe[od + 1 - o]) >> 1)
    # Y(2n) = X(2n) + floor((Y(2n-1) + Y(2n+1) + 2) / 4)
    start = i0 if i0 % 2 == 0 else i0 + 1
    ev = np.arange(start, i1, 2)
    y[ev - o] = xe[ev - o] + ((y[ev - 1 - o] + y[ev + 1 - o] + 2) >> 2)
    return y[i0 - o : i1 - o]


def _sd_2d(a: np.ndarray, u0: int, u1: int, v0: int, v1: int):
    """2D analysis of region [v0,v1)x[u0,u1) -> (ll, hl, lh, hh).

    Inverse composition of _sr_2d (which runs HOR synthesis then VER):
    VER analysis first, then HOR, then deinterleave on global parity."""
    a = a.astype(np.int64).copy()
    if a.size:
        for ccol in range(a.shape[1]):
            a[:, ccol] = _sd_1d(a[:, ccol], v0, v1)
        for r in range(a.shape[0]):
            a[r, :] = _sd_1d(a[r, :], u0, u1)
    xs = np.arange(u0, u1)
    ys = np.arange(v0, v1)
    exm = (xs % 2 == 0)
    eym = (ys % 2 == 0)
    ll = a[np.ix_(eym, exm)]
    hl = a[np.ix_(eym, ~exm)]
    lh = a[np.ix_(~eym, exm)]
    hh = a[np.ix_(~eym, ~exm)]
    return ll, hl, lh, hh


# ---------------------------------------------------------------------------
# Tier-1 encoder (D): the mirror of jp2._t1_decode, terminated segments
# ---------------------------------------------------------------------------


def _t1_encode(
    mag: np.ndarray,
    neg: np.ndarray,
    numbps: int,
    orient: str,
    cbstyle: int,
) -> List[Tuple[bytes, int]]:
    """Encode one codeblock; returns [(segment bytes, passes in it)]."""
    h, w = mag.shape
    segsym = bool(cbstyle & 0x20)
    vsc = bool(cbstyle & 0x08)
    resetctx = bool(cbstyle & 0x02)
    zc = _ZC_HH if orient == "HH" else _ZC_LL
    swap = orient == "HL"

    def fresh_contexts():
        cx = Contexts(_N_CTX)
        cx.i[0] = 4
        cx.i[_CTX_RL] = 3
        cx.i[_CTX_UNI] = 46
        return cx

    cx = fresh_contexts()
    sig = np.zeros((h + 2, w + 2), dtype=np.uint8)
    sgn = np.zeros((h + 2, w + 2), dtype=np.uint8)
    sgn[1 : h + 1, 1 : w + 1] = neg
    visited = np.zeros((h + 2, w + 2), dtype=np.uint8)
    refined = np.zeros((h + 2, w + 2), dtype=np.uint8)

    mq: Optional[MQEncoder] = None
    raw: Optional[_Bits] = None

    def zc_ctx(y, x, masked=False):
        hsum = sig[y, x - 1] + sig[y, x + 1]
        vsum = sig[y - 1, x] + (0 if masked else sig[y + 1, x])
        d = sig[y - 1, x - 1] + sig[y - 1, x + 1]
        if not masked:
            d += sig[y + 1, x - 1] + sig[y + 1, x + 1]
        if swap:
            hsum, vsum = vsum, hsum
        return zc[hsum, vsum, d]

    def encode_sign(y, x, masked=False):
        if raw is not None:
            raw.bit(int(sgn[y, x]))
            return

        def contrib(yy, xx):
            if not sig[yy, xx]:
                return 0
            return -1 if sgn[yy, xx] else 1

        hc = max(-1, min(1, contrib(y, x - 1) + contrib(y, x + 1)))
        south = 0 if masked else contrib(y + 1, x)
        vc = max(-1, min(1, contrib(y - 1, x) + south))
        ctx, xor = _SC[(hc + 1, vc + 1)]
        mq.encode(cx, ctx, int(sgn[y, x]) ^ xor)

    total = 1 + 3 * (numbps - 1)
    segs: List[Tuple[bytes, int]] = []
    p = 0
    bp = numbps - 1
    passtype = 2
    while p < total:
        seg_start = p
        maxp = _seg_maxpasses(cbstyle, seg_start)
        seg_passes = min(maxp, total - seg_start)
        is_raw = _pass_is_raw(cbstyle, seg_start)
        if is_raw:
            raw, mq = _Bits(), None
        else:
            raw, mq = None, MQEncoder()
        for _sp in range(seg_passes):
            if passtype == 0:  # significance propagation
                for y0 in range(0, h, 4):
                    for x in range(w):
                        for y in range(y0, min(y0 + 4, h)):
                            ay, ax = y + 1, x + 1
                            if sig[ay, ax] or visited[ay, ax]:
                                continue
                            masked = vsc and (y & 3) == 3
                            c = zc_ctx(ay, ax, masked)
                            if c == 0:
                                continue
                            visited[ay, ax] = 1
                            d = (int(mag[y, x]) >> bp) & 1
                            if raw is not None:
                                raw.bit(d)
                            else:
                                mq.encode(cx, c, d)
                            if d:
                                sig[ay, ax] = 1
                                encode_sign(ay, ax, masked)
            elif passtype == 1:  # magnitude refinement
                for y0 in range(0, h, 4):
                    for x in range(w):
                        for y in range(y0, min(y0 + 4, h)):
                            ay, ax = y + 1, x + 1
                            if not sig[ay, ax] or visited[ay, ax]:
                                continue
                            d = (int(mag[y, x]) >> bp) & 1
                            if raw is not None:
                                raw.bit(d)
                            else:
                                if refined[ay, ax]:
                                    c = 16
                                else:
                                    nb = (
                                        sig[ay, ax - 1] + sig[ay, ax + 1]
                                        + sig[ay - 1, ax]
                                        + sig[ay - 1, ax - 1]
                                        + sig[ay - 1, ax + 1]
                                    )
                                    # VSC masks the stripe below in the
                                    # refinement context too (see the
                                    # decoder's note).
                                    if not (vsc and (y & 3) == 3):
                                        nb += (
                                            sig[ay + 1, ax]
                                            + sig[ay + 1, ax - 1]
                                            + sig[ay + 1, ax + 1]
                                        )
                                    c = 15 if nb else 14
                                mq.encode(cx, c, d)
                            refined[ay, ax] = 1
            else:  # cleanup (always MQ)
                for y0 in range(0, h, 4):
                    for x in range(w):
                        y = y0
                        if (
                            y0 + 4 <= h
                            and not any(
                                sig[y0 + 1 + k, x + 1]
                                or visited[y0 + 1 + k, x + 1]
                                for k in range(4)
                            )
                            and all(
                                zc_ctx(y0 + 1 + k, x + 1, vsc and k == 3) == 0
                                for k in range(4)
                            )
                        ):
                            r = next(
                                (
                                    k
                                    for k in range(4)
                                    if (int(mag[y0 + k, x]) >> bp) & 1
                                ),
                                None,
                            )
                            if r is None:
                                mq.encode(cx, _CTX_RL, 0)
                                continue
                            mq.encode(cx, _CTX_RL, 1)
                            mq.encode(cx, _CTX_UNI, (r >> 1) & 1)
                            mq.encode(cx, _CTX_UNI, r & 1)
                            y = y0 + r
                            ay, ax = y + 1, x + 1
                            sig[ay, ax] = 1
                            encode_sign(ay, ax, vsc and (y & 3) == 3)
                            y += 1
                        for yy in range(y, min(y0 + 4, h)):
                            ay, ax = yy + 1, x + 1
                            if sig[ay, ax] or visited[ay, ax]:
                                continue
                            masked = vsc and (yy & 3) == 3
                            d = (int(mag[yy, x]) >> bp) & 1
                            mq.encode(cx, zc_ctx(ay, ax, masked), d)
                            if d:
                                sig[ay, ax] = 1
                                encode_sign(ay, ax, masked)
                if segsym:
                    for b in (1, 0, 1, 0):
                        mq.encode(cx, _CTX_UNI, b)
                visited[:] = 0
                bp -= 1
            passtype = (passtype + 1) % 3
            p += 1
            if resetctx:
                cx = fresh_contexts()
        data = raw.flush_raw() if raw is not None else mq.flush(marker=False)
        segs.append((data, seg_passes))
    return segs


# ---------------------------------------------------------------------------
# Tier-2 + codestream assembly
# ---------------------------------------------------------------------------


def _npasses_bits(bw: _Bits, n: int):
    """B.10.6 new-passes code (mirror of the reader)."""
    if n == 1:
        bw.bit(0)
    elif n == 2:
        bw.bits(0b10, 2)
    elif n <= 5:
        bw.bits(0b11, 2)
        bw.bits(n - 3, 2)
    elif n <= 36:
        bw.bits(0b1111, 4)
        bw.bits(n - 6, 5)
    elif n <= 164:
        bw.bits(0b111111111, 9)
        bw.bits(n - 37, 7)
    else:
        raise ValueError(f"jp2enc: cannot signal {n} passes")


class _EBand:
    def __init__(self, orient, rect, coeffs):
        self.orient = orient
        self.x0, self.y0, self.x1, self.y1 = rect
        self.coeffs = coeffs  # int64, signed
        self.cblks = []  # [(gy, gx, x0, y0, x1, y1, segs, numbps)]


def _band_rect(tc, nb, xob, yob):
    tcx0, tcy0, tcx1, tcy1 = tc
    if nb == 0:
        return tc
    den = 1 << nb
    return (
        _ceil_div(tcx0 - (1 << (nb - 1)) * xob, den),
        _ceil_div(tcy0 - (1 << (nb - 1)) * yob, den),
        _ceil_div(tcx1 - (1 << (nb - 1)) * xob, den),
        _ceil_div(tcy1 - (1 << (nb - 1)) * yob, den),
    )


def encode(
    planes: Sequence[np.ndarray],
    depths: Optional[Sequence[int]] = None,
    subs: Optional[Sequence[Tuple[int, int]]] = None,
    levels: int = 5,
    cbstyle: int = 0,
    mct: bool = False,
    cb_size: Tuple[int, int] = (64, 64),
    tile: Optional[Tuple[int, int]] = None,
    container: bool = True,
    enum_cs: Optional[int] = None,
    palette: Optional[np.ndarray] = None,
    guard: int = 2,
    prog: int = 0,
    poc: Optional[List[Tuple[int, int, int, int, int, int]]] = None,
) -> bytes:
    """Lossless-encode component ``planes`` (each (hc, wc) unsigned ints).

    ``subs[c]`` is the component's (XRsiz, YRsiz); the reference grid is
    ``subs``-scaled from plane 0 (plane c must be the ceil-division size).
    ``palette`` is an optional (NE, NPC) uint array: ``planes`` must then
    be the single index component and the JP2 container maps it through
    pclr/cmap (requires ``container=True``).  ``mct`` applies the RCT
    (first three planes, equal sizes).  ``cbstyle`` takes the T.800 COD
    flags (0x01 bypass, 0x02 resetctx, 0x04 termall, 0x08 vsc, 0x10
    pterm, 0x20 segsym).  ``prog`` is the COD progression (0 LRCP, 1
    RLCP, 2 RPCL, 3 PCRL, 4 CPRL); ``poc`` optionally writes a POC
    marker with (RSpoc, CSpoc, LYEpoc, REpoc, CEpoc, Ppoc) entries and
    orders packets accordingly (A.6.6/B.12.2) — the entries must cover
    every packet.
    """
    ncomp = len(planes)
    planes = [np.asarray(p) for p in planes]
    if depths is None:
        depths = [8] * ncomp
    if subs is None:
        subs = [(1, 1)] * ncomp
    xr0, yr0 = subs[0]
    h0, w0 = planes[0].shape
    # Reference grid: smallest grid whose ceil-division matches plane 0.
    xsiz, ysiz = w0 * xr0, h0 * yr0
    for c in range(ncomp):
        xr, yr = subs[c]
        want = (_ceil_div(ysiz, yr), _ceil_div(xsiz, xr))
        if planes[c].shape != want:
            raise ValueError(
                f"jp2enc: plane {c} is {planes[c].shape}, expected {want}"
            )
    xtsiz, ytsiz = tile if tile else (xsiz, ysiz)

    # --- headers -----------------------------------------------------------
    out = bytearray(b"\xff\x4f")  # SOC
    siz = struct.pack(
        ">HIIIIIIIIH", 0, xsiz, ysiz, 0, 0, xtsiz, ytsiz, 0, 0, ncomp
    )
    for c in range(ncomp):
        siz += bytes([depths[c] - 1, subs[c][0], subs[c][1]])
    out += b"\xff\x51" + struct.pack(">H", len(siz) + 2) + siz
    xcb, ycb = cb_size[0].bit_length() - 1, cb_size[1].bit_length() - 1
    cod = bytes([0, prog]) + struct.pack(">H", 1) + bytes(
        [1 if mct else 0, levels, xcb - 2, ycb - 2, cbstyle, 1]
    )
    out += b"\xff\x52" + struct.pack(">H", len(cod) + 2) + cod
    if poc:
        pbody = b"".join(
            struct.pack(">BBHBBB", rs, cs, lye, re_, ce, pp)
            for rs, cs, lye, re_, ce, pp in poc
        )
        out += b"\xff\x5f" + struct.pack(">H", len(pbody) + 2) + pbody
    nsub = 3 * levels + 1
    qcd = bytes([0 | (guard << 5)])
    # One shared QCD: base the ranging exponent on the widest component
    # (+1 when the RCT runs — its chroma outputs span one extra bit); the
    # tier-1 encoder computes Mb from the SAME eps so header and data
    # always agree (E.1).
    qd = max(depths) + (1 if mct else 0)
    eps_list = []
    for r in range(levels + 1):
        bands = (
            [("LL", levels, 0)]
            if r == 0
            else [("HL", levels - r + 1, 1), ("LH", levels - r + 1, 1),
                  ("HH", levels - r + 1, 2)]
        )
        for _o, _nb, gain in bands:
            eps_list.append(qd + gain)
    assert len(eps_list) == nsub
    qcd += bytes((e << 3) & 0xFF for e in eps_list)
    out += b"\xff\x5c" + struct.pack(">H", len(qcd) + 2) + qcd

    # --- per-tile ----------------------------------------------------------
    ntx = _ceil_div(xsiz, xtsiz)
    nty = _ceil_div(ysiz, ytsiz)
    for t in range(ntx * nty):
        ti, tj = t % ntx, t // ntx
        tx0, ty0 = ti * xtsiz, tj * ytsiz
        tx1, ty1 = min(tx0 + xtsiz, xsiz), min(ty0 + ytsiz, ysiz)
        body = _encode_tile(
            planes, depths, subs, levels, cbstyle, mct,
            xcb, ycb, guard, qd, (tx0, ty0, tx1, ty1), prog, poc,
        )
        sot = struct.pack(">HHIBB", 10, t, 12 + 2 + len(body), 0, 1)
        out += b"\xff\x90" + sot + b"\xff\x93" + body
    out += b"\xff\xd9"  # EOC
    cs = bytes(out)
    if not container:
        return cs

    # --- JP2 container -----------------------------------------------------
    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    sig = box(b"jP  ", b"\r\n\x87\n")
    ftyp = box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
    n_out = palette.shape[1] if palette is not None else ncomp
    ihdr = box(
        b"ihdr",
        struct.pack(">IIHBBBB", ysiz, xsiz, ncomp, depths[0] - 1, 7, 0, 0),
    )
    if enum_cs is None:
        enum_cs = 17 if n_out == 1 else 16
    colr = box(b"colr", bytes([1, 0, 0]) + struct.pack(">I", enum_cs))
    hdr = ihdr + colr
    if palette is not None:
        ne, npc = palette.shape
        pclr = struct.pack(">HB", ne, npc) + bytes([7] * npc)  # 8-bit cols
        for i in range(ne):
            pclr += bytes(int(palette[i, j]) & 0xFF for j in range(npc))
        cmap = b"".join(
            struct.pack(">HBB", 0, 1, j) for j in range(npc)
        )
        hdr += box(b"pclr", pclr) + box(b"cmap", cmap)
    jp2h = box(b"jp2h", hdr)
    jp2c = box(b"jp2c", cs)
    return sig + ftyp + jp2h + jp2c


def _encode_tile(planes, depths, subs, levels, cbstyle, mct,
                 xcb, ycb, guard, qd, rect, prog=0, poc=None) -> bytes:
    tx0, ty0, tx1, ty1 = rect
    ncomp = len(planes)
    comps = []
    for c in range(ncomp):
        xr, yr = subs[c]
        cx0, cy0 = _ceil_div(tx0, xr), _ceil_div(ty0, yr)
        cx1, cy1 = _ceil_div(tx1, xr), _ceil_div(ty1, yr)
        a = planes[c][cy0:cy1, cx0:cx1].astype(np.int64)
        a = a - (1 << (depths[c] - 1))  # DC level shift (unsigned input)
        comps.append((a, (cx0, cy0, cx1, cy1)))
    if mct:
        if ncomp < 3 or not (
            comps[0][0].shape == comps[1][0].shape == comps[2][0].shape
        ):
            raise ValueError("jp2enc: MCT needs 3 equal-size components")
        r_, g_, b_ = comps[0][0], comps[1][0], comps[2][0]
        y0_ = (r_ + 2 * g_ + b_) >> 2
        y1_ = b_ - g_
        y2_ = r_ - g_
        comps[0] = (y0_, comps[0][1])
        comps[1] = (y1_, comps[1][1])
        comps[2] = (y2_, comps[2][1])

    # DWT + band split per component; resolution r bands (r>=1) come from
    # decomposition d = levels - r + 1.
    allbands: List[List[List[_EBand]]] = []
    for c in range(ncomp):
        a, (cx0, cy0, cx1, cy1) = comps[c]
        res_bands = [None] * (levels + 1)
        cur = a
        u0, v0, u1, v1 = cx0, cy0, cx1, cy1
        for d in range(1, levels + 1):
            ll, hl, lh, hh = _sd_2d(cur, u0, u1, v0, v1)
            tc = (u0, v0, u1, v1)
            r = levels - d + 1
            nb = levels - r + 1  # == d
            res_bands[r] = [
                _EBand("HL", _band_rect((cx0, cy0, cx1, cy1), nb, 1, 0), hl),
                _EBand("LH", _band_rect((cx0, cy0, cx1, cy1), nb, 0, 1), lh),
                _EBand("HH", _band_rect((cx0, cy0, cx1, cy1), nb, 1, 1), hh),
            ]
            cur = ll
            u0, v0 = _ceil_div(u0, 2), _ceil_div(v0, 2)
            u1, v1 = _ceil_div(u1, 2), _ceil_div(v1, 2)
        res_bands[0] = [
            _EBand("LL", _band_rect((cx0, cy0, cx1, cy1), levels, 0, 0), cur)
        ]
        allbands.append(res_bands)

    # Codeblock partition + tier-1 (whole band = one precinct: PPx=PPy=15).
    for c in range(ncomp):
        for r in range(levels + 1):
            shift = 0 if r == 0 else 1
            cbw = 1 << min(xcb, 15 - shift)
            cbh = 1 << min(ycb, 15 - shift)
            for band in allbands[c][r]:
                gain = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}[band.orient]
                mb = guard + (qd + gain) - 1  # matches the QCD exponent
                bx0, by0, bx1, by1 = band.x0, band.y0, band.x1, band.y1
                if bx1 <= bx0 or by1 <= by0:
                    continue
                gx0, gy0 = bx0 // cbw, by0 // cbh
                gx1, gy1 = _ceil_div(bx1, cbw), _ceil_div(by1, cbh)
                for gy in range(gy0, gy1):
                    for gx in range(gx0, gx1):
                        x0 = max(gx * cbw, bx0)
                        y0 = max(gy * cbh, by0)
                        x1 = min((gx + 1) * cbw, bx1)
                        y1 = min((gy + 1) * cbh, by1)
                        sub = band.coeffs[
                            y0 - by0 : y1 - by0, x0 - bx0 : x1 - bx0
                        ]
                        mag = np.abs(sub).astype(np.int64)
                        neg = (sub < 0).astype(np.uint8)
                        numbps = int(mag.max()).bit_length()
                        if numbps == 0:
                            segs = None
                            zbp = 0
                        else:
                            if numbps > mb:
                                raise ValueError("jp2enc: guard bits exceeded")
                            zbp = mb - numbps
                            segs = _t1_encode(
                                mag, neg, numbps, band.orient, cbstyle
                            )
                        band.cblks.append(
                            (gy - gy0, gx - gx0, segs, zbp,
                             gy1 - gy0, gx1 - gx0)
                        )

    # Tier-2: one packet per (resolution, component) — single layer,
    # whole-band precincts — built independently, then emitted in the
    # COD progression's (or the POC entries') order.
    pkts: dict = {}
    for r in range(levels + 1):
        for c in range(ncomp):
            # An empty resolution has no precinct, hence no packet (the
            # decoder's _precincts returns [] for it).
            cx0, cy0, cx1, cy1 = comps[c][1]
            den = 1 << (levels - r)
            if (
                _ceil_div(cx1, den) <= _ceil_div(cx0, den)
                or _ceil_div(cy1, den) <= _ceil_div(cy0, den)
            ):
                continue
            bw = _Bits()
            bodies = []
            bw.bit(1)  # non-empty packet
            for band in allbands[c][r]:
                if not band.cblks:
                    continue
                nh = max(g for g, *_ in band.cblks) + 1 if band.cblks else 0
                ngw = band.cblks[0][5]
                ngh = band.cblks[0][4]
                incl = _TagTreeEnc(max(ngw, 1), max(ngh, 1))
                zbpt = _TagTreeEnc(max(ngw, 1), max(ngh, 1))
                inc_leaves = np.zeros((max(ngh, 1), max(ngw, 1)), np.int32)
                zbp_leaves = np.zeros((max(ngh, 1), max(ngw, 1)), np.int32)
                for gy, gx, segs, zbp, _gh, _gw in band.cblks:
                    inc_leaves[gy, gx] = 0 if segs is not None else 1
                    zbp_leaves[gy, gx] = zbp
                incl.set_values(inc_leaves)
                zbpt.set_values(zbp_leaves)
                for gy, gx, segs, zbp, _gh, _gw in band.cblks:
                    incl.encode(bw, gy, gx, 1)
                    if segs is None:
                        continue
                    thr = 1
                    while True:
                        zbpt.encode(bw, gy, gx, thr)
                        if zbp < thr:
                            break
                        thr += 1
                    total = sum(np_ for _d, np_ in segs)
                    _npasses_bits(bw, total)
                    # Lblock: one shared bump covering every part.
                    lblock = 3
                    need = 0
                    for data, np_ in segs:
                        lb = len(data).bit_length()
                        need = max(
                            need, lb - int(math.floor(math.log2(np_)))
                        )
                    k = max(0, need - lblock)
                    for _ in range(k):
                        bw.bit(1)
                    bw.bit(0)
                    lblock += k
                    for data, np_ in segs:
                        nbits = lblock + int(math.floor(math.log2(np_)))
                        bw.bits(len(data), nbits)
                        bodies.append(data)
            bw.align()
            pkts[(c, r)] = bytes(bw.out) + b"".join(bodies)

    # Packet order: with one layer and one precinct, LRCP/RLCP/RPCL all
    # reduce to resolution-major and PCRL/CPRL to component-major; POC
    # entries emit their (not-yet-emitted) volume in entry order.
    order: List[Tuple[int, int]] = []
    seen: set = set()

    def add(c, r):
        if (c, r) in pkts and (c, r) not in seen:
            seen.add((c, r))
            order.append((c, r))

    def volume(pp, r0, r1, c0, c1):
        r1 = min(r1, levels + 1)
        c1 = min(c1, ncomp)
        if pp in (0, 1, 2):
            for r in range(r0, r1):
                for c in range(c0, c1):
                    add(c, r)
        else:
            for c in range(c0, c1):
                for r in range(r0, r1):
                    add(c, r)

    if poc:
        for rs, cs, _lye, re_, ce, pp in poc:
            volume(pp, rs, re_, cs, ce)
    else:
        volume(prog, 0, levels + 1, 0, ncomp)
    if len(order) != len(pkts):
        raise ValueError("jp2enc: POC entries do not cover every packet")
    return b"".join(pkts[k] for k in order)
