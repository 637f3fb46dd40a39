"""Test-side arithmetic-coded JPEG encoder (T.81 Annex D/F QM coder).

Synthesizes SOF9 (sequential) / SOF10 (progressive) test vectors for
io/jpeg.py's arithmetic decoder — neither PIL nor any bundled tool can
ENCODE arithmetic JPEGs, but libjpeg-turbo (PIL's decoder) decodes them,
so files produced here are decoded by BOTH PIL and io/jpeg.py and the
outputs compared byte-for-byte (the same oracle scheme as the Huffman
tests in test_jpeg.py).

The encoder statistics model mirrors T.81 Figures F.4-F.9 exactly (the
same published flowcharts libjpeg's jcarith.c implements); the DCT and
colour conversion need no particular precision since the oracle compares
two DECODERS over the identical file.
"""

import struct

import numpy as np

from coherence_tpu.io.jpeg import _AR_NLPS, _AR_NMPS, _AR_QE, _AR_SW, ZIGZAG

# Standard luminance quant table (T.81 K.1), quality ~75-ish left as-is.
QTAB = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)

_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = 0.5 * (np.cos((2 * _x + 1) * _u * np.pi / 16))
_C[0] *= 1 / np.sqrt(2)


def fdct_quant(block8: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """(8, 8) samples -> (64,) natural-order quantized coefficients."""
    f = _C @ (block8.astype(np.float64) - 128.0) @ _C.T
    return np.round(f / qtab.reshape(8, 8)).astype(np.int32).reshape(64)


class Encoder:
    """QM arithmetic encoder (T.81 F.1.4.1/F.1.4.3, byte-stuffed output)."""

    def __init__(self):
        self.c = 0
        self.a = 0x10000
        self.sc = 0
        self.zc = 0
        self.ct = 11
        self.buffer = -1
        self.out = bytearray()

    def _flush_zc(self):
        while self.zc:
            self.out.append(0)
            self.zc -= 1

    def encode(self, st: bytearray, i: int, val: int):
        sv = st[i]
        mps = sv >> 7
        idx = sv & 0x7F
        qe = _AR_QE[idx]
        self.a -= qe
        if val != mps:
            if self.a >= qe:  # conditional exchange (F.1.4.3)
                self.c += self.a
                self.a = qe
            st[i] = ((mps ^ _AR_SW[idx]) << 7) | _AR_NLPS[idx]
        else:
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (mps << 7) | _AR_NMPS[idx]
        while True:  # renormalize + byte out (F.1.4.4)
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                temp = self.c >> 19
                if temp > 0xFF:
                    # carry ripples into the buffered byte; stacked 0xFFs
                    # become 0x00s
                    if self.buffer >= 0:
                        self._flush_zc()
                        self.out.append(self.buffer + 1)
                        if self.buffer + 1 == 0xFF:
                            self.out.append(0)
                    self.zc += self.sc
                    self.sc = 0
                    self.buffer = temp & 0xFF
                elif temp == 0xFF:
                    self.sc += 1
                else:
                    if self.buffer == 0:
                        self.zc += 1
                    elif self.buffer >= 0:
                        self._flush_zc()
                        self.out.append(self.buffer)
                    if self.sc:
                        self._flush_zc()
                        while self.sc:
                            self.out += b"\xff\x00"
                            self.sc -= 1
                    self.buffer = temp
                self.c &= 0x7FFFF
                self.ct += 8
            if self.a >= 0x8000:
                break

    def flush(self) -> bytes:
        """Terminate (F.1.4.4.1.2) and return the entropy bytes."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self._flush_zc()
                self.out.append(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self.out.append(0)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zc()
                self.out.append(self.buffer)
            if self.sc:
                self._flush_zc()
                while self.sc:
                    self.out += b"\xff\x00"
                    self.sc -= 1
        if self.c & 0x7FFF800:  # final bytes only if nonzero
            self._flush_zc()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0)
        return bytes(self.out)


class ScanState:
    """Statistics areas + DC predictions for one scan."""

    def __init__(self, ncomp):
        self.dc = [bytearray(64) for _ in range(4)]
        self.ac = [bytearray(256) for _ in range(4)]
        self.fixed = bytearray([113])
        self.last_dc = [0] * ncomp
        self.dc_ctx = [0] * ncomp


def encode_dc(enc, ss, ci, tbl, cond, dc_val):
    """T.81 F.4/F.6/F.7: one DC diff."""
    st = ss.dc[tbl]
    ctx = ss.dc_ctx[ci]
    diff = dc_val - ss.last_dc[ci]
    ss.last_dc[ci] = dc_val
    if diff == 0:
        enc.encode(st, ctx, 0)
        ss.dc_ctx[ci] = 0
        return
    enc.encode(st, ctx, 1)
    if diff < 0:
        enc.encode(st, ctx + 1, 1)
        base = ctx + 3
        ss.dc_ctx[ci] = 8
        diff = -diff
    else:
        enc.encode(st, ctx + 1, 0)
        base = ctx + 2
        ss.dc_ctx[ci] = 4
    m = 0
    temp = diff - 1
    i = base
    if temp:
        enc.encode(st, i, 1)
        m = 1
        v2 = temp
        i = 20  # X1
        while v2 >> 1:
            v2 >>= 1
            enc.encode(st, i, 1)
            m <<= 1
            i += 1
        enc.encode(st, i, 0)
    else:
        enc.encode(st, i, 0)
    lo, hi = cond
    if m < (1 << lo) >> 1:
        ss.dc_ctx[ci] = 0
    elif m > (1 << hi) >> 1:
        ss.dc_ctx[ci] += 8
    i += 14
    m >>= 1
    while m:
        enc.encode(st, i, 1 if (m & temp) else 0)
        m >>= 1


def encode_ac_run(enc, ss, tbl, kx, blk, kmin, kmax, al):
    """T.81 F.5/F.8/F.9: AC coefficients kmin..kmax at point transform al."""
    st = ss.ac[tbl]

    def val(k):
        t = int(blk[ZIGZAG[k]])
        return -((-t) >> al) if t < 0 else (t >> al)

    ke = kmax
    while ke >= kmin and val(ke) == 0:
        ke -= 1
    k = kmin
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        while val(k) == 0:
            enc.encode(st, base + 1, 0)
            base += 3
            k += 1
        enc.encode(st, base + 1, 1)
        temp = val(k)
        if temp < 0:
            enc.encode(ss.fixed, 0, 1)
            temp = -temp
        else:
            enc.encode(ss.fixed, 0, 0)
        i = base + 2
        m = 0
        temp -= 1
        if temp:
            enc.encode(st, i, 1)
            m = 1
            v2 = temp
            if v2 >> 1:
                v2 >>= 1
                enc.encode(st, i, 1)
                m <<= 1
                i = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(st, i, 1)
                    m <<= 1
                    i += 1
        enc.encode(st, i, 0)
        i += 14
        m >>= 1
        while m:
            enc.encode(st, i, 1 if (m & temp) else 0)
            m >>= 1
        k += 1
    if k <= kmax:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def encode_ac_refine(enc, ss, tbl, blk, kmin, kmax, ah, al):
    """T.81 G.10 analogue: AC refinement scan."""
    st = ss.ac[tbl]

    def mag(k, shift):
        t = int(blk[ZIGZAG[k]])
        return (-t if t < 0 else t) >> shift

    ke = kmax
    while ke >= kmin and mag(ke, al) == 0:
        ke -= 1
    kex = ke
    while kex >= kmin and mag(kex, ah) == 0:
        kex -= 1
    k = kmin
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.encode(st, base, 0)  # not EOB
        while True:
            t = mag(k, al)
            if t:
                if t >> 1:  # previously nonzero: refinement bit
                    enc.encode(st, base + 2, t & 1)
                else:  # newly nonzero: significance + sign
                    enc.encode(st, base + 1, 1)
                    enc.encode(ss.fixed, 0, 1 if blk[ZIGZAG[k]] < 0 else 0)
                break
            enc.encode(st, base + 1, 0)
            base += 3
            k += 1
        k += 1
    if k <= kmax:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


# ---------------------------------------------------------------------------
# File assembly
# ---------------------------------------------------------------------------


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _components(pixels):
    """RGB/gray uint8 -> list of full-resolution planes (JFIF YCbCr)."""
    if pixels.ndim == 2:
        return [pixels.astype(np.float64)]
    r, g, b = (pixels[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return [y, cb, cr]


def _coef_planes(pixels, sampling, qtabs):
    """Quantized coefficient grids per component, MCU-padded."""
    planes = _components(pixels)
    h, w = pixels.shape[:2]
    hmax = max(sf[0] for sf in sampling)
    vmax = max(sf[1] for sf in sampling)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    out = []
    for plane, (sh, sv), q in zip(planes, sampling, qtabs):
        # box-downsample to the component grid, then pad to the MCU grid
        dsw, dsh = -(-w * sh // hmax), -(-h * sv // vmax)
        fx, fy = hmax // sh, vmax // sv
        py = -(-h // fy) * fy - h
        px = -(-w // fx) * fx - w
        p = np.pad(plane, ((0, py), (0, px)), mode="edge")
        ds = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean((1, 3))
        ds = ds[:dsh, :dsw]
        bw, bh = mcus_x * sh, mcus_y * sv
        ds = np.pad(ds, ((0, bh * 8 - dsh), (0, bw * 8 - dsw)), mode="edge")
        coefs = np.zeros((bh, bw, 64), np.int32)
        for by in range(bh):
            for bx in range(bw):
                coefs[by, bx] = fdct_quant(
                    ds[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8], q
                )
        out.append(coefs)
    return out, mcus_x, mcus_y


def encode_jpeg_arith(
    pixels: np.ndarray,
    progressive: bool = False,
    sampling=None,
    restart_interval: int = 0,
    dac=None,
) -> bytes:
    """Encode uint8 gray (h, w) or RGB (h, w, 3) as SOF9/SOF10.

    ``dac`` is None (defaults, no DAC segment) or a dict with optional
    ``dc`` -> (L, U) and ``ac`` -> Kx applied to table 0 (and written as
    a DAC marker segment).
    """
    h, w = pixels.shape[:2]
    nc = 1 if pixels.ndim == 2 else 3
    if sampling is None:
        sampling = [(1, 1)] * nc
    qsel = [0] + [1] * (nc - 1)
    qtabs_nat = [QTAB, np.where(QTAB > 32, 32, QTAB)]  # chroma slightly flat
    qtabs = [qtabs_nat[i] for i in qsel]
    coefs, mcus_x, mcus_y = _coef_planes(pixels, sampling, qtabs)

    dc_cond = {i: (0, 1) for i in range(4)}
    ac_cond = {i: 5 for i in range(4)}
    dac_body = b""
    if dac:
        if "dc" in dac:
            lo, hi = dac["dc"]
            dc_cond[0] = (lo, hi)
            dac_body += bytes([0x00, (hi << 4) | lo])
        if "ac" in dac:
            ac_cond[0] = dac["ac"]
            dac_body += bytes([0x10, dac["ac"]])

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti in sorted(set(qsel)):
        zz = qtabs_nat[ti][ZIGZAG].astype(np.uint8).tobytes()
        out += _seg(0xDB, bytes([ti]) + zz)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, (sampling[i][0] << 4) | sampling[i][1], qsel[i]])
    out += _seg(0xCA if progressive else 0xC9, sof)
    if dac_body:
        out += _seg(0xCC, dac_body)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    hmax = max(sf[0] for sf in sampling)
    vmax = max(sf[1] for sf in sampling)

    def mcu_iter(scomp_ids, cb):
        """Walk the scan's MCU grid calling cb(ci, blk) per data unit;
        handles restart flushes.  Returns entropy bytes."""
        interleaved = len(scomp_ids) > 1
        if interleaved:
            gw, gh = mcus_x, mcus_y
        else:
            ci = scomp_ids[0]
            sh, sv = sampling[ci]
            gw = -(-(-(-w * sh // hmax)) // 8)
            gh = -(-(-(-h * sv // vmax)) // 8)
        state = {"enc": Encoder(), "ss": ScanState(nc), "n": 0, "rst": 0}
        chunks = []

        def maybe_restart():
            if restart_interval and state["n"] == restart_interval:
                chunks.append(state["enc"].flush())
                chunks.append(bytes([0xFF, 0xD0 + (state["rst"] & 7)]))
                state["rst"] += 1
                state["n"] = 0
                state["enc"] = Encoder()
                state["ss"] = ScanState(nc)

        for my in range(gh):
            for mx in range(gw):
                maybe_restart()
                for ci in scomp_ids:
                    sh, sv = sampling[ci]
                    offs = (
                        [(y, x) for y in range(sv) for x in range(sh)]
                        if interleaved else [(0, 0)]
                    )
                    for oy, ox in offs:
                        by = my * (sv if interleaved else 1) + oy
                        bx = mx * (sh if interleaved else 1) + ox
                        cb(state["enc"], state["ss"], ci, coefs[ci][by, bx])
                state["n"] += 1
        chunks.append(state["enc"].flush())
        return b"".join(chunks)

    def sos(scomp_ids, ss_, se_, ah_, al_, body):
        hdr = bytes([len(scomp_ids)])
        for ci in scomp_ids:
            # DC table 0 for all; AC table 0 (conditioning ids)
            hdr += bytes([ci + 1, 0x00])
        hdr += bytes([ss_, se_, (ah_ << 4) | al_])
        return _seg(0xDA, hdr) + body

    if not progressive:
        def cb(enc, ss_, ci, blk):
            encode_dc(enc, ss_, ci, 0, dc_cond[0], int(blk[0]))
            encode_ac_run(enc, ss_, 0, ac_cond[0], blk, 1, 63, 0)

        out += sos(list(range(nc)), 0, 63, 0, 0, mcu_iter(list(range(nc)), cb))
    else:
        # DC first (Al=1), DC refine, then per component AC first (Al=1)
        # and AC refine — exercises every progressive arithmetic path.
        def dc_first(enc, ss_, ci, blk):
            encode_dc(enc, ss_, ci, 0, dc_cond[0], int(blk[0]) >> 1)

        def dc_refine(enc, ss_, ci, blk):
            enc.encode(ss_.fixed, 0, int(blk[0]) & 1)

        out += sos(list(range(nc)), 0, 0, 0, 1,
                   mcu_iter(list(range(nc)), dc_first))
        out += sos(list(range(nc)), 0, 0, 1, 0,
                   mcu_iter(list(range(nc)), dc_refine))
        for ci in range(nc):
            def ac_first(enc, ss_, _ci, blk):
                encode_ac_run(enc, ss_, 0, ac_cond[0], blk, 1, 63, 1)

            def ac_refine(enc, ss_, _ci, blk):
                encode_ac_refine(enc, ss_, 0, blk, 1, 63, 1, 0)

            out += sos([ci], 1, 63, 0, 1, mcu_iter([ci], ac_first))
            out += sos([ci], 1, 63, 1, 0, mcu_iter([ci], ac_refine))
    out += b"\xff\xd9"
    return bytes(out)
