"""Encrypted PDF reading (PDF 7.6 standard security handler) — camlpdf
`Pdfcrypt` parity: the reference links camlpdf which opens encrypted
files.  Key derivation in these tests is transcribed independently from
the spec so a handler bug cannot cancel out."""

import hashlib
import struct

from coherence_tpu.io import pdfcrypt as PC
from coherence_tpu.io.pdf import pdf_of_bytes


def test_aes_fips197_vectors():
    key128 = bytes(range(16))
    key256 = bytes(range(32))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    w, nr = PC._expand_key(key128)
    assert PC._enc_block(w, nr, pt).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert PC._dec_block(w, nr, bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")) == pt
    w, nr = PC._expand_key(key256)
    assert PC._enc_block(w, nr, pt).hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert PC._dec_block(w, nr, bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")) == pt


def test_aes_cbc_roundtrip():
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    msg = bytes(range(48))
    assert PC.aes_cbc_decrypt(key, iv, PC.aes_cbc_encrypt(key, iv, msg)) == msg


def test_rc4_vector():
    assert PC.rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"


_PAD = PC._PAD
_ID0 = bytes(range(16))


def _r3_key(o: bytes, p: int, keylen=16) -> bytes:
    """Algorithm 2 transcribed straight from the spec (R3, empty user pw)."""
    h = hashlib.md5()
    h.update(_PAD)  # empty password padded
    h.update(o[:32])
    h.update(struct.pack("<i", p))
    h.update(_ID0)
    key = h.digest()
    for _ in range(50):
        key = hashlib.md5(key[:keylen]).digest()
    return key[:keylen]


def _obj_key(key: bytes, num: int, gen: int, aes=False) -> bytes:
    h = hashlib.md5()
    h.update(key + struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(key) + 5, 16)]


_CONTENT = b"1 0 0 rg 10 10 50 50 re f"


def _assemble(enc_dict: bytes, enc_content: bytes) -> bytes:
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
        b"/Contents 4 0 R >> endobj\n",
        b"4 0 obj << /Length " + str(len(enc_content)).encode() + b" >> stream\n"
        + enc_content + b"\nendstream endobj\n",
        b"5 0 obj " + enc_dict + b" endobj\n",
    ]
    idhex = _ID0.hex().encode()
    trailer = (
        b"trailer << /Root 1 0 R /Encrypt 5 0 R /ID [<" + idhex + b"> <"
        + idhex + b">] /Size 6 >>\n"
    )
    return b"%PDF-1.6\n" + b"".join(objs) + trailer + b"%%EOF\n"


def _page(pdf):
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    return pdf.resolve(pages["Kids"][0])


def test_rc4_128_r3_file_decrypts():
    o = bytes(range(32))  # /O only feeds key derivation for reading
    p = -44
    key = _r3_key(o, p)
    enc_content = PC.rc4(_obj_key(key, 4, 0), _CONTENT)
    enc = (
        b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 /O <"
        + o.hex().encode() + b"> /U <" + (b"\x00" * 32).hex().encode() + b"> >>"
    )
    pdf = pdf_of_bytes(_assemble(enc, enc_content))
    assert pdf.page_content(_page(pdf)) == _CONTENT


def test_rc4_40_r2_file_decrypts():
    o = bytes(reversed(range(32)))
    p = -1
    h = hashlib.md5()
    h.update(_PAD + o[:32] + struct.pack("<i", p) + _ID0)
    key = h.digest()[:5]  # R2: no 50x iteration, 40-bit
    enc_content = PC.rc4(_obj_key(key, 4, 0), _CONTENT)
    enc = (
        b"<< /Filter /Standard /V 1 /R 2 /P -1 /O <" + o.hex().encode()
        + b"> /U <" + (b"\x00" * 32).hex().encode() + b"> >>"
    )
    pdf = pdf_of_bytes(_assemble(enc, enc_content))
    assert pdf.page_content(_page(pdf)) == _CONTENT


def test_aesv2_r4_file_decrypts():
    o = bytes(range(32))
    p = -44
    key = _r3_key(o, p)
    iv = bytes(range(16))
    padlen = 16 - len(_CONTENT) % 16
    padded = _CONTENT + bytes([padlen]) * padlen
    enc_content = iv + PC.aes_cbc_encrypt(_obj_key(key, 4, 0, aes=True), iv, padded)
    enc = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P -44"
        b" /CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >>"
        b" /StmF /StdCF /StrF /StdCF"
        b" /O <" + o.hex().encode() + b"> /U <"
        + (b"\x00" * 32).hex().encode() + b"> >>"
    )
    pdf = pdf_of_bytes(_assemble(enc, enc_content))
    assert pdf.page_content(_page(pdf)) == _CONTENT


def _aes256_file(r: int) -> bytes:
    filekey = bytes(range(100, 132))
    vs, ks = b"VALSALT!", b"KEYSALT!"
    if r == 5:
        uhash = hashlib.sha256(b"" + vs).digest()
        ik = hashlib.sha256(b"" + ks).digest()
    else:
        uhash = PC._hash_2b(b"", vs, b"")
        ik = PC._hash_2b(b"", ks, b"")
    u = uhash + vs + ks
    ue = PC.aes_cbc_encrypt(ik, b"\x00" * 16, filekey)
    iv = bytes(range(16, 32))
    padlen = 16 - len(_CONTENT) % 16
    padded = _CONTENT + bytes([padlen]) * padlen
    enc_content = iv + PC.aes_cbc_encrypt(filekey, iv, padded)
    enc = (
        b"<< /Filter /Standard /V 5 /R " + str(r).encode() + b" /Length 256 /P -4"
        b" /CF << /StdCF << /CFM /AESV3 >> >> /StmF /StdCF /StrF /StdCF"
        b" /O <" + (b"\x00" * 48).hex().encode() + b"> /OE <" + (b"\x00" * 32).hex().encode()
        + b"> /U <" + u.hex().encode() + b"> /UE <" + ue.hex().encode() + b"> >>"
    )
    return _assemble(enc, enc_content)


def test_aes256_r5_file_decrypts():
    pdf = pdf_of_bytes(_aes256_file(5))
    assert pdf.page_content(_page(pdf)) == _CONTENT


def test_aes256_r6_file_decrypts():
    pdf = pdf_of_bytes(_aes256_file(6))
    assert pdf.page_content(_page(pdf)) == _CONTENT


def test_encrypted_strings_decrypt_and_render():
    """Strings decrypt per object; the page renders through the scene."""
    import numpy as np

    from coherence_tpu.io import pdfgraphics as PG
    from coherence_tpu.raster import region
    from coherence_tpu.scene import cache, pdfscene, render as R

    cache.clear()
    o = bytes(range(32))
    key = _r3_key(o, -44)
    enc_content = PC.rc4(_obj_key(key, 4, 0), _CONTENT)
    title = PC.rc4(_obj_key(key, 6, 0), b"Secret Title")
    enc = (
        b"<< /Filter /Standard /V 2 /R 3 /Length 128 /P -44 /O <"
        + o.hex().encode() + b"> /U <" + (b"\x00" * 32).hex().encode() + b"> >>"
    )
    data = _assemble(enc, enc_content)
    extra = b"6 0 obj << /Title (" + title.replace(b"\\", rb"\\").replace(
        b"(", rb"\(").replace(b")", rb"\)") + b") >> endobj\n"
    data = data.replace(b"trailer", extra + b"trailer", 1)
    pdf = pdf_of_bytes(data)
    assert pdf.objects[6]["Title"] == b"Secret Title"
    g = PG.graphic_of_page(pdf, _page(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 100, 100)))
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    px = r4[35 - y0, 35 - x0]
    assert px[0] > 200 and px[3] > 200, px
    cache.clear()

# --- writer-side encryption (pdfcrypt.build_encryption + pdf_to_bytes) -------
#
# camlpdf's Pdfwrite can save encrypted files (the reference links all of
# camlpdf, /root/reference/Makefile:20); these tests round-trip every
# supported revision through OUR OWN reader, whose key derivation the tests
# above already pinned against a spec transcription.

from coherence_tpu.io.pdf import Name, Ref, Stream, mkpage, pdf_to_bytes


class _DetRand:
    """Deterministic byte source standing in for os.urandom in tests."""

    def __init__(self, seed: int = 0):
        self.n = seed

    def __call__(self, k: int) -> bytes:
        out = bytes(((self.n + i) * 37 + 11) % 256 for i in range(k))
        self.n += k
        return out


_BINARY = bytes(range(256)) + b"\r\n\\()\r tricky"


def _sample_pdf():
    pdf = mkpage(_CONTENT, mediabox=(0, 0, 100, 100))
    pdf.objects[5] = {"Title": b"Top (Secret) Title", "Blob": _BINARY}
    pdf.trailer["Info"] = Ref(5)
    return pdf


def _roundtrip(revision, modern, user_pw=b"", owner_pw=b"hunter2"):
    data = pdf_to_bytes(
        _sample_pdf(),
        modern=modern,
        encrypt={
            "revision": revision,
            "user_pw": user_pw,
            "owner_pw": owner_pw,
            "rand": _DetRand(revision),
        },
    )
    # Nothing sensitive appears in clear: neither the content stream (it is
    # Flate-compressed then encrypted) nor any string.
    assert b"Secret" not in data
    assert _BINARY not in data
    import zlib as _z

    assert _z.compress(_CONTENT) not in data
    pdf = pdf_of_bytes(data)
    assert pdf.page_content(_page(pdf)) == _CONTENT
    info = pdf.resolve(pdf.trailer["Info"])
    assert info["Title"] == b"Top (Secret) Title"
    assert info["Blob"] == _BINARY
    return data, pdf


def test_write_encrypted_all_revisions_classic_and_modern():
    for revision in (2, 3, 4, 5, 6):
        for modern in (False, True):
            _roundtrip(revision, modern)


def test_write_encrypted_deterministic():
    a, _ = _roundtrip(4, False)
    b, _ = _roundtrip(4, False)
    assert a == b


def test_write_encrypted_dict_shape():
    data, pdf = _roundtrip(6, True)
    enc = pdf.resolve(pdf.trailer["Encrypt"])
    assert enc["V"] == 5 and enc["R"] == 6
    assert len(enc["U"]) == 48 and len(enc["O"]) == 48
    assert len(enc["UE"]) == 32 and len(enc["OE"]) == 32
    assert len(enc["Perms"]) == 16
    # /O, /U etc. in the encryption dictionary are stored CLEAR: the reader
    # must see them verbatim to derive the key.
    data2, pdf2 = _roundtrip(2, False)
    enc2 = pdf2.resolve(pdf2.trailer["Encrypt"])
    assert len(enc2["O"]) == 32 and len(enc2["U"]) == 32 and enc2["V"] == 1


def test_write_encrypted_owner_password_authenticates_r6():
    """The owner password derives the same file key via /O + /OE."""
    from coherence_tpu.io.pdfcrypt import StandardSecurityHandler, build_encryption

    enc, handler = build_encryption(
        id0=_ID0, user_pw=b"", owner_pw=b"ownerpw", revision=6, rand=_DetRand(9)
    )
    again = StandardSecurityHandler(enc, _ID0, b"ownerpw")
    assert again.key == handler.key


def test_unencrypted_rewrite_of_decrypted_pdf_stays_plaintext():
    """Re-saving a decrypted file without `encrypt` must drop /Encrypt."""
    data, pdf = _roundtrip(4, False)
    out = pdf_to_bytes(pdf)
    assert b"Encrypt" not in out
    pdf2 = pdf_of_bytes(out)
    assert pdf2.page_content(_page(pdf2)) == _CONTENT


def test_write_encrypted_renders_after_reread():
    import numpy as np

    from coherence_tpu.io import pdfgraphics as PG
    from coherence_tpu.raster import region
    from coherence_tpu.scene import cache, pdfscene, render as R

    cache.clear()
    _, pdf = _roundtrip(6, True)
    g = PG.graphic_of_page(pdf, _page(pdf))
    scene = pdfscene.scene_of_graphic(pdf, g)
    spr = R.render_simple_scene(scene, region.shape_of_box((1, 1, 100, 100)))
    x0, y0, _, _ = spr.box
    r4 = np.asarray(spr.rgba)
    px = r4[35 - y0, 35 - x0]
    assert px[0] > 200 and px[3] > 200, px
    cache.clear()
