"""Reader robustness: corrupted/truncated PDFs must fail cleanly (any
exception) or degrade, never hang or corrupt state — the engine's event
loop contains handler failures, so a clean raise keeps the app alive
(unlike the reference, whose uncaught failures abort both processes)."""

import signal
import zlib

import numpy as np
import pytest

from coherence_tpu.io import pdfgraphics as PG
from coherence_tpu.io.pdf import Name, Stream, mkpage, pdf_of_bytes, pdf_to_bytes
from coherence_tpu.raster import region
from coherence_tpu.scene import cache, pdfscene, render as R


def _rich_pdf_bytes() -> bytes:
    """A feature-dense one-page PDF: paths, clip, text, shading, image."""
    img = Stream(
        {"Type": Name("XObject"), "Subtype": Name("Image"),
         "Width": 2, "Height": 2, "BitsPerComponent": 8,
         "ColorSpace": Name("DeviceRGB"), "Filter": Name("FlateDecode")},
        zlib.compress(bytes(range(12))),
    )
    sh = {"ShadingType": 2, "ColorSpace": Name("DeviceRGB"),
          "Coords": [0.0, 0.0, 50.0, 0.0],
          "Function": {"FunctionType": 2, "Domain": [0.0, 1.0],
                       "C0": [1.0, 0.0, 0.0], "C1": [0.0, 0.0, 1.0], "N": 1.0}}
    font = {"Type": Name("Font"), "Subtype": Name("Type1"),
            "BaseFont": Name("Helvetica")}
    content = (b"q 5 5 90 90 re W n "
               b"0.2 0.9 0.1 rg 10 10 40 40 re f "
               b"2 w 0 0 1 RG 20 60 m 80 60 l S "
               b"q 20 0 0 20 30 30 cm /Im0 Do Q "
               b"q /Sh0 sh Q "
               b"BT /F0 12 Tf 10 80 Td (fuzz) Tj ET Q")
    pdf = mkpage(content, mediabox=(0, 0, 100, 100),
                 resources={"XObject": {"Im0": img}, "Shading": {"Sh0": sh},
                            "Font": {"F0": font}})
    return pdf_to_bytes(pdf)


class _Budget:
    """SIGALRM guard: a mutation that loops forever fails the test rather
    than hanging the suite."""

    def __init__(self, seconds):
        self.seconds = seconds

    def __enter__(self):
        signal.signal(signal.SIGALRM, self._fire)
        signal.alarm(self.seconds)

    @staticmethod
    def _fire(signum, frame):
        raise TimeoutError("fuzz case exceeded its time budget")

    def __exit__(self, *exc):
        signal.alarm(0)


def _try_full_pipeline(data: bytes):
    pdf = pdf_of_bytes(data)
    pages = pdf.resolve(pdf.resolve(pdf.trailer["Root"])["Pages"])
    page = pdf.resolve(pages["Kids"][0])
    g = PG.graphic_of_page(pdf, page)
    scene = pdfscene.scene_of_graphic(pdf, g)
    if scene:
        R.render_simple_scene(
            list(reversed(scene)), region.shape_of_box((1, 1, 100, 100))
        )


def test_corrupted_pdfs_fail_cleanly():
    base = _rich_pdf_bytes()
    rng = np.random.RandomState(0)
    survived = 0
    for trial in range(40):
        data = bytearray(base)
        kind = trial % 4
        if kind == 0:  # truncate
            data = data[: rng.randint(1, len(data))]
        elif kind == 1:  # flip random bytes
            for _ in range(rng.randint(1, 12)):
                data[rng.randint(0, len(data))] = rng.randint(0, 256)
        elif kind == 2:  # splice garbage
            at = rng.randint(0, len(data))
            data[at:at] = bytes(rng.randint(0, 256, rng.randint(1, 64)).tolist())
        else:  # delete a slice
            a = rng.randint(0, len(data) - 1)
            b = min(len(data), a + rng.randint(1, 200))
            del data[a:b]
        cache.clear()
        try:
            with _Budget(30):
                _try_full_pipeline(bytes(data))
            survived += 1  # degraded-but-parsed is fine
        except TimeoutError:
            raise AssertionError(f"fuzz case {trial} hung")
        except Exception:
            pass  # clean failure
    cache.clear()
    # sanity: the uncorrupted base parses and renders
    _try_full_pipeline(base)
    assert survived >= 0  # informational; the real assertion is no hang


def test_garbage_bytes_raise():
    rng = np.random.RandomState(1)
    for n in (0, 1, 10, 1000):
        blob = bytes(rng.randint(0, 256, n).tolist())
        with _Budget(10):
            with pytest.raises(Exception):
                _try_full_pipeline(blob)
