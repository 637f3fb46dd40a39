"""Standard-14 font metrics (PDF 9.6.2.2: /Widths may be omitted for the
base fonts; the reader knows them) — BEYOND REFERENCE: exact advances from
the BUNDLED widths table (data/std14_widths.txt.gz, generated from the URW
AFM clones), applied when a non-embedded standard font carries no /Widths.
No environment dependency; matplotlib is only the cross-validation oracle
in test_bundled_matches_matplotlib_afms."""

import pytest

from coherence_tpu.io import afm
from coherence_tpu.io.pdf import Name, mkpage
from coherence_tpu.scene import pdftext


def test_bundled_table_always_available():
    for name in afm._AFM_STEMS:
        got = afm.afm_widths(name)
        assert got is not None, name
        by_code, by_name = got
        assert len(by_name) > 180 and len(by_code) > 140, name


def test_bundled_matches_matplotlib_afms():
    """Cross-validate every bundled entry against the matplotlib AFM oracle."""
    if afm.matplotlib_afm_widths("Helvetica") is None:
        pytest.skip("matplotlib AFMs unavailable")
    for name in afm._AFM_STEMS:
        assert afm.afm_widths(name) == afm.matplotlib_afm_widths(name), name


def test_known_adobe_widths():
    w = afm.code_widths("Helvetica", None, {})
    assert (w[65], w[87], w[32], w[109]) == (0.667, 0.944, 0.278, 0.833)
    wb = afm.code_widths("Times-Bold", "WinAnsiEncoding", {})
    assert wb[65] == 0.722
    assert wb[0x95] == 0.35  # WinAnsi bullet
    assert wb[0xE9] == 0.444  # WinAnsi eacute
    ws = afm.code_widths("Symbol", None, {})
    assert ws[0x61] == 0.631  # alpha via the AFM's builtin encoding


def test_base_font_aliases():
    assert afm.std14_name("ABCDEF+Arial-BoldMT") == "Helvetica-Bold"
    assert afm.std14_name("TimesNewRoman,Italic") == "Times-Italic"
    assert afm.std14_name("CourierNew") == "Courier"
    assert afm.std14_name("Helvetica-BoldOblique") == "Helvetica-BoldOblique"
    assert afm.std14_name("Garamond") is None


def test_differences_override_encoding():
    w = afm.code_widths("Helvetica", None, {65: "emdash"})
    assert w[65] == 1.0


def test_loaded_font_uses_afm_when_widths_absent():
    pdf = mkpage(b"", mediabox=(0, 0, 100, 100))
    fd = {"Type": Name("Font"), "Subtype": Name("Type1"),
          "BaseFont": Name("Helvetica")}
    lf = pdftext._load_font(pdf, fd)
    assert lf.width_of_code(65) == 0.667
    assert lf.width_of_code(32) == 0.278


def test_explicit_widths_win_over_afm():
    pdf = mkpage(b"", mediabox=(0, 0, 100, 100))
    fd = {"Type": Name("Font"), "Subtype": Name("Type1"),
          "BaseFont": Name("Helvetica"),
          "FirstChar": 65, "Widths": [600]}
    lf = pdftext._load_font(pdf, fd)
    assert lf.width_of_code(65) == 0.6
