"""PDF import/export (parity: the reference's camlpdf dependency and the
vendored pdfgraphics.ml content-stream interpreter)."""
