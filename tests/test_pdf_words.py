"""S4 word-table parity vs the pdfium golden
(tests/ocr/pdf/test_data/ocr_df.csv): values and line parents exact,
bboxes within 3px (font-metric charboxes vs pdfium glyph boxes; word-id
numbering differs only by pdfium's synthesized line-break characters)."""

import numpy as np
import pandas as pd
import pytest

from img2table_spark.kernels.pdf_doc import chars_to_pixel, cluster_words
from img2table_spark.kernels.pdf_native import PdfDocument, interpret_page

from tests.conftest import load_words_csv


def test_pdf_word_table(ref_tests):
    base = ref_tests / "ocr/pdf/test_data"
    with open(base / "test.pdf", "rb") as f:
        doc = PdfDocument(f.read())
    words = []
    for pi, page in enumerate(doc.pages()):
        media = [float(doc.resolve(v)) for v in doc.resolve(page.get("MediaBox", [0, 0, 612, 792]))]
        chars, _ = interpret_page(doc, page)
        words += cluster_words(chars_to_pixel(chars, media[3] - media[1]), pi)
    mine = pd.DataFrame(words)
    exp = load_words_csv(base / "ocr_df.csv")

    assert len(mine) == len(exp) == 217
    assert mine["value"].tolist() == exp["value"].tolist()
    assert (mine["parent"] == exp["parent"]).all()
    assert (mine["confidence"] == 99).all()
    for c in ("x1", "y1", "x2", "y2"):
        assert int(np.abs(mine[c].to_numpy() - exp[c].to_numpy()).max()) <= 3, c
