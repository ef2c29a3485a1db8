"""T1–T6 parity vs the reference's own golden fixtures
(tests/ocr/data/test_data/*, oracle: tests/ocr/data/test_ocr_data.py)."""

import json

from img2table_spark.kernels.objects import Cell
from img2table_spark.kernels.text import (
    filter_words,
    get_text_cell,
    get_text_table,
    table_get_content,
)

from tests.conftest import load_table_json, load_words_csv


def test_filter_words_pages(ref_tests):
    words = load_words_csv(ref_tests / "ocr/data/test_data/ocr_df.csv")
    w = filter_words(words, page_number=1)
    assert (w["page"] == 1).all()
    # page 0 is falsy → no page filter (reference quirk, ocr/data.py:34)
    w0 = filter_words(words, page_number=0)
    assert set(w0["page"].unique()) == set(words["page"].unique())


def test_get_text_cell(ref_tests):
    """Oracle: tests/ocr/data/test_ocr_data.py:25-35."""
    words = load_words_csv(ref_tests / "ocr/data/test_data/ocr_df.csv")
    cell = Cell(x1=200, x2=800, y1=700, y2=850)
    result = get_text_cell(words, cell, min_confidence=50, page_number=0)
    assert (
        result
        == "http://www.landspeed.com/lsrinfo.asp.)\nUse these data to create\nChecklist for a Data Table."
    )


def test_get_text_table(ref_tests):
    """Oracle: tests/ocr/data/test_ocr_data.py:38-49."""
    words = load_words_csv(ref_tests / "ocr/data/test_data/ocr_df.csv")
    table = load_table_json(ref_tests / "ocr/data/test_data/table.json")
    result = get_text_table(words, table, page_number=0, min_confidence=50)

    with open(ref_tests / "ocr/data/test_data/expected_table.json") as f:
        expected = json.load(f)
    got = [
        [{"x1": c.x1, "y1": c.y1, "x2": c.x2, "y2": c.y2, "content": c.content} for c in row]
        for row in result.rows
    ]
    assert got == expected


def test_table_get_content_drops_empty(ref_tests):
    """T6: empty rows/cols removal semantics (reference: table.py:158-188)."""
    words = load_words_csv(ref_tests / "ocr/data/test_data/ocr_df.csv")
    table = load_table_json(ref_tests / "ocr/data/test_data/table.json")
    # Add an extra all-empty column far away plus an empty row; both must drop.
    for row in table.rows:
        row.append(Cell(5000, row[0].y1, 5100, row[0].y2))
    y2 = table.rows[-1][0].y2
    table.rows.append([Cell(c.x1, y2, c.x2, y2 + 50) for c in table.rows[-1]])
    n_rows_before = table.nb_rows

    result = table_get_content(table, words, min_confidence=50)
    assert result.nb_columns == 2
    assert result.nb_rows == n_rows_before - 1
    assert result.rows[0][0].content == "Number of Coils"


def test_single_unique_collapse(ref_tests):
    """A grid whose cells all share one value collapses to 1×1
    (reference: table.py:183-186)."""
    words = load_words_csv(ref_tests / "ocr/data/test_data/ocr_df.csv")
    # One real cell duplicated over the grid (merged-cell model).
    c = Cell(x1=439, y1=1581, x2=950, y2=1658)
    table_rows = [[c, c], [c, c]]
    from img2table_spark.kernels.objects import Table

    t = table_get_content(Table(rows=table_rows), words)
    assert t.nb_rows == 1 and t.nb_columns == 1
    assert t.rows[0][0].content == "Number of Coils"
