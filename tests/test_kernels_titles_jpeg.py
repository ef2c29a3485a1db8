"""JPEG decode (S1) + T8 title extraction parity vs the reference golden
(oracle: tests/tables/processing/text/test_titles.py — exact title text)."""

import json

import pandas as pd
import pytest

from img2table_spark.kernels.jpeg import decode_jpeg
from img2table_spark.kernels.objects import Cell, Table
from img2table_spark.kernels.titles import get_title_tables


@pytest.fixture(scope="module")
def title_fixture(ref_tests):
    base = ref_tests / "tables/processing/text/test_data"
    with open(base / "test.jpg", "rb") as f:
        img = decode_jpeg(f.read())
    with open(base / "table.json") as f:
        table = Table(rows=[[Cell(**el) for el in row] for row in json.load(f)])
    words = pd.read_csv(base / "ocr.csv", sep=";", dtype={"value": str})
    return img, table, words


def test_jpeg_decode(title_fixture):
    img, _, _ = title_fixture
    assert img.shape == (698, 1069, 3)
    assert img.dtype.name == "uint8"
    # white document background
    assert img.mean() > 200


def test_get_title_tables(title_fixture):
    img, table, words = title_fixture
    result = get_title_tables(img=img, tables=[table], words=words)
    assert result[0].title == "10 most populous countries"
    assert get_title_tables(img=img, tables=[], words=words) == []
