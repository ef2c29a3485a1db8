"""B10 + L3 parity vs reference goldens
(tests/tables/processing/bordered_tables/tables/test_implicit.py)."""

import json

from img2table_spark.kernels.borderless.model import ImageSegment
from img2table_spark.kernels.implicit import (
    implicit_columns_lines,
    implicit_content,
    implicit_rows_lines,
)
from img2table_spark.kernels.objects import Cell, Table

B = "tables/processing/bordered_tables/tables/test_data"


def _load(ref_tests):
    with open(ref_tests / B / "table_implicit.json") as f:
        table = Table(rows=[[Cell(**el) for el in row] for row in json.load(f)])
    with open(ref_tests / B / "contours_implicit.json") as f:
        contours = [Cell(**el) for el in json.load(f)]
    segment = ImageSegment(
        x1=table.x1, y1=table.y1, x2=table.x2, y2=table.y2, elements=contours
    )
    return table, contours, segment


def test_implicit_rows_lines(ref_tests):
    table, _, segment = _load(ref_tests)
    result = implicit_rows_lines(table=table, segment=segment)
    width = table.x2 - table.x1
    assert all(ln.width == width for ln in result)
    assert sorted(ln.y1 for ln in result) == [
        682, 716, 784, 817, 884, 919, 986, 1020, 1089, 1121,
        1189, 1223, 1292, 1325, 1394, 1427, 1494, 1529, 1597, 1630,
    ]


def test_implicit_columns_lines(ref_tests):
    table, _, segment = _load(ref_tests)
    result = implicit_columns_lines(table=table, segment=segment, char_length=11)
    height = table.y2 - table.y1
    assert all(ln.height == height for ln in result)
    assert sorted(ln.x1 for ln in result) == [395, 605, 725, 809, 886, 1212, 1285, 1396]


def test_implicit_content(ref_tests):
    table, contours, _ = _load(ref_tests)
    result = implicit_content(
        table=table,
        contours=contours,
        char_length=11,
        implicit_rows=True,
        implicit_columns=True,
    )
    assert result.nb_rows == table.nb_rows + 20
    assert result.nb_columns == table.nb_columns + 8
