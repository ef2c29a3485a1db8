"""B2–B9, B11 parity vs the reference's golden fixtures
(tests/tables/processing/bordered_tables/**; oracles: the reference's own
test assertions, replicated here)."""

import json

import pandas as pd

from img2table_spark.kernels.cells import (
    deduplicate_cells,
    get_cells,
    get_cells_dataframe,
)
from img2table_spark.kernels.objects import Cell, Line, Table
from img2table_spark.kernels.tables import (
    add_semi_bordered_cells,
    cluster_cells_in_tables,
    cluster_to_table,
    get_tables,
    merge_consecutive_tables,
    normalize_table_cells,
    remove_unwanted_elements,
    table_lines,
)

B = "tables/processing/bordered_tables"


def _cells_csv(path):
    df = pd.read_csv(path, sep=";")
    return [Cell(x1=r.x1, y1=r.y1, x2=r.x2, y2=r.y2) for r in df.itertuples()]


def _key(c: Cell):
    return (c.x1, c.y1, c.x2, c.y2)


def _load_lines(path):
    with open(path) as f:
        data = json.load(f)
    h = [Line(**el) for el in data["h_lines"]]
    v = [Line(**el) for el in data["v_lines"]]
    return h, v


def test_get_cells_dataframe(ref_tests):
    h, v = _load_lines(ref_tests / B / "cells/test_data/lines.json")
    result = get_cells_dataframe(h, v)
    expected = _cells_csv(ref_tests / B / "cells/test_data/expected_ident_cells.csv")
    assert sorted(map(_key, result)) == sorted(map(_key, expected))


def test_deduplicate_cells(ref_tests):
    cells = _cells_csv(ref_tests / B / "cells/test_data/expected_ident_cells.csv")
    result = deduplicate_cells(cells)
    expected = _cells_csv(ref_tests / B / "cells/test_data/expected.csv")
    assert sorted(map(_key, result)) == sorted(map(_key, expected))


def test_get_cells(ref_tests):
    h, v = _load_lines(ref_tests / B / "cells/test_data/lines.json")
    result = get_cells(h, v)
    expected = _cells_csv(ref_tests / B / "cells/test_data/expected.csv")
    assert sorted(map(_key, result)) == sorted(map(_key, expected))


def test_cluster_cells_in_tables(ref_tests):
    with open(ref_tests / B / "tables/test_data/cells.json") as f:
        cells = [Cell(**el) for el in json.load(f)]
    result = cluster_cells_in_tables(cells)
    with open(ref_tests / B / "tables/test_data/cells_clustered.json") as f:
        expected = [[Cell(**el) for el in cl] for cl in json.load(f)]
    got = {frozenset(map(_key, cl)) for cl in result}
    want = {frozenset(map(_key, cl)) for cl in expected}
    assert got == want


def test_normalize_table_cells(ref_tests):
    with open(ref_tests / B / "tables/test_data/cells_clustered.json") as f:
        clusters = [[Cell(**el) for el in cl] for cl in json.load(f)]
    result = [normalize_table_cells(cl) for cl in clusters]
    with open(ref_tests / B / "tables/test_data/cell_clusters_normalized.json") as f:
        expected = [[Cell(**el) for el in cl] for cl in json.load(f)]
    assert [[_key(c) for c in cl] for cl in result] == [
        [_key(c) for c in cl] for cl in expected
    ]


def test_remove_unwanted_elements():
    """Oracle: reference test_table_creation.py (inline golden)."""
    rows = []
    for y1 in (0, 20, 40):
        rows.append([Cell(x, y1, x + 20, y1 + 20) for x in (0, 20, 40)])
    table = Table(rows=rows)
    elements = [
        Cell(25, 5, 35, 15),
        Cell(45, 5, 55, 15),
        Cell(25, 25, 35, 35),
        Cell(45, 25, 55, 35),
    ]
    result = remove_unwanted_elements(table, elements)
    got = [[_key(c) for c in row] for row in result.rows]
    assert got == [
        [(20, 0, 40, 20), (40, 0, 60, 20)],
        [(20, 20, 40, 40), (40, 20, 60, 40)],
    ]


def test_cluster_to_table(ref_tests):
    with open(ref_tests / B / "tables/test_data/cell_clusters_normalized.json") as f:
        clusters = [[Cell(**el) for el in cl] for cl in json.load(f)]
    with open(ref_tests / B / "tables/test_data/contours.json") as f:
        contours = [Cell(**el) for el in json.load(f)]
    result = [cluster_to_table(cl, contours) for cl in clusters]
    with open(ref_tests / B / "tables/test_data/tables_from_cells.json") as f:
        expected = json.load(f)
    got = [[[_key(c) for c in row] for row in tb.rows] for tb in result]
    want = [
        [[(el["x1"], el["y1"], el["x2"], el["y2"]) for el in row] for row in tb]
        for tb in expected
    ]
    assert got == want


def test_semi_bordered_cells():
    """Oracle: reference test_semi_bordered.py (inline golden)."""
    cluster = [Cell(x1=100, x2=200, y1=100, y2=200)]
    lines = [
        Line(x1=50, x2=205, y1=100, y2=100),
        Line(x1=50, x2=205, y1=200, y2=200),
        Line(x1=100, x2=100, y1=30, y2=270),
        Line(x1=200, x2=200, y1=30, y2=270),
    ]
    result = add_semi_bordered_cells(cluster, lines, char_length=5)
    expected = [
        (100, 100, 200, 200),
        (50, 200, 100, 270),
        (100, 30, 200, 100),
        (50, 30, 100, 100),
        (100, 200, 200, 270),
        (50, 100, 100, 200),
    ]
    assert sorted(map(_key, result)) == sorted(expected)


def test_get_tables(ref_tests):
    with open(ref_tests / B / "tables/test_data/cells.json") as f:
        cells = [Cell(**el) for el in json.load(f)]
    with open(ref_tests / B / "tables/test_data/contours.json") as f:
        contours = [Cell(**el) for el in json.load(f)]
    h, v = _load_lines(ref_tests / B / "tables/test_data/lines.json")
    result = get_tables(cells=cells, elements=contours, lines=h + v, char_length=8.44)
    with open(ref_tests / B / "tables/test_data/expected.json") as f:
        expected = json.load(f)
    got = sorted(
        [sorted(_key(c) for row in tb.rows for c in row) for tb in result]
    )
    want = sorted(
        [
            sorted((el["x1"], el["y1"], el["x2"], el["y2"]) for row in tb for el in row)
            for tb in expected
        ]
    )
    assert got == want


def test_table_lines_and_merge_consecutive():
    rows1 = [[Cell(0, 0, 50, 20), Cell(50, 0, 100, 20)]]
    rows2 = [[Cell(0, 25, 50, 45), Cell(50, 25, 100, 45)]]
    t1, t2 = Table(rows=rows1), Table(rows=rows2)
    lines = table_lines(t1)
    assert sum(ln.vertical for ln in lines) == 3  # merged shared edge
    assert sum(ln.horizontal for ln in lines) == 2
    merged = merge_consecutive_tables([t1, t2], contours=[])
    assert len(merged) == 1 and merged[0].nb_rows == 2
    # with a contour in between → no merge
    sep = merge_consecutive_tables([t1, t2], contours=[Cell(10, 21, 30, 24)])
    assert len(sep) == 2
