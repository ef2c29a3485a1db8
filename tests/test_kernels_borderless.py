"""L3–L10 parity vs the reference's golden fixtures
(tests/tables/processing/borderless_tables/**)."""

import json

from img2table_spark.kernels.borderless.build import identify_table
from img2table_spark.kernels.borderless.columns import get_columns_delimiters, identify_columns
from img2table_spark.kernels.borderless.layout import (
    Rectangle,
    get_column_group_segments,
    get_segments_from_columns,
    get_vertical_ws,
    identify_column_groups,
    identify_remaining_segments,
    is_column_section,
    segment_image_columns,
)
from img2table_spark.kernels.borderless.model import (
    Column,
    ColumnGroup,
    ImageSegment,
    TableSegment,
    VerticalWS,
    Whitespace,
)
from img2table_spark.kernels.borderless.rows import (
    correct_delimiter_width,
    filter_coherent_row_delimiters,
    identify_delimiter_group_rows,
    identify_row_delimiters,
)
from img2table_spark.kernels.borderless.table_segments import (
    coherent_table_areas,
    get_table_areas,
    get_table_segments,
)
from img2table_spark.kernels.borderless.whitespaces import (
    adjacent_whitespaces,
    get_relevant_vertical_whitespaces,
    get_whitespaces,
    identify_coherent_v_whitespaces,
)
from img2table_spark.kernels.objects import Cell, Line

BL = "tables/processing/borderless_tables"


def _key(c):
    return (c.x1, c.y1, c.x2, c.y2)


def _seg_key(s):
    return (s.x1, s.y1, s.x2, s.y2)


# ------------------------------------------------------------------- L3

def _image_segment(ref_tests):
    with open(ref_tests / BL / "borderless_tables/test_data/image_segment.json") as f:
        data = json.load(f)
    return ImageSegment(
        x1=data["x1"], y1=data["y1"], x2=data["x2"], y2=data["y2"],
        elements=[Cell(**c) for c in data["elements"]],
    )


def test_get_whitespaces(ref_tests):
    assert len(get_whitespaces(_image_segment(ref_tests), vertical=True)) == 38


def test_adjacent_and_coherent_whitespaces():
    c1 = Cell(0, 0, 10, 10)
    c2 = Cell(10, 0, 20, 10)
    c3 = Cell(10, 0, 20, 20)
    c4 = Cell(20, 0, 30, 10)
    assert adjacent_whitespaces(c1, c2)
    assert adjacent_whitespaces(c1, c3)
    assert not adjacent_whitespaces(c1, c4)

    v = [
        Cell(0, 0, 10, 10), Cell(10, 0, 20, 20), Cell(20, 0, 30, 10),
        Cell(50, 0, 60, 20), Cell(60, 0, 70, 18), Cell(70, 0, 80, 10),
        Cell(80, 0, 90, 20), Cell(100, 0, 110, 10),
    ]
    result = identify_coherent_v_whitespaces(v)
    expected = {(10, 0, 20, 20), (50, 0, 60, 20), (80, 0, 90, 20), (100, 0, 110, 10)}
    assert {_key(c) for c in result} == expected


def test_get_relevant_vertical_whitespaces(ref_tests):
    result = get_relevant_vertical_whitespaces(
        _image_segment(ref_tests), char_length=7.0, median_line_sep=14
    )
    assert len(result) == 12


# ------------------------------------------------------------------- L4

def test_identify_remaining_segments():
    result = identify_remaining_segments(
        Rectangle(x1=0, y1=0, x2=100, y2=100),
        [Cell(0, 25, 35, 40), Cell(59, 37, 78, 49)],
    )
    expected = [
        (0, 49, 100, 100), (0, 0, 100, 25), (35, 25, 100, 37),
        (0, 40, 59, 49), (78, 37, 100, 49),
    ]
    assert [_key(c) for c in result] == expected


def test_get_vertical_ws(ref_tests):
    with open(ref_tests / BL / "layout/test_data/lines.json") as f:
        data = json.load(f)
    lines = [Line(**el) for el in data["h_lines"] + data["v_lines"]]
    with open(ref_tests / BL / "layout/test_data/elements.json") as f:
        elements = [Cell(**el) for el in json.load(f)]
    seg = ImageSegment(x1=0, y1=49, x2=768, y2=967, elements=elements)
    result = get_vertical_ws(seg, char_length=5.04, lines=lines)
    assert [_key(ws) for ws in result] == [
        (0, 106, 56, 1054), (389, 116, 404, 1054), (737, 106, 768, 1054),
    ]


def test_is_column_section():
    g1 = [Cell(0, 100, 10, 300), Cell(148, 78, 153, 292), Cell(297, 113, 312, 302)]
    assert is_column_section(g1)
    assert not is_column_section(g1 + g1)
    g2 = [Cell(0, 100, 10, 300), Cell(148, 78, 153, 292), Cell(397, 113, 412, 302)]
    assert not is_column_section(g2)


def test_identify_column_groups(ref_tests):
    with open(ref_tests / BL / "layout/test_data/elements.json") as f:
        elements = [Cell(**el) for el in json.load(f)]
    seg = ImageSegment(x1=0, y1=49, x2=768, y2=967, elements=elements)
    vertical_ws = [Cell(0, 49, 51, 967), Cell(398, 64, 405, 967), Cell(732, 49, 768, 967)]
    result = identify_column_groups(seg, vertical_ws)
    assert len(result) == 1
    assert {_key(c) for c in result[0]} == {
        (398, 64, 405, 967), (0, 49, 51, 967), (732, 49, 768, 967)
    }


def test_get_column_group_segments():
    col_gp = [
        Cell(0, 0, 10, 100), Cell(30, 30, 40, 100),
        Cell(60, 0, 70, 100), Cell(90, 0, 100, 100),
    ]
    result = get_column_group_segments(col_gp)
    assert [_seg_key(s) for s in result] == [
        (5, 30, 35, 100), (35, 30, 65, 100), (65, 0, 95, 100), (5, 0, 65, 30),
    ]


def test_get_segments_from_columns(ref_tests):
    with open(ref_tests / BL / "layout/test_data/elements.json") as f:
        elements = [Cell(**el) for el in json.load(f)]
    seg = ImageSegment(x1=0, y1=49, x2=768, y2=967, elements=elements)
    col_gps = [[
        Cell(0, 0, 10, 100), Cell(30, 30, 40, 100),
        Cell(60, 0, 70, 100), Cell(90, 0, 100, 100),
    ]]
    result = get_segments_from_columns(seg, col_gps)
    assert [_seg_key(s) for s in result] == [
        (5, 30, 35, 100), (35, 30, 65, 100), (65, 0, 95, 100), (5, 0, 65, 30),
        (0, 49, 768, 0), (0, 100, 768, 967), (0, 0, 5, 100), (95, 0, 768, 100),
    ]


def test_segment_image_columns(ref_tests):
    with open(ref_tests / BL / "layout/test_data/lines.json") as f:
        data = json.load(f)
    lines = [Line(**el) for el in data["h_lines"] + data["v_lines"]]
    with open(ref_tests / BL / "layout/test_data/elements.json") as f:
        elements = [Cell(**el) for el in json.load(f)]
    seg = ImageSegment(x1=0, y1=0, x2=793, y2=1123, elements=elements)
    assert len(segment_image_columns(seg, char_length=6.0, lines=lines)) == 3


# ------------------------------------------------------------------- L5

_ELEMENTS_L5 = [
    Cell(10, 10, 20, 20), Cell(30, 10, 40, 20), Cell(50, 10, 60, 20),
    Cell(10, 25, 20, 35), Cell(30, 25, 40, 35), Cell(50, 25, 60, 35),
    Cell(10, 40, 20, 50), Cell(50, 40, 60, 50),
    Cell(10, 100, 20, 110), Cell(30, 100, 40, 110), Cell(50, 100, 60, 110),
    Cell(10, 200, 20, 210), Cell(30, 200, 40, 210), Cell(50, 200, 60, 210),
]


def test_get_table_areas():
    seg = ImageSegment(x1=0, y1=0, x2=1000, y2=1000, elements=_ELEMENTS_L5)
    result = get_table_areas(seg, char_length=4, median_line_sep=10)
    assert [(_seg_key(a), a.position) for a in result] == [
        ((6, 10, 64, 20), 1), ((6, 25, 64, 35), 2), ((6, 40, 64, 50), 3),
        ((6, 100, 64, 110), 4), ((6, 200, 64, 210), 5),
    ]
    assert [_key(ws) for ws in result[2].whitespaces] == [
        (6, 40, 10, 50), (20, 40, 50, 50), (60, 40, 64, 50)
    ]


def test_coherent_table_areas_and_segments():
    seg = ImageSegment(x1=0, y1=0, x2=1000, y2=1000, elements=_ELEMENTS_L5)
    areas = get_table_areas(seg, char_length=4, median_line_sep=10)
    assert coherent_table_areas(areas[0], areas[1], char_length=4, median_line_sep=10)
    assert not coherent_table_areas(areas[0], areas[3], char_length=4, median_line_sep=10)

    segments = get_table_segments(seg, char_length=4, median_line_sep=10)
    assert [len(ts.table_areas) for ts in segments] == [3, 1, 1]


# ------------------------------------------------------------------- L6

def _table_segment(ref_tests) -> TableSegment:
    with open(ref_tests / BL / "columns/test_data/table_segment.json") as f:
        data = json.load(f)
    return TableSegment(
        table_areas=[
            ImageSegment(
                x1=tb["x1"], y1=tb["y1"], x2=tb["x2"], y2=tb["y2"],
                elements=[Cell(**el) for el in tb["elements"]],
                whitespaces=[Whitespace(cells=[Cell(**el)]) for el in tb["whitespaces"]],
                position=tb["position"],
            )
            for tb in data["table_areas"]
        ]
    )


def test_get_columns_delimiters(ref_tests):
    result = get_columns_delimiters(_table_segment(ref_tests), char_length=14)
    got = [[_key(c) for v in col.whitespaces for c in v.ws.cells] for col in result]
    assert got == [
        [(7, 0, 21, 544), (7, 496, 21, 660)],
        [(270, 69, 372, 544), (270, 496, 372, 626)],
        [(1659, 69, 1758, 544), (1659, 496, 1758, 626)],
        [(1845, 0, 1859, 544), (1845, 496, 1859, 660)],
    ]


def test_identify_columns(ref_tests):
    result = identify_columns(_table_segment(ref_tests), char_length=14)
    with open(ref_tests / BL / "columns/test_data/delimiter_group.json") as f:
        data = json.load(f)
    expected = ColumnGroup(
        columns=[
            Column(whitespaces=[VerticalWS(ws=Whitespace(cells=[Cell(**d)])) for d in col])
            for col in data["columns"]
        ],
        elements=[Cell(**el) for el in data["elements"]],
        char_length=14,
    )
    got = [[_key(c) for v in col.whitespaces for c in v.ws.cells] for col in result.columns]
    want = [[_key(c) for v in col.whitespaces for c in v.ws.cells] for col in expected.columns]
    assert got == want
    assert {_key(e) for e in result.elements} == {_key(e) for e in expected.elements}


# ------------------------------------------------------------------- L7

def test_identify_row_delimiters(ref_tests):
    with open(ref_tests / BL / "rows/test_data/delimiter_group.json") as f:
        data = json.load(f)
    column_group = ColumnGroup(
        columns=[
            Column(whitespaces=[VerticalWS(ws=Whitespace(cells=[Cell(**col)]))])
            for col in data["delimiters"]
        ],
        elements=[Cell(**el) for el in data["elements"]],
        char_length=14,
    )
    result = identify_row_delimiters(column_group)
    with open(ref_tests / BL / "rows/test_data/h_whitespaces.json") as f:
        expected = [Cell(**c) for c in json.load(f)]
    assert [_key(c) for c in result] == [_key(c) for c in expected]


def test_filter_coherent_row_delimiters():
    row_delimiters = [Cell(0, 0, 100, 0), Cell(0, 10, 80, 10), Cell(0, 20, 100, 20)]
    column_group = ColumnGroup(
        columns=[
            Column([VerticalWS(Whitespace(cells=[Cell(x, 0, x, 20)]))]) for x in (0, 30, 60, 100)
        ],
        elements=[Cell(85, 2, 95, 7)],
        char_length=14,
    )
    result = filter_coherent_row_delimiters(row_delimiters, column_group)
    assert [_key(c) for c in result] == [(0, 0, 100, 0), (0, 20, 100, 20)]


def test_correct_delimiter_width():
    row_delimiters = [
        Cell(0, 0, 100, 0), Cell(0, 10, 80, 10), Cell(30, 20, 100, 20), Cell(0, 30, 100, 30)
    ]
    contours = [Cell(23, 12, 34, 18), Cell(86, 2, 93, 9), Cell(3, 18, 17, 24)]
    result = correct_delimiter_width(row_delimiters, contours)
    assert _key(result[0]) == (0, 0, 100, 0)
    assert _key(result[1]) == (0, 10, 100, 10)


def test_identify_delimiter_group_rows(ref_tests):
    with open(ref_tests / BL / "rows/test_data/delimiter_group.json") as f:
        data = json.load(f)
    column_group = ColumnGroup(
        columns=[
            Column(whitespaces=[VerticalWS(ws=Whitespace(cells=[Cell(**col)]))])
            for col in data["delimiters"]
        ],
        elements=[Cell(**el) for el in data["elements"]],
        char_length=14,
    )
    with open(ref_tests / BL / "rows/test_data/contours.json") as f:
        contours = [Cell(**el) for el in json.load(f)]
    result = identify_delimiter_group_rows(column_group, contours)
    # oracle: reference test_rows.py:68-86
    assert len(result) == 18
    assert min(d.y1 for d in result) == 45
    assert max(d.y2 for d in result) == 1147
    assert min(d.x1 for d in result) == 93
    assert max(d.x2 for d in result) == 1233


# ------------------------------------------------------------------- L8/L9

def test_identify_table(ref_tests):
    with open(ref_tests / BL / "table/test_data/delimiter_group.json") as f:
        data = json.load(f)
    column_group = ColumnGroup(
        columns=[
            Column(whitespaces=[VerticalWS(ws=Whitespace(cells=[Cell(**col)]))])
            for col in data["delimiters"]
        ],
        elements=[Cell(**c) for c in data["elements"]],
        char_length=4.66,
    )
    with open(ref_tests / BL / "table/test_data/contours.json") as f:
        contours = [Cell(**el) for el in json.load(f)]
    with open(ref_tests / BL / "table/test_data/rows.json") as f:
        row_delimiters = [Cell(**c) for c in json.load(f)]
    result = identify_table(
        columns=column_group,
        row_delimiters=row_delimiters,
        contours=contours,
        median_line_sep=16,
        char_length=4.66,
    )
    assert result.nb_rows == 17
    assert result.nb_columns == 8
    assert (result.x1, result.y1, result.x2, result.y2) == (91, 45, 1235, 1147)
