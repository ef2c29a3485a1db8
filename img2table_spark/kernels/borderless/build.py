"""L8–L12 — borderless table build, coherency checks, resize, dedup, driver.

Parity targets (reference):
  - get_table:           .../borderless_tables/table/table_creation.py:10-42
  - coherency checks:    .../borderless_tables/table/coherency.py:6-59
  - identify_table:      .../borderless_tables/table/__init__.py:11-31
  - coherent_table (L10): .../borderless_tables/__init__.py:16-58
  - deduplicate_tables:  .../borderless_tables/__init__.py:61-79
  - identify_borderless_tables: .../borderless_tables/__init__.py:82-129
    (here parameterized by pre-computed text-mask elements; the L1 RLSA
    mask + L2 element extraction live in kernels.imageops)
"""

from __future__ import annotations

import numpy as np

from img2table_spark.kernels.borderless.columns import identify_columns
from img2table_spark.kernels.borderless.layout import segment_image_columns
from img2table_spark.kernels.borderless.model import ColumnGroup, ImageSegment, TableSegment
from img2table_spark.kernels.borderless.rows import identify_delimiter_group_rows
from img2table_spark.kernels.borderless.table_segments import get_table_segments
from img2table_spark.kernels.cells import get_cells
from img2table_spark.kernels.common import is_contained_cell
from img2table_spark.kernels.objects import Cell, Line, Table
from img2table_spark.kernels.tables import cluster_to_table


def get_table(columns: ColumnGroup, row_delimiters: list[Cell], contours: list[Cell]) -> Table | None:
    """(reference: table/table_creation.py:10-42)"""
    v_lines = []
    for col in columns.columns:
        cells = sorted(
            (c for v_ws in col.whitespaces for c in v_ws.ws.cells), key=lambda c: c.y1 + c.y2
        )
        groups = [[cells[0]]]
        for c in cells[1:]:
            if c.y1 > groups[-1][-1].y2:
                groups.append([])
            groups[-1].append(c)
        v_lines += [
            Line(
                x1=(gp[0].x1 + gp[0].x2) // 2,
                y1=gp[0].y1,
                x2=(gp[0].x1 + gp[0].x2) // 2,
                y2=gp[-1].y2,
            )
            for gp in groups
        ]

    h_lines = [Line(x1=d.x1, y1=d.y1, x2=d.x2, y2=d.y2) for d in row_delimiters]
    cells = get_cells(horizontal_lines=h_lines, vertical_lines=v_lines)
    table = cluster_to_table(cluster_cells=cells, elements=contours, borderless=True)
    return table if table.nb_columns >= 3 and table.nb_rows >= 2 else None


def check_row_coherency(table: Table, median_line_sep: float) -> bool:
    if table.nb_rows < 2:
        return False
    seps = [
        (min(c.y1 for c in lower) + max(c.y2 for c in lower)
         - min(c.y1 for c in upper) - max(c.y2 for c in upper)) / 2
        for upper, lower in zip(table.rows, table.rows[1:])
    ]
    return float(np.median(seps)) >= median_line_sep / 3


def check_column_coherency(table: Table, char_length: float) -> bool:
    if table.nb_columns < 2:
        return False
    widths = []
    for idx in range(table.nb_columns):
        col_cells = [row[idx] for row in table.rows]
        widths.append(min(c.x2 for c in col_cells) - max(c.x1 for c in col_cells))
    return float(np.median(widths)) >= 3 * char_length


def check_table_coherency(table: Table, median_line_sep: float, char_length: float) -> bool:
    return check_row_coherency(table, median_line_sep) and check_column_coherency(table, char_length)


def identify_table(
    columns: ColumnGroup,
    row_delimiters: list[Cell],
    contours: list[Cell],
    median_line_sep: float,
    char_length: float,
) -> Table | None:
    table = get_table(columns, row_delimiters, contours)
    if table is not None and check_table_coherency(table, median_line_sep, char_length):
        return table
    return None


def coherent_table(tb: Table, elements: list[Cell]) -> Table | None:
    """L10: keep the contiguous row span where rows with ≥3 distinct cells
    own ≥2 elements (≥50% contained) (reference:
    borderless_tables/__init__.py:16-58)."""
    # unique (row_id, bbox) pairs; rows with ≥3 distinct cells
    row_cells: dict[int, set[tuple]] = {}
    for row_id, row in enumerate(tb.rows):
        for c in row:
            row_cells.setdefault(row_id, set()).add((c.x1, c.y1, c.x2, c.y2))
    relevant = {rid: cells for rid, cells in row_cells.items() if len(cells) >= 3}
    if not relevant:
        return None

    matching_rows = []
    for rid, cells in relevant.items():
        n = 0
        for (x1, y1, x2, y2) in cells:
            for el in elements:
                xo = min(x2, el.x2) - max(x1, el.x1)
                yo = min(y2, el.y2) - max(y1, el.y1)
                if xo > 0 and yo > 0 and (xo * yo) / max(el.area, 1) >= 0.5:
                    n += 1
        if n > 1:
            matching_rows.append(rid)

    if matching_rows:
        new_rows = tb.rows[min(matching_rows) : max(matching_rows) + 1]
        if len(new_rows) >= 2:
            return Table(rows=new_rows, borderless=True)
    return None


def _table_cell(tb: Table) -> Cell:
    return Cell(tb.x1, tb.y1, tb.x2, tb.y2)


def deduplicate_tables(identified_tables: list[Table], existing_tables: list[Table]) -> list[Table]:
    """L11 (reference: borderless_tables/__init__.py:61-79)."""
    identified_tables = sorted(
        identified_tables,
        key=lambda tb: (tb.x2 - tb.x1) * (tb.y2 - tb.y1),
        reverse=True,
    )
    final: list[Table] = []
    for table in identified_tables:
        tc = _table_cell(table)
        if not any(
            is_contained_cell(tc, _table_cell(tb), percentage=0.1)
            or is_contained_cell(_table_cell(tb), tc, percentage=0.1)
            for tb in existing_tables + final
        ):
            final.append(table)
    return final


def identify_borderless_tables_from_elements(
    img_elements: list[Cell],
    img_width: int,
    lines: list[Line],
    char_length: float,
    median_line_sep: float,
    contours: list[Cell],
    existing_tables: list[Table],
) -> list[Table]:
    """L4–L12 driver over a pre-computed text-mask element list (the L1/L2
    mask extraction feeds img_elements; reference:
    borderless_tables/__init__.py:82-129 + layout/__init__.py:16-49)."""
    if len(img_elements) == 0:
        return []
    y_min = min(el.y1 for el in img_elements)
    y_max = max(el.y2 for el in img_elements)
    image_segment = ImageSegment(x1=0, y1=y_min, x2=img_width, y2=y_max, elements=img_elements)

    col_segments = segment_image_columns(image_segment, char_length, lines)
    table_segments: list[TableSegment] = [
        ts
        for seg in col_segments
        for ts in get_table_segments(seg, char_length, median_line_sep)
    ]

    tables = []
    for table_segment in table_segments:
        column_group = identify_columns(table_segment, char_length)
        if column_group:
            row_delimiters = identify_delimiter_group_rows(column_group, contours)
            if row_delimiters:
                borderless = identify_table(
                    column_group, row_delimiters, contours, median_line_sep, char_length
                )
                if borderless:
                    corrected = coherent_table(borderless, table_segment.elements)
                    if corrected:
                        tables.append(corrected)

    return deduplicate_tables(tables, existing_tables)
