"""B10 — implicit rows/columns: whitespace-derived synthetic lines, then
cell re-identification and grid rebuild.

Parity target: reference
src/img2table/tables/processing/bordered_tables/tables/implicit.py:12-115.
"""

from __future__ import annotations

from img2table_spark.kernels.borderless.model import ImageSegment, Whitespace
from img2table_spark.kernels.borderless.whitespaces import get_whitespaces
from img2table_spark.kernels.cells import get_cells
from img2table_spark.kernels.objects import Cell, Line, Table
from img2table_spark.kernels.tables import cluster_to_table, table_lines


def implicit_rows_lines(table: Table, segment: ImageSegment, existing_lines: list[Line] | None = None) -> list[Line]:
    """(reference: implicit.py:12-54)"""
    h_ws = get_whitespaces(segment=segment, vertical=False, pct=1)

    if h_ws[0].y1 > segment.y1:
        up_ws = Whitespace(
            cells=[
                Cell(
                    x1=min(ws.x1 for ws in h_ws),
                    y1=segment.y1,
                    x2=max(ws.x2 for ws in h_ws),
                    y2=min(el.y1 for el in segment.elements),
                )
            ]
        )
        h_ws.insert(0, up_ws)

    if h_ws[-1].y2 < segment.y2:
        down_ws = Whitespace(
            cells=[
                Cell(
                    x1=min(ws.x1 for ws in h_ws),
                    y1=segment.y2,
                    x2=max(ws.x2 for ws in h_ws),
                    y2=max(el.y2 for el in segment.elements),
                )
            ]
        )
        h_ws.append(down_ws)

    # Keep middle whitespaces at least half the median full-width ws height
    if len(h_ws) > 2:
        max_w = max(w.width for w in h_ws)
        full_h = sorted(ws.height for ws in h_ws[1:-1] if ws.width == max_w)
        min_height = (
            0.5 * full_h[len(full_h) // 2 + len(full_h) % 2 - 1] if len(full_h) >= 3 else 1
        )
        h_ws = [h_ws[0]] + [ws for ws in h_ws[1:-1] if ws.height >= min_height] + [h_ws[-1]]

    lines = existing_lines if existing_lines is not None else table_lines(table)
    created = []
    for ws in h_ws:
        if not any(ln for ln in lines if ws.y1 <= ln.y1 <= ws.y2 and ln.horizontal):
            mid = (ws.y1 + ws.y2) // 2
            created.append(Line(x1=table.x1, y1=mid, x2=table.x2, y2=mid))
    return created


def implicit_columns_lines(
    table: Table, segment: ImageSegment, char_length: float, existing_lines: list[Line] | None = None
) -> list[Line]:
    """(reference: implicit.py:57-80)"""
    v_ws = get_whitespaces(segment=segment, vertical=True, min_width=char_length, pct=1)
    lines = existing_lines if existing_lines is not None else table_lines(table)
    created = []
    for ws in v_ws:
        if not any(ln for ln in lines if ws.x1 <= ln.x1 <= ws.x2 and ln.vertical):
            mid = (ws.x1 + ws.x2) // 2
            created.append(Line(x1=mid, y1=table.y1, x2=mid, y2=table.y2))
    return created


def implicit_content(
    table: Table,
    contours: list[Cell],
    char_length: float,
    implicit_rows: bool = False,
    implicit_columns: bool = False,
) -> Table:
    """(reference: implicit.py:83-115)"""
    if not implicit_rows and not implicit_columns:
        return table

    tb_contours = [
        c
        for c in contours
        if c.x1 >= table.x1 and c.x2 <= table.x2 and c.y1 >= table.y1 and c.y2 <= table.y2
    ]
    segment = ImageSegment(
        x1=table.x1, y1=table.y1, x2=table.x2, y2=table.y2, elements=tb_contours
    )

    lines = table_lines(table)
    if implicit_rows:
        lines += implicit_rows_lines(table=table, segment=segment, existing_lines=lines)
    if implicit_columns:
        lines += implicit_columns_lines(
            table=table, segment=segment, char_length=char_length, existing_lines=lines
        )

    cells = get_cells(
        horizontal_lines=[ln for ln in lines if ln.horizontal],
        vertical_lines=[ln for ln in lines if ln.vertical],
    )
    return cluster_to_table(cluster_cells=cells, elements=tb_contours, borderless=False)
