"""L7 — row delimiters within a column group.

Parity target: reference
src/img2table/tables/processing/borderless_tables/rows.py:7-174.
"""

from __future__ import annotations

from img2table_spark.kernels.borderless.model import ColumnGroup, Whitespace
from img2table_spark.kernels.borderless.whitespaces import get_whitespaces
from img2table_spark.kernels.objects import Cell


def identify_row_delimiters(column_group: ColumnGroup) -> list[Cell]:
    """(reference: rows.py:7-69)"""
    h_ws = get_whitespaces(segment=column_group, vertical=False, pct=0.66)

    if h_ws[0].y1 > column_group.y1:
        h_ws.insert(
            0,
            Whitespace(
                cells=[
                    Cell(
                        x1=min(ws.x1 for ws in h_ws),
                        y1=column_group.y1,
                        x2=max(ws.x2 for ws in h_ws),
                        y2=min(el.y1 for el in column_group.elements),
                    )
                ]
            ),
        )
    if h_ws[-1].y2 < column_group.y2:
        h_ws.append(
            Whitespace(
                cells=[
                    Cell(
                        x1=min(ws.x1 for ws in h_ws),
                        y1=column_group.y2,
                        x2=max(ws.x2 for ws in h_ws),
                        y2=max(el.y2 for el in column_group.elements),
                    )
                ]
            )
        )

    if len(h_ws) > 2:
        max_w = max(w.width for w in h_ws)
        full_h = sorted(ws.height for ws in h_ws[1:-1] if ws.width == max_w)
        min_height = 0.5 * full_h[len(full_h) // 2 + len(full_h) % 2 - 1] if len(full_h) >= 3 else 1
        h_ws = [h_ws[0]] + [ws for ws in h_ws[1:-1] if ws.height >= min_height] + [h_ws[-1]]

    # adjacency dedup by width
    deleted = []
    for i in range(len(h_ws)):
        for j in range(i, len(h_ws)):
            adjacent = len({h_ws[i].y1, h_ws[i].y2} & {h_ws[j].y1, h_ws[j].y2}) > 0
            if adjacent:
                if h_ws[i].width > h_ws[j].width:
                    deleted.append(j)
                elif h_ws[i].width < h_ws[j].width:
                    deleted.append(i)
    h_ws = [ws for idx, ws in enumerate(h_ws) if idx not in deleted]

    final_delims = []
    for ws in h_ws:
        if ws.y1 == column_group.y1 or ws.y2 == column_group.y2:
            continue
        mid = (ws.y1 + ws.y2) // 2
        final_delims.append(Cell(x1=ws.x1, y1=mid, x2=ws.x2, y2=mid))

    x1_els = min(el.x1 for el in column_group.elements)
    x2_els = max(el.x2 for el in column_group.elements)
    y1_els = min(el.y1 for el in column_group.elements)
    y2_els = max(el.y2 for el in column_group.elements)
    final_delims += [
        Cell(x1=x1_els, y1=y1_els, x2=x2_els, y2=y1_els),
        Cell(x1=x1_els, y1=y2_els, x2=x2_els, y2=y2_els),
    ]
    return sorted(final_delims, key=lambda d: d.y1)


def filter_coherent_row_delimiters(row_delimiters: list[Cell], column_group: ColumnGroup) -> list[Cell]:
    """Drop narrow delimiters whose area above or below (between bounding
    columns) holds no element (reference: rows.py:72-121)."""
    max_width = max(d.width for d in row_delimiters)

    to_delete = []
    for idx, delim in enumerate(row_delimiters):
        if delim.width >= 0.95 * max_width:
            continue

        def contained(area: Cell) -> list[Cell]:
            cols = sorted(
                (
                    col
                    for col in column_group.columns
                    if min(area.y2, col.y2) - max(area.y1, col.y1) >= 0.8 * area.height
                    and area.x1 <= col.x1 <= area.x2
                ),
                key=lambda c: c.x1,
            )
            if not cols:
                return []
            return [
                el
                for el in column_group.elements
                if el.y1 >= area.y1
                and el.y2 <= area.y2
                and el.x1 >= cols[0].x2
                and el.x2 <= cols[-1].x1
            ]

        upper_delim = row_delimiters[idx - 1]
        upper = contained(
            Cell(
                x1=max(delim.x1, upper_delim.x1),
                y1=upper_delim.y2,
                x2=min(delim.x2, upper_delim.x2),
                y2=delim.y1,
            )
        )
        bottom_delim = row_delimiters[idx + 1]
        bottom = contained(
            Cell(
                x1=max(delim.x1, bottom_delim.x1),
                y1=delim.y2,
                x2=min(delim.x2, bottom_delim.x2),
                y2=bottom_delim.y1,
            )
        )
        if len(upper) * len(bottom) == 0:
            to_delete.append(idx)

    return [d for idx, d in enumerate(row_delimiters) if idx not in to_delete]


def correct_delimiter_width(row_delimiters: list[Cell], contours: list[Cell]) -> list[Cell]:
    """Widen delimiters up to blocking contours (reference: rows.py:124-151)."""
    x_min = min(d.x1 for d in row_delimiters)
    x_max = max(d.x2 for d in row_delimiters)

    for idx, delim in enumerate(row_delimiters):
        if delim.width == x_max - x_min:
            continue
        left = [
            c
            for c in contours
            if c.y1 + c.height // 6 < delim.y1 < c.y2 - c.height // 6
            and min(c.x2, delim.x1) - max(c.x1, x_min) > 0
        ]
        delim_x_min = max([c.x2 for c in left] + [x_min])
        right = [
            c
            for c in contours
            if c.y1 + c.height // 6 < delim.y1 < c.y2 - c.height // 6
            and min(c.x2, x_max) - max(c.x1, delim.x2) > 0
        ]
        delim_x_max = min([c.x1 for c in right] + [x_max])
        row_delimiters[idx].x1 = delim_x_min
        row_delimiters[idx].x2 = delim_x_max

    return row_delimiters


def identify_delimiter_group_rows(column_group: ColumnGroup, contours: list[Cell]) -> list[Cell]:
    """(reference: rows.py:154-174)"""
    row_delimiters = identify_row_delimiters(column_group)
    if row_delimiters:
        coherent = filter_coherent_row_delimiters(row_delimiters, column_group)
        corrected = correct_delimiter_width(coherent, contours)
        return corrected if len(corrected) >= 3 else []
    return []
