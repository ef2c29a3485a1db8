"""L6 — column delimiters stitched across table areas.

Parity target: reference
src/img2table/tables/processing/borderless_tables/columns.py:10-100.
"""

from __future__ import annotations

import copy

from img2table_spark.kernels.borderless.model import (
    Column,
    ColumnGroup,
    TableSegment,
    VerticalWS,
    Whitespace,
)
from img2table_spark.kernels.objects import Cell


def get_columns_delimiters(table_segment: TableSegment, char_length: float) -> list[Column]:
    """(reference: columns.py:10-75)"""
    table_areas = sorted(table_segment.table_areas, key=lambda x: x.position)

    columns: list[Column] = []
    for id_area, tb_area in enumerate(table_areas):
        new_columns: list[Column] = []
        whitespaces = [
            VerticalWS(
                ws=ws,
                top=ws.y1 == tb_area.y1,
                bottom=ws.y2 == tb_area.y2,
                position=id_area,
            )
            for ws in tb_area.whitespaces
        ]

        for col in columns:
            matching = [v for v in whitespaces if col.corresponds(v_ws=v, char_length=char_length)]
            if matching:
                for v_ws in matching:
                    v_ws.used = True
                    new_col = copy.deepcopy(col)
                    new_col.add(v_ws)
                    new_columns.append(new_col)
            else:
                new_columns.append(col)

        new_columns += [Column.from_ws(v_ws=v) for v in whitespaces if not v.used]
        columns = new_columns

    # Reshape whitespaces to reach the previous/next area bound
    dict_bounds = {
        k: {"y_min": table_areas[k].y1, "y_max": table_areas[k].y2}
        for k in range(len(table_areas))
    }
    reshaped_columns = []
    for col in columns:
        reshaped_ws = []
        for v_ws in col.whitespaces:
            y_min = (
                (dict_bounds.get(v_ws.position - 1, {}).get("y_max") or v_ws.y1)
                if v_ws.top
                else v_ws.y1
            )
            y_max = (
                (dict_bounds.get(v_ws.position + 1, {}).get("y_min") or v_ws.y2)
                if v_ws.bottom
                else v_ws.y2
            )
            reshaped_ws.append(
                VerticalWS(
                    ws=Whitespace(
                        cells=[
                            Cell(
                                x1=col.x1,
                                y1=y_min if c.y1 == v_ws.y1 else c.y1,
                                x2=col.x2,
                                y2=y_max if c.y2 == v_ws.y2 else c.y2,
                            )
                            for c in v_ws.ws.cells
                        ]
                    )
                )
            )
        reshaped_columns.append(Column(whitespaces=reshaped_ws))

    max_height = max(col.height for col in reshaped_columns)
    return [col for col in reshaped_columns if col.height >= 0.66 * max_height]


def identify_columns(table_segment: TableSegment, char_length: float) -> ColumnGroup | None:
    """(reference: columns.py:78-100) — require ≥4 columns (≥3 table cols)."""
    columns = get_columns_delimiters(table_segment, char_length)
    if columns:
        x1_d = min(d.x1 for d in columns)
        x2_d = max(d.x2 for d in columns)
        y1_d = min(d.y1 for d in columns)
        y2_d = max(d.y2 for d in columns)
        group = ColumnGroup(
            columns=columns,
            elements=[
                el
                for el in table_segment.elements
                if el.x1 >= x1_d and el.x2 <= x2_d and el.y1 >= y1_d and el.y2 <= y2_d
            ],
            char_length=char_length,
        )
        return group if len(group.columns) >= 4 and len(group.elements) > 0 else None
    return None
