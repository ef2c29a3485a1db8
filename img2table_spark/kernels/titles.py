"""T8 — table title extraction.

Parity target: reference src/img2table/tables/processing/text/titles.py:11-64
(vertical table clustering → per-cluster title zones → contour find in zone
→ OCR text of the LAST contour)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from img2table_spark.kernels.contours import get_contours_cell
from img2table_spark.kernels.objects import Cell, Table
from img2table_spark.kernels.text import get_text_cell


def get_title_tables(
    img: np.ndarray, tables: list[Table], words: pd.DataFrame, margin: int = 5
) -> list[Table]:
    height, width = img.shape[:2]
    if len(tables) == 0:
        return []

    sorted_tables = sorted(tables, key=lambda tb: (tb.y1, tb.x1, tb.x2))

    clusters = [[sorted_tables[0]]]
    for tb in sorted_tables[1:]:
        if tb.y1 > clusters[-1][-1].y2:
            clusters.append([])
        clusters[-1].append(tb)

    final_tables = []
    for id_cl, cluster in enumerate(clusters):
        x_delimiters = [round((t1.x2 + t2.x1) / 2) for t1, t2 in zip(cluster, cluster[1:])]
        x_delimiters = [
            max(10, round(cluster[0].x1 - 0.2 * (cluster[0].x2 - cluster[0].x1))),
            *x_delimiters,
            width - 10,
        ]
        # (reference quirk preserved: the last delimiter is appended AFTER
        # width-10, titles.py:41-42)
        x_delimiters = [
            *x_delimiters,
            min(width - 10, round(cluster[-1].x2 + 0.2 * (cluster[-1].x2 - cluster[-1].x1))),
        ]
        x_bounds = list(zip(x_delimiters, x_delimiters[1:]))

        y_bounds = (
            max(tb.y2 for tb in clusters[id_cl - 1]) if id_cl > 0 else 0,
            min(tb.y1 for tb in cluster),
        )

        for id_tb, table in enumerate(cluster):
            cell_title = Cell(
                x1=x_bounds[id_tb][0], y1=y_bounds[0], x2=x_bounds[id_tb][1], y2=y_bounds[1]
            )
            contours = get_contours_cell(
                img=img.copy(), cell=cell_title, margin=0, blur_size=5, kernel_size=9
            )
            title = get_text_cell(words, contours[-1], margin=margin) if contours else None
            table.title = title
            final_tables.append(table)

    return final_tables
