"""Image-document pipeline: decoded image (+ optional word table) →
content-filled Table list.

Parity target: reference Document.extract_tables / get_table_content
(src/img2table/document/base/__init__.py:65-142): per page — geometry,
text assignment (T2–T6), relevance filter, titles (T8), final filter
(bordered max≥2, borderless rows≥2 ∧ cols≥3)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from img2table_spark.kernels.objects import Table
from img2table_spark.kernels.table_image import TableImage
from img2table_spark.kernels.text import table_get_content
from img2table_spark.kernels.titles import get_title_tables


def extract_image_tables(
    img: np.ndarray,
    words: pd.DataFrame | None = None,
    implicit_rows: bool = False,
    implicit_columns: bool = False,
    borderless_tables: bool = False,
    min_confidence: int = 50,
    detect_rotation: bool = False,
) -> list[Table]:
    if detect_rotation:
        from img2table_spark.kernels.rotation import fix_rotation_image

        img, _ = fix_rotation_image(img)
    tables = TableImage(img=img, min_confidence=min_confidence).extract_tables(
        implicit_rows=implicit_rows,
        implicit_columns=implicit_columns,
        borderless_tables=borderless_tables,
    )

    if words is None or len(tables) == 0:
        # reference: no OCR → return tables without content, unfiltered
        # (document/base/__init__.py:76-77)
        return tables

    # text assignment + empty row/col pruning per table
    tables = [table_get_content(tb, words, min_confidence=min_confidence) for tb in tables]
    tables = [tb for tb in tables if max(tb.nb_rows, tb.nb_columns) >= 2]

    # titles
    tables = get_title_tables(img=img, tables=tables, words=words)

    # final relevance filter (base/__init__.py:109-112)
    return [
        tb
        for tb in tables
        if (max(tb.nb_rows, tb.nb_columns) >= 2 and not tb.borderless)
        or (tb.nb_rows >= 2 and tb.nb_columns >= 3)
    ]
