"""Per-image table extraction driver (geometry only, no text).

Parity target: reference src/img2table/tables/image.py:21-134
(TableImage: P1 threshold → P5 metrics → B1 lines → B2/B3 cells →
B4..B9 tables → B10 implicit → B11 merge → B12 filter; optional L1..L12
borderless pipeline).
"""

from __future__ import annotations

import numpy as np

from img2table_spark.kernels.borderless.build import identify_borderless_tables_from_elements
from img2table_spark.kernels.cells import get_cells
from img2table_spark.kernels.implicit import implicit_content
from img2table_spark.kernels.lines import detect_lines
from img2table_spark.kernels.metrics import compute_img_metrics, threshold_dark_areas
from img2table_spark.kernels.objects import Cell, Line, Table
from img2table_spark.kernels.rlsa import get_image_elements, identify_text_mask
from img2table_spark.kernels.tables import get_tables, merge_consecutive_tables


class TableImage:
    def __init__(self, img: np.ndarray, min_confidence: int = 50):
        self.img = img
        self.min_confidence = min_confidence
        self.thresh = threshold_dark_areas(img=img, char_length=11)
        self.char_length, self.median_line_sep, self.contours = compute_img_metrics(
            self.thresh.copy()
        )
        self.lines: list[Line] = []
        self.tables: list[Table] = []

    def extract_bordered_tables(self, implicit_rows: bool = False, implicit_columns: bool = False) -> None:
        """(reference: tables/image.py:53-93)"""
        min_line_length = (
            int(min(1.5 * self.median_line_sep, 4 * self.char_length))
            if self.median_line_sep
            else 20
        )
        h_lines, v_lines = detect_lines(
            img=self.img,
            contours=self.contours,
            char_length=self.char_length,
            min_line_length=min_line_length,
        )
        self.lines = h_lines + v_lines

        cells = get_cells(horizontal_lines=h_lines, vertical_lines=v_lines)
        self.tables = get_tables(
            cells=cells, elements=self.contours, lines=self.lines, char_length=self.char_length
        )
        self.tables = [
            implicit_content(
                table=tb,
                contours=self.contours,
                char_length=self.char_length,
                implicit_rows=implicit_rows,
                implicit_columns=implicit_columns,
            )
            for tb in self.tables
        ]
        self.tables = merge_consecutive_tables(tables=self.tables, contours=self.contours)
        self.tables = [tb for tb in self.tables if min(tb.nb_rows, tb.nb_columns) >= 2]

    def extract_borderless_tables(self) -> None:
        """(reference: tables/image.py:95-113 + borderless layout driver
        layout/__init__.py:16-49)"""
        if self.median_line_sep is None:
            return
        self.thresh = threshold_dark_areas(img=self.img, char_length=self.char_length)
        text_thresh = identify_text_mask(
            thresh=self.thresh,
            lines=self.lines,
            char_length=self.char_length,
            existing_tables=self.tables,
        )
        img_elements = get_image_elements(thresh=text_thresh, char_length=self.char_length)
        borderless = identify_borderless_tables_from_elements(
            img_elements=img_elements,
            img_width=self.thresh.shape[1],
            lines=self.lines,
            char_length=self.char_length,
            median_line_sep=self.median_line_sep,
            contours=self.contours,
            existing_tables=self.tables,
        )
        self.tables += [tb for tb in borderless if tb.nb_rows >= 2 and tb.nb_columns >= 3]

    def extract_tables(
        self,
        implicit_rows: bool = False,
        implicit_columns: bool = False,
        borderless_tables: bool = False,
    ) -> list[Table]:
        if self.char_length is None:
            return []
        self.extract_bordered_tables(implicit_rows=implicit_rows, implicit_columns=implicit_columns)
        if borderless_tables:
            self.extract_borderless_tables()
        return self.tables
