"""T8 support — contour detection inside a cell region.

Parity target: reference src/img2table/tables/processing/common.py:133-179
(GaussianBlur → adaptiveThreshold(GAUSSIAN_C, 11, 30) → dilate ×4 →
findContours RETR_EXTERNAL → merged bounding rects).
"""

from __future__ import annotations

import numpy as np

from img2table_spark.kernels.common import merge_contours
from img2table_spark.kernels.imageops import (
    adaptive_threshold_gaussian_inv,
    dilate_rect,
    find_external_bboxes,
    gaussian_blur_u8,
    rgb2gray,
)
from img2table_spark.kernels.objects import Cell


def get_contours_cell(
    img: np.ndarray,
    cell: Cell,
    margin: int = 5,
    blur_size: int = 9,
    kernel_size: int = 15,
    merge_vertically: bool | None = True,
) -> list[Cell]:
    gray = rgb2gray(img)
    height, width = gray.shape[:2]
    cropped = gray[
        max(cell.y1 - margin, 0) : min(cell.y2 + margin, height),
        max(cell.x1 - margin, 0) : min(cell.x2 + margin, width),
    ]
    if cropped.shape[0] <= 0 or cropped.shape[1] <= 0:
        return []

    blur = gaussian_blur_u8(cropped, blur_size)
    thresh = adaptive_threshold_gaussian_inv(blur, block_size=11, c=30)
    dilated = dilate_rect(thresh, kernel_size, kernel_size, iterations=4)

    cnts = []
    for x, y, w, h in find_external_bboxes(dilated):
        cnts.append(
            Cell(
                x1=x + cell.x1 - margin,
                y1=y + cell.y1 - margin,
                x2=x + w + cell.x1 - margin,
                y2=y + h + cell.y1 - margin,
            )
        )
    return merge_contours(contours=cnts, vertically=merge_vertically)
