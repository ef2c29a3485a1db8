"""B1 — morphological straight-line detection.

Parity target: reference
src/img2table/tables/processing/bordered_tables/lines.py:10-120
(bilateral blur → gray → Laplacian edge image → zero text contours →
binary ≥ min(2.5·mean, max) → per-direction morphology chain → CC stats →
Line objects with mean position and thickness).
"""

from __future__ import annotations

import numpy as np

from img2table_spark.kernels.imageops import (
    bilateral_filter3,
    connected_components_with_stats,
    convert_scale_abs,
    laplacian3_f64,
    morph_close,
    morph_open,
    rgb2gray,
)
from img2table_spark.kernels.objects import Cell, Line


def identify_straight_lines(
    thresh: np.ndarray, min_line_length: float, char_length: float, vertical: bool = True
) -> list[Line]:
    """(reference: lines.py:10-84)"""
    k = round(min_line_length / 3) or 1
    mask = morph_open(thresh, 1 if vertical else k, k if vertical else 1)

    # closing for hollow lines
    mask = morph_close(mask, 3 if vertical else 1, 1 if vertical else 3)

    # closing for dotted lines
    kd = round(min_line_length / 6) or 1
    mask = morph_close(mask, 1 if vertical else kd, kd if vertical else 1)

    # opening on full line length
    kl = int(min_line_length) or 1
    final_mask = morph_open(mask, 1 if vertical else kl, kl if vertical else 1)

    _, _, stats = connected_components_with_stats(final_mask)

    lines = []
    for idx in range(stats.shape[0]):
        if idx == 0:
            continue
        x, y, w, h, area = (int(v) for v in stats[idx])
        if max(w, h) / min(w, h) < 5 and min(w, h) >= char_length:
            continue
        if max(w, h) < min_line_length:
            continue

        cropped = thresh[y : y + h, x : x + w]
        if w >= h:
            non_blank = np.where(cropped.sum(axis=0) > 0)
            line_rows = np.where((cropped.sum(axis=1) / 255) >= 0.5 * w)
            if len(line_rows[0]) == 0:
                continue
            yy = int(round(float(np.mean(line_rows))))
            line = Line(
                x1=x + int(np.min(non_blank)),
                y1=y + yy,
                x2=x + int(np.max(non_blank)),
                y2=y + yy,
                thickness=int(np.max(line_rows) - np.min(line_rows) + 1),
            )
        else:
            non_blank = np.where(cropped.sum(axis=1) > 0)
            line_cols = np.where((cropped.sum(axis=0) / 255) >= 0.5 * h)
            if len(line_cols[0]) == 0:
                continue
            xx = int(round(float(np.mean(line_cols))))
            line = Line(
                x1=x + xx,
                y1=y + int(np.min(non_blank)),
                x2=x + xx,
                y2=y + int(np.max(non_blank)),
                thickness=int(np.max(line_cols) - np.min(line_cols) + 1),
            )
        lines.append(line)
    return lines


def detect_lines(
    img: np.ndarray,
    contours: list[Cell],
    char_length: float,
    min_line_length: float,
) -> tuple[list[Line], list[Line]]:
    """(reference: lines.py:87-120)"""
    blur = bilateral_filter3(img, sigma_color=40.0, sigma_space=80.0)
    gray = rgb2gray(blur)

    edge_img = convert_scale_abs(laplacian3_f64(gray))
    for c in contours:
        # verbatim reference slice (lines.py:107): a 0-coordinate contour
        # yields a negative start that Python wraps — preserved for parity
        edge_img[c.y1 - 1 : c.y2 + 1, c.x1 - 1 : c.x2 + 1] = 0
    binary_img = (255 * (edge_img >= min(2.5 * np.mean(edge_img), np.max(edge_img)))).astype(np.uint8)

    h_lines = identify_straight_lines(binary_img, min_line_length, char_length, vertical=False)
    v_lines = identify_straight_lines(binary_img, min_line_length, char_length, vertical=True)
    return h_lines, v_lines
