"""B2–B3: cell identification from lines and nested-cell deduplication.

Parity targets (reference):
  - identify_cells / get_cells_dataframe:
    src/img2table/tables/processing/bordered_tables/cells/identification.py:9-112
    (h-line self theta join with ±2% end correspondence, two-pass bound
    dedup, v-line splitting with margin/tolerance)
  - deduplicate_cells (greedy smallest-first coverage raster):
    .../cells/deduplication.py:7-25
  - get_cells: .../cells/__init__.py:7-19

The reference runs this as a numba kernel; per image there are <10³ lines so
the pair scan is NumPy-vectorized and the rest stays plain Python — this all
executes inside the per-turn Arrow UDF, never as a Spark join.
"""

from __future__ import annotations

import numpy as np

from img2table_spark.kernels.objects import Cell, Line


def _potential_cells(h: np.ndarray) -> list[list[int]]:
    """Pairs of h-lines (i above j) whose x-extents correspond (±2% of line i
    width) or are mutually contained → candidate cell bounds."""
    n = h.shape[0]
    if n == 0:
        return []
    x1 = h[:, 0]
    y1 = h[:, 1]
    x2 = h[:, 2]
    y2 = h[:, 3]
    width = x2 - x1
    denom = np.where(width == 0, 1, width).astype(np.float64)

    above = y1[:, None] < y1[None, :]  # i strictly above j
    l_corr = np.abs((x1[:, None] - x1[None, :]) / denom[:, None]) <= 0.02
    r_corr = np.abs((x2[:, None] - x2[None, :]) / denom[:, None]) <= 0.02
    l_cont = ((x1[:, None] <= x1[None, :]) & (x1[None, :] <= x2[:, None])) | (
        (x1[None, :] <= x1[:, None]) & (x1[:, None] <= x2[None, :])
    )
    r_cont = ((x1[:, None] <= x2[None, :]) & (x2[None, :] <= x2[:, None])) | (
        (x1[None, :] <= x2[:, None]) & (x2[:, None] <= x2[None, :])
    )
    keep = above & (l_corr | l_cont) & (r_corr | r_cont)
    ii, jj = np.nonzero(keep)
    return [
        [int(max(x1[i], x1[j])), int(min(x2[i], x2[j])), int(y1[i]), int(y2[j])]
        for i, j in zip(ii, jj)
    ]


def _dedup_bounds(potential: list[list[int]]) -> list[list[int]]:
    """Two-pass dedup: keep one candidate per (x1, x2, y1) — the one with the
    nearest lower bound — then per (x1, x2, y2) the nearest upper bound
    (reference: identification.py:39-60; sort orders are part of the
    contract)."""
    dedup_upper = []
    prev = (0, 0, 0)
    for x1, x2, y1, y2 in sorted(potential):
        if (x1, x2, y1) != prev:
            dedup_upper.append([x1, x2, y2, -y1])
        prev = (x1, x2, y1)

    dedup_lower = []
    prev = (0, 0, 0)
    for x1, x2, y2, neg_y1 in sorted(dedup_upper):
        if (x1, x2, y2) != prev:
            dedup_lower.append([x1, x2, -neg_y1, y2])
        prev = (x1, x2, y2)
    return dedup_lower


def identify_cells_arrays(h: np.ndarray, v: np.ndarray) -> list[Cell]:
    """Full B2 on (n,4) int arrays [x1, y1, x2, y2]."""
    candidates = _dedup_bounds(_potential_cells(h))
    cells: list[Cell] = []
    for x1, x2, y1, y2 in candidates:
        margin = max(5, (x2 - x1) * 0.025)
        delims = []
        for k in range(v.shape[0]):
            x1v, y1v, _, y2v = int(v[k, 0]), int(v[k, 1]), int(v[k, 2]), int(v[k, 3])
            if x1 - margin <= x1v <= x2 + margin:
                overlap = min(y2, y2v) - max(y1, y1v)
                tolerance = max(5, min(10, 0.1 * (y2 - y1)))
                if y2 - y1 - overlap <= tolerance:
                    delims.append(x1v)
        if len(delims) >= 2:
            delims = sorted(delims)
            for d1, d2 in zip(delims, delims[1:]):
                cells.append(Cell(x1=d1, y1=y1, x2=d2, y2=y2))
    return cells


def get_cells_dataframe(horizontal_lines: list[Line], vertical_lines: list[Line]) -> list[Cell]:
    if len(horizontal_lines) * len(vertical_lines) == 0:
        return []
    h = np.array([[ln.x1, ln.y1, ln.x2, ln.y2] for ln in horizontal_lines], dtype=np.int64)
    v = np.array([[ln.x1, ln.y1, ln.x2, ln.y2] for ln in vertical_lines], dtype=np.int64)
    return identify_cells_arrays(h, v)


def deduplicate_cells(cells: list[Cell]) -> list[Cell]:
    """Greedy smallest-first: keep a cell iff ≥25% of its area is not yet
    covered (reference: deduplication.py:7-25). Stable area sort —
    equal-area tie order is input order."""
    if not cells:
        return []
    x_max = max(max(c.x2 for c in cells), 0)
    y_max = max(max(c.y2 for c in cells), 0)
    coverage = np.ones((y_max, x_max), dtype=np.uint8)
    out = []
    for c in sorted(cells, key=lambda c: c.area):
        cropped = coverage[c.y1 : c.y2, c.x1 : c.x2]
        if cropped.sum() >= 0.25 * c.area:
            out.append(c)
            coverage[c.y1 : c.y2, c.x1 : c.x2] = 0
    return out


def get_cells(horizontal_lines: list[Line], vertical_lines: list[Line]) -> list[Cell]:
    return deduplicate_cells(get_cells_dataframe(horizontal_lines, vertical_lines))
