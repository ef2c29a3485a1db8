"""B4–B9, B11: cell clustering → table grid materialization → pruning.

Parity targets (reference):
  - get_adjacent_cells / cluster_cells_in_tables (cross join + union-find):
    src/img2table/tables/processing/bordered_tables/tables/cell_clustering.py:8-73
  - normalize_table_cells (delimiter snapping):
    .../tables/table_creation.py:11-44
  - cluster_to_table (grid from delimiters, ≥90% containment pick):
    .../tables/table_creation.py:102-149
  - remove_unwanted_elements (window n_unique merged flags + 60% element
    containment): .../tables/table_creation.py:47-99
  - add_semi_bordered_cells: .../tables/semi_bordered.py:9-227
  - merge_consecutive_tables: .../tables/consecutive.py:6-45
  - table lines reconstruction: src/img2table/tables/objects/table.py:68-102
  - get_tables driver: .../tables/__init__.py:9-33

All in-UDF NumPy/Python: per image the cell count is ≤10³, so the cross
joins are NumPy broadcasts, not Spark joins (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np

from img2table_spark.kernels.common import find_components, is_contained_cell
from img2table_spark.kernels.objects import Cell, Line, Table


# ------------------------------------------------------------- B4/B5

def get_adjacent_cells(cells: list[Cell]) -> list[tuple[int, int]]:
    """Pairs (i, j) of adjacent cells: y-overlap > 5 with near-touching x
    edges (≤ min(5, 5% of smaller width)), or the symmetric condition
    (reference: cell_clustering.py:22-54). Includes self-pairs like the
    reference's cross join (a lone cell still forms a cluster)."""
    n = len(cells)
    if n == 0:
        return []
    x1 = np.array([c.x1 for c in cells])
    y1 = np.array([c.y1 for c in cells])
    x2 = np.array([c.x2 for c in cells])
    y2 = np.array([c.y2 for c in cells])
    w = x2 - x1
    h = y2 - y1

    x_overlap = np.minimum(x2[:, None], x2[None, :]) - np.maximum(x1[:, None], x1[None, :])
    y_overlap = np.minimum(y2[:, None], y2[None, :]) - np.maximum(y1[:, None], y1[None, :])
    diff_x = np.minimum.reduce(
        [
            np.abs(x1[:, None] - x1[None, :]),
            np.abs(x1[:, None] - x2[None, :]),
            np.abs(x2[:, None] - x1[None, :]),
            np.abs(x2[:, None] - x2[None, :]),
        ]
    )
    diff_y = np.minimum.reduce(
        [
            np.abs(y1[:, None] - y1[None, :]),
            np.abs(y1[:, None] - y2[None, :]),
            np.abs(y2[:, None] - y1[None, :]),
            np.abs(y2[:, None] - y2[None, :]),
        ]
    )
    thresh_x = np.minimum(5, 0.05 * np.minimum(w[:, None], w[None, :]))
    thresh_y = np.minimum(5, 0.05 * np.minimum(h[:, None], h[None, :]))
    adjacent = ((y_overlap > 5) & (diff_x <= thresh_x)) | (
        (x_overlap > 5) & (diff_y <= thresh_y)
    )
    ii, jj = np.nonzero(adjacent)
    return sorted(zip(ii.tolist(), jj.tolist()))


def cluster_cells_in_tables(cells: list[Cell]) -> list[list[Cell]]:
    edges = [(i, j) for i, j in get_adjacent_cells(cells)]
    clusters = find_components(edges)
    return [[cells[idx] for idx in cl] for cl in clusters]


# ------------------------------------------------------------- B6

def normalize_table_cells(cluster_cells: list[Cell]) -> list[Cell]:
    """Snap cell edges to delimiter groups: consecutive edge values closer
    than min(2% of dimension, 10px) share one rounded-mean delimiter
    (reference: table_creation.py:11-44)."""
    width = max(c.x2 for c in cluster_cells) - min(c.x1 for c in cluster_cells)
    height = max(c.y2 for c in cluster_cells) - min(c.y1 for c in cluster_cells)

    def delims(values: list[int], gap: float) -> list[int]:
        values = sorted(set(values))
        groups: list[list[int]] = [[values[0]]]
        for prev, cur in zip(values, values[1:]):
            if cur - prev >= gap:
                groups.append([])
            groups[-1].append(cur)
        return [round(float(np.mean(g))) for g in groups]

    h_delims = delims(
        [v for c in cluster_cells for v in (c.x1, c.x2)], min(width * 0.02, 10)
    )
    v_delims = delims(
        [v for c in cluster_cells for v in (c.y1, c.y2)], min(height * 0.02, 10)
    )

    def snap(delims_list: list[int], val: int) -> int:
        return min(delims_list, key=lambda d: abs(d - val))

    out = []
    for c in cluster_cells:
        nc = Cell(
            x1=snap(h_delims, c.x1),
            x2=snap(h_delims, c.x2),
            y1=snap(v_delims, c.y1),
            y2=snap(v_delims, c.y2),
        )
        if nc.area > 0:
            out.append(nc)
    return out


# ------------------------------------------------------------- B7

def _lines_in_cluster(cluster: list[Cell], lines: list[Line]) -> tuple[list[Line], list[Line]]:
    x_min, x_max = min(c.x1 for c in cluster), max(c.x2 for c in cluster)
    y_min, y_max = min(c.y1 for c in cluster), max(c.y2 for c in cluster)
    y_vals = {c.y1 for c in cluster} | {c.y2 for c in cluster}
    h_cl = [
        ln
        for ln in lines
        if ln.horizontal and min(abs(ln.y1 - y) for y in y_vals) <= 0.05 * (y_max - y_min)
    ]
    x_vals = {c.x1 for c in cluster} | {c.x2 for c in cluster}
    v_cl = [
        ln
        for ln in lines
        if ln.vertical and min(abs(ln.x1 - x) for x in x_vals) <= 0.05 * (x_max - x_min)
    ]
    return h_cl, v_cl


def _table_dimensions(
    cluster: list[Cell], h_cl: list[Line], v_cl: list[Line], char_length: float
) -> tuple[int, int, int, int]:
    """Extend bounds along outer lines when the first/last cluster line spans
    the full extent (reference: semi_bordered.py:33-83)."""
    cx1, cx2 = min(c.x1 for c in cluster), max(c.x2 for c in cluster)
    cy1, cy2 = min(c.y1 for c in cluster), max(c.y2 for c in cluster)

    left_val, right_val = cx1, cx2
    if h_cl:
        left = min(ln.x1 for ln in h_cl)
        right = max(ln.x2 for ln in h_cl)
        ends = {id(h_cl[0]), id(h_cl[-1])}
        left_end = {id(ln) for ln in h_cl if ln.x1 - left <= 0.05 * (right - left)}
        if ends <= left_end:
            left_val = cx1 if cx1 - left <= 2 * char_length else left
        right_end = {id(ln) for ln in h_cl if right - ln.x2 <= 0.05 * (right - left)}
        if ends <= right_end:
            right_val = cx2 if right - cx2 <= 2 * char_length else right

    top_val, bottom_val = cy1, cy2
    if v_cl:
        top = min(ln.y1 for ln in v_cl)
        bottom = max(ln.y2 for ln in v_cl)
        ends = {id(v_cl[0]), id(v_cl[-1])}
        top_end = {id(ln) for ln in v_cl if ln.y1 - top <= 0.05 * (bottom - top)}
        if ends <= top_end:
            top_val = cy1 if cy1 - top <= 2 * char_length else top
        bottom_end = {id(ln) for ln in v_cl if bottom - ln.y2 <= 0.05 * (bottom - top)}
        if ends <= bottom_end:
            bottom_val = cy2 if bottom - cy2 <= 2 * char_length else bottom

    return left_val, right_val, top_val, bottom_val


def _potential_edge_cells(
    cluster: list[Cell],
    h_cl: list[Line],
    v_cl: list[Line],
    left_val: int,
    right_val: int,
    top_val: int,
    bottom_val: int,
) -> list[Cell]:
    """Synthesize cells on the four outer bands (reference:
    semi_bordered.py:86-138); dedup preserves first-seen order."""
    x_cluster = sorted({c.x1 for c in cluster} | {c.x2 for c in cluster} | {left_val, right_val})
    y_cluster = sorted({c.y1 for c in cluster} | {c.y2 for c in cluster} | {top_val, bottom_val})

    new_cells: list[Cell] = []

    for x1, x2 in ((x_cluster[0], x_cluster[1]), (x_cluster[-2], x_cluster[-1])):
        y_vals = sorted(
            {top_val, bottom_val}
            | {ln.y1 for ln in h_cl if min(ln.x2, x2) - max(ln.x1, x1) >= 0.9 * (x2 - x1)}
        )
        for y1, y2 in zip(y_vals, y_vals[1:]):
            nc = Cell(x1=x1, y1=y1, x2=x2, y2=y2)
            if nc.area > 0:
                new_cells.append(nc)

    for y1, y2 in ((y_cluster[0], y_cluster[1]), (y_cluster[-2], y_cluster[-1])):
        x_vals = sorted(
            {left_val, right_val}
            | {ln.x1 for ln in v_cl if min(ln.y2, y2) - max(ln.y1, y1) >= 0.9 * (y2 - y1)}
        )
        for x1, x2 in zip(x_vals, x_vals[1:]):
            nc = Cell(x1=x1, y1=y1, x2=x2, y2=y2)
            if nc.area > 0:
                new_cells.append(nc)

    return list(dict.fromkeys(new_cells))


def _update_cluster_cells(cluster: list[Cell], new_cells: list[Cell]) -> list[Cell]:
    """Keep new cells overlapping <50% (of smaller area) with any cluster
    cell, drop intra-duplicates, renormalize (reference:
    semi_bordered.py:141-194)."""
    if not new_cells:
        return cluster

    def boxes(cs):
        return (
            np.array([c.x1 for c in cs]),
            np.array([c.y1 for c in cs]),
            np.array([c.x2 for c in cs]),
            np.array([c.y2 for c in cs]),
        )

    nx1, ny1, nx2, ny2 = boxes(new_cells)
    cx1, cy1, cx2, cy2 = boxes(cluster)
    n_area = (nx2 - nx1) * (ny2 - ny1)
    c_area = (cx2 - cx1) * (cy2 - cy1)

    xo = np.maximum(0, np.minimum(nx2[:, None], cx2[None, :]) - np.maximum(nx1[:, None], cx1[None, :]))
    yo = np.maximum(0, np.minimum(ny2[:, None], cy2[None, :]) - np.maximum(ny1[:, None], cy1[None, :]))
    pct = (xo * yo) / np.minimum(n_area[:, None], c_area[None, :])
    indep = np.nonzero(pct.max(axis=1) < 0.5)[0]
    if len(indep) == 0:
        return cluster

    # intra-dedup: drop a cell if some other (larger-or-equal, different)
    # independent cell overlaps ≥50% of the smaller
    keep: list[int] = []
    for a in indep:
        dup = False
        for b in indep:
            if a == b:
                continue
            if n_area[a] <= n_area[b]:
                xo2 = max(0, min(nx2[a], nx2[b]) - max(nx1[a], nx1[b]))
                yo2 = max(0, min(ny2[a], ny2[b]) - max(ny1[a], ny1[b]))
                if (xo2 * yo2) / min(n_area[a], n_area[b]) >= 0.5:
                    dup = True
                    break
        if not dup:
            keep.append(a)
    final_cells = [new_cells[i] for i in keep]
    if final_cells:
        return normalize_table_cells(cluster + final_cells)
    return cluster


def add_semi_bordered_cells(cluster: list[Cell], lines: list[Line], char_length: float) -> list[Cell]:
    if len(cluster) == 0:
        return cluster
    h_cl, v_cl = _lines_in_cluster(cluster, lines)
    left_val, right_val, top_val, bottom_val = _table_dimensions(cluster, h_cl, v_cl, char_length)
    new_cells = _potential_edge_cells(cluster, h_cl, v_cl, left_val, right_val, top_val, bottom_val)
    return _update_cluster_cells(cluster, new_cells)


# ------------------------------------------------------------- B8/B9

def remove_unwanted_elements(table: Table, elements: list[Cell]) -> Table:
    """Drop rows/columns owning no element (≥60% element-area containment);
    merged cells only count for non-merged rows/cols (reference:
    table_creation.py:47-99)."""
    if len(elements) == 0 or table.nb_rows * table.nb_columns == 0:
        return Table(rows=[])

    positions = [
        (r, c, cell) for r, row in enumerate(table.rows) for c, cell in enumerate(row)
    ]
    # merged flags per bbox: same bbox spanning >1 row → merged_col etc.
    rows_per_bbox: dict[tuple, set] = {}
    cols_per_bbox: dict[tuple, set] = {}
    for r, c, cell in positions:
        b = (cell.x1, cell.y1, cell.x2, cell.y2)
        rows_per_bbox.setdefault(b, set()).add(r)
        cols_per_bbox.setdefault(b, set()).add(c)

    ex1 = np.array([e.x1 for e in elements])
    ey1 = np.array([e.y1 for e in elements])
    ex2 = np.array([e.x2 for e in elements])
    ey2 = np.array([e.y2 for e in elements])
    e_area = (ex2 - ex1) * (ey2 - ey1)

    info = []  # (id_row, id_col, merged_row, merged_col, contains)
    for r, c, cell in positions:
        xo = np.maximum(0, np.minimum(cell.x2, ex2) - np.maximum(cell.x1, ex1))
        yo = np.maximum(0, np.minimum(cell.y2, ey2) - np.maximum(cell.y1, ey1))
        contains = bool(((xo * yo) / e_area >= 0.6).any())
        b = (cell.x1, cell.y1, cell.x2, cell.y2)
        merged_col = len(rows_per_bbox[b]) > 1
        merged_row = len(cols_per_bbox[b]) > 1
        info.append((r, c, merged_row, merged_col, contains))

    empty_rows = []
    for r in range(table.nb_rows):
        cells_r = [x for x in info if x[0] == r]
        contains_any = any(x[4] for x in cells_r)
        non_merged = [x for x in cells_r if not x[3]]
        single_contains = any(x[4] for x in non_merged) if non_merged else None
        all_merged = all(x[3] for x in cells_r)
        if not contains_any or (not all_merged and not single_contains):
            empty_rows.append(r)

    empty_cols = []
    for c in range(table.nb_columns):
        cells_c = [x for x in info if x[1] == c]
        contains_any = any(x[4] for x in cells_c)
        non_merged = [x for x in cells_c if not x[2]]
        single_contains = any(x[4] for x in non_merged) if non_merged else None
        all_merged = all(x[2] for x in cells_c)
        if not contains_any or (not all_merged and not single_contains):
            empty_cols.append(c)

    table.remove_rows(empty_rows)
    table.remove_columns(empty_cols)
    return table


def cluster_to_table(cluster_cells: list[Cell], elements: list[Cell], borderless: bool = False) -> Table:
    """Materialize the y-delims × x-delims grid; per slot pick the smallest
    cell ≥90%-containing it, else a degenerate/default cell
    (reference: table_creation.py:102-149). Merged cells share one Cell."""
    v_delims = sorted({y for c in cluster_cells for y in (c.y1, c.y2)})
    h_delims = sorted({x for c in cluster_cells for x in (c.x1, c.x2)})

    rows: list[list[Cell]] = []
    for y_top, y_bottom in zip(v_delims, v_delims[1:]):
        matching = [
            c
            for c in cluster_cells
            if min(c.y2, y_bottom) - max(c.y1, y_top) >= 0.9 * (y_bottom - y_top)
        ]
        row: list[Cell] = []
        for x_left, x_right in zip(h_delims, h_delims[1:]):
            default_cell = Cell(x1=x_left, y1=y_top, x2=x_right, y2=y_bottom)
            containing = sorted(
                (c for c in matching if is_contained_cell(default_cell, c, percentage=0.9)),
                key=lambda c: c.area,
            )
            if containing:
                row.append(containing[0])
            elif matching:
                x_value = min(
                    (x for c in matching for x in (c.x1, c.x2)),
                    key=lambda x: min(abs(x - x_left), abs(x - x_right)),
                )
                row.append(Cell(x1=x_value, y1=y_top, x2=x_value, y2=y_bottom))
            else:
                row.append(default_cell)
        rows.append(row)

    table = Table(rows=rows, borderless=borderless)
    return remove_unwanted_elements(table, elements)


# ------------------------------------------------------------- table lines

def table_lines(table: Table) -> list[Line]:
    """Reconstruct merged h/v lines from cell edges
    (reference: table.py:68-102)."""
    h_lines, v_lines = [], []
    for row in table.rows:
        for c in row:
            v_lines.append(Line(c.x1, c.y1, c.x1, c.y2))
            v_lines.append(Line(c.x2, c.y1, c.x2, c.y2))
            h_lines.append(Line(c.x1, c.y1, c.x2, c.y1))
            h_lines.append(Line(c.x1, c.y2, c.x2, c.y2))

    groups: list[list[Line]] = []
    for ln in sorted(v_lines, key=lambda x: (x.x1, x.y1)):
        if groups and not (ln.x1 > groups[-1][-1].x1 or ln.y1 > groups[-1][-1].y2):
            groups[-1].append(ln)
        else:
            groups.append([ln])
    v_groups = groups

    groups = []
    for ln in sorted(h_lines, key=lambda x: (x.y1, x.x1)):
        if groups and not (ln.y1 > groups[-1][-1].y1 or ln.x1 > groups[-1][-1].x2):
            groups[-1].append(ln)
        else:
            groups.append([ln])
    h_groups = groups

    return [
        Line(
            x1=min(ln.x1 for ln in gp),
            y1=min(ln.y1 for ln in gp),
            x2=max(ln.x2 for ln in gp),
            y2=max(ln.y2 for ln in gp),
        )
        for gp in v_groups + h_groups
    ]


# ------------------------------------------------------------- B11

def merge_consecutive_tables(tables: list[Table], contours: list[Cell]) -> list[Table]:
    """Merge vertically consecutive tables with no contours between, equal
    column counts and v-line x alignment within 2px
    (reference: consecutive.py:6-45)."""
    if len(tables) == 0:
        return []
    seq = iter(sorted(tables, key=lambda t: t.y1))
    clusters = [[next(seq)]]
    for tb in seq:
        prev = clusters[-1][-1]
        in_between = [
            c
            for c in contours
            if c.y1 >= prev.y2
            and c.y2 <= tb.y1
            and c.x2 >= min(prev.x1, tb.x1)
            and c.x1 <= max(prev.x2, tb.x2)
        ]
        prev_cols = sorted((ln for ln in table_lines(prev) if ln.vertical), key=lambda ln: ln.x1)
        tb_cols = sorted((ln for ln in table_lines(tb) if ln.vertical), key=lambda ln: ln.x1)
        coherency = all(abs(l1.x1 - l2.x1) <= 2 for l1, l2 in zip(prev_cols, tb_cols))
        if not (len(in_between) == 0 and prev.nb_columns == tb.nb_columns and coherency):
            clusters.append([])
        clusters[-1].append(tb)

    merged = []
    for cl in clusters:
        if len(cl) == 1:
            merged.extend(cl)
        else:
            merged.append(Table(rows=[row for tb in cl for row in tb.rows], borderless=False))
    return merged


# ------------------------------------------------------------- driver

def get_tables(
    cells: list[Cell], elements: list[Cell], lines: list[Line], char_length: float
) -> list[Table]:
    """B4→B9 driver (reference: tables/__init__.py:9-33)."""
    clusters = cluster_cells_in_tables(cells)
    normalized = [normalize_table_cells(cl) for cl in clusters]
    complete = [
        add_semi_bordered_cells(cl, lines=lines, char_length=char_length)
        for cl in normalized
        if len(cl) > 0
    ]
    tables = [cluster_to_table(cl, elements=elements) for cl in complete]
    return [tb for tb in tables if tb.nb_rows * tb.nb_columns >= 2]
