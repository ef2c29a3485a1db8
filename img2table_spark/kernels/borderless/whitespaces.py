"""L3 whitespace sweep — the core primitive of the borderless pipeline and
of implicit rows/columns (B10).

Parity target: reference
src/img2table/tables/processing/borderless_tables/whitespaces.py:11-287.
The reference runs ``compute_whitespaces`` as a numba kernel over an
element array sorted by y-middle with full-width sentinels at both extremes;
semantics (including the continuous-mode stitch/dedup order) are replicated
exactly — they are part of the golden contract.
"""

from __future__ import annotations

import numpy as np

from img2table_spark.kernels.borderless.model import ImageSegment, Whitespace
from img2table_spark.kernels.objects import Cell


def compute_whitespaces(
    elements_array: np.ndarray,
    min_width: float,
    min_height: float,
    total_height: float,
    continuous: bool = True,
) -> list[list[list[int]]]:
    """elements_array: (n, 5) float64 [x1, y1, x2, y2, y_middle], pre-sorted
    by y_middle (reference: whitespaces.py:11-116)."""
    x_vals = set()
    for idx in range(elements_array.shape[0]):
        x_vals.add(elements_array[idx, 0])
        x_vals.add(elements_array[idx, 2])
    x_sorted = sorted(x_vals)

    final_whitespaces: list[list[list[int]]] = []
    for x_min, x_max in zip(x_sorted, x_sorted[1:]):
        if x_max - x_min < min_width:
            continue

        # y-gaps between consecutive (by y-middle) elements overlapping the strip
        list_ws = []
        prev_y = 10**6
        for idx_el in range(elements_array.shape[0]):
            x1, y1, x2, y2, _ = elements_array[idx_el]
            if min(x_max, x2) - max(x_min, x1) > 0:
                if y1 - prev_y >= min_height:
                    list_ws.append([x_min, prev_y, x_max, y1])
                prev_y = y2

        if continuous:
            y_min, y_max = -1000, -1000
            for x1_ws, y1_ws, x2_ws, y2_ws in list_ws:
                if y1_ws == y_max:
                    y_min, y_max = min(y1_ws, y_min), max(y2_ws, y_max)
                else:
                    if y_max - y_min >= total_height:
                        final_whitespaces.append([[int(x_min), int(y_min), int(x_max), int(y_max)]])
                    y_min, y_max = y1_ws, y2_ws
            if y_max - y_min >= total_height:
                final_whitespaces.append([[int(x_min), int(y_min), int(x_max), int(y_max)]])
        else:
            nb_ws, tot_h = 0, 0
            lo, hi = 10**6, 0
            ws_group = []
            for x1_ws, y1_ws, x2_ws, y2_ws in list_ws:
                nb_ws += 1
                tot_h += y2_ws - y1_ws
                lo, hi = min(y1_ws, lo), max(y2_ws, hi)
                ws_group.append([int(x_min), int(y1_ws), int(x_max), int(y2_ws)])
            if (
                tot_h >= total_height
                and tot_h >= 0.8 * (hi - lo)
                and (nb_ws == 1 or x_max - x_min >= 2 * min_width)
            ):
                final_whitespaces.append(ws_group)

    if continuous:
        # stitch horizontally adjacent strips with identical y-span
        dedup = []
        x1_p, y1_p, x2_p, y2_p = 0, 0, 0, 0
        for idx, ws in enumerate(final_whitespaces):
            x1, y1, x2, y2 = ws[0]
            if x1 == x2_p and y1 == y1_p and y2 == y2_p:
                x2_p = x2
            else:
                if x2_p - x1_p >= min_width and idx > 0:
                    dedup.append([[x1_p, y1_p, x2_p, y2_p]])
                x1_p, y1_p, x2_p, y2_p = x1, y1, x2, y2
        if x2_p - x1_p >= min_width:
            dedup.append([[x1_p, y1_p, x2_p, y2_p]])
        return dedup

    return final_whitespaces


def get_whitespaces(
    segment,
    vertical: bool = True,
    min_width: float = 0,
    min_height: float = 1,
    pct: float = 0.25,
    continuous: bool = True,
) -> list[Whitespace]:
    """(reference: whitespaces.py:119-164)"""
    if not vertical:
        flipped = [Cell(el.y1, el.x1, el.y2, el.x2) for el in segment.elements]
        segment = ImageSegment(
            x1=segment.y1, y1=segment.x1, x2=segment.y2, y2=segment.x2, elements=flipped
        )

    y_min = min(el.y1 for el in segment.elements)
    y_max = max(el.y2 for el in segment.elements)

    arr = np.array(
        [[el.x1, el.y1, el.x2, el.y2] for el in segment.elements]
        + [[segment.x1, y, segment.x2, y] for y in (y_min, y_max)],
        dtype=np.float64,
    )
    arr = np.c_[arr, (arr[:, 1] + arr[:, 3]) / 2]
    # default (quicksort) argsort: same tie behavior as the reference's sort
    arr = arr[arr[:, 4].argsort()]

    groups = compute_whitespaces(
        elements_array=arr,
        min_width=min_width,
        min_height=min_height,
        total_height=pct * (y_max - y_min),
        continuous=continuous,
    )
    whitespaces = [Whitespace(cells=[Cell(*c) for c in gp]) for gp in groups]
    if not vertical:
        whitespaces = [ws.flipped() for ws in whitespaces]
    return whitespaces


def adjacent_whitespaces(w1: Whitespace, w2: Whitespace) -> bool:
    x_coherent = len({w1.x1, w1.x2} & {w2.x1, w2.x2}) > 0
    y_coherent = min(w1.y2, w2.y2) - max(w1.y1, w2.y1) > 0
    return x_coherent and y_coherent


def identify_coherent_v_whitespaces(v_whitespaces: list[Whitespace]) -> list[Whitespace]:
    """Among adjacent whitespaces keep the taller (reference:
    whitespaces.py:180-198)."""
    deleted = []
    for i in range(len(v_whitespaces)):
        for j in range(i, len(v_whitespaces)):
            if adjacent_whitespaces(v_whitespaces[i], v_whitespaces[j]):
                if v_whitespaces[i].height > v_whitespaces[j].height:
                    deleted.append(j)
                elif v_whitespaces[i].height < v_whitespaces[j].height:
                    deleted.append(i)
    return [ws for idx, ws in enumerate(v_whitespaces) if idx not in deleted]


def deduplicate_whitespaces(ws: list[Whitespace], elements: list[Cell]) -> list[Whitespace]:
    """Remove whitespaces with no elements between them, keeping the taller;
    equal heights merge (reference: whitespaces.py:201-263)."""
    if len(ws) <= 1:
        return ws

    deleted, merged_ws = [], []
    for i in range(len(ws)):
        for j in range(i + 1, len(ws)):
            matching = []
            for c1 in ws[i].cells:
                for c2 in ws[j].cells:
                    if min(c1.y2, c2.y2) - max(c1.y1, c2.y1) <= 0:
                        continue
                    # gap between the two whitespaces (x1/x2 intentionally crossed)
                    gx1, gx2 = min(c1.x2, c2.x2), max(c1.x1, c2.x1)
                    gy1, gy2 = max(c1.y1, c2.y1), min(c1.y2, c2.y2)
                    matching += [
                        el
                        for el in elements
                        if min(el.x2, gx2) - max(el.x1, gx1) > 0
                        and min(el.y2, gy2) - max(el.y1, gy1) > 0
                    ]
            if len(matching) == 0:
                if ws[i].height > ws[j].height:
                    deleted.append(j)
                elif ws[i].height < ws[j].height:
                    deleted.append(i)
                else:
                    new_cells = [
                        Cell(min(ws[i].x1, ws[j].x1), c.y1, max(ws[i].x2, ws[j].x2), c.y2)
                        for c in ws[i].cells + ws[j].cells
                    ]
                    merged_ws.append(Whitespace(cells=list(dict.fromkeys(new_cells))))
                    deleted += [i, j]

    filtered = [w for idx, w in enumerate(ws) if idx not in deleted]
    merged_ws = [
        m
        for m in merged_ws
        if not any(min(w.x2, m.x2) - max(w.x1, m.x1) > 0 for w in filtered)
    ]
    if len(merged_ws) > 1:
        seq = iter(sorted(merged_ws, key=lambda w: w.area, reverse=True))
        filtered_merged = [next(seq)]
        for w in seq:
            if not any(w in f for f in filtered):
                filtered_merged.append(w)
    else:
        filtered_merged = merged_ws
    return filtered + filtered_merged


def get_relevant_vertical_whitespaces(
    segment, char_length: float, median_line_sep: float, pct: float = 0.25
) -> list[Whitespace]:
    """(reference: whitespaces.py:266-287)"""
    v_ws = get_whitespaces(
        segment=segment,
        vertical=True,
        pct=pct,
        min_width=char_length,
        min_height=min(median_line_sep, segment.element_height),
        continuous=True,
    )
    vertical_delims = identify_coherent_v_whitespaces(v_ws)
    return deduplicate_whitespaces(ws=vertical_delims, elements=segment.elements)
