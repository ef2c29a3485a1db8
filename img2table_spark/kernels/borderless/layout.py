"""L4 — column-layout segmentation.

Parity target: reference
src/img2table/tables/processing/borderless_tables/layout/column_segments.py:13-341.
The maximal-empty-rectangle search uses a priority queue; the reference
breaks equal-area ties with ``random.uniform`` (column_segments.py:89) — we
use a deterministic monotone counter instead, which only changes exploration
order among equal-area rectangles (SURVEY.md §4 nondeterminism note).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

from img2table_spark.kernels.borderless.model import ImageSegment
from img2table_spark.kernels.borderless.whitespaces import get_whitespaces
from img2table_spark.kernels.common import cluster_items
from img2table_spark.kernels.objects import Cell, Line


@dataclass
class Rectangle:
    x1: int
    y1: int
    x2: int
    y2: int

    @classmethod
    def from_cell(cls, cell) -> "Rectangle":
        return cls(x1=cell.x1, y1=cell.y1, x2=cell.x2, y2=cell.y2)

    @property
    def area(self) -> int:
        return (self.x2 - self.x1) * (self.y2 - self.y1)

    @property
    def center(self) -> tuple[float, float]:
        return (self.x1 + self.x2) / 2, (self.y1 + self.y2) / 2

    @property
    def cell(self) -> Cell:
        return Cell(self.x1, self.y1, self.x2, self.y2)

    def distance(self, other: "Rectangle") -> float:
        return (self.center[0] - other.center[0]) ** 2 + (self.center[1] - other.center[1]) ** 2

    def overlaps(self, other: "Rectangle") -> bool:
        x_left = max(self.x1, other.x1)
        y_top = max(self.y1, other.y1)
        x_right = min(self.x2, other.x2)
        y_bottom = min(self.y2, other.y2)
        return max(x_right - x_left, 0) * max(y_bottom - y_top, 0) > 0


def identify_remaining_segments(searched_rectangle: Rectangle, existing_segments: list) -> list[Cell]:
    """Maximal-empty-rectangle decomposition via guillotine splits around the
    nearest obstacle (reference: column_segments.py:48-91)."""
    obstacles = [Rectangle.from_cell(el) for el in existing_segments]
    counter = 0
    heap: list[list] = []
    heapq.heappush(heap, [-searched_rectangle.area, counter, searched_rectangle, obstacles])

    segments: list[Rectangle] = []
    while heap:
        _, _, r, obs = heapq.heappop(heap)
        if len(obs) == 0:
            segments.append(r)
            for entry in heap:
                if entry[2].overlaps(r):
                    entry[3] = entry[3] + [r]
            continue

        pivot = min(obs, key=lambda o: o.distance(r))
        rects = [
            Rectangle(x1=pivot.x2, y1=r.y1, x2=r.x2, y2=r.y2),
            Rectangle(x1=r.x1, y1=r.y1, x2=pivot.x1, y2=r.y2),
            Rectangle(x1=r.x1, y1=pivot.y2, x2=r.x2, y2=r.y2),
            Rectangle(x1=r.x1, y1=r.y1, x2=r.x2, y2=pivot.y1),
        ]
        for rect in rects:
            if rect.area > searched_rectangle.area / 100:
                counter += 1
                rect_obstacles = [o for o in obs if o.overlaps(rect)]
                # deterministic tie-break replaces reference's random.uniform
                heapq.heappush(heap, [-rect.area + counter * 1e-6, counter, rect, rect_obstacles])

    return [seg.cell for seg in segments]


def get_vertical_ws(image_segment: ImageSegment, char_length: float, lines: list[Line]) -> list:
    """(reference: column_segments.py:94-157)"""
    v_ws = get_whitespaces(segment=image_segment, vertical=True, pct=0.5)
    v_ws = [
        ws
        for ws in v_ws
        if ws.width >= char_length or ws.x1 == image_segment.x1 or ws.x2 == image_segment.x2
    ]
    if len(v_ws) == 0:
        return []

    line_ws = []
    h_lines = [ln for ln in lines if ln.horizontal]
    for ws in v_ws:
        crossing = sorted(
            (
                ln
                for ln in h_lines
                if ws.y1 < ln.y1 < ws.y2
                and min(ws.x2, ln.x2) - max(ws.x1, ln.x1) >= 0.5 * ws.width
            ),
            key=lambda ln: ln.y1,
        )
        if crossing:
            y_values = sorted(
                [ws.y1, ws.y2]
                + [ln.y1 - ln.thickness for ln in crossing]
                + [ln.y1 + ln.thickness for ln in crossing]
            )
            for idx in range(0, len(y_values), 2):
                pair = y_values[idx : idx + 2]
                if len(pair) == 2 and pair[1] - pair[0] >= 0.5 * image_segment.height:
                    line_ws.append(Cell(x1=ws.x1, y1=pair[0], x2=ws.x2, y2=pair[1]))
        else:
            line_ws.append(ws)

    if len(line_ws) == 0:
        return []

    # group adjacent whitespaces with no separating elements
    line_ws = sorted(line_ws, key=lambda w: w.x1 + w.x2)
    groups = [[line_ws[0]]]
    for ws in line_ws[1:]:
        prev_ws = groups[-1][-1]
        x1_a, x2_a = min(prev_ws.x2, ws.x1), max(prev_ws.x2, ws.x1)
        y1_a, y2_a = max(prev_ws.y1, ws.y1), min(prev_ws.y2, ws.y2)
        separating = [
            el
            for el in image_segment.elements
            if el.x1 >= x1_a and el.x2 <= x2_a and el.y1 >= y1_a and el.y2 <= y2_a
        ]
        if separating:
            groups.append([])
        groups[-1].append(ws)

    out = []
    for cl in groups:
        max_h = max(w.height for w in cl)
        tallest = sorted([w for w in cl if w.height == max_h], key=lambda w: w.area)
        out.append(tallest[-1])
    return out


def is_column_section(ws_group: list) -> bool:
    """(reference: column_segments.py:160-174)"""
    if not 3 <= len(ws_group) <= 4:
        return False
    ws_group = sorted(ws_group, key=lambda ws: ws.x1 + ws.x2)
    col_widths = [r.x1 - left.x2 for left, r in zip(ws_group, ws_group[1:])]
    return max(col_widths) / min(col_widths) <= 1.25


def _top_matches(c1, c2) -> bool:
    return abs(c1.y1 - c2.y1) / max(c1.y2 - c1.y1, c2.y2 - c2.y1) <= 0.05


def _bottom_matches(c1, c2) -> bool:
    return abs(c1.y2 - c2.y2) / max(c1.y2 - c1.y1, c2.y2 - c2.y1) <= 0.05


def identify_column_groups(image_segment: ImageSegment, vertical_ws: list) -> list[list]:
    """(reference: column_segments.py:197-237)"""
    middle_ws = [
        ws for ws in vertical_ws if not ({ws.x1, ws.x2} & {image_segment.x1, image_segment.x2})
    ]
    edge_ws = [
        ws for ws in vertical_ws if {ws.x1, ws.x2} & {image_segment.x1, image_segment.x2}
    ]

    top_groups = [cl + edge_ws for cl in cluster_items(middle_ws, _top_matches)]
    bottom_groups = [cl + edge_ws for cl in cluster_items(middle_ws, _bottom_matches)]

    col_groups = sorted(
        (gp for gp in top_groups + bottom_groups if is_column_section(gp)),
        key=len,
        reverse=True,
    )

    filtered = []
    for gp in col_groups:
        y_min = min(ws.y1 for ws in gp)
        y_max = max(ws.y2 for ws in gp)
        matching = [
            ws
            for ws in vertical_ws
            if min(ws.y2, y_max) - max(ws.y1, y_min) > 0.2 * (ws.y2 - ws.y1)
            and not ({ws.x1, ws.x2} & {image_segment.x1, image_segment.x2})
        ]
        if len(set(matching) - set(gp)) == 0:
            filtered.append(gp)

    if not filtered:
        return []

    dedup = [filtered[0]]
    for gp in filtered[1:]:
        if not any(set(gp) & set(existing) == set(gp) for existing in dedup):
            dedup.append(gp)
    return dedup


def get_column_group_segments(col_group: list) -> list[ImageSegment]:
    """(reference: column_segments.py:240-266)"""
    col_group = sorted(col_group, key=lambda ws: ws.x1 + ws.x2)
    col_segments = []
    for left_ws, right_ws in zip(col_group, col_group[1:]):
        y1_s, y2_s = max(left_ws.y1, right_ws.y1), min(left_ws.y2, right_ws.y2)
        x1_s = round((left_ws.x1 + left_ws.x2) / 2)
        x2_s = round((right_ws.x1 + right_ws.x2) / 2)
        col_segments.append(ImageSegment(x1=x1_s, y1=y1_s, x2=x2_s, y2=y2_s))

    rect = Rectangle(
        x1=min(s.x1 for s in col_segments),
        y1=min(s.y1 for s in col_segments),
        x2=max(s.x2 for s in col_segments),
        y2=max(s.y2 for s in col_segments),
    )
    remaining = [
        ImageSegment(x1=a.x1, y1=a.y1, x2=a.x2, y2=a.y2)
        for a in identify_remaining_segments(rect, col_segments)
    ]
    return col_segments + remaining


def get_segments_from_columns(image_segment: ImageSegment, column_groups: list[list]) -> list[ImageSegment]:
    """(reference: column_segments.py:269-305)"""
    col_group_segments = [
        seg for gp in column_groups for seg in get_column_group_segments(gp)
    ]
    y_top = min(s.y1 for s in col_group_segments)
    y_bot = max(s.y2 for s in col_group_segments)
    segments = [
        *col_group_segments,
        ImageSegment(x1=image_segment.x1, y1=image_segment.y1, x2=image_segment.x2, y2=y_top),
        ImageSegment(x1=image_segment.x1, y1=y_bot, x2=image_segment.x2, y2=image_segment.y2),
        ImageSegment(x1=image_segment.x1, y1=y_top, x2=min(s.x1 for s in col_group_segments), y2=y_bot),
        ImageSegment(x1=max(s.x2 for s in col_group_segments), y1=y_top, x2=image_segment.x2, y2=y_bot),
    ]
    missing = [
        ImageSegment(x1=a.x1, y1=a.y1, x2=a.x2, y2=a.y2)
        for a in identify_remaining_segments(Rectangle.from_cell(image_segment), segments)
    ]
    return segments + missing


def segment_image_columns(
    image_segment: ImageSegment, char_length: float, lines: list[Line]
) -> list[ImageSegment]:
    """(reference: column_segments.py:308-341)"""
    vertical_ws = get_vertical_ws(image_segment, char_length, lines)
    column_groups = identify_column_groups(image_segment, vertical_ws)
    if len(column_groups) == 0:
        return [image_segment]

    col_segments = get_segments_from_columns(image_segment, column_groups)

    final = []
    for segment in col_segments:
        els = [
            el
            for el in image_segment.elements
            if el.x1 >= segment.x1 and el.x2 <= segment.x2 and el.y1 >= segment.y1 and el.y2 <= segment.y2
        ]
        if els:
            segment.set_elements(els)
            final.append(segment)
    return final
