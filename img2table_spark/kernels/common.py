"""Shared geometric utilities.

Parity targets (reference):
  - is_contained_cell:          src/img2table/tables/processing/common.py:12-36
  - merge_contours (axis sweep): common.py:92-130
  - merge_overlapping_contours:  common.py:39-89
  - cluster_items (O(n²) pairwise clustering): src/img2table/tables/__init__.py:58-82
  - find_components (union-find): src/img2table/tables/__init__.py:85-126
"""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Callable, Iterable
from typing import Any

import numpy as np

from img2table_spark.kernels.objects import Cell


def is_contained_cell(inner, outer, percentage: float = 0.9) -> bool:
    if isinstance(inner, tuple):
        inner = Cell(*inner)
    if isinstance(outer, tuple):
        outer = Cell(*outer)
    x_left = max(inner.x1, outer.x1)
    y_top = max(inner.y1, outer.y1)
    x_right = min(inner.x2, outer.x2)
    y_bottom = min(inner.y2, outer.y2)
    intersection = max(0, x_right - x_left) * max(0, y_bottom - y_top)
    return intersection / inner.area >= percentage


def merge_contours(contours: list[Cell], vertically: bool | None = True) -> list[Cell]:
    """Sorted linear sweep merging contours overlapping along one axis
    (reference: common.py:92-130); vertically=None → containment merge."""
    if len(contours) == 0:
        return contours
    if vertically is None:
        return merge_overlapping_contours(contours)

    a1, a2 = ("y1", "y2") if vertically else ("x1", "x2")
    b1, b2 = ("x1", "x2") if vertically else ("y1", "y2")

    sorted_cnts = sorted(
        contours, key=lambda c: (getattr(c, a1), getattr(c, a2), getattr(c, b1))
    )
    out = [Cell(sorted_cnts[0].x1, sorted_cnts[0].y1, sorted_cnts[0].x2, sorted_cnts[0].y2)]
    for cnt in sorted_cnts[1:]:
        cur = out[-1]
        if getattr(cnt, a1) <= getattr(cur, a2):
            setattr(cur, a2, max(getattr(cur, a2), getattr(cnt, a2)))
            setattr(cur, b1, min(getattr(cur, b1), getattr(cnt, b1)))
            setattr(cur, b2, max(getattr(cur, b2), getattr(cnt, b2)))
        else:
            out.append(Cell(cnt.x1, cnt.y1, cnt.x2, cnt.y2))
    return out


def merge_overlapping_contours(contours: list[Cell]) -> list[Cell]:
    """Absorb contours overlapping ≥25% of the smaller into the larger
    (reference: common.py:39-89). Vectorized over all pairs."""
    n = len(contours)
    if n == 0:
        return []
    x1 = np.array([c.x1 for c in contours])
    y1 = np.array([c.y1 for c in contours])
    x2 = np.array([c.x2 for c in contours])
    y2 = np.array([c.y2 for c in contours])
    area = (x2 - x1) * (y2 - y1)

    xl = np.maximum(x1[:, None], x1[None, :])
    xr = np.minimum(x2[:, None], x2[None, :])
    yt = np.maximum(y1[:, None], y1[None, :])
    yb = np.minimum(y2[:, None], y2[None, :])
    inter = np.maximum(xr - xl, 0) * np.maximum(yb - yt, 0)

    # pair (i, j): i smaller-or-equal area, i != j, i overlapped ≥ 25%
    valid = (area[:, None] <= area[None, :]) & ~np.eye(n, dtype=bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        overlaps = valid & (inter / np.maximum(area[:, None], 1) >= 0.25)

    deleted = overlaps.any(axis=1)
    out = []
    for j in range(n):
        if deleted[j]:
            continue
        absorbed = np.nonzero(overlaps[:, j])[0]
        if len(absorbed):
            out.append(
                Cell(
                    min(x1[j], x1[absorbed].min()),
                    min(y1[j], y1[absorbed].min()),
                    max(x2[j], x2[absorbed].max()),
                    max(y2[j], y2[absorbed].max()),
                )
            )
        else:
            out.append(Cell(x1[j], y1[j], x2[j], y2[j]))
    return out


def cluster_items(items: list[Any], clustering_func: Callable) -> list[list[Any]]:
    """O(n²) pairwise-predicate clustering with transitive merge
    (reference: tables/__init__.py:58-82)."""
    clusters: list[set[int]] = []
    for i in range(len(items)):
        for j in range(i, len(items)):
            corresponds = clustering_func(items[i], items[j]) or (items[i] == items[j])
            if corresponds:
                matching = [idx for idx, cl in enumerate(clusters) if {i, j} & cl]
                if matching:
                    rest = [cl for idx, cl in enumerate(clusters) if idx not in matching]
                    merged = {i, j}.union(*[clusters[idx] for idx in matching])
                    clusters = [*rest, merged]
                else:
                    clusters.append({i, j})
    return [[items[idx] for idx in cl] for cl in clusters]


class _UF:
    __slots__ = ("parent", "size", "order")

    def __init__(self):
        self.parent: dict = {}
        self.size: dict = {}
        self.order: list = []  # insertion order of keys

    def find(self, k):
        if k not in self.parent:
            self.parent[k] = k
            self.size[k] = 1
            self.order.append(k)
            return k
        while self.parent[k] != k:
            self.parent[k] = self.parent[self.parent[k]]
            k = self.parent[k]
        return k

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]


def find_components(edges: Iterable[Iterable[Any]]) -> list[list[Any]]:
    """Connected components over an edge list; component member order is key
    insertion order (reference: tables/__init__.py:115-126)."""
    uf = _UF()
    for edge in edges:
        e = list(edge)
        if len(e) == 1:
            e = e * 2
        uf.union(e[0], e[1])
    result = defaultdict(list)
    for key in uf.order:
        result[uf.find(key)].append(key)
    return list(result.values())
