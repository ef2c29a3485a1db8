"""Geometric objects carried between kernels.

Behavioral parity targets (reference, read-only at /root/reference):
  - Cell:  src/img2table/tables/objects/cell.py:7-21
  - Line:  src/img2table/tables/objects/line.py:10-70
  - Table: src/img2table/tables/objects/table.py:18-210
Merged cells are modeled exactly like the reference: the *same* Cell object
occupies several grid positions; value-level identity is (bbox, content)
equality (reference hashes ``repr`` — src/img2table/tables/objects/cell.py:20-21).
"""

from __future__ import annotations

import math


class Cell:
    __slots__ = ("x1", "y1", "x2", "y2", "content")

    def __init__(self, x1: int, y1: int, x2: int, y2: int, content: str | None = None):
        self.x1 = int(x1)
        self.y1 = int(y1)
        self.x2 = int(x2)
        self.y2 = int(y2)
        self.content = content

    @property
    def height(self) -> int:
        return self.y2 - self.y1

    @property
    def width(self) -> int:
        return self.x2 - self.x1

    @property
    def area(self) -> int:
        return self.height * self.width

    def bbox(self, margin: int = 0) -> tuple[int, int, int, int]:
        return (self.x1 - margin, self.y1 - margin, self.x2 + margin, self.y2 + margin)

    # Value identity (reference: hash(repr) on a dataclass ⇒ bbox+content)
    def key(self) -> tuple:
        return (self.x1, self.y1, self.x2, self.y2, self.content)

    def __eq__(self, other) -> bool:
        return isinstance(other, Cell) and self.key() == other.key()

    def __hash__(self) -> int:
        return hash(self.key())

    def __repr__(self) -> str:
        return f"Cell(x1={self.x1}, y1={self.y1}, x2={self.x2}, y2={self.y2}, content={self.content!r})"


class Line:
    __slots__ = ("x1", "y1", "x2", "y2", "thickness")

    def __init__(self, x1: int, y1: int, x2: int, y2: int, thickness: int | None = None):
        self.x1 = int(x1)
        self.y1 = int(y1)
        self.x2 = int(x2)
        self.y2 = int(y2)
        self.thickness = thickness

    @property
    def angle(self) -> float:
        # reference: line.py:18-23
        return math.atan2(self.y2 - self.y1, self.x2 - self.x1) * 180 / math.pi

    @property
    def height(self) -> int:
        return self.y2 - self.y1

    @property
    def width(self) -> int:
        return self.x2 - self.x1

    @property
    def length(self) -> float:
        return math.hypot(self.height, self.width)

    @property
    def horizontal(self) -> bool:
        return self.angle % 180 == 0

    @property
    def vertical(self) -> bool:
        return self.angle % 180 == 90

    def transpose(self) -> "Line":
        return Line(self.y1, self.x1, self.y2, self.x2, self.thickness)

    def reprocess(self) -> "Line":
        # reference: line.py:51-67 — order coords, snap ±5° lines to axis
        _x1, _x2 = min(self.x1, self.x2), max(self.x1, self.x2)
        _y1, _y2 = min(self.y1, self.y2), max(self.y1, self.y2)
        self.x1, self.x2, self.y1, self.y2 = _x1, _x2, _y1, _y2

        if abs(self.angle) <= 5:
            y_val = round((self.y1 + self.y2) / 2)
            self.y1 = self.y2 = y_val
        elif abs(self.angle - 90) <= 5:
            x_val = round((self.x1 + self.x2) / 2)
            self.x1 = self.x2 = x_val
        return self

    def key(self) -> tuple:
        return (self.x1, self.y1, self.x2, self.y2, self.thickness)

    def __eq__(self, other) -> bool:
        return isinstance(other, Line) and self.key() == other.key()

    def __hash__(self) -> int:
        return hash(self.key())

    def __repr__(self) -> str:
        return f"Line(x1={self.x1}, y1={self.y1}, x2={self.x2}, y2={self.y2}, thickness={self.thickness})"


class Table:
    """Grid of Cell objects; rows is list[list[Cell]]; merged cells share
    one Cell object across positions (reference: table.py:18-27)."""

    __slots__ = ("rows", "borderless", "title")

    def __init__(self, rows: list[list[Cell]], borderless: bool = False, title: str | None = None):
        self.rows = rows or []
        self.borderless = borderless
        self.title = title

    @property
    def nb_rows(self) -> int:
        return len(self.rows)

    @property
    def nb_columns(self) -> int:
        return len(self.rows[0]) if self.rows else 0

    @property
    def x1(self) -> int:
        return min(c.x1 for r in self.rows for c in r)

    @property
    def y1(self) -> int:
        return min(c.y1 for r in self.rows for c in r)

    @property
    def x2(self) -> int:
        return max(c.x2 for r in self.rows for c in r)

    @property
    def y2(self) -> int:
        return max(c.y2 for r in self.rows for c in r)

    def remove_rows(self, row_ids: list[int]) -> None:
        # reference: table.py:104-129 — close gaps by meeting halfway
        remaining = [i for i in range(self.nb_rows) if i not in row_ids]
        if len(remaining) > 1:
            gaps = [(i, j) for i, j in zip(remaining, remaining[1:]) if j - i > 1]
            for i, j in gaps:
                y_row2 = max(c.y2 for c in self.rows[i])
                y_row1 = min(c.y1 for c in self.rows[j])
                y_gap = round((y_row2 + y_row1) / 2)
                for c in self.rows[i]:
                    c.y2 = max(c.y2, y_gap)
                for c in self.rows[j]:
                    c.y1 = min(c.y1, y_gap)
        for idx in sorted(row_ids, reverse=True):
            self.rows.pop(idx)

    def remove_columns(self, col_ids: list[int]) -> None:
        # reference: table.py:131-156
        remaining = [i for i in range(self.nb_columns) if i not in col_ids]
        if len(remaining) > 1:
            gaps = [(i, j) for i, j in zip(remaining, remaining[1:]) if j - i > 1]
            for i, j in gaps:
                vals = [row[i].x2 + row[j].x1 for row in self.rows]
                x_gap = round((sum(vals) / len(vals)) / 2)
                for row in self.rows:
                    row[i].x2 = max(row[i].x2, x_gap)
                    row[j].x1 = min(row[j].x1, x_gap)
        for idx in sorted(col_ids, reverse=True):
            for row in self.rows:
                row.pop(idx)

    def __repr__(self) -> str:
        return f"Table(nb_rows={self.nb_rows}, nb_columns={self.nb_columns}, borderless={self.borderless})"
