"""Borderless-pipeline intermediate objects (intra-UDF only, never cross the
Spark boundary). Parity target: reference
src/img2table/tables/processing/borderless_tables/model.py:6-296."""

from __future__ import annotations

from dataclasses import dataclass, field

from img2table_spark.kernels.objects import Cell


@dataclass
class Whitespace:
    cells: list[Cell]

    @property
    def x1(self) -> int:
        return min(c.x1 for c in self.cells)

    @property
    def y1(self) -> int:
        return min(c.y1 for c in self.cells)

    @property
    def x2(self) -> int:
        return max(c.x2 for c in self.cells)

    @property
    def y2(self) -> int:
        return max(c.y2 for c in self.cells)

    @property
    def width(self) -> int:
        return sum(c.width for c in self.cells)

    @property
    def height(self) -> int:
        return sum(c.height for c in self.cells)

    @property
    def area(self) -> int:
        return sum(c.area for c in self.cells)

    @property
    def continuous(self) -> bool:
        return len(self.cells) == 1

    def flipped(self) -> "Whitespace":
        return Whitespace(cells=[Cell(c.y1, c.x1, c.y2, c.x2) for c in self.cells])

    def __contains__(self, item: "Whitespace") -> bool:
        return (
            self.x1 <= item.x1
            and self.y1 <= item.y1
            and self.x2 >= item.x2
            and self.y2 >= item.y2
        )

    def key(self) -> tuple:
        return tuple(c.key() for c in self.cells)

    def __hash__(self) -> int:
        return hash(self.key())


@dataclass
class ImageSegment:
    x1: int
    y1: int
    x2: int
    y2: int
    elements: list[Cell] = None
    whitespaces: list[Whitespace] = None
    position: int = None

    @property
    def width(self) -> int:
        return self.x2 - self.x1

    @property
    def height(self) -> int:
        return self.y2 - self.y1

    @property
    def element_height(self) -> int:
        if self.elements:
            return max(el.y2 for el in self.elements) - min(el.y1 for el in self.elements)
        return self.height

    def set_elements(self, elements: list[Cell]) -> None:
        self.elements = elements

    def set_whitespaces(self, whitespaces: list[Whitespace]) -> None:
        self.whitespaces = whitespaces


@dataclass
class TableSegment:
    table_areas: list[ImageSegment]

    @property
    def x1(self) -> int:
        return min(a.x1 for a in self.table_areas)

    @property
    def y1(self) -> int:
        return min(a.y1 for a in self.table_areas)

    @property
    def x2(self) -> int:
        return max(a.x2 for a in self.table_areas)

    @property
    def y2(self) -> int:
        return max(a.y2 for a in self.table_areas)

    @property
    def elements(self) -> list[Cell]:
        return [el for a in self.table_areas for el in a.elements]

    @property
    def whitespaces(self) -> list[Whitespace]:
        return [ws for a in self.table_areas for ws in a.whitespaces]


@dataclass
class VerticalWS:
    ws: Whitespace
    position: int = 0
    top: bool = True
    bottom: bool = True
    used: bool = False

    @property
    def x1(self) -> int:
        return self.ws.x1

    @property
    def y1(self) -> int:
        return self.ws.y1

    @property
    def x2(self) -> int:
        return self.ws.x2

    @property
    def y2(self) -> int:
        return self.ws.y2

    @property
    def width(self) -> int:
        return self.ws.x2 - self.ws.x1

    @property
    def height(self) -> int:
        return self.ws.y2 - self.ws.y1

    @property
    def continuous(self) -> bool:
        return self.ws.continuous


@dataclass
class Column:
    whitespaces: list[VerticalWS]
    top: bool = True
    bottom: bool = True
    top_position: int = 0
    bottom_position: int = 0

    @property
    def x1(self) -> int:
        return max(v.ws.x1 for v in self.whitespaces)

    @property
    def y1(self) -> int:
        return min(v.ws.y1 for v in self.whitespaces)

    @property
    def x2(self) -> int:
        return min(v.ws.x2 for v in self.whitespaces)

    @property
    def y2(self) -> int:
        return max(v.ws.y2 for v in self.whitespaces)

    @property
    def height(self) -> int:
        y_values = {
            y for v in self.whitespaces for c in v.ws.cells for y in range(c.y1, c.y2 + 1)
        }
        return len(y_values) - 1

    @property
    def continuous(self) -> bool:
        return all(v.continuous for v in self.whitespaces)

    @classmethod
    def from_ws(cls, v_ws: VerticalWS) -> "Column":
        return cls(
            whitespaces=[v_ws],
            top=v_ws.top,
            bottom=v_ws.bottom,
            top_position=v_ws.position,
            bottom_position=v_ws.position,
        )

    def corresponds(self, v_ws: VerticalWS, char_length: float) -> bool:
        if self.bottom_position is None:
            return True
        if v_ws.position != self.bottom_position + 1:
            return False
        if not self.bottom or not v_ws.top:
            return False
        return min(self.x2, v_ws.x2) - max(self.x1, v_ws.x1) >= 0.5 * char_length

    def add(self, v_ws: VerticalWS) -> None:
        self.whitespaces.append(v_ws)
        self.top_position = min(self.top_position, v_ws.position)
        self.bottom_position = max(self.bottom_position, v_ws.position)
        if v_ws.position == self.top_position:
            self.top = v_ws.top
        if v_ws.position == self.bottom_position:
            self.bottom = v_ws.bottom


@dataclass
class ColumnGroup:
    columns: list[Column]
    char_length: float
    elements: list[Cell] = field(default_factory=list)

    def __post_init__(self) -> None:
        # Snap outermost columns to element extrema ± 0.5·char_length
        # (reference: model.py:219-243)
        self.columns = sorted(self.columns, key=lambda col: col.x1)
        if len(self.columns) >= 2 and len(self.elements) > 0:
            x_left = min(el.x1 for el in self.elements)
            x_right = max(el.x2 for el in self.elements)
            self.columns[0] = Column(
                whitespaces=[
                    VerticalWS(
                        ws=Whitespace(
                            cells=[
                                Cell(
                                    x_left - int(0.5 * self.char_length),
                                    c.y1,
                                    x_left - int(0.5 * self.char_length),
                                    c.y2,
                                )
                                for c in v.ws.cells
                            ]
                        )
                    )
                    for v in self.columns[0].whitespaces
                ]
            )
            self.columns[-1] = Column(
                whitespaces=[
                    VerticalWS(
                        ws=Whitespace(
                            cells=[
                                Cell(
                                    x_right + int(0.5 * self.char_length),
                                    c.y1,
                                    x_right + int(0.5 * self.char_length),
                                    c.y2,
                                )
                                for c in v.ws.cells
                            ]
                        )
                    )
                    for v in self.columns[-1].whitespaces
                ]
            )

    @property
    def x1(self) -> int:
        return min((d.x1 for d in self.columns), default=0)

    @property
    def y1(self) -> int:
        return min((d.y1 for d in self.columns), default=0)

    @property
    def x2(self) -> int:
        return max((d.x2 for d in self.columns), default=0)

    @property
    def y2(self) -> int:
        return max((d.y2 for d in self.columns), default=0)

    @property
    def bbox(self) -> Cell:
        return Cell(self.x1, self.y1, self.x2, self.y2)

    @property
    def height(self) -> int:
        return self.y2 - self.y1

    @property
    def width(self) -> int:
        return self.x2 - self.x1

    @property
    def area(self) -> int:
        return (self.x2 - self.x1) * (self.y2 - self.y1)
