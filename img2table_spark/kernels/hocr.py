"""S5 (parse step) — hOCR HTML → 10-column word table (pandas).

Parity target: reference src/img2table/ocr/tesseract.py:100-141
(BeautifulSoup find_all(class_=True); value = bs4 ``.string`` semantics —
single-descendant text only; junk-only strings (whitespace/|/L/_/;/*)
nulled; confidence from ``x_wconf \\d{1,2}``; bbox from title attr).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd

from img2table_spark.kernels.text import WORD_COLUMNS

_JUNK = re.compile(r"^(\s|\||L|_|;|\*)*$")
_CONF = re.compile(r"x_wconf \d{1,2}")
_BBOX = re.compile(r"bbox \d{1,4} \d{1,4} \d{1,4} \d{1,4}")

_VOID = {"meta", "br", "img", "hr", "link", "input"}


class _Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = dict(attrs)
        self.children = []
        self.parent = parent

    def string(self):
        """bs4 ``.string``: the single descendant string, else None."""
        node = self
        while True:
            if len(node.children) != 1:
                return None
            child = node.children[0]
            if isinstance(child, str):
                return child
            node = child


class _DomParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("[root]", {}, None)
        self.cur = self.root
        self.order: list[_Node] = []

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs, self.cur)
        self.cur.children.append(node)
        self.order.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag, attrs, self.cur)
        self.cur.children.append(node)
        self.order.append(node)

    def handle_endtag(self, tag):
        node = self.cur
        while node is not self.root and node.tag != tag:
            node = node.parent
        if node is not self.root:
            self.cur = node.parent

    def handle_data(self, data):
        if data:
            self.cur.children.append(data)


def parse_hocr_pages(pages: list[str]) -> pd.DataFrame | None:
    """hOCR strings (one per page) → word-table DataFrame (or None)."""
    rows = []
    for page, hocr in enumerate(pages):
        parser = _DomParser()
        parser.feed(hocr)
        parser.close()
        for el in parser.order:
            if "class" not in el.attrs or el.attrs.get("class") is None:
                continue
            title = el.attrs.get("title", "") or ""
            bbox_m = _BBOX.findall(title)
            if not bbox_m:
                continue
            s = el.string()
            if s is not None:
                value = _JUNK.sub("", s).strip() or None
            else:
                value = None
            conf_m = _CONF.findall(title)
            confidence = int(conf_m[0].split()[1]) if conf_m else None
            x1, y1, x2, y2 = (int(v) for v in re.sub(r"^bbox\s", "", bbox_m[0]).split())
            rows.append(
                {
                    "page": page,
                    "class": el.attrs["class"].split()[0],
                    "id": el.attrs.get("id"),
                    "parent": el.parent.attrs.get("id") if el.parent else None,
                    "value": value,
                    "confidence": confidence,
                    "x1": x1,
                    "y1": y1,
                    "x2": x2,
                    "y2": y2,
                }
            )
    if not rows:
        return None
    return pd.DataFrame(rows, columns=WORD_COLUMNS)
