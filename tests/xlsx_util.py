"""Minimal stdlib xlsx reader for golden-workbook comparisons."""

import re
import zipfile
from xml.etree import ElementTree as ET

_M = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def read_xlsx_values(path) -> dict[str, list[list]]:
    z = zipfile.ZipFile(path)
    shared = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall(f"{_M}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_M}t")))
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    sheets = [(s.get("name"), s.get(f"{_R}id")) for s in wb.iter(f"{_M}sheet")]
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rmap = {r.get("Id"): r.get("Target") for r in rels}
    out = {}
    for name, rid in sheets:
        tgt = rmap[rid].lstrip("/")
        if not tgt.startswith("xl/"):
            tgt = "xl/" + tgt
        root = ET.fromstring(z.read(tgt))
        cells = {}
        for c in root.iter(f"{_M}c"):
            ref = c.get("r")
            t = c.get("t")
            if t == "inlineStr":
                is_el = c.find(f"{_M}is")
                val = "".join(x.text or "" for x in is_el.iter(f"{_M}t")) if is_el is not None else None
                if val is None:
                    continue
            else:
                v = c.find(f"{_M}v")
                if v is None:
                    continue
                val = shared[int(v.text)] if t == "s" else v.text
            m = re.match(r"([A-Z]+)(\d+)", ref)
            col = 0
            for ch in m.group(1):
                col = col * 26 + ord(ch) - 64
            cells[(int(m.group(2)) - 1, col - 1)] = val
        if cells:
            nr = max(k[0] for k in cells) + 1
            nc = max(k[1] for k in cells) + 1
            out[name] = [[cells.get((r, c)) for c in range(nc)] for r in range(nr)]
        else:
            out[name] = []
    return out
