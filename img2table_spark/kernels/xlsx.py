"""K3 — xlsx export (stdlib zipfile, no xlsxwriter).

Parity target: reference Document.to_xlsx + ExtractedTable._to_worksheet
(src/img2table/document/base/__init__.py:144-189,
tables/objects/extraction.py:176-206): one worksheet per table named
"Page {p+1} - Table {i+1}"; merged cells written as merge ranges from the
maximal-rectangle decomposition (T9), values at range anchors.
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

from img2table_spark.kernels.html_io import _group_spans
from img2table_spark.kernels.objects import Table


def _col_name(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _sheet_xml(table: Table) -> str:
    spans = _group_spans(table)
    cells: dict[tuple[int, int], str | None] = {}
    merges: list[str] = []
    for s in spans:
        cells[(s.top_row, s.col_left)] = s.value
        if s.colspan > 1 or s.rowspan > 1:
            merges.append(
                f"{_col_name(s.col_left)}{s.top_row + 1}:{_col_name(s.col_right)}{s.bottom_row + 1}"
            )
    rows_xml = []
    for r in range(table.nb_rows):
        row_cells = []
        for c in range(table.nb_columns):
            if (r, c) in cells and cells[(r, c)] is not None:
                v = escape(cells[(r, c)])
                row_cells.append(
                    f'<c r="{_col_name(c)}{r + 1}" t="inlineStr"><is><t xml:space="preserve">{v}</t></is></c>'
                )
        rows_xml.append(f'<row r="{r + 1}">' + "".join(row_cells) + "</row>")
    merge_xml = (
        f'<mergeCells count="{len(merges)}">'
        + "".join(f'<mergeCell ref="{m}"/>' for m in merges)
        + "</mergeCells>"
        if merges
        else ""
    )
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(rows_xml) + "</sheetData>" + merge_xml + "</worksheet>"
    )


def tables_to_xlsx_bytes(pages: dict[int, list[Table]]) -> bytes:
    """pages: {page_idx: [Table, ...]} → xlsx file bytes."""
    sheets: list[tuple[str, str]] = []
    for page, tables in pages.items():
        for i, tb in enumerate(tables):
            sheets.append((f"Page {page + 1} - Table {i + 1}", _sheet_xml(tb)))

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            + "".join(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
                for i in range(len(sheets))
            )
            + "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
            + "".join(
                f'<sheet name="{escape(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                for i, (name, _) in enumerate(sheets)
            )
            + "</sheets></workbook>",
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(len(sheets))
            )
            + "</Relationships>",
        )
        for i, (_, xml) in enumerate(sheets):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
    return buf.getvalue()
