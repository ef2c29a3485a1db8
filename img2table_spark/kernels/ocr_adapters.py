"""S6–S11 — vendor OCR output → the fixed 10-column word table.

The network/OCR engines themselves are out of scope (SURVEY.md §2.1); what
the engine keeps is the adapter layer, so any OCR source can be plugged in
as a DataFrame. Parsers ported with golden parity:

  - easyocr_words:       reference src/img2table/ocr/easyocr.py:43-69
  - textract_map_response: src/img2table/ocr/aws_textract.py:42-82
  - vision_map_response:  src/img2table/ocr/google_vision.py:46-92
  - (tesseract hOCR lives in kernels/hocr.py)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from img2table_spark.kernels.text import WORD_COLUMNS


def words_dataframe(elements: list[dict]) -> pd.DataFrame | None:
    if not elements:
        return None
    return pd.DataFrame(elements, columns=WORD_COLUMNS)


def easyocr_words(content: list[list]) -> pd.DataFrame | None:
    """content: per page, list of (polygon, text, confidence) triples."""
    elements = []
    for page, ocr_result in enumerate(content):
        for idx, word in enumerate(ocr_result):
            elements.append(
                {
                    "page": page,
                    "class": "ocrx_word",
                    "id": f"word_{page + 1}_{idx + 1}",
                    "parent": f"word_{page + 1}_{idx + 1}",
                    "value": word[1],
                    "confidence": round(100 * word[2]),
                    "x1": round(min(edge[0] for edge in word[0])),
                    "y1": round(min(edge[1] for edge in word[0])),
                    "x2": round(max(edge[0] for edge in word[0])),
                    "y2": round(max(edge[1] for edge in word[0])),
                }
            )
    return words_dataframe(elements)


def textract_map_response(response: dict, width: int, height: int, page: int) -> list[dict]:
    """AWS Textract detect_document_text response → word elements."""
    dict_children: dict[str, str] = {}
    word_elements = []
    for block in response.get("Blocks"):
        children = [
            child
            for rel in block.get("Relationships", [])
            for child in rel.get("Ids")
            if rel.get("Type") == "CHILD"
        ]
        for child in children:
            dict_children[child] = block.get("Id")
        if block.get("BlockType") == "WORD":
            poly = block.get("Geometry").get("Polygon")
            word_elements.append(
                {
                    "page": page,
                    "class": "ocrx_word",
                    "id": block.get("Id"),
                    "parent": dict_children.get(block.get("Id")),
                    "value": block.get("Text"),
                    "confidence": round(block.get("Confidence", 0)),
                    "x1": round(min(el.get("X") for el in poly) * width),
                    "x2": round(max(el.get("X") for el in poly) * width),
                    "y1": round(min(el.get("Y") for el in poly) * height),
                    "y2": round(max(el.get("Y") for el in poly) * height),
                }
            )
    return word_elements


def vision_map_response(response: dict, page: int, width: int, height: int) -> list[dict]:
    """Google Vision images:annotate response → word elements (incl. line
    breaks and the 0/width replacement for missing vertex coords)."""
    elements = []
    blocks = response["responses"][0]["fullTextAnnotation"]["pages"][0]["blocks"]
    for id_block, block in enumerate(blocks):
        for id_par, par in enumerate(block.get("paragraphs")):
            id_line = 0
            for id_word, word in enumerate(par.get("words")):
                verts = word.get("boundingBox").get("vertices")
                x_avg = np.mean([el.get("x") for el in verts if el.get("x")])
                x_repl = min((0, width), key=lambda val: abs(val - x_avg))
                y_avg = np.mean([el.get("y") for el in verts if el.get("y")])
                y_repl = min((0, height), key=lambda val: abs(val - y_avg))

                d_el = {
                    "page": page,
                    "class": "ocrx_word",
                    "id": f"word_{id_block}_{id_par}_{id_line}_{id_word}",
                    "parent": f"line_{id_block}_{id_par}_{id_line}",
                    "value": "".join(sym.get("text") for sym in word.get("symbols")),
                    "confidence": round(100 * word.get("confidence")),
                    "x1": min(el.get("x", x_repl) for el in verts),
                    "x2": max(el.get("x", x_repl) for el in verts),
                    "y1": min(el.get("y", y_repl) for el in verts),
                    "y2": max(el.get("y", y_repl) for el in verts),
                }
                _break = (
                    word.get("symbols")[-1]
                    .get("property", {})
                    .get("detectedBreak", {})
                    .get("type")
                )
                if _break in ("EOL_SURE_SPACE", "LINE_BREAK"):
                    id_line += 1
                elif _break == "HYPHEN":
                    id_line += 1
                    d_el["value"] += "-"
                elements.append(d_el)
    return elements


def doctr_words(content) -> pd.DataFrame | None:
    """docTR Document (pages→blocks→lines→words, relative geometry) → word
    table (reference: src/img2table/ocr/doctr.py:37-69; note line_id resets
    per block and word_id runs per page, kept verbatim)."""
    elements = []
    for page_id, page in enumerate(content.pages):
        dimensions = page.dimensions
        word_id = 0
        for block in page.blocks:
            for line_id, line in enumerate(block.lines):
                for word in line.words:
                    word_id += 1
                    elements.append(
                        {
                            "page": page_id,
                            "class": "ocrx_word",
                            "id": f"word_{page_id + 1}_{line_id}_{word_id}",
                            "parent": f"word_{page_id + 1}_{line_id}",
                            "value": word.value,
                            "confidence": int(round(100 * word.confidence)),
                            "x1": int(round(word.geometry[0][0] * dimensions[1])),
                            "y1": int(round(word.geometry[0][1] * dimensions[0])),
                            "x2": int(round(word.geometry[1][0] * dimensions[1])),
                            "y2": int(round(word.geometry[1][1] * dimensions[0])),
                        }
                    )
    return words_dataframe(elements)


def surya_words(content: list) -> pd.DataFrame | None:
    """Surya OCRResult list (text_lines with polygon/text/confidence) → word
    table (reference: src/img2table/ocr/surya.py:49-76). bbox falls back to
    the polygon envelope when not materialized (it is a computed property on
    surya's schema objects)."""
    elements = []
    for page_id, ocr_result in enumerate(content):
        for idx, tl in enumerate(ocr_result.text_lines):
            bbox = getattr(tl, "bbox", None)
            if bbox is None:
                xs = [p[0] for p in tl.polygon]
                ys = [p[1] for p in tl.polygon]
                bbox = [min(xs), min(ys), max(xs), max(ys)]
            elements.append(
                {
                    "page": page_id,
                    "class": "ocrx_word",
                    "id": f"word_{page_id + 1}_{idx + 1}_0",
                    "parent": f"word_{page_id + 1}_{idx + 1}",
                    "value": tl.text,
                    "confidence": int(round(100 * tl.confidence)),
                    "x1": int(bbox[0]),
                    "y1": int(bbox[1]),
                    "x2": int(bbox[2]),
                    "y2": int(bbox[3]),
                }
            )
    return words_dataframe(elements)


def azure_words(content: list) -> pd.DataFrame | None:
    """Azure Read API results (ReadOperationResult list) → word table
    (reference: src/img2table/ocr/azure.py:85-123; line/word counters run
    per page across read_results)."""
    elements = []
    for page, result in enumerate(content):
        line_cnt = 0
        word_cnt = 0
        for r in result.analyze_result.read_results:
            for line in r.lines:
                line_cnt += 1
                for word in line.words:
                    word_cnt += 1
                    bbox = [int(v) for v in word.bounding_box]
                    elements.append(
                        {
                            "page": page,
                            "class": "ocrx_word",
                            "id": f"word_{page + 1}_{word_cnt}",
                            "parent": f"word_{page + 1}_{line_cnt}",
                            "value": word.text,
                            "confidence": int(round(100 * word.confidence)),
                            "x1": min(bbox[::2]),
                            "x2": max(bbox[::2]),
                            "y1": min(bbox[1::2]),
                            "y2": max(bbox[1::2]),
                        }
                    )
    return words_dataframe(elements)


def paddle_words(content: list[dict]) -> pd.DataFrame | None:
    """PaddleOCR 3.x predict output → word table
    (reference: src/img2table/ocr/paddle.py:134-161; confidence 100·score
    truncated to int like the polars i64 cast)."""
    elements = []
    for page, ocr_result in enumerate(content):
        for idx, (word, conf, bbox) in enumerate(
            zip(ocr_result["rec_texts"], ocr_result["rec_scores"], ocr_result["rec_boxes"])
        ):
            elements.append(
                {
                    "page": page,
                    "class": "ocrx_word",
                    "id": f"word_{page + 1}_{idx + 1}",
                    "parent": f"word_{page + 1}_{idx + 1}",
                    "value": word,
                    "confidence": int(100 * conf),
                    "x1": int(bbox[0]),
                    "y1": int(bbox[1]),
                    "x2": int(bbox[2]),
                    "y2": int(bbox[3]),
                }
            )
    return words_dataframe(elements)
