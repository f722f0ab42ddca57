"""Fixture payload pool: deterministic per-turn extraction payloads.

Every transcript turn carries one payload from this pool; each payload's
expected extraction output is anchored in the reference repo's golden
artifacts (embedded at build time by ``scripts/build_fixture_pool.py``):

- ``predictions``: the reference's committed end-to-end predictions
  (exact ``tf_responses`` + html); dummy (no-matching) path.
- ``matched``: the same predictions with deterministic pdf cells; full
  matching + post-processing path (stages verified against the
  reference library).
- ``tables``: FinTabNet ground-truth tables; the expected HTML is the
  reference's own ``html_restored`` round-trip oracle.  Synthetic grid
  bboxes are attached so the geometric stages execute.
"""

from __future__ import annotations

import json
from functools import lru_cache


def _read_pool_json() -> str:
    """Read the embedded fixture pool via importlib.resources so it
    works when the package ships as a ``--py-files`` zip (executors
    import from the archive; a pathlib read into the zip would crash —
    caught by tests/test_packaging.py)."""
    from importlib.resources import files

    pkg = __package__.rsplit(".", 1)[0]  # ds4sd_docling_tableformer_onnx_spark
    return files(pkg).joinpath("data/fixture_pool.json").read_text()


def _grid_payload(table, matched, pool_index):
    """Build a deterministic payload for a ground-truth table: uniform
    grid bboxes in the normalized table system, one per cell tag."""
    from ..core.cells import build_table_cells, translate_bboxes
    from ..core.otsl import otsl_to_html

    rows, cols = max(table["rows"], 1), max(table["cols"], 1)
    otsl = table["otsl"]
    html = otsl_to_html(otsl)

    # count bbox-consuming tags (fcel/ecel/xcel/ched/rhed/srow) by walking
    # the grid the same way the cell builder does
    from ..core.cells import GRID_CELL_TAGS

    positions = []
    r = c = 0
    for tag in otsl:
        if tag == "nl":
            r += 1
            c = 0
            continue
        if tag in GRID_CELL_TAGS:
            positions.append((r, c))
        c += 1

    bboxes = []
    for (r, c) in positions:
        x1 = c / cols
        y1 = r / rows
        bboxes.append([x1 + 0.01, y1 + 0.01, x1 + 0.9 / cols, y1 + 0.9 / rows])
    classes = [1 if tag == "ecel" else 2 for tag in otsl if tag in GRID_CELL_TAGS]

    table_bbox = [0.0, 0.0, 40.0 * cols, 12.0 * rows]
    payload = {
        "otsl": otsl,
        "bboxes": bboxes,
        "classes": classes,
        "table_bbox": table_bbox,
        "page_width": table_bbox[2],
        "page_height": table_bbox[3],
        "pdf_cells": [],
    }
    if matched:
        page_boxes = translate_bboxes(table_bbox, bboxes)
        cells = build_table_cells(html, otsl, page_boxes, classes)
        pdf_cells = []
        for i, cell in enumerate(cells):
            b = cell["bbox"]
            # deterministic sub-box of each cell, offset varies by index
            dx = ((i * 7 + pool_index * 3) % 5) * 0.1
            pdf_cells.append(
                {
                    "id": i,
                    "text": f"t{i}" if cell["label"] != "ecel" else "",
                    "bbox": [b[0] + dx, b[1] + 0.1, b[2] - 0.2, b[3] - 0.1],
                }
            )
        payload["pdf_cells"] = pdf_cells
    return payload, html


@lru_cache(maxsize=1)
def payload_pool():
    """List of pool entries:
    ``{payload_id, kind, text, tool, expected_html_json, expected_tf_json}``.

    ``text``/``tool`` are the JSON strings stored in the transcript
    columns of the same name; expected_* anchor per-turn equality.
    """
    pool_raw = json.loads(_read_pool_json())
    from ..core.pipeline import extract_turn

    entries = []

    def add(kind, source, payload, expected_html, expected_tf):
        text = json.dumps(
            {
                "tag_seq": payload.get("tag_seq"),
                "otsl": payload.get("otsl"),
                "bboxes": payload["bboxes"],
                "classes": payload["classes"],
            }
        )
        tool = json.dumps(
            {
                "payload_id": len(entries),
                "table_bbox": payload["table_bbox"],
                "page_width": payload["page_width"],
                "page_height": payload["page_height"],
                "pdf_cells": payload.get("pdf_cells") or [],
            }
        )
        entries.append(
            {
                "payload_id": len(entries),
                "kind": kind,
                "source": source,
                "text": text,
                "tool": tool,
                "expected_html_json": json.dumps(expected_html),
                "expected_tf_json": json.dumps(expected_tf),
            }
        )

    for item in pool_raw["predictions"]:
        add(
            "prediction",
            item["source"],
            item["payload"],
            item["expected"]["html_seq"],
            item["expected"]["tf_responses"],
        )
    for item in pool_raw["matched"]:
        add(
            "matched",
            item["source"],
            item["payload"],
            None,
            item["expected"]["tf_responses"],
        )
    for i, table in enumerate(pool_raw["tables"]):
        for matched in (False, True):
            payload, html = _grid_payload(table, matched, i)
            # the reference's round-trip oracle pins the html sequence
            expected_html = table["html_restored"]
            expected_tf = extract_turn(payload)["tf_responses"]
            add(
                "table_matched" if matched else "table",
                f"{table['filename']}#{i}",
                payload,
                expected_html,
                expected_tf,
            )

    # matched entries: expected html = engine html (matching does not
    # change the structure tokens)
    for entry in entries:
        if entry["expected_html_json"] == "null":
            payload = json.loads(entry["text"])
            payload.update(json.loads(entry["tool"]))
            entry["expected_html_json"] = json.dumps(
                extract_turn(payload)["html_seq"]
            )
    return entries
