#!/usr/bin/env python3
"""Build the embedded fixture pool from the public reference artifacts.

Reads (read-only) from the reference checkout:
- ``results/tableformer_docling_fintabnet.json``   end-to-end predictions
- ``results/tableformer_sequence_decoding_reference.json``
- ``dataset/FinTabNet/test-data-sample.parquet``   ground-truth OTSL/HTML

and writes ``ds4sd_docling_tableformer_onnx_spark/data/fixture_pool.json``
— the deterministic per-turn payload pool used by the synthetic
transcript generator, the test suite and the benchmark.  Everything in
the pool is *data* (token sequences, bboxes, expected outputs), no code.

Usage: python scripts/build_fixture_pool.py [reference_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ds4sd_docling_tableformer_onnx_spark.core.pipeline import extract_turn  # noqa: E402


def main(reference_dir: str = "/root/reference") -> None:
    ref = Path(reference_dir)
    pool = {"predictions": [], "tables": []}

    # --- end-to-end prediction payloads (dummy path, exact tf_responses) ---
    e2e = json.load(open(ref / "results" / "tableformer_docling_fintabnet.json"))
    for name, page in sorted(e2e.items()):
        for idx, table in enumerate(page["tables"]):
            det = table["predict_details"]
            pred = det["prediction"]
            payload = {
                "tag_seq": pred["tag_seq"],
                "bboxes": pred["bboxes"],
                "classes": pred["classes"],
                "table_bbox": det["table_bbox"],
                "page_width": det["page_width"],
                "page_height": det["page_height"],
                "pdf_cells": [],
            }
            pool["predictions"].append(
                {
                    "source": f"{name}#{idx}",
                    "payload": payload,
                    "expected": {
                        "tf_responses": table["tf_responses"],
                        "num_cols": det["num_cols"],
                        "num_rows": det["num_rows"],
                        "rs_seq": pred["rs_seq"],
                        "html_seq": pred["html_seq"],
                    },
                }
            )

    # --- FinTabNet ground-truth tables (OTSL/HTML round-trip oracle) ---
    import pyarrow.parquet as pq

    table = pq.read_table(ref / "dataset" / "FinTabNet" / "test-data-sample.parquet")
    frame = table.to_pandas()
    for _, row in frame.iterrows():
        cells = row["cells"][0]
        pool["tables"].append(
            {
                "filename": row["filename"],
                "otsl": list(row["otsl"]),
                "html": list(row["html"]),
                "html_restored": list(row["html_restored"]),
                "cols": int(row["cols"]),
                "rows": int(row["rows"]),
                "cell_tokens": [list(c["tokens"]) for c in cells],
                "cell_bboxes": [[int(v) for v in c["bbox"]][:4] for c in cells],
            }
        )

    # --- matched-path regression payloads ------------------------------
    # Deterministic pdf cells derived from each prediction's structural
    # grid; expected outputs frozen from the current engine AFTER the
    # match/post-process stages were verified bit-exact against the
    # reference library (see tests/fixtures/postprocess_golden.json).
    import random

    from ds4sd_docling_tableformer_onnx_spark.core.cells import (
        build_table_cells,
        translate_bboxes,
    )
    from ds4sd_docling_tableformer_onnx_spark.core.pipeline import decode_prediction

    rng = random.Random(20260816)
    pool["matched"] = []
    for entry in pool["predictions"]:
        payload = dict(entry["payload"])
        prediction = decode_prediction(payload)
        page_boxes = translate_bboxes(payload["table_bbox"], prediction["bboxes"])
        cells = build_table_cells(
            prediction["html_seq"], prediction["rs_seq"], page_boxes, prediction["classes"]
        )
        pdf_cells = []
        pid = 0
        for cell in cells:
            b = cell["bbox"]
            dx = rng.uniform(-1.5, 1.5)
            dy = rng.uniform(-0.8, 0.8)
            pdf_cells.append(
                {
                    "id": pid,
                    "text": f"tok{pid}",
                    "bbox": [b[0] + dx, b[1] + dy, b[2] + dx / 2, b[3] + dy / 2],
                }
            )
            pid += 1
        for k in range(2):  # orphans outside the matched grid
            pdf_cells.append(
                {
                    "id": pid,
                    "text": f"orph{k}",
                    "bbox": [4.0 + 9 * k, 58.0 + k, 11.0 + 9 * k, 64.0 + k],
                }
            )
            pid += 1
        payload["pdf_cells"] = pdf_cells
        out = extract_turn(payload)
        pool["matched"].append(
            {
                "source": entry["source"],
                "payload": payload,
                "expected": {
                    "tf_responses": out["tf_responses"],
                    "num_cols": out["num_cols"],
                    "num_rows": out["num_rows"],
                    "n_matches": out["n_matches"],
                },
            }
        )

    out_path = REPO / "ds4sd_docling_tableformer_onnx_spark" / "data" / "fixture_pool.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w") as fp:
        json.dump(pool, fp)
    size = out_path.stat().st_size
    print(
        f"wrote {out_path} ({size/1024:.0f} KiB): "
        f"{len(pool['predictions'])} predictions, {len(pool['tables'])} tables, "
        f"{len(pool['matched'])} matched cases"
    )


if __name__ == "__main__":
    main(*sys.argv[1:])
