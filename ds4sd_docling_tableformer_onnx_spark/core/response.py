"""Docling response assembly + dense row/column re-indexing.

Mirrors ``tf_predictor.py`` response generation (898-993 matched,
845-896 dummy), output merge (378-434) and the dense re-index pass of
``multi_table_predict`` (511-567).  Spark mapping: the dense re-index is
exactly ``dense_rank() OVER (PARTITION BY turn ORDER BY start_idx) - 1``
(W1); the merge is an equi-join + ``collect_list`` (J3).  Within a turn
the arrays are tiny, so both run as plain Python inside the batched UDF.
"""

from __future__ import annotations


def dummy_response(table_cells):
    """Response cells straight from structural cells (no pdf matching);
    reference ``_generate_tf_response_dummy`` (tf_predictor.py:845-896)."""
    out = []
    for cell in table_cells:
        colspan = cell.get("colspan_val", 1)
        rowspan = cell.get("rowspan_val", 1)
        label = cell["label"]
        row_id = cell["row_id"]
        col_id = cell["column_id"]
        bbox = cell["bbox"]
        out.append(
            {
                "cell_id": cell["cell_id"],
                "bbox": {
                    "b": bbox[3],
                    "l": bbox[0],
                    "r": bbox[2],
                    "t": bbox[1],
                    "token": "",
                },
                "row_span": rowspan,
                "col_span": colspan,
                "start_row_offset_idx": row_id,
                "end_row_offset_idx": row_id + rowspan,
                "start_col_offset_idx": col_id,
                "end_col_offset_idx": col_id + colspan,
                "indentation_level": 0,
                "text_cell_bboxes": [],
                "column_header": label == "ched",
                "row_header": label == "rhed",
                "row_section": label == "srow",
            }
        )
    return out


def matched_response(table_cells, matches):
    """Response cells keyed by pdf cell, one per matches entry; reference
    ``_generate_tf_response`` (tf_predictor.py:898-993).

    parity notes:
    - iterates matches in insertion order; the *last* matched table cell
      wins the offset/bbox fields, while header flags accumulate;
    - ``label`` is the first element of the collected label set — Python
      set iteration order, reproduced by keeping first-seen order here
      only when the set has one element (the practical case after final
      assignment, where each pdf cell has exactly one match).
    """
    cell_by_id = {}
    for tc in table_cells:
        cell_by_id.setdefault(tc["cell_id"], tc)  # first occurrence wins
    # prototype copy: same keys in the same insertion order as the
    # original literal; the mutable-valued fields are re-set fresh below
    proto = {
        "bbox": None,
        "row_span": 1,
        "col_span": 1,
        "start_row_offset_idx": -1,
        "end_row_offset_idx": -1,
        "start_col_offset_idx": -1,
        "end_col_offset_idx": -1,
        "indentation_level": 0,
        "text_cell_bboxes": None,
        "column_header": False,
        "row_header": False,
        "row_section": False,
        "cell_id": None,
    }
    out = []
    for pdf_cell_id, match_list in matches.items():
        cell = proto.copy()
        cell["bbox"] = {}
        cell["text_cell_bboxes"] = [{}]
        cell["cell_id"] = int(pdf_cell_id)
        # fast path: after final assignment each pdf cell has exactly
        # one match (the practical case) — the accumulation loop below
        # then reduces to direct field assignment; single-element sets
        # make the set/list round-trips order-trivial, so this branch
        # is value-identical to the general loop by construction
        if len(match_list) == 1:
            tc = cell_by_id.get(match_list[0]["table_cell_id"])
            if tc is None:
                cell["row_ids"] = []
                cell["column_ids"] = []
                cell["label"] = "None"
                out.append(cell)
                continue
            label = tc["label"]
            col_id = tc["column_id"]
            row_id = tc["row_id"]
            if label == "ched":
                cell["column_header"] = True
            elif label == "rhed":
                cell["row_header"] = True
            elif label == "srow":
                cell["row_section"] = True
            cell["start_col_offset_idx"] = col_id
            cell["end_col_offset_idx"] = col_id + 1
            cell["start_row_offset_idx"] = row_id
            cell["end_row_offset_idx"] = row_id + 1
            if "colspan_val" in tc:
                cell["col_span"] = tc["colspan_val"]
                cell["end_col_offset_idx"] = col_id + tc["colspan_val"]
            if "rowspan_val" in tc:
                cell["row_span"] = tc["rowspan_val"]
                cell["end_row_offset_idx"] = row_id + tc["rowspan_val"]
            if "bbox" in tc:
                b = tc["bbox"]
                cell["bbox"] = {"b": b[3], "l": b[0], "r": b[2], "t": b[1]}
            cell["row_ids"] = [row_id]
            cell["column_ids"] = [col_id]
            cell["label"] = label
            out.append(cell)
            continue
        row_ids, col_ids, labels = set(), set(), set()
        for match in match_list:
            tc = cell_by_id.get(match["table_cell_id"])
            if tc is None:
                continue
            row_ids.add(tc["row_id"])
            col_ids.add(tc["column_id"])
            labels.add(tc["label"])
            if tc["label"] == "ched":
                cell["column_header"] = True
            if tc["label"] == "rhed":
                cell["row_header"] = True
            if tc["label"] == "srow":
                cell["row_section"] = True
            cell["start_col_offset_idx"] = tc["column_id"]
            cell["end_col_offset_idx"] = tc["column_id"] + 1
            cell["start_row_offset_idx"] = tc["row_id"]
            cell["end_row_offset_idx"] = tc["row_id"] + 1
            if "colspan_val" in tc:
                cell["col_span"] = tc["colspan_val"]
                cell["end_col_offset_idx"] = tc["column_id"] + cell["col_span"]
            if "rowspan_val" in tc:
                cell["row_span"] = tc["rowspan_val"]
                cell["end_row_offset_idx"] = tc["row_id"] + cell["row_span"]
            if "bbox" in tc:
                b = tc["bbox"]
                cell["bbox"] = {"b": b[3], "l": b[0], "r": b[2], "t": b[1]}
        cell["row_ids"] = list(row_ids)
        cell["column_ids"] = list(col_ids)
        label_list = list(labels)
        cell["label"] = label_list[0] if label_list else "None"
        out.append(cell)
    return out


def merge_output(docling_output, pdf_cells):
    """Merge response cells into one output cell per (col, row) start
    slot, accumulating matched pdf-cell text bboxes; reference
    ``_merge_tf_output`` (tf_predictor.py:378-434)."""
    pdf_by_id = {}
    for pdf_cell in pdf_cells:
        pdf_by_id.setdefault(pdf_cell["id"], pdf_cell)
    merged = {}
    for item in docling_output:
        # tuple key, not the reference's "col_row" string: the key is
        # internal (output is list(merged.values())) and int tuples are
        # distinct exactly when the formatted strings are
        key = (item["start_col_offset_idx"], item["start_row_offset_idx"])
        if key not in merged:
            merged[key] = {
                "bbox": item["bbox"],
                "row_span": item["row_span"],
                "col_span": item["col_span"],
                "start_row_offset_idx": item["start_row_offset_idx"],
                "end_row_offset_idx": item["end_row_offset_idx"],
                "start_col_offset_idx": item["start_col_offset_idx"],
                "end_col_offset_idx": item["end_col_offset_idx"],
                "indentation_level": item["indentation_level"],
                "text_cell_bboxes": [],
                "column_header": item["column_header"],
                "row_header": item["row_header"],
                "row_section": item["row_section"],
            }
        pdf_cell = pdf_by_id.get(item["cell_id"])
        if pdf_cell is not None:
            merged[key]["text_cell_bboxes"].append(
                {
                    "b": pdf_cell["bbox"][3],
                    "l": pdf_cell["bbox"][0],
                    "r": pdf_cell["bbox"][2],
                    "t": pdf_cell["bbox"][1],
                    "token": pdf_cell["text"],
                }
            )
    return list(merged.values())


def dense_reindex(tf_responses):
    """Replace start col/row ids by their rank so indexes are gapless;
    recompute ends from spans; return (num_cols, num_rows) as the maxima
    (reference multi_table_predict, tf_predictor.py:511-567).

    The Spark-native expression of this op over a whole table of cells is
    ``dense_rank() OVER (PARTITION BY conv_id, turn_idx ORDER BY
    start_col_offset_idx) - 1`` (see operators/relational.py, W1); here it
    runs per turn on the in-memory cell list.
    """
    start_cols = sorted({c["start_col_offset_idx"] for c in tf_responses})
    start_rows = sorted({c["start_row_offset_idx"] for c in tf_responses})
    col_rank = {v: i for i, v in enumerate(start_cols)}
    row_rank = {v: i for i, v in enumerate(start_rows)}

    max_end_col = 0
    max_end_row = 0
    for cell in tf_responses:
        start_col = col_rank[cell["start_col_offset_idx"]]
        end_col = start_col + cell["col_span"]
        cell["start_col_offset_idx"] = start_col
        cell["end_col_offset_idx"] = end_col
        if end_col > max_end_col:
            max_end_col = end_col
        start_row = row_rank[cell["start_row_offset_idx"]]
        end_row = start_row + cell["row_span"]
        cell["start_row_offset_idx"] = start_row
        cell["end_row_offset_idx"] = end_row
        if end_row > max_end_row:
            max_end_row = end_row
    return max_end_col, max_end_row
