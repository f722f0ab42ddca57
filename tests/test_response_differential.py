"""Response-layer differential parity vs the reference's TFPredictor.

The reference's ``_generate_tf_response`` / ``_generate_tf_response_dummy``
/ ``_merge_tf_output`` are deterministic methods; with the ML stack
stubbed (tests/_reference_stubs.py) they run directly against the
engine's re-expressions on randomized inputs."""

import copy
import random

import pytest

from ds4sd_docling_tableformer_onnx_spark.config import canonical_json
from ds4sd_docling_tableformer_onnx_spark.core.response import (
    dummy_response,
    matched_response,
    merge_output,
)

from ._reference_stubs import load_tf_predictor

TFPredictor = load_tf_predictor()
needs_ref = pytest.mark.skipif(TFPredictor is None, reason="reference not importable")


def _random_case(seed):
    rng = random.Random(seed)
    cells = []
    for i in range(rng.randint(1, 16)):
        cell = {
            "cell_id": i,
            "row_id": rng.randrange(5),
            "column_id": rng.randrange(5),
            "bbox": [rng.uniform(0, 40) for _ in range(4)],
            "cell_class": rng.choice([1, 2, 3]),
            "label": rng.choice(["fcel", "ched", "rhed", "srow", "ecel", "body"]),
        }
        if rng.random() < 0.3:
            cell["colspan_val"] = rng.randint(2, 3)
        if rng.random() < 0.3:
            cell["rowspan_val"] = rng.randint(2, 3)
        cells.append(cell)
    matches = {
        str(i): [
            # include dangling table_cell_ids to exercise the missing-cell path
            {"table_cell_id": rng.randrange(len(cells) + 3), "iopdf": rng.random()}
            for _ in range(rng.randint(1, 3))
        ]
        for i in range(rng.randint(0, 10))
    }
    pdf_cells = [
        {"id": i, "text": f"t{i}", "bbox": [rng.uniform(0, 40) for _ in range(4)]}
        for i in range(rng.randint(0, 10))
    ]
    return cells, matches, pdf_cells


@needs_ref
def test_response_layer_differential():
    pred = object.__new__(TFPredictor)
    for seed in range(80):
        cells, matches, pdf_cells = _random_case(seed)

        ref = pred._generate_tf_response(copy.deepcopy(cells), copy.deepcopy(matches))
        mine = matched_response(copy.deepcopy(cells), copy.deepcopy(matches))
        assert canonical_json(ref) == canonical_json(mine), f"matched seed {seed}"

        ref.sort(key=lambda item: item["cell_id"])
        mine.sort(key=lambda item: item["cell_id"])
        ref_merged = pred._merge_tf_output(copy.deepcopy(ref), copy.deepcopy(pdf_cells))
        my_merged = merge_output(copy.deepcopy(mine), copy.deepcopy(pdf_cells))
        assert canonical_json(ref_merged) == canonical_json(my_merged), f"merge seed {seed}"

        ref_dummy = pred._generate_tf_response_dummy(copy.deepcopy(cells))
        my_dummy = dummy_response(copy.deepcopy(cells))
        assert canonical_json(ref_dummy) == canonical_json(my_dummy), f"dummy seed {seed}"


@needs_ref
def test_bbox_sync_differential():
    """D4 repair vs the reference's _check_bbox_sync on random streams."""
    from ds4sd_docling_tableformer_onnx_spark.core.cells import check_bbox_sync

    pred = object.__new__(TFPredictor)
    rng = random.Random(11)
    for _ in range(60):
        html = []
        for _ in range(rng.randint(1, 30)):
            html.append(rng.choice(["<td>", "</td>", "<tr>", "</tr>", "<td", ">",
                                    ' colspan="2"', "<thead>", "</thead>"]))
        n_boxes = rng.randint(0, 35)
        boxes = [[rng.random() for _ in range(4)] for _ in range(n_boxes)]
        prediction = {"html_seq": list(html), "bboxes": [list(b) for b in boxes]}
        ref_sync, ref_boxes = pred._check_bbox_sync(prediction)
        my_sync, my_boxes = check_bbox_sync(html, [list(b) for b in boxes])
        assert ref_sync == my_sync
        assert canonical_json(ref_boxes) == canonical_json(my_boxes)


@needs_ref
def test_iou_matcher_and_coord_utils_differential():
    """J2 IoU matcher, page->table transform and depadding vs the
    reference implementations."""
    import sys as _sys

    from ds4sd_docling_tableformer_onnx_spark.core.cells import (
        depad_bboxes,
        iou_match,
        page_to_table_coords,
    )

    from .conftest import REFERENCE_DIR

    _sys.path.insert(0, str(REFERENCE_DIR / "tableformer-docling"))
    from docling_ibm_models.tableformer.data_management.tf_cell_matcher import (
        CellMatcher,
    )

    matcher = CellMatcher({"predict": {"pdf_cell_iou_thres": 0.05}})
    pred = object.__new__(TFPredictor)
    rng = random.Random(3)
    for _ in range(40):
        cells = [
            {
                "cell_id": i,
                "bbox": sorted([rng.uniform(0, 30), rng.uniform(0, 30)])
                + sorted([rng.uniform(0, 30), rng.uniform(0, 30)]),
            }
            for i in range(rng.randint(1, 8))
        ]
        # bbox as [x1,y1,x2,y2] with x1<x2, y1<y2
        for c in cells:
            x1, x2, y1, y2 = c["bbox"]
            c["bbox"] = [x1, y1, x2, y2]
        pdf_cells = []
        for i in range(rng.randint(1, 8)):
            x1, x2 = sorted([rng.uniform(0, 30), rng.uniform(0, 30)])
            y1, y2 = sorted([rng.uniform(0, 30), rng.uniform(0, 30)])
            pdf_cells.append({"id": i, "text": f"t{i}", "bbox": [x1, y1, x2, y2]})

        ref_m, ref_n = matcher._iou_match(copy.deepcopy(cells), copy.deepcopy(pdf_cells))
        my_m, my_n = iou_match(copy.deepcopy(cells), copy.deepcopy(pdf_cells))
        assert my_n == ref_n
        assert canonical_json(my_m) == canonical_json(ref_m)

        bbox = [rng.uniform(0, 20) for _ in range(4)]
        table_bbox = [0.0, 0.0, 30.0 + rng.random(), 25.0 + rng.random()]
        ref_t = pred.page_coords_to_table_coords(list(bbox), list(table_bbox), 448, 448)
        my_t = page_to_table_coords(list(bbox), list(table_bbox), 448, 448)
        assert canonical_json(ref_t) == canonical_json(my_t)

        boxes = [[rng.random() for _ in range(4)] for _ in range(5)]
        ratio = rng.uniform(0.5, 1.5)
        ref_d = pred._depad_bboxes([list(b) for b in boxes], ratio)
        my_d = depad_bboxes([list(b) for b in boxes], ratio)
        assert canonical_json(ref_d) == canonical_json(my_d)


@needs_ref
def test_dense_reindex_differential():
    """W1: the reference's re-index block inside multi_table_predict,
    run with the neural stages monkeypatched out, vs dense_reindex."""
    from ds4sd_docling_tableformer_onnx_spark.core.response import dense_reindex

    rng = random.Random(17)
    for _ in range(40):
        cells = []
        for i in range(rng.randint(1, 15)):
            row = rng.randrange(0, 9)
            col = rng.randrange(0, 9)
            rowspan = rng.choice([1, 1, 1, 2, 3])
            colspan = rng.choice([1, 1, 1, 2])
            cells.append(
                {
                    "cell_id": i,
                    "start_row_offset_idx": row,
                    "end_row_offset_idx": row + rowspan,
                    "start_col_offset_idx": col,
                    "end_col_offset_idx": col + colspan,
                    "row_span": rowspan,
                    "col_span": colspan,
                }
            )

        pred = object.__new__(TFPredictor)
        pred.resize_img = lambda image, height=None: (image, 1.0)
        ref_cells = copy.deepcopy(cells)
        details = {"prediction": {"rs_seq": ["fcel", "nl"]}}
        pred.predict = lambda *args, **kwargs: (ref_cells, details)
        import numpy as np

        page = np.zeros((20, 20, 3), dtype=np.uint8)
        out = pred.multi_table_predict(
            {"image": page}, table_bboxes=[[0.0, 0.0, 10.0, 10.0]], do_matching=True
        )
        ref_out = out[0]["tf_responses"]
        ref_cols = out[0]["predict_details"]["num_cols"]
        ref_rows = out[0]["predict_details"]["num_rows"]

        my_cells = copy.deepcopy(cells)
        my_cols, my_rows = dense_reindex(my_cells)
        assert canonical_json(my_cells) == canonical_json(ref_out)
        assert (my_cols, my_rows) == (ref_cols, ref_rows)
