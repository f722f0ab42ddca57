"""Cell-grid construction, coordinate transforms, intersection matching
and bbox-sync repair — SHA-256 parity vs the cell_matching /
sequence_decoding golden fixtures (canonical JSON, reference tolerances:
exact for structure, bit-exact for float arithmetic replayed from the
same inputs)."""

import base64
import zlib

import numpy as np
import pytest

from ds4sd_docling_tableformer_onnx_spark.config import sha256_canonical
from ds4sd_docling_tableformer_onnx_spark.core.cells import (
    build_table_cells,
    check_bbox_sync,
    intersection_over_pdf_match,
    normalize_pdf_cells,
    translate_bboxes,
)

from .conftest import RESULTS_DIR, load_json


def _decode(encoded, shape):
    raw = zlib.decompress(base64.b64decode(encoded))
    return np.frombuffer(raw, dtype=np.float32).reshape(shape)


@pytest.fixture(scope="module")
def fixtures():
    cm_path = RESULTS_DIR / "tableformer_cell_matching_reference.json"
    sd_path = RESULTS_DIR / "tableformer_sequence_decoding_reference.json"
    nn_path = RESULTS_DIR / "tableformer_neural_outputs_reference.json"
    if not cm_path.exists():
        pytest.skip("reference checkout not available")
    sd = {(s["image_name"], s["table_index"]): s for s in load_json(sd_path)["samples"]}
    nn = {(s["image_name"], s["table_index"]): s for s in load_json(nn_path)["samples"]}
    return load_json(cm_path)["samples"], sd, nn


def test_cell_matching_fixture_parity(fixtures):
    samples, sd, nn = fixtures
    for sample in samples:
        key = (sample["image_name"], sample["table_index"])
        seq, neural = sd[key], nn[key]
        bboxes = _decode(seq["final_bbox_zlib_base64"], seq["final_bbox_shape"]).tolist()
        classes = (
            _decode(neural["class_zlib_base64"], neural["class_shape"])
            .argmax(axis=1)
            .astype(np.int32)
            .tolist()
        )

        page_boxes = translate_bboxes(sample["table_bbox"], bboxes)
        got = np.asarray(page_boxes, dtype=np.float32)
        import hashlib

        assert hashlib.sha256(got.tobytes()).hexdigest() == sample["prediction_bbox_sha256"]

        cells = build_table_cells(
            seq["html_sequence"], seq["rs_sequence"], page_boxes, classes
        )
        assert sha256_canonical(cells) == sample["table_cells_sha256"]
        assert cells == sample["table_cells"]

        matches, _ = intersection_over_pdf_match(cells, sample["pdf_cells"])
        assert sha256_canonical(matches) == sample["matches_sha256"]


def test_bbox_sync_repair_vs_fixture(fixtures):
    _, sd, _ = fixtures
    for key, seq in sd.items():
        raw = _decode(seq["raw_bbox_zlib_base64"], seq["raw_bbox_shape"]).tolist()
        final = _decode(seq["final_bbox_zlib_base64"], seq["final_bbox_shape"])
        sync, fixed = check_bbox_sync(seq["html_sequence"], raw)
        assert sync == seq["bbox_sync"], key
        assert len(fixed) == len(final)
        assert np.allclose(np.asarray(fixed, dtype=np.float32), final, atol=1.5e-7)


def test_bbox_dict_coercion():
    cells = normalize_pdf_cells(
        [{"id": 1, "text": "x", "bbox": {"l": 1, "t": 2, "r": 3, "b": 4}}]
    )
    assert cells[0]["bbox"] == [1, 2, 3, 4]


def test_intersection_match_dedupes_and_filters():
    table_cells = [
        {"cell_id": 0, "bbox": [0.0, 0.0, 10.0, 10.0]},
        {"cell_id": 1, "bbox": [20.0, 0.0, 30.0, 10.0]},
    ]
    pdf_cells = [
        {"id": 7, "text": "a", "bbox": [2.0, 2.0, 4.0, 4.0]},   # inside cell 0
        {"id": 8, "text": "b", "bbox": [50.0, 50.0, 60.0, 60.0]},  # no overlap
    ]
    matches, counter = intersection_over_pdf_match(table_cells, pdf_cells)
    assert counter == 1
    assert list(matches) == [7]
    assert matches[7][0]["table_cell_id"] == 0
    assert matches[7][0]["iopdf"] == pytest.approx(1.0)


class _QuietLog:
    def debug(self, *args, **kwargs):
        pass


def _reference_html_mode_builder():
    """The reference's _build_table_cells with its hardcoded mode switch
    flipped to HTML, so the dormant branch (tf_cell_matcher.py:285-366)
    can be executed for differential comparison."""
    import inspect
    import sys
    import textwrap

    from .conftest import REFERENCE_DIR

    sys.path.insert(0, str(REFERENCE_DIR / "tableformer-docling"))
    try:
        from docling_ibm_models.tableformer.data_management import (
            tf_cell_matcher as ref_mod,
        )
    except Exception:
        pytest.skip("reference library not importable")
    src = textwrap.dedent(
        inspect.getsource(ref_mod.CellMatcher._build_table_cells)
    )
    assert 'mode = "OTSL"' in src
    namespace = dict(ref_mod.__dict__)
    exec(src.replace('mode = "OTSL"', 'mode = "HTML"'), namespace)
    fn = namespace["_build_table_cells"]

    class _Self:
        def _log(self):
            return _QuietLog()

    return lambda html_seq, bboxes, classes: fn(
        _Self(), html_seq, [], bboxes, classes
    )


def test_html_mode_cell_builder_differential():
    """D10: HTML-mode builder matches the reference's dormant branch on
    every FinTabNet html / html_restored sequence plus handcrafted
    thead/rowspan cases."""
    import json
    from pathlib import Path

    from ds4sd_docling_tableformer_onnx_spark.config import canonical_json
    from ds4sd_docling_tableformer_onnx_spark.core.cells import (
        build_table_cells_html,
    )

    ref_build = _reference_html_mode_builder()

    pool = json.loads(
        (
            Path(__file__).resolve().parents[1]
            / "ds4sd_docling_tableformer_onnx_spark"
            / "data"
            / "fixture_pool.json"
        ).read_text()
    )
    sequences = []
    for table in pool["tables"]:
        sequences.append(table["html"])
        sequences.append(table["html_restored"])
    sequences.append(
        ["<thead>", "<tr>", "<td", ' colspan="2"', ">", "</td>", "<td>",
         "</td>", "</tr>", "</thead>", "<tbody>", "<tr>", "<td",
         ' rowspan="3"', ">", "</td>", "<td>", "</td>", "<td>", "</td>",
         "</tr>", "<tr>", "<td", ' colspan="2"', ' rowspan="2"', ">",
         "</td>", "</tr>", "</tbody>"]
    )
    sequences.append(["<tr>", "<td>", "</td>", "</tr>"])  # no thead/tbody

    checked = 0
    for html_seq in sequences:
        n = sum(1 for t in html_seq if t == "</td>")
        bboxes = [[float(i), float(i + 1), float(i + 2), float(i + 3)] for i in range(n)]
        classes = [2] * n
        expected = ref_build(list(html_seq), [list(b) for b in bboxes], list(classes))
        got = build_table_cells_html(html_seq, bboxes, classes)
        assert canonical_json(got) == canonical_json(expected)
        checked += 1
    assert checked >= 42
