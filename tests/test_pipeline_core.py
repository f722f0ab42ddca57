"""End-to-end per-turn pipeline parity.

Dummy (no-tokens) path: exact ``tf_responses`` equality against the
reference's committed end-to-end predictions
(``results/tableformer_docling_fintabnet.json``) — the same payloads are
embedded in the fixture pool so this runs standalone.

Matched path: regression goldens frozen after the matching +
post-processing stages were verified bit-exact against the reference
library (tests/test_postprocess.py)."""

from ds4sd_docling_tableformer_onnx_spark.core.pipeline import extract_turn


def test_dummy_path_exact_vs_reference_predictions(fixture_pool):
    for entry in fixture_pool["predictions"]:
        out = extract_turn(entry["payload"])
        exp = entry["expected"]
        assert out["tf_responses"] == exp["tf_responses"], entry["source"]
        assert out["num_cols"] == exp["num_cols"]
        assert out["num_rows"] == exp["num_rows"]
        assert out["rs_seq"] == exp["rs_seq"]
        assert out["html_seq"] == exp["html_seq"]


def test_matched_path_regression(fixture_pool):
    for entry in fixture_pool["matched"]:
        out = extract_turn(entry["payload"])
        exp = entry["expected"]
        assert out["tf_responses"] == exp["tf_responses"], entry["source"]
        assert out["num_cols"] == exp["num_cols"]
        assert out["num_rows"] == exp["num_rows"]
        assert out["n_matches"] == exp["n_matches"]


def test_matched_path_attaches_text_bboxes(fixture_pool):
    entry = fixture_pool["matched"][0]
    out = extract_turn(entry["payload"])
    toks = [
        b["token"]
        for cell in out["tf_responses"]
        for b in cell["text_cell_bboxes"]
    ]
    assert toks, "matched output must carry pdf-cell text"
    assert any(t.startswith("tok") for t in toks)


def test_otsl_payload_without_tag_ids(fixture_pool):
    entry = fixture_pool["predictions"][0]
    payload = dict(entry["payload"])
    rs_seq = entry["expected"]["rs_seq"]
    del payload["tag_seq"]
    payload["otsl"] = ["<start>"] + rs_seq + ["<end>"]
    out = extract_turn(payload)
    assert out["rs_seq"] == rs_seq
    assert out["tf_responses"] == entry["expected"]["tf_responses"]
