"""Per-page API: reference replay-mode parity without Spark."""

from ds4sd_docling_tableformer_onnx_spark.api import TableFormerSparkEngine


def test_predict_page_matches_reference_output(fixture_pool):
    engine = TableFormerSparkEngine()
    entries = fixture_pool["predictions"]
    predictions = [
        {
            "tag_seq": e["payload"]["tag_seq"],
            "bboxes": e["payload"]["bboxes"],
            "classes": e["payload"]["classes"],
        }
        for e in entries
    ]
    bboxes = [e["payload"]["table_bbox"] for e in entries]
    pages = engine.predict_page(
        predictions,
        bboxes,
        page_width=entries[0]["payload"]["page_width"],
        page_height=entries[0]["payload"]["page_height"],
    )
    for page, entry in zip(pages, entries):
        assert page["tf_responses"] == entry["expected"]["tf_responses"]
        assert page["predict_details"]["num_cols"] == entry["expected"]["num_cols"]
        assert page["predict_details"]["num_rows"] == entry["expected"]["num_rows"]


def test_predict_page_with_tokens_matches_pipeline(fixture_pool):
    engine = TableFormerSparkEngine()
    entry = fixture_pool["matched"][0]
    payload = entry["payload"]
    pages = engine.predict_page(
        [{"tag_seq": payload["tag_seq"], "bboxes": payload["bboxes"], "classes": payload["classes"]}],
        [payload["table_bbox"]],
        page_width=payload["page_width"],
        page_height=payload["page_height"],
        tokens=payload["pdf_cells"],
    )
    assert pages[0]["tf_responses"] == entry["expected"]["tf_responses"]
