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


def test_predict_page_from_image_with_injected_model(fixture_pool):
    """The full image->grids signature: real P1-P3 preprocessing feeds
    an injected neural stage (here a fixture replayer that also checks
    the tensor it receives), and the output equals the replay path."""
    import numpy as np

    engine = TableFormerSparkEngine()
    entry = fixture_pool["predictions"][0]
    payload = entry["payload"]
    rng = np.random.default_rng(5)
    page = rng.integers(0, 255, size=(640, 480, 3), dtype=np.uint8)

    seen_tensors = []

    def fake_predictor(tensor):
        seen_tensors.append(tensor)
        return {
            "tag_seq": payload["tag_seq"],
            "bboxes": payload["bboxes"],
            "classes": payload["classes"],
        }

    pages = engine.predict_page_from_image(
        page, [payload["table_bbox"]], predictor=fake_predictor
    )
    assert len(seen_tensors) == 1
    assert seen_tensors[0].shape[-2:] == (448, 448)  # P3 tensorize ran
    replay = engine.predict_page(
        [fake_predictor(None)],
        [payload["table_bbox"]],
        page_width=480,
        page_height=640,
    )
    assert pages[0]["tf_responses"] == replay[0]["tf_responses"]
    assert (
        pages[0]["predict_details"]["prediction"]["html_seq"]
        == replay[0]["predict_details"]["prediction"]["html_seq"]
    )

    # whole-page default bbox (reference predictor.py:85-123): the grid
    # STRUCTURE is bbox-independent (coordinates translate differently)
    whole = engine.predict_page_from_image(page, predictor=fake_predictor)
    assert (
        whole[0]["predict_details"]["prediction"]["html_seq"]
        == replay[0]["predict_details"]["prediction"]["html_seq"]
    )
    assert whole[0]["predict_details"]["num_cols"] == replay[0]["predict_details"]["num_cols"]
    assert len(whole[0]["tf_responses"]) == len(replay[0]["tf_responses"])


def test_predict_page_from_image_gate(monkeypatch):
    import numpy as np
    import pytest

    monkeypatch.delenv("SPARK_GRAFT_ONNX_DIR", raising=False)
    engine = TableFormerSparkEngine()
    page = np.zeros((64, 64, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError, match="SPARK_GRAFT_ONNX_DIR"):
        engine.predict_page_from_image(page)
