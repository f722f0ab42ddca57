"""Spark neural-input stage: P1-P3 inside mapInPandas, fixture-exact."""

import base64

import pytest

from ds4sd_docling_tableformer_onnx_spark.operators.neural import (
    prepare_tensors,
    read_image_directory,
)

from .conftest import RESULTS_DIR, load_json


@pytest.fixture(scope="module")
def fixture_rows():
    page_path = RESULTS_DIR / "tableformer_page_input_reference.json"
    if not page_path.exists():
        pytest.skip("reference checkout not available")
    pages = load_json(page_path)["samples"]
    crops = {
        s["image_name"]: s
        for s in load_json(RESULTS_DIR / "tableformer_table_crops_reference.json")["samples"]
    }
    tensors = {
        (s["image_name"], s["table_index"]): s
        for s in load_json(RESULTS_DIR / "tableformer_image_tensors_reference.json")["samples"]
    }
    rows, expected = [], {}
    for i, page in enumerate(pages):
        crop_entry = crops[page["image_name"]]["table_crops"][0]
        rows.append(
            (
                i,
                base64.b64decode(page["image_bytes_base64"]),
                page["shape"][0],
                page["shape"][1],
                [float(v) for v in crop_entry["original_bbox"]],
            )
        )
        expected[i] = {
            "crop_sha": crop_entry["crop_image_sha256"],
            "tensor_sha": tensors[(page["image_name"], 0)]["tensor_sha256"],
        }
    return rows, expected


def test_prepare_tensors_fixture_parity(spark, fixture_rows):
    rows, expected = fixture_rows
    df = spark.createDataFrame(
        rows,
        "item_id long, image binary, height int, width int, table_bbox array<double>",
    )
    out = {r["item_id"]: r for r in prepare_tensors(df).collect()}
    assert len(out) == len(rows)
    for item_id, exp in expected.items():
        row = out[item_id]
        assert row["ok"], row["err"]
        assert row["crop_sha256"] == exp["crop_sha"]
        assert row["tensor_sha256"] == exp["tensor_sha"]


def test_prepare_tensors_isolates_bad_rows(spark):
    rows = [(1, b"notanimage", 10, 10, [0.0, 0.0, 5.0, 5.0])]
    df = spark.createDataFrame(
        rows,
        "item_id long, image binary, height int, width int, table_bbox array<double>",
    )
    out = prepare_tensors(df).collect()
    assert out[0]["ok"] is False and "ValueError" in out[0]["err"]


def test_binary_file_source(spark, tmp_path):
    (tmp_path / "a.png").write_bytes(b"\x89PNG fake")
    (tmp_path / "b.txt").write_bytes(b"nope")
    df = read_image_directory(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["path"].endswith("a.png")
