"""Relational cell-table operators + staged DAG with resume."""

import pytest
from pyspark.sql import functions as F

from ds4sd_docling_tableformer_onnx_spark.operators.extract import extract_transcripts
from ds4sd_docling_tableformer_onnx_spark.operators.relational import (
    conversation_documents,
    dense_reindex_cells,
    explode_response_cells,
    grid_dimensions,
)
from ds4sd_docling_tableformer_onnx_spark.plans.staged import run_staged_extraction
from ds4sd_docling_tableformer_onnx_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def extracted(spark):
    df = generate_transcripts(spark, n_turns=120, n_convs=6, seed=11)
    out = extract_transcripts(df)
    out.cache().count()
    return out


def test_exploded_cells_match_counts(extracted):
    cells = explode_response_cells(extracted)
    per_turn = cells.groupBy("conv_id", "turn_idx").count()
    joined = extracted.join(per_turn, ["conv_id", "turn_idx"], "left")
    # every ok turn's response-cell count equals the exploded row count
    bad = joined.where(
        F.col("ok") & (F.coalesce(F.col("count"), F.lit(0)) != F.size(F.from_json(
            "tf_responses_json", "array<struct<cell_id:int>>")))
    ).count()
    assert bad == 0


def test_dense_reindex_matches_udf_counts(extracted):
    """The Spark-window dense re-index must agree with the per-turn
    in-UDF re-index (num_cols/num_rows already re-indexed upstream)."""
    cells = dense_reindex_cells(explode_response_cells(extracted))
    dims = cells.groupBy("conv_id", "turn_idx").agg(
        F.max("end_col_idx").alias("w_cols"),
        F.max("end_row_idx").alias("w_rows"),
    )
    joined = extracted.where("ok").join(dims, ["conv_id", "turn_idx"])
    bad = joined.where(
        (F.col("w_cols") != F.col("num_cols")) | (F.col("w_rows") != F.col("num_rows"))
    ).count()
    assert bad == 0


def test_grid_dimensions(extracted):
    dims = grid_dimensions(explode_response_cells(extracted))
    assert dims.where("num_cols <= 0").count() == 0


def test_conversation_documents_deterministic(extracted, spark):
    docs1 = {r["conv_id"]: r["doc_sha256"] for r in conversation_documents(extracted).collect()}
    docs2 = {r["conv_id"]: r["doc_sha256"] for r in conversation_documents(extracted).collect()}
    assert docs1 == docs2
    assert len(docs1) == 6


def test_staged_dag_resume(spark, tmp_path):
    base = str(tmp_path / "staged")
    df = generate_transcripts(spark, n_turns=60, n_convs=3, seed=13)
    first = run_staged_extraction(spark, df, base, run_id="r1")
    assert first["skipped"] == 0
    assert first["extract"].count() == 60
    assert {"run_id", "stage", "partition_id"} <= set(first["cells"].columns)
    # materialize before the second run overwrites the downstream stages
    d1 = {r["conv_id"]: r["doc_sha256"] for r in first["convdocs"].collect()}
    assert len(d1) == 3

    second = run_staged_extraction(spark, df, base, run_id="r2")
    assert second["skipped"] == 60  # nothing re-extracted
    assert second["extract"].count() == 60  # checkpoint unchanged
    # downstream rebuilt deterministically
    d2 = {r["conv_id"]: r["doc_sha256"] for r in second["convdocs"].collect()}
    assert d1 == d2
