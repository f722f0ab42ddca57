"""Spark-level extraction: end-to-end per-turn equality, stable
ordering, conversation rollups, checkpoint resume."""

import pytest
from pyspark.sql import functions as F

from ds4sd_docling_tableformer_onnx_spark.operators.extract import (
    conversation_summaries,
    extract_transcripts,
    ordered_conversation_view,
    verify_against_pool,
)
from ds4sd_docling_tableformer_onnx_spark.plans.checkpoint import (
    partition_metrics,
    run_with_checkpoint,
)
from ds4sd_docling_tableformer_onnx_spark.sources.transcripts import (
    generate_transcripts,
    payload_pool_df,
)

N_TURNS = 600


@pytest.fixture(scope="module")
def extracted(spark):
    df = generate_transcripts(spark, n_turns=N_TURNS, n_convs=20, seed=7)
    out = verify_against_pool(extract_transcripts(df), payload_pool_df(spark))
    out.cache().count()
    return out


def test_every_turn_extracts_and_matches_reference(extracted):
    agg = extracted.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("ok"),
        F.sum(F.when(F.col("html_match"), 1).otherwise(0)).alias("match"),
    ).first()
    assert agg["n"] == N_TURNS
    assert agg["ok"] == N_TURNS
    assert agg["match"] == N_TURNS  # per-turn text equality vs fixtures


def test_stable_turn_ordering(extracted):
    view = ordered_conversation_view(extracted)
    bad = view.where(F.col("turn_rank") != F.col("turn_idx") + 1).count()
    assert bad == 0  # rank under the window == generated turn order


def test_conversation_summaries_cover_all_turns(extracted, spark):
    summaries = conversation_summaries(extracted)
    total = summaries.agg(F.sum("turns")).first()[0]
    assert total == N_TURNS
    heavy = summaries.where(F.col("conv_id") == "conv-00000").first()
    assert heavy is not None  # skewed conversation exists


def test_partition_metrics(extracted):
    metrics = partition_metrics(extracted).collect()
    assert sum(m["turns"] for m in metrics) == N_TURNS
    assert all(m["errors"] == 0 for m in metrics)


def test_malformed_payload_is_isolated(spark):
    rows = [
        ("c1", 0, "user", '{"broken', "{}", None),
        ("c1", 1, "user", '{"otsl": ["fcel", "nl"], "bboxes": [[0.1,0.1,0.9,0.9]], "classes": [2]}',
         '{"table_bbox": [0,0,10,10], "page_width": 10, "page_height": 10, "pdf_cells": []}', None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    out = extract_transcripts(df).orderBy("turn_idx").collect()
    assert out[0]["ok"] is False and "JSONDecodeError" in out[0]["err"]
    assert out[1]["ok"] is True and out[1]["num_rows"] == 1


def test_checkpoint_resume_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "ckpt")
    df = generate_transcripts(spark, n_turns=100, n_convs=5, seed=3)

    first, skipped1 = run_with_checkpoint(spark, df, path, run_id="r1")
    assert skipped1 == 0
    assert first.count() == 100

    # resume over the same input: everything is checkpointed, nothing re-runs
    second, skipped2 = run_with_checkpoint(spark, df, path, run_id="r2")
    assert skipped2 == 100
    assert second.count() == 0

    # lineage columns present
    ckpt = spark.read.parquet(path)
    assert {"run_id", "stage", "partition_id"} <= set(ckpt.columns)
    assert ckpt.where("run_id = 'r1'").count() == 100


def test_extraction_plan_is_shuffle_free(spark):
    df = generate_transcripts(spark, n_turns=50, n_convs=5, seed=1, shuffle=False)
    plan = extract_transcripts(df)._jdf.queryExecution().executedPlan().toString()
    # the generator's own window needs one exchange; the extraction stage
    # itself must not add another on top of it
    assert plan.count("Exchange") <= 2


def test_partial_resume_extracts_only_missing_turns(spark, tmp_path):
    """Idempotent resume after a partial run: checkpoint half the corpus,
    resume over the full corpus -> only the missing half runs, the union
    is complete and duplicate-free, and a changed payload re-runs."""
    from pyspark.sql import functions as F

    from ds4sd_docling_tableformer_onnx_spark.plans.checkpoint import (
        run_with_checkpoint,
    )

    path = str(tmp_path / "ckpt")
    df = generate_transcripts(spark, n_turns=100, n_convs=5, seed=9)

    # simulated crash: only the first half was checkpointed
    first_half = df.where("turn_idx % 2 = 0")
    n_first = first_half.count()
    _, skipped0 = run_with_checkpoint(spark, first_half, path, run_id="r1")
    assert skipped0 == 0

    new_rows, skipped1 = run_with_checkpoint(spark, df, path, run_id="r2")
    assert skipped1 == n_first
    assert new_rows.count() == 100 - n_first
    assert new_rows.where("turn_idx % 2 = 0").count() == 0

    ckpt = spark.read.parquet(path)
    assert ckpt.count() == 100
    assert ckpt.select("conv_id", "turn_idx").distinct().count() == 100

    # a changed payload (different sha) is NOT considered done
    mutated = df.withColumn(
        "text", F.when(F.col("turn_idx") == 1, F.lit('{"broken": true}')).otherwise(F.col("text"))
    )
    _, skipped2 = run_with_checkpoint(spark, mutated, path, run_id="r3")
    n_mutated = df.where("turn_idx = 1").count()
    assert skipped2 == 100 - n_mutated


def test_null_payloads_are_isolated_error_rows(spark):
    """A NULL text/tool must become one error row (per-turn isolation),
    never a task crash — and its payload hash must still equal the
    JVM-side shared injective key the resume filter computes."""
    import datetime

    from ds4sd_docling_tableformer_onnx_spark.functions.keys import (
        payload_key_col,
        payload_key_py,
    )

    ts = datetime.datetime(2026, 1, 1)
    good = (
        '{"otsl": ["fcel","nl"], "bboxes": [], "classes": [], '
        '"table_bbox": [0,0,1,1]}'
    )
    df = spark.createDataFrame(
        [
            ("c1", 0, "x", None, None, ts),
            ("c1", 1, "x", good, "{}", ts),
            ("c1", 2, "x", None, "{}", ts),
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = {r["turn_idx"]: r for r in extract_transcripts(df).collect()}
    assert not rows[0]["ok"] and not rows[2]["ok"] and rows[1]["ok"]
    assert "TypeError" in rows[0]["err"]

    jvm = {
        r["turn_idx"]: r["sha"]
        for r in df.select(
            "turn_idx", payload_key_col("text", "tool").alias("sha")
        ).collect()
    }
    py = {
        r["turn_idx"]: payload_key_py(r["text"], r["tool"])
        for r in df.collect()
    }
    for i in (0, 1, 2):
        assert rows[i]["payload_sha256"] == jvm[i] == py[i]


def test_deduped_extraction_equals_direct(spark):
    """extract_transcripts_deduped: one extraction per distinct payload
    joined back must equal the direct per-turn form row-for-row (the
    transcript pool repeats 44 payloads, so the distinct pass is ~44
    extractions for 400 turns)."""
    from pyspark.sql import functions as F

    from ds4sd_docling_tableformer_onnx_spark.operators.extract import (
        extract_transcripts,
        extract_transcripts_deduped,
    )
    from ds4sd_docling_tableformer_onnx_spark.sources.transcripts import (
        generate_transcripts,
    )

    df = generate_transcripts(spark, n_turns=400, n_convs=8, seed=3)
    direct = {
        (r["conv_id"], r["turn_idx"]): (r["html_sha256"], r["n_cells"], r["ok"])
        for r in extract_transcripts(df).collect()
    }
    dedup_rows = extract_transcripts_deduped(df).collect()
    deduped = {
        (r["conv_id"], r["turn_idx"]): (r["html_sha256"], r["n_cells"], r["ok"])
        for r in dedup_rows
    }
    assert deduped == direct
    # the join really was broadcast for this tiny distinct side
    plan = extract_transcripts_deduped(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # and the shuffle-join fallback stays row-equal too
    fallback = {
        (r["conv_id"], r["turn_idx"]): (r["html_sha256"], r["n_cells"], r["ok"])
        for r in extract_transcripts_deduped(df, broadcast_threshold=None).collect()
    }
    assert fallback == direct


def test_resume_filter_distinguishes_concat_colliding_payloads(spark, tmp_path):
    """Adversarial resume: a checkpoint holding (text=T+'\\x00'+O,
    tool=NULL) must NOT cause (text=T, tool=O) on the same turn to be
    skipped — the old concat_ws key collided exactly here; the shared
    injective key keeps them apart, so the changed payload re-runs."""
    from ds4sd_docling_tableformer_onnx_spark.plans.checkpoint import (
        run_with_checkpoint,
    )
    from ds4sd_docling_tableformer_onnx_spark.sources.fixtures import payload_pool

    entry = next(e for e in payload_pool() if e["kind"] == "prediction")
    text, tool = entry["text"], entry["tool"]
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    path = str(tmp_path / "ckpt")

    first = spark.createDataFrame(
        [("c1", 0, "user", text + "\x00" + tool, None, None)], schema
    )
    _, skipped0 = run_with_checkpoint(spark, first, path, run_id="r1")
    assert skipped0 == 0

    # same (conv_id, turn_idx), colliding-under-concat_ws payload: must re-run
    changed = spark.createDataFrame([("c1", 0, "user", text, tool, None)], schema)
    new_rows, skipped1 = run_with_checkpoint(spark, changed, path, run_id="r2")
    assert skipped1 == 0
    assert new_rows.count() == 1
    assert new_rows.first()["ok"] is True  # the real payload extracted

    # and the true re-submission of the SAME payload is skipped
    _, skipped2 = run_with_checkpoint(spark, changed, path, run_id="r3")
    assert skipped2 == 1


def test_deduped_extraction_distinguishes_concat_colliding_payloads(spark):
    """(text=T+'\\x00'+O, tool=NULL) and (text=T, tool=O) collide under a
    naive concat_ws key (it skips NULLs); the dedup key must keep them
    apart — one extracts fine, the other is an error row, exactly as in
    the direct form."""
    from ds4sd_docling_tableformer_onnx_spark.operators.extract import (
        extract_transcripts,
        extract_transcripts_deduped,
    )
    from ds4sd_docling_tableformer_onnx_spark.sources.fixtures import payload_pool

    entry = next(e for e in payload_pool() if e["kind"] == "prediction")
    text, tool = entry["text"], entry["tool"]
    rows = [
        ("c1", 0, "user", text, tool, None),
        ("c1", 1, "user", text + "\x00" + tool, None, None),
        ("c1", 2, "user", None, text + "\x00" + tool, None),  # null text
        ("c1", 3, "user", text, tool, None),                  # true duplicate
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    direct = {r["turn_idx"]: (r["ok"], r["html_sha256"]) for r in extract_transcripts(df).collect()}
    dedup = {
        r["turn_idx"]: (r["ok"], r["html_sha256"])
        for r in extract_transcripts_deduped(df).collect()
    }
    assert len(dedup) == 4
    assert dedup == direct
    assert direct[0][0] is True and direct[1][0] is False  # genuinely different outcomes
    assert dedup[0] == dedup[3]  # the true duplicate deduped to one extraction
