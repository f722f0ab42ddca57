"""Stateful streaming rollup: state persists across micro-batches."""

from pyspark.sql import functions as F

from ds4sd_docling_tableformer_onnx_spark.sources.transcripts import generate_transcripts
from ds4sd_docling_tableformer_onnx_spark.streaming.stateful import (
    stateful_conversation_rollup,
)
from ds4sd_docling_tableformer_onnx_spark.streaming.stream import stream_extract


def _drain(stream_df, out_dir, ckpt):
    # update-mode stateful output: land each micro-batch via foreachBatch
    # (the parquet file sink is append-only)
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    query = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def test_state_accumulates_across_batches(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    df = generate_transcripts(spark, n_turns=90, n_convs=3, seed=21)
    df.cache()
    first = df.where("turn_idx % 2 = 0")
    second = df.where("turn_idx % 2 = 1")
    first.write.parquet(str(in_dir / "batch1"))

    rollup = stateful_conversation_rollup(
        stream_extract(spark, str(in_dir) + "/*", schema=(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp, payload_id int"))
    )
    _drain(rollup, out_dir, ckpt)
    second.write.parquet(str(in_dir / "batch2"))
    _drain(rollup, out_dir, ckpt)

    # the latest update row per conversation carries the full count
    latest = (
        spark.read.parquet(out_dir)
        .groupBy("conv_id")
        .agg(F.max("turns").alias("turns"))
        .collect()
    )
    per_conv = {r["conv_id"]: r["turns"] for r in latest}
    expected = {
        r["conv_id"]: r["n"]
        for r in df.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_conv == expected
    df.unpersist()
