"""Driver contract for the spark-graft builder (PySpark target).

``entry``      flagship: the per-turn extraction pipeline over synthetic
               transcripts (payloads anchored in the reference repo's
               golden fixtures) + per-turn text-equality verification.
``queries``    one entry per implemented operator family from SURVEY §2
               and the training-data pipeline operators; oracle-checked
               against DuckDB where SQL-expressible.
``oracle_sql`` the DuckDB-equivalent SQL for every oracle-checked query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ds4sd_docling_tableformer_onnx_spark.queries import ORACLES, QUERIES

_SF_TURNS = {  # deterministic transcript sizes per scale factor
    "sf0.001": 500,
    "sf0.01": 5_000,
    "sf0.1": 50_000,
}


def _turns_for(sf_dir: str) -> int:
    for key, n in _SF_TURNS.items():
        if key in sf_dir:
            return n
    return 2_000


def _extraction_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: generate transcripts, extract every turn, verify each
    turn's HTML structure tokens against the reference fixtures."""
    from pyspark.sql import functions as F

    from ds4sd_docling_tableformer_onnx_spark.operators.extract import (
        extract_transcripts,
        verify_against_pool,
    )
    from ds4sd_docling_tableformer_onnx_spark.sources.transcripts import (
        generate_transcripts,
        payload_pool_df,
    )

    transcripts = generate_transcripts(spark, n_turns=_turns_for(sf_dir), seed=42)
    verified = verify_against_pool(
        extract_transcripts(transcripts), payload_pool_df(spark)
    )
    return verified.select(
        "conv_id",
        "turn_idx",
        "payload_id",
        "ok",
        "num_rows",
        "num_cols",
        "n_cells",
        "n_matches",
        "html_sha256",
        "html_match",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query at sf0.001 (driver smoke check: rows > 0)."""
    return _extraction_pipeline(spark, "/root/testdata/sf0.001")


def _simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds4sd_docling_tableformer_onnx_spark.operators.dedup import (
        simhash_candidates,
        simhash_column,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return simhash_candidates(simhash_column(docs)).orderBy("id_a", "id_b")


def _lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds4sd_docling_tableformer_onnx_spark.operators.similarity import (
        lsh_bucketed_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.where("vec_id = 0").first()["embedding"]
    return lsh_bucketed_topk(emb.where("vec_id <> 0"), list(query), k=10)


def _ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ds4sd_docling_tableformer_onnx_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.where("vec_id = 0").first()["embedding"]
    return ivf_topk(emb.where("vec_id <> 0"), list(query), k=10, n_lists=8, nprobe=4, seed=7)


def _media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ds4sd_docling_tableformer_onnx_spark.operators.multimodal import (
        extract_media_features,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
    )
    return extract_media_features(docs, "doc_id", "blob", kind="image")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(QUERIES)
    # Non-SQL-expressible operators (driver records rows-only checks):
    out["extraction_pipeline"] = _extraction_pipeline
    out["simhash_candidates"] = _simhash_pairs
    out["lsh_ann_topk"] = _lsh_ann
    out["ivf_ann_topk"] = _ivf_ann
    out["media_feature_stub"] = _media_features
    return out


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
