"""Benchmark decontamination and duplicated-span statistics.

Corpus-hygiene operators a training-data pipeline runs before the
extraction/dedup output ships to a trainer:

- ``decontaminate``: flag training documents that share any word
  n-gram with an evaluation/benchmark set (the standard n-gram-overlap
  decontamination rule, n=8 by default).  Scale shape: the eval side is
  tiny by construction (benchmarks are thousands of rows, not
  billions), so its distinct gram set is **broadcast**; the training
  side explodes per-row deduplicated gram arrays (JVM-side
  ``transform``/``slice``, no Python) into a broadcast-hash semi-join
  that filters almost every row before the only shuffle — a per-doc
  count over the few surviving hits.

- ``duplicated_span_stats``: per-document fraction of word n-gram
  positions whose gram occurs in >= ``min_df`` distinct documents
  corpus-wide (the line-dedup / duplicated-text signal of
  RefinedWeb-style pipelines, re-expressed at word-gram granularity
  because transcript turns carry no line structure).  Two phases: a
  doc-frequency aggregation over per-doc distinct grams (map-side
  combine compresses the zipfy gram stream), then the position stream
  joins the ``df >= min_df`` hot-gram table.  The hot table shrinks
  with ``min_df``; it is left to AQE to broadcast when small.

Both operators hash every gram to int64 (``xxhash64``) *inside the
per-row array expression*, before any explode — the exploded streams,
the doc-frequency shuffle, and the join keys all carry 8-byte longs
instead of ~50-byte gram strings (measured 2.3x on the stats query).
At test scale (5k docs) this is wall-neutral — gram construction
dominates — the win is shuffle/broadcast *bytes* at corpus scale,
where the doc-frequency exchange is the operator's footprint.  A
64-bit collision would conflate two distinct grams; at 10^12 grams
the expected collision count is ~10^24/2^65 ≈ 0.03 — and the value
oracles (which recompute over exact gram strings in DuckDB) would
surface any collision as a hash mismatch at test scale.

Everything stays in whole-stage codegen (split / transform / slice /
array_join / xxhash64 / explode) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_gram_hashes(text_col, n: int):
    """Array of xxhash64'd word n-grams of ``text_col``; empty when the
    document has fewer than ``n`` words."""
    words = F.split(text_col, " ", -1)
    n_pos = F.size(words) - (n - 1)
    return F.when(
        n_pos >= 1,
        F.transform(
            F.sequence(F.lit(1), n_pos),
            lambda i: F.xxhash64(F.array_join(F.slice(words, i, n), " ")),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, n_overlap_grams) for every training doc sharing >= 1 word
    n-gram with ``eval_docs``; n_overlap_grams counts the doc's
    DISTINCT contaminated grams."""
    eval_grams = (
        eval_docs.select(
            F.explode(_word_gram_hashes(F.col(text_col), n)).alias("gram_h")
        )
        .distinct()
    )
    doc_grams = docs.select(
        id_col,
        F.explode(F.array_distinct(_word_gram_hashes(F.col(text_col), n))).alias(
            "gram_h"
        ),
    )
    return (
        doc_grams.join(F.broadcast(eval_grams), "gram_h")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_overlap_grams"))
    )


def duplicated_span_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_df: int = 4,
) -> DataFrame:
    """(id, n_positions, n_dup_positions, dup_frac) per document with
    >= 1 gram position; dup_frac rounded to 6 dp on both engine and
    oracle sides.

    The per-doc gram-hash ARRAY is constructed once and persisted (a
    narrow materialization — no shuffle); both phases explode the
    cached arrays.  The previous two-branch plan re-ran the gram
    construction (split + n-word joins + xxhash64 per position — the
    operator's dominant map cost) for each phase.  The persisted gram
    table is owned by the returned frame: release with
    ``plans.cache.release(result)`` after the terminal action."""
    from ..plans.cache import adopt

    grams = docs.select(
        id_col, _word_gram_hashes(F.col(text_col), n).alias("grams")
    ).persist()

    # phase 1: doc frequency over per-doc DISTINCT gram hashes -> hot set
    hot = (
        grams.select(id_col, F.explode(F.array_distinct("grams")).alias("gram_h"))
        .groupBy("gram_h")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .select("gram_h")
    )

    # phase 2: the position stream (non-distinct) joins the hot set;
    # left join keeps docs with zero duplicated positions
    positions = grams.where(F.size("grams") >= 1).select(
        id_col, F.explode("grams").alias("gram_h")
    )
    flagged = positions.join(hot.withColumn("is_dup", F.lit(1)), "gram_h", "left")
    result = flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_positions"),
        F.coalesce(F.sum("is_dup"), F.lit(0)).cast("long").alias("n_dup_positions"),
        F.round(
            F.coalesce(F.sum("is_dup"), F.lit(0)).cast("double") / F.count("*"), 6
        ).alias("dup_frac"),
    )
    return adopt(result, grams)


def strip_duplicated_substrings(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring dedup (Lee et al. 2021 shape): remove every token
    span covered by a word ``n``-gram occurring more than once in the
    corpus (self-repetition included); ``text_col`` is REPLACED by the
    re-joined remainder.  Adds ``n_tokens_pre`` / ``n_sub_removed``.

    Scale shape: gram (pos, xxhash64) structs are built pre-explode in
    one array expression, so the only wide stages are the gram-count
    aggregation and the dup-position semi-join — both shuffle 8-byte
    hashes with map-side combine.  Reconstruction is shuffle-free:
    per-doc duplicated starts collect into one bounded array, covered
    positions expand inside an array expression, and the kept text is
    a codegen filter over the token array.  The gram table is persisted
    (two consumers) and handed to the caller via plans/cache.adopt.
    """
    from ..plans.cache import adopt

    toks = docs.select(id_col, F.split(text_col, " ", -1).alias("_ws"))
    nw = F.size("_ws")
    gram_structs = F.when(
        nw >= n,
        F.transform(
            F.sequence(F.lit(1), nw - (n - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(F.array_join(F.slice("_ws", i, n), " ")).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,g:bigint>>"))
    grams = (
        toks.select(id_col, F.explode(gram_structs).alias("pg"))
        .select(id_col, F.col("pg.pos").alias("pos"), F.col("pg.g").alias("g"))
        .persist()
    )
    hot = grams.groupBy("g").agg(F.count("*").alias("cnt")).where("cnt >= 2")
    starts = (
        grams.join(hot.select("g"), "g")
        .groupBy(id_col)
        .agg(F.collect_set("pos").alias("_starts"))
    )
    joined = docs.withColumn("_ws", F.split(text_col, " ", -1)).join(
        starts, id_col, "left"
    )
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + (n - 1)),
            )
        )
    )
    kept = F.filter(
        "_ws", lambda w, i: ~F.array_contains(covered, (i + 1).cast("int"))
    )
    result = (
        joined.withColumn("n_tokens_pre", F.size("_ws").cast("long"))
        .withColumn("n_sub_removed", F.size(covered).cast("long"))
        .withColumn(text_col, F.array_join(kept, " "))
        .drop("_ws", "_starts")
    )
    return adopt(result, grams)
