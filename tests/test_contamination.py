"""Unit tests for operators/contamination.py on crafted corpora.

The DuckDB oracles pin these operators against an independent engine at
corpus scale; these tests pin them against *hand-computed* expectations
on inputs where the right answer is obvious — overlap placement, the
min_df boundary, sub-n-word documents, and the n_positions arithmetic.
"""

import pytest
from pyspark.sql import functions as F

from ds4sd_docling_tableformer_onnx_spark.operators.contamination import (
    decontaminate,
    duplicated_span_stats,
)

SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_decontaminate_counts_distinct_shared_grams(spark):
    eval_docs = _docs(spark, [(100, "a b c d e f g h i")])  # grams: a..h, b..i
    train = _docs(
        spark,
        [
            (1, "a b c d e f g h"),          # shares exactly gram a..h
            (2, "x a b c d e f g h i y"),    # shares both eval grams
            (3, "z z z z z z z z z"),        # shares none
            (4, "a b c d e f g"),            # 7 words -> no grams at all
        ],
    )
    out = {
        r["doc_id"]: r["n_overlap_grams"]
        for r in decontaminate(train, eval_docs, n=8).collect()
    }
    assert out == {1: 1, 2: 2}


def test_decontaminate_dedups_repeated_grams_within_doc(spark):
    eval_docs = _docs(spark, [(100, "a b c d e f g h")])
    # the shared gram occurs at two positions in the train doc — the
    # count is over DISTINCT grams, so it still counts once
    train = _docs(spark, [(1, "a b c d e f g h a b c d e f g h")])
    [row] = decontaminate(train, eval_docs, n=8).collect()
    assert (row["doc_id"], row["n_overlap_grams"]) == (1, 1)


def test_dup_span_stats_min_df_boundary(spark):
    shared = "a b c d e f g h"  # one gram, shared verbatim by k docs
    rows = [(i, shared) for i in range(4)]  # df = 4 == min_df -> hot
    rows += [(10, "p q r s t u v w"), (11, "p q r s t u v w")]  # df = 2 < min_df
    rows += [(20, "only seven words here so no grams")]  # 7 words -> excluded
    out = {
        r["doc_id"]: (r["n_positions"], r["n_dup_positions"], r["dup_frac"])
        for r in duplicated_span_stats(_docs(spark, rows), n=8, min_df=4).collect()
    }
    for i in range(4):
        assert out[i] == (1, 1, 1.0)
    assert out[10] == (1, 0, 0.0)
    assert out[11] == (1, 0, 0.0)
    assert 20 not in out  # no gram positions -> no row


def test_dup_span_stats_position_arithmetic(spark):
    # 12 words -> 5 positions; positions 1 and 5 (grams w1..w8, w5..w12)
    # duplicated via three other docs carrying those grams verbatim
    target = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    head, tail = " ".join(f"w{i}" for i in range(1, 9)), " ".join(
        f"w{i}" for i in range(5, 13)
    )
    rows = [(0, target)] + [(i, head) for i in (1, 2, 3)] + [
        (i, tail) for i in (4, 5, 6)
    ]
    out = {
        r["doc_id"]: (r["n_positions"], r["n_dup_positions"], r["dup_frac"])
        for r in duplicated_span_stats(_docs(spark, rows), n=8, min_df=4).collect()
    }
    assert out[0] == (5, 2, 0.4)


def test_unigram_logprob_hand_computed(spark, tmp_path):
    import math

    # corpus: "a a a b" + "a b" -> counts a=4, b=2, total=6
    docs = spark.createDataFrame(
        [(1, "a a a b", "s", "en", 7), (2, "a b", "s", "en", 3)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))

    from ds4sd_docling_tableformer_onnx_spark.queries import QUERIES

    out = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in QUERIES["unigram_logprob"](spark, str(sf)).collect()
    }
    lpa, lpb = math.log10(4 / 6), math.log10(2 / 6)
    assert out[1] == (4, round((3 * lpa + lpb) / 4, 4))
    assert out[2] == (2, round((lpa + lpb) / 2, 4))
