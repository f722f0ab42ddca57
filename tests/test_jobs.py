"""jobs/curate_job.py: end-to-end curation pipeline invariants.

The job composes oracle-checked operators (simhash near-dup groups,
deterministic mixture sampling, two-phase sequence packing), so this
test guards the *composition*: survivor canonicality, RNG-free sampling
determinism, and the packing contiguity invariant — with zero global
(un-partitioned) windows in the plan.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "jobs"))


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(240):
        # clusters of 3 near-identical docs every 12th id
        base = f"alpha beta gamma delta epsilon zeta {i // 12}"
        text = base if i % 12 < 3 else f"doc {i} " + " ".join(
            f"tok{(i * 7 + j) % 97}" for j in range(5 + i % 23)
        )
        rows.append((str(i), text, f"src{i % 6}", "en"))
    return spark.createDataFrame(rows, "doc_id string, text string, source string, lang string")


def test_curate_packing_invariants(spark, docs):
    from curate_job import curate

    packed, stats = curate(spark, docs, max_seq_len=64, hamming=3, pack_ranges=4)
    pdf = packed.toPandas().sort_values(["start_seq", "offset_in_seq"]).reset_index(drop=True)

    assert stats["input_docs"] == 240
    assert 0 < stats["survivors_sampled"] < 240
    assert len(pdf) == stats["survivors_sampled"]

    # survivors are canonical (doc_id == group_id) and unique per group
    assert (pdf.doc_id == pdf.group_id).all()
    assert pdf.group_id.is_unique

    # packing contiguity: global token positions are an exact prefix sum
    before = pdf.start_seq * 64 + pdf.offset_in_seq
    prefix = pdf.n_tokens.cumsum().shift(1).fillna(0).astype("int64")
    assert (before.values == prefix.values).all()
    # span count consistent with the slot arithmetic
    end = before + pdf.n_tokens - 1
    assert ((end // 64 - before // 64 + 1) == pdf.spans).all()
    assert stats["sequences"] == -(-int(pdf.n_tokens.sum()) // 64)


def test_curate_deterministic(spark, docs):
    from curate_job import curate

    a, sa = curate(spark, docs, max_seq_len=128, hamming=3, pack_ranges=3)
    b, sb = curate(spark, docs, max_seq_len=128, hamming=3, pack_ranges=3)
    assert sa == sb
    pa = a.toPandas().sort_values("doc_id").reset_index(drop=True)
    pb = b.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert pa.equals(pb)


def test_curate_semantic_dedup_stage(spark, docs):
    """--emb-input: survivors whose embedding is a within-cluster
    near-parallel of a smaller-id row are dropped (SemDeDup stage);
    survivors without embeddings are untouched."""
    from curate_job import curate

    base, _ = curate(spark, docs, max_seq_len=64, hamming=3, pack_ranges=4)
    # doc_id is a STRING here: sort lexicographically, matching the
    # operator's a.id < b.id ordering, so keep_a really is the
    # canonical min of the planted near-dup pair
    base_ids = sorted({r["doc_id"] for r in base.select("doc_id").collect()})
    assert len(base_ids) >= 3
    keep_a, keep_b = base_ids[0], base_ids[1]
    victim = base_ids[2]
    # victim's vector is near-parallel to keep_a's; keep_b orthogonal
    emb = spark.createDataFrame(
        [
            (keep_a, [1.0, 0.0]),
            (victim, [0.999, 0.045]),
            (keep_b, [0.0, 1.0]),
        ],
        "vec_id string, embedding array<float>",
    )
    cleaned, stats = curate(
        spark, docs, max_seq_len=64, hamming=3, pack_ranges=4,
        emb_docs=emb, sem_threshold=0.9, sem_lists=1,
    )
    cleaned_ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert stats["semantic_dropped"] == 1
    assert victim not in cleaned_ids
    assert keep_a in cleaned_ids and keep_b in cleaned_ids
    assert set(base_ids) - cleaned_ids == {victim}


def test_curate_quality_filter_stage(spark, docs):
    """--quality-filter: a doc written in spam-shard vocabulary drops
    even though the classifier never saw it labeled (weights are
    trained on the raw corpus with rule-battery weak labels — the long
    rule-passing docs supply the good vocabulary, the short tokNN docs
    fail r_min_words and supply the bad)."""
    from pyspark.sql import functions as F

    from curate_job import curate

    _, base_stats = curate(spark, docs, max_seq_len=64, hamming=3, pack_ranges=4)
    cleaned, stats = curate(
        spark, docs, max_seq_len=64, hamming=3, pack_ranges=4,
        quality_filter=True,
    )
    # the tokNN docs (every non-cluster doc) fail r_min_words, so the
    # trained model scores their vocabulary negative and they drop
    assert stats["quality_dropped"] > 0
    assert stats["survivors_sampled"] <= base_stats["survivors_sampled"]
    assert base_stats["quality_dropped"] == 0
    # deterministic: same corpus, same weights, same drops
    _, stats2 = curate(
        spark, docs, max_seq_len=64, hamming=3, pack_ranges=4,
        quality_filter=True,
    )
    assert stats2 == stats


def test_mixture_keep_non_numeric_source(spark):
    """Sources that don't match 'src([0-9]+)' (e.g. 'wiki') must not
    crash under ANSI mode (CAST('' AS INT) threw pre-r4) and fall back
    to keep rate 1 — ADVICE r3 medium."""
    from ds4sd_docling_tableformer_onnx_spark.functions.sampling import (
        mixture_keep,
    )

    rows = [(str(i), src) for i in range(64) for src in ("wiki", "src0", "src3")]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    kept = df.where(mixture_keep("doc_id", "source")).groupBy("source").count()
    by_src = {r["source"]: r["count"] for r in kept.collect()}
    # unmatched source == K=0 == keep everything, identical to src0
    assert by_src["wiki"] == 64
    assert by_src["src0"] == 64
    # src3 keeps at rate 1/8 — strictly fewer
    assert 0 < by_src.get("src3", 0) < 64


def test_curate_hygiene_stages(spark, docs):
    """--eval-input and --max-dup-frac drop the right survivors: a
    benchmark doc sharing a near-dup cluster's text knocks that
    cluster's canonical survivor out; the dup-span filter removes
    cluster survivors whose text is corpus-duplicated."""
    from curate_job import curate

    base, _ = curate(spark, docs, max_seq_len=64, hamming=3, pack_ranges=4)
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}

    # benchmark table = the verbatim text of doc 13 (a unique,
    # >= 8-word doc, so it is its own canonical survivor and its grams
    # exist; the 7-word cluster texts are below the 8-gram threshold)
    doc13_text = "doc 13 " + " ".join(
        f"tok{(13 * 7 + j) % 97}" for j in range(5 + 13 % 23)
    )
    eval_docs = spark.createDataFrame(
        [("e0", doc13_text)], "doc_id string, text string"
    )
    cleaned, stats = curate(
        spark, docs, max_seq_len=64, hamming=3, pack_ranges=4,
        eval_docs=eval_docs,
    )
    cleaned_ids = {r["doc_id"] for r in cleaned.select("doc_id").collect()}
    assert stats["contaminated_dropped"] >= 1
    if "13" in base_ids:  # contamination drop precedes mixture sampling
        assert "13" not in cleaned_ids
    assert cleaned_ids <= base_ids

    # dup-span filter: every doc's tok stream is a window of the SAME
    # cyclic sequence tok((7i+j) % 97), so many 8-gram windows recur in
    # >= 4 docs — a strict threshold must drop some survivors
    filtered, fstats = curate(
        spark, docs, max_seq_len=64, hamming=3, pack_ranges=4,
        max_dup_frac=0.9,
    )
    filtered_ids = {r["doc_id"] for r in filtered.select("doc_id").collect()}
    assert fstats["repetitive_dropped"] >= 1
    assert filtered_ids < base_ids


def test_curate_rule_and_substring_stages(spark):
    """--rule-filter drops battery failures up front; --strip-dup-
    substrings removes corpus-duplicated spans BEFORE signals (token
    counts must see the stripped corpus); every output row carries a
    group-hashed split that never straddles a near-dup component."""
    from curate_job import curate

    common = " ".join(f"shared{j}" for j in range(10))
    rows = []
    for i in range(40):
        filler = " ".join(f"u{i}x{j}" for j in range(25))
        text = (common + " " + filler) if i % 2 == 0 else filler
        rows.append((str(i), text, f"src{i % 3}", "en"))
    for i in range(40, 50):  # rule-battery failures (too short)
        rows.append((str(i), "tiny doc", f"src{i % 3}", "en"))
    docs = spark.createDataFrame(
        rows, "doc_id string, text string, source string, lang string"
    )

    packed, stats = curate(
        spark, docs, max_seq_len=64, rule_filter=True, strip_substrings=True
    )
    pdf = packed.toPandas()
    assert stats["rule_dropped"] == 10
    # every even doc loses exactly the 10-token shared span (its three
    # interior 8-grams repeat across 20 docs; filler grams are unique)
    assert stats["substring_tokens_removed"] == 20 * 10
    # token counts reflect the STRIPPED text: all survivors are now the
    # 25-token filler
    assert (pdf["n_tokens"] == 25).all()
    assert set(pdf["split"]) <= {"train", "holdout"}
    assert (pdf.groupby("group_id")["split"].nunique() == 1).all()


def test_curate_source_quota_stage(spark, docs):
    """--source-quota N: every source capped at N BEFORE dedup, the
    kept set is exactly the N smallest md5-u32 ranks per source, and
    the stage is deterministic."""
    from pyspark.sql import functions as F

    from curate_job import curate
    from ds4sd_docling_tableformer_onnx_spark.functions.sampling import u32_md5

    quota = 12
    packed, stats = curate(
        spark, docs, max_seq_len=64, hamming=3, pack_ranges=4,
        source_quota=quota,
    )
    # 240 docs over 6 sources (40 each) -> exactly 6*quota survive 0d
    assert stats["quota_dropped"] == 240 - 6 * quota
    # downstream stages only see capped sources: every packed doc is in
    # the per-source md5-u32 top-`quota` of the raw corpus
    kept = {
        r["doc_id"]
        for r in docs.select(
            "doc_id",
            F.row_number()
            .over(
                __import__("pyspark").sql.Window.partitionBy("source").orderBy(
                    u32_md5("doc_id"), "doc_id"
                )
            )
            .alias("rk"),
        )
        .where(F.col("rk") <= quota)
        .collect()
    }
    packed_ids = {r["doc_id"] for r in packed.select("doc_id").collect()}
    assert packed_ids <= kept
    _, stats2 = curate(
        spark, docs, max_seq_len=64, hamming=3, pack_ranges=4,
        source_quota=quota,
    )
    assert stats2 == stats


def test_curate_keep_best_retention_policy(spark, docs):
    """--keep-best switches the survivor from the smallest id to the
    LONGEST text per near-dup group (canonical_docs semantics).  The
    planted cluster's common word mass dominates every simhash bit
    margin, so all three variants land in one group; the longest
    variant has the LARGEST id — the two policies provably differ."""
    from curate_job import curate

    # simhash signs over DISTINCT words: the three variants share one
    # word SET (length differs only by repetition) -> hamming 0 ->
    # guaranteed one group
    common = "planted0 planted1 planted2 planted3 planted4"
    planted = [
        ("900", common, "srcp", "en"),
        ("901", common, "srcp", "en"),
        ("902", common + " planted0" * 20, "srcp", "en"),
    ]
    docs_p = docs.unionByName(
        spark.createDataFrame(
            planted, "doc_id string, text string, source string, lang string"
        )
    )
    best, _ = curate(spark, docs_p, max_seq_len=128, keep_best=True)
    best_ids = set(best.toPandas()["doc_id"])
    first, _ = curate(spark, docs_p, max_seq_len=128)
    first_ids = set(first.toPandas()["doc_id"])
    # mixture sampling happens after retention; the planted group is
    # 'srcp' (unknown source -> kept by default mixture rule) so its
    # survivor is visible in the output either way
    assert "902" in best_ids and {"900", "901"}.isdisjoint(best_ids)
    assert "900" in first_ids and {"901", "902"}.isdisjoint(first_ids)
