#!/usr/bin/env python3
"""Cluster entrypoint: end-to-end training-data curation over a
documents table.

    spark-submit \
      --py-files dist/ds4sd_docling_tableformer_onnx_spark.zip \
      jobs/curate_job.py \
      --input  /path/or/table/of/documents \
      --output /path/for/curated/output \
      [--max-seq-len 2048] [--hamming 3] [--cores N]

Pipeline (each stage a documented scale shape, all oracle-checked in
queries.py at small scale):

0. optional pre-stages: --rule-filter (C4/Gopher heuristic battery,
   pure codegen — the c4_filters oracle semantics),
   --strip-dup-substrings (exact substring dedup, Lee et al. 2021 —
   the dedup_substrings oracle semantics, text replaced in place) and
   --quality-filter (hashed linear quality scorer trained on the raw
   corpus with rule-battery weak labels — the quality_classifier
   oracle semantics, docs scoring <= 0 drop);
1. near-dup GROUPS: simhash signatures -> banded candidate pairs
   (hamming <= --hamming) -> connected components (hash-min label
   propagation) -> one canonical survivor per group (smallest doc_id);
2. hygiene (optional): --eval-input drops survivors sharing any
   word-8-gram with the benchmark table (broadcast-gram anti-join);
   --max-dup-frac drops survivors above the duplicated-span-fraction
   threshold;
3. quality + language signals on survivors (narrow map stages);
4. deterministic mixture sampling (md5-hash uniform per source —
   RNG-free, retry-stable);
5. sequence packing: greedy (seq, offset) slots into --max-seq-len
   token sequences via two-phase prefix sums (per-range partials +
   driver offsets — no global window task).

Output: parquet (or Iceberg table identifier on a configured cluster)
of (doc_id, source, lang, n_tokens, group_id, group_size, start_seq,
offset_in_seq, spans) for the surviving, sampled corpus + a JSON stats
line on stdout.

Local smoke run:
    python jobs/curate_job.py --input sf_dir_style --output /tmp/out \
        --sf-dir /root/testdata/sf0.001
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def curate(
    spark,
    docs,
    max_seq_len: int = 2048,
    hamming: int = 3,
    pack_ranges: int = 16,
    eval_docs=None,
    max_dup_frac: float | None = None,
    emb_docs=None,
    sem_threshold: float = 0.85,
    sem_lists: int | None = None,
    rule_filter: bool = False,
    strip_substrings: bool = False,
    quality_filter: bool = False,
    source_quota: int | None = None,
    keep_best: bool = False,
):
    """documents (doc_id, text, lang, source, ...) -> curated, packed
    survivors.  Returns (result_df, stats_dict).

    Optional hygiene stages between dedup and sampling:
    - ``eval_docs``: drop survivors sharing any word-8-gram with this
      benchmark table (operators/contamination.decontaminate — anti-
      join against the broadcast eval gram set);
    - ``max_dup_frac``: drop survivors whose duplicated-span fraction
      (corpus doc-frequency >= 4 at word-8-gram granularity) exceeds
      the threshold;
    - ``emb_docs``: (vec_id, embedding) rows keyed by doc_id — drop
      survivors the SemDeDup pass marks as semantic near-dups
      (operators/similarity.semantic_dedup: IVF clusters, within-
      cluster cosine > ``sem_threshold`` to a smaller id).  Catches
      paraphrase-level duplicates the token-level simhash stage
      cannot;
    - ``keep_best``: retention POLICY switch (the ``canonical_docs``
      oracle semantics): keep the LONGEST post-strip text per near-dup
      group (ties to the smaller doc_id) instead of the smallest id.
      Length is computed live (F.length) so a substring-stripped text
      competes with its true size, never a stale n_chars.

    Optional pre-dedup stages:
    - ``rule_filter``: drop documents failing the C4/Gopher heuristic
      battery (functions/rules.py — the same definition as the
      ``c4_filters`` oracle) before any expensive stage runs;
    - ``strip_substrings``: exact substring dedup (Lee et al. 2021;
      operators/contamination.strip_duplicated_substrings) — token
      spans covered by corpus-duplicated word 8-grams are removed from
      the text BEFORE the near-dup/signal stages, so every downstream
      token count sees the stripped corpus;
    - ``quality_filter``: fastText-style hashed linear quality scorer
      (operators/classifier.py — the ``quality_classifier`` oracle
      semantics): naive-Bayes log-odds weights trained on the RAW
      input corpus with the rule battery as weak labels (raw, so the
      labels are never degenerate when ``rule_filter`` also runs),
      then documents scoring <= 0 drop.  Generalizes the rule signal:
      a doc passing every rule but written in "bad-doc" vocabulary
      still drops;
    - ``source_quota``: cap every source at N docs (C4/RefinedWeb-style
      domain caps; functions/sampling.quota_rank_per_group — the
      ``source_quota_sample`` oracle semantics, skew-safe two-phase
      top-N by the shared md5-u32 rank; a NULL source is its own
      capped group).

    Every output row also carries ``split`` ('train'/'holdout', ~10%),
    hashed on the near-dup GROUP id so no holdout doc has a near-dup
    in train (the ``cluster_split`` oracle semantics).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ds4sd_docling_tableformer_onnx_spark.operators.contamination import (
        decontaminate,
        duplicated_span_stats,
    )
    from ds4sd_docling_tableformer_onnx_spark.operators.dedup import (
        simhash_candidates,
        simhash_column,
    )
    from ds4sd_docling_tableformer_onnx_spark.functions.sampling import mixture_keep
    from ds4sd_docling_tableformer_onnx_spark.operators.graph import dedup_groups
    from ds4sd_docling_tableformer_onnx_spark.plans.cache import release

    n_input = docs.count()
    raw_docs = docs  # classifier training corpus (pre-filter: see 0c)

    # 0a. heuristic rule battery (cheapest stage runs first: pure
    # codegen predicates, no shuffle — every doc dropped here skips the
    # gram/simhash stages entirely)
    n_rule_dropped = 0
    if rule_filter:
        from ds4sd_docling_tableformer_onnx_spark.functions.rules import (
            heuristic_rules,
            keep_all,
        )

        docs = docs.where(keep_all(heuristic_rules("text")))
        n_rule_dropped = n_input - docs.count()

    # 0b. exact substring dedup: strip corpus-duplicated 8-gram spans
    # from the text itself so the near-dup signatures and every token
    # count downstream see the deduplicated corpus
    stripped = None
    n_sub_tokens_removed = 0
    if strip_substrings:
        from ds4sd_docling_tableformer_onnx_spark.operators.contamination import (
            strip_duplicated_substrings,
        )

        stripped = strip_duplicated_substrings(docs)
        n_sub_tokens_removed = int(
            stripped.agg(F.sum("n_sub_removed")).collect()[0][0] or 0
        )
        docs = stripped.drop("n_tokens_pre", "n_sub_removed")

    # 0c. learned quality filter: train integer log-odds weights on the
    # RAW corpus (rule-battery weak labels — training after rule_filter
    # would see all-True labels), score the current stream shuffle-free
    # (2 bounded-collect training aggs + 1 codegen scoring pass)
    n_quality_dropped = 0
    if quality_filter:
        from ds4sd_docling_tableformer_onnx_spark.functions.rules import (
            heuristic_rules,
            keep_all,
        )
        from ds4sd_docling_tableformer_onnx_spark.operators.classifier import (
            quality_scores,
            train_quality_weights,
        )

        labeled = raw_docs.where(F.col("text").isNotNull()).withColumn(
            "label", keep_all(heuristic_rules("text"))
        )
        weights = train_quality_weights(labeled)
        before = docs.count()
        docs = (
            quality_scores(docs, weights)
            .where(F.col("q_score") > 0)
            .drop("n_words", "q_score")
        )
        n_quality_dropped = before - docs.count()

    # 0d. per-source quota: cap any one domain's share before the
    # gram/simhash stages pay for its excess (two bounded windows —
    # cheap next to the near-dup joins)
    n_quota_dropped = 0
    if source_quota is not None:
        from ds4sd_docling_tableformer_onnx_spark.functions.sampling import (
            quota_rank_per_group,
        )

        before = docs.count()
        docs = quota_rank_per_group(
            docs, "source", n=source_quota, salts=8
        ).drop("quota_rank")
        n_quota_dropped = before - docs.count()

    # 1. near-dup groups -> canonical survivor per group.  survivors is
    # persisted: the hygiene counts, the sampling filter, and the
    # packing phases below are ~5 downstream actions that would
    # otherwise each re-run the gram joins and the group join.
    cand = simhash_candidates(simhash_column(docs), id_col="doc_id")
    edges = cand.where(F.col("hamming") <= hamming)
    groups = dedup_groups(docs, edges, id_col="doc_id")
    joined = docs.join(groups, "doc_id")
    if keep_best:
        # canonical_docs policy: longest live text wins, ties to the
        # smaller id — ONE group-bounded window, same cost shape as
        # the min-id rule
        best_win = Window.partitionBy("group_id").orderBy(
            F.desc(F.length("text")), F.asc("doc_id")
        )
        keep_pred = F.row_number().over(best_win) == 1
    else:
        keep_pred = F.col("doc_id") == F.col("group_id")  # canonical = min id
    survivors_base = (
        joined.withColumn("_keep", keep_pred)
        .where("_keep")
        .drop("_keep")
        .persist()
    )
    survivors = survivors_base

    # 2. hygiene: benchmark decontamination + duplicated-span filter +
    # optional embedding-level (SemDeDup) near-dup drop
    n_contaminated = n_repetitive = n_semantic = 0
    sem = None
    span_stats = None
    if emb_docs is not None:
        from ds4sd_docling_tableformer_onnx_spark.operators.similarity import (
            semantic_dedup,
        )

        # cluster count scales with the corpus unless pinned (the
        # SemDeDup many-small-clusters recipe, same as the oracle
        # query): the within-cluster join is quadratic per cluster, so
        # a fixed 8 lists at real --emb-input sizes would either hit
        # max_cluster_rows (silently skipping dedup) or pay (n/8)^2
        if sem_lists is None:
            sem_lists = max(8, emb_docs.count() // 256)
        sem = semantic_dedup(
            emb_docs, threshold=sem_threshold, n_lists=sem_lists, seed=7
        )
        sem_dropped = sem.where(~F.col("kept")).select(
            F.col("id").alias("doc_id")
        )
        before = survivors.count()
        survivors = survivors.join(sem_dropped, "doc_id", "left_anti")
        n_semantic = before - survivors.count()
    if eval_docs is not None:
        hits = decontaminate(survivors, eval_docs)
        n_contaminated = hits.count()
        survivors = survivors.join(hits.select("doc_id"), "doc_id", "left_anti")
    if max_dup_frac is not None:
        span_stats = duplicated_span_stats(docs)  # owns a persisted frame
        repetitive = span_stats.where(F.col("dup_frac") > max_dup_frac)
        before = survivors.count()
        survivors = survivors.join(
            repetitive.select("doc_id"), "doc_id", "left_anti"
        )
        n_repetitive = before - survivors.count()

    # 3. signals (narrow, shuffle-free)
    toks = F.size(F.split("text", " ", -1)).cast("long")
    survivors = survivors.withColumn("n_tokens", toks)

    # 3b. leakage-safe split hashed on the GROUP id (cluster_split
    # oracle semantics): an entire near-dup component lands on one side
    from ds4sd_docling_tableformer_onnx_spark.functions.sampling import u32_md5

    grp_u32 = u32_md5("group_id")
    survivors = survivors.withColumn(
        "split",
        F.when(grp_u32 % 10 == 0, F.lit("holdout")).otherwise(F.lit("train")),
    )

    # 4. deterministic mixture sample: srcK keeps 1/2^(K%4) — the ONE
    # shared predicate (functions/sampling.py, same as the oracle query)
    sampled = survivors.where(mixture_keep("doc_id", "source")).select(
        "doc_id", "source", "lang", "n_tokens", "group_id", "group_size", "split"
    )

    # 5. two-phase sequence packing (scale shape: range-partition ->
    # per-range partials -> driver-side offsets over <= pack_ranges
    # rows -> per-range window).  No global window anywhere: ordering
    # comes from repartitionByRange (globally ordered, sampled splits
    # that stay balanced even after dedup+sampling carved holes in the
    # id space), so each window is bounded by one range partition.
    # localCheckpoint (eager) FREEZES the range assignment: the range
    # boundaries come from a sampling pass whose outcome is not
    # guaranteed stable across jobs, and the totals collect and the
    # final write are separate jobs — without the checkpoint a
    # boundary doc could change partitions between them and every
    # offset in its range would silently shift.  On a cluster use
    # checkpoint()/a staging table, same call site.
    n_docs = sampled.count()
    ranked = (
        sampled.repartitionByRange(max(1, pack_ranges), "doc_id")
        .withColumn("rng", F.spark_partition_id().cast("long"))
        .localCheckpoint()
    )
    totals = {
        r["rng"]: r["tot"]
        for r in ranked.groupBy("rng").agg(F.sum("n_tokens").alias("tot")).collect()
    }
    offsets, acc = {}, 0
    for rng in sorted(totals):
        offsets[rng] = acc
        acc += totals[rng]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(k), int(v)) for k, v in offsets.items()] or [(0, 0)],
            "rng long, off long",
        )
    )
    win = (
        Window.partitionBy("rng")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(win), F.lit(0)) + F.col("off")
    packed = (
        ranked.join(off_df, "rng")
        .withColumn("before", before)
        .select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            "group_id",
            "group_size",
            "split",
            F.floor(F.col("before") / max_seq_len).cast("long").alias("start_seq"),
            (F.col("before") % max_seq_len).cast("long").alias("offset_in_seq"),
            (
                F.floor((F.col("before") + F.col("n_tokens") - 1) / max_seq_len)
                - F.floor(F.col("before") / max_seq_len)
                + 1
            )
            .cast("long")
            .alias("spans"),
        )
    )
    stats = {
        "input_docs": n_input,
        "rule_dropped": int(n_rule_dropped),
        "substring_tokens_removed": int(n_sub_tokens_removed),
        "quality_dropped": int(n_quality_dropped),
        "quota_dropped": int(n_quota_dropped),
        "contaminated_dropped": int(n_contaminated),
        "repetitive_dropped": int(n_repetitive),
        "semantic_dropped": int(n_semantic),
        "survivors_sampled": n_docs,
        "total_tokens": int(acc),
        "sequences": int(-(-acc // max_seq_len)) if acc else 0,
    }
    release(cand)
    if stripped is not None:
        # safe: packing reads from the eager localCheckpoint
        release(stripped)
    if sem is not None:
        # safe here for the same reason as survivors_base below: the
        # packing output reads from the eager localCheckpoint
        release(sem)
    if span_stats is not None:
        release(span_stats)
    # safe: `packed` reads from the eager localCheckpoint of `ranked`,
    # so it no longer depends on the cached survivor table
    survivors_base.unpersist()
    return packed, stats


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--max-seq-len", type=int, default=2048)
    parser.add_argument("--hamming", type=int, default=3)
    parser.add_argument("--cores", type=int, default=None)
    parser.add_argument(
        "--eval-input", default=None,
        help="parquet path of a benchmark table (doc_id, text): drop "
        "survivors sharing any word-8-gram with it",
    )
    parser.add_argument(
        "--max-dup-frac", type=float, default=None,
        help="drop survivors whose duplicated-span fraction exceeds this",
    )
    parser.add_argument(
        "--emb-input", default=None,
        help="parquet of (vec_id, embedding) keyed by doc_id: drop "
        "survivors SemDeDup marks as semantic near-dups",
    )
    parser.add_argument(
        "--sem-threshold", type=float, default=0.85,
        help="within-cluster cosine above which a higher-id survivor drops",
    )
    parser.add_argument(
        "--sem-lists", type=int, default=None,
        help="IVF cluster count for the SemDeDup stage (default: "
        "max(8, n_embeddings // 256) — scales with the corpus)",
    )
    parser.add_argument(
        "--rule-filter", action="store_true",
        help="drop documents failing the C4/Gopher heuristic battery "
        "(functions/rules.py) before any expensive stage",
    )
    parser.add_argument(
        "--strip-dup-substrings", action="store_true",
        help="exact substring dedup: remove corpus-duplicated word "
        "8-gram spans from the text before the near-dup stages",
    )
    parser.add_argument(
        "--quality-filter", action="store_true",
        help="train the hashed linear quality scorer on the raw corpus "
        "(rule-battery weak labels) and drop docs scoring <= 0",
    )
    parser.add_argument(
        "--source-quota", type=int, default=None,
        help="cap every source at N docs (deterministic md5-u32 rank; "
        "skew-safe two-phase top-N) before the dedup stages",
    )
    parser.add_argument(
        "--keep-best", action="store_true",
        help="near-dup retention policy: keep the longest text per "
        "group (canonical_docs semantics) instead of the smallest id",
    )
    parser.add_argument(
        "--sf-dir", default=None,
        help="read documents from <sf-dir>/documents.parquet (smoke runs)",
    )
    args = parser.parse_args(argv)

    from ds4sd_docling_tableformer_onnx_spark.session import build_session

    spark = build_session(app_name="curate", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    src = f"{args.sf_dir}/documents.parquet" if args.sf_dir else args.input
    docs = spark.read.parquet(src)

    eval_docs = (
        spark.read.parquet(args.eval_input) if args.eval_input else None
    )
    emb_docs = spark.read.parquet(args.emb_input) if args.emb_input else None

    t0 = time.perf_counter()
    packed, stats = curate(
        spark,
        docs,
        max_seq_len=args.max_seq_len,
        hamming=args.hamming,
        eval_docs=eval_docs,
        max_dup_frac=args.max_dup_frac,
        emb_docs=emb_docs,
        sem_threshold=args.sem_threshold,
        sem_lists=args.sem_lists,
        rule_filter=args.rule_filter,
        strip_substrings=args.strip_dup_substrings,
        quality_filter=args.quality_filter,
        keep_best=args.keep_best,
        source_quota=args.source_quota,
    )
    packed.write.mode("overwrite").parquet(args.output)
    stats["wall_sec"] = round(time.perf_counter() - t0, 3)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
