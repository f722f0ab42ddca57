"""Invariant tests for the round-5 operators (value-level Spark-vs-
DuckDB equivalence runs in scripts/check_oracles.py; these pin the
semantic properties the hash compare cannot express)."""

from pyspark.sql import functions as F

from ds4sd_docling_tableformer_onnx_spark.queries import (
    _CTX_BUDGET_CHARS,
    _CTXW_K,
    _CTXW_STRIDE,
    _PMI_TOPK,
    QUERIES,
)

SF = "/root/testdata/sf0.001"


def test_context_windows_cover_every_turn(spark):
    """Every conversation turn falls in >=1 window, starts advance by
    exactly the stride from 0, and window sizes are min(K, n-start)."""
    wins = QUERIES["context_windows"](spark, SF).toPandas()
    n_turns = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
    )
    assert set(wins["user_id"]) == set(n_turns.index)
    for uid, grp in wins.groupby("user_id"):
        n = int(n_turns[uid])
        grp = grp.sort_values("win_start")
        assert list(grp["win_start"]) == [
            i * _CTXW_STRIDE for i in range(len(grp))
        ]
        assert all(
            int(r.n_in_window) == min(_CTXW_K, n - int(r.win_start))
            for r in grp.itertuples()
        )
        last = grp.iloc[-1]
        # the last window reaches the final turn
        assert int(last.win_start) + int(last.n_in_window) == n


def test_chat_template_budget_and_flag(spark):
    """rendered is the exact prefix of the full conversation string at
    the context budget; `truncated` is true iff content was lost."""
    pdf = QUERIES["chat_template_render"](spark, SF).toPandas()
    assert (pdf["rendered"].str.len() <= _CTX_BUDGET_CHARS).all()
    lost = pdf["full_len"] > _CTX_BUDGET_CHARS
    assert (pdf["truncated"] == lost).all()
    kept = pdf[~lost]
    assert (kept["rendered"].str.len() == kept["full_len"]).all()


def test_merge_upsert_actions_partition_keys(spark):
    """Each output key appears once; actions partition into target-only
    (keep), source-only (insert), both (update); balances add exactly."""
    pdf = QUERIES["merge_upsert"](spark, SF).toPandas()
    assert pdf["key"].is_unique
    tgt = set(
        spark.read.parquet(f"{SF}/customer.parquet")
        .select("c_custkey")
        .toPandas()["c_custkey"]
    )
    src = set(
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id")
        .distinct()
        .toPandas()["user_id"]
    )
    by_action = {a: set(g["key"]) for a, g in pdf.groupby("action")}
    assert by_action.get("keep", set()) == tgt - src
    assert by_action.get("insert", set()) == src - tgt
    assert by_action.get("update", set()) == tgt & src


def test_key_skew_profile_accounts_for_all_rows(spark):
    """Histogram buckets tile the count domain: sum(rows) == total
    events, sum(n_keys) == distinct keys, bucket bounds honour the
    binary-magnitude definition 2^(bits-1) <= cnt < 2^bits."""
    pdf = QUERIES["key_skew_profile"](spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert pdf["rows"].sum() == ev.count()
    assert pdf["n_keys"].sum() == ev.select("user_id").distinct().count()
    for r in pdf.itertuples():
        assert 2 ** (int(r.cnt_bits) - 1) <= int(r.min_cnt)
        assert int(r.max_cnt) < 2 ** int(r.cnt_bits)


def test_pmi_lift_is_exact_integer_division(spark):
    """Recompute the permille lift from raw counts driver-side with
    exact big-int arithmetic — the Spark int64 `div` must agree (no
    double round-trip anywhere)."""
    pdf = QUERIES["pmi_collocations"](spark, SF).toPandas()
    assert len(pdf) <= _PMI_TOPK
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    uni: dict = {}
    big: dict = {}
    import re

    for text in docs["text"]:
        ws = [w for w in re.split(r"[\t\n\f\r ]+", text) if w]
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    n = sum(uni.values())
    for r in pdf.itertuples():
        c_xy = big[(r.w1, r.w2)]
        assert c_xy == int(r.c_xy)
        assert int(r.lift_permille) == (c_xy * 1000 * n) // (
            uni[r.w1] * uni[r.w2]
        )


def test_vocab_growth_is_monotone_and_complete(spark):
    """Cumulative vocab/tokens are non-decreasing; the final decile's
    cumulatives equal the corpus totals."""
    pdf = (
        QUERIES["vocab_growth"](spark, SF)
        .toPandas()
        .sort_values("decile")
    )
    assert pdf["vocab_cum"].is_monotonic_increasing
    assert pdf["tokens_cum"].is_monotonic_increasing
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(
        F.explode(F.split("text", "[\t\n\f\r ]+")).alias("t")
    ).where(F.col("t") != "")
    assert int(pdf["tokens_cum"].iloc[-1]) == toks.count()
    assert int(pdf["vocab_cum"].iloc[-1]) == toks.distinct().count()
    assert pdf["new_terms"].sum() == pdf["vocab_cum"].iloc[-1]
