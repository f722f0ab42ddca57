"""Iterative BPE merge training — the tokenizer-training inner loop.

``queries.bpe_pair_counts`` computes round 0's statistics; this operator
runs the actual loop: count adjacent symbol pairs over the corpus, merge
the argmax pair (count desc, then lexicographic — deterministic
tie-break), recount, k times.  The merge table it emits is the trained
tokenizer prefix.

Scale design (10^12-char corpora):

- each round is ONE corpus pass for pair counts (explode + map-side
  combined groupBy — the same shuffle shape as ``bpe_pair_counts``)
  plus ONE narrow map stage applying the merge (no shuffle);
- the merge itself is a vectorized Arrow-batched pandas UDF.  The
  alternative — a Catalyst ``aggregate`` fold appending to an array
  accumulator — is O(n_tokens^2) per document (immutable array copied
  per element) and measured orders slower; greedy left-to-right
  non-overlapping matching is inherently sequential per document, the
  textbook justification for dropping to a pandas UDF.  Inside the UDF
  everything is numpy masks except a loop over *match positions* (few);
- the token stream is ``localCheckpoint``-ed every round, truncating
  the otherwise k-deep lineage so round k doesn't re-run rounds 1..k-1
  on every action (same discipline as operators/graph.py label
  propagation; on a cluster swap for ``checkpoint()`` / a staged
  table — the call site is the only change);
- the per-round argmax is a ``limit(1).collect()`` of an aggregated
  1-row frame: driver traffic is k rows total.

Greedy merge semantics (both here and in the DuckDB oracle, which
reconstructs them independently with window functions): scan each
document's token list left to right; at each position where
``(tok[i], tok[i+1])`` equals the merge pair and ``tok[i]`` was not
consumed by the previous merge, replace the two tokens with their
concatenation.  Equivalently: within every maximal run of consecutive
match positions, positions at odd rank merge (a run of length >= 2
requires left == right, where overlapping matches alternate).
"""

from __future__ import annotations


def char_tokens(df, text_col: str = "text", out_col: str = "toks"):
    """Initial BPE state: the text as an array of single characters.
    ``split`` on the empty pattern adds no trailing empties for
    non-empty input, but maps '' to [''] — the filter normalizes the
    empty document to an empty token list."""
    from pyspark.sql import functions as F

    return df.withColumn(
        out_col, F.filter(F.split(F.col(text_col), ""), lambda x: x != "")
    )


def _top_pair(stream, toks_col: str):
    """The (left, right, count) argmax adjacent pair of the current
    token stream, deterministic tie-break; None on an empty stream."""
    from pyspark.sql import functions as F

    toks = F.col(toks_col)
    pairs = stream.select(
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.get(toks, i - 1).alias("lft"),
                        F.get(toks, i).alias("rgt"),
                    ),
                ),
            ).otherwise(F.expr("CAST(array() AS ARRAY<STRUCT<lft STRING, rgt STRING>>)"))
        ).alias("p")
    ).select("p.lft", "p.rgt")
    rows = (
        pairs.groupBy("lft", "rgt")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("lft").asc(), F.col("rgt").asc())
        .limit(1)
        .collect()
    )
    return rows[0] if rows else None


def _apply_merge(stream, toks_col: str, left: str, right: str):
    """One merge round over the token-array column: greedy
    non-overlapping left-to-right replacement of (left, right) by
    left+right, vectorized per Arrow batch."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    merged = left + right

    @pandas_udf("array<string>")
    def _merge(series):
        import numpy as np
        import pandas as pd

        out = []
        for toks in series:
            if toks is None or len(toks) < 2:
                out.append(toks)
                continue
            arr = np.asarray(toks, dtype=object)
            hit = np.flatnonzero((arr[:-1] == left) & (arr[1:] == right))
            if hit.size == 0:
                out.append(toks)
                continue
            # greedy non-overlap: drop a match whose predecessor matched
            sel = []
            last = -2
            for i in hit.tolist():
                if i > last + 1:
                    sel.append(i)
                    last = i
            sel = np.asarray(sel, dtype=np.int64)
            arr = arr.copy()
            arr[sel] = merged
            keep = np.ones(len(arr), dtype=bool)
            keep[sel + 1] = False
            out.append(arr[keep].tolist())
        return pd.Series(out)

    return stream.withColumn(toks_col, _merge(F.col(toks_col)))


def bpe_encode(df, merges, text_col: str = "text", out_col: str = "tokens"):
    """Tokenizer APPLY (r4 verdict item 4): encode documents with an
    already-trained merge table in ONE corpus pass.

    Semantics: each document is char-tokenized, then the merges are
    replayed **in training order**, one greedy left-to-right
    non-overlapping pass per merge — exactly the transformation
    :func:`bpe_merge_rounds` applied while training, so
    ``bpe_encode(training_corpus, merges)`` equals the trainer's final
    stream **by construction** (pinned differentially in
    tests/test_operators.py).  This is the original Sennrich (2016)
    apply rule ("apply the learned operations in the order they were
    learned"); it needs no per-document priority queue and its output
    is reproducible by any engine round by round — which is what makes
    the DuckDB oracle (queries.py ``bpe_encode``) value-exact.

    Scale shape (the half of the tokenizer story training doesn't
    cover): ONE Arrow-batched pandas UDF stage, shuffle-free — the plan
    is scan -> project, nothing else.  The merge table travels in the
    UDF closure (~1 MB at a real 32k-merge vocabulary, pickled once per
    python worker — the broadcast-variable analog for python-side
    constants).  Per document a token-SET prefilter skips merges whose
    parts are absent from the current stream (O(1) per skipped merge),
    so cost is O(k + applied_merges * doc_len) rather than the naive
    O(k * doc_len): with 32k merges and ~40 applicable per short doc,
    the scan-everything form would be ~800x more list passes.

    ``merges``: ordered list of trainer dicts (``{"lft", "rgt", ...}``)
    or plain ``(lft, rgt)`` pairs.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    pairs = [
        (m["lft"], m["rgt"]) if isinstance(m, dict) else (m[0], m[1])
        for m in merges
    ]

    @pandas_udf("array<string>")
    def _encode(texts):
        import pandas as pd

        out = []
        for text in texts:
            if text is None:
                out.append(None)
                continue
            toks = list(text)
            present = set(toks)
            for lft, rgt in pairs:
                if lft not in present or rgt not in present:
                    continue
                res = []
                i, n, matched = 0, len(toks), False
                while i < n:
                    if i + 1 < n and toks[i] == lft and toks[i + 1] == rgt:
                        res.append(lft + rgt)
                        i += 2
                        matched = True
                    else:
                        res.append(toks[i])
                        i += 1
                if matched:
                    toks = res
                    present = set(toks)
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, _encode(F.col(text_col)))


def bpe_merge_rounds(df, rounds: int = 5, toks_col: str = "toks"):
    """Run ``rounds`` BPE merge rounds over the token-array column.

    Returns ``(merges, final_stream)`` where ``merges`` is the ordered
    list of dicts ``{merge_round, lft, rgt, merged, cnt}`` (the trained
    merge table) and ``final_stream`` the post-merge token frame.
    Stops early if the corpus runs out of pairs.
    """
    stream = df.localCheckpoint()
    merges = []
    for r in range(1, rounds + 1):
        top = _top_pair(stream, toks_col)
        if top is None or top["cnt"] == 0:
            break
        merges.append(
            {
                "merge_round": r,
                "lft": top["lft"],
                "rgt": top["rgt"],
                "merged": top["lft"] + top["rgt"],
                "cnt": top["cnt"],
            }
        )
        # localCheckpoint: materialize this round's stream and truncate
        # lineage (otherwise round k replays rounds 1..k-1 per action)
        stream = _apply_merge(stream, toks_col, top["lft"], top["rgt"]).localCheckpoint()
    return merges, stream
