"""Streaming near-duplicate candidate detection.

The batch near-dup path (operators/dedup.py: simhash signatures ->
4 x 16-bit band-exclusion self-joins) re-expressed incrementally: as
documents arrive on a stream, each lands in its 4 simhash band
buckets, and a per-bucket ``applyInPandasWithState`` keeps the
signatures seen so far in that bucket.  A new document emits one
candidate row per stored bucket member — but only from the FIRST band
the pair shares (the same band-exclusion rule as the batch joins,
decidable from the two signatures alone), so the streamed union over
all four band groups is exactly the batch candidate set, with no
cross-bucket dedup.

State boundedness (the only shape that survives an unbounded stream):

- state per bucket is (ids, sigs) arrays — ~16 B per document per
  band, and bucket population is corpus_size / 2^16 per band in
  expectation;
- ``max_state_rows`` caps a bucket's stored population: once full,
  new arrivals still COMPARE against the stored rows (and emit their
  pairs) but are not retained, and the drop is counted in state —
  the same skew discipline as the batch LSH bucket cap (a degenerate
  corpus flooding one bucket degrades recall measurably, never memory
  or wall unboundedly);
- production eviction: pair this with a watermark + event-time TTL
  (``GroupStateTimeout.EventTimeTimeout``) so state tracks the
  duplicate-arrival window; kept ``NoTimeout`` here so the
  streamed == batch equivalence test is exact.

Within a micro-batch, arrivals are processed in doc_id order and each
row also compares against earlier rows of the same batch, so a pair
split across micro-batches and a pair landing in one micro-batch
produce the identical row.
"""

from __future__ import annotations

BAND_BITS = 16
N_BANDS = 4
_MASK64 = (1 << 64) - 1
_BAND_MASK = (1 << BAND_BITS) - 1

OUTPUT_SCHEMA = "id_a bigint, id_b bigint, hamming bigint"
STATE_SCHEMA = "ids array<bigint>, sigs array<bigint>, dropped bigint"


def _bands(sig: int) -> list[int]:
    u = sig & _MASK64
    return [(u >> (BAND_BITS * i)) & _BAND_MASK for i in range(N_BANDS)]


def _first_shared_band(sig_a: int, sig_b: int) -> int:
    """Index of the first 16-bit band where the signatures agree, or
    -1; mirrors the batch band-exclusion join conditions."""
    ba, bb = _bands(sig_a), _bands(sig_b)
    for i in range(N_BANDS):
        if ba[i] == bb[i]:
            return i
    return -1


def _make_update(max_state_rows: int):
    def _update(key, pdfs, state):
        import pandas as pd

        band_idx = int(key[0])
        ids, sigs, dropped = (
            ([], [], 0)
            if not state.exists
            else (list(state.get[0]), list(state.get[1]), int(state.get[2]))
        )

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("doc_id")
        out_a: list[int] = []
        out_b: list[int] = []
        out_h: list[int] = []
        for doc_id, sig in zip(
            rows["doc_id"].astype("int64"), rows["simhash"].astype("int64")
        ):
            doc_id, sig = int(doc_id), int(sig)
            for other_id, other_sig in zip(ids, sigs):
                if other_id == doc_id:
                    continue
                if _first_shared_band(sig, other_sig) != band_idx:
                    continue  # this pair belongs to an earlier band's group
                a, b = sorted((doc_id, other_id))
                out_a.append(a)
                out_b.append(b)
                out_h.append(bin((sig ^ other_sig) & _MASK64).count("1"))
            if len(ids) < max_state_rows:
                ids.append(doc_id)
                sigs.append(sig)
            else:
                dropped += 1

        state.update((ids, sigs, dropped))
        if out_a:
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

    return _update


def stream_neardup_candidates(
    docs_stream,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_state_rows: int = 65536,
):
    """Streaming documents (id, text, ...) -> append stream of
    (id_a, id_b, hamming) simhash candidate pairs, equal to the batch
    ``simhash_candidates`` output over the same rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.dedup import simhash_column

    sigs = simhash_column(docs_stream, text_col=text_col).select(
        F.col(id_col).alias("doc_id"), "simhash"
    )
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", BAND_BITS * i)
                    .bitwiseAND(F.lit(_BAND_MASK))
                    for i in range(N_BANDS)
                ]
            )
        ).alias("band", "band_key"),
    )
    return banded.groupBy("band", "band_key").applyInPandasWithState(
        _make_update(max_state_rows),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
