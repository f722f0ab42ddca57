"""The extraction operator: transcripts DataFrame -> per-turn grid output.

Scale design (the part that must survive 10^12 turns / 1000 executors):

- **Narrow, shuffle-free map stage.** Per-turn extraction is
  embarrassingly parallel, so it runs as ``mapInPandas`` directly over
  the scan — no shuffle, no grouping.  Catalyst prunes the input to the
  four columns the UDF declares (conv_id, turn_idx, text, tool); filter
  pushdown on conv_id/ts reaches the parquet/Iceberg scan untouched.
- **Arrow batches are the vectorization unit** (2048 rows/batch by
  session default): JSON decode + the pure-Python per-sequence scans are
  amortized per batch; no per-row Python in the Spark plan itself.
- **Stable turn ordering** is an output-side concern: per-conversation
  views order by ``turn_idx`` under a window partitioned by conv_id —
  one shuffle, AQE skew-splitting enabled for mega-conversations, plus
  explicit salting in ``conversation_summaries`` (two-phase agg).
- **Lineage**: every output row carries payload_sha256 +
  spark_partition_id for the checkpoint/metrics tables (plans/checkpoint).

Reference lifecycle being re-expressed: tf_predictor.predict /
predict_dummy + multi_table_predict (SURVEY §3.1-3.2).
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

from ..functions.keys import payload_key_col, payload_key_py

OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, payload_id int, ok boolean, err string, "
    "num_rows int, num_cols int, n_cells int, n_matches int, "
    "bbox_sync boolean, square boolean, matched boolean, "
    "rs_seq array<string>, html_seq array<string>, "
    "html_sha256 string, tf_responses_json string, "
    "payload_sha256 string"
)

# lean variant: hashes + metrics only (for throughput-critical passes
# where the full grids live in the checkpoint table of a later stage)
LEAN_SCHEMA = (
    "conv_id string, turn_idx int, payload_id int, ok boolean, err string, "
    "num_rows int, num_cols int, n_cells int, n_matches int, "
    "bbox_sync boolean, square boolean, matched boolean, "
    "html_sha256 string, tf_responses_sha256 string, payload_sha256 string"
)


# per-worker memo of the JSON encoding of individual HTML tag strings:
# html_seq draws from a fixed structural-tag vocabulary, so encoding a
# 60-tag sequence is 60 dict hits instead of one iterencode walk.  This
# caches ENCODINGS of vocabulary strings, never extraction results.
_TAG_JSON: dict = {}


def _json_str_list(seq):
    """Byte-identical to ``json.dumps(seq)`` for a list of strings:
    json.dumps uses ', ' separators, so the element-joined form is the
    same bytes (and the SHA-256 over it is unchanged — pinned by the
    pool-verification pass_rate and fixture tests)."""
    cache = _TAG_JSON
    parts = []
    for s in seq:
        j = cache.get(s)
        if j is None:
            j = cache[s] = json.dumps(s)
        parts.append(j)
    return "[" + ", ".join(parts) + "]"


def _extract_batches(batches: Iterator, correct_overlapping_cells: bool, lean: bool = False):
    """Arrow-batch worker: consumes pyarrow RecordBatches, yields typed
    RecordBatches (mapInArrow — measured ~30% faster than the pandas
    bridge for this string-heavy output).

    The cyclic GC is suspended for the duration of the task: the per-turn
    pipeline churns acyclic dicts/lists that refcounting frees instantly,
    so generational collection walks ever-growing survivor sets for
    nothing (pinned-core A/B: +11-13% turns/s; functions/gcctl.py)."""
    import pyarrow as pa

    from ..core.pipeline import extract_turn
    from ..functions.gcctl import suspended_gc

    with suspended_gc():
        yield from _extract_batches_inner(
            batches, correct_overlapping_cells, lean, pa, extract_turn
        )


def _extract_batches_inner(batches, correct_overlapping_cells, lean, pa, extract_turn):

    payload_cols = (
        ("html_sha256", "tf_responses_sha256")
        if lean
        else ("rs_seq", "html_seq", "html_sha256", "tf_responses_json")
    )
    for batch in batches:
        out = {key: [] for key in (
            "payload_id", "ok", "err", "num_rows",
            "num_cols", "n_cells", "n_matches", "bbox_sync", "square",
            "matched", *payload_cols, "payload_sha256",
        )}
        for text, tool in zip(
            batch.column("text").to_pylist(),
            batch.column("tool").to_pylist(),
        ):
            # The shared injective payload key (functions/keys.py):
            # byte-identical to resume_filter's JVM-side expression, so a
            # null payload is isolated as an error row (never a task
            # crash) and checkpoint resume matches it exactly.
            out["payload_sha256"].append(payload_key_py(text, tool))
            # Per-turn isolation must be exception-safe mid-row: compute
            # the whole row first, append to the column lists only once
            # it is complete, so a failure at ANY point (payload parse,
            # extraction, serialization) yields exactly one error row and
            # never desyncs the Arrow column lengths.
            row = None
            try:
                payload = json.loads(text)
                context = json.loads(tool)
                payload.update(context)
                payload_id = context.get("payload_id", -1)
                result = extract_turn(
                    payload, correct_overlapping_cells=correct_overlapping_cells
                )
                html_json = _json_str_list(result["html_seq"])
                tf_json = json.dumps(result["tf_responses"])
                row = {
                    "payload_id": payload_id,
                    "ok": True,
                    "err": None,
                    "num_rows": result["num_rows"],
                    "num_cols": result["num_cols"],
                    "n_cells": result["n_cells"],
                    "n_matches": result["n_matches"],
                    "bbox_sync": result["bbox_sync"],
                    "square": result["square"],
                    "matched": result["matched"],
                    "html_sha256": hashlib.sha256(
                        html_json.encode("utf-8")
                    ).hexdigest(),
                }
                if lean:
                    row["tf_responses_sha256"] = hashlib.sha256(
                        tf_json.encode("utf-8")
                    ).hexdigest()
                else:
                    row["rs_seq"] = result["rs_seq"]
                    row["html_seq"] = result["html_seq"]
                    row["tf_responses_json"] = tf_json
            except Exception as exc:  # per-turn isolation: bad payloads
                row = {
                    "payload_id": -1,
                    "ok": False,
                    "err": f"{type(exc).__name__}: {exc}"[:500],
                    "num_rows": 0,
                    "num_cols": 0,
                    "n_cells": 0,
                    "n_matches": 0,
                    "bbox_sync": False,
                    "square": False,
                    "matched": False,
                    "html_sha256": None,
                }
                if lean:
                    row["tf_responses_sha256"] = None
                else:
                    row["rs_seq"] = []
                    row["html_seq"] = []
                    row["tf_responses_json"] = "[]"
            for key, value in row.items():
                out[key].append(value)
        arrays = {
            # identity columns pass through as Arrow arrays untouched —
            # no pylist round-trip for data the worker never inspects
            "conv_id": batch.column("conv_id").cast(pa.string()),
            "turn_idx": batch.column("turn_idx").cast(pa.int32()),
            "payload_id": pa.array(out["payload_id"], pa.int32()),
            "ok": pa.array(out["ok"], pa.bool_()),
            "err": pa.array(out["err"], pa.string()),
            "num_rows": pa.array(out["num_rows"], pa.int32()),
            "num_cols": pa.array(out["num_cols"], pa.int32()),
            "n_cells": pa.array(out["n_cells"], pa.int32()),
            "n_matches": pa.array(out["n_matches"], pa.int32()),
            "bbox_sync": pa.array(out["bbox_sync"], pa.bool_()),
            "square": pa.array(out["square"], pa.bool_()),
            "matched": pa.array(out["matched"], pa.bool_()),
            "payload_sha256": pa.array(out["payload_sha256"], pa.string()),
        }
        if lean:
            arrays["html_sha256"] = pa.array(out["html_sha256"], pa.string())
            arrays["tf_responses_sha256"] = pa.array(
                out["tf_responses_sha256"], pa.string()
            )
        else:
            arrays["rs_seq"] = pa.array(out["rs_seq"], pa.list_(pa.string()))
            arrays["html_seq"] = pa.array(out["html_seq"], pa.list_(pa.string()))
            arrays["html_sha256"] = pa.array(out["html_sha256"], pa.string())
            arrays["tf_responses_json"] = pa.array(
                out["tf_responses_json"], pa.string()
            )
        names = ["conv_id", "turn_idx", *out.keys()]
        yield pa.RecordBatch.from_arrays([arrays[n] for n in names], names=names)


def extract_transcripts(df, correct_overlapping_cells: bool = False, min_parallelism: int | None = None, lean: bool = False):
    """transcripts (conv_id, turn_idx, role, text, tool, ts[, payload_id])
    -> per-turn extraction output.  Narrow transformation: column-pruned
    scan feeding one mapInPandas stage.

    The stage is CPU-bound per *row*, while Spark sizes input splits by
    *bytes* — a highly-compressed scan can bundle into fewer splits than
    cores and serialize the stage.  When the scan yields fewer partitions
    than the cluster's parallelism, a cheap round-robin repartition
    restores it (no-op on well-sized inputs; at petabyte scale the scan
    naturally produces thousands of splits and no shuffle is added).
    """
    pruned = df.select("conv_id", "turn_idx", "text", "tool")
    if min_parallelism is None:
        min_parallelism = 0  # measured: the repartition shuffle costs more
        # than the imbalance it fixes on well-laid-out inputs; opt in for
        # pathological single-file inputs only
    if min_parallelism and pruned.rdd.getNumPartitions() < min_parallelism:
        pruned = pruned.repartition(min_parallelism)
    return pruned.mapInArrow(
        lambda it: _extract_batches(it, correct_overlapping_cells, lean),
        schema=LEAN_SCHEMA if lean else OUTPUT_SCHEMA,
    )


def extract_transcripts_deduped(df, correct_overlapping_cells: bool = False, lean: bool = False, broadcast_threshold: int | None = 100_000):
    """Dedup-aware extraction: run the (expensive) per-turn pipeline
    once per DISTINCT payload, then join results back to every turn.

    Agent-transcript corpora repeat payloads heavily — the same tool
    schema, boilerplate turn, or replayed context appears across
    conversations.  With duplication factor d this converts O(N)
    extraction work into O(N/d) extraction + one join:

    - distinct pass: dropDuplicates on the payload hash (one shuffle of
      (hash, text, tool) — at 10^12 turns this is the classic
      "aggregate the heavy column early" move: the shuffle carries each
      distinct payload once);
    - join back: broadcast when the distinct side is small (bounded by
      ``broadcast_threshold`` rows, counted on the distinct frame —
      one cheap action), else a shuffle join on the hash, which Iceberg
      bucketing on payload_sha256 makes storage-partitioned.

    Row-for-row equal to ``extract_transcripts`` (tests pin it); use
    the direct form when payloads are known to be near-unique — the
    distinct shuffle then buys nothing.

    The returned frame owns the persisted distinct-payload table:
    release with ``plans.cache.release(result)`` after the terminal
    action (harnesses do; see plans/cache.py for the lifecycle).
    """
    from pyspark.sql import functions as F

    from ..plans.cache import adopt

    # UNAMBIGUOUS dedup key — the shared injective payload key
    # (functions/keys.py; a concat_ws key would collide on NULL parts,
    # silently assigning one payload's results to another's turns).
    # Same key as checkpoint resume / the worker's lineage column, so a
    # materialized distinct-payload table serves both dedup and resume.
    keyed = df.select(
        "conv_id",
        "turn_idx",
        payload_key_col("text", "tool").alias("dedup_key"),
        "text",
        "tool",
    )
    # persisted so the broadcast-decision count and the extraction read
    # ONE materialization of the dedup shuffle (at corpus scale this is
    # a checkpoint table of distinct payloads, itself reusable across
    # runs)
    distinct = (
        keyed.select("dedup_key", "text", "tool")
        .dropDuplicates(["dedup_key"])
        .persist()
    )
    # reuse the batch worker, riding the key through its conv_id
    # pass-through column; the worker recomputes the same shared key as
    # its payload_sha256 lineage column (tests pin the equality)
    carrier = distinct.select(
        F.col("dedup_key").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        "text",
        "tool",
    )
    extracted = (
        carrier.mapInArrow(
            lambda it: _extract_batches(it, correct_overlapping_cells, lean),
            schema=LEAN_SCHEMA if lean else OUTPUT_SCHEMA,
        )
        .withColumnRenamed("conv_id", "dedup_key")
        .drop("turn_idx")
    )

    turns = keyed.select("conv_id", "turn_idx", "dedup_key")
    if broadcast_threshold is not None and distinct.limit(
        broadcast_threshold + 1
    ).count() <= broadcast_threshold:
        extracted = F.broadcast(extracted)
    return adopt(turns.join(extracted, "dedup_key").drop("dedup_key"), distinct)


def ordered_conversation_view(extracted):
    """Per-conversation ordered view (W2: stable turn ordering): adds the
    turn's rank within its conversation; one shuffle on conv_id."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    win = Window.partitionBy("conv_id").orderBy("turn_idx")
    return extracted.withColumn("turn_rank", F.row_number().over(win))


def conversation_summaries(extracted, salt_buckets: int = 16):
    """Conversation-level rollup with explicit skew salting: a two-phase
    aggregation (partial per (conv_id, salt), then final per conv_id) so a
    mega-conversation cannot pin one reducer.  AQE would also split the
    skewed partition; the salt makes the plan robust even with AQE off.
    """
    from pyspark.sql import functions as F

    salted = extracted.withColumn(
        "salt", F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets))
    )
    partial = salted.groupBy("conv_id", "salt").agg(
        F.count("*").alias("turns"),
        F.sum(F.col("n_cells").cast("long")).alias("cells"),
        F.sum(F.col("n_matches").cast("long")).alias("matches"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).alias("ok_turns"),
        F.max("num_cols").alias("max_cols"),
        F.max("num_rows").alias("max_rows"),
    )
    return partial.groupBy("conv_id").agg(
        F.sum("turns").alias("turns"),
        F.sum("cells").alias("cells"),
        F.sum("matches").alias("matches"),
        F.sum("ok_turns").alias("ok_turns"),
        F.max("max_cols").alias("max_cols"),
        F.max("max_rows").alias("max_rows"),
    )


def verify_against_pool(extracted, pool_df):
    """Per-turn text-equality verdicts: broadcast-join the tiny payload
    pool (expected html per payload) and compare hashes.  Returns the
    extracted frame with ``html_match`` plus the expected hash."""
    from pyspark.sql import functions as F

    expected = pool_df.select(
        F.col("payload_id").alias("exp_payload_id"),
        "expected_html_sha",
    )
    joined = extracted.join(
        F.broadcast(expected),
        extracted["payload_id"] == expected["exp_payload_id"],
        "left",
    )
    return joined.withColumn(
        "html_match",
        F.col("ok") & (F.col("html_sha256") == F.col("expected_html_sha")),
    ).drop("exp_payload_id")
