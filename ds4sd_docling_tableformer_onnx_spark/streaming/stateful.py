"""Custom stateful streaming operator: per-conversation running state.

``applyInPandasWithState`` keeps one state record per conv_id across
micro-batches: turns seen, max turn_idx, ok-count and a running hash
chain over (turn_idx, html_sha256) pairs — an incrementally maintained
version of ``conversation_documents`` that tolerates out-of-order
arrival *within* a micro-batch (sorted before folding) and emits an
updated row per conversation per batch.

This is the "custom stateful operator" slot of the engine: the
reference has no streaming, but at 10^12-turn scale transcripts arrive
continuously and per-conversation rollups must not recompute from
scratch.
"""

from __future__ import annotations

STATE_SCHEMA = "turns long, max_turn int, ok_turns long, chain string"
OUTPUT_SCHEMA = (
    "conv_id string, turns long, max_turn int, ok_turns long, chain_sha string"
)


def _update_conversation(key, pdfs, state):
    import hashlib

    import pandas as pd

    turns, max_turn, ok_turns, chain = (
        state.get if state.exists else (0, -1, 0, "")
    )

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["turn_idx"])
    for row in rows.itertuples():
        turns += 1
        max_turn = max(max_turn, int(row.turn_idx))
        if bool(row.ok):
            ok_turns += 1
        chain = hashlib.sha256(
            f"{chain}|{int(row.turn_idx)}:{row.html_sha256}".encode()
        ).hexdigest()

    state.update((turns, max_turn, ok_turns, chain))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "turns": [turns],
            "max_turn": [max_turn],
            "ok_turns": [ok_turns],
            "chain_sha": [chain],
        }
    )


def stateful_conversation_rollup(extracted_stream):
    """Streaming extraction output -> per-conversation running rollup.

    One state record per conversation; update-mode output.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return extracted_stream.groupBy("conv_id").applyInPandasWithState(
        _update_conversation,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
