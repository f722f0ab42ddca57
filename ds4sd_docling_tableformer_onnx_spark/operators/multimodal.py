"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns
with struct metadata; decode and feature extraction run as
``mapInPandas`` stages (Arrow batches of bytes, vectorized numpy).  The
actual codec step is STUBBED (image/audio libraries are not available in
this environment): ``decode_stub=True`` produces a deterministic fake
decode — byte histograms standing in for pixel statistics — while the
Spark-side plumbing (schema, batching, partition sizing) is real and
tested.  Swapping the stub for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

FEATURE_SCHEMA = (
    "item_id long, n_bytes long, kind string, ok boolean, "
    "feature array<double>, note string"
)


def _feature_batches(batches: Iterator, kind: str, decode_stub: bool):
    import numpy as np
    import pandas as pd

    for batch in batches:
        rows = {k: [] for k in ("item_id", "n_bytes", "kind", "ok", "feature", "note")}
        for item_id, payload in zip(batch["item_id"], batch["payload"]):
            data = bytes(payload) if payload is not None else b""
            rows["item_id"].append(int(item_id))
            rows["n_bytes"].append(len(data))
            rows["kind"].append(kind)
            if not decode_stub:
                # Real decode path: requires PIL / torchaudio / ffmpeg —
                # not present in this container by design.
                raise NotImplementedError(
                    "real media decode requires imaging/audio libraries; "
                    "run with decode_stub=True"
                )
            if data:
                arr = np.frombuffer(data, dtype=np.uint8)
                hist = np.bincount(arr % 16, minlength=16).astype(np.float64)
                rows["feature"].append((hist / max(len(arr), 1)).tolist())
                rows["ok"].append(True)
                rows["note"].append("stub-decode")
            else:
                rows["feature"].append([0.0] * 16)
                rows["ok"].append(False)
                rows["note"].append("empty payload")
        yield pd.DataFrame(rows)


def extract_media_features(df, id_col: str, payload_col: str, kind: str = "image", decode_stub: bool = True):
    """binary payload column -> 16-d feature vector per item.

    Narrow mapInPandas stage; on a cluster, pair with
    ``spark.sql.files.maxPartitionBytes`` sizing so a partition of blobs
    fits executor memory (media rows are orders of magnitude wider than
    text rows)."""
    from pyspark.sql import functions as F

    pruned = df.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
    )
    return pruned.mapInPandas(
        lambda it: _feature_batches(it, kind, decode_stub), schema=FEATURE_SCHEMA
    )
