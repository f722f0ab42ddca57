"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images / audio / video ride through the pipeline as ``binary`` columns
with struct metadata; decode and feature extraction run as
``mapInPandas`` stages (Arrow batches of bytes, vectorized numpy).

Two decode paths behind one flag:

- ``decode_stub=True`` (default here): deterministic fake decode —
  bucket-16 byte histograms standing in for pixel statistics, computed
  with ONE vectorized numpy pass over the whole Arrow batch (all
  payloads concatenated, per-row offsets, ``np.add.at`` scatter); no
  per-row Python beyond the zip that builds offsets.
- ``decode_stub=False``: the real path — imports PIL lazily (per
  executor worker, the broadcast-artifacts pattern) and emits the same
  16-d shape from decoded pixel data.  The imaging libraries are not in
  this container, so the import failure raises a clear
  ``NotImplementedError``; the gate is exercised by a skip-marked test
  so the wiring is real even where the codec is not.
"""

from __future__ import annotations

from typing import Iterator

FEATURE_SCHEMA = (
    "item_id long, n_bytes long, kind string, ok boolean, "
    "feature array<double>, note string"
)

_N_BUCKETS = 16


def _tiny_png(value: int = 100) -> bytes:
    """Minimal valid 1x1 8-bit grayscale PNG, built by hand (no codec
    needed) — the smoke-test input for the real-decoder gate."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(bytes([0, value]))  # filter byte + one pixel
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _real_decoder():
    """Lazy per-worker construction of the real imaging path.

    Returns a callable bytes -> 16-d feature list.  The gate is
    FUNCTIONAL, not import-shaped: after importing PIL it must correctly
    decode a known 1x1 PNG — a missing, stubbed, or broken imaging stack
    all raise the same clear NotImplementedError (this container ships
    no codec by design)."""

    def _build():
        import io

        import numpy as np
        from PIL import Image  # absent (or test-stubbed) in this container

        def decode(data: bytes):
            img = Image.open(io.BytesIO(data)).convert("L")
            pixels = np.asarray(img, dtype=np.uint8).ravel()
            hist = np.bincount(pixels // 16, minlength=_N_BUCKETS).astype(np.float64)
            return (hist / max(pixels.size, 1)).tolist()

        return decode

    try:
        decode = _build()
        smoke = decode(_tiny_png(100))
        if len(smoke) != _N_BUCKETS or smoke[100 // 16] != 1.0:
            raise ValueError(f"smoke decode produced {smoke!r}")
    except Exception as exc:
        raise NotImplementedError(
            "real media decode requires a working imaging stack (PIL); "
            "not present in this container — run with decode_stub=True"
        ) from exc
    return decode


def _stub_features(payloads):
    """Stub decode for one Arrow batch: per-payload numpy bincount into
    the (n_rows, 16) histogram matrix.

    Deliberately O(one payload) extra memory: media payloads are wide,
    and a batch-flattened formulation (concatenate + int64 row index per
    byte) would amplify a 1 GB batch to ~9 GB of temporaries.  The inner
    op is a single vectorized bincount per payload — the per-row Python
    here is one call per blob, not per byte."""
    import numpy as np

    n = len(payloads)
    sizes = np.empty(n, dtype=np.int64)
    hist = np.zeros((n, _N_BUCKETS), dtype=np.float64)
    for i, payload in enumerate(payloads):
        data = bytes(payload) if payload is not None else b""
        sizes[i] = len(data)
        if data:
            arr = np.frombuffer(data, dtype=np.uint8)
            hist[i] = np.bincount(arr % _N_BUCKETS, minlength=_N_BUCKETS)
    denom = np.maximum(sizes, 1).astype(np.float64)
    return sizes, hist / denom[:, None]


def _feature_batches(batches: Iterator, kind: str, decode_stub: bool):
    import pandas as pd

    decode = None if decode_stub else _real_decoder()
    for batch in batches:
        item_ids = [int(i) for i in batch["item_id"]]
        payloads = list(batch["payload"])
        if decode_stub:
            sizes, feats = _stub_features(payloads)
            yield pd.DataFrame(
                {
                    "item_id": item_ids,
                    "n_bytes": sizes,
                    "kind": kind,
                    "ok": sizes > 0,
                    "feature": [f.tolist() for f in feats],
                    "note": ["stub-decode" if s else "empty payload" for s in sizes],
                }
            )
        else:
            rows = {k: [] for k in ("item_id", "n_bytes", "kind", "ok", "feature", "note")}
            for item_id, payload in zip(item_ids, payloads):
                data = bytes(payload) if payload is not None else b""
                rows["item_id"].append(item_id)
                rows["n_bytes"].append(len(data))
                rows["kind"].append(kind)
                try:
                    rows["feature"].append(decode(data) if data else [0.0] * _N_BUCKETS)
                    rows["ok"].append(bool(data))
                    rows["note"].append("decoded" if data else "empty payload")
                except Exception as exc:  # per-item isolation: bad codecs
                    rows["feature"].append([0.0] * _N_BUCKETS)
                    rows["ok"].append(False)
                    rows["note"].append(f"{type(exc).__name__}: {exc}"[:200])
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
