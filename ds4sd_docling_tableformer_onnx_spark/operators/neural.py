"""Neural-stage scaffolding: page image -> model-input tensor (P1-P3)
with executor-cached artifacts (S5), plus the deterministic surrogate
decoder hook (D1-D3).

The reference loads model weights once per process under an init lock
(tf_predictor.py:40,176-216); the Spark equivalent is a module-level
lazy singleton inside the UDF — one initialization per executor python
worker, reused across all Arrow batches.  The actual TableFormer weights
are not shipped in this environment, so the "model" here is the
deterministic surrogate (``core.decoder``); a real ONNX session drops
into ``_Artifacts.predictor`` without touching the Spark plumbing.
"""

from __future__ import annotations

from typing import Iterator

TENSOR_META_SCHEMA = (
    "item_id long, ok boolean, err string, "
    "scale_factor double, rounded_bbox array<int>, "
    "crop_sha256 string, tensor_sha256 string, "
    "tensor_mean double, tensor_std double, tensor_min double, tensor_max double"
)


class _Artifacts:
    """Per-executor lazy singleton (the broadcast-weights pattern).

    The live neural stage sits behind ``get_predictor()``, loaded (and
    cached) only when a decode stage actually asks for it — stages that
    never decode (tensor prep, feature extraction) must not couple to
    decoder availability, so construction itself never touches the
    SPARK_GRAFT_ONNX_DIR gate."""

    _instance = None

    def __init__(self):
        from ..config import WORD_MAP_TAG

        self.mean = [0.94247851, 0.94254675, 0.94292611]
        self.std = [0.17910956, 0.17940403, 0.17931663]
        self.word_map = WORD_MAP_TAG
        self._predictor = None

    def get_predictor(self):
        """The config-gated live ONNX decoder (operators/realmodel.py;
        reference lifecycle tf_predictor.py:705-843), one load per
        python worker.  Raises NotImplementedError when the gate is
        unset or the runtime/graphs are absent."""
        if self._predictor is None:
            from .realmodel import load_onnx_decoder

            self._predictor = load_onnx_decoder()
        return self._predictor

    @classmethod
    def get(cls):
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance


def _tensor_batches(batches: Iterator):
    import hashlib

    import numpy as np
    import pandas as pd

    from ..core.imaging import prepare_table_tensor

    artifacts = _Artifacts.get()  # once per worker, reused per batch
    for batch in batches:
        rows = {
            k: []
            for k in (
                "item_id", "ok", "err", "scale_factor", "rounded_bbox",
                "crop_sha256", "tensor_sha256", "tensor_mean", "tensor_std",
                "tensor_min", "tensor_max",
            )
        }
        for item_id, payload, height, width, bbox in zip(
            batch["item_id"], batch["image"], batch["height"], batch["width"],
            batch["table_bbox"],
        ):
            rows["item_id"].append(int(item_id))
            try:
                img = np.frombuffer(bytes(payload), dtype=np.uint8).reshape(
                    int(height), int(width), 3
                )
                out = prepare_table_tensor(img, list(bbox), artifacts.mean, artifacts.std)
                tensor = out["tensor"]
                rows["ok"].append(True)
                rows["err"].append(None)
                rows["scale_factor"].append(float(out["scale_factor"]))
                rows["rounded_bbox"].append(list(out["rounded_bbox"]))
                rows["crop_sha256"].append(
                    hashlib.sha256(out["crop"].tobytes()).hexdigest()
                )
                rows["tensor_sha256"].append(
                    hashlib.sha256(tensor.tobytes()).hexdigest()
                )
                rows["tensor_mean"].append(float(tensor.mean()))
                rows["tensor_std"].append(float(tensor.std()))
                rows["tensor_min"].append(float(tensor.min()))
                rows["tensor_max"].append(float(tensor.max()))
            except Exception as exc:
                rows["ok"].append(False)
                rows["err"].append(f"{type(exc).__name__}: {exc}"[:300])
                rows["scale_factor"].append(0.0)
                rows["rounded_bbox"].append([])
                for key in ("crop_sha256", "tensor_sha256"):
                    rows[key].append(None)
                for key in ("tensor_mean", "tensor_std", "tensor_min", "tensor_max"):
                    rows[key].append(0.0)
        yield pd.DataFrame(rows)


def prepare_tensors(df):
    """(item_id, image binary, height, width, table_bbox array<double>)
    -> tensor metadata.  Narrow mapInPandas stage; on a cluster the image
    bytes come from `spark.read.format("binaryFile")` or an Iceberg blob
    column (S1), and partition byte sizing keeps blobs in memory."""
    pruned = df.select("item_id", "image", "height", "width", "table_bbox")
    return pruned.mapInPandas(_tensor_batches, schema=TENSOR_META_SCHEMA)


DECODE_SCHEMA = (
    "item_id long, ok boolean, err string, "
    "tag_seq array<int>, n_boxes int, classes array<int>"
)


def _decode_batches(batches: Iterator, predict_fn):
    import numpy as np
    import pandas as pd

    from ..core.imaging import prepare_table_tensor

    artifacts = _Artifacts.get()
    predict = predict_fn or artifacts.get_predictor()
    for batch in batches:
        rows = {k: [] for k in ("item_id", "ok", "err", "tag_seq", "n_boxes", "classes")}
        for item_id, payload, height, width, bbox in zip(
            batch["item_id"], batch["image"], batch["height"], batch["width"],
            batch["table_bbox"],
        ):
            rows["item_id"].append(int(item_id))
            try:
                img = np.frombuffer(bytes(payload), dtype=np.uint8).reshape(
                    int(height), int(width), 3
                )
                out = prepare_table_tensor(
                    img, list(bbox), artifacts.mean, artifacts.std
                )
                decoded = predict(out["tensor"])
                rows["ok"].append(True)
                rows["err"].append(None)
                rows["tag_seq"].append([int(t) for t in decoded["tag_seq"]])
                rows["n_boxes"].append(len(decoded["bboxes"]))
                rows["classes"].append([int(c) for c in decoded["classes"]])
            except Exception as exc:
                rows["ok"].append(False)
                rows["err"].append(f"{type(exc).__name__}: {exc}"[:300])
                rows["tag_seq"].append([])
                rows["n_boxes"].append(0)
                rows["classes"].append([])
        yield pd.DataFrame(rows)


def decode_tables(df, predict_fn=None):
    """(item_id, image binary, height, width, table_bbox) -> live tag
    decode per table: P1-P3 tensor preparation feeding the neural stage
    — the config-gated onnxruntime greedy decoder by default
    (``_Artifacts.get_predictor``), or an injected ``predict_fn(tensor)
    -> {tag_seq, bboxes, classes}`` (the deterministic surrogate in
    tests).  One narrow mapInPandas stage; model sessions initialize
    once per python worker."""
    pruned = df.select("item_id", "image", "height", "width", "table_bbox")
    return pruned.mapInPandas(
        lambda it: _decode_batches(it, predict_fn), schema=DECODE_SCHEMA
    )


def read_image_directory(spark, path: str, glob: str = "*.png"):
    """S1: directory scan of images as binary payloads
    (run_tableformer_docling.py:42-48 re-expressed on the binaryFile
    source; decode happens inside the pandas UDF)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content", "length")
    )
