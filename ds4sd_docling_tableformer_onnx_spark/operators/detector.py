"""Layout-detector inference (N6, "heron" branch) behind a config gate.

Behavioral re-expression of the reference's layout-detection entry
points (``infer_baseline.py:36-67``: model forward -> DETR-style
post-process -> score threshold 0.25 (P8) -> score-descending id
assignment (W5); ONNX path ``infer_onnx.py``).  The quality gates that
judge these detections are in ``operators/quality.py`` (A12).

Split like operators/realmodel.py so the deterministic 90% is testable
without the runtime:

- ``detr_postprocess`` — pure numpy: class softmax (last class =
  no-object), score threshold, cxcywh->xyxy denormalization to page
  pixels, argsort(-score) with sequential detection ids.
- ``load_onnx_layout_detector`` — binds a single-graph onnxruntime
  session (``pixel_values -> logits, pred_boxes``); missing runtime or
  weights raise ``NotImplementedError`` (none ship in this container).
- ``detect_layout`` — the Spark operator: one ``mapInPandas`` stage
  over (image_id, image, height, width) rows emitting one row per
  detection.  ``predict_fn`` injects a deterministic fake in tests; the
  default is the gated per-worker ONNX session (broadcast-weights
  pattern).
"""

from __future__ import annotations

import os
from typing import Iterator

SCORE_MIN = 0.25  # infer_baseline.py:54-56 / validate_quality.py:43-45

DETECTION_SCHEMA = (
    "image_id long, det_id int, label int, score double, "
    "x0 double, y0 double, x1 double, y1 double"
)


def detr_postprocess(logits, pred_boxes, width, height, score_min: float = SCORE_MIN):
    """(queries, n_classes+1) logits + (queries, 4) normalized cxcywh
    boxes -> thresholded, score-descending detections in page pixels.

    Mirrors HF ``post_process_object_detection`` (softmax over classes,
    last index is the no-object slot) followed by the reference's
    threshold + ``np.argsort(-scores)`` id assignment
    (infer_baseline.py:54-67).  Returns (labels, scores, boxes_xyxy) in
    detection-id order.
    """
    import numpy as np

    logits = np.asarray(logits, dtype=np.float64)
    pred_boxes = np.asarray(pred_boxes, dtype=np.float64)
    shifted = logits - logits.max(axis=-1, keepdims=True)
    probs = np.exp(shifted)
    probs = probs / probs.sum(axis=-1, keepdims=True)
    class_probs = probs[:, :-1]  # drop the no-object slot
    scores = class_probs.max(axis=-1)
    labels = class_probs.argmax(axis=-1)

    keep = scores > score_min
    scores, labels, boxes = scores[keep], labels[keep], pred_boxes[keep]
    order = np.argsort(-scores, kind="stable")
    scores, labels, boxes = scores[order], labels[order], boxes[order]

    cx, cy, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    xyxy = np.stack(
        [
            (cx - w / 2) * width,
            (cy - h / 2) * height,
            (cx + w / 2) * width,
            (cy + h / 2) * height,
        ],
        axis=1,
    )
    return labels.astype(int), scores, xyxy


def load_onnx_layout_detector(model_path: str | None = None, score_min: float = SCORE_MIN):
    """Config-gated onnxruntime binding (single graph:
    ``pixel_values f32[1,3,H,W] -> logits, pred_boxes``; the
    convert_to_onnx.py export shape).  Gate order matches
    operators/realmodel.py: unset path, missing runtime, missing file
    each raise a clear ``NotImplementedError``."""
    model_path = model_path or os.environ.get("SPARK_GRAFT_LAYOUT_ONNX")
    if not model_path:
        raise NotImplementedError(
            "layout detection is config-gated: set SPARK_GRAFT_LAYOUT_ONNX "
            "to the exported detector graph"
        )
    try:
        import onnxruntime as ort

        if not callable(getattr(ort, "InferenceSession", None)):
            raise ImportError("onnxruntime lacks InferenceSession")
    except ImportError as exc:
        raise NotImplementedError(
            "layout detection requires onnxruntime; not present in this "
            "container — inject predict_fn or use the quality gates on "
            "precomputed detections"
        ) from exc
    if not os.path.exists(model_path):
        raise NotImplementedError(f"detector graph missing: {model_path}")

    session = ort.InferenceSession(model_path, providers=["CPUExecutionProvider"])

    def predict(pixels, width, height):
        logits, pred_boxes = session.run(None, {"pixel_values": pixels})
        return detr_postprocess(logits[0], pred_boxes[0], width, height, score_min)

    return predict


def _detection_batches(batches: Iterator, predict_fn):
    import numpy as np
    import pandas as pd

    predict = predict_fn or load_onnx_layout_detector()
    for batch in batches:
        rows = {k: [] for k in ("image_id", "det_id", "label", "score",
                                "x0", "y0", "x1", "y1")}
        for image_id, payload, height, width in zip(
            batch["image_id"], batch["image"], batch["height"], batch["width"]
        ):
            height, width = int(height), int(width)
            img = np.frombuffer(bytes(payload), dtype=np.uint8)
            img = img.reshape(height, width, 3)
            pixels = (img.astype(np.float32) / 255.0).transpose(2, 0, 1)[None]
            labels, scores, boxes = predict(pixels, width, height)
            for det_id, (label, score, box) in enumerate(zip(labels, scores, boxes)):
                rows["image_id"].append(int(image_id))
                rows["det_id"].append(det_id)  # W5: ids in score-desc order
                rows["label"].append(int(label))
                rows["score"].append(float(score))
                for key, val in zip(("x0", "y0", "x1", "y1"), box):
                    rows[key].append(float(val))
        yield pd.DataFrame(rows)


def detect_layout(df, predict_fn=None):
    """(image_id, image binary RGB, height, width) -> one row per
    detection, ids score-descending per image.  Narrow mapInPandas
    stage; the session (or injected ``predict_fn``) initializes once per
    python worker."""
    pruned = df.select("image_id", "image", "height", "width")
    return pruned.mapInPandas(
        lambda it: _detection_batches(it, predict_fn), schema=DETECTION_SCHEMA
    )
