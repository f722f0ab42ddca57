"""Drop-in per-page API mirroring the reference's library surface.

The reference's entry point is ``TableFormerDocling.predict_page(image,
table_bboxes, tokens, ...)`` (tableformer_docling/predictor.py:85-123)
backed by ``TFPredictor.multi_table_predict`` — which also supports a
*replay* mode where decoder outputs are supplied instead of running the
model (``eval_res_preds``, tf_predictor.py:617-620/744-748; the staged
export chain is built on it).  This class exposes exactly that surface:

- with ``predictions`` per table (tag_seq/bboxes/classes, or a raw
  decoder stream), behavior matches the reference bit-for-bit
  (tests/test_pipeline_core.py);
- matching auto-disables when no ``tokens`` are given, like the
  reference;
- ``prepare_inputs`` runs the real P1-P3 preprocessing so a model
  session (ONNX/torch) can be dropped in front without touching
  anything else.

For corpus-scale work use ``operators.extract.extract_transcripts`` —
this class is the single-page convenience layer.
"""

from __future__ import annotations

from .core.imaging import prepare_table_tensor
from .core.pipeline import extract_turn

_IMAGE_NORM = {
    "mean": [0.94247851, 0.94254675, 0.94292611],
    "std": [0.17910956, 0.17940403, 0.17931663],
}


class TableFormerSparkEngine:
    """Per-page replay-mode predictor (no Spark session required)."""

    def __init__(self, correct_overlapping_cells: bool = False):
        self._correct_overlapping_cells = correct_overlapping_cells

    def prepare_inputs(self, page_image, table_bboxes):
        """P1-P3: per-table model-input tensors + crop metadata."""
        return [
            prepare_table_tensor(
                page_image, bbox, _IMAGE_NORM["mean"], _IMAGE_NORM["std"]
            )
            for bbox in table_bboxes
        ]

    def predict_page(
        self,
        predictions,
        table_bboxes,
        page_width,
        page_height,
        tokens=None,
        sort_row_col_indexes: bool = True,
    ):
        """One page -> list of ``{tf_responses, predict_details}`` per
        table (multi_table_predict shape, tf_predictor.py:466-583).

        ``predictions``: one dict per table — either decoded
        (``tag_seq``/``bboxes``/``classes``) or a raw stream
        (``raw_tags``/``raw_bboxes``/``raw_classes``).
        """
        out = []
        for prediction, bbox in zip(predictions, table_bboxes):
            payload = dict(prediction)
            payload.update(
                {
                    "table_bbox": list(bbox),
                    "page_width": page_width,
                    "page_height": page_height,
                    "pdf_cells": tokens or [],
                }
            )
            result = extract_turn(
                payload,
                correct_overlapping_cells=self._correct_overlapping_cells,
                sort_row_col_indexes=sort_row_col_indexes,
            )
            out.append(
                {
                    "tf_responses": result["tf_responses"],
                    "predict_details": {
                        "num_cols": result["num_cols"],
                        "num_rows": result["num_rows"],
                        "prediction": {
                            "rs_seq": result["rs_seq"],
                            "html_seq": result["html_seq"],
                        },
                        "bbox_sync": result["bbox_sync"],
                        "n_cells": result["n_cells"],
                        "n_matches": result["n_matches"],
                    },
                }
            )
        return out

    def predict_page_from_image(
        self,
        page_image,
        table_bboxes=None,
        tokens=None,
        predictor=None,
        sort_row_col_indexes: bool = True,
    ):
        """The reference's full entry signature: page image in, cell
        grids out (tableformer_docling/predictor.py:85-123 — table bbox
        defaults to the whole page; matching auto-disables without
        tokens).

        The neural stage comes from ``predictor(tensor) ->
        {tag_seq, bboxes, classes}``: the config-gated live ONNX decoder
        (operators/realmodel.py) when not supplied, or any injected
        callable (tests use a deterministic fixture replayer).  P1-P3
        preprocessing is the real fixture-exact path either way.
        """
        height, width = page_image.shape[:2]
        if table_bboxes is None:
            table_bboxes = [[0.0, 0.0, float(width), float(height)]]
        if predictor is None:
            from .operators.realmodel import load_onnx_decoder

            predictor = load_onnx_decoder()
        prepared = self.prepare_inputs(page_image, table_bboxes)
        predictions = [predictor(p["tensor"]) for p in prepared]
        return self.predict_page(
            predictions,
            table_bboxes,
            page_width=width,
            page_height=height,
            tokens=tokens,
            sort_row_col_indexes=sort_row_col_indexes,
        )
