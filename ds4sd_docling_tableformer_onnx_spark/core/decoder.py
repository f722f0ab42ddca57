"""Deterministic surrogate of the autoregressive tag decoder (D1-D3).

The reference's decode loop (tablemodel04_rs.py:110-328) interleaves
neural steps (transformer decoder + argmax; bbox decoder) with
*deterministic bookkeeping*:

- grammar corrections on the argmax stream (D1),
- bbox-emission bookkeeping: which decode steps contribute a bbox, and
  which bbox pairs bracket a horizontal span (D2),
- the span merge that collapses each bracket to one box (D3).

This module implements the deterministic part over a *given* raw tag
stream — exactly how the reference's own export chain replays persisted
neural outputs without re-running the model
(scripts/export_tableformer_sequence_decoding.py:110-117).  A real
model plugs in by supplying the raw stream; everything downstream is
shared.

parity quirks preserved:
- ``line_num`` in the reference is initialized to 0 and never
  incremented (tablemodel04_rs.py:170,200-202), so the "first line"
  xcel->lcel correction applies to the WHOLE stream: a decoded sequence
  can never contain ``xcel``;
- a ``ucel`` followed by a decoded ``lcel`` becomes ``fcel``;
- an unterminated span leaves its merge partner at -1, which python
  indexing resolves to the *last* emitted bbox.
"""

from __future__ import annotations

from ..config import WORD_MAP_TAG

# tags whose decode step emits a bbox feature (when not skipped)
_BBOX_TAGS = frozenset(
    WORD_MAP_TAG[t] for t in ("fcel", "ecel", "ched", "rhed", "srow", "nl", "ucel")
)
_SKIP_AFTER = frozenset(WORD_MAP_TAG[t] for t in ("nl", "ucel", "xcel"))


def decode_tag_stream(raw_tags, max_steps: int = 1024):
    """Apply grammar corrections + bbox bookkeeping to a raw argmax
    stream.

    ``raw_tags``: tag ids as the model would emit them step by step
    (without the leading ``<start>``).

    Returns ``(seq, emit_steps, merge_map)`` where

    - ``seq`` is the corrected sequence *including* <start>/<end>
      sentinels (the reference's ``decoded_tags``),
    - ``emit_steps`` lists, per emitted bbox, the 0-based output position
      whose hidden state produced it,
    - ``merge_map`` maps span-start bbox index -> span-end bbox index
      (-1 when the span never terminated).
    """
    end_id = WORD_MAP_TAG["<end>"]
    lcel_id = WORD_MAP_TAG["lcel"]
    xcel_id = WORD_MAP_TAG["xcel"]
    fcel_id = WORD_MAP_TAG["fcel"]
    ucel_id = WORD_MAP_TAG["ucel"]

    output = []
    emit_steps = []
    merge_map = {}
    skip_next = True  # the first decoded tag never emits a bbox
    prev_ucel = False
    first_lcel = True
    open_span_start = -1
    bbox_ind = 0

    cursor = 0
    while len(output) < max_steps and cursor < len(raw_tags):
        tag = raw_tags[cursor]
        cursor += 1

        # D1 grammar corrections (parity: applies to every line)
        if tag == xcel_id:
            tag = lcel_id
        if prev_ucel and tag == lcel_id:
            tag = fcel_id

        if tag == end_id:
            output.append(tag)
            break
        output.append(tag)
        step = len(output) - 1

        # D2: bbox emission for cell-ish tags, unless suppressed
        if not skip_next and tag in _BBOX_TAGS:
            emit_steps.append(step)
            if not first_lcel:
                merge_map[open_span_start] = bbox_ind  # close the span
            bbox_ind += 1

        # D2: span-start emission on the first lcel of a run
        if tag != lcel_id:
            first_lcel = True
        elif first_lcel:
            emit_steps.append(step)
            first_lcel = False
            open_span_start = bbox_ind
            merge_map[open_span_start] = -1
            bbox_ind += 1

        skip_next = tag in _SKIP_AFTER
        prev_ucel = tag == ucel_id

    seq = [WORD_MAP_TAG["<start>"], *output]
    return seq, emit_steps, merge_map


def merge_span_bboxes(boxes_cxcywh, classes, merge_map):
    """D3: collapse each span's (start, end) bbox pair into one box.

    ``boxes_cxcywh``: one [cx, cy, w, h] per emitted bbox, in emission
    order.  Mirrors tablemodel04_rs.py:97-108 (mergebboxes) and 287-319
    (skip logic).  Returns (merged_boxes, merged_classes).
    """
    merged_boxes = []
    merged_classes = []
    skip = set()
    for i, box in enumerate(boxes_cxcywh):
        if i in merge_map:
            partner = boxes_cxcywh[merge_map[i]]
            skip.add(merge_map[i])
            merged_boxes.append(_merge_cxcywh(box, partner))
            merged_classes.append(classes[i])
        elif i not in skip:
            merged_boxes.append(list(box))
            merged_classes.append(classes[i])
    return merged_boxes, merged_classes


def _merge_cxcywh(box1, box2):
    """Horizontal-span merge in center format
    (tablemodel04_rs.py:97-108)."""
    new_w = (box2[0] + box2[2] / 2) - (box1[0] - box1[2] / 2)
    new_h = (box2[1] + box2[3] / 2) - (box1[1] - box1[3] / 2)
    new_left = box1[0] - box1[2] / 2
    new_top = min(box2[1] - box2[3] / 2, box1[1] - box1[3] / 2)
    return [new_left + new_w / 2, new_top + new_h / 2, new_w, new_h]


def cxcywh_to_xyxy(box):
    """Center to corner format (utils.py:207-210)."""
    cx, cy, w, h = box
    return [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]


def surrogate_predict(raw_tags, raw_boxes_cxcywh, raw_classes, max_steps: int = 1024):
    """Full surrogate of ``TableModel04_rs.predict`` minus the neural
    net: corrected tag sequence + merged xyxy bboxes + classes.

    ``raw_boxes_cxcywh``/``raw_classes`` supply one entry per *emitted*
    bbox slot (what the bbox decoder would produce for the buffered
    hidden states).
    """
    seq, emit_steps, merge_map = decode_tag_stream(raw_tags, max_steps)
    boxes = [
        list(raw_boxes_cxcywh[i]) if i < len(raw_boxes_cxcywh) else [0.0, 0.0, 0.0, 0.0]
        for i in range(len(emit_steps))
    ]
    classes = [
        raw_classes[i] if i < len(raw_classes) else 2 for i in range(len(emit_steps))
    ]
    merged_boxes, merged_classes = merge_span_bboxes(boxes, classes, merge_map)
    return {
        "tag_seq": seq,
        "bboxes": [cxcywh_to_xyxy(b) for b in merged_boxes],
        "classes": list(merged_classes),
    }
