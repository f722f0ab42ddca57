"""Table-cell grid construction and table-cell <-> pdf-cell matching.

Coordinate systems (reference contract, tf_cell_matcher.py:88-99):

- *Page* system: origin at the lower-left corner, y grows upward;
  bbox = (x1, y1, x2, y2) = (lower-left, upper-right).
- *Table* (model output) system: origin at the upper-left corner, y grows
  downward; coordinates normalized to the table crop.

Parity with ``tableformer-docling/.../data_management/tf_cell_matcher.py``
(build 368-418, translate 420-463, intersection match 465-527, predicate
56-81) and ``tf_predictor.py`` (bbox/tag desync repair 228-278) is pinned
by ``tests/test_cells.py`` against the cell_matching golden fixture.
"""

from __future__ import annotations

import re

import numpy as np

from .otsl import CELL_TAGS, html_to_otsl

# Tags that consume a bbox / produce a structural cell in OTSL mode.
# parity: xcel is included (tf_cell_matcher.py:382) even though it is a
# span filler — spans recorded by html-cell index therefore drift after
# an xcel; that drift is reference behavior and must be preserved.
GRID_CELL_TAGS = ("fcel", "ecel", "xcel", "ched", "rhed", "srow")
_GRID_CELL_TAG_SET = frozenset(GRID_CELL_TAGS)  # hot-loop membership

# count_expected_cells increments: the html markers and the raw OTSL cell
# tags are disjoint token sets, so one lookup covers both branches.
_CELL_COUNT_INC = {"<td>": 1, ">": 1}
_CELL_COUNT_INC.update({t: 1 for t in CELL_TAGS})

# HTML-mode cell labels (tf_cell_matcher.py:19-24).
BODY = "body"
COL_HEADER = "col_header"

# Span-count extraction, the reference's exact pattern
# (tf_cell_matcher.py:324,328).
_SPAN_COUNT_RE = re.compile(r'"([^"]*)"')


def translate_bboxes(table_bbox, cell_bboxes):
    """Map normalized table-system cell bboxes into page coordinates.

    Vectorized affine + y-flip + column permute, matching the reference
    op-for-op so float results are bit-identical
    (tf_cell_matcher.py:420-463).
    """
    x1, y1, x2, y2 = table_bbox[0], table_bbox[1], table_bbox[2], table_bbox[3]
    width = x2 - x1
    height = y2 - y1
    b = np.asarray(cell_bboxes)
    offset = np.asarray([x1, y2, x1, y2])
    scale = np.asarray([width, -height, width, -height])
    flipped = offset + scale * b
    permuted = flipped[:, [0, 3, 2, 1]]
    rows = permuted.tolist()
    return [
        [r[0], y2 - r[3] + y1, r[2], y2 - r[1] + y1]
        for r in rows
    ]


def build_table_cells(html_seq, otsl_seq, bboxes_page, classes):
    """Walk the OTSL stream and emit one structural cell per cell tag.

    Row/column indices track the grid position; span values come from the
    HTML->OTSL span map computed on ``html_seq``
    (tf_cell_matcher.py:236-269, 368-418).
    """
    ok, parsed = html_to_otsl(html_seq)
    spans = parsed["spans"] if ok else {}

    cells = []
    cell_id = 0
    row_id = 0
    col_id = 0
    n_bboxes = len(bboxes_page)
    n_classes = len(classes)
    for tag in otsl_seq:
        if tag == "nl":
            row_id += 1
            col_id = 0
            continue
        if tag in _GRID_CELL_TAG_SET:
            bbox = bboxes_page[cell_id] if cell_id < n_bboxes else [0.0, 0.0, 0.0, 0.0]
            cell_class = classes[cell_id] if cell_id < n_classes else 2
            cell = {
                "cell_id": cell_id,
                "row_id": row_id,
                "column_id": col_id,
                "bbox": bbox,
                "cell_class": cell_class,
                "label": tag,
                "multicol_tag": "",
            }
            span = spans.get(cell_id)
            if span is not None:
                if span[0] > 0:
                    cell["colspan_val"] = span[0]
                if span[1] > 0:
                    cell["rowspan_val"] = span[1]
            cells.append(cell)
            cell_id += 1
        col_id += 1
    return cells


def build_table_cells_html(html_seq, bboxes_page, classes):
    """HTML-mode structural-cell builder (D10).

    The reference ships this state machine but never executes it: the
    mode switch is hardcoded to OTSL (``mode = "OTSL"``,
    tf_cell_matcher.py:284). Re-expressed here for operator-inventory
    completeness, behavior-equal to the dormant branch
    (tf_cell_matcher.py:285-366):

    - one cell is emitted per closing ``</td>``, consuming the bbox and
      class at the running ``cell_id`` (bboxes assumed td-synchronized);
    - ``row_id``/``column_id`` start at -1; ``<tr>`` advances the row and
      resets the column, ``<td>``/``<td`` advances the column;
    - after emitting a colspan cell, ``column_id`` shifts by colspan-1;
    - ``multicol_tag`` accumulates ``<td`` + span tokens + ``</td>``.

    parity: the reference resets its ``label`` variable at the top of
    every token iteration, so the MULTI_COL/MULTI_ROW labels assigned on
    span tokens (tf_cell_matcher.py:321-327) can never survive to the
    ``</td>`` emission — emitted labels are only ``col_header`` (inside
    <thead>), ``body`` (inside <tbody>) or None. That dead assignment is
    reference behavior; the emission-visible labels here match it.
    """
    cells = []
    cell_id = 0
    row_id = -1
    column_id = -1
    in_header = False
    in_body = False
    multicol_tag = ""
    colspan_val = 0
    rowspan_val = 0
    for tag in html_seq:
        if tag in ("<thead>", "</thead>", "<tbody>", "</tbody>"):
            if tag == "<thead>":
                in_header = True
            elif tag == "</thead>":
                in_header = False
            elif tag == "<tbody>":
                in_body = True
            else:
                in_body = False
            multicol_tag = ""
            colspan_val = 0
            rowspan_val = 0
        elif tag == "<td>" or tag == "<td":
            column_id += 1
            multicol_tag = "<td" if tag == "<td" else ""
            colspan_val = 0
            rowspan_val = 0
        elif tag == "<tr>":
            row_id += 1
            column_id = -1
            multicol_tag = ""
            colspan_val = 0
            rowspan_val = 0
        elif "colspan" in tag:
            multicol_tag += tag
            colspan_val = int(_SPAN_COUNT_RE.findall(tag)[0])
        elif "rowspan" in tag:
            multicol_tag += tag
            rowspan_val = int(_SPAN_COUNT_RE.findall(tag)[0])
        elif tag == "</td>":
            if multicol_tag:
                multicol_tag += tag
            if in_header:
                label = COL_HEADER
            elif in_body:
                label = BODY
            else:
                label = None
            assert cell_id < len(bboxes_page), (
                "Mismatching bboxes with closing TDs {} < {}".format(
                    cell_id, len(bboxes_page)
                )
            )
            cell = {
                "cell_id": cell_id,
                "row_id": row_id,
                "column_id": column_id,
                "bbox": bboxes_page[cell_id],
                "cell_class": classes[cell_id],
                "label": label,
                "multicol_tag": multicol_tag,
            }
            if colspan_val > 0:
                cell["colspan_val"] = colspan_val
                column_id += colspan_val - 1
            if rowspan_val > 0:
                cell["rowspan_val"] = rowspan_val
            cells.append(cell)
            cell_id += 1
    return cells


def bbox_intersection(b1, b2):
    """Intersection bbox of two page-system bboxes, or None.

    parity: the reference's no-overlap predicate contains a self-compare
    (``b2[1] > b2[3]``, tf_cell_matcher.py:72) instead of ``b2[1] > b1[3]``;
    the miss is harmless (the resulting negative-height intersection has
    negative area and is filtered downstream) but is reproduced verbatim
    so intermediate values match.
    """
    if b1[2] < b2[0] or b2[2] < b1[0] or b1[1] > b2[3] or b2[1] > b2[3]:
        return None
    return [
        max(b1[0], b2[0]),
        max(b1[1], b2[1]),
        min(b1[2], b2[2]),
        min(b1[3], b2[3]),
    ]


def intersection_over_pdf_match(table_cells, pdf_cells):
    """Pair every table cell with every pdf cell; score by
    intersection-area / pdf-cell-area; keep positive scores; drop exact
    duplicate matches (tf_cell_matcher.py:465-527).

    Returns ``(matches, counter)`` where matches maps pdf_cell_id (native
    key type) -> list of ``{"table_cell_id", "iopdf"}``.

    This is the reference's J1 theta join.  At Spark level the outer
    parallelism is per turn; within a turn the candidate sets are tiny
    (<= a few hundred), so the quadratic pairing stays in numpy/python.
    """
    if not pdf_cells or not table_cells:
        return {}, 0
    pdf_boxes = np.asarray([p["bbox"] for p in pdf_cells], dtype=np.float64)
    pdf_areas = (pdf_boxes[:, 2] - pdf_boxes[:, 0]) * (pdf_boxes[:, 3] - pdf_boxes[:, 1])
    cell_boxes = np.asarray([c["bbox"] for c in table_cells], dtype=np.float64)

    # Vectorized pairwise pass (the "numpy outer product" form of the
    # per-turn nested loop — same float expressions, same order, so the
    # scores are bit-identical to the scalar reference).
    tx1, ty1 = cell_boxes[:, 0:1], cell_boxes[:, 1:2]
    tx2, ty2 = cell_boxes[:, 2:3], cell_boxes[:, 3:4]
    px1, py1 = pdf_boxes[:, 0], pdf_boxes[:, 1]
    px2, py2 = pdf_boxes[:, 2], pdf_boxes[:, 3]

    # parity: the reference's no-overlap predicate self-compares the pdf
    # bbox in its last clause (b2[1] > b2[3], tf_cell_matcher.py:72)
    separated = (tx2 < px1) | (px2 < tx1) | (ty1 > py2) | (py1 > py2)
    inter_w = np.minimum(tx2, px2) - np.maximum(tx1, px1)
    inter_h = np.minimum(ty2, py2) - np.maximum(ty1, py1)
    inter_area = inter_w * inter_h
    if (pdf_areas > 0).all():
        iopdf = inter_area / pdf_areas
    else:
        with np.errstate(divide="ignore", invalid="ignore"):
            iopdf = np.where(pdf_areas > 0, inter_area / pdf_areas, 0.0)
    keep = (~separated) & (iopdf > 0)

    matches = {}
    counter = 0
    cell_idx, pdf_idx = np.nonzero(keep)
    scores = iopdf[cell_idx, pdf_idx].tolist()
    pdf_ids = [p["id"] for p in pdf_cells]
    cell_ids = [c["cell_id"] for c in table_cells]
    for i, j, score in zip(cell_idx.tolist(), pdf_idx.tolist(), scores):
        p_id = pdf_ids[j]
        match = {"table_cell_id": cell_ids[i], "iopdf": score}
        existing = matches.get(p_id)
        if existing is None:
            matches[p_id] = [match]
            counter += 1
        elif match not in existing:
            existing.append(match)
            counter += 1
    return matches, counter


def normalize_pdf_cells(pdf_cells):
    """Coerce ``{l,t,r,b}`` dict bboxes to ``[l,t,r,b]`` lists
    (tf_cell_matcher.py:129-140)."""
    out = []
    for cell in pdf_cells:
        cell = dict(cell)
        bbox = cell["bbox"]
        if isinstance(bbox, dict):
            cell["bbox"] = [bbox["l"], bbox["t"], bbox["r"], bbox["b"]]
        out.append(cell)
    return out


def count_expected_cells(html_seq):
    """Count cell-producing tokens in an HTML structure stream.

    ``<td>`` and the ``>`` that closes a split spanned cell each stand for
    one cell; raw OTSL cell tags are also counted because
    ``otsl_to_html`` passes non-OTSL-led streams through unchanged
    (tf_predictor.py:255-272).
    """
    inc = _CELL_COUNT_INC
    count = 0
    for tok in html_seq:
        if tok in inc:
            count += 1
    return count


def repair_bbox_desync(html_seq, bboxes):
    """Drop one bbox after each spanned cell when bboxes outnumber cells.

    Reference D4 (tf_predictor.py:228-253): walking the HTML stream, a
    counter advances on ``<td>`` and ``>``; every ``>`` marks the *next*
    bbox index for deletion.
    """
    cursor = 0
    doomed = set()
    for tok in html_seq:
        if tok == "<td>":
            cursor += 1
        if tok == ">":
            cursor += 1
            doomed.add(cursor)
    return [b for i, b in enumerate(bboxes) if i not in doomed]


def check_bbox_sync(html_seq, bboxes):
    """Return ``(in_sync, possibly_repaired_bboxes)``
    (tf_predictor.py:255-278)."""
    expected = count_expected_cells(html_seq)
    if len(bboxes) != expected:
        return False, repair_bbox_desync(html_seq, bboxes)
    return True, list(bboxes)


def iou_match(table_cells, pdf_cells, iou_threshold: float = 0.05):
    """J2: the alternative IoU matcher — pair score is
    intersection / union, kept when >= ``iou_threshold``
    (tf_cell_matcher.py:529-605; present but unused in the reference's
    main path, exposed for API completeness).

    Returns ``(matches, counter)`` with match entries
    ``{"table_cell_id", "iou", "text"}``.
    """
    if not pdf_cells or not table_cells:
        return {}, 0
    cell_boxes = np.asarray([c["bbox"] for c in table_cells], dtype=np.float64)
    pdf_boxes = np.asarray([p["bbox"] for p in pdf_cells], dtype=np.float64)
    cell_areas = (cell_boxes[:, 2] - cell_boxes[:, 0]) * (cell_boxes[:, 3] - cell_boxes[:, 1])
    pdf_areas = (pdf_boxes[:, 2] - pdf_boxes[:, 0]) * (pdf_boxes[:, 3] - pdf_boxes[:, 1])

    matches = {}
    counter = 0
    for i, cell in enumerate(table_cells):
        for j, pdf_cell in enumerate(pdf_cells):
            inter = bbox_intersection(cell["bbox"], pdf_cell["bbox"])
            if inter is None:
                continue
            inter_area = (inter[2] - inter[0]) * (inter[3] - inter[1])
            union = float(cell_areas[i] + pdf_areas[j] - inter_area)
            iou = inter_area / union if union > 0 else 0
            if iou < iou_threshold:
                continue
            matches.setdefault(pdf_cell["id"], []).append(
                {
                    "table_cell_id": cell["cell_id"],
                    "iou": iou,
                    "text": pdf_cell["text"],
                }
            )
            counter += 1
    return matches, counter


def page_to_table_coords(bbox, table_bbox, im_width, im_height):
    """Transform a page-system bbox into table-image pixel coordinates
    (corner flip + offset + rescale; tf_predictor.py:280-322)."""
    t_x1, t_y1, t_x2, t_y2 = table_bbox[0], table_bbox[1], table_bbox[2], table_bbox[3]
    width = t_x2 - t_x1
    height = t_y2 - t_y1
    return [
        im_width * (bbox[0] - t_x1) / width,
        im_height * (t_y2 - bbox[3]) / height,
        im_width * (bbox[2] - t_x1) / width,
        im_height * (t_y2 - bbox[1]) / height,
    ]


def depad_bboxes(bboxes, new_image_ratio):
    """Undo prediction-time padding: rescale normalized bboxes around the
    image center and clip to [0, 1] (tf_predictor.py:324-376; active only
    when predict.padding is enabled)."""
    out = []
    for bbox in bboxes:
        centered = [bbox[0] - 0.5, bbox[1] - 0.5, bbox[2] - 0.5, bbox[3] - 0.5]
        scaled = [v * new_image_ratio + 0.5 for v in centered]
        out.append([float(np.clip(v, 0.0, 1.0)) for v in scaled])
    return out
