"""Matching post-processor: refine table-cell <-> pdf-cell matches.

Behavioral re-expression of the reference's 10-step pipeline
(``tableformer-docling/.../data_management/matching_post_processor.py``,
canonical step list at 1140-1190):

  -1. if no matches, generate intersection-over-pdf matches
   0. minimal grid dimensions (cols/rows/max cell id)
   1. good/bad cell split per column (good = has a match)
   2. column alignment (left/middle/right) from min-max deltas
   3. exact median x/y/width/height per column over good cells
   4. move bad cells to the column's median anchor
   5. re-run intersection matching on the fixed cells
   7. de-duplicate adjacent columns whose matched pdf-cell sets overlap
   8. final assignment: keep the max-iopdf match per pdf cell
   8a. align matched cell bboxes to their pdf cells (skip when >300 pdf cells)
   9. orphan pickup via row/column band joins
  10. (optional) push apart overlapping cell bboxes (skip when >300 cells)

Spark mapping: steps 0-3 are group-by aggregations (A1-A3), 4 a projected
rewrite (A4), 5 the J1 theta join, 7 an adjacent-column self-join (J8),
8 a max-by-per-key (A6), 9 interval/band joins (J5-J7).  At 100 TB scale
the *outer* parallelism is per turn inside ``applyInPandas``; within a
turn the candidate sets are tiny, so this stays as straight-line Python
over one turn's arrays.  Parity is pinned by
``tests/test_postprocess.py`` golden files generated from the reference
library.
"""

from __future__ import annotations

import statistics

from .cells import intersection_over_pdf_match


def drop_empty_text_cells(pdf_cells):
    """Remove pdf cells whose text is the empty string (reference P6)."""
    return [c for c in pdf_cells if c["text"] != ""]


def table_dimensions(table_cells):
    """(columns, rows, max_cell_id) of the minimal grid (step 0)."""
    columns = rows = 1
    max_cell_id = 0
    for cell in table_cells:
        col_id = cell["column_id"]
        if col_id > columns:
            columns = col_id
        row_id = cell["row_id"]
        if row_id > rows:
            rows = row_id
        cell_id = cell["cell_id"]
        if cell_id > max_cell_id:
            max_cell_id = cell_id
    return columns + 1, rows + 1, max_cell_id


def rematch(table_cells, pdf_cells):
    """Step 5: fresh intersection matches with pdf-cell keys stringified
    (parity with matching_post_processor.py:378-385 — the reference JSON
    round-trips the dict purely to turn the int keys into strings; string
    keys are part of the output contract).  Re-keying directly is
    value-identical (floats survive a JSON round-trip bit-exactly) and
    skips a serialize+parse per turn."""
    matches, _ = intersection_over_pdf_match(table_cells, pdf_cells)
    return {str(k): v for k, v in matches.items()}


def _match_counts(matches):
    """table_cell_id -> number of match entries across all pdf cells."""
    counts = {}
    for match_list in matches.values():
        for m in match_list:
            cid = m["table_cell_id"]
            counts[cid] = counts.get(cid, 0) + 1
    return counts


def split_good_bad_in_column(table_cells, column, matches, counts=None):
    """Step 1: cells in ``column`` with at least one match vs without.

    parity notes (matching_post_processor.py:61-112):
    - a cell with ``cell_class <= 1`` never collects matches (the
      reference's ``allow_class`` latch) and lands in the bad list;
    - a cell matched by k match entries is appended k times — the
      duplicates deliberately weight the column medians downstream.
    """
    if counts is None:
        counts = _match_counts(matches)
    good, bad = [], []
    for cell in table_cells:
        if cell["column_id"] != column:
            continue
        count = 0
        if cell.get("cell_class", 2) > 1:
            count = counts.get(cell["cell_id"], 0)
        if count:
            good.extend([cell] * count)
        else:
            bad.append(cell)
    return good, bad


def column_alignment(cells):
    """Step 2: smallest min-max delta of left/middle/right edges wins."""
    if not cells:
        return "left"
    lefts = [c["bbox"][0] for c in cells]
    rights = [c["bbox"][2] for c in cells]
    middles = [(left + right) / 2 for left, right in zip(lefts, rights)]
    deltas = [
        max(lefts) - min(lefts),
        max(middles) - min(middles),
        max(rights) - min(rights),
    ]
    return ("left", "middle", "right")[deltas.index(min(deltas))]


def column_medians(cells, alignment):
    """Step 3: exact medians of anchor-x, y, width, height over good,
    non-span, non-empty cells.  Exact ``statistics.median`` — never an
    approximate percentile — because parity depends on it (A3)."""
    xs, ys, ws, hs = [], [], [], []
    for cell in cells:
        if "rowspan_val" in cell or "colspan_val" in cell:
            continue
        if cell["cell_class"] <= 1:
            continue
        x1, y1, x2, y2 = cell["bbox"]
        anchor = x1
        if alignment == "middle":
            anchor = (x2 + x1) / 2
        elif alignment == "right":
            anchor = x2
        xs.append(anchor)
        ys.append(y1)
        ws.append(x2 - x1)
        hs.append(y2 - y1)
    return (
        statistics.median(xs) if xs else 0,
        statistics.median(ys) if ys else 0,
        statistics.median(ws) if ws else 1,
        statistics.median(hs) if hs else 1,
    )


def move_cells_to_anchor(cells, median_x, rescale, median_w, median_h, alignment):
    """Step 4: rewrite bad cells' bboxes onto the column's median anchor.

    ``rescale`` also snaps the cell size to the column median; the
    reference ships with rescale disabled
    (matching_post_processor.py:1263-1265) but the branch is kept."""
    out = []
    for cell in cells:
        x1, y1, x2, y2 = cell["bbox"]
        width = x2 - x1
        new_x1, new_y1, new_x2, new_y2 = median_x, y1, median_x + width, y2
        if rescale:
            new_x2 = median_x + median_w
            new_y2 = y1 + median_h
        if alignment == "middle":
            new_x1 = median_x - width / 2
            new_x2 = new_x1 + width
            if rescale:
                new_x1 = median_x - median_w / 2
                new_x2 = median_x + median_w / 2
        if alignment == "right":
            new_x1 = median_x - width
            new_x2 = median_x
            if rescale:
                new_x1 = median_x - median_w
        new_cell = {
            "bbox": [new_x1, new_y1, new_x2, new_y2],
            "cell_id": cell["cell_id"],
            "column_id": cell["column_id"],
            "label": cell["label"],
            "row_id": cell["row_id"],
            "cell_class": cell["cell_class"],
        }
        if "rowspan_val" in cell:
            new_cell["rowspan_val"] = cell["rowspan_val"]
        if "colspan_val" in cell:
            new_cell["colspan_val"] = cell["colspan_val"]
        out.append(new_cell)
    return out


def deduplicate_columns(tab_columns, table_cells, first_matches, ioc_matches):
    """Step 7: drop the weaker of two adjacent columns whose matched
    pdf-cell sets overlap by more than 60%.

    Scores: sum of iou/iopdf over both match sets per column (A5/SO2/J8).
    Returns (table_cells, matches, column_count) with eliminated columns'
    cells removed from ``ioc_matches``; surviving columns keep their ids
    (parity: the reference does NOT re-number ``column_id`` here).
    """
    # one pass over each match set, indexed by the cell's column; the
    # per-column pdf-id collections are only ever consumed as sets (the
    # original built lists and set-ified them), so sets are kept directly
    col_of_cell = {c["cell_id"]: c["column_id"] for c in table_cells}
    per_col_pdf_ids = [set() for _ in range(tab_columns)]
    per_col_score = [0.0] * tab_columns
    for key, match_list in first_matches.items():
        for m in match_list:
            col = col_of_cell.get(m["table_cell_id"])
            if col is not None and col < tab_columns:
                per_col_score[col] += m.get("iou", m.get("iopdf", 0))
                per_col_pdf_ids[col].add(int(key))
    for key, match_list in ioc_matches.items():
        for m in match_list:
            col = col_of_cell.get(m["table_cell_id"])
            if col is not None and col < tab_columns:
                per_col_score[col] += m["iopdf"]
                per_col_pdf_ids[col].add(int(key))

    doomed_cols = []
    for col in range(tab_columns - 1):
        a, b = per_col_pdf_ids[col], per_col_pdf_ids[col + 1]
        overlap = len(a & b) / len(a) if a else 0
        if overlap > 0.6:
            if per_col_score[col] >= per_col_score[col + 1]:
                doomed_cols.append(col + 1)
            else:
                doomed_cols.append(col)

    doomed_col_set = set(doomed_cols)
    doomed_cell_ids = set()
    kept_cells = []
    for cell in table_cells:
        if cell["column_id"] in doomed_col_set:
            doomed_cell_ids.add(cell["cell_id"])
        else:
            kept_cells.append(cell)

    kept_matches = {}
    for key, match_list in ioc_matches.items():
        kept = [m for m in match_list if m["table_cell_id"] not in doomed_cell_ids]
        if kept:
            kept_matches[key] = kept
    return kept_cells, kept_matches, tab_columns - len(doomed_cols)


def final_assignment(ioc_matches):
    """Step 8: per pdf cell keep the single match with max iopdf (A6);
    ties resolve to the first maximum, matching ``max``."""
    return {
        key: [max(match_list, key=lambda m: m["iopdf"])]
        for key, match_list in ioc_matches.items()
    }


def align_cells_to_pdf(table_cells, pdf_cells, matches):
    """Step 8a: snap matched table-cell bboxes onto their pdf cells; a
    cell matched by several pdf cells gets the union bbox (A7).

    parity: only cells that appear in ``matches`` survive this step
    (matching_post_processor.py:470-535); unmatched cells are dropped,
    and output order follows the matches iteration order.
    """
    pdf_bbox_by_id = {p["id"]: p["bbox"] for p in pdf_cells}
    cell_by_id = {c["cell_id"]: c for c in table_cells}

    # One pass instead of snap-all + regroup + merge: the merged list
    # keeps the FIRST clone per cell_id (same output order) and its
    # bbox is the coordinate-wise min/max union over every snapped
    # bbox for that id — min/max are selections, so accumulating them
    # in visit order yields the exact values the three-pass form
    # computed over the collected list.
    merged = []
    first_clone = {}   # cell_id -> the clone kept in ``merged``
    multi = set()      # cell_ids snapped more than once (bbox -> union)
    for pdf_cell_id, match_list in matches.items():
        cell_ids = set(int(m["table_cell_id"]) for m in match_list)
        pdf_bbox = pdf_bbox_by_id.get(int(pdf_cell_id))
        if not pdf_bbox:
            continue
        for cid in cell_ids:
            cell = cell_by_id.get(cid)
            if not cell:
                continue
            prior = first_clone.get(cid)
            if prior is None:
                clone = cell.copy()
                clone["bbox"] = list(pdf_bbox)
                if "cell_class" not in clone:
                    clone["cell_class"] = "2"
                first_clone[cid] = clone
                merged.append(clone)
            else:
                b = prior["bbox"]
                if cid not in multi:
                    # first duplicate: fresh list so the union never
                    # aliases the first snapped bbox
                    b = prior["bbox"] = list(b)
                    multi.add(cid)
                if pdf_bbox[0] < b[0]:
                    b[0] = pdf_bbox[0]
                if pdf_bbox[1] < b[1]:
                    b[1] = pdf_bbox[1]
                if pdf_bbox[2] > b[2]:
                    b[2] = pdf_bbox[2]
                if pdf_bbox[3] > b[3]:
                    b[3] = pdf_bbox[3]
    return merged


def _merge_bboxes(a, b):
    return [min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3])]


def _band_assign(pdf_cells, matches, bands, lo_idx, hi_idx):
    """Shared band join for rows (y axis) and columns (x axis): assign
    each orphan pdf cell to the band containing either bbox edge (or
    spanning it); duplicates resolve to the smaller centroid depth
    (J5/J6/W4).

    ``bands``: list of (band_lo, band_hi) per row/column id.
    Returns {pdf_str_id: (band_id, depth, bbox)} in insertion order.
    """
    assigned = {}  # pdf_str_id -> [band_id, depth, bbox]
    # Orphan set and per-cell mid computed once; the loop below visits
    # (band, cell) pairs in the same order with the same float ops, so
    # results are bit-identical to the naive nested loop.
    orphans = []
    for pdf_cell in pdf_cells:
        key = str(pdf_cell["id"])
        if key in matches:
            continue
        bbox = pdf_cell["bbox"]
        c_lo = bbox[lo_idx]
        c_hi = bbox[hi_idx]
        orphans.append((key, c_lo, c_hi, (c_hi + c_lo) / 2, bbox))
    for band_id, (lo, hi) in enumerate(bands):
        band_mid = (hi + lo) / 2
        for key, c_lo, c_hi, c_mid, bbox in orphans:
            inside = (
                (lo <= c_lo <= hi)
                or (lo <= c_hi <= hi)
                or (c_lo <= lo and c_hi >= hi)
            )
            if not inside:
                continue
            depth = round(abs(band_mid - c_mid))
            prior = assigned.get(key)
            if prior is None or depth < prior[1]:
                assigned[key] = [band_id, depth, bbox]
    return assigned


def _col_band_assign(pdf_cells, matches, bands):
    """Column variant: the spanning test uses strict inequalities
    (matching_post_processor.py:955 ``<``/``>`` vs rows' ``<=``/``>=``)."""
    assigned = {}
    orphans = []
    for pdf_cell in pdf_cells:
        key = str(pdf_cell["id"])
        if key in matches:
            continue
        bbox = pdf_cell["bbox"]
        c_lo = bbox[0]
        c_hi = bbox[2]
        orphans.append((key, c_lo, c_hi, (c_hi + c_lo) / 2, bbox))
    for band_id, (lo, hi) in enumerate(bands):
        band_mid = (hi + lo) / 2
        for key, c_lo, c_hi, c_mid, bbox in orphans:
            inside = (
                (lo <= c_lo <= hi)
                or (lo <= c_hi <= hi)
                or (c_lo < lo and c_hi > hi)
            )
            if not inside:
                continue
            depth = round(abs(band_mid - c_mid))
            prior = assigned.get(key)
            if prior is None or depth < prior[1]:
                assigned[key] = [band_id, depth, bbox]
    return assigned


def pick_orphans(tab_rows, tab_cols, max_cell_id, table_cells, pdf_cells, matches):
    """Step 9: band-join orphan pdf cells into the grid.

    Row bands: [min y1, max y2] over non-rowspan, non-empty cells per
    row; column bands likewise on x over non-colspan cells.  An orphan
    gets (row from the row band, column from the column band); the match
    lands on the existing structural cell at that grid slot (bbox merged)
    or on a freshly minted cell.  Orphans are processed in ascending
    pdf-id order (parity with the C++-compat sort,
    matching_post_processor.py:1022-1035).
    """
    # One pass over the cells per axis (min/max are order-insensitive, so
    # grouping first gives the same bands as the per-row/col rescans).
    row_extent = {}
    col_extent = {}
    for cell in table_cells:
        if cell["cell_class"] > 1:
            bbox = cell["bbox"]
            if "rowspan_val" not in cell:
                ext = row_extent.get(cell["row_id"])
                if ext is None:
                    row_extent[cell["row_id"]] = [bbox[1], bbox[3]]
                else:
                    if bbox[1] < ext[0]:
                        ext[0] = bbox[1]
                    if bbox[3] > ext[1]:
                        ext[1] = bbox[3]
            if "colspan_val" not in cell:
                ext = col_extent.get(cell["column_id"])
                if ext is None:
                    col_extent[cell["column_id"]] = [bbox[0], bbox[2]]
                else:
                    if bbox[0] < ext[0]:
                        ext[0] = bbox[0]
                    if bbox[2] > ext[1]:
                        ext[1] = bbox[2]
    row_bands = [tuple(row_extent.get(r, (-1, -1))) for r in range(tab_rows)]
    col_bands = [tuple(col_extent.get(c, (-1, -1))) for c in range(tab_cols)]

    row_assign = _band_assign(pdf_cells, matches, row_bands, 1, 3)
    col_assign = _col_band_assign(pdf_cells, matches, col_bands)

    # Slot index: first cell per (row, col) in list order; id index maps a
    # cell_id to EVERY aliased entry so the merge hits the same objects
    # the original full-list scans did.
    slot_first = {}
    cells_by_id = {}
    for cell in table_cells:
        slot_key = (cell["row_id"], cell["column_id"])
        if slot_key not in slot_first:
            slot_first[slot_key] = cell
        cells_by_id.setdefault(cell["cell_id"], []).append(cell)

    for pdf_id_int in sorted(int(k) for k in row_assign):
        key = str(pdf_id_int)
        if key not in col_assign:
            continue
        row_id = row_assign[key][0]
        col_id, depth, pdf_bbox = col_assign[key]

        slot = slot_first.get((row_id, col_id))
        if slot is not None:
            target_id = slot["cell_id"]
            for cell in cells_by_id[target_id]:
                cell["bbox"] = _merge_bboxes(cell["bbox"], pdf_bbox)
        else:
            max_cell_id += 1
            target_id = max_cell_id
            new_cell = {
                "bbox": pdf_bbox,
                "cell_id": target_id,
                "column_id": col_id,
                "label": "body",
                "row_id": row_id,
                "cell_class": 2,
            }
            table_cells.append(new_cell)
            # keep the indexes in sync with the growing list: the slot was
            # empty (that is why we are here), so the new cell is its
            # first occupant, exactly as a rescan would find it
            slot_first[(row_id, col_id)] = new_cell
            cells_by_id.setdefault(target_id, []).append(new_cell)
        matches[key] = [{"post": depth, "table_cell_id": target_id}]
    return matches, table_cells, max_cell_id


def push_apart_overlaps(table_cells):
    """Step 10 (optional): sequential pairwise pass shrinking overlapping
    bboxes apart along the smaller-overlap axis (F9,
    matching_post_processor.py:387-468).  Mutates in pair order — the
    result is order-dependent by design."""

    def separate(c1, c2):
        b1, b2 = c1["bbox"], c2["bbox"]
        ox = min(b1[2], b2[2]) - max(b1[0], b2[0])
        oy = min(b1[3], b2[3]) - max(b1[1], b2[1])
        if ox <= 0 or oy <= 0:
            return
        import math

        if ox < oy:
            if b1[0] < b2[0]:
                b1[2] -= math.ceil(ox / 2) + 2
                b2[0] += math.floor(ox / 2)
            else:
                b2[2] -= math.ceil(ox / 2) + 2
                b1[0] += math.floor(ox / 2)
        else:
            if b1[1] < b2[1]:
                b1[3] -= math.ceil(oy / 2) + 2
                b2[1] += math.floor(oy / 2)
            else:
                b2[3] -= math.ceil(oy / 2) + 2
                b1[1] += math.floor(oy / 2)
        # parity: the corner re-order REBINDS the cell's bbox to a fresh
        # list (matching_post_processor.py:425-438).  An orphan cell's
        # bbox can alias its pdf cell's bbox ("bbox": pdf_bbox at
        # matching_post_processor.py:1085); the in-place +=/-= pushes
        # above flow through that alias into the pdf cell (visible in the
        # response's text_cell_bboxes), but the re-order must NOT — a
        # slice-assign here would "fix" the pdf cell and break parity.
        c1["bbox"] = [min(b1[0], b1[2]), min(b1[1], b1[3]),
                      max(b1[0], b1[2]), max(b1[1], b1[3])]
        c2["bbox"] = [min(b2[0], b2[2]), min(b2[1], b2[3]),
                      max(b2[0], b2[2]), max(b2[1], b2[3])]

    def overlapping(b1, b2):
        return not (
            b1[0] >= b2[2] or b1[2] <= b2[0] or b1[3] <= b2[1] or b1[1] >= b2[3]
        )

    for i in range(len(table_cells)):
        for j in range(i + 1, len(table_cells)):
            ci, cj = table_cells[i], table_cells[j]
            if ci != cj and overlapping(ci["bbox"], cj["bbox"]):
                separate(ci, cj)
    return table_cells


def process(matching_details, correct_overlapping_cells=False):
    """Run the full post-processing chain on one turn's matching details.

    Mirrors ``MatchingPostProcessor.process``
    (matching_post_processor.py:1124-1374) including its cost guards:
    bbox re-alignment is skipped above 300 pdf cells and overlap
    correction above 300 table cells.
    """
    table_cells = matching_details["table_cells"]
    pdf_cells = drop_empty_text_cells(matching_details["pdf_cells"])
    matches = matching_details["matches"]

    if not matches:
        matches = rematch(table_cells, pdf_cells)

    tab_columns, tab_rows, max_cell_id = table_dimensions(table_cells)

    fixed_cells = []
    counts = _match_counts(matches)
    # group once; passing a column its own cells (original order) is
    # identical to the per-column full scans the splitter would do
    cells_by_col = {}
    for cell in table_cells:
        cells_by_col.setdefault(cell["column_id"], []).append(cell)
    for col in range(tab_columns):
        good, bad = split_good_bad_in_column(
            cells_by_col.get(col, ()), col, matches, counts
        )
        alignment = column_alignment(good)
        median_x, _, median_w, median_h = column_medians(good, alignment)
        moved = move_cells_to_anchor(bad, median_x, False, median_w, median_h, alignment)
        fixed_cells.extend(good)
        fixed_cells.extend(moved)

    fixed_cells.sort(key=lambda c: c["cell_id"])

    ioc_matches = rematch(fixed_cells, pdf_cells)

    dedup_cells, dedup_matches, _ = deduplicate_columns(
        tab_columns, fixed_cells, matches, ioc_matches
    )

    final = final_assignment(dedup_matches)

    dedup_cells.sort(key=lambda c: c["cell_id"])
    if len(pdf_cells) > 300:  # cost guard, parity with the reference
        aligned = dedup_cells
    else:
        aligned = align_cells_to_pdf(dedup_cells, pdf_cells, final)

    final, cells_out, max_cell_id = pick_orphans(
        tab_rows, tab_columns, max_cell_id, aligned, pdf_cells, final
    )

    if correct_overlapping_cells and len(cells_out) <= 300:
        cells_out = push_apart_overlaps(cells_out)

    matching_details["table_cells"] = cells_out
    matching_details["matches"] = final
    matching_details["pdf_cells"] = pdf_cells
    return matching_details
