"""Main-content extraction operators: boilerplate strip + layout spans.

The two north-star extraction components applied per turn/document at
scale (BASELINE.json north_star):

- ``strip_boilerplate_column``   HTML -> main text via text-density +
  link-density block classification (core/boilerplate.py).  One narrow
  ``mapInArrow`` stage: the scan is pruned to (ids, html), the streaming
  tokenizer emits flat block arrays per document, classification is
  arithmetic over those arrays — no DOM objects, no per-row Python in
  the plan, no shuffle.
- ``reading_order_spans``        page text tokens (the pdf-cell shape)
  -> ordered text spans with line ids (core/layout.py).  Same
  mapInArrow shape over a JSON token column.

Both compose with the table pipeline: a turn's ``tool`` payload carries
pdf cells for the table matcher, and the same tokens feed the reading-
order spans; an HTML ``text`` payload feeds the boilerplate stripper.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

STRIP_SCHEMA = (
    "doc_id long, main_text string, n_blocks int, n_content_blocks int, "
    "main_sha256 string, parse_error boolean"
)

SPANS_SCHEMA = (
    "doc_id long, ordered_text string, n_tokens int, n_lines int"
)


def _strip_batches(batches: Iterator):
    import pyarrow as pa

    from ..core.boilerplate import strip_boilerplate
    from ..functions.gcctl import suspended_gc

    with suspended_gc():
        yield from _strip_batches_inner(batches, pa, strip_boilerplate)


def _strip_batches_inner(batches, pa, strip_boilerplate):
    for batch in batches:
        ids = batch.column("doc_id")
        texts, n_blocks, n_content, shas, errs = [], [], [], [], []
        for html in batch.column("html").to_pylist():
            main, nb, nc, perr = strip_boilerplate(html)
            texts.append(main)
            n_blocks.append(nb)
            n_content.append(nc)
            shas.append(hashlib.sha256(main.encode("utf-8")).hexdigest())
            errs.append(perr)
        yield pa.RecordBatch.from_arrays(
            [
                ids.cast(pa.int64()),
                pa.array(texts, pa.string()),
                pa.array(n_blocks, pa.int32()),
                pa.array(n_content, pa.int32()),
                pa.array(shas, pa.string()),
                pa.array(errs, pa.bool_()),
            ],
            names=["doc_id", "main_text", "n_blocks", "n_content_blocks",
                   "main_sha256", "parse_error"],
        )


def strip_boilerplate_column(df, id_col: str = "doc_id", html_col: str = "html"):
    """(id, html) -> (id, main_text, block counts, content hash)."""
    from pyspark.sql import functions as F

    pruned = df.select(F.col(id_col).alias("doc_id"), F.col(html_col).alias("html"))
    return pruned.mapInArrow(_strip_batches, schema=STRIP_SCHEMA)


def _spans_batches(batches: Iterator):
    import pyarrow as pa

    from ..core.layout import reading_order
    from ..functions.gcctl import suspended_gc

    with suspended_gc():
        yield from _spans_batches_inner(batches, pa, reading_order)


def _spans_batches_inner(batches, pa, reading_order):
    for batch in batches:
        ids = batch.column("doc_id")
        texts, n_tokens, n_lines = [], [], []
        for tok_json in batch.column("tokens_json").to_pylist():
            try:
                tokens = json.loads(tok_json) if tok_json else []
            except Exception:
                tokens = []
            ordered, line_ids = reading_order(tokens)
            lines: list[list[str]] = []
            for tok, li in zip(ordered, line_ids):
                while len(lines) <= li:
                    lines.append([])
                lines[li].append(tok["text"])
            texts.append("\n".join(" ".join(w) for w in lines))
            n_tokens.append(len(ordered))
            n_lines.append(len(lines))
        yield pa.RecordBatch.from_arrays(
            [
                ids.cast(pa.int64()),
                pa.array(texts, pa.string()),
                pa.array(n_tokens, pa.int32()),
                pa.array(n_lines, pa.int32()),
            ],
            names=["doc_id", "ordered_text", "n_tokens", "n_lines"],
        )


def reading_order_spans(df, id_col: str = "doc_id", tokens_col: str = "tokens_json"):
    """(id, tokens_json) -> (id, reading-order text, token/line counts)."""
    from pyspark.sql import functions as F

    pruned = df.select(
        F.col(id_col).alias("doc_id"), F.col(tokens_col).alias("tokens_json")
    )
    return pruned.mapInArrow(_spans_batches, schema=SPANS_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic synthetic pages (no external data): wrap a document's
# text into a realistic page skeleton with nav/header/footer chrome,
# link farms and a related-links list, so the stripper has real
# boilerplate to remove.  Pure function of (doc_id, text).
# ---------------------------------------------------------------------------

def synthesize_page(doc_id: int, text: str) -> str:
    import html as _html

    from ..core.boilerplate import MIN_GOOD_WORDS

    words = (text or "").split()
    chunks = [words[i : i + 40] for i in range(0, len(words), 40)]
    # merge floor = MIN_GOOD_WORDS so every interior paragraph clears the
    # GOOD-block rule by construction (the strip->reconstruct fixed point
    # must hold for any corpus, not just the current fixture's sizes)
    if len(chunks) > 1 and len(chunks[-1]) < MIN_GOOD_WORDS:
        chunks[-2].extend(chunks.pop())
    # escape so <, >, & in document text survive the synthesize->tokenize
    # round trip (the tokenizer unescapes char refs)
    paras = [_html.escape(" ".join(c)) for c in chunks] or [""]
    nav = "".join(
        f'<li><a href="/s/{doc_id}/{i}">section {i}</a></li>' for i in range(6)
    )
    related = "".join(
        f'<li><a href="/doc/{(doc_id * 7 + i) % 1000}">related item {i} read more</a></li>'
        for i in range(5)
    )
    body = "".join(f"<p>{p}</p>" for p in paras)
    return (
        f"<html><head><title>doc {doc_id}</title></head><body>"
        f"<header><h1>Site {doc_id % 13}</h1><nav><ul>{nav}</ul></nav></header>"
        f'<div><a href="/subscribe">Subscribe now</a> | <a href="/login">Log in</a></div>'
        f"<article>{body}</article>"
        f"<aside><h3>Related</h3><ul>{related}</ul></aside>"
        f"<footer><p>© {2000 + doc_id % 26} Example Corp. All rights reserved. "
        f'<a href="/tos">Terms</a> <a href="/privacy">Privacy</a></p></footer>'
        f"</body></html>"
    )


def synthesize_pages(docs_df, id_col: str = "doc_id", text_col: str = "text"):
    """documents -> (doc_id, html) via a vectorized pandas UDF."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _page(ids, texts):
        import pandas as pd

        return pd.Series(
            [synthesize_page(int(i), t) for i, t in zip(ids, texts)]
        )

    return docs_df.select(
        F.col(id_col).alias("doc_id"),
        _page(F.col(id_col), F.col(text_col)).alias("html"),
    )


def strip_transcript_turns(df, text_col: str = "text"):
    """Transcript-shaped wrapper: per-turn boilerplate strip over
    (conv_id, turn_idx, text-as-HTML) keeping turn lineage — the same
    narrow mapInArrow shape as extract_transcripts, so an HTML-payload
    corpus runs the main-content path with identical partitioning,
    checkpointing and skew behavior."""
    import pyarrow as pa
    from pyspark.sql import functions as F

    from ..core.boilerplate import strip_boilerplate

    def batches(it):
        for batch in it:
            texts, n_blocks, n_content, shas, errs = [], [], [], [], []
            for html in batch.column("text").to_pylist():
                main, nb, nc, perr = strip_boilerplate(html)
                texts.append(main)
                n_blocks.append(nb)
                n_content.append(nc)
                shas.append(hashlib.sha256(main.encode("utf-8")).hexdigest())
                errs.append(perr)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("conv_id").cast(pa.string()),
                    batch.column("turn_idx").cast(pa.int32()),
                    pa.array(texts, pa.string()),
                    pa.array(n_blocks, pa.int32()),
                    pa.array(n_content, pa.int32()),
                    pa.array(shas, pa.string()),
                    pa.array(errs, pa.bool_()),
                ],
                names=["conv_id", "turn_idx", "main_text", "n_blocks",
                       "n_content_blocks", "main_sha256", "parse_error"],
            )

    pruned = df.select("conv_id", "turn_idx", F.col(text_col).alias("text"))
    return pruned.mapInArrow(
        batches,
        schema=(
            "conv_id string, turn_idx int, main_text string, n_blocks int, "
            "n_content_blocks int, main_sha256 string, parse_error boolean"
        ),
    )
