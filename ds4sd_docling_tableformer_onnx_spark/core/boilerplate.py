"""HTML boilerplate stripping: text-density + link-density DOM heuristics.

North-star component (BASELINE.json): "HTML boilerplate stripping via
text-density and link-density DOM heuristics ... All parsing runs inside
mapInPandas/Arrow-batched pandas UDFs (batched byte-stream tokenize +
node classify ...), with DOM trees held as flat Arrow struct arrays
rather than Python objects."

This module is the Spark-free core: a streaming tokenizer (stdlib
``html.parser`` — a byte/char-stream state machine, no tree is ever
materialized) emits a FLAT block table (parallel arrays of per-block
features), and a density classifier marks each block content vs
boilerplate.  The heuristics follow the published Boilerpipe /
jusText family (Kohlschütter et al., WSDM 2010; Pomikálek 2011):

- blocks are maximal text runs between block-level tags;
- ``link_density``  = chars inside <a> / chars in block;
- ``text_density``  = words / lines (a line = 80-char wrap, Boilerpipe's
  definition), long high-density blocks are content;
- short blocks inherit no context here (the simple classifier; the
  two-pass context smoothing of jusText is approximated by the
  GOOD/NEAR-GOOD length tiers);
- blocks inside <nav> <header> <footer> <aside> <form>, and blocks whose
  dominant tag is a list item inside a link-heavy run, are boilerplate.

The flat-array block table maps 1:1 onto an Arrow struct array inside
the Spark operator (operators/boilerplate.py).
"""

from __future__ import annotations

from html.parser import HTMLParser

BLOCK_TAGS = {
    "p", "div", "td", "th", "li", "h1", "h2", "h3", "h4", "h5", "h6",
    "blockquote", "pre", "article", "section", "tr", "table", "ul", "ol",
    "body", "main", "figcaption", "dd", "dt",
}
BOILERPLATE_CONTAINERS = {"nav", "header", "footer", "aside", "form", "script", "style", "noscript"}

# classifier thresholds (Boilerpipe NumWordsRules / jusText defaults)
MAX_LINK_DENSITY = 0.33
MIN_GOOD_WORDS = 16          # long blocks: content unless link-heavy
MIN_NEAR_GOOD_WORDS = 6      # medium blocks: content if dense and link-free
MIN_TEXT_DENSITY = 8.0       # words per 80-char line
CHARS_PER_LINE = 80.0


class _BlockTokenizer(HTMLParser):
    """Streaming tokenizer -> flat block arrays (no DOM tree)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        # parallel arrays — THE block table
        self.texts: list[str] = []
        self.n_chars: list[int] = []
        self.n_words: list[int] = []
        self.n_link_chars: list[int] = []
        self.tags: list[str] = []
        self.in_boiler_container: list[bool] = []
        # tokenizer state
        self._buf: list[str] = []
        self._link_chars = 0
        self._link_depth = 0
        self._container_depth = 0
        self._current_tag = "body"

    def _flush(self):
        text = " ".join("".join(self._buf).split())
        if text:
            self.texts.append(text)
            self.n_chars.append(len(text))
            self.n_words.append(len(text.split()))
            self.n_link_chars.append(min(self._link_chars, len(text)))
            self.tags.append(self._current_tag)
            self.in_boiler_container.append(self._container_depth > 0)
        self._buf = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in BOILERPLATE_CONTAINERS:
            self._flush()
            self._container_depth += 1
        elif tag in BLOCK_TAGS:
            self._flush()
            self._current_tag = tag
        elif tag == "a":
            self._link_depth += 1
        elif tag == "br":
            self._buf.append(" ")

    def handle_endtag(self, tag):
        if tag in BOILERPLATE_CONTAINERS:
            self._flush()
            if self._container_depth > 0:
                self._container_depth -= 1
        elif tag in BLOCK_TAGS:
            self._flush()
            self._current_tag = "body"
        elif tag == "a" and self._link_depth > 0:
            self._link_depth -= 1

    def handle_data(self, data):
        self._buf.append(data)
        if self._link_depth > 0:
            self._link_chars += len(" ".join(data.split()))


def tokenize_blocks(html: str):
    """HTML string -> flat block-table dict of parallel lists.

    A tokenizer exception salvages whatever flushed before the
    malformed region but is RECORDED (``parse_error``) rather than
    swallowed, so the operator can surface truncated parses instead of
    silently emitting partial output."""
    tok = _BlockTokenizer()
    parse_error = False
    try:
        tok.feed(html or "")
        tok.close()
    except Exception:
        parse_error = True
    tok._flush()
    return {
        "text": tok.texts,
        "n_chars": tok.n_chars,
        "n_words": tok.n_words,
        "n_link_chars": tok.n_link_chars,
        "tag": tok.tags,
        "in_boiler_container": tok.in_boiler_container,
        "parse_error": parse_error,
    }


def classify_blocks(blocks):
    """Flat block table -> list[bool] (True = content).

    Pure arithmetic over the parallel arrays — inside the Spark operator
    this is applied vectorized per Arrow batch.
    """
    out = []
    for i in range(len(blocks["text"])):
        if blocks["in_boiler_container"][i]:
            out.append(False)
            continue
        n_chars = blocks["n_chars"][i]
        n_words = blocks["n_words"][i]
        link_density = blocks["n_link_chars"][i] / n_chars if n_chars else 1.0
        lines = max(n_chars / CHARS_PER_LINE, 1.0)
        text_density = n_words / lines
        if link_density > MAX_LINK_DENSITY:
            out.append(False)
        elif n_words >= MIN_GOOD_WORDS:
            out.append(True)
        elif n_words >= MIN_NEAR_GOOD_WORDS and text_density >= MIN_TEXT_DENSITY and link_density == 0.0:
            out.append(True)
        else:
            out.append(False)
    return out


def strip_boilerplate(html: str):
    """One document -> (main_text, n_blocks, n_content_blocks, parse_error).

    The per-turn entry point the Spark operator batches over.
    """
    blocks = tokenize_blocks(html)
    keep = classify_blocks(blocks)
    main = "\n".join(t for t, k in zip(blocks["text"], keep) if k)
    return main, len(keep), sum(keep), blocks["parse_error"]
