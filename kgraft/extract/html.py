"""Frozen deterministic HTML -> text extractor (pipeline stage 2).

Semantics transplanted from the reference's PMC-XML extractor
(reference ``tools/entrez.py:36-56`` ``get_Body``: deep-copy the doc,
drop ``<table-wrap>`` boilerplate from each section, emit one
whitespace-joined string per section; ``tools/entrez.py:14-18``
``filter_meta``: join ``stripped_strings`` with a single space) to
Common-Crawl HTML:

* boilerplate subtrees are dropped entirely: ``script style noscript
  template nav header footer aside table form iframe svg``
* every *block-level* element that directly contains text becomes one
  extraction unit ("segment"); its text is whitespace-normalized
  (split + single-space join == the reference's ``stripped_strings``
  + ``" ".join`` semantics)
* the page's canonical extracted text is ``"\n".join(segments)``

This function is the **byte-identity invariant** of the engine
(``BASELINE.json`` ``input_hint``): the ``text`` column of the pages
table is produced by this exact function at corpus-synthesis time, and
the pipeline must re-derive it byte-identically from ``html``. It is
versioned and must never change without re-cutting goldens.

Implementation is stdlib-only (``html.parser``) so determinism does not
depend on third-party parser versions. Pure function — safe to call
from any number of Ray workers concurrently.
"""

from __future__ import annotations

from html.parser import HTMLParser

EXTRACTOR_VERSION = 1

# Subtrees removed wholesale (reference drops <table-wrap>; CC pages add
# script/nav/chrome noise).
_DROP = frozenset(
    {
        "script",
        "style",
        "noscript",
        "template",
        "nav",
        "header",
        "footer",
        "aside",
        "table",
        "form",
        "iframe",
        "svg",
        "head",
    }
)

# Elements that close out a text block. Inline tags (a, b, span, em, ...)
# accumulate into the enclosing block, as stripped_strings would.
_BLOCK = frozenset(
    {
        "p",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "li",
        "blockquote",
        "pre",
        "figcaption",
        "dt",
        "dd",
        "div",
        "section",
        "article",
        "main",
        "body",
        "ul",
        "ol",
        "br",
        "tr",
        "td",
    }
)

# Void elements never appear on the end-tag stream.
_VOID = frozenset({"br", "hr", "img", "meta", "link", "input", "source", "wbr"})


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0
        self._chunks: list[str] = []
        self.blocks: list[str] = []

    def _flush(self) -> None:
        if self._chunks:
            text = " ".join(" ".join(self._chunks).split())
            self._chunks = []
            if text:
                self.blocks.append(text)

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag in _DROP and tag not in _VOID:
            self._drop_depth += 1
            return
        if tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):  # noqa: D102
        if tag in _DROP:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if tag in _BLOCK:
            self._flush()

    def handle_data(self, data):  # noqa: D102
        if self._drop_depth == 0 and data:
            stripped = data.strip()
            if stripped:
                self._chunks.append(stripped)


def extract_blocks(html: bytes | str) -> list[str]:
    """All whitespace-normalized text blocks of a page, in document order."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _Extractor()
    p.feed(html)
    p.close()
    p._flush()
    return p.blocks


def extract_text(html: bytes | str) -> str:
    """Canonical extracted text of a page: newline-joined blocks."""
    return "\n".join(extract_blocks(html))


def text_to_segments(text: str) -> list[str]:
    """Re-derive segments from canonical text (stage 3 contract).

    Because ``extract_text`` joins blocks with ``"\\n"`` and blocks are
    whitespace-normalized (never contain ``"\\n"``), segmentation of the
    canonical text is an exact inverse: ``text.split("\\n")``.
    """
    return text.split("\n") if text else []
