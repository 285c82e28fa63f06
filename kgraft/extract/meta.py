"""Page metadata + table extraction (stages M2/M5 of the reference).

The frozen byte-identity extractor (:mod:`kgraft.extract.html`) drops
``<table>`` subtrees as boilerplate and never looks at ``<head>``; the
reference, however, ALSO surfaces both as data:

* ``get_Meta`` projects article/journal/doi/pubdate metadata
  (``gondar/tools/entrez.py:21-33``) — realized here as a
  ``(title, h1, meta_description)`` struct from the HTML head/body.
* ``get_Tables`` emits attribute-stripped table subtrees as data
  (``gondar/tools/entrez.py:71-85``) — realized here as one
  whitespace-normalized string per ``<table>`` (cells joined by a
  single space within a row, rows joined by newlines), attributes
  never emitted (M4 ``removeAllAttrs`` semantics).

Both run as separate vectorized ``map_batches`` passes so the frozen
extractor's byte-identity invariant is untouched. stdlib-only parser —
deterministic across workers.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa

META_VERSION = 1


class _MetaTableParser(HTMLParser):
    """One pass: title, first h1, meta[name=description], and all tables."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title = ""
        self.h1 = ""
        self.meta_description = ""
        self.tables: list[str] = []
        self._in_title = False
        self._in_h1 = False
        self._h1_done = False
        self._table_depth = 0
        self._rows: list[list[str]] = []
        self._cell: list[str] | None = None
        self._title_chunks: list[str] = []
        self._h1_chunks: list[str] = []

    def handle_starttag(self, tag, attrs):  # noqa: D102
        if tag == "title":
            self._in_title = True
        elif tag == "h1" and not self._h1_done:
            self._in_h1 = True
        elif tag == "meta":
            a = dict(attrs)
            if a.get("name", "").lower() == "description":
                self.meta_description = " ".join((a.get("content") or "").split())
        elif tag == "table":
            self._table_depth += 1
            if self._table_depth == 1:
                self._rows = []
        elif self._table_depth:
            if tag == "tr":
                self._rows.append([])
            elif tag in ("td", "th"):
                self._cell = []

    def handle_endtag(self, tag):  # noqa: D102
        if tag == "title":
            self._in_title = False
            self.title = " ".join(" ".join(self._title_chunks).split())
        elif tag == "h1" and self._in_h1:
            self._in_h1 = False
            self._h1_done = True
            self.h1 = " ".join(" ".join(self._h1_chunks).split())
        elif tag in ("td", "th") and self._cell is not None:
            row = self._rows[-1] if self._rows else None
            text = " ".join(" ".join(self._cell).split())
            if row is not None:
                row.append(text)
            self._cell = None
        elif tag == "table" and self._table_depth:
            self._table_depth -= 1
            if self._table_depth == 0:
                lines = [" ".join(c for c in row if c) for row in self._rows]
                self.tables.append("\n".join(l for l in lines if l))

    def handle_data(self, data):  # noqa: D102
        if self._in_title:
            self._title_chunks.append(data)
        if self._in_h1:
            self._h1_chunks.append(data)
        if self._cell is not None:
            self._cell.append(data)


def parse_meta_tables(html: bytes | str) -> dict:
    """title / h1 / meta_description / tables of one page."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _MetaTableParser()
    p.feed(html)
    p.close()
    return {
        "title": p.title,
        "h1": p.h1,
        "meta_description": p.meta_description,
        "tables": p.tables,
    }


def page_meta_batch(t: pa.Table) -> pa.Table:
    """PAGES batch -> (url, title, h1, meta_description)."""
    metas = [parse_meta_tables(h) for h in t["html"].to_pylist()]
    return pa.table(
        {
            "url": t["url"],
            "title": pa.array([m["title"] for m in metas], pa.string()),
            "h1": pa.array([m["h1"] for m in metas], pa.string()),
            "meta_description": pa.array(
                [m["meta_description"] for m in metas], pa.string()
            ),
        }
    )


def page_tables_batch(t: pa.Table) -> pa.Table:
    """PAGES batch -> (url, n_tables, tables: list<string>)."""
    metas = [parse_meta_tables(h) for h in t["html"].to_pylist()]
    return pa.table(
        {
            "url": t["url"],
            "n_tables": pa.array(
                [len(m["tables"]) for m in metas], pa.int32()
            ),
            "tables": pa.array(
                [m["tables"] for m in metas], pa.list_(pa.string())
            ),
        }
    )
