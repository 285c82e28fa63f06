"""Arrow schemas for every table in the engine (FIXTURES.md §1/§2/§4).

The pages schema is authoritative per ``BASELINE.json`` ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
All pipeline stages are schema-checked against these in tests.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SEGMENTS = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("seg_idx", pa.int32()),
        ("seg_text", pa.string()),
        ("lang", pa.string()),
    ]
)

MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("seg_idx", pa.int32()),
        ("surface", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)

TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("seg_idx", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conf", pa.float32()),
    ]
)

LINKED_TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("seg_idx", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conf", pa.float32()),
        ("subj_id", pa.int64()),
        ("obj_id", pa.int64()),
    ]
)

NODES = pa.schema(
    [
        ("entity_id", pa.int64()),
        ("canonical", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("component_id", pa.int64()),
        ("n_mentions", pa.int64()),
    ]
)

EDGES = pa.schema(
    [
        ("subj_id", pa.int64()),
        ("pred", pa.string()),
        ("obj_id", pa.int64()),
        ("conf", pa.float32()),
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
    ]
)

GOLDEN_TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("seg_idx", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
    ]
)

ALIAS_DICT = pa.schema([("alias", pa.string()), ("entity_id", pa.int64())])
