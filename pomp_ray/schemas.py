"""Arrow schemas for every table the engine touches.

The reference (estin/pomp) has no schemas at all -- its records are plain
Python objects (``BaseHttpRequest`` / ``BaseHttpResponse`` / ``Item``,
see SURVEY.md section 1, pomp/core/base.py / pomp/core/item.py).  We fix
them explicitly in Arrow so every stage is a zero-copy columnar batch.

``PAGES`` is exactly the driver ``input_hint`` schema (BASELINE.json:15):
(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string).
"""

from __future__ import annotations

import pyarrow as pa

# The corpus of fetched/fetchable web pages (BASELINE.json input_hint).
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# One row per pending request.  Equivalent of pomp's queue entries
# (BaseHttpRequest, pomp/core/base.py ~L150-175 [estimated]), plus the
# ordering/partitioning columns the distributed frontier needs.
FRONTIER = pa.schema(
    [
        ("url", pa.string()),        # original url as discovered
        ("canon_url", pa.string()),  # canonical form -- the dedup key
        ("host", pa.string()),       # politeness partition key
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("seq", pa.int64()),         # global enqueue order (FIFO=BFS, LIFO=DFS)
    ]
)

SEEDS = pa.schema(
    [
        ("url", pa.string()),
        ("priority", pa.int32()),
        ("depth", pa.int32()),
    ]
)

ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("disallow_prefixes", pa.list_(pa.string())),
        ("allow_prefixes", pa.list_(pa.string())),
        ("crawl_delay", pa.float64()),
    ]
)

# Extracted items (the output of pomp's ``extract_items``; pomp's Item is
# schemaless -- ours is fixed; see FIXTURES.md section 4).
ITEMS = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("text", pa.string()),
        ("n_links", pa.int32()),
        ("round", pa.int32()),
        ("seq", pa.int64()),
        ("depth", pa.int32()),
    ]
)

# Error envelope table -- the columnar form of pomp's BaseCrawlException
# flowing through process_exception (pomp/core/base.py ~L225-245 [estimated]).
ERRORS = pa.schema(
    [
        ("url", pa.string()),
        ("stage", pa.string()),      # "fetch" | "robots" | "parse"
        ("exc_type", pa.string()),
        ("message", pa.string()),
        ("retryable", pa.bool_()),
        ("round", pa.int32()),
    ]
)

VISITED = pa.schema(
    [
        ("url", pa.string()),
        ("round", pa.int32()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
    ]
)

# Per-round, per-stage lineage/metrics rows (north_rule: "every partition
# writes lineage + fetch/parse metrics").
METRICS = pa.schema(
    [
        ("round", pa.int32()),
        ("stage", pa.string()),
        ("n_rows", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def cast_to(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Select the schema's columns and cast to its exact types.  Needed
    because pandas round-trips (map_groups) promote int32 -> int64 and we
    require byte-stable parquet schemas across driver/distributed rounds."""
    return t.select(schema.names).cast(schema)


def rename(t: pa.Table, mapping: dict[str, str]) -> pa.Table:
    """dict-based rename (pyarrow 16's rename_columns only takes a list)."""
    return t.rename_columns([mapping.get(c, c) for c in t.column_names])
