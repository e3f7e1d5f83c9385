"""Corpus loaders: normalize page corpora from multiple storage formats
into the canonical ``schemas.PAGES`` layout.

The reference fetches live HTTP and has no storage formats at all; this
engine's "fetch" runs against stored corpora (BASELINE.json input_hint:
Parquet of Common-Crawl-style pages), and real crawl archives come in
several shapes -- so the loader accepts parquet (native), CSV and JSONL,
mapping/casting columns to the canonical schema.  Reads prune to the
needed columns where the format supports it.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from pomp_ray import schemas


def _normalize(t: pa.Table) -> pa.Table:
    cols = {}
    for f in schemas.PAGES:
        if f.name in t.column_names:
            col = t[f.name]
            if f.name == "html" and pa.types.is_string(col.type):
                # CSV/JSON carry html as text; canonical layout is binary
                col = col.cast(pa.binary())
            else:
                col = col.cast(f.type)
        elif f.name == "html" and "html_b64" in t.column_names:
            import base64
            col = pa.array(
                [base64.b64decode(x) if x is not None else None
                 for x in t["html_b64"].to_pylist()], pa.binary())
        else:
            col = pa.nulls(t.num_rows, f.type)
        cols[f.name] = col
    return pa.table(cols, schema=schemas.PAGES)


def read_pages(path: str, fmt: str = "parquet") -> rd.Dataset:
    """Load a pages corpus as a Dataset in the canonical schema.

    fmt: "parquet" (column-pruned native read), "csv", or "json"
    (JSONL).  Non-parquet formats carry html either as text or as an
    ``html_b64`` column."""
    if fmt == "parquet":
        ds = rd.read_parquet(path, columns=[f.name for f in schemas.PAGES])
    elif fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "json":
        ds = rd.read_json(path)
    elif fmt == "warc":
        from pomp_ray.sources.warc import read_warc
        ds = read_warc(path)
    else:
        raise ValueError(f"unsupported corpus format: {fmt}")
    return ds.map_batches(_normalize, batch_format="pyarrow")
