"""Declarative pipeline plans: a JSON-able spec -> a composed Ray Data
pipeline.  This is the configuration-driven user surface a shipping
data engine exposes (pomp users subclass crawlers in Python; a batch
corpus pipeline is better described as data):

    spec = {
        "source": {"table": "documents",
                   "columns": ["doc_id", "lang", "text"]},
        "stages": [
            {"op": "dedup_exact", "key": "text", "id": "doc_id"},
            {"op": "filter_quality"},
            {"op": "filter_in", "column": "lang", "values": ["en"]},
            {"op": "normalize_text", "column": "text",
             "out": "clean_text"},
            {"op": "sample_hash", "key": "doc_id", "keep_hex": "01"},
            {"op": "select", "columns": ["doc_id", "clean_text"]},
            {"op": "limit", "n": 1000},
        ],
        "sink": {"parquet": "/out/dir"},          # optional
    }
    ds = run_plan(spec, sf_dir)

Every stage is a named builder returning Dataset -> Dataset; the
registry is the extension point (register_stage).  Stages reuse the
same vectorized kernels as the library pipelines, so a spec reproduces
the hand-written composites bit-for-bit (pytest: the clean_corpus
equivalence).  Specs stay JSON-serializable -- they can ship in config,
be versioned, and be diffed, which is the point.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_STAGES: dict[str, Callable] = {}


def register_stage(name: str):
    def deco(fn):
        _STAGES[name] = fn
        return fn
    return deco


@register_stage("select")
def _select(cfg: dict):
    cols = list(cfg["columns"])
    return lambda ds: ds.map_batches(lambda t: t.select(cols),
                                     batch_format="pyarrow")


@register_stage("limit")
def _limit(cfg: dict):
    n = int(cfg["n"])
    return lambda ds: ds.limit(n)


@register_stage("filter_in")
def _filter_in(cfg: dict):
    col, values = cfg["column"], list(cfg["values"])

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[col], value_set=pa.array(values)))

    return lambda ds: ds.map_batches(fn, batch_format="pyarrow")


@register_stage("filter_quality")
def _filter_quality(cfg: dict):
    from pomp_ray.functions import analysis as an

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(an.quality_filter_mask(t))

    return lambda ds: ds.map_batches(fn, batch_format="pyarrow")


@register_stage("normalize_text")
def _normalize_text(cfg: dict):
    col = cfg.get("column", "text")
    out = cfg.get("out", col)

    def fn(t: pa.Table) -> pa.Table:
        clean = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(t[col], pattern=r"\s+",
                                       replacement=" "))
        if out in t.column_names:
            return t.set_column(t.column_names.index(out), out, clean)
        return t.append_column(out, clean)

    return lambda ds: ds.map_batches(fn, batch_format="pyarrow")


@register_stage("dedup_exact")
def _dedup_exact(cfg: dict):
    """Keep the min-id row per distinct value of ``key`` -- the
    hash-partitioned semi-join shape (16-byte digest + id shuffle,
    never the payload)."""
    key = cfg.get("key", "text")
    id_col = cfg.get("id", "doc_id")

    def build(ds: rd.Dataset) -> rd.Dataset:
        import hashlib

        from ray.data.aggregate import Min

        def add_hash(t: pa.Table) -> pa.Table:
            digs = [hashlib.md5((x or "").encode()).digest()
                    for x in t[key].to_pylist()]
            return pa.table({id_col: t[id_col],
                             "_h": pa.array(digs, pa.binary())})

        winners = ds.map_batches(add_hash, batch_format="pyarrow") \
            .groupby("_h").aggregate(Min(id_col, alias_name=id_col)) \
            .map_batches(lambda t: t.select([id_col]),
                         batch_format="pyarrow") \
            .repartition(2).materialize()
        return ds.join(winners, join_type="inner", on=(id_col,),
                       num_partitions=16)

    return build


@register_stage("sample_hash")
def _sample_hash(cfg: dict):
    """Deterministic md5 hash-gate sample (session-stable, unlike
    random_sample): keep rows whose md5(key) first hex digit is in
    ``keep_hex``."""
    key = cfg.get("key", "doc_id")
    keep_hex = cfg.get("keep_hex", "01")

    def fn(t: pa.Table) -> pa.Table:
        import hashlib

        keep = [hashlib.md5(str(v).encode()).hexdigest()[0] in keep_hex
                for v in t[key].to_pylist()]
        return t.filter(pa.array(keep, pa.bool_()))

    return lambda ds: ds.map_batches(fn, batch_format="pyarrow")


def run_plan(spec: dict, base_dir: str) -> rd.Dataset:
    """Compose and (lazily) return the Dataset for ``spec``; write the
    sink eagerly when one is configured."""
    src = spec["source"]
    if "table" in src:
        ds = rd.read_parquet(
            os.path.join(base_dir, f"{src['table']}.parquet"),
            columns=src.get("columns"))
    elif "pages" in src:
        from pomp_ray.sources.corpus import read_pages
        ds = read_pages(src["pages"], fmt=src.get("fmt", "parquet"))
    else:
        raise ValueError("spec.source needs 'table' or 'pages'")

    for cfg in spec.get("stages", []):
        op = cfg.get("op")
        if op not in _STAGES:
            raise ValueError(f"unknown stage op: {op!r} "
                             f"(known: {sorted(_STAGES)})")
        ds = _STAGES[op](cfg)(ds)

    sink = spec.get("sink") or {}
    if "parquet" in sink:
        ds.write_parquet(sink["parquet"])
    return ds
