"""Archive round-trip pipelines: corpus tables <-> WARC-lite files.

``warc_shard_stats`` is the driver query that proves the WARC sink and
source against DuckDB: documents are framed into md5-sharded
``.warc.gz`` archives (real bytes on disk, one file per shard -- the
Common-Crawl segment layout), read BACK through the streaming
``read_warc`` source, and reduced to per-shard (n_docs, n_bytes); the
oracle computes the same numbers straight off the parquet table, so any
framing/compression/parse defect breaks the hash match.

Scale posture: shard assignment is the pure per-row md5 bucket
(resumable, retry-stable -- docs._shard_ids contract); the write is a
bounded groupby (n_shards groups, each streamed to one file); the read
is file-parallel with per-batch partial aggregation -- page bytes never
shuffle, only (shard, n, bytes) partials do.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Sum

from pomp_ray.pipelines.docs import _docs, _shard_ids
from pomp_ray.sources.warc import encode_warc, read_warc

N_SHARDS = 8


def _to_pages_batch(t: pa.Table) -> pa.Table:
    """documents rows -> PAGES-shaped rows: url doc://<id>, warc_ts =
    doc_id seconds since epoch, payload = utf-8 text bytes."""
    ids = t["doc_id"]
    urls = pc.binary_join_element_wise(
        "doc://", pc.cast(ids, pa.string()), "")
    ts = pc.cast(pc.multiply(pc.cast(ids, pa.int64()), 1_000_000),
                 pa.timestamp("us"))
    html = pc.cast(t["text"], pa.binary())
    shard = _shard_ids(ids.to_pylist(), N_SHARDS)
    return pa.table({
        "doc_id": ids, "url": urls, "warc_ts": ts, "html": html,
        "shard": pa.array(shard, pa.int64()),
    })


def _write_shard(g: pd.DataFrame, out_dir: str) -> pd.DataFrame:
    """One WARC-lite file per shard group, rows in doc_id order (the
    deterministic within-file order); fixed shard-N name, atomic
    replace."""
    g = g.sort_values("doc_id")
    shard = int(g["shard"].iloc[0])
    # pin the pandas datetime unit before the int view: us since epoch
    ts = g["warc_ts"].astype("datetime64[us]").astype("int64").tolist()
    blob = encode_warc(g["url"].tolist(), ts, g["html"].tolist())
    path = os.path.join(out_dir, f"shard-{shard}.warc.gz")
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return pd.DataFrame({"shard": [shard], "n_written": [len(g)]})


def write_warc_shards(sf_dir: str, out_dir: str) -> list[dict]:
    """Materialize documents as the sharded WARC-lite archive; returns
    per-shard written counts."""
    os.makedirs(out_dir, exist_ok=True)
    pages = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _to_pages_batch, batch_format="pyarrow")
    return pages.groupby("shard").map_groups(
        lambda g: _write_shard(g, out_dir), batch_format="pandas").take_all()


def warc_shard_stats(sf_dir: str) -> rd.Dataset:
    """documents -> sharded .warc.gz archive -> read back -> per-shard
    (n_docs, n_bytes).  n_bytes counts PAYLOAD bytes (utf-8 text), read
    from the parsed records, not the input table."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/pomp_warc_{tag}"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)   # stale shards from another corpus size
    write_warc_shards(sf_dir, out_dir)

    def partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.replace_substring(t["url"], "doc://", ""),
                      pa.int64()).to_pylist()
        shard = _shard_ids(ids, N_SHARDS)
        nbytes = pc.binary_length(t["html"]).to_numpy().astype(np.int64)
        df = pd.DataFrame({"shard": shard, "n_bytes": nbytes})
        g = df.groupby("shard", as_index=False).agg(
            n_docs=("n_bytes", "size"), n_bytes=("n_bytes", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = read_warc(out_dir).map_batches(
        partial, batch_format="pyarrow").groupby("shard").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_bytes", alias_name="n_bytes"))
    return out.map_batches(
        lambda t: pa.table({c: pc.cast(t[c], pa.int64())
                            for c in ("shard", "n_docs", "n_bytes")}),
        batch_format="pyarrow")


# ------------------------------------------------------------------ CDX index
def surt_key(host: str, path: str) -> str:
    """Sort-friendly URI (SURT) key: host labels reversed and
    comma-joined, then ')' and the path -- the Common-Crawl CDX index
    key shape (``com,example)/page``), which clusters every page of a
    registrable domain contiguously in one sorted range so per-domain
    lookups are a binary search + scan, not a full-index filter."""
    return ",".join(reversed(host.split("."))) + ")" + path


def cdx_index(sf_dir: str) -> rd.Dataset:
    """Common-Crawl-style capture index (CDX) over the corpus: one row
    per page with (surt_key, url, warc_ts, digest, n_bytes) plus the
    global position ``idx`` in SURT order -- the archive lookup table a
    crawl publishes beside its WARC shards (cc-index layout; digest is
    md5 hex instead of CDX's sha1-b32 so the DuckDB oracle can mirror
    it exactly).

    Scale shape: the row build is one vectorized map_batches pass
    (Arrow string kernels; host->SURT computed once per UNIQUE host via
    factorize, md5 is the only inherently per-record step); the global
    ordering comes from ``stages.index.zip_with_index`` (one sort on
    the unique surt_key, O(blocks) partials to the driver -- never
    data).  At 100 TB the sorted index streams straight to partitioned
    parquet; nothing but block (first-key, count) pairs leaves the
    workers."""
    import hashlib

    from pomp_ray.stages.index import zip_with_index

    def build(t: pa.Table) -> pa.Table:
        ids_s = pc.cast(t["doc_id"], pa.string())
        host = pc.binary_join_element_wise(
            t["source"], ".example.com", "")
        path = pc.binary_join_element_wise(
            "/", t["lang"], "/doc-", ids_s, ".html", "")
        url = pc.binary_join_element_wise("http://", host, path, "")
        codes, uniques = pd.factorize(host.to_pandas())
        rev = np.array([surt_key(h, "") for h in uniques], dtype=object)
        surt = pc.binary_join_element_wise(
            pa.array(rev[codes], pa.string()), path, "")
        ts = (pd.to_datetime(t["doc_id"].to_numpy(), unit="s")
              .strftime("%Y%m%d%H%M%S"))
        dig = [hashlib.md5(s.encode("utf-8")).hexdigest()
               for s in t["text"].to_pylist()]
        nbytes = pc.cast(
            pc.binary_length(pc.cast(t["text"], pa.binary())), pa.int64())
        return pa.table({
            "surt_key": surt, "url": url,
            "warc_ts": pa.array(ts, pa.string()),
            "digest": pa.array(dig, pa.string()), "n_bytes": nbytes,
        })

    ds = _docs(sf_dir, ["doc_id", "text", "lang", "source"]).map_batches(
        build, batch_format="pyarrow")
    return zip_with_index(ds, "surt_key", out_col="idx")


# ------------------------------------------------- crawl -> archive publish
def publish_crawl_archive(ckpt_dir: str, out_dir: str,
                          n_shards: int = N_SHARDS) -> dict:
    """Publish a FINISHED crawl checkpoint as a Common-Crawl-style
    archive: md5-url-sharded WARC-lite files (``warc/``) of the
    extracted page texts plus the SURT-sorted CDX index (``cdx/``);
    re-fetched urls (continuous crawl) keep only their latest capture
    -- the end-to-end shape a production crawl ships (segment WARCs +
    cc-index).  Returns {shards, pages, cdx_rows}.

    Scale: items stream from the checkpoint (never one driver table);
    shard assignment is the pure md5(url) bucket (resumable,
    retry-stable); each WARC file is one bounded group write; the CDX
    build reuses ``zip_with_index`` (one sort on the unique surt key,
    O(blocks) driver partials).  warc_ts derives from the crawl seq
    (deterministic under re-publish)."""
    import hashlib

    from pomp_ray.crawl import items_dataset
    from pomp_ray.functions.textfns import url_host, url_path
    from pomp_ray.stages.index import zip_with_index

    os.makedirs(os.path.join(out_dir, "warc"), exist_ok=True)

    def to_pages(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        shard = np.fromiter(
            (int(hashlib.md5(u.encode("utf-8", "surrogateescape"))
                 .hexdigest()[:4], 16) % n_shards for u in urls),
            np.int64, len(urls))
        ts = pc.cast(pc.multiply(pc.cast(t["seq"], pa.int64()),
                                 1_000_000), pa.timestamp("us"))
        return pa.table({
            "url": t["url"],
            "seq": pc.cast(t["seq"], pa.int64()),
            "round": pc.cast(t["round"], pa.int64()),
            "warc_ts": ts,
            "html": pc.cast(t["text"], pa.binary()),
            "shard": pa.array(shard, pa.int64()),
        })

    pages = items_dataset(ckpt_dir).map_batches(
        to_pages, batch_format="pyarrow").materialize()  # 2 consumers
    # a CONTINUOUS crawl re-fetches pages (stale recrawl, retry
    # requeue): the archive keeps each url's LATEST capture only.  A
    # url is visited at most once per ROUND (intra-round dedup), and a
    # requeued row may reuse its original seq -- so the winner key is
    # the max round, under which (url, round) is unique.
    from ray.data.aggregate import Max as _Max
    latest = pages.groupby("url").aggregate(
        _Max("round", alias_name="wround")).repartition(4)
    pages = pages.join(latest, join_type="inner", on=("url",),
                       num_partitions=8).map_batches(
        lambda t: t.filter(pc.equal(t["round"], t["wround"]))
        .drop_columns(["wround"]),
        batch_format="pyarrow").materialize()

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seq")
        shard = int(g["shard"].iloc[0])
        ts = g["warc_ts"].astype("datetime64[us]").astype("int64").tolist()
        blob = encode_warc(g["url"].tolist(), ts,
                           [x.encode("utf-8") if isinstance(x, str) else x
                            for x in g["html"].tolist()])
        path = os.path.join(out_dir, "warc",
                            f"crawl-shard-{shard}.warc.gz")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pd.DataFrame({"shard": [shard], "n": [len(g)]})

    written = pages.groupby("shard").map_groups(
        write_shard, batch_format="pandas").take_all()

    def cdx_rows(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        surts, digs = [], []
        for u, payload in zip(urls, t["html"].to_pylist()):
            surts.append(surt_key(url_host(u), url_path(u)))
            digs.append(hashlib.md5(payload).hexdigest())
        ts = (pd.to_datetime(
            pc.cast(t["warc_ts"], pa.int64()).to_numpy(), unit="us")
            .strftime("%Y%m%d%H%M%S"))
        return pa.table({
            "surt_key": pa.array(surts, pa.string()),
            "url": t["url"],
            "warc_ts": pa.array(ts, pa.string()),
            "digest": pa.array(digs, pa.string()),
            "n_bytes": pc.cast(pc.binary_length(t["html"]), pa.int64()),
            "shard": t["shard"],
        })

    cdx = zip_with_index(
        pages.map_batches(cdx_rows, batch_format="pyarrow"),
        "surt_key", out_col="idx")
    cdx.write_parquet(os.path.join(out_dir, "cdx"), mode="overwrite")
    n_pages = sum(r["n"] for r in written)
    n_cdx = sum(
        pq.ParquetFile(os.path.join(out_dir, "cdx", f)).metadata.num_rows
        for f in os.listdir(os.path.join(out_dir, "cdx"))
        if f.endswith(".parquet"))
    return {"shards": len(written), "pages": n_pages, "cdx_rows": n_cdx}


# ------------------------------------------- range-partitioned CDX sink
def write_cdx_partitioned(sf_dir: str, out_dir: str,
                          rows_per_part: int = 100) -> list[dict]:
    """RANGE-partitioned archive index sink: the SURT-sorted CDX rows
    land in fixed-size key-range parquet parts (part = idx //
    rows_per_part -- deterministic from the global SURT position, so a
    re-run overwrites the same files: resumable output), each file
    internally idx-sorted, plus a MANIFEST.json of (part, n_rows,
    min/max surt) -- the layout that makes a per-domain archive lookup
    a manifest binary search + one-file scan instead of a full-index
    filter.  The write is a bounded groupby (each part is one group);
    at 100 TB parts stream straight from the zip_with_index output."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    cdx = cdx_index(sf_dir)

    def add_part(t: pa.Table) -> pa.Table:
        part = pc.cast(pc.floor(pc.divide(
            pc.cast(t["idx"], pa.float64()), float(rows_per_part))),
            pa.int64())
        return t.append_column("part", part)

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("idx")
        part = int(g["part"].iloc[0])
        path = os.path.join(out_dir, f"cdx-{part:05d}.parquet")
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(
            g.drop(columns=["part"]), preserve_index=False), tmp,
            row_group_size=8192)
        os.replace(tmp, path)
        return pd.DataFrame({
            "part": [part], "n_rows": [len(g)],
            "min_surt": [g["surt_key"].iloc[0]],
            "max_surt": [g["surt_key"].iloc[-1]]})

    manifest = cdx.map_batches(add_part, batch_format="pyarrow") \
        .groupby("part").map_groups(write_part, batch_format="pandas") \
        .take_all()
    manifest.sort(key=lambda r: r["part"])
    with open(os.path.join(out_dir, "MANIFEST.json"), "w") as f:
        json.dump([{k: (int(v) if k in ("part", "n_rows") else v)
                    for k, v in r.items()} for r in manifest], f)
    return manifest


def cdx_partition_manifest(sf_dir: str,
                           rows_per_part: int = 100) -> rd.Dataset:
    """Write the range-partitioned CDX, then verify the ON-DISK layout
    by reading every part file back in a distributed pass (one task per
    file: count + min/max surt straight off the parquet bytes, never
    trusting the writer's return value) -- the manifest the DuckDB
    oracle recomputes from the documents table."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/pomp_cdx_parts_{tag}"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    write_cdx_partitioned(sf_dir, out_dir, rows_per_part)

    import glob as _glob
    files = sorted(_glob.glob(os.path.join(out_dir, "cdx-*.parquet")))

    def summarize(batch: pa.Table) -> pa.Table:
        parts, ns, mins, maxs = [], [], [], []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path, columns=["surt_key"])
            s = t["surt_key"]
            parts.append(int(os.path.basename(path)[4:9]))
            ns.append(t.num_rows)
            mins.append(pc.min(s).as_py())
            maxs.append(pc.max(s).as_py())
        return pa.table({
            "part": pa.array(parts, pa.int64()),
            "n_rows": pa.array(ns, pa.int64()),
            "min_surt": pa.array(mins, pa.string()),
            "max_surt": pa.array(maxs, pa.string())})

    return rd.from_arrow(pa.table({"path": pa.array(files, pa.string())})) \
        .map_batches(summarize, batch_size=4, batch_format="pyarrow") \
        .sort("part")


def cdx_domain_lookup(sf_dir: str, host: str = "src7.example.com",
                      rows_per_part: int = 100) -> pa.Table:
    """Point lookup against the range-partitioned CDX: binary-search
    the MANIFEST for parts whose [min_surt, max_surt] range can contain
    the domain's SURT prefix and read ONLY those files -- the
    one-manifest-probe + one-part-scan access path the range layout
    exists for (a flat index would scan every file).  Returns the
    domain's captures in SURT order; the prune is provably correct
    because parts tile the global SURT order."""
    import bisect
    import json

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/pomp_cdx_parts_{tag}"
    mpath = os.path.join(out_dir, "MANIFEST.json")
    if not os.path.exists(mpath):
        write_cdx_partitioned(sf_dir, out_dir, rows_per_part)
    manifest = json.load(open(mpath))

    prefix = surt_key(host, "")
    lo, hi = prefix, prefix + "￿"
    mins = [m["min_surt"] for m in manifest]
    first = max(0, bisect.bisect_right(mins, lo) - 1)
    rows = []
    for m in manifest[first:]:
        if m["min_surt"] > hi:
            break
        if m["max_surt"] < lo:
            continue
        t = pq.read_table(os.path.join(
            out_dir, f"cdx-{int(m['part']):05d}.parquet"))
        sk = t["surt_key"]
        mask = pc.and_(pc.greater_equal(sk, lo), pc.less_equal(sk, hi))
        rows.append(t.filter(mask))
    if not rows:
        return pa.schema([
            ("surt_key", pa.string()), ("url", pa.string()),
            ("warc_ts", pa.string()), ("digest", pa.string()),
            ("n_bytes", pa.int64()), ("idx", pa.int64())]).empty_table()
    out = pa.concat_tables(rows)
    return out.sort_by([("idx", "ascending")])


def archive_to_seeds(archive_dir: str, out_path: str) -> int:
    """Bootstrap adapter closing the publish loop: turn a published
    archive's CDX index back into a SEEDS parquet directory, so a FRESH
    engine (new cluster, empty state) re-crawls everything a previous
    crawl captured -- the "continue from a Common-Crawl dump" path.
    ``run(seeds=<path>)`` re-canonicalizes, re-gates robots and
    re-dedups through the distributed seed chain, so the adapter only
    carries urls (depth 0 -- archives don't record crawl depth; pair
    with ``max_depth`` relative to the new crawl if needed).

    Scale shape: one pruned-column Dataset pass over the cdx parquet
    (already latest-capture-per-url by the publish contract), streamed
    straight to partitioned SEEDS parquet.  Returns the seed count."""
    cdx = rd.read_parquet(os.path.join(archive_dir, "cdx"),
                          columns=["url"])
    out = cdx.map_batches(
        lambda t: pa.table({
            "url": t["url"],
            "priority": pa.array([0] * t.num_rows, pa.int32()),
            "depth": pa.array([0] * t.num_rows, pa.int32())}),
        batch_format="pyarrow")
    os.makedirs(out_path, exist_ok=True)
    out.write_parquet(out_path)
    import glob as _glob

    import pyarrow.parquet as _pq
    return sum(_pq.ParquetFile(p).metadata.num_rows
               for p in _glob.glob(os.path.join(out_path, "*.parquet")))


def write_orc_shards(sf_dir: str, out_dir: str) -> list[dict]:
    """Materialize documents as md5-bucketed ORC shards (the Hadoop-
    ecosystem columnar interchange): same shard assignment and
    deterministic within-file doc_id order as the WARC sink, one
    ``shard-N.orc`` per bucket, atomic replace (resumable/idempotent
    under task retry).  Returns per-shard written counts."""
    from pyarrow import orc as _orc

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        shard = int(g["shard"].iloc[0])
        t = pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64)),
            "url": pa.array(g["url"].tolist(), pa.string()),
            "html": pa.array(g["html"].tolist(), pa.binary())})
        path = os.path.join(out_dir, f"shard-{shard}.orc")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            _orc.write_table(t, f)
        os.replace(tmp, path)
        return pd.DataFrame({"shard": [shard], "n_written": [len(g)]})

    pages = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _to_pages_batch, batch_format="pyarrow")
    return pages.groupby("shard").map_groups(
        write_shard, batch_format="pandas").take_all()


def orc_shard_stats(sf_dir: str) -> rd.Dataset:
    """documents -> sharded ORC archive -> distributed read-back ->
    per-shard (n_docs, n_bytes).  Proves the ORC sink/source pair the
    same way warc_shard_stats proves WARC: stats come off the PARSED
    files (read_binary_files distributes whole shards; pyarrow.orc
    decodes in the workers), so encode/decode defects break the
    oracle hash.  n_bytes counts utf-8 payload bytes."""
    from pyarrow import orc as _orc

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = f"/tmp/pomp_orc_{tag}"
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)   # stale shards from another corpus size
    write_orc_shards(sf_dir, out_dir)

    import glob as _glob
    files = sorted(_glob.glob(os.path.join(out_dir, "*.orc")))

    def partial(t: pa.Table) -> pa.Table:
        parts = []
        for b in t["bytes"].to_pylist():
            tab = _orc.ORCFile(pa.BufferReader(b)).read()
            ids = pc.cast(pc.replace_substring(tab["url"], "doc://", ""),
                          pa.int64()).to_pylist()
            shard = _shard_ids(ids, N_SHARDS)
            nbytes = pc.binary_length(tab["html"]).to_numpy() \
                .astype(np.int64)
            df = pd.DataFrame({"shard": shard, "n_bytes": nbytes})
            parts.append(df.groupby("shard", as_index=False).agg(
                n_docs=("n_bytes", "size"), n_bytes=("n_bytes", "sum")))
        if not parts:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        return pa.Table.from_pandas(pd.concat(parts), preserve_index=False)

    out = rd.read_binary_files(files).map_batches(
        partial, batch_format="pyarrow").groupby("shard").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_bytes", alias_name="n_bytes"))
    return out.map_batches(
        lambda t: pa.table({c: pc.cast(t[c], pa.int64())
                            for c in ("shard", "n_docs", "n_bytes")}),
        batch_format="pyarrow")
