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

import os

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
    elif fmt == "json_gz":
        # gzipped JSONL shards (the interchange shape crawl dumps ship
        # in): file = parallelism unit; arrow's json reader handles the
        # gzip via read_json's auto-decompression by extension
        ds = rd.read_json(path, file_extensions=["gz"])
    elif fmt == "ipc":
        # Arrow IPC shards: file = parallelism unit (read_binary_files
        # distributes whole files; decode is zero-copy from the buffer)
        import glob

        files = sorted(glob.glob(os.path.join(path, "*.arrow")))
        ds = rd.read_binary_files(files)

        def dec(t: pa.Table) -> pa.Table:
            tables = [pa.ipc.open_file(pa.BufferReader(b)).read_all()
                      for b in t["bytes"].to_pylist()]
            return pa.concat_tables(tables) if tables \
                else pa.table({}, schema=schemas.PAGES)

        ds = ds.map_batches(dec, batch_format="pyarrow")
    elif fmt == "orc":
        # ORC shards (the Hadoop-ecosystem interchange format): ray
        # 2.49 has no native ORC reader, so file = parallelism unit via
        # read_binary_files + a pyarrow.orc decode in the workers;
        # _normalize re-casts ORC's ns timestamps back to the canonical
        # us schema
        import glob

        files = sorted(glob.glob(os.path.join(path, "*.orc")))
        ds = rd.read_binary_files(files)

        def dec_orc(t: pa.Table) -> pa.Table:
            from pyarrow import orc as _orc
            tables = [_orc.ORCFile(pa.BufferReader(b)).read()
                      for b in t["bytes"].to_pylist()]
            return pa.concat_tables(tables) if tables \
                else pa.table({}, schema=schemas.PAGES)

        ds = ds.map_batches(dec_orc, batch_format="pyarrow")
    else:
        raise ValueError(f"unsupported corpus format: {fmt}")
    return ds.map_batches(_normalize, batch_format="pyarrow")


def write_pages(ds: rd.Dataset, out_dir: str, fmt: str = "parquet") -> None:
    """Sink side of ``read_pages``: materialize a pages Dataset in any
    of the supported interchange formats.  Parquet is the native
    layout; JSONL/CSV encode html as base64 text (``html_b64``) and
    timestamps as ISO strings, exactly the shapes ``read_pages``
    normalizes back -- so every format round-trips losslessly (pytest).
    Writes stream per block (one file per block, Ray-native); no
    driver-side collection."""
    if fmt == "parquet":
        ds.write_parquet(out_dir, mode="overwrite")
        return
    if fmt == "ipc":
        # Arrow IPC shards, one per block, content-hash file names
        # (idempotent under task retry -- the _write_frontier_part
        # convention); binary/timestamp columns are native in IPC so
        # the round-trip is bit-lossless with no encoding step
        os.makedirs(out_dir, exist_ok=True)

        def write_block(t: pa.Table) -> pa.Table:
            import hashlib

            sink = pa.BufferOutputStream()
            with pa.ipc.new_file(sink, t.schema) as w:
                w.write_table(t)
            buf = sink.getvalue()
            name = hashlib.md5(buf).hexdigest()[:16]
            path = os.path.join(out_dir, f"part-{name}.arrow")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(buf)
            os.replace(tmp, path)
            return pa.table({"path": pa.array([path], pa.string()),
                             "n_rows": pa.array([t.num_rows], pa.int64())})

        ds.map_batches(write_block, batch_format="pyarrow").take_all()
        return
    if fmt == "orc":
        # ORC shards, one per block, content-hash names (idempotent
        # under task retry); binary columns are native, so the
        # round-trip is lossless after the canonical-schema re-cast
        os.makedirs(out_dir, exist_ok=True)

        def write_orc_block(t: pa.Table) -> pa.Table:
            import hashlib

            from pyarrow import orc as _orc

            sink = pa.BufferOutputStream()
            _orc.write_table(t, sink)
            buf = sink.getvalue()
            name = hashlib.md5(buf).hexdigest()[:16]
            path = os.path.join(out_dir, f"part-{name}.orc")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(buf.to_pybytes())
            os.replace(tmp, path)
            return pa.table({"path": pa.array([path], pa.string()),
                             "n_rows": pa.array([t.num_rows], pa.int64())})

        ds.map_batches(write_orc_block, batch_format="pyarrow").take_all()
        return
    if fmt not in ("json", "csv", "json_gz"):
        raise ValueError(f"unsupported corpus format: {fmt}")

    def enc(t: pa.Table) -> pa.Table:
        import base64
        b64 = pa.array(
            [base64.b64encode(x).decode("ascii") if x is not None else None
             for x in t["html"].to_pylist()], pa.string())
        cols = {}
        for name in t.column_names:
            if name == "html":
                continue
            col = t[name]
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.string())
            cols[name] = col
        cols["html_b64"] = b64
        return pa.table(cols)

    out = ds.map_batches(enc, batch_format="pyarrow")
    if fmt == "json":
        out.write_json(out_dir)
    elif fmt == "json_gz":
        # per-block gzipped JSONL, content-hash names (idempotent under
        # retry); mtime=0 so shard bytes are deterministic (the WARC
        # sink convention)
        os.makedirs(out_dir, exist_ok=True)

        def write_gz(t: pa.Table) -> pa.Table:
            import gzip
            import hashlib
            import io
            import json as _json

            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                for row in t.to_pylist():
                    g.write(_json.dumps(row).encode() + b"\n")
            raw = buf.getvalue()
            name = hashlib.md5(raw).hexdigest()[:16]
            path = os.path.join(out_dir, f"part-{name}.jsonl.gz")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(raw)
            os.replace(tmp, path)
            return pa.table({"path": pa.array([path], pa.string()),
                             "n_rows": pa.array([t.num_rows], pa.int64())})

        out.map_batches(write_gz, batch_format="pyarrow").take_all()
    else:
        out.write_csv(out_dir)


def discover_sitemap_seeds(pages_path: str) -> rd.Dataset:
    """Sitemap-driven seed discovery: find every host's
    ``/sitemap.txt`` page in the corpus (plain-text sitemap format --
    one url per line, sitemaps.org) and emit its listed urls as a
    SEEDS-schema Dataset, ready for ``CrawlEngine.run(seeds=...)`` /
    the distributed seed chain (which re-canonicalizes, robots-gates
    and dedups as usual).  This is pomp's ENTRY_REQUESTS generation
    done from crawl data instead of hand-written lists.

    Scale: the sitemap filter is a pruned 2-column read + one
    vectorized url-suffix mask; parsing touches only sitemap rows (one
    per host).  Dedup across sitemaps rides the seed chain's existing
    intra-round dedup -- this source only dedups within each page."""
    from pomp_ray import schemas as _schemas

    def parse(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.ends_with(t["url"], pattern="/sitemap.txt")
        t = t.filter(mask)
        out: list[str] = []
        seen: set[str] = set()
        for text in t["text"].to_pylist():
            for line in (text or "").splitlines():
                line = line.strip()
                if line.startswith(("http://", "https://")) \
                        and line not in seen:
                    seen.add(line)
                    out.append(line)
        n = len(out)
        return pa.table({
            "url": pa.array(out, pa.string()),
            "priority": pa.array([0] * n, pa.int32()),
            "depth": pa.array([0] * n, pa.int32()),
        }, schema=_schemas.SEEDS)

    return rd.read_parquet(pages_path, columns=["url", "text"]) \
        .map_batches(parse, batch_format="pyarrow")


_SM_LOC_RE = r"<sitemap>\s*<loc>([^<]*)</loc>"
_URL_BLOCK_RE = (r"<url>\s*<loc>([^<]*)</loc>"
                 r"(?:\s*<lastmod>([^<]*)</lastmod>)?")


def sitemap_xml_entries(pages_path: str) -> rd.Dataset:
    """XML sitemap discovery (sitemaps.org urlset + sitemapindex): the
    distinct (url, lastmod) entries of every ``<urlset>`` reachable
    from a host root ``/sitemap.xml`` -- following ``<sitemapindex>``
    references recursively.  ``lastmod`` feeds ``recrawl_intervals``-
    style revisit policies; ``discover_sitemap_xml_seeds`` projects to
    the SEEDS schema.

    Scale shape: pass 1 extracts only the (index url, child url) REF
    graph from sitemapindex docs (a few rows per host -- the tiny
    side), the driver BFSes reachability over it, and pass 2 parses
    urlset docs gated by the broadcast reachable set.  Page html never
    leaves the sitemap-suffix filter; parsing is per-sitemap-row regex
    over one-per-host documents."""
    import re

    import pyarrow.compute as pc
    import ray as _ray

    def sitemap_rows(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.match_substring(t["url"], pattern="/sitemap"),
                       pc.ends_with(t["url"], pattern=".xml"))
        return t.filter(mask)

    docs = rd.read_parquet(pages_path, columns=["url", "html"]) \
        .map_batches(sitemap_rows, batch_format="pyarrow")

    def index_refs(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            x = (h or b"").decode("utf-8", errors="replace")
            if "<sitemapindex" not in x:
                continue
            for child in re.findall(_SM_LOC_RE, x):
                src.append(u)
                dst.append(child.strip())
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string())})

    edges = docs.map_batches(index_refs, batch_format="pyarrow").take_all()
    children: dict[str, list[str]] = {}
    for r in edges:
        children.setdefault(r["src"], []).append(r["dst"])
    roots = {u for u in children
             if re.match(r"https?://[^/]*/sitemap\.xml$", u)}
    # roots with no index refs (a bare urlset at /sitemap.xml) are found
    # by the urlset pass below; seed the BFS with every /sitemap.xml
    reachable: set[str] = set()
    frontier = list(roots)
    while frontier:
        nxt = []
        for u in frontier:
            if u in reachable:
                continue
            reachable.add(u)
            nxt.extend(children.get(u, ()))
        frontier = nxt
    reach_ref = _ray.put(frozenset(reachable))

    def parse_urlsets(t: pa.Table) -> pa.Table:
        wanted = _ray.get(reach_ref)
        out_u, out_m = [], []
        for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            is_root = re.match(r"https?://[^/]*/sitemap\.xml$", u)
            if u not in wanted and not is_root:
                continue
            x = (h or b"").decode("utf-8", errors="replace")
            if "<urlset" not in x:
                continue
            for loc, lastmod in re.findall(_URL_BLOCK_RE, x):
                out_u.append(loc.strip())
                out_m.append(lastmod.strip())
        return pa.table({"url": pa.array(out_u, pa.string()),
                         "lastmod": pa.array(out_m, pa.string())})

    from ray.data.aggregate import Min
    ents = docs.map_batches(parse_urlsets, batch_format="pyarrow") \
        .groupby("url").aggregate(Min("lastmod", alias_name="lastmod"))
    return ents.map_batches(
        lambda t: t.select(["url", "lastmod"]), batch_format="pyarrow")


def sitemap_stale_report(pages_path: str) -> rd.Dataset:
    """Recrawl targeting from sitemap freshness: join the XML sitemap
    entries' ``lastmod`` against each crawled page's capture date
    (``warc_ts``) and flag entries whose lastmod POSTDATES the capture
    -- the pages a continuous crawl should refetch first (the
    sitemap-driven sibling of ``recrawl_intervals``'s change-rate
    policy).  Entries never crawled (no pages row) flag stale with a
    null crawl date.

    Shape: the entries table is sitemap-scale (the tiny side); the join
    is a Dataset hash join on canonical url; dates compare as integer
    epoch days -- no float time math."""
    import pyarrow.compute as pc

    ents = sitemap_xml_entries(pages_path).materialize()

    def crawled(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["warc_ts"], unit="day"),
                      pa.date32())
        return pa.table({"url": t["url"],
                         "crawl_day": pc.cast(day, pa.int32())})

    pages = rd.read_parquet(pages_path, columns=["url", "warc_ts"]) \
        .map_batches(crawled, batch_format="pyarrow")
    joined = ents.join(pages, join_type="left_outer", on=("url",),
                       num_partitions=2)

    def flag(t: pa.Table) -> pa.Table:
        lastmod_day = pc.cast(pc.cast(
            pc.strptime(t["lastmod"], format="%Y-%m-%d", unit="s"),
            pa.date32()), pa.int32())
        no_crawl = pc.is_null(t["crawl_day"])
        stale = pc.or_kleene(
            no_crawl, pc.greater(lastmod_day, t["crawl_day"]))
        return pa.table({
            "url": t["url"],
            "lastmod": t["lastmod"],
            # nullable int -> float64 (DuckDB .df() nullable-int rule)
            "crawl_day": pc.cast(t["crawl_day"], pa.float64()),
            "stale": pc.cast(stale, pa.bool_())})

    return joined.map_batches(flag, batch_format="pyarrow")


def discover_sitemap_xml_seeds(pages_path: str) -> rd.Dataset:
    """SEEDS-schema projection of ``sitemap_xml_entries`` -- the XML
    sibling of ``discover_sitemap_seeds``, ready for
    ``CrawlEngine.run(seeds=...)`` / the distributed seed chain."""
    ents = sitemap_xml_entries(pages_path)

    def to_seeds(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "url": t["url"],
            "priority": pa.array([0] * n, pa.int32()),
            "depth": pa.array([0] * n, pa.int32()),
        }, schema=schemas.SEEDS)

    return ents.map_batches(to_seeds, batch_format="pyarrow")


def compact_parquet_dir(in_dir: str, out_dir: str,
                        target_rows_per_file: int = 100_000) -> dict:
    """Small-file compaction -- the table-maintenance pass every
    long-running crawl needs: checkpointed outputs accumulate thousands
    of tiny parquet parts (one per round per block), and downstream
    read parallelism degrades into per-file task overhead.  Reads the
    fragmented directory as ONE Dataset, repartitions to
    ceil(rows / target_rows_per_file) blocks, and streams them back out
    (write is per-block; nothing driver-side but the row count from
    parquet METADATA).  Returns {rows, files_in, files_out}."""
    import glob as _glob

    import pyarrow.parquet as _pq

    files_in = sorted(_glob.glob(os.path.join(in_dir, "*.parquet")))
    rows = sum(_pq.ParquetFile(f).metadata.num_rows for f in files_in)
    n_out = max(1, -(-rows // target_rows_per_file))
    ds = rd.read_parquet(files_in)
    ds.repartition(n_out).write_parquet(out_dir, mode="overwrite")
    files_out = _glob.glob(os.path.join(out_dir, "*.parquet"))
    return {"rows": rows, "files_in": len(files_in),
            "files_out": len(files_out)}


def discover_robots_sitemap_seeds(pages_path: str) -> rd.Dataset:
    """Seed discovery from robots.txt ``Sitemap:`` directives (the
    standard place real sites announce their sitemaps): one pruned
    distributed pass over the corpus's ``/robots.txt`` pages, parsed by
    the same RFC-9309 parser the gate uses, emitting a SEEDS-schema
    Dataset.  Complements ``discover_sitemap_seeds`` (which reads the
    sitemap PAGES); chain them -- robots -> sitemap urls -> crawl."""
    from pomp_ray import schemas as _schemas
    from pomp_ray.functions.robotsfns import parse_robots_txt
    from pomp_ray.functions.textfns import url_path

    def parse(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.equal(
            pc.replace_substring_regex(t["url"],
                                       pattern="^[a-z]+://[^/]+",
                                       replacement=""),
            "/robots.txt")
        t = t.filter(mask)
        out: list[str] = []
        seen: set[str] = set()
        for html in t["html"].to_pylist():
            for sm in parse_robots_txt(html or b"")["sitemaps"]:
                if sm not in seen:
                    seen.add(sm)
                    out.append(sm)
        n = len(out)
        return pa.table({
            "url": pa.array(out, pa.string()),
            "priority": pa.array([0] * n, pa.int32()),
            "depth": pa.array([0] * n, pa.int32()),
        }, schema=_schemas.SEEDS)

    return rd.read_parquet(pages_path, columns=["url", "html"]) \
        .map_batches(parse, batch_format="pyarrow")
