"""Web-text hygiene operators over the crawled ``pages`` table.

Three corpus-cleaning operations every large crawl runs before its text
feeds a training pipeline (none exist in pomp -- reference scope is the
crawl loop itself, SURVEY.md §2; these are the 100-TB-pipeline surface
built on top of its output):

* ``mirror_hosts`` -- host pairs serving byte-identical content (web
  mirrors).  Pages reduce to skinny (host, md5(text)) rows inside
  map_batches -- TEXT NEVER SHUFFLES -- and a hash-partitioned self-join
  on the digest yields shared-content counts per host pair.  Hot-key
  note: a digest shared by k hosts emits k^2 join rows; mirrors are
  small constellations in practice (k is bounded by how many hosts copy
  one page), so the join stays output-scale.
* ``url_templates`` -- URL template mining (digit runs collapse to
  ``N``): the crawler-trap / site-structure report.  One vectorized
  Arrow regex pass + per-batch value_counts partials; only the tiny
  (template, host, n) table shuffles.
* ``dup_line_counts`` / ``dedup_lines`` -- CCNet-style line-level dedup
  (boilerplate lines repeat across pages; lines are the dedup unit).
  Lines explode vectorized (split_pattern + list_flatten +
  list_parent_indices), line hashes come from a per-batch factorize so
  md5 runs once per DISTINCT line in the batch, counts reduce through
  one groupby, and the survivor lines hash-join back and reassemble
  per-url inside 64 url-hash buckets (one C-speed pandas pass per
  bucket, never a per-doc map_groups call).

All three have exact DuckDB oracles over the same pages parquet
(see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

_HOST_RE = r"^[a-z]+://(?P<host>[^/]+)/"


def _pages(pages_path: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(pages_path, columns=columns)


def _host_col(urls) -> pa.Array:
    return pc.struct_field(pc.extract_regex(urls, pattern=_HOST_RE), "host")


def mirror_hosts(pages_path: str, min_shared: int = 5) -> rd.Dataset:
    """Host pairs (host_a < host_b) sharing >= ``min_shared`` distinct
    byte-identical page texts, with the shared-content count."""
    def digest(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5((s or "").encode()).hexdigest()
              for s in t["text"].to_pylist()]
        return pa.table({"host": _host_col(t["url"]),
                         "h": pa.array(hs, pa.string())})

    ph = _pages(pages_path, ["url", "text"]) \
        .map_batches(digest, batch_format="pyarrow") \
        .groupby(["host", "h"]).aggregate(Count(alias_name="_c")) \
        .map_batches(lambda t: t.select(["host", "h"]),
                     batch_format="pyarrow")
    # materialize the skinny distinct table once: both self-join sides
    # read it (lazy re-execution would hash the corpus twice), and the
    # repartition clears ray 2.49's empty-schema zero-row groupby blocks
    # before they can reach the join (CLAUDE.md trap)
    ph = ph.repartition(4).materialize()
    a = ph.map_batches(
        lambda t: pa.table({"h": t["h"], "host_a": t["host"]}),
        batch_format="pyarrow")
    b = ph.map_batches(
        lambda t: pa.table({"h": t["h"], "host_b": t["host"]}),
        batch_format="pyarrow")
    j = a.join(b, join_type="inner", on=("h",), num_partitions=8)
    pairs = j.filter(expr="host_a < host_b") \
        .groupby(["host_a", "host_b"]).aggregate(
            Count(alias_name="n_shared")) \
        .filter(expr=f"n_shared >= {int(min_shared)}")
    return pairs.map_batches(
        lambda t: pa.table({
            "host_a": t["host_a"], "host_b": t["host_b"],
            "n_shared": pc.cast(t["n_shared"], pa.int64())}),
        batch_format="pyarrow").sort(["host_a", "host_b"])


def url_templates(pages_path: str) -> rd.Dataset:
    """URL templates (digit runs -> ``N``) with total url and distinct
    host counts -- the site-structure / crawler-trap report."""
    def partial(t: pa.Table) -> pa.Table:
        tpl = pc.replace_substring_regex(t["url"], pattern=r"[0-9]+",
                                         replacement="N")
        df = pd.DataFrame({"template": tpl.to_pandas(),
                           "host": _host_col(t["url"]).to_pandas()})
        out = df.value_counts().rename("n").reset_index()
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    th = _pages(pages_path, ["url"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["template", "host"]).aggregate(Sum("n", alias_name="n"))
    agg = th.groupby("template").aggregate(
        Sum("n", alias_name="n_urls"), Count(alias_name="n_hosts"))
    return agg.map_batches(
        lambda t: pa.table({
            "template": t["template"],
            "n_urls": pc.cast(t["n_urls"], pa.int64()),
            "n_hosts": pc.cast(t["n_hosts"], pa.int64())}),
        batch_format="pyarrow").sort("template")


def _line_rows(t: pa.Table, with_hash: bool = True) -> pa.Table:
    """Explode text into (url, ln, line[, lh]) rows, vectorized; md5
    runs once per distinct line in the batch (factorize + take)."""
    lines = pc.split_pattern(t["text"], pattern="\n")
    flat = pc.list_flatten(lines)
    idx = pc.list_parent_indices(lines)
    urls = pc.take(t["url"], idx)
    ll = pc.list_value_length(lines).to_numpy().astype(np.int64)
    starts = np.repeat(np.cumsum(ll) - ll, ll)
    ln = (np.arange(int(ll.sum()), dtype=np.int64) - starts + 1)
    cols = {"url": urls, "ln": pa.array(ln, pa.int64()), "line": flat}
    if with_hash:
        codes, uniq = pd.factorize(flat.to_pandas())
        uh = np.array([hashlib.md5(s.encode()).hexdigest() for s in uniq],
                      dtype=object)
        cols["lh"] = pa.array(uh[codes], pa.string())
    return pa.table(cols)


def dup_line_counts(pages_path: str) -> rd.Dataset:
    """Corpus-wide counts of lines occurring more than once -- the
    boilerplate report line-level dedup acts on."""
    def partial(t: pa.Table) -> pa.Table:
        r = _line_rows(t, with_hash=False)
        vc = r["line"].to_pandas().value_counts()
        return pa.table({"line": pa.array(vc.index, pa.string()),
                         "n": pa.array(vc.to_numpy(), pa.int64())})

    agg = _pages(pages_path, ["url", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("line").aggregate(Sum("n", alias_name="n")) \
        .filter(expr="n > 1")
    return agg.map_batches(
        lambda t: pa.table({"line": t["line"],
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow").sort(["n", "line"], descending=[True, False])


def dedup_lines(pages_path: str, max_occ: int = 1) -> rd.Dataset:
    """CCNet-style line dedup: drop every line whose corpus-wide
    occurrence count exceeds ``max_occ`` (ALL copies go -- boilerplate
    carries no training signal), reassemble each page's surviving lines
    in order.  Pages with no surviving line drop entirely."""
    rows = _pages(pages_path, ["url", "text"]) \
        .map_batches(_line_rows, batch_format="pyarrow").materialize()
    counts = rows.groupby("lh").aggregate(Count(alias_name="n_occ"))
    # join partitions sized to the line-row volume (metadata-only count
    # on the materialized rows): a fixed 16 starves the vocabulary-sized
    # shuffle at corpus scale and pays ~1 s/partition spinup when nearly
    # empty (the salted_join_rollup sizing rule)
    n_parts = max(2, min(64, rows.count() // 500_000))
    keep = rows.join(counts, join_type="inner", on=("lh",),
                     num_partitions=n_parts) \
        .filter(expr=f"n_occ <= {int(max_occ)}")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (pd.util.hash_array(t["url"].to_pandas().to_numpy(dtype=object))
             & 63).astype(np.int32)
        return t.append_column("bucket", pa.array(b, pa.int32()))

    def reasm(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["url", "ln"])
        out = g.groupby("url", sort=True)["line"] \
            .agg("\n".join).rename("text").reset_index()
        return out

    bucketed = keep.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(
        reasm, batch_format="pandas")


def host_template_stats(pages_path: str) -> rd.Dataset:
    """Per-host URL-template report (the crawler-trap signal: a host
    whose url count explodes across few templates is template-generated
    content; one whose template count explodes is a parameter trap).
    Same partials as url_templates; the per-host rollup is a second tiny
    groupby."""
    def partial(t: pa.Table) -> pa.Table:
        tpl = pc.replace_substring_regex(t["url"], pattern=r"[0-9]+",
                                         replacement="N")
        df = pd.DataFrame({"template": tpl.to_pandas(),
                           "host": _host_col(t["url"]).to_pandas()})
        out = df.value_counts().rename("n").reset_index()
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Max
    th = _pages(pages_path, ["url"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["template", "host"]).aggregate(Sum("n", alias_name="n"))
    agg = th.groupby("host").aggregate(
        Sum("n", alias_name="n_urls"), Count(alias_name="n_templates"),
        Max("n", alias_name="top_template_n"))
    return agg.map_batches(
        lambda t: pa.table({
            "host": t["host"],
            "n_urls": pc.cast(t["n_urls"], pa.int64()),
            "n_templates": pc.cast(t["n_templates"], pa.int64()),
            "top_template_n": pc.cast(t["top_template_n"], pa.int64())}),
        batch_format="pyarrow").sort("host")


def trap_report(pages_path: str, min_urls: int = 20,
                max_distinct_ppm: int = 100_000) -> rd.Dataset:
    """Crawler-trap detector: per (host, url template) the url count,
    DISTINCT content-digest count, diversity ppm, and a trap flag --
    templates whose url space grows without new content (calendars,
    session ids, infinite pagination).  A crawl feeds flagged templates
    back as disallow prefixes / per-host budgets (``max_pages_per_host``
    is the runtime mitigation; this is the offline detector).

    Flag rule (mirrored in the DuckDB oracle): n_urls >= ``min_urls``
    and distinct_ppm <= ``max_distinct_ppm`` (default: >= 20 urls with
    <= 10% distinct content).

    Scale shape: pages reduce to (host, template, md5(text)) inside
    map_batches with a per-batch distinct -- text never shuffles -- then
    ONE groupby collapses duplicate digests globally and a second tiny
    groupby rolls up per template.  Payloads are 3-string rows."""

    def partial(t: pa.Table) -> pa.Table:
        tpl = pc.replace_substring_regex(t["url"], pattern=r"[0-9]+",
                                         replacement="N")
        hs = [hashlib.md5((s or "").encode()).hexdigest()
              for s in t["text"].to_pylist()]
        tbl = pa.table({"host": _host_col(t["url"]),
                        "template": pc.cast(tpl, pa.string()),
                        "d": pa.array(hs, pa.string())})
        return tbl.group_by(["host", "template", "d"]).aggregate(
            [([], "count_all")]).rename_columns(
            ["host", "template", "d", "n"])

    per_digest = (_pages(pages_path, ["url", "text"])
                  .map_batches(partial, batch_format="pyarrow")
                  .groupby(["host", "template", "d"])
                  .aggregate(Sum("n", alias_name="n_urls")))
    rollup = per_digest.map_batches(
        lambda t: pa.table({
            "host": t["host"], "template": t["template"],
            "n_urls": pc.cast(t["n_urls"], pa.int64()),
            "one": pa.array([1] * t.num_rows, pa.int64())}),
        batch_format="pyarrow").groupby(["host", "template"]).aggregate(
        Sum("n_urls", alias_name="n_urls"),
        Sum("one", alias_name="n_distinct"))

    def fin(t: pa.Table) -> pa.Table:
        nu = pc.cast(t["n_urls"], pa.int64()).to_numpy()
        nd = pc.cast(t["n_distinct"], pa.int64()).to_numpy()
        ppm = nd * 1_000_000 // nu
        return pa.table({
            "host": t["host"], "template": t["template"],
            "n_urls": pa.array(nu, pa.int64()),
            "n_distinct": pa.array(nd, pa.int64()),
            "distinct_ppm": pa.array(ppm, pa.int64()),
            "is_trap": pa.array((nu >= min_urls)
                                & (ppm <= max_distinct_ppm))})

    return rollup.map_batches(fin, batch_format="pyarrow")


def trap_disallow_rules(pages_path: str, min_urls: int = 20,
                        max_distinct_ppm: int = 100_000) -> pa.Table:
    """Trap feedback for the crawl: flagged templates from
    ``trap_report`` converted to robots-style (host, disallow_prefix)
    rows -- the path template truncated at its first ``N`` placeholder
    (digit runs never survive templating, and corpus paths are
    lowercase, so a literal ``N`` is unambiguous).  Merge these into the
    crawl's robots table and the politeness gate skips the trap without
    any engine change (test_queries drives that loop end to end)."""
    rep = trap_report(pages_path, min_urls, max_distinct_ppm)
    flagged = rep.map_batches(
        lambda t: t.filter(t["is_trap"]), batch_format="pyarrow")
    rows = sorted(
        (r["host"],
         pc.struct_field(
             pc.extract_regex(pa.array([r["template"]]),
                              pattern=r"^[a-z]+://[^/]+(?P<p>/[^N]*)"),
             "p")[0].as_py())
        for r in flagged.iter_rows())
    return pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "disallow_prefix": pa.array([r[1] for r in rows], pa.string())})


def foreign_pair_counts(pages_path: str) -> rd.Dataset:
    """(src, dst, n) counts over FOREIGN (cross-host) hyperlinks: html
    never shuffles (graph.corpus_host_edges reduces pages to (src, dst)
    host rows in-batch), per-batch pandas partials pre-count pairs, one
    groupby reduces them.  Shared base of link_farm_report /
    host_degree_stats; rows are unique per (src, dst) downstream."""
    from pomp_ray.pipelines.graph import corpus_host_edges

    edges = corpus_host_edges(pages_path)

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["src"], t["dst"])))
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.string()),
                             "dst": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pd.DataFrame({"src": t["src"].to_pylist(),
                           "dst": t["dst"].to_pylist()})
        g = df.groupby(["src", "dst"], as_index=False).size()
        return pa.table({"src": pa.array(g["src"], pa.string()),
                         "dst": pa.array(g["dst"], pa.string()),
                         "n": pa.array(g["size"], pa.int64())})

    return edges.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["src", "dst"]).aggregate(Sum("n", alias_name="n"))


def link_farm_report(pages_path: str) -> pa.Table:
    """Outlink-concentration report per host -- the link-farm / spam-hub
    heuristic (a host whose cross-host links overwhelmingly point at ONE
    other host is a farm candidate; a healthy hub spreads).  Per host
    over FOREIGN (cross-host) hyperlinks only: total outlinks, distinct
    target hosts, and the top target's share in ppm (integer floor --
    exact cross-engine).  Per-host rollup is distributive aggregates
    (Sum/Count/Max) over the unique (src, dst, n) pair rows; output is
    host-cardinality -- tiny at any corpus scale."""
    from ray.data.aggregate import Max

    pairs = foreign_pair_counts(pages_path)

    def host_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"src": t["src"].to_pylist(),
                           "n": t["n"].to_numpy(zero_copy_only=False)})
        g = df.groupby("src", as_index=False).agg(
            out=("n", "sum"), tgts=("n", "size"), top=("n", "max"))
        return pa.table({"src": pa.array(g["src"], pa.string()),
                         "out": pa.array(g["out"], pa.int64()),
                         "tgts": pa.array(g["tgts"], pa.int64()),
                         "top": pa.array(g["top"], pa.int64())})

    rows = pairs.map_batches(host_partial, batch_format="pyarrow") \
        .groupby("src").aggregate(
            Sum("out", alias_name="out"), Sum("tgts", alias_name="tgts"),
            Max("top", alias_name="top")).take_all()
    rows.sort(key=lambda r: (-(1_000_000 * int(r["top"]) // int(r["out"])),
                             r["src"]))
    return pa.table({
        "host": pa.array([r["src"] for r in rows], pa.string()),
        "out_links": pa.array([int(r["out"]) for r in rows], pa.int64()),
        "n_targets": pa.array([int(r["tgts"]) for r in rows], pa.int64()),
        "top_share_ppm": pa.array(
            [1_000_000 * int(r["top"]) // int(r["out"]) for r in rows],
            pa.int64())})


def host_degree_stats(pages_path: str) -> pa.Table:
    """Host-graph degree report: per host, distinct FOREIGN out-targets /
    in-sources and total foreign out-/in-link counts -- the first chart
    of any web-graph health check (hubs vs sinks vs isolates).

    Shape: the shared (src, dst, n) pair table aggregates twice (once
    keyed by src, once by dst -- per-batch partials + groupby, both
    distributive over unique pair rows), and the two host-cardinality
    sides combine through one full_outer hash join with COALESCEd
    key/zero-filled counts (the snapshot_delta discipline)."""
    pairs = foreign_pair_counts(pages_path)

    def out_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"host": t["src"].to_pylist(),
                           "n": t["n"].to_numpy(zero_copy_only=False)})
        g = df.groupby("host", as_index=False).agg(
            out_links=("n", "sum"), out_degree=("n", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def in_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"host": t["dst"].to_pylist(),
                           "n": t["n"].to_numpy(zero_copy_only=False)})
        g = df.groupby("host", as_index=False).agg(
            in_links=("n", "sum"), in_degree=("n", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    outs = pairs.map_batches(out_partial, batch_format="pyarrow") \
        .groupby("host").aggregate(
            Sum("out_links", alias_name="out_links"),
            Sum("out_degree", alias_name="out_degree")) \
        .repartition(2).materialize()
    ins = pairs.map_batches(in_partial, batch_format="pyarrow") \
        .groupby("host").aggregate(
            Sum("in_links", alias_name="in_links"),
            Sum("in_degree", alias_name="in_degree")) \
        .repartition(2).materialize()
    j = outs.join(ins, join_type="full_outer", on=("host",),
                  num_partitions=4)
    rows = j.take_all()
    rows.sort(key=lambda r: r["host"])
    z = lambda v: int(v) if v is not None else 0
    return pa.table({
        "host": pa.array([r["host"] for r in rows], pa.string()),
        "out_degree": pa.array([z(r["out_degree"]) for r in rows],
                               pa.int64()),
        "out_links": pa.array([z(r["out_links"]) for r in rows],
                              pa.int64()),
        "in_degree": pa.array([z(r["in_degree"]) for r in rows],
                              pa.int64()),
        "in_links": pa.array([z(r["in_links"]) for r in rows],
                             pa.int64())})


def reciprocal_links_report(pages_path: str) -> pa.Table:
    """Per-host reciprocity: how much of a host's foreign outlink volume
    points at hosts that link BACK (link-exchange rings score near 1.0;
    organic authority graphs are asymmetric).  One self-join of the
    unique (src, dst, n) pair table against its own reversal, then a
    distributive per-host rollup; ppm is integer floor."""
    pairs = foreign_pair_counts(pages_path).repartition(2).materialize()
    rev = pairs.map_batches(
        lambda t: pa.table({"src": t["dst"], "dst": t["src"],
                            "back": pa.array([True] * t.num_rows,
                                             pa.bool_())}),
        batch_format="pyarrow")
    j = pairs.join(rev, join_type="left_outer", on=("src", "dst"),
                   num_partitions=4)

    def partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        back = pc.fill_null(t["back"], False).to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({"host": t["src"].to_pylist(), "out": n,
                           "recip": np.where(back, n, 0)})
        g = df.groupby("host", as_index=False).agg(
            out=("out", "sum"), recip=("recip", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("host").aggregate(Sum("out", alias_name="out"),
                                   Sum("recip", alias_name="recip")) \
        .take_all()
    rows.sort(key=lambda r: r["host"])
    return pa.table({
        "host": pa.array([r["host"] for r in rows], pa.string()),
        "out_links": pa.array([int(r["out"]) for r in rows], pa.int64()),
        "reciprocal_links": pa.array([int(r["recip"]) for r in rows],
                                     pa.int64()),
        "reciprocal_ppm": pa.array(
            [1_000_000 * int(r["recip"]) // int(r["out"]) for r in rows],
            pa.int64())})


def host_lang_profile(pages_path: str) -> pa.Table:
    """Language mix per host: total pages, per-host majority language
    and its ppm share -- the first split any multilingual crawl makes.
    Per-batch (host, lang) value_counts partials, one tiny groupby, and
    a driver-side majority pick (hosts x langs is small at any scale);
    ties break lexicographically smaller lang (deterministic both
    engines)."""
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"host": _host_col(t["url"]).to_pylist(),
                           "lang": t["lang"].to_pylist()})
        g = df.value_counts().rename("n").reset_index()
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = _pages(pages_path, ["url", "lang"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["host", "lang"]).aggregate(Sum("n", alias_name="n")) \
        .take_all()
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append((r["lang"], int(r["n"])))
    out_h, out_n, out_l, out_ppm = [], [], [], []
    for h in sorted(by_host):
        pairs = by_host[h]
        total = sum(n for _, n in pairs)
        lang, top = min(pairs, key=lambda p: (-p[1], p[0]))
        out_h.append(h); out_n.append(total); out_l.append(lang)
        out_ppm.append(1_000_000 * top // total)
    return pa.table({
        "host": pa.array(out_h, pa.string()),
        "n_pages": pa.array(out_n, pa.int64()),
        "main_lang": pa.array(out_l, pa.string()),
        "main_lang_ppm": pa.array(out_ppm, pa.int64())})


def url_depth_stats(pages_path: str) -> pa.Table:
    """URL path-depth histogram per host (segments = '/' count of the
    path) -- flat sites vs deep hierarchies vs trap-shaped url spaces at
    a glance.  One vectorized count_substring pass per batch; only the
    tiny (host, depth, n) table shuffles."""
    def partial(t: pa.Table) -> pa.Table:
        path = pc.replace_substring_regex(
            t["url"], pattern=r"^[a-z]+://[^/]+", replacement="")
        depth = pc.count_substring(path, pattern="/")
        df = pd.DataFrame({"host": _host_col(t["url"]).to_pylist(),
                           "depth": depth.to_pandas().astype("int64")})
        g = df.value_counts().rename("n").reset_index()
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = _pages(pages_path, ["url"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["host", "depth"]).aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({
            "host": t["host"], "depth": pc.cast(t["depth"], pa.int64()),
            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow").sort(["host", "depth"])


def _edit1(a: str, b: str) -> bool:
    """Exact levenshtein(a, b) == 1 check (the verify step after
    deletion-neighborhood blocking; bounded scans, no DP table)."""
    la, lb = len(a), len(b)
    if la == lb:
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return False
        return diff == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la != 1:
        return False
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def url_edit_pairs_by_host(pages_path: str) -> pa.Table:
    """Fuzzy string self-join (edit distance exactly 1) over the crawl's
    distinct URLs via SymSpell DELETION-NEIGHBORHOOD blocking -- the
    typo/alias-URL detector: each URL emits itself plus every
    single-char deletion as a block key; any levenshtein==1 pair is
    guaranteed to share a key (substitution -> delete the differing
    position from both; insertion -> the shorter string IS a deletion
    of the longer), so blocking loses nothing, and the exact _edit1
    verify rejects the distance-2 collisions (transpositions share
    keys too).  Fan-out is sum(block^2) with blocks bounded by alias
    constellations, never O(n^2); only skinny URL strings shuffle.
    Output: per (host_a, host_b) pair counts (url_a < url_b side),
    exact vs the DuckDB all-pairs levenshtein oracle."""
    urls = _pages(pages_path, ["url"]) \
        .groupby("url").aggregate(Count(alias_name="_c")) \
        .map_batches(lambda t: t.select(["url"]),
                     batch_format="pyarrow").repartition(4).materialize()

    def variants(t: pa.Table) -> pa.Table:
        vs: list[str] = []
        us: list[str] = []
        for u in t["url"].to_pylist():
            vs.append(u)
            us.append(u)
            for i in range(len(u)):
                vs.append(u[:i] + u[i + 1:])
                us.append(u)
        return pa.table({"v": pa.array(vs, pa.string()),
                         "url": pa.array(us, pa.string())})

    ev = urls.map_batches(variants, batch_format="pyarrow").materialize()
    right = ev.map_batches(
        lambda t: pa.table({"v": t["v"], "url_b": t["url"]}),
        batch_format="pyarrow")
    cand = ev.join(right, join_type="inner", on=("v",),
                   num_partitions=8).map_batches(
        lambda t: pa.table({"url_a": t["url"], "url_b": t["url_b"]})
        .filter(pc.less(t["url"], t["url_b"])),
        batch_format="pyarrow")
    distinct = cand.groupby(["url_a", "url_b"]).aggregate(
        Count(alias_name="_c")).repartition(4)

    def verify(t: pa.Table) -> pa.Table:
        ua = t["url_a"].to_pylist()
        ub = t["url_b"].to_pylist()
        keep = [i for i, (a, b) in enumerate(zip(ua, ub))
                if _edit1(a, b)]
        ka = pa.array([ua[i] for i in keep], pa.string())
        kb = pa.array([ub[i] for i in keep], pa.string())
        return pa.table({"host_a": _host_col(ka), "host_b": _host_col(kb)})

    agg = distinct.map_batches(verify, batch_format="pyarrow") \
        .groupby(["host_a", "host_b"]).aggregate(
            Count(alias_name="n_pairs"))
    rows = agg.take_all()
    rows.sort(key=lambda r: (r["host_a"], r["host_b"]))
    return pa.table({
        "host_a": pa.array([r["host_a"] for r in rows], pa.string()),
        "host_b": pa.array([r["host_b"] for r in rows], pa.string()),
        "n_pairs": pa.array([int(r["n_pairs"]) for r in rows],
                            pa.int64())})


def host_shingle_overlap(pages_path: str, k: int = 8, min_df: int = 2,
                         max_df: int = 6, min_shared: int = 5,
                         num_partitions: int = 4) -> pa.Table:
    """Host-pair content overlap by DISTINCT k-character shingles: the
    lexical mirror-detection signal that survives paraphrase-level
    noise where ``mirror_hosts`` (exact digests) does not.  A shingle
    appearing on 2..``max_df`` hosts is evidence of copied content; a
    shingle on every host is template boilerplate and pairs everything
    (the winnowing stop-fingerprint lesson), so it is df-gated out
    before the pair join.

    Scale shape: shingle extraction is one numpy sliding-window pass
    over the batch's concatenated bytes (no per-row Python; windows
    crossing doc boundaries masked out), per-batch DISTINCT
    (host, shingle) partials shrink the shuffle, ONE global distinct
    groupby, the df gate bounds the word-keyed self-join fan-out at
    max_df**2, and only (host, 8-byte shingle) rows ever shuffle.

    SCALE POSTURE: this exhaustive variant shuffles EVERY distinct
    (host, shingle) -- O(total corpus chars) rows -- measured 134 s on
    the 200k-page bench corpus; it is the exact small-corpus
    REFERENCE.  The production sibling is ``docs.winnow_dup_pairs``:
    winnowing samples ~1/window of the shingles (window-min
    fingerprints) with the same df-gated self-join downstream, cutting
    the shuffle an order of magnitude.  Raw shingle bytes (not hashes)
    keep the DuckDB substr oracle exact here."""
    from ray.data.aggregate import Count

    from pomp_ray.stages.enqueue import _FAST_EXTRACT

    def hs_partial(t: pa.Table) -> pa.Table:
        host = pc.struct_field(
            pc.extract_regex(t["url"], pattern=_FAST_EXTRACT), "host")
        texts = t["text"].to_pylist()
        lens = np.array([len(x) for x in texts], np.int64)
        if int(lens.sum()) < k:
            return pa.table({"host": pa.array([], pa.string()),
                             "shingle": pa.array([], pa.binary(k))})
        buf = np.frombuffer("".join(texts).encode("utf-8"), np.uint8)
        # generated-corpus text is ASCII, so bytes == characters and the
        # numpy windows equal DuckDB's substr(text, i, k)
        parent = np.repeat(np.arange(len(lens)), lens)
        win = np.lib.stride_tricks.sliding_window_view(buf, k)
        valid = parent[:len(win)] == parent[k - 1:]
        wins = np.ascontiguousarray(win[valid])
        sh = pa.Array.from_buffers(pa.binary(k), len(wins),
                                   [None, pa.py_buffer(wins.tobytes())])
        tbl = pa.table({
            "host": pc.take(host, pa.array(
                parent[:len(win)][valid], pa.int64())),
            "shingle": sh})
        return tbl.group_by(["host", "shingle"]).aggregate([])

    hs = rd.read_parquet(pages_path, columns=["url", "text"]) \
        .map_batches(hs_partial, batch_format="pyarrow") \
        .groupby(["host", "shingle"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["host", "shingle"]),
                     batch_format="pyarrow") \
        .repartition(2).materialize()

    df = hs.groupby("shingle").aggregate(Count(alias_name="df"))
    keep = df.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["df"], min_df),
                    pc.less_equal(t["df"], max_df))).select(["shingle"]),
        batch_format="pyarrow").repartition(2).materialize()

    gated = hs.join(keep, join_type="inner", on=("shingle",),
                    num_partitions=num_partitions) \
        .repartition(2).materialize()
    left = gated.map_batches(
        lambda t: pa.table({"shingle": t["shingle"],
                            "host_a": t["host"]}),
        batch_format="pyarrow")
    right = gated.map_batches(
        lambda t: pa.table({"shingle": t["shingle"],
                            "host_b": t["host"]}),
        batch_format="pyarrow").repartition(2).materialize()
    pairs = left.join(right, join_type="inner", on=("shingle",),
                      num_partitions=num_partitions) \
        .map_batches(lambda t: t.filter(
            pc.less(t["host_a"], t["host_b"])), batch_format="pyarrow") \
        .groupby(["host_a", "host_b"]) \
        .aggregate(Count(alias_name="n_shared_shingles"))
    out = pairs.map_batches(
        lambda t: pa.table({
            "host_a": t["host_a"], "host_b": t["host_b"],
            "n_shared_shingles": pc.cast(t["n_shared_shingles"],
                                         pa.int64())}).filter(
            pc.greater_equal(
                pc.cast(t["n_shared_shingles"], pa.int64()), min_shared)),
        batch_format="pyarrow")
    tbl = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow"))
        or [pa.table({"host_a": pa.array([], pa.string()),
                      "host_b": pa.array([], pa.string()),
                      "n_shared_shingles": pa.array([], pa.int64())})])
    return tbl.sort_by([("host_a", "ascending"), ("host_b", "ascending")])


def host_load_gini(pages_path: str) -> pa.Table:
    """Gini coefficient of the per-host page-count distribution -- the
    one-number skew gauge for crawl load balancing (0 = perfectly even,
    -> 1 = one host dominates; the salt-count derivation in politeness
    reacts to exactly this skew).

    Exact integer arithmetic in ppm: after the per-host count groupby,
    a distributed sort by (n, host) + per-block (local rank x count)
    partials give the global SUM(i * x_i) with only per-block offsets
    combined on the driver (the prefix_sum/zip_with_index block-offset
    pattern; no full table ever leaves the cluster), and the closed
    form G = (2*SUM(i*x_i) - (n+1)*SUM(x)) / (n*SUM(x)) floors to ppm
    exactly as the DuckDB ROW_NUMBER oracle does."""
    from ray.data.aggregate import Count

    def hostify(t: pa.Table) -> pa.Table:
        return pa.table({"host": _host_col(t["url"])})

    counts = rd.read_parquet(pages_path, columns=["url"]) \
        .map_batches(hostify, batch_format="pyarrow") \
        .groupby("host").aggregate(Count(alias_name="n")) \
        .sort(["n", "host"]).materialize()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_n": pa.array([], pa.int64()),
                             "first_host": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.int64()),
                             "s_ix": pa.array([], pa.int64())})
        x = t["n"].to_numpy().astype(np.int64)
        i = np.arange(len(x), dtype=np.int64)   # local 0-based rank
        return pa.table({
            "first_n": pa.array([int(x[0])], pa.int64()),
            "first_host": pa.array([t["host"][0].as_py()], pa.string()),
            "cnt": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "s_ix": pa.array([int((i * x).sum())], pa.int64())})

    parts = sorted(
        counts.map_batches(partial, batch_size=None,
                           batch_format="pyarrow").take_all(),
        key=lambda r: (r["first_n"], r["first_host"]))
    n_hosts = sum(r["cnt"] for r in parts)
    total = sum(r["sx"] for r in parts)
    s_ix0 = 0   # global sum of 0-based rank * count
    off = 0
    for r in parts:
        s_ix0 += r["s_ix"] + off * r["sx"]
        off += r["cnt"]
    s_ix1 = s_ix0 + total   # 1-based ranks
    gini_ppm = ((2 * s_ix1 - (n_hosts + 1) * total) * 1_000_000
                // (n_hosts * total))
    return pa.table({"n_hosts": pa.array([n_hosts], pa.int64()),
                     "total_pages": pa.array([total], pa.int64()),
                     "gini_ppm": pa.array([gini_ppm], pa.int64())})


def title_dup_report(pages_path: str) -> rd.Dataset:
    """Duplicate-title audit: titles served by more than one page, with
    page and distinct-host counts (mirrored sites and boilerplate
    templates surface here before content hashing even runs).

    Shape: per-batch (title, host) distinct partials (one vectorized
    extract_regex pass over the html -- titles never leave the worker
    un-aggregated), a (title, host) groupby, then a title groupby whose
    Count IS the distinct-host count.  Reference analog: pomp
    extract_items title parsing (SURVEY.md section 2 M1)."""
    _TITLE_RE = r"<title>(?P<t>[^<]*)</title>"

    def partial(t: pa.Table) -> pa.Table:
        html = pc.cast(t["html"], pa.string())
        ti = pc.struct_field(pc.extract_regex(html, pattern=_TITLE_RE), "t")
        df = pd.DataFrame({"title": ti.to_pandas(),
                           "host": _host_col(t["url"]).to_pandas()})
        df = df.dropna(subset=["title"])
        g = (df.groupby(["title", "host"], sort=False)
               .size().reset_index(name="n"))
        return pa.Table.from_pandas(g, preserve_index=False)

    th = _pages(pages_path, ["url", "html"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["title", "host"]).aggregate(Sum("n", alias_name="n"))
    agg = th.groupby("title").aggregate(
        Sum("n", alias_name="n_pages"),
        Count(alias_name="n_hosts"))

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["n_pages"], 1))
        return pa.table({
            "title": t["title"],
            "n_pages": pc.cast(t["n_pages"], pa.int64()),
            "n_hosts": pc.cast(t["n_hosts"], pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def url_path_tree_rollup(pages_path: str, max_depth: int = 4) -> rd.Dataset:
    """Hierarchical rollup over the url PATH tree: page counts at every
    directory prefix up to ``max_depth`` (host, '/a', '/a/b', ...) --
    the drill-down table a crawl-coverage UI serves, and the
    hierarchical-aggregation shape (each row contributes to ALL its
    ancestors).  Vectorized: one split_pattern per batch, prefixes
    rebuilt by cumulative binary_join over list slices -- no per-url
    Python; the groupby key space is bounded by the directory tree, not
    page count."""
    def prefixes(t: pa.Table) -> pa.Table:
        import numpy as np
        urls = t["url"].to_pandas()
        host = urls.str.extract(r"^[a-z]+://([^/]+)", expand=False)
        path = urls.str.extract(r"^[a-z]+://[^/]+(/.*)$", expand=False) \
            .fillna("/")
        segs = path.str.split("/")
        out_h, out_p, out_d = [], [], []
        for h, ss in zip(host, segs):
            # ss[0] is '' before the leading '/'; directories are
            # ss[1:-1], the last element is the leaf
            dirs = ss[1:-1][:max_depth]
            acc = ""
            out_h.append(h); out_p.append("/"); out_d.append(0)
            for d_i, s in enumerate(dirs, start=1):
                acc += "/" + s
                out_h.append(h); out_p.append(acc); out_d.append(d_i)
        return pa.table({"host": pa.array(out_h, pa.string()),
                         "prefix": pa.array(out_p, pa.string()),
                         "depth": pa.array(out_d, pa.int64())})

    agg = _pages(pages_path, ["url"]) \
        .map_batches(prefixes, batch_format="pyarrow") \
        .groupby(["host", "prefix", "depth"]).aggregate(
            Count(alias_name="n_pages"))
    return agg.map_batches(
        lambda t: pa.table({"host": t["host"], "prefix": t["prefix"],
                            "depth": pc.cast(t["depth"], pa.int64()),
                            "n_pages": pc.cast(t["n_pages"], pa.int64())}),
        batch_format="pyarrow")


def host_tag_histogram(pages_path: str) -> rd.Dataset:
    """Per-host HTML tag usage counts (<a>, <p>, <title>) -- the markup
    profile that separates link farms (anchor-heavy) from content pages
    (paragraph-heavy).  One Arrow count_substring kernel per tag per
    batch; only (host, 3 ints) rows shuffle."""
    def partial(t: pa.Table) -> pa.Table:
        html = pc.cast(t["html"], pa.string())
        return pa.table({
            "host": _host_col(t["url"]),
            "n_a": pc.cast(pc.count_substring(html, pattern="<a "),
                           pa.int64()),
            "n_p": pc.cast(pc.count_substring(html, pattern="<p>"),
                           pa.int64()),
            "n_title": pc.cast(pc.count_substring(html,
                                                  pattern="<title>"),
                               pa.int64())})

    agg = _pages(pages_path, ["url", "html"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("host").aggregate(Sum("n_a", alias_name="n_a"),
                                   Sum("n_p", alias_name="n_p"),
                                   Sum("n_title", alias_name="n_title"),
                                   Count(alias_name="n_pages"))
    return agg.map_batches(
        lambda t: pa.table({
            "host": t["host"],
            "n_pages": pc.cast(t["n_pages"], pa.int64()),
            "n_a": pc.cast(t["n_a"], pa.int64()),
            "n_p": pc.cast(t["n_p"], pa.int64()),
            "n_title": pc.cast(t["n_title"], pa.int64())}),
        batch_format="pyarrow")


def link_shape_report(pages_path: str) -> rd.Dataset:
    """Histogram of raw href SHAPES across the corpus (absolute /
    protocol-relative / root-relative / fragment / relative) -- the
    audit behind the tiered vectorized canonicalizer: the share of each
    class says which resolution tier real pages would hit (and the
    protocol-relative row guards the ADVICE-r4 class explicitly).
    Vectorized end to end: one split-pattern href explode + one Arrow
    regex classification per batch, tiny groupby."""
    from ray.data.aggregate import Sum as _Sum

    from pomp_ray.functions.textfns import extract_hrefs_batch

    def partial(t: pa.Table) -> pa.Table:
        hrefs, _parent = extract_hrefs_batch(t["html"])
        if len(hrefs) == 0:
            return pa.table({"shape": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        absolute = pc.match_substring_regex(hrefs, pattern=r"^https?://")
        proto = pc.match_substring_regex(hrefs, pattern=r"^//")
        root = pc.match_substring_regex(hrefs, pattern=r"^/")
        frag = pc.match_substring_regex(hrefs, pattern=r"^#")
        shape = np.full(len(hrefs), "relative", object)
        # precedence mirrors the oracle's CASE order
        shape[frag.to_numpy(zero_copy_only=False)] = "fragment"
        shape[root.to_numpy(zero_copy_only=False)] = "root_relative"
        shape[proto.to_numpy(zero_copy_only=False)] = "protocol_relative"
        shape[absolute.to_numpy(zero_copy_only=False)] = "absolute"
        vc = pa.array(shape, pa.string()).value_counts()
        return pa.table({"shape": pc.cast(vc.field("values"), pa.string()),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    agg = rd.read_parquet(pages_path, columns=["html"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("shape").aggregate(_Sum("n", alias_name="n_links"))
    return agg.map_batches(
        lambda t: pa.table({"shape": t["shape"],
                            "n_links": pc.cast(t["n_links"], pa.int64())}),
        batch_format="pyarrow")
