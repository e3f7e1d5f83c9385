"""Crawl compliance auditing over a finished checkpoint.

``robots_audit`` is the proof a production crawl owes its operators:
per host, how many pages were visited, how many candidate urls the
robots gate blocked, and -- the invariant -- how many VISITED urls
match a disallow prefix (must be zero; a nonzero count means the
politeness gate leaked).  pomp leaves robots handling to user
middleware; the north rule makes it engine surface, so the audit is
engine surface too.

Scale shape: the checkpoint's visited/errors parquet trees are read as
Datasets (pruned to the url/stage columns), hosts and paths split with
one Arrow regex pass per batch, prefix checks run per (host-in-batch,
prefix) with ``pc.starts_with`` (rule table is robots-scale and
broadcast; the enqueue-gate discipline), and per-batch partial counts
reduce through ONE groupby(host).  Nothing per-row in Python, nothing
driver-side but the final host-count-sized table.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Sum

_HOST_RE = r"^[a-z]+://(?P<host>[^/]+)/"
_PATH_RE = r"^[a-z]+://[^/]+(?P<path>/.*)$"


def _split_urls(urls) -> tuple[pa.Array, pa.Array]:
    host = pc.struct_field(pc.extract_regex(urls, pattern=_HOST_RE),
                           "host")
    path = pc.struct_field(pc.extract_regex(urls, pattern=_PATH_RE),
                           "path")
    return host, path


def robots_audit(ckpt_dir: str, robots_path: str,
                 num_partitions: int = 4) -> pa.Table:
    """(host, n_visited, n_blocked, n_violations) over a finished crawl
    checkpoint: hosts from visited and robots-blocked errors unioned;
    ``n_violations`` counts visited urls matching a disallow prefix for
    their own host (the politeness-gate leak detector -- zero on any
    conformant crawl)."""
    from pomp_ray.crawl import read_errors, read_visited

    rules: dict[str, list[str]] = {}
    if robots_path and os.path.exists(robots_path):
        for r in pq.read_table(robots_path).to_pylist():
            rules[r["host"]] = list(r.get("disallow_prefixes") or [])

    def visited_partial(t: pa.Table) -> pa.Table:
        host, path = _split_urls(t["url"])
        viol = pa.array([False] * t.num_rows)
        for h, prefixes in rules.items():
            if not prefixes:
                continue
            in_host = pc.fill_null(pc.equal(host, h), False)
            if int(pc.sum(in_host).as_py() or 0) == 0:
                continue       # rule loop scales with the batch's hosts
            for p in prefixes:
                hit = pc.and_(in_host, pc.fill_null(
                    pc.starts_with(path, pattern=p), False))
                viol = pc.or_(viol, hit)
        tbl = pa.table({
            "host": host,
            "n_visited": pa.array([1] * t.num_rows, pa.int64()),
            "n_blocked": pa.array([0] * t.num_rows, pa.int64()),
            "n_violations": pc.cast(viol, pa.int64())})
        return tbl.group_by("host").aggregate(
            [("n_visited", "sum"), ("n_blocked", "sum"),
             ("n_violations", "sum")]).rename_columns(
            ["host", "n_visited", "n_blocked", "n_violations"])

    def errors_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["stage"], "robots"))
        host, _ = _split_urls(t["url"])
        tbl = pa.table({
            "host": host,
            "n_visited": pa.array([0] * t.num_rows, pa.int64()),
            "n_blocked": pa.array([1] * t.num_rows, pa.int64()),
            "n_violations": pa.array([0] * t.num_rows, pa.int64())})
        return tbl.group_by("host").aggregate(
            [("n_visited", "sum"), ("n_blocked", "sum"),
             ("n_violations", "sum")]).rename_columns(
            ["host", "n_visited", "n_blocked", "n_violations"])

    # the logical readers assemble visited/errors across BOTH checkpoint
    # layouts (driver-exact rounds and scale rounds with in-band errors);
    # from_arrow re-distributes the counting passes
    vis = rd.from_arrow(read_visited(ckpt_dir).select(["url"])) \
        .map_batches(visited_partial, batch_format="pyarrow")
    errs = rd.from_arrow(read_errors(ckpt_dir).select(["url", "stage"])) \
        .map_batches(errors_partial, batch_format="pyarrow")
    agg = vis.union(errs).groupby("host").aggregate(
        Sum("n_visited", alias_name="n_visited"),
        Sum("n_blocked", alias_name="n_blocked"),
        Sum("n_violations", alias_name="n_violations"))
    out = agg.map_batches(
        lambda t: pa.table({
            "host": t["host"],
            "n_visited": pc.cast(t["n_visited"], pa.int64()),
            "n_blocked": pc.cast(t["n_blocked"], pa.int64()),
            "n_violations": pc.cast(t["n_violations"], pa.int64())}),
        batch_format="pyarrow")
    tbl = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow"))
        or [pa.table({"host": pa.array([], pa.string()),
                      "n_visited": pa.array([], pa.int64()),
                      "n_blocked": pa.array([], pa.int64()),
                      "n_violations": pa.array([], pa.int64())})])
    return tbl.sort_by("host")


def crawl_coverage(ckpt_dir: str, pages_path: str,
                   num_partitions: int = 4) -> pa.Table:
    """Per-host crawl coverage: corpus pages vs pages actually visited,
    with the ratio in ppm (integer floor) -- the completeness report a
    recrawl planner reads first (hosts far below 1.0 hide robots walls,
    traps, budget cuts or disconnected subgraphs).

    Shape: both sides reduce to (host, count) partials in map_batches
    (visited via the layout-agnostic logical reader, corpus straight off
    the pages parquet url column -- html never read), one groupby each,
    one full_outer join; unvisited hosts surface with coverage 0."""
    from pomp_ray.crawl import read_visited

    def count_partial(col: str):
        def fn(t: pa.Table) -> pa.Table:
            host, _ = _split_urls(t["url"])
            tbl = pa.table({"host": host,
                            col: pa.array([1] * t.num_rows, pa.int64())})
            return tbl.group_by("host").aggregate(
                [(col, "sum")]).rename_columns(["host", col])
        return fn

    vis = rd.from_arrow(read_visited(ckpt_dir).select(["url"])) \
        .map_batches(count_partial("n_visited"), batch_format="pyarrow") \
        .groupby("host").aggregate(Sum("n_visited", alias_name="n_visited")) \
        .repartition(2).materialize()
    corpus = rd.read_parquet(pages_path, columns=["url"]) \
        .map_batches(count_partial("n_pages"), batch_format="pyarrow") \
        .groupby("host").aggregate(Sum("n_pages", alias_name="n_pages")) \
        .repartition(2).materialize()
    rows = corpus.join(vis, join_type="full_outer", on=("host",),
                       num_partitions=num_partitions).take_all()
    rows.sort(key=lambda r: r["host"])
    out_h, out_p, out_v, out_ppm = [], [], [], []
    for r in rows:
        p = int(r["n_pages"] or 0)
        v = int(r["n_visited"] or 0)
        out_h.append(r["host"]); out_p.append(p); out_v.append(v)
        out_ppm.append(1_000_000 * v // p if p else 0)
    return pa.table({
        "host": pa.array(out_h, pa.string()),
        "n_pages": pa.array(out_p, pa.int64()),
        "n_visited": pa.array(out_v, pa.int64()),
        "coverage_ppm": pa.array(out_ppm, pa.int64())})


def length_by_depth(ckpt_dir: str) -> pa.Table:
    """Extracted-text volume per crawl depth (page count + total chars,
    exact integer sums) -- does content thin out as the crawl goes
    deeper?  The depth-budget tuning chart.  Per-batch partials over the
    streaming items reader, one tiny groupby."""
    from pomp_ray.crawl import items_dataset

    def partial(t: pa.Table) -> pa.Table:
        ln = pc.utf8_length(t["text"])
        df = pa.table({
            "depth": pc.cast(t["depth"], pa.int64()),
            "n_pages": pa.array([1] * t.num_rows, pa.int64()),
            "total_chars": pc.cast(ln, pa.int64())})
        return df.group_by("depth").aggregate(
            [("n_pages", "sum"), ("total_chars", "sum")]).rename_columns(
            ["depth", "n_pages", "total_chars"])

    ds = items_dataset(ckpt_dir)
    rows = ds.map_batches(
        lambda t: partial(t.filter(t["fetch_ok"])
                          if "fetch_ok" in t.column_names else t),
        batch_format="pyarrow") \
        .groupby("depth").aggregate(
            Sum("n_pages", alias_name="n_pages"),
            Sum("total_chars", alias_name="total_chars")).take_all()
    rows.sort(key=lambda r: r["depth"])
    return pa.table({
        "depth": pa.array([int(r["depth"]) for r in rows], pa.int64()),
        "n_pages": pa.array([int(r["n_pages"]) for r in rows], pa.int64()),
        "total_chars": pa.array([int(r["total_chars"]) for r in rows],
                                pa.int64())})


def host_discovery_curve(ckpt_dir: str) -> pa.Table:
    """First round each host was VISITED plus its total visit count --
    the frontier-expansion curve (how fast does the crawl break out of
    its seed hosts?).  Min/Sum partials over the visited reader."""
    from ray.data.aggregate import Min as _Min

    from pomp_ray.crawl import read_visited

    def partial(t: pa.Table) -> pa.Table:
        host, _ = _split_urls(t["url"])
        df = pa.table({
            "host": host,
            "first_round": pc.cast(t["round"], pa.int64()),
            "n_visited": pa.array([1] * t.num_rows, pa.int64())})
        return df.group_by("host").aggregate(
            [("first_round", "min"), ("n_visited", "sum")]) \
            .rename_columns(["host", "first_round", "n_visited"])

    rows = rd.from_arrow(read_visited(ckpt_dir).select(["url", "round"])) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("host").aggregate(
            _Min("first_round", alias_name="first_round"),
            Sum("n_visited", alias_name="n_visited")).take_all()
    rows.sort(key=lambda r: r["host"])
    return pa.table({
        "host": pa.array([r["host"] for r in rows], pa.string()),
        "first_round": pa.array([int(r["first_round"]) for r in rows],
                                pa.int64()),
        "n_visited": pa.array([int(r["n_visited"]) for r in rows],
                              pa.int64())})


def politeness_cap_audit(ckpt_dir: str, robots_path: str,
                         round_budget_s: float = 10.0) -> pa.Table:
    """Politeness-rate compliance audit: for every crawl-delay host,
    its per-round fetch counts must never exceed the derived cap
    ``max(1, floor(round_budget_s / delay))`` -- the crawl-delay leak
    detector beside ``robots_audit``'s disallow leak detector.  One row
    per capped host: rounds active, max per-round fetches, the cap,
    and the violation count (zero on any conformant crawl).

    Shape: the visited table reduces to per-(host, round) counts in one
    distributed groupby (the logical reader streams row groups); the
    tiny delay table stays a broadcast dict; the per-host rollup is
    O(capped hosts)."""
    import math

    from ray.data.aggregate import Count

    from pomp_ray.crawl import read_visited

    caps: dict[str, int] = {}
    if robots_path and os.path.exists(robots_path):
        for r in pq.read_table(robots_path).to_pylist():
            d = float(r.get("crawl_delay") or 0.0)
            if d > 0:
                caps[r["host"]] = max(1, math.floor(round_budget_s / d))
    vis = read_visited(ckpt_dir)
    host, _ = _split_urls(vis["url"])
    t = pa.table({"host": host, "round": vis["round"]})
    counts = rd.from_arrow(t).groupby(["host", "round"]).aggregate(
        Count(alias_name="n")).take_all()
    import collections
    per_host: dict = collections.defaultdict(list)
    for r in counts:
        if r["host"] in caps:
            per_host[r["host"]].append(int(r["n"]))
    hosts = sorted(caps)
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "n_rounds": pa.array([len(per_host[h]) for h in hosts],
                             pa.int64()),
        "max_per_round": pa.array(
            [max(per_host[h]) if per_host[h] else 0 for h in hosts],
            pa.int64()),
        "cap": pa.array([caps[h] for h in hosts], pa.int64()),
        "n_violations": pa.array(
            [sum(1 for n in per_host[h] if n > caps[h]) for h in hosts],
            pa.int64())})
