"""Enqueue pipeline: link candidates -> next round's frontier.

This is the distributed form of pomp's request-admission path: adapter
middleware normalization (UrllibAdapterMiddleware str->request promotion,
SURVEY.md M7), user dedup middleware (here: the mandated exact seen-set,
T3/D1), plus the north_rule robots gate that pomp lacks.

Order of operations (must match pomp_ray.core.oracle.try_enqueue exactly):
  1. resolve relative hrefs against the parent url + canonicalize + host
  2. intra-round dedup keeping the FIRST occurrence in enqueue order
     (min (parent_priority desc -> parent_seq, link_idx)) -- a
     groupby(canon_url) shuffle (SURVEY.md A4/D2)
  3. robots disallow flag (broadcast small table -- J2)
  4. seen-set check-and-add on the shard pool (blocked urls are added too,
     so they are never re-attempted; already-seen rows drop out)
  5. blocked rows -> errors table; survivors get their global ``seq``
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from pomp_ray.functions.textfns import (
    url_canonicalize,
    url_host,
    url_join,
    url_path,
)
from pomp_ray.state.seen import check_and_add_via


# Vectorized fast path: absolute urls already in canonical shape (lowercase
# scheme://host/path, no port/query/fragment/userinfo) are canonical
# as-is and urljoin is the identity on them, so one Arrow regex extracts
# canon/host/path for the whole batch; only the residue (relative hrefs,
# ports, queries, uppercase) falls back to the per-row library functions.
# Equivalence with the per-row path is asserted in tests/test_textfns.py.
_FAST_EXTRACT = r"^(?:http|https)://(?P<host>[a-z0-9.-]+)(?P<path>/[^#?@\s]*)$"

# Second vectorized tier: ROOT-RELATIVE hrefs ("/a/b") against a base url
# already in canonical absolute shape resolve to scheme://base_host + href
# (urljoin ignores the base path for root-relative refs), and the result
# is already canonical -- so the whole class joins via two Arrow
# binary_join kernels.  Conservative char set (no query/fragment/colon):
# anything else falls through to the per-row library path.  The second
# character must NOT be another slash: protocol-relative hrefs
# ("//other.test/x") resolve to a DIFFERENT host and must take the
# per-row urljoin path (ADVICE r4 high; RE2 has no lookahead, so the
# bare-root "/" case is a separate alternative).
_REL_FAST = r"^/$|^/[^/#?@:\s][^#?@:\s]*$"
_BASE_EXTRACT = r"^(?P<scheme>https?)://(?P<host>[a-z0-9.-]+)(?:/[^#?@\s]*)?$"


def _record_canon_stats(stats_dir: str, urls: list,
                        n: int, n_slow: int) -> None:
    """Per-batch fast-path coverage sidecar (same discipline as the
    frontier ``.stats.json`` files): written ONLY when the per-row
    Python fallback fired, under a content-derived name so task retries
    overwrite idempotently.  The crawl driver sums the directory into
    the round JSON's ``n_canon_slow`` -- the guard against a messy
    real-web corpus silently degrading the hot path (VERDICT r3)."""
    import hashlib
    import json as _json
    os.makedirs(stats_dir, exist_ok=True)
    key = hashlib.md5(
        ("|".join(map(str, urls[:8])) + f":{n}:{n_slow}").encode()
    ).hexdigest()[:16]
    path = os.path.join(stats_dir, f"canon-{key}.json")
    tmp = f"{path}.tmp{os.getpid()}"
    with open(tmp, "w") as f:
        _json.dump({"n": n, "n_slow": n_slow}, f)
    os.replace(tmp, path)


def canonicalize_batch(batch: pa.Table,
                       stats_dir: str | None = None) -> pa.Table:
    """Resolve + canonicalize candidate urls; adds canon_url, host, path.
    With ``stats_dir``, batches that fall off the vectorized fast path
    leave a coverage sidecar (see ``_record_canon_stats``)."""
    urls = batch["url"]
    ex = pc.extract_regex(urls, pattern=_FAST_EXTRACT)
    fast = pc.is_valid(ex)
    n = batch.num_rows
    n_fast = int(pc.sum(fast).as_py() or 0)
    exb = None
    covered, n_cov = fast, n_fast
    if n_fast < n and "base" in batch.column_names:
        exb = pc.extract_regex(batch["base"], pattern=_BASE_EXTRACT)
        rel = pc.and_(pc.invert(fast), pc.and_(
            pc.match_substring_regex(urls, pattern=_REL_FAST),
            pc.is_valid(exb)))
        covered = pc.or_(fast, rel)
        n_cov = int(pc.sum(covered).as_py() or 0)
    if stats_dir is not None and n_cov < n:
        _record_canon_stats(stats_dir, urls.to_pylist(), n, n - n_cov)
    if n_fast == n:
        canon_arr = pc.cast(urls, pa.string())
        host_arr = pc.struct_field(ex, "host")
        path_arr = pc.struct_field(ex, "path")
    elif n_cov == n:
        # fast + root-relative tiers cover the batch: all-Arrow merge
        scheme = pc.struct_field(exb, "scheme")
        bh = pc.struct_field(exb, "host")
        u_str = pc.cast(urls, pa.string())
        hostpath = pc.binary_join_element_wise(bh, u_str, "")
        rel_canon = pc.binary_join_element_wise(scheme, hostpath, "://")
        canon_arr = pc.if_else(fast, u_str, rel_canon)
        host_arr = pc.if_else(fast, pc.struct_field(ex, "host"), bh)
        path_arr = pc.if_else(fast, pc.struct_field(ex, "path"), u_str)
    else:
        fast_mask = fast.to_pylist() if hasattr(fast, "to_pylist") else fast
        urls_py = urls.to_pylist()
        bases_py = (batch["base"].to_pylist()
                    if "base" in batch.column_names else [None] * n)
        hosts_fast = pc.struct_field(ex, "host").to_pylist()
        paths_fast = pc.struct_field(ex, "path").to_pylist()
        canon, hosts, paths = [], [], []
        for i, (u, b, ok) in enumerate(zip(urls_py, bases_py, fast_mask)):
            if ok:
                canon.append(u)
                hosts.append(hosts_fast[i])
                paths.append(paths_fast[i])
            else:
                c = url_canonicalize(url_join(b, u) if b else u)
                canon.append(c)
                hosts.append(url_host(c))
                paths.append(url_path(c))
        canon_arr = pa.array(canon, pa.string())
        host_arr = pa.array(hosts, pa.string())
        path_arr = pa.array(paths, pa.string())
    batch = batch.append_column("canon_url", canon_arr)
    batch = batch.append_column("host", host_arr)
    return batch.append_column("path", path_arr)


def make_robots_flag(disallow: dict[str, list[str]],
                     allow: dict[str, list[str]] | None = None):
    """Broadcast-small-side robots gate: adds a ``blocked`` bool column.
    ``disallow``/``allow`` map host -> path rules (tiny vs the frontier;
    at production scale ship them via ray.put and read in actor
    __init__).  RFC 9309 decision, mirroring
    functions.robotsfns.robots_blocked: among all matching rules the
    longest raw pattern wins, allow beats disallow on equal length.
    Vectorized per (host, rule) -- one equality mask + one starts_with
    (prefix fast path) or match_substring_regex (wildcard rule) kernel
    per rule, never a Python loop over rows -- and the rule loop is
    RESTRICTED to hosts actually present in the batch (one unique()
    pass), so per-batch cost scales with the batch's hosts, not the
    global rule-table size."""
    from pomp_ray.functions.robotsfns import rule_regex

    by_host = {h: prefs for h, prefs in disallow.items() if prefs}
    allow = allow or {}

    def robots_flag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if not by_host or n == 0:
            return batch.append_column(
                "blocked", pa.array(np.zeros(n, bool), pa.bool_()))
        hosts = batch["host"]
        paths = batch["path"]
        present = pc.unique(hosts.combine_chunks()
                            if isinstance(hosts, pa.ChunkedArray)
                            else hosts).to_pylist()
        best_dis = np.full(n, -1, np.int64)
        best_allow = np.full(n, -1, np.int64)
        for h in present:
            dis_rules = by_host.get(h, ())
            if not dis_rules:
                continue   # no disallow -> nothing can block this host
            hm = pc.equal(hosts, h)
            for rules, best in ((dis_rules, best_dis),
                                (allow.get(h, ()), best_allow)):
                for rule in rules:
                    pat = rule_regex(rule)
                    if pat is None:       # plain prefix: fast path
                        pm = pc.starts_with(paths, pattern=rule)
                    else:                 # RFC 9309 wildcard rule
                        pm = pc.match_substring_regex(paths, pattern=pat)
                    m = np.asarray(pc.and_(hm, pm).combine_chunks(),
                                   dtype=bool)
                    np.maximum(best, np.where(m, len(rule), -1), out=best)
        blocked = best_dis > best_allow
        return batch.append_column("blocked", pa.array(blocked, pa.bool_()))

    return robots_flag


class HashPriority:
    """Deterministic md5-bucket link scorer for ``CrawlConfig.priority_fn``
    (mode="best"): priority = md5(canon_url) first byte mod ``n_buckets``.
    md5, NOT builtin hash() -- per-process hash salting would score the
    same url differently across workers/retries.  Importable-class form so
    instances pickle by reference into map_batches tasks."""

    def __init__(self, n_buckets: int = 7):
        self.n_buckets = n_buckets

    def __call__(self, urls: list[str], depths: list[int]) -> list[int]:
        import hashlib
        n = self.n_buckets
        return [int(hashlib.md5(u.encode("utf-8", "surrogateescape"))
                    .hexdigest()[:2], 16) % n for u in urls]


class HostPriority:
    """Focused-crawl link scorer for ``CrawlConfig.priority_fn``
    (mode="best"): a domain whitelist -- links into ``preferred`` hosts
    get priority ``boost``, everything else 0, so the priority queue
    drains the focus domains first while still (eventually) reaching the
    rest.  The classic domain-focused crawling discipline (Chakrabarti
    et al. 1999's topical focus, reduced to its host-whitelist form).
    Pure per-URL function: deterministic across workers/retries, no
    state, pickles by reference."""

    def __init__(self, preferred, boost: int = 1):
        self.preferred = frozenset(preferred)
        self.boost = boost

    def __call__(self, urls: list[str], depths: list[int]) -> list[int]:
        from urllib.parse import urlsplit
        pref, boost = self.preferred, self.boost
        return [boost if urlsplit(u).hostname in pref else 0
                for u in urls]


class PageRankPriority:
    """Rank-informed crawl scorer for ``CrawlConfig.priority_fn``
    (mode="best"): link priority = the quantized PageRank of the link
    TARGET's host, learned from a PRIOR crawl
    (``pipelines.graph.host_pagerank_from_crawl``) -- the classic
    continuous-crawl loop (Cho/Garcia-Molina 2000's importance-driven
    ordering): crawl, rank, let authority steer the next crawl.

    Ranks quantize to ``n_levels`` integer priorities by linear scale
    over [0, max_rank] (pure function of the committed rank table, so
    deterministic across workers/retries); unknown hosts score 0 and are
    still reached eventually, like any best-first tail.  The host->level
    dict is O(hosts) and pickles into tasks by value -- same broadcast
    posture as the robots maps."""

    def __init__(self, host_rank_fp: dict[str, int], n_levels: int = 4):
        self.n_levels = n_levels
        top = max(host_rank_fp.values(), default=0)
        self.levels = ({h: min(n_levels - 1, int(r) * n_levels // (top + 1))
                        for h, r in host_rank_fp.items()} if top > 0 else
                       dict.fromkeys(host_rank_fp, 0))

    @classmethod
    def from_rank_table(cls, rank_table, n_levels: int = 4):
        """From a (host, rank_fp) arrow table / list of rows, e.g.
        ``host_pagerank_from_crawl`` output."""
        if hasattr(rank_table, "to_pylist"):
            rank_table = rank_table.to_pylist()
        return cls({r["host"]: int(r["rank_fp"]) for r in rank_table},
                   n_levels=n_levels)

    def __call__(self, urls: list[str], depths: list[int]) -> list[int]:
        from urllib.parse import urlsplit
        lv = self.levels
        return [lv.get(urlsplit(u).hostname, 0) for u in urls]


def dedup_first_in_order(cands: rd.Dataset, mode: str) -> rd.Dataset:
    """Keep, per canon_url, the candidate that pomp's serial loop would
    have enqueued: the first in round enqueue order.  BFS enqueue order is
    (parent_priority desc, parent_seq asc, link_idx asc); DFS flips the
    parent_seq direction (LIFO parents fetch in descending seq); best-first
    parents fetch in the BFS total order, so it shares the BFS tiebreak."""
    asc = [False, False, True] if mode == "dfs" else [False, True, True]

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["parent_priority", "parent_seq", "link_idx"],
            ascending=asc,
        )
        return g.head(1)

    return cands.groupby("canon_url").map_groups(first, batch_format="pandas")


def dedup_local(batch: pa.Table) -> pa.Table:
    """Scale-mode cheap dedup: first occurrence per canon_url within the
    batch only; the seen shards resolve cross-batch duplicates (arbitrary
    winner -- same SET, relaxed order, exactly like pomp's own concurrent
    downloader tests relax ordering).  First-occurrence mask via pandas'
    C hash table (keeps the first, like the old Python set loop)."""
    if batch.num_rows == 0:
        return batch
    dup = pd.Index(batch["canon_url"].to_pandas()).duplicated(keep="first")
    return batch.filter(pa.array(~dup, pa.bool_()))


class SeenFilter:
    """map_batches hook around the seen-shard actor pool: check_and_add
    every candidate (blocked ones included), keep only NEW rows.  Runs
    inside workers; the per-shard actor method is atomic, so no
    double-enqueue races."""

    def __init__(self, shards: list):
        self.shards = shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        mask = check_and_add_via(self.shards, batch["canon_url"].to_pylist())
        return batch.filter(pa.array(mask, pa.bool_()))


class ContentDedupGate:
    """map_batches gate for content-dedup crawls (CrawlConfig
    ``dedup_content``): drop rows whose extracted-text digest was
    committed in a PRIOR round, and stage this round's digests on the
    digest shards for the round-end commit (round-snapshot semantics --
    pages fetched in the same wave never see each other's digest; the
    serial spec lives in core/oracle.py).  This is the classic
    calendar-trap / mirror defense: a page whose content was already
    crawled still emits its item but contributes NO new frontier."""

    def __init__(self, shards: list, text_col: str = "text",
                 drop_text: bool = False):
        self.shards = shards
        self.text_col = text_col
        self.drop_text = drop_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = batch
        if batch.num_rows:
            from pomp_ray.state.seen import contains_stage_via
            texts = batch[self.text_col].to_pylist()
            dup = contains_stage_via(self.shards, texts)
            out = batch.filter(
                pa.array([not d for d in dup], pa.bool_()))
        if self.drop_text and self.text_col in out.column_names:
            out = out.drop_columns([self.text_col])
        return out


def split_blocked(frontier_cands: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(accepted, blocked) split after the seen filter."""
    blocked_mask = frontier_cands["blocked"]
    return (
        frontier_cands.filter(pc.invert(blocked_mask)),
        frontier_cands.filter(blocked_mask),
    )


def make_url_filter(allow: str | None, deny: str | None):
    """Batch filter over canonical LINK urls (CrawlConfig url_allow /
    url_deny; the Scrapy LinkExtractor allow/deny shape).  Search
    semantics; rejected rows vanish before dedup/seen -- never marked
    seen, never errored.  Returns None when no filter is configured."""
    if allow is None and deny is None:
        return None

    def flt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        m = None
        if allow is not None:
            m = pc.match_substring_regex(t["canon_url"], allow)
        if deny is not None:
            d = pc.invert(pc.match_substring_regex(t["canon_url"], deny))
            m = d if m is None else pc.and_(m, d)
        return t.filter(m)

    return flt


def same_host_filter(t: pa.Table) -> pa.Table:
    """Stay-on-site gate (CrawlConfig same_host_only): keep only link
    candidates whose canonical host equals their parent page's host --
    the site-mirroring crawl scope.  Vectorized via the fast-path host
    regex over the (canonical) base urls; per-row fallback for any
    residue.  Runs after canonicalize_batch, before dedup/seen, so
    rejected links are never marked seen (same contract as the
    allow/deny filters)."""
    if t.num_rows == 0:
        return t
    ex = pc.extract_regex(t["base"], pattern=_FAST_EXTRACT)
    bh = pc.struct_field(ex, "host")
    if int(pc.sum(pc.is_null(bh)).as_py() or 0):
        bh = pa.array([url_host(b) if b else "" for b in
                       t["base"].to_pylist()], pa.string())
    return t.filter(pc.fill_null(pc.equal(t["host"], bh), False))


class SitemapFreshnessPriority:
    """Freshness-informed crawl scorer for ``CrawlConfig.priority_fn``
    (mode="best"): link priority from the XML sitemap staleness report
    (``sources.corpus.sitemap_stale_report``) -- stale entries (lastmod
    postdating the stored capture, or never crawled) outrank
    fresh-listed urls, which outrank unlisted ones.  The
    sitemap-lastmod sibling of ``PageRankPriority``'s authority loop
    (and of ``recrawl_intervals``' change-rate policy): publish dates
    steer the recrawl.  The url->level dict is sitemap-scale and
    pickles by value -- the robots-map broadcast posture."""

    def __init__(self, url_priority: dict[str, int]):
        self.pri = dict(url_priority)

    @classmethod
    def from_stale_report(cls, report_rows, stale_boost: int = 2,
                          fresh_boost: int = 1):
        if hasattr(report_rows, "to_pylist"):
            report_rows = report_rows.to_pylist()
        return cls({r["url"]: (stale_boost if r["stale"] else fresh_boost)
                    for r in report_rows})

    def __call__(self, urls: list[str], depths: list[int]) -> list[int]:
        pri = self.pri
        return [pri.get(u, 0) for u in urls]
