"""Round-synchronous distributed crawl loop -- the Ray-Data-native
re-expression of pomp's ``Pomp.pump(crawler)`` engine loop
(pomp/core/engine.py ~L60-160 [estimated]; SURVEY.md section 3.4).

Each round is one bounded Dataset pass over the frontier:

    read frontier_r -> politeness selection (groupby(host), salted at
    scale) -> fetch (broadcast corpus index, stateless tasks) -> parse
    (extract_items + next_requests in one vectorized stage) -> items
    parquet -> explode links -> canonicalize -> dedup -> robots gate ->
    seen-shard check_and_add -> seq -> frontier_{r+1} parquet ->
    seen snapshot -> atomic round commit

Two fidelity modes:

* ``exact_order=True`` -- reproduces the serial oracle bit-for-bit
  (deterministic dedup winners via a groupby(canon_url) shuffle, global
  seq via sorted zip_with_index).  This is the conformance mode pomp's
  ported e2e tests run against.
* ``exact_order=False`` -- scale mode, tuned for throughput: TWO Dataset
  executions per round.
    exec A: read frontier (+ deferred side files) -> politeness groupby
            (deferred rows written as deterministic per-group side files)
            -> fetch -> parse -> enrich -> write items/round-r
            (items rows carry fetch_ok + links; misses ARE the fetch
            errors -- no separate errors pass)
    exec B: read items -> explode links -> canonicalize -> robots flag ->
            local dedup -> seen-shard check_and_add -> write
            frontier/round-(r+1) (blocked rows stay in the file flagged
            ``blocked=True``: they are the robots-error records, and the
            next round's read filters them out)
  Same visited SET as exact mode (enqueue-time dedup makes the reachable
  set order-invariant), relaxed order -- the relaxation pomp's own
  concurrent-downloader tests accept.  Errors live in-band in scale mode
  (fetch_ok=False items rows / blocked frontier rows), so the
  process_exception_batch middleware hook fires only where error TABLES
  are produced (driver + exact paths, the pomp-parity modes).

Hybrid execution: rounds smaller than ``min_distributed_rows`` run on the
driver (pomp's serial engine, byte-identical semantics, no per-round
Dataset overhead -- deep-tree tail rounds and exact DFS are tiny); larger
rounds run distributed.  Tests exercise both paths explicitly.

Checkpoint layout (the north_rule "resumes from Parquet checkpoints of
frontier + seen-set state"; every round is committed by an atomically
renamed rounds/round-r.json marker; a crashed round is wiped and re-run):

    ckpt/frontier/round-NNNNNN/*.parquet   ckpt/deferred/round-NNNNNN/
    ckpt/items/round-NNNNNN/*.parquet      ckpt/errors/round-NNNNNN/
    ckpt/seen/seen-shardXXXX-roundNNNNNN.parquet
    ckpt/metrics/round-NNNNNN.parquet      ckpt/rounds/round-NNNNNN.json

Use ``read_items`` / ``read_visited`` / ``read_errors`` to assemble the
logical output tables from either mode's layout.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from pomp_ray import schemas
from pomp_ray.functions.textfns import (
    url_canonicalize,
    url_host,
    url_join,
    url_path,
)
from pomp_ray.functions.robotsfns import robots_blocked
from pomp_ray.stages.enqueue import (
    ContentDedupGate,
    SeenFilter,
    canonicalize_batch,
    dedup_first_in_order,
    dedup_local,
    make_robots_flag,
    make_url_filter,
    same_host_filter,
)
from pomp_ray.stages.fetch import CorpusIndex, make_fetch_fn
from pomp_ray.stages.order import zip_with_index_sorted
from pomp_ray.stages.parse import default_parse, explode_links, make_parse_batch
from pomp_ray.stages.politeness import (
    caps_from_delay,
    select_distributed,
    select_serial,
)
from pomp_ray.state.seen import SeenSet

FRONTIER_COLS = ["url", "canon_url", "host", "depth", "priority", "seq"]

# Uniform frontier-file schema across every writer (seed, driver rounds,
# exact zip path, scale exec B, deferred side files).  ``blocked`` rows are
# robots-refused urls kept in place as the error record; reads filter them.
FRONTIER_FILE_SCHEMA = pa.schema([
    ("url", pa.string()), ("canon_url", pa.string()), ("host", pa.string()),
    ("depth", pa.int32()), ("priority", pa.int32()), ("seq", pa.int64()),
    ("blocked", pa.bool_()),
])


def _cast_frontier(t: pa.Table) -> pa.Table:
    if "blocked" not in t.column_names:
        t = t.append_column("blocked",
                            pa.array([False] * t.num_rows, pa.bool_()))
    return schemas.cast_to(t, FRONTIER_FILE_SCHEMA)


@dataclass
class CrawlConfig:
    corpus_path: str
    ckpt_dir: str
    robots_path: str | None = None
    mode: str = "bfs"                  # "bfs" | "dfs" | "best"
    exact_order: bool = True
    round_budget_s: float = 10.0
    dfs_width: int = 1
    # "best" = priority-queue discipline (north_rule "priority queue"):
    # each round visits the best_width highest-priority frontier entries,
    # FIFO within equal priority (the BFS total order cut at a width).
    best_width: int = 64
    # Optional link scorer: picklable callable (canon_urls: list[str],
    # depths: list[int]) -> list[int], applied VECTORIZED per batch on
    # the enqueue path (seeds keep their explicit priority).  Drives the
    # "best" frontier order; valid in any mode.
    priority_fn: object = None
    # DFS rounds run distributed (width-limited exact rounds) only when
    # the width itself offers parallelism; a width-1 DFS is inherently
    # serial and stays on the driver fast path regardless of frontier size.
    dfs_distributed_min_width: int = 16
    max_depth: int | None = None
    max_rounds: int | None = None
    # Per-host PAGE budget (host quota): a host may be fetch-ATTEMPTED at
    # most this many times over the whole crawl.  Selection is capped at
    # the host's remaining quota each round; frontier rows of an
    # exhausted host are DROPPED as stage="host_budget" errors (never
    # deferred, so the crawl still terminates).  Spent counts live on
    # the driver (O(visited hosts), same posture as the robots maps) and
    # persist via each round's ``hosts_selected`` commit record.
    max_pages_per_host: int | None = None
    # Content dedup (the calendar-trap / mirror defense): pages whose
    # extracted-text md5 digest was seen in a PRIOR round are visited
    # and emit items but are NOT link-expanded.  Round-snapshot
    # semantics (digests commit at the round barrier; same-wave
    # duplicates all expand) -- the serial spec is core/oracle.py's
    # dedup_content branch; state lives in a second SeenSet shard pool
    # checkpointed under ckpt_dir/digests.
    dedup_content: bool = False
    # Priority aging (classic starvation fix for the priority-queue
    # discipline): every row a round DEFERS -- politeness overflow or
    # best/dfs width-cut tail -- gains this much priority before it
    # re-enters the frontier, so low-priority rows eventually outrank
    # fresh high-priority links instead of starving behind them.  0 =
    # off (pomp parity).  Serial spec: core/oracle.py priority_aging.
    priority_aging: int = 0
    # Link-scope regex filters (the Scrapy LinkExtractor allow/deny
    # shape): extracted LINKS whose canonical url fails the filter are
    # silently dropped at enqueue time, before dedup and the seen set
    # (never marked seen, never errored); seeds are exempt.  Search
    # semantics (re.search / pc.match_substring_regex).
    url_allow: str | None = None
    url_deny: str | None = None
    # Per-page outlink cap: only the FIRST N links in document order
    # expand (the classic frontier-growth / link-farm damper; items
    # still report the page's full n_links).  Applies before
    # canonicalization/dedup on every path -- driver loop slices the
    # link list, distributed chains filter link_idx < N.  None = off
    # (pomp parity).  Serial spec: core/oracle.py max_links_per_page.
    max_links_per_page: int | None = None
    # Bounded-frontier admission (the 10^10-frontier safety valve): if a
    # round ends with more than this many PENDING rows (new + deferred,
    # blocked error records excluded), only the best cap rows survive --
    # (priority desc, seq asc), the "best"-mode total order -- and the
    # overflow drops as stage="frontier_cap" errors.  Applied at the
    # round barrier on every path; the distributed cut is one Dataset
    # sort + split over the frontier files.  Serial spec:
    # core/oracle.py max_frontier_rows.  None = off (pomp parity).
    # NOTE scale mode assigns hash seqs, so the capped SURVIVOR SET
    # legitimately differs from the serial oracle's (the content-dedup
    # caveat family); driver/exact paths are bit-exact.
    max_frontier_rows: int | None = None
    # Stay-on-site scope: links leaving their parent page's host are
    # silently dropped at enqueue (seeds still plant any host) -- the
    # site-mirroring crawl.  Composes with the regex filters.
    same_host_only: bool = False
    # Global visited budget: stop scheduling NEW rounds once cumulative
    # visited >= this (round-granular -- the crossing round completes;
    # the only budget a wave-synchronous distributed crawl can honor).
    max_visited: int | None = None
    # Per-host fetch-error circuit breaker: once a host accumulates this
    # many FETCH errors across committed rounds (dead links, down
    # server, redirect loops -- robots blocks and budget drops never
    # count), its remaining frontier rows DROP through the host-cap
    # channel (cap forced to 0 -> stage="host_budget" errors, never
    # deferred), exactly like an exhausted page budget.  Trip state is
    # a round-start snapshot (wave-synchronous semantics), persists via
    # hosts_errored in round JSONs, and is resume-aware.  Serial spec:
    # core/oracle.py max_errors_per_host.
    max_errors_per_host: int | None = None
    # Global extracted-text byte budget: stop scheduling NEW rounds once
    # cumulative utf-8 bytes of visited pages' text >= this -- the
    # "collect until N bytes of corpus" target a training-data crawl
    # budgets (round-granular, like max_visited; resume-aware via the
    # n_text_bytes counter in committed round JSONs).  Serial spec:
    # core/oracle.py max_text_bytes.
    max_text_bytes: int | None = None
    n_seen_shards: int = 8
    # RAM prefilter per seen shard: "bloom" (default) or "cuckoo"
    # (deletion-capable; see state/approx.py + SeenSet.forget)
    seen_filter_kind: str = "bloom"
    n_salts: int = 1                   # max politeness salts/host (scale mode)
    politeness_group_rows: int = 4096  # target rows per (host,salt) group
    min_distributed_rows: int = 256    # below this a round runs driver-side
    fetch_batch_size: int = 4096
    # Min rows per read block (coalesce).  1024 balances wave-shaped
    # crawls (fewer, meatier fused fetch+parse+enrich tasks -- measured
    # +30%% BFS throughput vs 512) against parallelism; mega-rounds are
    # governed by the 4x-cpus block cap either way.
    target_block_rows: int = 1024
    # Fetch stage implementation for distributed rounds (SURVEY.md J1):
    #   "broadcast" -- ray.put corpus index once, stateless lookup tasks
    #                  (default; corpus must fit the object store)
    #   "actor"     -- CorpusFetcher actor pool (index built once per
    #                  actor in __init__; pomp ConcurrentDownloader shape)
    #   "join"      -- hash-partitioned Dataset.join against the corpus
    #                  parquet (the 100-TB path: nothing broadcast, both
    #                  sides shuffle once; driver never loads the corpus)
    fetch_strategy: str = "broadcast"
    fetch_concurrency: int = 4         # actor-pool size for "actor"
    join_num_partitions: int = 64      # shuffle partitions for "join"
    # Custom downloader seam (pomp BaseDownloader parity): a callable
    # class (e.g. stages.fetch.HttpFetcher) run as an actor pool; must
    # emit html + fetch_ok (optionally fetch_err / fetch_retryable /
    # fetch_attempts, which flow into the errors table).  Overrides
    # fetch_strategy when set.
    fetcher_cls: object = None
    fetcher_kwargs: dict = field(default_factory=dict)
    parse_fn: object = None            # ParseFn override (CrawlerSpec hook)
    enrich_fn: object = None           # optional batch fn applied to parsed rows
    # Ordered middleware chain (pomp BaseMiddleware parity, SURVEY.md
    # M4-M6): process_request_batch runs on selected frontier batches
    # before fetch; process_response_batch after fetch before parse.
    # Objects must be picklable (they ship into map_batches tasks).
    middlewares: tuple = ()


@dataclass
class CrawlSummary:
    rounds: int = 0
    n_visited: int = 0
    n_items: int = 0
    n_errors: int = 0
    n_seen: int = 0
    wall_s: float = 0.0
    per_round: list[dict] = field(default_factory=list)


class CrawlEngine:
    def __init__(self, cfg: CrawlConfig):
        self.cfg = cfg
        self.parse_fn = cfg.parse_fn or default_parse
        self.disallow: dict[str, list[str]] = {}
        self.allow: dict[str, list[str]] = {}
        self.delay: dict[str, float] = {}
        if cfg.robots_path and os.path.exists(cfg.robots_path):
            rt = pq.read_table(cfg.robots_path)
            for r in rt.to_pylist():
                self.disallow[r["host"]] = list(r.get("disallow_prefixes") or [])
                self.allow[r["host"]] = list(r.get("allow_prefixes") or [])
                self.delay[r["host"]] = float(r.get("crawl_delay") or 0.0)
        self.caps = caps_from_delay(self.delay, cfg.round_budget_s)
        # The broadcast corpus index is built LAZILY: join-strategy crawls
        # with min_distributed_rows=0 never touch it, so the driver never
        # materializes the corpus (the point of the join path at scale).
        self._index: CorpusIndex | None = None
        self._index_refs = None
        self.seen = SeenSet(cfg.n_seen_shards,
                            filter_kind=cfg.seen_filter_kind)
        # content-dedup digest set (same sharded-actor machinery keyed
        # by text digest instead of canonical url)
        self.digests = (SeenSet(cfg.n_seen_shards,
                                filter_kind=cfg.seen_filter_kind)
                        if cfg.dedup_content else None)
        self.seq_counter = 0
        # host -> fetch attempts so far (page-budget accounting)
        self.budget_spent: dict[str, int] = {}
        self.errors_by_host: dict[str, int] = {}
        # link-scope regex filters (driver path uses compiled re; the
        # distributed chains use the equivalent Arrow kernel stage)
        import re as _re
        self._allow_re = _re.compile(cfg.url_allow) if cfg.url_allow else None
        self._deny_re = _re.compile(cfg.url_deny) if cfg.url_deny else None
        # cumulative visited across resumes (global max_visited budget)
        self.visited_total = 0
        self.text_bytes_total = 0

    def _link_ok(self, canon: str) -> bool:
        if self._allow_re is not None and not self._allow_re.search(canon):
            return False
        if self._deny_re is not None and self._deny_re.search(canon):
            return False
        return True

    @property
    def index(self) -> CorpusIndex:
        if self._index is None:
            self._index = CorpusIndex.build(self.cfg.corpus_path)
        return self._index

    @property
    def index_refs(self):
        if self._index_refs is None:
            self._index_refs = self.index.put()
        return self._index_refs

    def _fetch_stage(self, selected: rd.Dataset) -> rd.Dataset:
        """Distributed fetch by configured strategy (SURVEY.md S2/S3/J1)."""
        cfg = self.cfg
        if cfg.fetcher_cls is not None:
            return selected.map_batches(
                cfg.fetcher_cls, fn_constructor_kwargs=cfg.fetcher_kwargs,
                concurrency=cfg.fetch_concurrency,
                batch_size=cfg.fetch_batch_size, batch_format="pyarrow")
        if cfg.fetch_strategy == "join":
            from pomp_ray.stages.fetch import fetch_via_join
            return fetch_via_join(selected, cfg.corpus_path,
                                  num_partitions=cfg.join_num_partitions)
        if cfg.fetch_strategy == "actor":
            from pomp_ray.stages.fetch import CorpusFetcher
            return selected.map_batches(
                CorpusFetcher, fn_constructor_args=(cfg.corpus_path,),
                concurrency=cfg.fetch_concurrency,
                batch_size=cfg.fetch_batch_size, batch_format="pyarrow")
        return selected.map_batches(
            make_fetch_fn(self.index_refs), batch_format="pyarrow",
            batch_size=cfg.fetch_batch_size)

    # ------------------------------------------------------------------ dirs
    def _dir(self, kind: str, rnd: int) -> str:
        return os.path.join(self.cfg.ckpt_dir, kind, f"round-{rnd:06d}")

    def _round_json(self, rnd: int) -> str:
        return os.path.join(self.cfg.ckpt_dir, "rounds", f"round-{rnd:06d}.json")

    def _commit_round(self, rnd: int, info: dict) -> None:
        os.makedirs(os.path.join(self.cfg.ckpt_dir, "rounds"), exist_ok=True)
        tmp = self._round_json(rnd) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(info, f)
        os.replace(tmp, self._round_json(rnd))

    def _write_table(self, table: pa.Table, kind: str, rnd: int,
                     name: str = "part-driver") -> None:
        d = self._dir(kind, rnd)
        os.makedirs(d, exist_ok=True)
        # Small row groups so Dataset reads can split one driver-written
        # file into many parallel blocks (a single giant row group caps
        # the whole downstream fetch+parse chain's parallelism).
        path = os.path.join(d, f"{name}.parquet")
        pq.write_table(table, path, row_group_size=8192)
        if kind == "frontier":
            _write_stats_sidecar(path, _frontier_stats(table))

    def _frontier_sources(self, rnd: int) -> list[str]:
        """Parquet files feeding round ``rnd``: its frontier dir plus any
        deferred side files written by the previous round's politeness."""
        files = sorted(glob.glob(os.path.join(self._dir("frontier", rnd),
                                              "*.parquet")))
        files += sorted(glob.glob(os.path.join(self._dir("deferred", rnd - 1),
                                               "*.parquet")))
        return files

    def _frontier_count(self, rnd: int) -> int:
        """Pending (non-blocked) rows for round ``rnd``, METADATA-ONLY in
        the steady state: every frontier/deferred writer (exec B's block
        writer, the politeness overflow files, seed, driver rounds)
        leaves a ``.stats.json`` sidecar with (n, n_blocked, host
        histogram), so the driver's per-round pass reads tiny JSON --
        never frontier columns -- even with salting on (the host
        histogram feeds politeness.derive_salt_counts).  Files without a
        sidecar (exact-mode Dataset writes) fall back to parquet
        row-group statistics, then a one/two-column read."""
        want_freq = (not self.cfg.exact_order and self.cfg.n_salts > 1
                     and self.caps)
        cols = ["blocked", "host"] if want_freq else ["blocked"]
        n = 0
        freq: dict[str, int] = {}
        for p in self._frontier_sources(rnd):
            sc = p[:-len(".parquet")] + ".stats.json"
            if os.path.exists(sc):
                with open(sc) as f:
                    st = json.load(f)
                n += st["n"] - st["n_blocked"]
                if want_freq:
                    for h, c in st["hosts"].items():
                        freq[h] = freq.get(h, 0) + c
                continue
            pf = pq.ParquetFile(p)
            if not want_freq and _stats_all_unblocked(pf):
                # parquet row-group statistics prove blocked is all-false:
                # metadata-only count, nothing read
                n += pf.metadata.num_rows
                continue
            t = pf.read(columns=cols)
            n += t.num_rows - int(pc.sum(t["blocked"]).as_py() or 0)
            if want_freq:
                vc = t.filter(pc.invert(t["blocked"]))["host"].value_counts()
                for v in vc:
                    h = v["values"].as_py()
                    freq[h] = freq.get(h, 0) + v["counts"].as_py()
        self._host_freq = freq
        return n

    def _apply_frontier_cap(self, rnd: int, info: dict) -> dict:
        """Bounded-frontier admission at the round barrier (serial spec:
        core/oracle.py max_frontier_rows): if the round left more than
        ``max_frontier_rows`` PENDING rows (new + deferred; in-band
        blocked error records excluded and preserved), keep the best cap
        rows by (priority desc, seq asc) via one distributed Dataset
        sort + split over the frontier files, drop the overflow as
        stage="frontier_cap" errors, and atomically swap the rewritten
        frontier dir in (deferred side files fold into it -- they were
        part of the capped pending set)."""
        cap = self.cfg.max_frontier_rows
        if cap is None or int(info.get("n_frontier_next", 0)) <= cap:
            return info
        next_rnd = rnd + 1
        files = self._frontier_sources(next_rnd)
        if not files:
            return info
        n_pending = int(info["n_frontier_next"])
        ds = rd.read_parquet(
            files, override_num_blocks=self._n_blocks(n_pending)) \
            .map_batches(_cast_frontier, batch_format="pyarrow") \
            .materialize()
        unblocked = ds.map_batches(
            lambda t: t.filter(pc.invert(t["blocked"])),
            batch_format="pyarrow")
        blocked = ds.map_batches(lambda t: t.filter(t["blocked"]),
                                 batch_format="pyarrow")
        s = unblocked.sort(["priority", "seq"],
                           descending=[True, False]).materialize()
        head, tail = s.split_at_indices([cap])
        tmp_dir = self._dir("frontier", next_rnd) + ".tmpcap"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        head.union(blocked).map_batches(
            _make_frontier_writer(tmp_dir),
            batch_format="pyarrow").take_all()
        errors_dir = self._dir("errors", rnd)

        def write_err(t: pa.Table) -> pa.Table:
            if t.num_rows:
                import hashlib
                os.makedirs(errors_dir, exist_ok=True)
                key = hashlib.md5(
                    t["seq"].combine_chunks().to_numpy().tobytes()
                ).hexdigest()[:16]
                pq.write_table(
                    _cap_errors(t, rnd),
                    os.path.join(errors_dir, f"cap-{key}.parquet"))
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        dropped = sum(r["n"] for r in tail.map_batches(
            write_err, batch_format="pyarrow").take_all())
        for d in (self._dir("frontier", next_rnd),
                  self._dir("deferred", rnd)):
            if os.path.isdir(d):
                shutil.rmtree(d)
        os.rename(tmp_dir, self._dir("frontier", next_rnd))
        info = dict(info)
        info["n_frontier_next"] = cap
        info["n_frontier_capped"] = dropped
        info["n_deferred"] = 0   # deferred rows folded into the cut
        info["n_errors"] = int(info.get("n_errors", 0)) + dropped
        return info

    # -------------------------------------------------------- driver enqueue
    def _enqueue_driver(self, cands: list[dict], rnd: int,
                        check_depth: bool = True) -> tuple[list[dict], list[dict]]:
        """Serial enqueue, bit-identical to oracle.try_enqueue over an
        ordered candidate list.  Returns (accepted frontier rows, errors)."""
        cfg = self.cfg
        ordered: list[dict] = []
        local: set[str] = set()
        for c in cands:
            full = url_join(c["base"], c["url"]) if c.get("base") else c["url"]
            canon = url_canonicalize(full)
            if not canon or canon in local:
                continue
            if not self._link_ok(canon):
                continue   # url_allow/url_deny: silent drop, never seen
            if cfg.same_host_only and c.get("base") \
                    and url_host(canon) != url_host(c["base"]):
                continue   # stay-on-site scope: cross-host links drop
            if check_depth and cfg.max_depth is not None and c["depth"] > cfg.max_depth:
                continue
            local.add(canon)
            ordered.append({**c, "canon_url": canon,
                            "host": url_host(canon), "path": url_path(canon)})
        mask = self.seen.check_and_add([c["canon_url"] for c in ordered])
        accepted, errors = [], []
        for c, is_new in zip(ordered, mask):
            if not is_new:
                continue
            if robots_blocked(c["path"],
                              self.disallow.get(c["host"], ()),
                              self.allow.get(c["host"], ())):
                errors.append({"url": c["canon_url"], "stage": "robots",
                               "exc_type": "RobotsDisallowed",
                               "message": c["path"], "retryable": False,
                               "round": rnd})
                continue
            accepted.append({
                "url": c["url"], "canon_url": c["canon_url"], "host": c["host"],
                "depth": c["depth"], "priority": c["priority"],
                "seq": self.seq_counter, "blocked": False,
            })
            self.seq_counter += 1
        if cfg.priority_fn is not None and accepted:
            # same link scoring as the distributed enqueue chain (this
            # method only ever admits LINK candidates; seeds go via seed())
            prios = cfg.priority_fn([a["canon_url"] for a in accepted],
                                    [a["depth"] for a in accepted])
            for a, p in zip(accepted, prios):
                a["priority"] = int(p)
        return accepted, errors

    def _frontier_table(self, rows: list[dict]) -> pa.Table:
        return pa.Table.from_pylist(rows, schema=FRONTIER_FILE_SCHEMA)

    # ------------------------------------------------------------------ seed
    def seed(self, seeds) -> int:
        """ENTRY_REQUESTS admission (SURVEY.md S1): same semantics as the
        link enqueue path, column-wise for large seed lists; seed order =
        seed row order regardless of priority (pomp enqueues
        ENTRY_REQUESTS in iteration order).

        ``seeds`` may be a list of dicts or a PARQUET PATH.  At 10^10-url
        scale a driver loop over the seed list is impossible, so scale
        mode routes paths and large lists through ``_seed_distributed``
        (the same vectorized enqueue chain links use); exact mode always
        takes the serial order-preserving path (loading the path first)."""
        cfg = self.cfg
        if isinstance(seeds, str) and cfg.exact_order:
            seeds = pq.read_table(seeds).to_pylist()
        if not cfg.exact_order and (
                isinstance(seeds, str)
                or len(seeds) >= max(4 * cfg.min_distributed_rows, 4096)):
            return self._seed_distributed(seeds)
        return self._seed_serial(seeds)

    def _seed_distributed(self, seeds) -> int:
        """Scale-mode seed admission as a Dataset pass: normalize ->
        canonicalize (vectorized fast path) -> local dedup -> robots flag
        -> seen-shard check_and_add -> hash seq -> sidecar-writing
        frontier blocks.  Admitted SET equals the serial path's; seed
        ORDER is relaxed (hash seqs) exactly like scale-mode link
        enqueue.  Robots-blocked seeds come back as (tiny) rows and land
        in errors/round-0, matching the serial layout."""
        import numpy as np

        cfg = self.cfg
        if isinstance(seeds, str):
            cols = None
            if os.path.isfile(seeds):
                avail = set(pq.ParquetFile(seeds).schema_arrow.names)
                cols = [c for c in ("url", "depth", "priority")
                        if c in avail]
            ds = rd.read_parquet(seeds, columns=cols)
        else:
            ds = rd.from_arrow(pa.table({
                "url": pa.array([s["url"] for s in seeds], pa.string()),
                "depth": pa.array([int(s.get("depth", 0)) for s in seeds],
                                  pa.int32()),
                "priority": pa.array(
                    [int(s.get("priority", 0)) for s in seeds], pa.int32()),
            }))

        def norm(t: pa.Table) -> pa.Table:
            n = t.num_rows
            out = {"url": pc.cast(t["url"], pa.string())}
            for c in ("depth", "priority"):
                out[c] = (pc.cast(t[c], pa.int32())
                          if c in t.column_names
                          else pa.array(np.zeros(n, np.int32), pa.int32()))
            return pa.table(out)

        front_dir = self._dir("frontier", 0)

        def write_split(t: pa.Table) -> pa.Table:
            ok = t.filter(pc.invert(t["blocked"]))
            if ok.num_rows:
                _write_frontier_part(front_dir, _hash_seq(ok))
            blk = t.filter(t["blocked"])
            return pa.table({"url": blk["canon_url"],
                            "message": blk["path"]})

        blocked_rows = (
            ds.map_batches(norm, batch_format="pyarrow")
            .map_batches(canonicalize_batch, batch_format="pyarrow")
            .map_batches(dedup_local, batch_format="pyarrow")
            .map_batches(make_robots_flag(self.disallow, self.allow),
                         batch_format="pyarrow")
            .map_batches(SeenFilter(self.seen.shards), batch_format="pyarrow")
            .map_batches(write_split, batch_format="pyarrow")
        ).take_all()
        if blocked_rows:
            errors = pa.Table.from_pylist(
                [{"url": r["url"], "stage": "robots",
                  "exc_type": "RobotsDisallowed", "message": r["message"],
                  "retryable": False, "round": 0} for r in blocked_rows],
                schema=schemas.ERRORS)
            self._write_table(errors, "errors", 0, name="part-robots-seed")
        n_frontier = self._frontier_count(0)
        self.seen.snapshot(os.path.join(cfg.ckpt_dir, "seen"), 0)
        os.makedirs(os.path.join(cfg.ckpt_dir, "rounds"), exist_ok=True)
        tmp = os.path.join(cfg.ckpt_dir, "rounds", "init.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"n_frontier": n_frontier,
                       "seq_counter": self.seq_counter,
                       "n_errors": len(blocked_rows)}, f)
        os.replace(tmp, os.path.join(cfg.ckpt_dir, "rounds", "init.json"))
        return n_frontier

    def _seed_serial(self, seeds: list[dict]) -> int:
        accepted_rows: dict[str, list] = {c: [] for c in FRONTIER_COLS}
        errors = []
        local: set[str] = set()
        ordered: list[tuple[str, str, str, int, int]] = []
        for s in seeds:
            canon = url_canonicalize(s["url"])
            if not canon or canon in local:
                continue
            local.add(canon)
            ordered.append((s["url"], canon, url_host(canon),
                            int(s.get("depth", 0)), int(s.get("priority", 0))))
        mask = self.seen.check_and_add([c[1] for c in ordered])
        for (url, canon, host, depth, prio), is_new in zip(ordered, mask):
            if not is_new:
                continue
            path = url_path(canon)
            if robots_blocked(path, self.disallow.get(host, ()),
                              self.allow.get(host, ())):
                errors.append({"url": canon, "stage": "robots",
                               "exc_type": "RobotsDisallowed", "message": path,
                               "retryable": False, "round": 0})
                continue
            accepted_rows["url"].append(url)
            accepted_rows["canon_url"].append(canon)
            accepted_rows["host"].append(host)
            accepted_rows["depth"].append(depth)
            accepted_rows["priority"].append(prio)
            accepted_rows["seq"].append(self.seq_counter)
            self.seq_counter += 1
        accepted = pa.table(
            {**{k: accepted_rows[k] for k in FRONTIER_COLS},
             "blocked": [False] * len(accepted_rows["url"])},
        ).cast(FRONTIER_FILE_SCHEMA) if accepted_rows["url"] else \
            FRONTIER_FILE_SCHEMA.empty_table()
        self._write_table(accepted, "frontier", 0)
        if errors:
            self._write_table(
                pa.Table.from_pylist(errors, schema=schemas.ERRORS), "errors", 0,
                name="part-robots-seed")
        self.seen.snapshot(os.path.join(self.cfg.ckpt_dir, "seen"), 0)
        os.makedirs(os.path.join(self.cfg.ckpt_dir, "rounds"), exist_ok=True)
        tmp = os.path.join(self.cfg.ckpt_dir, "rounds", "init.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"n_frontier": accepted.num_rows,
                       "seq_counter": self.seq_counter,
                       "n_errors": len(errors)}, f)
        os.replace(tmp, os.path.join(self.cfg.ckpt_dir, "rounds", "init.json"))
        return accepted.num_rows

    def _round_width(self) -> int | None:
        """Per-round selection width of the queue discipline: dfs_width
        for LIFO, best_width for the priority queue, unbounded for BFS."""
        cfg = self.cfg
        if cfg.mode == "dfs":
            return cfg.dfs_width
        if cfg.mode == "best":
            return cfg.best_width
        return None

    def _round_caps(self):
        """Effective per-host selection caps for the coming round: the
        politeness caps alone, or -- when ``max_pages_per_host`` is set --
        a ``BudgetCaps`` folding in each spent host's remaining quota
        (min(politeness cap, remaining); <= 0 marks the host exhausted)
        with the full budget as the default for untouched hosts."""
        budget = self.cfg.max_pages_per_host
        breaker = self.cfg.max_errors_per_host
        tripped = (set() if breaker is None else
                   {h for h, n in self.errors_by_host.items()
                    if n >= breaker})
        if budget is None:
            if not tripped:
                return self.caps
            # breaker only: tripped hosts get cap 0 (the budget drop
            # channel); everything else keeps its politeness cap
            eff0 = dict(self.caps)
            for h in tripped:
                eff0[h] = 0
            return eff0
        from pomp_ray.stages.politeness import BudgetCaps
        eff: dict[str, int] = {}
        for h in set(self.caps) | set(self.budget_spent):
            rem = budget - self.budget_spent.get(h, 0)
            cap = self.caps.get(h)
            eff[h] = rem if cap is None else min(cap, rem)
        for h in tripped:
            eff[h] = 0
        return BudgetCaps(eff, budget)

    def _spend_budget(self, hosts_selected: dict[str, int]) -> None:
        for h, n in hosts_selected.items():
            self.budget_spent[h] = self.budget_spent.get(h, 0) + int(n)

    # ------------------------------------------------------------ round: tiny
    def _load_frontier_table(self, rnd: int) -> pa.Table:
        tables = [pq.read_table(p) for p in self._frontier_sources(rnd)]
        t = pa.concat_tables([_cast_frontier(x) for x in tables],
                             promote_options="default")
        return t.filter(pc.invert(t["blocked"])).select(FRONTIER_COLS)

    def _run_round_driver(self, rnd: int) -> dict:
        """Small-round fast path: pomp's serial loop on the driver against
        the same shard-held seen state and the same corpus index."""
        cfg = self.cfg
        frontier = self._load_frontier_table(rnd)
        sel_t, def_t, drop_t = select_serial(frontier, self._round_caps(),
                                             cfg.mode, self._round_width())
        hosts_sel: dict[str, int] | None = None
        if cfg.max_pages_per_host is not None:
            hosts_sel = {v["values"].as_py(): int(v["counts"].as_py())
                         for v in sel_t["host"].value_counts()}
            self._spend_budget(hosts_sel)

        if cfg.middlewares:
            sel_t = _mw_hook(cfg.middlewares, "process_request_batch")(sel_t)
        canon_urls = sel_t["canon_url"].to_pylist()
        rows = self.index.lookup_rows(canon_urls)
        htmls = [self.index.htmls[int(r)].as_py() if r >= 0 else None
                 for r in rows]
        # follow redirect chains (same spec as the distributed fetch
        # stage: resolve_redirects_table / core.oracle)
        from pomp_ray.stages.fetch import resolve_redirect_chain
        bases = list(canon_urls)
        for i in range(len(htmls)):
            if htmls[i] is not None:
                htmls[i], bases[i] = resolve_redirect_chain(
                    htmls[i], bases[i], self.index.lookup_rows,
                    self.index.htmls)
        oks = [h is not None for h in htmls]
        if cfg.middlewares:
            fetched = sel_t.append_column(
                "html", pa.array(htmls, pa.binary())).append_column(
                "fetch_ok", pa.array(oks, pa.bool_()))
            fetched = _mw_hook(cfg.middlewares, "process_response_batch")(fetched)
            canon_urls = fetched["canon_url"].to_pylist()
            htmls = fetched["html"].to_pylist()
            oks = fetched["fetch_ok"].to_pylist()
            sel_t = fetched
        items, errors, cands, expansions = [], [], [], []
        for u in drop_t["canon_url"].to_pylist():
            errors.append({"url": u, "stage": "host_budget",
                           "exc_type": "HostBudget",
                           "message": "host page budget exhausted",
                           "retryable": False, "round": rnd})
        for i, (canon, html, ok) in enumerate(zip(canon_urls, htmls, oks)):
            depth = sel_t["depth"][i].as_py()
            seq = sel_t["seq"][i].as_py()
            # same miss predicate as parse_batch on the distributed path: a
            # response middleware may clear either html or fetch_ok alone
            if not ok or html is None:
                errors.append({"url": canon, "stage": "fetch",
                               "exc_type": "FetchMiss", "message": "not in corpus",
                               "retryable": False, "round": rnd})
                continue
            title, text, links = self.parse_fn(html)
            items.append({"url": canon, "title": title, "text": text,
                          "n_links": len(links), "round": rnd, "seq": seq,
                          "depth": depth})
            expansions.append((text, bases[i], depth, links))
        # content-dedup gate (round-snapshot): pages whose text digest
        # was committed in a prior round contribute no candidates
        if self.digests is not None and expansions:
            dup = self.digests.contains_stage([e[0] for e in expansions])
        else:
            dup = [False] * len(expansions)
        for (text, base, depth, links), d in zip(expansions, dup):
            if d:
                continue
            if cfg.max_links_per_page is not None:
                links = links[:cfg.max_links_per_page]
            for href in links:
                cands.append({"url": href, "base": base,
                              "depth": depth + 1, "priority": 0})
        accepted, enq_errors = self._enqueue_driver(cands, rnd)
        errors += enq_errors

        items_t = pa.Table.from_pylist(items, schema=schemas.ITEMS)
        if cfg.enrich_fn is not None and items_t.num_rows:
            # same per-page analysis as distributed rounds (the hybrid
            # must not silently skip work on the driver path)
            items_t = cfg.enrich_fn(items_t)
        self._write_table(items_t, "items", rnd)
        if errors:
            errs_t = pa.Table.from_pylist(errors, schema=schemas.ERRORS)
            if cfg.middlewares:
                errs_t = _mw_hook(cfg.middlewares,
                                  "process_exception_batch")(errs_t)
            self._write_table(errs_t, "errors", rnd)
        next_frontier = pa.concat_tables(
            [self._frontier_table(accepted),
             _age_frontier(_cast_frontier(def_t), cfg.priority_aging)]
        )
        self._write_table(next_frontier, "frontier", rnd + 1)
        info = {"round": rnd, "path": "driver", "n_selected": sel_t.num_rows,
                "n_deferred": def_t.num_rows, "n_visited": len(items),
                "n_items": len(items), "n_errors": len(errors),
                "n_new": len(accepted),
                "n_frontier_next": next_frontier.num_rows,
                "n_text_bytes": sum(
                    len((it.get("text") or "").encode(
                        "utf-8", "surrogateescape")) for it in items)}
        if hosts_sel is not None:
            info["hosts_selected"] = hosts_sel
        if cfg.max_errors_per_host is not None:
            he: dict[str, int] = {}
            for e in errors:
                if e["stage"] == "fetch":
                    h = url_host(e["url"])
                    he[h] = he.get(h, 0) + 1
            info["hosts_errored"] = he
        return info

    # -------------------------------------------------------------- readers
    def _n_blocks(self, n_rows: int) -> int:
        """Read-block count: coalesce tiny files but never cap parallelism
        below what the cluster offers (blocks feed the whole fused
        fetch+parse chain)."""
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        return max(1, min(n_rows // self.cfg.target_block_rows + 1, 4 * cpus))

    def _read_frontier_ds(self, rnd: int, n_rows: int) -> rd.Dataset:
        def load(t: pa.Table) -> pa.Table:
            ft = _cast_frontier(t)
            return ft.filter(pc.invert(ft["blocked"])).select(FRONTIER_COLS)

        files = self._frontier_sources(rnd)
        ds = rd.read_parquet(files, override_num_blocks=self._n_blocks(n_rows))
        return ds.map_batches(load, batch_format="pyarrow")

    # ----------------------------------------------------- round: exact dist
    def _run_round_exact(self, rnd: int, n_frontier: int) -> dict:
        cfg = self.cfg
        fds = self._read_frontier_ds(rnd, n_frontier)

        # --- politeness selection (SHUFFLE 1) ---
        n_deferred = 0
        n_budget = 0
        caps = self._round_caps()
        if caps:
            marked = select_distributed(fds, caps, cfg.mode,
                                        n_salts=1).materialize()
            aux = ["selected", "dropped"]
            selected = marked.map_batches(
                lambda t: t.filter(t["selected"]).drop_columns(aux),
                batch_format="pyarrow")

            def _deferred_mask(t: pa.Table) -> pa.Array:
                return pc.and_(pc.invert(t["selected"]),
                               pc.invert(t["dropped"]))

            deferred = marked.map_batches(
                lambda t: t.filter(_deferred_mask(t)).drop_columns(aux),
                batch_format="pyarrow")
            n_deferred = int(marked.map_batches(
                lambda t: pa.table(
                    {"n": [t.filter(_deferred_mask(t)).num_rows]}),
                batch_format="pyarrow").sum("n") or 0)
            # cap-0 drops exist under a page budget OR a tripped error
            # breaker -- account them whenever any selection ran
            n_budget = int(marked.map_batches(
                lambda t: pa.table(
                    {"n": [int(pc.sum(t["dropped"]).as_py() or 0)]}),
                batch_format="pyarrow").sum("n") or 0)
            if n_budget:
                marked.map_batches(
                    lambda t: _budget_errors(t.filter(t["dropped"]), rnd),
                    batch_format="pyarrow").write_parquet(
                    self._dir("errors", rnd))
        else:
            selected, deferred = fds, None

        # --- width cut (distributed queue discipline: top-`width` rows by
        # (priority desc, seq desc) for LIFO/DFS, (priority desc, seq asc)
        # for the best-first priority queue -- exactly the serial oracle's
        # walk; politeness cap-filtering commutes with the global width
        # prefix, so the selected SET matches the oracle bit-for-bit) ---
        width_deferred = None
        if cfg.mode in ("dfs", "best"):
            width = self._round_width()
            sorted_sel = selected.sort(
                ["priority", "seq"],
                descending=[True, cfg.mode == "dfs"]).materialize()
            n_sel_total = sorted_sel.count()
            if n_sel_total > width:
                head, tail = sorted_sel.split_at_indices([width])
                selected = head
                width_deferred = tail
                n_deferred += n_sel_total - width
            else:
                selected = sorted_sel

        # --- page-budget accounting (tiny per-batch host partials over
        # the post-width selected set = this round's fetch attempts) ---
        hosts_sel: dict[str, int] | None = None
        if cfg.max_pages_per_host is not None:
            parts = selected.map_batches(
                _host_count_partial, batch_format="pyarrow").take_all()
            hosts_sel = {}
            for r in parts:
                hosts_sel[r["host"]] = hosts_sel.get(r["host"], 0) + r["n"]
            self._spend_budget(hosts_sel)

        # --- fetch + parse ---
        if cfg.middlewares:
            selected = selected.map_batches(
                _mw_hook(cfg.middlewares, "process_request_batch"),
                batch_format="pyarrow")
        fetched = self._fetch_stage(selected)
        if cfg.middlewares:
            fetched = fetched.map_batches(
                _mw_hook(cfg.middlewares, "process_response_batch"),
                batch_format="pyarrow")
        parsed = fetched.map_batches(make_parse_batch(rnd, self.parse_fn),
                                     batch_format="pyarrow")
        if cfg.enrich_fn is not None:
            parsed = parsed.map_batches(cfg.enrich_fn, batch_format="pyarrow")
        parsed = parsed.materialize()   # round barrier; html already dropped

        n_selected = parsed.count()
        ok = parsed.map_batches(lambda t: t.filter(t["fetch_ok"]),
                                batch_format="pyarrow")

        def _as_items(t: pa.Table) -> pa.Table:
            t = schemas.rename(t, {"url": "orig_url", "canon_url": "url"})
            return schemas.cast_to(t, schemas.ITEMS)

        ok.map_batches(_as_items, batch_format="pyarrow").write_parquet(
            self._dir("items", rnd))

        exc_hook = (_mw_hook(cfg.middlewares, "process_exception_batch")
                    if cfg.middlewares else (lambda t: t))
        n_visited = ok.count()
        n_text_bytes = int(ok.map_batches(
            lambda t: pa.table({"b": pa.array(
                [int(pc.sum(pc.binary_length(t["text"])).as_py() or 0)],
                pa.int64())}),
            batch_format="pyarrow").sum("b") or 0)
        n_miss = n_selected - n_visited
        hosts_err: dict[str, int] | None = None
        if cfg.max_errors_per_host is not None:
            parts = parsed.map_batches(
                lambda t: _host_count_partial(
                    t.filter(pc.invert(t["fetch_ok"]))),
                batch_format="pyarrow").take_all()
            hosts_err = {}
            for r in parts:
                hosts_err[r["host"]] = hosts_err.get(r["host"], 0) \
                    + int(r["n"])
        if n_miss:
            parsed.map_batches(lambda t: exc_hook(_miss_errors(t, rnd)),
                               batch_format="pyarrow").write_parquet(
                self._dir("errors", rnd))

        # --- links -> next frontier (enqueue pipeline) ---
        expand_src = ok
        if self.digests is not None:
            # content-dedup gate: committed-digest membership check +
            # staging; commit happens at the run-loop round barrier
            expand_src = ok.map_batches(
                ContentDedupGate(self.digests.shards),
                batch_format="pyarrow")
        cands = expand_src.map_batches(explode_links,
                                       batch_format="pyarrow")
        if cfg.max_links_per_page is not None:
            mlp = cfg.max_links_per_page
            cands = cands.map_batches(
                lambda t: t.filter(pc.less(t["link_idx"], mlp)),
                batch_format="pyarrow")
        canon_stats_dir = self._dir("canonstats", rnd)
        cands = cands.map_batches(
            lambda t, _d=canon_stats_dir: canonicalize_batch(t, stats_dir=_d),
            batch_format="pyarrow")
        if cfg.same_host_only:
            cands = cands.map_batches(same_host_filter,
                                      batch_format="pyarrow")
        url_flt = make_url_filter(cfg.url_allow, cfg.url_deny)
        if url_flt is not None:
            cands = cands.map_batches(url_flt, batch_format="pyarrow")
        if cfg.max_depth is not None:
            md = cfg.max_depth
            cands = cands.map_batches(
                lambda t: t.filter(pc.less_equal(t["depth"], md)),
                batch_format="pyarrow")
        cands = dedup_first_in_order(cands, cfg.mode)   # SHUFFLE 2
        if cfg.priority_fn is not None:
            cands = cands.map_batches(_make_priority_stage(cfg.priority_fn),
                                      batch_format="pyarrow")
        cands = cands.map_batches(make_robots_flag(self.disallow, self.allow),
                                  batch_format="pyarrow")
        cands = cands.map_batches(SeenFilter(self.seen.shards),
                                  batch_format="pyarrow").materialize()

        n_blocked = int(cands.map_batches(
            lambda t: pa.table({"n": [int(pc.sum(t["blocked"]).as_py() or 0)]}),
            batch_format="pyarrow").sum("n") or 0)
        if n_blocked:
            cands.map_batches(lambda t: exc_hook(_robots_errors(t, rnd)),
                              batch_format="pyarrow").write_parquet(
                self._dir("errors", rnd))

        allowed = cands.map_batches(
            lambda t: t.filter(pc.invert(t["blocked"])).select(
                ["url", "canon_url", "host", "depth", "priority",
                 "parent_priority", "parent_seq", "link_idx"]),
            batch_format="pyarrow")
        desc = ([True, True, False] if cfg.mode == "dfs"
                else [True, False, False])
        accepted, n_new = zip_with_index_sorted(
            allowed, ["parent_priority", "parent_seq", "link_idx"],
            descending=desc, offset=self.seq_counter)
        self.seq_counter += n_new
        accepted = accepted.map_batches(_cast_frontier, batch_format="pyarrow")

        # same sidecar-writing block writer as the scale path: the next
        # round's _frontier_count stays metadata-only in exact mode too
        next_dir = self._dir("frontier", rnd + 1)
        writer = _make_frontier_writer(next_dir)
        accepted.map_batches(writer, batch_format="pyarrow").take_all()
        aging = cfg.priority_aging
        if deferred is not None and n_deferred:
            deferred.map_batches(
                lambda t: writer(_age_frontier(_cast_frontier(t), aging)),
                batch_format="pyarrow").take_all()
        if width_deferred is not None:
            width_deferred.map_batches(
                lambda t: writer(_age_frontier(_cast_frontier(t), aging)),
                batch_format="pyarrow").take_all()
        n_errors = n_miss + n_blocked + n_budget
        info = {"round": rnd, "path": "exact", "n_selected": n_selected,
                "n_deferred": n_deferred, "n_visited": n_visited,
                "n_items": n_visited, "n_errors": n_errors, "n_new": n_new,
                "n_frontier_next": n_new + n_deferred,
                "n_text_bytes": n_text_bytes,
                "n_canon_slow": _sum_canon_stats(
                    self._dir("canonstats", rnd))}
        if hosts_sel is not None:
            info["hosts_selected"] = hosts_sel
        if hosts_err is not None:
            info["hosts_errored"] = hosts_err
        return info

    # ------------------------------------------------- scale DFS width cut
    def _lifo_width_cut(self, fds: rd.Dataset, rnd: int) -> rd.Dataset:
        """Approximate scale-mode DFS (pomp's LIFO queue discipline,
        pomp/core/engine.py ~L15-45 [estimated], relaxed for scale): pick
        up to ``dfs_width`` rows per round preferring (priority desc,
        depth desc) WITHOUT the exact path's global frontier sort.

        Two-level cut: each block keeps its deepest-first top-``width``
        rows (LOCAL sort, no shuffle) and writes its remainder straight
        to deferred side files (idempotent content-hash names + stats
        sidecars); the surviving per-block winners -- bounded by
        width x n_blocks, not the frontier -- are then cut to the global
        width with a small sort + split, the tail deferring too.  The
        visited SET still equals exact mode's (enqueue-time dedup makes
        the reachable set order-invariant); only the visit order is
        relaxed, the same relaxation scale-mode BFS accepts.  Exact wide
        DFS (global sort, bit-identical order) remains the
        exact_order=True path.

        mode="best" reuses the same two-level cut with the priority-queue
        sort keys (priority desc, seq asc): the approximate best-first
        scale path."""
        width = self._round_width()
        deferred_dir = self._dir("deferred", rnd)
        aging = self.cfg.priority_aging
        if self.cfg.mode == "dfs":
            keys, orders = ["priority", "depth", "seq"], ["descending"] * 3
        else:   # best: highest priority first, FIFO-ish within priority
            keys, orders = ["priority", "seq"], ["descending", "ascending"]

        def block_cut(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            idx = pc.sort_indices(
                t, sort_keys=list(zip(keys, orders)))
            t = t.take(idx)
            if t.num_rows > width:
                _write_frontier_part(
                    deferred_dir,
                    _age_frontier(_cast_frontier(t.slice(width)), aging))
                t = t.slice(0, width)
            return t

        cands = fds.map_batches(block_cut,
                                batch_format="pyarrow").materialize()
        n_cand = cands.count()
        if n_cand > width:
            s = cands.sort(keys,
                           descending=[o == "descending" for o in orders]
                           ).materialize()
            head, tail = s.split_at_indices([width])
            tail.map_batches(
                lambda t: pa.table(
                    {"n": pa.array([(_write_frontier_part(
                        deferred_dir,
                        _age_frontier(_cast_frontier(t), aging))["n"]
                        if t.num_rows else 0)], pa.int64())}),
                batch_format="pyarrow").take_all()
            cands = head
        return cands

    # ----------------------------------------------------- round: scale dist
    def _run_round_scale(self, rnd: int, n_frontier: int) -> dict:
        """Two-execution scale round (see module docstring)."""
        cfg = self.cfg
        _t = time.monotonic
        t0 = _t()
        fds = self._read_frontier_ds(rnd, n_frontier)
        if cfg.mode in ("dfs", "best"):
            # approximate LIFO / priority-queue: width cut first (bounds
            # everything downstream, politeness included, to <= width rows)
            fds = self._lifo_width_cut(fds, rnd)

        # exec A: [politeness ->] fetch -> parse -> enrich -> items
        caps = self._round_caps()
        if caps:
            from pomp_ray.stages.politeness import derive_salt_counts
            salt_counts = derive_salt_counts(
                getattr(self, "_host_freq", {}), caps, cfg.n_salts,
                cfg.politeness_group_rows)
            deferred_dir = self._dir("deferred", rnd)
            selected = _politeness_inline(
                fds, caps, salt_counts, deferred_dir, rnd=rnd,
                errors_dir=self._dir("errors", rnd),
                aging=cfg.priority_aging)
        else:
            selected = fds
        if cfg.middlewares:
            selected = selected.map_batches(
                _mw_hook(cfg.middlewares, "process_request_batch"),
                batch_format="pyarrow")
        fetched = self._fetch_stage(selected)
        if cfg.middlewares:
            fetched = fetched.map_batches(
                _mw_hook(cfg.middlewares, "process_response_batch"),
                batch_format="pyarrow")
        parsed = fetched.map_batches(make_parse_batch(rnd, self.parse_fn),
                                     batch_format="pyarrow")
        if cfg.enrich_fn is not None:
            parsed = parsed.map_batches(cfg.enrich_fn, batch_format="pyarrow")
        items_dir = self._dir("items", rnd)
        parsed = parsed.map_batches(
            lambda t: schemas.rename(t, {"url": "orig_url", "canon_url": "url"}),
            batch_format="pyarrow",
        )
        # The round is ONE fused streaming execution (VERDICT r4 #1: the
        # two-execution barrier cost ~1 s of fixed overhead per wave,
        # the whole gap between BFS and flat throughput):
        #   frontier read -> politeness -> fetch -> parse -> enrich ->
        #   items pass-through writer (parquet parts + counts sidecars)
        #   -> link explode -> canonicalize -> gates -> seen -> frontier
        #   writer -> tiny stats rows.
        # Nothing exec-B-side needs a barrier: the seen/dedup gates are
        # per-row shard-actor RPCs whose round-snapshot semantics depend
        # only on the PRIOR round's committed state, and the one
        # take_all() drives the whole chain with streaming backpressure
        # (mega-rounds never hold the round in memory).  All round
        # accounting comes from the sidecars/stats rows the two writers
        # emit -- no separate counts executions.
        parsed = parsed.map_batches(_make_items_writer(items_dir),
                                    batch_size=None,
                                    batch_format="pyarrow")
        dedup_on = self.digests is not None
        keep = (["url", "depth", "priority", "seq", "links"]
                + (["text"] if dedup_on else []))
        cands = parsed.map_batches(
            lambda t: schemas.rename(
                t.filter(t["fetch_ok"]).select(keep),
                {"url": "canon_url"}),
            batch_format="pyarrow")
        if dedup_on:
            # content-dedup gate (round-snapshot; text dropped after the
            # digest check so the link explode stays compact)
            cands = cands.map_batches(
                ContentDedupGate(self.digests.shards, drop_text=True),
                batch_format="pyarrow")
        cands = cands.map_batches(explode_links, batch_format="pyarrow")
        if cfg.max_links_per_page is not None:
            mlp = cfg.max_links_per_page
            cands = cands.map_batches(
                lambda t: t.filter(pc.less(t["link_idx"], mlp)),
                batch_format="pyarrow")
        canon_stats_dir = self._dir("canonstats", rnd)
        cands = cands.map_batches(
            lambda t, _d=canon_stats_dir: canonicalize_batch(t, stats_dir=_d),
            batch_format="pyarrow")
        if cfg.same_host_only:
            cands = cands.map_batches(same_host_filter,
                                      batch_format="pyarrow")
        url_flt = make_url_filter(cfg.url_allow, cfg.url_deny)
        if url_flt is not None:
            cands = cands.map_batches(url_flt, batch_format="pyarrow")
        if cfg.max_depth is not None:
            md = cfg.max_depth
            cands = cands.map_batches(
                lambda t: t.filter(pc.less_equal(t["depth"], md)),
                batch_format="pyarrow")
        cands = cands.map_batches(dedup_local, batch_format="pyarrow")
        if cfg.priority_fn is not None:
            cands = cands.map_batches(_make_priority_stage(cfg.priority_fn),
                                      batch_format="pyarrow")
        cands = (
            cands.map_batches(make_robots_flag(self.disallow, self.allow), batch_format="pyarrow")
            .map_batches(SeenFilter(self.seen.shards), batch_format="pyarrow")
            .map_batches(_hash_seq, batch_format="pyarrow")
        )
        next_dir = self._dir("frontier", rnd + 1)
        # custom idempotent block writer + stats sidecars: counts come
        # back as tiny rows, so no post-write column read-back.  This
        # take_all() is the round's ONLY execution trigger.
        stats = cands.map_batches(_make_frontier_writer(next_dir),
                                  batch_format="pyarrow").take_all()
        n_blocked = sum(r["n_blocked"] for r in stats)
        n_all = sum(r["n"] for r in stats)
        t_exec_a = _t() - t0
        t0 = _t()

        # round accounting, all driver-side from sidecars + metadata
        n_selected = n_visited = n_text_bytes = 0
        want_sel = cfg.max_pages_per_host is not None
        want_err = cfg.max_errors_per_host is not None
        hosts_sel: dict[str, int] | None = {} if want_sel else None
        hosts_err: dict[str, int] | None = {} if want_err else None
        for p in glob.glob(os.path.join(items_dir, "*.stats.json")):
            with open(p) as f:
                st = json.load(f)
            n_selected += st["n"]
            n_visited += st["n_ok"]
            n_text_bytes += st["text_bytes"]
            if want_sel:
                for h, c in st["hosts"].items():
                    hosts_sel[h] = hosts_sel.get(h, 0) + c
            if want_err:
                for h, c in st["hosts_err"].items():
                    hosts_err[h] = hosts_err.get(h, 0) + c
        if want_sel:
            self._spend_budget(hosts_sel)
        n_deferred = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(self._dir("deferred", rnd),
                                            "*.parquet")))
        # page-budget accounting: dropped-row count from the budget error
        # parts' metadata (cap-0 drop parts exist under a page budget OR
        # a tripped error breaker)
        n_budget = 0
        if want_sel or want_err:
            n_budget = sum(
                pq.ParquetFile(p).metadata.num_rows
                for p in glob.glob(os.path.join(self._dir("errors", rnd),
                                                "*-budget.parquet")))

        n_next = n_all - n_blocked
        n_errors = (n_selected - n_visited) + n_blocked + n_budget
        info = {"round": rnd, "path": "scale", "n_selected": n_selected,
                "n_deferred": n_deferred, "n_visited": n_visited,
                "n_items": n_visited, "n_errors": n_errors,
                "n_new": n_next,
                "n_frontier_next": n_next + n_deferred,
                "n_text_bytes": n_text_bytes,
                "t_exec_a": round(t_exec_a, 3),
                "t_counts_a": round(_t() - t0, 3),
                "t_exec_b": 0.0, "t_counts_b": 0.0,
                "n_canon_slow": _sum_canon_stats(
                    self._dir("canonstats", rnd))}
        if hosts_sel is not None:
            info["hosts_selected"] = hosts_sel
        if hosts_err is not None:
            info["hosts_errored"] = hosts_err
        return info

    # ------------------------------------------------------------------- run
    def run(self, seeds: list[dict] | None = None,
            resume: bool = False) -> CrawlSummary:
        cfg = self.cfg
        t0 = time.monotonic()
        start_round = 0
        if resume:
            start_round = self._resume()
        else:
            if os.path.isdir(cfg.ckpt_dir):
                shutil.rmtree(cfg.ckpt_dir)
            os.makedirs(cfg.ckpt_dir, exist_ok=True)
            assert seeds is not None, "fresh crawl needs seeds"
            # fresh crawl on a reused engine: clear crawl state
            self.seen.reset()
            if self.digests is not None:
                self.digests.reset()
            self.visited_total = 0
            self.text_bytes_total = 0
            self.seq_counter = 0
            self.budget_spent = {}
            self.errors_by_host = {}
            self.seed(seeds)

        summary = CrawlSummary()
        rnd = start_round
        seen_dir = os.path.join(cfg.ckpt_dir, "seen")
        while cfg.max_rounds is None or rnd < cfg.max_rounds:
            if (cfg.max_visited is not None
                    and self.visited_total >= cfg.max_visited):
                break   # global visited budget spent (round-granular)
            if (cfg.max_text_bytes is not None
                    and self.text_bytes_total >= cfg.max_text_bytes):
                break   # text-byte budget spent (round-granular)
            info_path = self._round_json(rnd)
            if os.path.exists(info_path):   # already complete (resume)
                with open(info_path) as f:
                    info = json.load(f)
            else:
                n_frontier = self._frontier_count(rnd)
                if n_frontier == 0:
                    break
                # a previously crashed attempt may have left partial output
                for kind, r in (("items", rnd), ("errors", rnd),
                                ("deferred", rnd), ("canonstats", rnd),
                                ("frontier", rnd + 1)):
                    d = self._dir(kind, r)
                    if os.path.isdir(d):
                        shutil.rmtree(d)
                t_r = time.monotonic()
                # width-limited modes below the distributed-width threshold
                # are inherently serial regardless of frontier size
                w = self._round_width()
                narrow_serial = (w is not None and
                                 w < cfg.dfs_distributed_min_width)
                # a custom downloader class only runs in distributed
                # rounds -- never fall back to the driver's corpus lookup
                if ((narrow_serial or n_frontier < cfg.min_distributed_rows)
                        and cfg.fetcher_cls is None):
                    info = self._run_round_driver(rnd)
                elif cfg.exact_order:
                    # wide-DFS rounds use the exact distributed path (the
                    # global width cut needs the deterministic seq sort)
                    info = self._run_round_exact(rnd, n_frontier)
                else:
                    # scale mode; DFS runs the approximate LIFO width cut
                    # inside the scale round (no global frontier sort)
                    info = self._run_round_scale(rnd, n_frontier)
                info = self._apply_frontier_cap(rnd, info)
                info["wall_s"] = time.monotonic() - t_r
                info["seq_counter"] = self.seq_counter
                self.seen.snapshot(seen_dir, rnd + 1)
                if self.digests is not None:
                    # round barrier of the content-dedup protocol:
                    # staged digests become visible to the next round,
                    # then join the checkpoint delta
                    self.digests.commit_staged()
                    self.digests.snapshot(
                        os.path.join(cfg.ckpt_dir, "digests"), rnd + 1)
                self._write_metrics(info)
                self._commit_round(rnd, info)
            summary.per_round.append(info)
            self.visited_total += info["n_visited"]
            self.text_bytes_total += int(info.get("n_text_bytes", 0))
            for h, n in info.get("hosts_errored", {}).items():
                self.errors_by_host[h] = self.errors_by_host.get(h, 0) \
                    + int(n)
            summary.n_visited += info["n_visited"]
            summary.n_items += info["n_items"]
            summary.n_errors += info["n_errors"]
            rnd += 1
            if info["n_frontier_next"] == 0:
                break
        summary.rounds = rnd
        summary.n_seen = self.seen.size()
        summary.wall_s = time.monotonic() - t0
        return summary

    def _write_metrics(self, info: dict) -> None:
        rows = [
            {"round": info["round"], "stage": k, "n_rows": int(v),
             "wall_s": float(info.get("wall_s", 0.0))}
            for k, v in info.items()
            if k.startswith("n_") and v is not None
        ]
        t = pa.Table.from_pylist(rows, schema=schemas.METRICS)
        d = os.path.join(self.cfg.ckpt_dir, "metrics")
        os.makedirs(d, exist_ok=True)
        rnd = info["round"]
        pq.write_table(t, os.path.join(d, f"round-{rnd:06d}.parquet"))

    def _resume(self) -> int:
        """Find the last committed round, restore seen shards + seq counter,
        continue from the following round."""
        rounds_dir = os.path.join(self.cfg.ckpt_dir, "rounds")
        init = os.path.join(rounds_dir, "init.json")
        if not os.path.exists(init):
            raise FileNotFoundError("no checkpoint to resume from")
        with open(init) as f:
            self.seq_counter = json.load(f)["seq_counter"]
        last = -1
        self.budget_spent = {}
        self.errors_by_host = {}
        self.visited_total = 0
        self.text_bytes_total = 0
        for p in sorted(glob.glob(os.path.join(rounds_dir, "round-*.json"))):
            r = int(os.path.basename(p)[len("round-"):].split(".")[0])
            with open(p) as f:
                data = json.load(f)
            self.seq_counter = data["seq_counter"]
            self.visited_total += int(data.get("n_visited", 0))
            self.text_bytes_total += int(data.get("n_text_bytes", 0))
            for h, n in data.get("hosts_selected", {}).items():
                self.budget_spent[h] = self.budget_spent.get(h, 0) + int(n)
            for h, n in data.get("hosts_errored", {}).items():
                self.errors_by_host[h] = self.errors_by_host.get(h, 0) \
                    + int(n)
            last = r
        self.seen.restore(os.path.join(self.cfg.ckpt_dir, "seen"), last + 1)
        if self.digests is not None:
            self.digests.restore(
                os.path.join(self.cfg.ckpt_dir, "digests"), last + 1)
        return last + 1

    def close(self) -> None:
        self.seen.kill()
        if self.digests is not None:
            self.digests.kill()


def requeue_retryable(ckpt_dir: str) -> int:
    """Close the retry loop the ``fetch_retryable`` column exists for:
    collect every RETRYABLE fetch failure from a finished crawl's scale
    layout (items rows with fetch_ok=False, fetch_retryable=True) and
    write them as the next round's frontier (sidecar included), so
    ``run(resume=True)`` re-crawls exactly those urls -- optionally with
    a different fetcher config (more retries, longer timeout).

    Permanent failures (4xx, DNS, malformed urls) are never requeued --
    that is what the classification split in HttpFetcher._classify
    guarantees; callers bound repeated requeues themselves.  Returns the
    number of requeued urls."""
    rounds = sorted(glob.glob(os.path.join(ckpt_dir, "rounds",
                                           "round-*.json")))
    if not rounds:
        raise FileNotFoundError("no committed rounds to requeue from")
    last = int(os.path.basename(rounds[-1])[len("round-"):].split(".")[0])
    out = []
    for p in sorted(glob.glob(os.path.join(ckpt_dir, "items", "round-*",
                                           "*.parquet"))):
        t = pq.read_table(p)
        if ("fetch_ok" not in t.column_names
                or "fetch_retryable" not in t.column_names):
            continue
        bad = t.filter(pc.and_(pc.invert(t["fetch_ok"]),
                               t["fetch_retryable"]))
        if bad.num_rows:
            out.append(pa.table({
                "url": bad["orig_url"], "canon_url": bad["url"],
                "host": pa.array([_host_of(u) for u in
                                  bad["url"].to_pylist()], pa.string()),
                "depth": bad["depth"], "priority": bad["priority"],
                "seq": bad["seq"],
            }))
    if not out:
        return 0
    t = _cast_frontier(pa.concat_tables(out, promote_options="default"))
    _write_frontier_part(os.path.join(ckpt_dir, "frontier",
                                      f"round-{last + 1:06d}"), t)
    return t.num_rows


def recrawl_stale(ckpt_dir: str, before_round: int) -> int:
    """Continuous-crawl sibling of ``requeue_retryable``: re-enqueue every
    page VISITED before ``before_round`` (age-based freshness policy) as
    the next round's frontier, so ``run(resume=True)`` re-fetches stale
    pages.  Frontier rows are fetched unconditionally (the seen set only
    gates NEW link enqueue), so re-visiting needs no seen-set surgery,
    and the re-extracted links anti-join against seen as usual -- no
    re-enqueue explosion.  Latest visit wins: a url revisited at or
    after ``before_round`` is not stale.  Returns the requeue count."""
    rounds = sorted(glob.glob(os.path.join(ckpt_dir, "rounds",
                                           "round-*.json")))
    if not rounds:
        raise FileNotFoundError("no committed rounds to recrawl from")
    last = int(os.path.basename(rounds[-1])[len("round-"):].split(".")[0])
    vis = read_visited(ckpt_dir)
    if vis.num_rows == 0:
        return 0
    df = vis.to_pandas().sort_values("round") \
        .groupby("url", as_index=False).last()   # latest visit per url
    stale = df[df["round"] < before_round]
    if stale.empty:
        return 0
    t = _cast_frontier(pa.table({
        "url": pa.array(stale["url"], pa.string()),
        "canon_url": pa.array(stale["url"], pa.string()),
        "host": pa.array([_host_of(u) for u in stale["url"]], pa.string()),
        "depth": pa.array(stale["depth"], pa.int32()),
        "priority": pa.array([0] * len(stale), pa.int64()),
        "seq": pa.array(stale["seq"], pa.int64()),
    }))
    _write_frontier_part(os.path.join(ckpt_dir, "frontier",
                                      f"round-{last + 1:06d}"), t)
    return t.num_rows


def _make_priority_stage(fn):
    """Vectorized link-priority assignment (CrawlConfig.priority_fn): one
    call per batch over (canon_url, depth); ships into map_batches tasks,
    so ``fn`` must be picklable."""
    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        p = pa.array([int(x) for x in fn(t["canon_url"].to_pylist(),
                                         t["depth"].to_pylist())],
                     pa.int32())
        return t.set_column(t.schema.get_field_index("priority"),
                            "priority", p)
    return assign


def _host_of(u: str) -> str:
    return url_host(u)


# -------------------------------------------------------------- output readers
def items_dataset(ckpt_dir: str) -> rd.Dataset:
    """Logical items table as a STREAMING Ray Dataset (the scale reader:
    blocks flow through the executor with backpressure, nothing is ever
    held on the driver).  Same rows as ``read_items``; order is
    per-block, not global -- consume with write_parquet / map_batches /
    aggregates, or use ``iter_item_batches`` when file order matters."""
    files = sorted(glob.glob(os.path.join(ckpt_dir, "items", "round-*",
                                          "*.parquet")))
    if not files:
        return rd.from_arrow(schemas.ITEMS.empty_table())

    def load(t: pa.Table) -> pa.Table:
        if "fetch_ok" in t.column_names:   # scale layout: items superset
            t = t.filter(t["fetch_ok"])
        return schemas.cast_to(t, schemas.ITEMS)

    return rd.read_parquet(files).map_batches(load, batch_format="pyarrow")


def read_items(ckpt_dir: str) -> pa.Table:
    """Logical items table from either mode's layout, schema
    schemas.ITEMS.  Conformance/testing reader: assembles ONE table (so
    it is O(items) on the driver by construction -- use
    ``items_dataset`` for big crawls); internally streams per parquet
    row group via ``iter_item_batches``, so peak overhead beyond the
    result itself is one row group."""
    out = list(iter_item_batches(ckpt_dir))
    if not out:
        return schemas.ITEMS.empty_table()
    return pa.concat_tables(out)


def read_visited(ckpt_dir: str) -> pa.Table:
    t = read_items(ckpt_dir)
    return schemas.cast_to(t, schemas.VISITED)


def read_errors(ckpt_dir: str) -> pa.Table:
    """Logical errors table: explicit errors dirs (exact/driver/seed
    layout) + fetch misses embedded in scale items + robots-blocked rows
    embedded in scale frontier files."""
    out = [schemas.ERRORS.empty_table()]
    for p in sorted(glob.glob(os.path.join(ckpt_dir, "errors", "round-*",
                                           "*.parquet"))):
        out.append(schemas.cast_to(pq.read_table(p), schemas.ERRORS))
    for p in sorted(glob.glob(os.path.join(ckpt_dir, "items", "round-*",
                                           "*.parquet"))):
        t = pq.read_table(p)
        if "fetch_ok" not in t.column_names:
            continue
        t = t.filter(pc.invert(t["fetch_ok"]))
        if t.num_rows:
            out.append(_miss_errors_from(
                t["url"], t["round"][0].as_py(),
                t["fetch_err"] if "fetch_err" in t.column_names else None,
                (t["fetch_retryable"]
                 if "fetch_retryable" in t.column_names else None)))
    for p in sorted(glob.glob(os.path.join(ckpt_dir, "frontier", "round-*",
                                           "*.parquet"))):
        t = pq.read_table(p)
        if "blocked" not in t.column_names:
            continue
        blk = t.filter(t["blocked"])
        if blk.num_rows:
            rnd = int(os.path.basename(os.path.dirname(p))[len("round-"):]) - 1
            out.append(pa.table({
                "url": blk["canon_url"],
                "stage": pa.array(["robots"] * blk.num_rows),
                "exc_type": pa.array(["RobotsDisallowed"] * blk.num_rows),
                "message": pa.array([""] * blk.num_rows),
                "retryable": pa.array([False] * blk.num_rows),
                "round": pa.array([rnd] * blk.num_rows, pa.int32()),
            }, schema=schemas.ERRORS))
    return pa.concat_tables(out)


def _stats_all_unblocked(pf: pq.ParquetFile) -> bool:
    """True when every row group's statistics prove blocked max == False."""
    try:
        idx = pf.schema_arrow.names.index("blocked")
    except ValueError:
        return False
    md = pf.metadata
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max or st.max:
            return False
    return True


def _miss_errors_from(urls: pa.ChunkedArray | pa.Array, rnd: int,
                      messages=None, retryable=None) -> pa.Table:
    n = len(urls)
    return pa.table({
        "url": urls,
        "stage": pa.array(["fetch"] * n),
        "exc_type": pa.array(["FetchMiss"] * n),
        "message": (messages if messages is not None
                    else pa.array(["not in corpus"] * n)),
        "retryable": (retryable if retryable is not None
                      else pa.array([False] * n)),
        "round": pa.array([rnd] * n, pa.int32()),
    }, schema=schemas.ERRORS)


def _miss_errors(t: pa.Table, rnd: int) -> pa.Table:
    miss = t.filter(pc.invert(t["fetch_ok"]))
    # custom downloaders (HttpFetcher) annotate misses with a concrete
    # message + retryable classification; corpus-lookup misses stay the
    # plain FetchMiss shape
    msgs = miss["fetch_err"] if "fetch_err" in miss.column_names else None
    retry = (miss["fetch_retryable"]
             if "fetch_retryable" in miss.column_names else None)
    return _miss_errors_from(miss["canon_url"], rnd, msgs, retry)


def _robots_errors(t: pa.Table, rnd: int) -> pa.Table:
    blk = t.filter(t["blocked"])
    n = blk.num_rows
    return pa.table({
        "url": blk["canon_url"],
        "stage": pa.array(["robots"] * n),
        "exc_type": pa.array(["RobotsDisallowed"] * n),
        "message": blk["path"],
        "retryable": pa.array([False] * n),
        "round": pa.array([rnd] * n, pa.int32()),
    }, schema=schemas.ERRORS)


def _host_count_partial(t: pa.Table) -> pa.Table:
    """Per-batch (host, n) partial counts -- the page-budget accounting
    rows (tiny: one row per host per batch)."""
    vc = t["host"].combine_chunks().value_counts()
    return pa.table({
        "host": vc.field("values"),
        "n": pc.cast(vc.field("counts"), pa.int64()),
    })


def _budget_errors(t: pa.Table, rnd: int) -> pa.Table:
    """Frontier rows of a page-budget-exhausted host -> error rows
    (stage="host_budget"; dropped, matching the oracle's quota drop)."""
    n = t.num_rows
    return pa.table({
        "url": t["canon_url"],
        "stage": pa.array(["host_budget"] * n),
        "exc_type": pa.array(["HostBudget"] * n),
        "message": pa.array(["host page budget exhausted"] * n),
        "retryable": pa.array([False] * n),
        "round": pa.array([rnd] * n, pa.int32()),
    }, schema=schemas.ERRORS)


def _cap_errors(t: pa.Table, rnd: int) -> pa.Table:
    """Frontier rows dropped by the bounded-frontier cap -> error rows
    (stage="frontier_cap"; matching the oracle's admission drop)."""
    n = t.num_rows
    return pa.table({
        "url": t["canon_url"],
        "stage": pa.array(["frontier_cap"] * n),
        "exc_type": pa.array(["FrontierCap"] * n),
        "message": pa.array(["frontier row cap exceeded"] * n),
        "retryable": pa.array([False] * n),
        "round": pa.array([rnd] * n, pa.int32()),
    }, schema=schemas.ERRORS)


def _frontier_stats(t: pa.Table) -> dict:
    """(row count, blocked count, unblocked host histogram) for one
    frontier part -- the sidecar payload that makes the driver's
    per-round frontier pass metadata-only."""
    nb = int(pc.sum(t["blocked"]).as_py() or 0)
    un = t.filter(pc.invert(t["blocked"])) if nb else t
    hosts: dict[str, int] = {}
    if un.num_rows:
        for v in un["host"].value_counts():
            hosts[v["values"].as_py()] = int(v["counts"].as_py())
    return {"n": t.num_rows, "n_blocked": nb, "hosts": hosts}


def _sum_canon_stats(stats_dir: str) -> int:
    """Total slow-path (per-row Python fallback) canonicalizations
    recorded by the round's canonicalize stage -- sidecars exist only
    for batches where the fallback fired, so generated corpora read 0
    without touching the filesystem beyond one isdir."""
    if not os.path.isdir(stats_dir):
        return 0
    total = 0
    for p in glob.glob(os.path.join(stats_dir, "canon-*.json")):
        try:
            with open(p) as f:
                total += int(json.load(f).get("n_slow", 0))
        except (json.JSONDecodeError, OSError):
            continue
    return total


def _write_stats_sidecar(parquet_path: str, stats: dict) -> None:
    sc = parquet_path[:-len(".parquet")] + ".stats.json"
    tmp = sc + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, sc)


def _write_frontier_part(out_dir: str, t: pa.Table) -> dict:
    """Write one frontier-schema parquet part named by the block's
    content hash (the seq column IS already a stable per-url hash, so the
    name is deterministic and the write is idempotent under task retry),
    plus its ``.stats.json`` sidecar.  Returns the stats dict."""
    import hashlib
    os.makedirs(out_dir, exist_ok=True)
    key = hashlib.md5(
        t["seq"].combine_chunks().to_numpy().tobytes()).hexdigest()[:16]
    st = _frontier_stats(t)
    path = os.path.join(out_dir, f"part-{key}.parquet")
    tmp = path + ".tmp"
    # small row groups: a giant single-row-group part caps the next
    # round's read/task parallelism (the whole fused fetch+parse chain)
    pq.write_table(t, tmp, row_group_size=8192)
    os.replace(tmp, path)
    _write_stats_sidecar(path, st)
    return st


def _make_frontier_writer(next_dir: str):
    """Terminal stage of the fused round: write each next-frontier block
    via ``_write_frontier_part`` and emit one tiny (n, n_blocked) row.
    The driver consumes only those stats rows -- the round's counts and
    the next round's ``_frontier_count`` never read frontier columns."""
    def write(t: pa.Table) -> pa.Table:
        def stats_row(n: int, b: int) -> pa.Table:
            return pa.table({"n": pa.array([n], pa.int64()),
                             "n_blocked": pa.array([b], pa.int64())})
        if t.num_rows == 0:
            return stats_row(0, 0)
        st = _write_frontier_part(next_dir, t)
        return stats_row(st["n"], st["n_blocked"])
    return write


def _write_items_part(items_dir: str, t: pa.Table) -> dict:
    """Write one parsed-items parquet part named by the content hash of
    its url column (idempotent under task retry -- a round's frontier
    never repeats a url, so names are collision-free) plus a
    ``.stats.json`` sidecar carrying everything the driver's round
    accounting needs (n, n_ok, text_bytes, per-host attempt/error
    histograms): the items write and the round accounting are ONE fused
    stage of the round's single execution, not separate ones."""
    import hashlib
    os.makedirs(items_dir, exist_ok=True)
    key = hashlib.md5(
        pc.cast(t["url"], pa.string()).combine_chunks()
        .to_pandas().str.cat(sep="|").encode()).hexdigest()[:16]
    ok = t["fetch_ok"]
    n_ok = int(pc.sum(ok).as_py() or 0)
    tb = int(pc.sum(pc.binary_length(
        t.filter(ok)["text"])).as_py() or 0)

    def hist(tt: pa.Table) -> dict:
        out: dict[str, int] = {}
        if tt.num_rows:
            for v in tt["host"].combine_chunks().value_counts():
                out[v["values"].as_py()] = int(v["counts"].as_py())
        return out

    st = {"n": t.num_rows, "n_ok": n_ok, "text_bytes": tb,
          "hosts": hist(t), "hosts_err": hist(t.filter(pc.invert(ok)))}
    path = os.path.join(items_dir, f"part-{key}.parquet")
    tmp = path + ".tmp"
    pq.write_table(t, tmp, row_group_size=8192)
    os.replace(tmp, path)
    _write_stats_sidecar(path, st)
    return st


def _make_items_writer(items_dir: str):
    """Exec-A terminal stage for in-memory rounds: write the block as an
    items part (+ counts sidecar) and pass the rows through unchanged,
    so one materialize() both persists the round's items AND leaves the
    compact parsed blocks in the object store for exec B."""
    def write(t: pa.Table) -> pa.Table:
        if t.num_rows:
            _write_items_part(items_dir, t)
        return t
    return write


def _age_frontier(t: pa.Table, aging: int) -> pa.Table:
    """Bump deferred rows' priority by the aging increment (applied once
    per round deferred, at write-back time on every path)."""
    if not aging or t.num_rows == 0:
        return t
    i = t.schema.get_field_index("priority")
    p = pc.add(pc.cast(t["priority"], pa.int32()),
               pa.scalar(aging, pa.int32()))
    return t.set_column(i, "priority", pc.cast(p, pa.int32()))


def _hash_seq(t: pa.Table) -> pa.Table:
    """Scale-mode seq: deterministic per-url hash (63-bit).  Vectorized
    via pandas' keyed siphash (stable across processes/sessions -- unlike
    builtin hash() -- and ~10x cheaper than per-row hashlib.md5; scale
    mode only needs a stable unique id, not a specific hash family)."""
    import numpy as np
    import pandas as pd
    urls = np.asarray(t["canon_url"].to_pylist(), dtype=object)
    seqs = (pd.util.hash_array(urls) >> np.uint64(1)).astype(np.int64)
    t = t.append_column("seq", pa.array(seqs, pa.int64()))
    return _cast_frontier(t.select(FRONTIER_COLS + ["blocked"]))


def _politeness_inline(fds: rd.Dataset, caps: dict[str, int],
                       salt_counts: dict[str, int],
                       deferred_dir: str, rnd: int = 0,
                       errors_dir: str | None = None,
                       aging: int = 0) -> rd.Dataset:
    """Scale-mode politeness as a mid-pipeline groupby: capped hosts keep
    their first ``cap`` rows; overflow rows are written to a DETERMINISTIC
    per-(host,salt) side file under ``deferred_dir`` (idempotent under task
    retry) and re-enter the next round's frontier read.

    ``salt_counts`` is the per-host effective salt count DERIVED FROM
    OBSERVED frontier host frequencies (politeness.derive_salt_counts --
    the north_rule's salted repartitioning of skew): heavy hosts split
    into enough (host, salt) groups to bound group size, light hosts
    keep one group.

    Starvation-safety (round-1 ADVICE bug): salt assignment is a FIXED
    hash of the url, so a sub-cap-0 salt would starve forever.  Guards:
    derive_salt_counts clamps a host's salts to its cap (every salt group
    has sub-cap >= 1), and the remainder slot ROTATES by round
    ((salt - rnd) % n_eff) so the uneven extra budget cycles across salts
    deterministically.  Together these preserve the 'same visited SET as
    exact mode' invariant."""
    import hashlib as _hl

    import numpy as np
    import pandas as pd

    def add_salt(t: pa.Table) -> pa.Table:
        # vectorized: pandas' keyed siphash per url (stable across
        # processes/sessions, unlike builtin hash()) modulo the host's
        # effective salt count -- the salt only needs a stable uniform
        # assignment, not a specific hash family, so no per-row md5
        if not salt_counts:
            salt = pa.array(np.zeros(t.num_rows, np.int32), pa.int32())
        else:
            urls = np.asarray(t["canon_url"].to_pylist(), dtype=object)
            h = pd.util.hash_array(urls)
            eff = (pd.Series(t["host"].to_pylist(), dtype=object)
                   .map(salt_counts).fillna(1).to_numpy(np.uint64))
            salt = pa.array((h % eff).astype(np.int32), pa.int32())
        return t.append_column("salt", salt)

    def mark(g):
        import pandas as pd  # noqa: F401
        host = g["host"].iloc[0]
        salt = int(g["salt"].iloc[0])
        cap = caps.get(host)
        if cap is not None and cap <= 0 and errors_dir is not None:
            # page budget exhausted: the whole group drops to an
            # idempotent errors part (deterministic per-(host,salt)
            # name), never to deferred -- mirrors the oracle's quota drop
            os.makedirs(errors_dir, exist_ok=True)
            hh = _hl.md5(host.encode()).hexdigest()[:12]
            t = _budget_errors(
                pa.Table.from_pandas(g.drop(columns=["salt"]),
                                     preserve_index=False), rnd)
            pq.write_table(
                t, os.path.join(errors_dir, f"h{hh}-s{salt}-budget.parquet"))
            return g.iloc[0:0].drop(columns=["salt"])
        n_eff = salt_counts.get(host, 1)
        if cap is not None and n_eff > 1:
            cap = cap // n_eff + (
                1 if (salt - rnd) % n_eff < cap % n_eff else 0)
        g = g.drop(columns=["salt"])
        if cap is None or len(g) <= cap:
            return g
        sel, overflow = g.iloc[:cap], g.iloc[cap:]
        os.makedirs(deferred_dir, exist_ok=True)
        hh = _hl.md5(host.encode()).hexdigest()[:12]
        t = _age_frontier(
            _cast_frontier(pa.Table.from_pandas(overflow,
                                                preserve_index=False)),
            aging)
        path = os.path.join(deferred_dir, f"h{hh}-s{salt}.parquet")
        pq.write_table(t, path)
        # one-host stats sidecar so the next round's _frontier_count
        # stays metadata-only over deferred files too
        _write_stats_sidecar(path, {"n": t.num_rows, "n_blocked": 0,
                                    "hosts": {host: t.num_rows}})
        return sel

    return (
        fds.map_batches(add_salt, batch_format="pyarrow")
        .groupby(["host", "salt"])
        .map_groups(mark, batch_format="pandas")
        .map_batches(lambda t: _cast_frontier(t).drop_columns(["blocked"]),
                     batch_format="pyarrow")
    )


def _mw_hook(middlewares: tuple, hook: str):
    """Batch fn applying a middleware chain hook (pomp's middleware
    semantics: each may transform or filter the batch); ordering rules
    live in ONE place, core.api.apply_middlewares (SURVEY.md M4-M6)."""
    from pomp_ray.core.api import apply_middlewares

    def apply(batch: pa.Table) -> pa.Table:
        return apply_middlewares(batch, middlewares, hook)
    return apply


def run_crawl(cfg: CrawlConfig, seeds: list[dict] | None = None,
              resume: bool = False) -> CrawlSummary:
    eng = CrawlEngine(cfg)
    try:
        return eng.run(seeds=seeds, resume=resume)
    finally:
        eng.close()


def crawl_spec(spec, corpus_path: str, ckpt_dir: str,
               robots_path: str | None = None, **cfg_kw) -> CrawlSummary:
    """Run a crawl from a ``pomp_ray.core.api.CrawlerSpec`` (the
    BaseCrawler-shaped entry point): seeds + parse hook + mode +
    middlewares come from the spec; item pipelines run afterwards over
    the items stream with pomp's start/process/stop lifecycle."""
    cfg = CrawlConfig(corpus_path=corpus_path, ckpt_dir=ckpt_dir,
                      robots_path=robots_path, mode=spec.mode,
                      parse_fn=spec.parse_fn(),
                      middlewares=tuple(spec.middlewares), **cfg_kw)
    summary = run_crawl(cfg, seeds=spec.seeds)
    if spec.pipelines:
        run_pipelines(ckpt_dir, spec.pipelines, crawler=spec)
    return summary


def iter_item_batches(ckpt_dir: str, batch_rows: int = 8192):
    """Stream the logical items table batch-by-batch in the same order
    ``read_items`` concatenates it (sorted files, row groups in order),
    without ever holding more than one row group in memory."""
    for p in sorted(glob.glob(os.path.join(ckpt_dir, "items", "round-*",
                                           "*.parquet"))):
        pf = pq.ParquetFile(p)
        for rg in range(pf.num_row_groups):
            t = pf.read_row_group(rg)
            if "fetch_ok" in t.column_names:   # scale layout: items superset
                t = t.filter(t["fetch_ok"])
            t = schemas.cast_to(t, schemas.ITEMS)
            for lo in range(0, t.num_rows, batch_rows):
                yield t.slice(lo, batch_rows)


def run_pipelines(ckpt_dir: str, pipelines: list, crawler=None,
                  batch_rows: int = 8192) -> int:
    """Stream the crawl's items through an ordered pipeline chain
    (pomp BasePipeline parity: start -> process per batch -> stop in
    reverse order).  Pipelines run in the driver process, like pomp's --
    they typically hold file handles (CsvPipeline) -- but the items are
    STREAMED per parquet row group, so peak driver memory is independent
    of crawl size."""
    for p in pipelines:
        p.start(crawler)
    n = 0
    try:
        for batch in iter_item_batches(ckpt_dir, batch_rows):
            for p in pipelines:
                batch = p.process_batch(crawler, batch)
                if batch is None or batch.num_rows == 0:
                    break
            if batch is not None:
                n += batch.num_rows
    finally:
        for p in reversed(pipelines):
            p.stop(crawler)
    return n


def export_frontier_seeds(ckpt_dir: str, out_path: str) -> int:
    """Compact a STOPPED crawl's pending work into a standalone seed
    parquet directory (SEEDS schema) -- the cluster-migration export: a
    crawl halted by ``max_rounds`` (or killed) on one cluster continues
    on another by pointing a fresh engine's ``seeds=`` at this path
    (the distributed seed chain re-canonicalizes, re-gates robots, and
    re-dedups, so the export carries only url + priority).

    Gathers the NEXT round's frontier files plus the last round's
    deferred side files as a DATASET (a 10^10-url crawl's pending
    frontier is itself huge -- nothing ever lands on the driver),
    drops robots-blocked rows, dedups by canonical url keeping the
    LOWEST seq (the earliest enqueue, FIFO winner: one Min aggregate +
    one hash join, both keyed on canon_url), and streams the result to
    partitioned parquet; the original depths ride along (SEEDS carries depth), so
    max_depth semantics survive the migration.  Returns the number of
    exported urls."""
    from ray.data.aggregate import Min as _Min

    rounds = sorted(glob.glob(os.path.join(ckpt_dir, "rounds",
                                           "round-*.json")))
    if not rounds:
        raise FileNotFoundError("no committed rounds to export from")
    last = int(os.path.basename(rounds[-1])[6:12])
    files = sorted(glob.glob(os.path.join(
        ckpt_dir, "frontier", f"round-{last + 1:06d}", "*.parquet")))
    files += sorted(glob.glob(os.path.join(
        ckpt_dir, "deferred", f"round-{last:06d}", "*.parquet")))
    os.makedirs(out_path, exist_ok=True)
    # metadata-only emptiness check: a drained crawl leaves zero-row
    # frontier files, and zero-row blocks BYPASS map_batches (ray 2.49),
    # feeding the join an empty-schema block it cannot key
    n_pending = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    if not files or n_pending == 0:
        pq.write_table(schemas.SEEDS.empty_table(),
                       os.path.join(out_path, "part-empty.parquet"))
        return 0

    def unblocked(t: pa.Table) -> pa.Table:
        if "blocked" in t.column_names:
            t = t.filter(pc.invert(pc.fill_null(t["blocked"], False)))
            t = t.drop_columns(["blocked"])
        return t.select(["url", "canon_url", "priority", "depth", "seq"])

    ds = rd.read_parquet(files).map_batches(
        unblocked, batch_format="pyarrow").materialize()  # 2 consumers
    winners = ds.groupby("canon_url").aggregate(
        _Min("seq", alias_name="mseq")).repartition(8)
    j = ds.join(winners, join_type="inner", on=("canon_url",),
                num_partitions=8)

    def pick(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["seq"], t["mseq"]))
        return pa.table({
            "url": t["url"],
            "priority": pc.cast(t["priority"], pa.int32()),
            "depth": pc.cast(t["depth"], pa.int32()),
        }, schema=schemas.SEEDS)

    out = j.map_batches(pick, batch_format="pyarrow").materialize()
    out.write_parquet(out_path, mode="overwrite")
    return out.count()
