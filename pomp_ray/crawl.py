"""Round-synchronous distributed crawl loop -- the Ray-Data-native
re-expression of pomp's ``Pomp.pump(crawler)`` engine loop
(pomp/core/engine.py ~L60-160 [estimated]; SURVEY.md section 3.4).

Each round is one bounded Dataset pass:

    read frontier_r -> politeness selection (groupby(host), salted at
    scale) -> fetch (broadcast corpus index, stateless tasks) -> parse
    (extract_items + next_requests in one vectorized stage) -> items /
    visited / errors parquet -> explode links -> canonicalize -> dedup ->
    robots gate -> seen-shard check_and_add -> seq assignment ->
    frontier_{r+1} parquet -> seen snapshot -> round commit marker

Two fidelity modes:

* ``exact_order=True`` -- reproduces the serial oracle bit-for-bit
  (deterministic dedup winners via a groupby(canon_url) shuffle, global
  seq via sorted zip_with_index).  This is the conformance mode pomp's
  ported e2e tests run against.
* ``exact_order=False`` -- scale mode: local dedup + shard-side
  first-wins, hash-based seq, salted politeness.  Same visited SET
  (order-independent by construction: enqueue-time dedup makes the
  reachable set invariant to processing order), relaxed order -- the same
  relaxation pomp's own concurrent-downloader tests accept.

Hybrid execution: rounds smaller than ``min_distributed_rows`` run on the
driver (pomp's serial engine, byte-identical semantics, no per-round
Dataset overhead -- deep-tree tail rounds and exact DFS are tiny); larger
rounds run distributed.  Tests exercise both paths explicitly.

Checkpoint layout (the north_rule "resumes from Parquet checkpoints of
frontier + seen-set state"; every write is committed by an atomically
renamed rounds/round-r.json marker):

    ckpt/frontier/round-NNNNNN/*.parquet
    ckpt/items/round-NNNNNN/*.parquet      ckpt/visited/round-NNNNNN/
    ckpt/errors/round-NNNNNN/              ckpt/seen/seen-shardXXXX-roundNNNNNN.parquet
    ckpt/metrics/round-NNNNNN.parquet      ckpt/rounds/round-NNNNNN.json
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
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
from pomp_ray.stages.enqueue import (
    SeenFilter,
    canonicalize_batch,
    dedup_first_in_order,
    dedup_local,
    make_robots_flag,
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


@dataclass
class CrawlConfig:
    corpus_path: str
    ckpt_dir: str
    robots_path: str | None = None
    mode: str = "bfs"                  # "bfs" | "dfs"
    exact_order: bool = True
    round_budget_s: float = 10.0
    dfs_width: int = 1
    max_depth: int | None = None
    max_rounds: int | None = None
    n_seen_shards: int = 8
    n_salts: int = 1                   # politeness salting (scale mode only)
    min_distributed_rows: int = 256    # below this a round runs driver-side
    fetch_batch_size: int = 4096
    parse_fn: object = None            # ParseFn override (CrawlerSpec hook)
    enrich_fn: object = None           # optional batch fn applied to parsed rows


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
        self.delay: dict[str, float] = {}
        if cfg.robots_path and os.path.exists(cfg.robots_path):
            rt = pq.read_table(cfg.robots_path)
            for r in rt.to_pylist():
                self.disallow[r["host"]] = list(r.get("disallow_prefixes") or [])
                self.delay[r["host"]] = float(r.get("crawl_delay") or 0.0)
        self.caps = caps_from_delay(self.delay, cfg.round_budget_s)
        self.index = CorpusIndex.build(cfg.corpus_path)
        self.index_refs = self.index.put()
        self.seen = SeenSet(cfg.n_seen_shards)
        self.seq_counter = 0

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
        pq.write_table(table, os.path.join(d, f"{name}.parquet"))

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
            if any(c["path"].startswith(p)
                   for p in self.disallow.get(c["host"], ())):
                errors.append({"url": c["canon_url"], "stage": "robots",
                               "exc_type": "RobotsDisallowed",
                               "message": c["path"], "retryable": False,
                               "round": rnd})
                continue
            accepted.append({
                "url": c["url"], "canon_url": c["canon_url"], "host": c["host"],
                "depth": c["depth"], "priority": c["priority"],
                "seq": self.seq_counter,
            })
            self.seq_counter += 1
        return accepted, errors

    def _frontier_table(self, rows: list[dict]) -> pa.Table:
        return pa.Table.from_pylist(rows, schema=_FRONTIER_FILE_SCHEMA)

    # ------------------------------------------------------------------ seed
    def seed(self, seeds: list[dict]) -> int:
        """ENTRY_REQUESTS admission (SURVEY.md S1): same enqueue path as
        links; seed order = seed row order regardless of priority (pomp
        enqueues ENTRY_REQUESTS in iteration order)."""
        cands = [
            {"url": s["url"], "base": None, "depth": int(s.get("depth", 0)),
             "priority": int(s.get("priority", 0))}
            for s in seeds
        ]
        accepted, errors = self._enqueue_driver(cands, rnd=0, check_depth=False)
        self._write_table(self._frontier_table(accepted), "frontier", 0)
        if errors:
            self._write_table(
                pa.Table.from_pylist(errors, schema=schemas.ERRORS), "errors", 0,
                name="part-robots-seed")
        self.seen.snapshot(os.path.join(self.cfg.ckpt_dir, "seen"), 0)
        self._commit_round_init(len(accepted), len(errors))
        return len(accepted)

    def _commit_round_init(self, n_frontier: int, n_errors: int) -> None:
        os.makedirs(os.path.join(self.cfg.ckpt_dir, "rounds"), exist_ok=True)
        tmp = os.path.join(self.cfg.ckpt_dir, "rounds", "init.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"n_frontier": n_frontier, "seq_counter": self.seq_counter,
                       "n_errors": n_errors}, f)
        os.replace(tmp, os.path.join(self.cfg.ckpt_dir, "rounds", "init.json"))

    # ------------------------------------------------------------ round: tiny
    def _run_round_driver(self, frontier: pa.Table, rnd: int) -> dict:
        """Small-round fast path: pomp's serial loop on the driver against
        the same shard-held seen state and the same corpus index."""
        cfg = self.cfg
        width = cfg.dfs_width if cfg.mode == "dfs" else None
        sel_t, def_t = select_serial(frontier, self.caps, cfg.mode, width)

        canon_urls = sel_t["canon_url"].to_pylist()
        rows = self.index.lookup_rows(canon_urls)
        visited, items, errors, cands = [], [], [], []
        for i, (canon, row) in enumerate(zip(canon_urls, rows)):
            depth = sel_t["depth"][i].as_py()
            prio = sel_t["priority"][i].as_py()
            seq = sel_t["seq"][i].as_py()
            if row < 0:
                errors.append({"url": canon, "stage": "fetch",
                               "exc_type": "FetchMiss", "message": "not in corpus",
                               "retryable": False, "round": rnd})
                continue
            html = self.index.htmls[int(row)].as_py()
            title, text, links = self.parse_fn(html)
            visited.append({"url": canon, "round": rnd, "depth": depth, "seq": seq})
            items.append({"url": canon, "title": title, "text": text,
                          "n_links": len(links), "round": rnd, "seq": seq,
                          "depth": depth})
            for href in links:
                cands.append({"url": href, "base": canon, "depth": depth + 1,
                              "priority": 0})
        accepted, enq_errors = self._enqueue_driver(cands, rnd)
        errors += enq_errors

        self._write_table(pa.Table.from_pylist(visited, schema=schemas.VISITED),
                          "visited", rnd)
        self._write_table(pa.Table.from_pylist(items, schema=schemas.ITEMS),
                          "items", rnd)
        if errors:
            self._write_table(pa.Table.from_pylist(errors, schema=schemas.ERRORS),
                              "errors", rnd)
        next_frontier = pa.concat_tables(
            [self._frontier_table(accepted),
             schemas.cast_to(def_t, _FRONTIER_FILE_SCHEMA)]
        )
        self._write_table(next_frontier, "frontier", rnd + 1)
        return {"round": rnd, "path": "driver", "n_selected": sel_t.num_rows,
                "n_deferred": def_t.num_rows, "n_visited": len(visited),
                "n_items": len(items), "n_errors": len(errors),
                "n_new": len(accepted),
                "n_frontier_next": next_frontier.num_rows}

    # ------------------------------------------------------ round: distributed
    def _run_round_distributed(self, rnd: int, n_frontier: int) -> dict:
        cfg = self.cfg
        fds = rd.read_parquet(self._dir("frontier", rnd))

        # --- politeness selection (SHUFFLE 1) ---
        n_deferred = 0
        if self.caps:
            n_salts = cfg.n_salts if not cfg.exact_order else 1
            marked = select_distributed(fds, self.caps, cfg.mode,
                                        n_salts=n_salts).materialize()
            selected = marked.map_batches(
                lambda t: t.filter(t["selected"]).drop_columns(["selected"]),
                batch_format="pyarrow")
            deferred = marked.map_batches(
                lambda t: t.filter(pc.invert(t["selected"])).drop_columns(["selected"]),
                batch_format="pyarrow")
            n_deferred = marked.map_batches(
                lambda t: pa.table({"n": [t.filter(pc.invert(t['selected'])).num_rows]}),
                batch_format="pyarrow").sum("n")
            n_deferred = int(n_deferred or 0)
        else:
            selected, deferred = fds, None

        # --- fetch + parse (the streaming hot path) ---
        parsed = (
            selected
            .map_batches(make_fetch_fn(self.index_refs), batch_format="pyarrow",
                         batch_size=cfg.fetch_batch_size)
            .map_batches(make_parse_batch(rnd, self.parse_fn),
                         batch_format="pyarrow")
        )
        if cfg.enrich_fn is not None:
            parsed = parsed.map_batches(cfg.enrich_fn, batch_format="pyarrow")
        parsed = parsed.materialize()   # the round barrier; html already dropped

        n_selected = parsed.count()
        ok = parsed.map_batches(lambda t: t.filter(t["fetch_ok"]),
                                batch_format="pyarrow")

        def _as_items(t: pa.Table) -> pa.Table:
            t = schemas.rename(t, {"url": "orig_url", "canon_url": "url"})
            return schemas.cast_to(t, schemas.ITEMS)

        def _as_visited(t: pa.Table) -> pa.Table:
            t = schemas.rename(t, {"url": "orig_url", "canon_url": "url"})
            return schemas.cast_to(t, schemas.VISITED)

        ok.map_batches(_as_items, batch_format="pyarrow").write_parquet(
            self._dir("items", rnd))
        ok.map_batches(_as_visited, batch_format="pyarrow").write_parquet(
            self._dir("visited", rnd))

        misses = parsed.map_batches(
            lambda t: _miss_errors(t, rnd), batch_format="pyarrow")
        n_visited = ok.count()
        n_miss = n_selected - n_visited
        if n_miss:
            misses.write_parquet(self._dir("errors", rnd))

        # --- links -> next frontier (enqueue pipeline) ---
        cands = (
            ok.map_batches(explode_links, batch_format="pyarrow")
            .map_batches(canonicalize_batch, batch_format="pyarrow")
        )
        if cfg.max_depth is not None:
            md = cfg.max_depth
            cands = cands.map_batches(
                lambda t: t.filter(pc.less_equal(t["depth"], md)),
                batch_format="pyarrow")
        if cfg.exact_order:
            cands = dedup_first_in_order(cands, cfg.mode)   # SHUFFLE 2
        else:
            cands = cands.map_batches(dedup_local, batch_format="pyarrow")
        cands = cands.map_batches(make_robots_flag(self.disallow),
                                  batch_format="pyarrow")
        cands = cands.map_batches(SeenFilter(self.seen.shards),
                                  batch_format="pyarrow").materialize()

        blocked = cands.map_batches(
            lambda t: _robots_errors(t, rnd), batch_format="pyarrow")
        n_blocked = int(cands.map_batches(
            lambda t: pa.table({"n": [int(pc.sum(t["blocked"]).as_py() or 0)]}),
            batch_format="pyarrow").sum("n") or 0)
        if n_blocked:
            blocked.write_parquet(self._dir("errors", rnd))

        allowed = cands.map_batches(
            lambda t: t.filter(pc.invert(t["blocked"])).select(
                ["url", "canon_url", "host", "depth", "priority",
                 "parent_priority", "parent_seq", "link_idx"]),
            batch_format="pyarrow")
        if cfg.exact_order:
            desc = [True, False, False] if cfg.mode == "bfs" else [True, True, False]
            accepted, n_new = zip_with_index_sorted(
                allowed, ["parent_priority", "parent_seq", "link_idx"],
                descending=desc, offset=self.seq_counter)
            self.seq_counter += n_new
            accepted = accepted.map_batches(_cast_frontier,
                                            batch_format="pyarrow")
        else:
            accepted = allowed.map_batches(_hash_seq, batch_format="pyarrow")
            n_new = None

        next_dir = self._dir("frontier", rnd + 1)
        accepted.write_parquet(next_dir)
        if deferred is not None and n_deferred:
            deferred.map_batches(_cast_frontier,
                                 batch_format="pyarrow").write_parquet(next_dir)
        n_next = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(os.path.join(next_dir, "*.parquet"))
        )
        if n_new is None:
            n_new = n_next - n_deferred
        n_errors = n_miss + n_blocked
        return {"round": rnd, "path": "distributed", "n_selected": n_selected,
                "n_deferred": n_deferred, "n_visited": n_visited,
                "n_items": n_visited, "n_errors": n_errors, "n_new": n_new,
                "n_frontier_next": n_next}

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
            self.seed(seeds)

        summary = CrawlSummary()
        rnd = start_round
        seen_dir = os.path.join(cfg.ckpt_dir, "seen")
        while cfg.max_rounds is None or rnd < cfg.max_rounds:
            info_path = self._round_json(rnd)
            if os.path.exists(info_path):   # already complete (resume)
                with open(info_path) as f:
                    info = json.load(f)
            else:
                n_frontier = self._frontier_count(rnd)
                if n_frontier == 0:
                    break
                # a previously crashed attempt may have left partial output
                for kind in ("items", "visited", "errors"):
                    d = self._dir(kind, rnd)
                    if os.path.isdir(d):
                        shutil.rmtree(d)
                nxt = self._dir("frontier", rnd + 1)
                if os.path.isdir(nxt):
                    shutil.rmtree(nxt)
                t_r = time.monotonic()
                # DFS rounds are width-limited (tiny) by construction, so
                # they always take the serial driver path; BFS goes
                # distributed above the threshold.
                if cfg.mode == "dfs" or n_frontier < cfg.min_distributed_rows:
                    frontier = pq.read_table(
                        os.path.join(self._dir("frontier", rnd)))
                    info = self._run_round_driver(frontier, rnd)
                else:
                    info = self._run_round_distributed(rnd, n_frontier)
                info["wall_s"] = time.monotonic() - t_r
                info["seq_counter"] = self.seq_counter
                self.seen.snapshot(seen_dir, rnd + 1)
                self._write_metrics(info)
                self._commit_round(rnd, info)
            summary.per_round.append(info)
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

    def _frontier_count(self, rnd: int) -> int:
        d = self._dir("frontier", rnd)
        if not os.path.isdir(d):
            return 0
        return sum(pq.ParquetFile(p).metadata.num_rows
                   for p in glob.glob(os.path.join(d, "*.parquet")))

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
        for p in sorted(glob.glob(os.path.join(rounds_dir, "round-*.json"))):
            r = int(os.path.basename(p)[len("round-"):].split(".")[0])
            with open(p) as f:
                self.seq_counter = json.load(f)["seq_counter"]
            last = r
        self.seen.restore(os.path.join(self.cfg.ckpt_dir, "seen"), last + 1)
        return last + 1

    def close(self) -> None:
        self.seen.kill()


def _miss_errors(t: pa.Table, rnd: int) -> pa.Table:
    miss = t.filter(pc.invert(t["fetch_ok"]))
    n = miss.num_rows
    return pa.table({
        "url": miss["canon_url"],
        "stage": pa.array(["fetch"] * n),
        "exc_type": pa.array(["FetchMiss"] * n),
        "message": pa.array(["not in corpus"] * n),
        "retryable": pa.array([False] * n),
        "round": pa.array([rnd] * n, pa.int32()),
    }, schema=schemas.ERRORS)


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


_FRONTIER_FILE_SCHEMA = pa.schema([
    ("url", pa.string()), ("canon_url", pa.string()), ("host", pa.string()),
    ("depth", pa.int32()), ("priority", pa.int32()), ("seq", pa.int64()),
])


def _cast_frontier(t: pa.Table) -> pa.Table:
    return schemas.cast_to(t, _FRONTIER_FILE_SCHEMA)


def _hash_seq(t: pa.Table) -> pa.Table:
    """Scale-mode seq: deterministic per-url hash (63-bit)."""
    import hashlib
    seqs = [
        int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "little") >> 1
        for u in t["canon_url"].to_pylist()
    ]
    t = t.append_column("seq", pa.array(seqs, pa.int64()))
    return _cast_frontier(t)


def run_crawl(cfg: CrawlConfig, seeds: list[dict] | None = None,
              resume: bool = False) -> CrawlSummary:
    eng = CrawlEngine(cfg)
    try:
        return eng.run(seeds=seeds, resume=resume)
    finally:
        eng.close()
