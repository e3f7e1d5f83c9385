"""Headline benchmark.  Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-component sec...}, "sf": ..., "num_cpus": N,
     "crawl_pages_per_s": ..., "dedup_ops_per_s": ...}

Components:

  * crawl_flat -- THE throughput metric: one production-shaped crawl
    round over a 600k-page corpus (zipf(1.2) host skew): fetch + parse +
    per-page analysis (quality counters, lang-id, simhash, minhash bands)
    + 1.2M-link canonicalize/dedup/seen-check.  At the 10^10-URL design
    scale every politeness round is millions of urls, so per-round fixed
    cost amortizes away -- this component measures that steady state.
    Timing covers the round pipeline (sum of round walls), not one-time
    seeding/corpus generation.
  * crawl_bfs  -- the full 19-wave BFS crawl of the 200k-page BENCH
    corpus (includes per-wave scheduling overhead; reported for
    completeness -- small waves are driver-side by design).
  * dedup_ops  -- seen-shard check_and_add microbench (frontier dedup
    ops/s) driven from parallel Ray tasks.
  * docs / relational -- representative query pipelines over
    $GRAFT_SF_DIR (default /root/testdata/sf0.1).

``--scaling`` runs crawl_flat in two FRESH processes at num_cpus=8 and 32
on the same pre-generated input and reports both throughputs + scaling
efficiency (the sandbox stand-in for N vs 4N Ray nodes; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_DIR = "/tmp/pomp_bench_corpus"
FLAT_DIR = "/tmp/pomp_bench_flat_corpus"


def make_enrich():
    """Per-page analysis a training-data crawl runs inline: quality
    counters (vectorized pyarrow), lang-id (vectorized stopword vote),
    simhash, minhash band keys (whole-batch reduceat minhash -- same
    values as the per-row path, asserted in the analysis tests)."""
    import numpy as np
    import pyarrow as pa

    from pomp_ray.functions import analysis as an

    params = an._minhash_params(64)

    def enrich(batch: pa.Table) -> pa.Table:
        batch = an.quality_columns(batch)
        batch = an.lang_id_batch(batch)
        texts = [t or "" for t in batch["text"].to_pylist()]
        sims = [an.simhash64(t) for t in texts]
        mat = an.minhash_signatures_batch(texts, 64, params=params)
        bands = (mat[:, :16].sum(axis=1, dtype=np.uint64)
                 & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        batch = batch.append_column("simhash", pa.array(sims, pa.int64()))
        return batch.append_column("mh_band", pa.array(bands, pa.int64()))

    return enrich


def _crawl_cfg(fix, ckpt, **kw):
    from pomp_ray.crawl import CrawlConfig
    base = dict(
        corpus_path=fix.pages_path, ckpt_dir=ckpt,
        robots_path=fix.robots_path, mode="bfs", exact_order=False,
        n_salts=4, n_seen_shards=8, min_distributed_rows=512,
        enrich_fn=make_enrich(), round_budget_s=1e9,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _flat_fixture():
    """The flat-bench corpus; RAY_GRAFT_SCALE_PAGES overrides the page
    count (e.g. 1200000 for the input-size sensitivity check in
    BASELINE.md: per-page throughput rises at BOTH cpu levels as the
    fixed per-round cost amortizes, while the 2->8 efficiency ratio
    stays ~0.84-0.85 -- the fixed cost cancels in the ratio)."""
    from pomp_ray.sources import gen_corpus

    n = int(os.environ.get("RAY_GRAFT_SCALE_PAGES", "0"))
    if not n or n == gen_corpus.BENCH_FLAT.n_pages:
        return gen_corpus.generate(FLAT_DIR, gen_corpus.BENCH_FLAT)
    prof = gen_corpus.CorpusProfile(
        f"benchflat{n}", n_hosts=200, n_pages=n, zipf_skew=1.2,
        sentence_words=100)
    return gen_corpus.generate(f"{FLAT_DIR}_{n}", prof)


def bench_crawl_flat(warmup_frac: float = 0.02, **cfg_kw) -> dict:
    """One mega-round: every corpus url seeded at depth 0.  An untimed
    warmup round (a small url subset) warms worker processes, imports and
    the broadcast corpus index first.  Extra cfg_kw flow into the crawl
    config (crawl_flat_dedup passes dedup_content=True: round 0 has zero
    committed digests, so the run measures the digest gate's pure
    overhead -- per-row md5 + shard-actor RPCs -- on the mega-round)."""
    import pyarrow.parquet as pq

    from pomp_ray.crawl import CrawlEngine

    fix = _flat_fixture()
    urls = pq.read_table(fix.pages_path, columns=["url"])["url"].to_pylist()
    seeds = [{"url": u, "priority": 0, "depth": 0} for u in urls]

    # one engine (one corpus-index build/broadcast); fresh run() resets
    # the seen shards, so warmup urls are re-crawlable in the timed run
    n_warm = max(1, int(len(seeds) * warmup_frac))
    eng = CrawlEngine(_crawl_cfg(fix, "/tmp/pomp_bench_warm_ckpt",
                                 max_rounds=1, **cfg_kw))
    try:
        eng.run(seeds=seeds[:n_warm])
        eng.cfg.ckpt_dir = "/tmp/pomp_bench_flat_ckpt"
        # timed run seeds straight from the pages parquet: the
        # distributed seed path, no driver-side seed list
        s = eng.run(seeds=fix.pages_path)
    finally:
        eng.close()
    dt = sum(r.get("wall_s", 0.0) for r in s.per_round)
    return {"sec": dt, "pages": s.n_visited,
            "pages_per_s": s.n_visited / dt}


def bench_crawl_join() -> dict:
    """One production-shaped round with the ALL-LARGE fetch path: the
    frontier hash-joins the pages corpus (Dataset.join) instead of a
    broadcast index -- the 100-TB fetch strategy, measured on the 200k
    BENCH corpus (every url seeded at depth 0)."""
    import pyarrow.parquet as pq

    from pomp_ray.crawl import CrawlEngine
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate(BENCH_DIR, gen_corpus.BENCH)
    eng = CrawlEngine(_crawl_cfg(fix, "/tmp/pomp_bench_join_ckpt",
                                 max_rounds=1, fetch_strategy="join",
                                 join_num_partitions=32))
    try:
        s = eng.run(seeds=fix.pages_path)
    finally:
        eng.close()
    dt = sum(r.get("wall_s", 0.0) for r in s.per_round)
    return {"sec": dt, "pages": s.n_visited,
            "pages_per_s": s.n_visited / dt}


def bench_crawl_bfs() -> dict:
    """Full BFS wave-by-wave crawl of the 200k BENCH corpus.  Small waves
    (the tree head and tail) run on the driver (min_distributed_rows);
    only the wide middle waves pay Dataset-execution overhead."""
    import pyarrow.parquet as pq

    from pomp_ray.crawl import CrawlEngine
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate(BENCH_DIR, gen_corpus.BENCH)
    eng = CrawlEngine(_crawl_cfg(fix, "/tmp/pomp_bench_bfs_ckpt",
                                 min_distributed_rows=2048))
    try:
        seeds = pq.read_table(fix.seeds_path).to_pylist()
        t0 = time.monotonic()
        s = eng.run(seeds=seeds)
        dt = time.monotonic() - t0
    finally:
        eng.close()
    return {"sec": dt, "pages": s.n_visited, "rounds": s.rounds,
            "pages_per_s": s.n_visited / dt}


def bench_crawl_dfs() -> dict:
    """Approximate scale-mode DFS over the 200k BENCH corpus, every url
    seeded flat with width 65536: measures the per-block LIFO width cut
    (local sorts + a bounded global cut) that replaces the exact path's
    per-round global frontier sort."""
    import pyarrow.parquet as pq

    from pomp_ray.crawl import CrawlEngine
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate(BENCH_DIR, gen_corpus.BENCH)
    eng = CrawlEngine(_crawl_cfg(fix, "/tmp/pomp_bench_dfs_ckpt",
                                 mode="dfs", dfs_width=65536,
                                 dfs_distributed_min_width=16))
    try:
        s = eng.run(seeds=fix.pages_path)
    finally:
        eng.close()
    dt = sum(r.get("wall_s", 0.0) for r in s.per_round)
    return {"sec": dt, "pages": s.n_visited, "rounds": s.rounds,
            "pages_per_s": s.n_visited / dt}


def bench_dedup_ops(n_urls: int = 2_000_000, n_tasks: int = 32,
                    n_shards: int = 8) -> dict:
    import ray

    from pomp_ray.state.seen import SeenSet, check_and_add_via

    seen = SeenSet(n_shards)

    @ray.remote
    def push(shards, lo, hi):
        urls = [f"http://bench{i % 997}.test/p/{i}" for i in range(lo, hi)]
        return sum(check_and_add_via(shards, urls))

    per = n_urls // n_tasks
    t0 = time.monotonic()
    new = sum(ray.get([push.remote(seen.shards, i * per, (i + 1) * per)
                       for i in range(n_tasks)]))
    dt = time.monotonic() - t0
    seen.kill()
    return {"sec": dt, "ops": n_urls, "new": new, "ops_per_s": n_urls / dt}


def _bench_pages_path() -> str:
    """Pages parquet of the 200k-page BENCH corpus (cached by manifest)."""
    from pomp_ray.sources import gen_corpus
    return gen_corpus.generate(BENCH_DIR, gen_corpus.BENCH).pages_path


def bench_queries(sf_dir: str) -> dict:
    from pomp_ray.pipelines import (archive, docs, embeddings, graph,
                                    relational, tokenizer)

    out = {}
    for name, fn in (
        ("docs_quality", lambda: docs.quality_stats(sf_dir).count()),
        ("docs_dedup", lambda: docs.dedup_exact(sf_dir).count()),
        ("lineitem_summary",
         lambda: relational.lineitem_pricing_summary(sf_dir).count()),
        ("events_rollup", lambda: relational.events_rollup(sf_dir).count()),
        # round-3 shapes: span-hash join decontamination, iterative
        # broadcast k-means, sketch aggregate
        ("decontaminate", lambda: docs.decontaminate(sf_dir).count()),
        ("kmeans", lambda: embeddings.kmeans_clusters(sf_dir).count()),
        ("hll_users", lambda: relational.hll_users_by_type(sf_dir).count()),
        ("pretraining_shards",
         lambda: docs.pretraining_shards(sf_dir).count()),
        # late round-3 shapes: iterative graph loop (8 PR iterations of
        # join+groupby over the click-transition edges), PQ codebook
        # train + encode + codes-only ADC scan + re-rank
        ("pagerank", lambda: graph.pagerank_clicks(sf_dir).num_rows),
        ("pq_topk", lambda: embeddings.pq_topk(sf_dir).num_rows),
        # fourth-block shapes: cluster-blocked semantic dedup, regex-heavy
        # integer quality gates, BPE train + actor-pool encode
        ("semdedup", lambda: embeddings.semdedup(sf_dir).count()),
        ("gopher_flags",
         lambda: docs.gopher_quality_flags(sf_dir).count()),
        ("bpe_encode", lambda: tokenizer.bpe_token_counts(sf_dir).count()),
        # sixth-block shapes: SURT-sorted capture index (global sort +
        # per-record digest), span-hash contamination join, distributed
        # prefix scan (cumulative window)
        ("cdx_index", lambda: archive.cdx_index(sf_dir).count()),
        ("contamination_report",
         lambda: docs.contamination_report(sf_dir).count()),
        ("record_events",
         lambda: relational.record_events(sf_dir).count()),
        ("q5_join_tree",
         lambda: relational.q5_local_supplier_volume(sf_dir).num_rows),
        # twelfth-block shapes: vectorized token-window chunking (pure
        # map, no shuffle), CCNet line dedup over the 200k-page BENCH
        # corpus (explode + count groupby + hash-join back + bucketed
        # reassembly), deepest TPC-H join tree
        ("chunk_docs", lambda: docs.chunk_docs(sf_dir).count()),
        ("line_dedup", lambda: __import__(
            "pomp_ray.pipelines.webtext", fromlist=["webtext"])
         .dedup_lines(_bench_pages_path()).count()),
        ("q8_join_tree",
         lambda: relational.q8_market_share(sf_dir).num_rows),
        # thirteenth-block shapes: trap detection (corpus scan + digest
        # dedup groupby + template rollup) and broken-outlink QA (link
        # explode + global distinct + membership join) over the 200k
        # BENCH corpus
        ("trap_report", lambda: __import__(
            "pomp_ray.pipelines.webtext", fromlist=["webtext"])
         .trap_report(_bench_pages_path()).count()),
        ("broken_links", lambda: __import__(
            "pomp_ray.pipelines.graph", fromlist=["graph"])
         .broken_links(_bench_pages_path()).num_rows),
        # fifteenth-block shapes: winnowed-fingerprint near-dup (explode
        # + df-cut + bucket self-join), FW-BW coloring SCC over the
        # BENCH corpus host graph (iterated join/groupby rounds), the
        # double-existential Q21 aggregate chain
        ("winnow_pairs", lambda: docs.winnow_dup_pairs(sf_dir).num_rows),
        ("host_scc", lambda: __import__(
            "pomp_ray.pipelines.graph", fromlist=["graph"])
         .host_scc(_bench_pages_path()).num_rows),
        ("q21_waiting", lambda:
         relational.q21_waiting_suppliers(sf_dir).num_rows),
        # sixteenth-block shapes: time-RANGE rolling frames (bucketed
        # composite-axis searchsorted), brute k-NN graph (broadcast
        # matmul, the ANN baseline), host shingle overlap (sliding-
        # window bytes + df-gated self-join over the BENCH corpus),
        # dup-component-keyed splits (components + broadcast assign)
        ("rolling_1h", lambda: __import__(
            "pomp_ray.pipelines.windows", fromlist=["windows"])
         .rolling_window_1h(sf_dir).count()),
        ("knn_graph", lambda: __import__(
            "pomp_ray.pipelines.embeddings", fromlist=["embeddings"])
         .knn_graph_edges(sf_dir).count()),
        ("leakage_splits", lambda: docs.leakage_safe_splits(
            sf_dir).count()),
        # seventeenth-block shapes: skew-salted hash join (dim
        # replication + composite key), CDC full-outer merge, unigram-LM
        # tokenizer training (word-freq pass + broadcast-model EM)
        ("salted_join", lambda: __import__(
            "pomp_ray.pipelines.joins", fromlist=["joins"])
         .salted_join_rollup(sf_dir).count()),
        ("merge_upsert", lambda: __import__(
            "pomp_ray.pipelines.delta", fromlist=["delta"])
         .merge_upsert_docs(sf_dir).count()),
        ("unigram_lm", lambda: tokenizer.unigram_lm_vocab(
            sf_dir).num_rows),
        # round-4 shapes: NOT-step funnel (composite-axis error
        # exclusion), windowed episode co-occurrence, perceptual aHash
        # (utf-32 reinterpret + reduceat + packbits per batch)
        ("exclusion_funnel", lambda: __import__(
            "pomp_ray.pipelines.joins", fromlist=["joins"])
         .exclusion_funnel(sf_dir).count()),
        ("episode_counts", lambda: __import__(
            "pomp_ray.pipelines.windows", fromlist=["windows"])
         .episode_counts(sf_dir).count()),
        ("doc_ahash", lambda: docs.doc_ahash(sf_dir).count()),
    ):
        t0 = time.monotonic()
        fn()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def _cap_thread_pools(num_cpus: int) -> None:
    # Cap library-internal thread pools to the declared budget, otherwise
    # pyarrow/numpy threads silently use every host core and the two
    # parallelism levels measure the same thing.
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    import pyarrow as _pa
    _pa.set_cpu_count(max(2, num_cpus // 2))


def _fresh_session(num_cpus: int) -> None:
    # each crawl component gets an ISOLATED Ray session: leftover
    # object-store contents from a previous component (600k-page
    # corpus broadcasts, spilled shuffle blocks) measurably slow the
    # next one (crawl_join read 23s fresh vs 40-62s after crawl_flat).
    # Session startup happens OUTSIDE the timed windows.
    import ray
    if ray.is_initialized():
        ray.shutdown()
    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def run_quick(num_cpus: int, draws: int = 3) -> dict:
    """``--quick``: tri-draw median +/- spread for the 5 headline crawl
    components (VERDICT r4 #8: a single draw can't distinguish host
    noise from regression -- absolute numbers vary ~2x with co-tenant
    load; medians across fresh-session draws are the comparable
    number)."""
    import statistics

    _cap_thread_pools(num_cpus)
    import ray

    comps = [
        ("crawl_flat", bench_crawl_flat, "pages_per_s"),
        ("crawl_join", bench_crawl_join, "pages_per_s"),
        ("crawl_bfs", bench_crawl_bfs, "pages_per_s"),
        ("crawl_dfs", bench_crawl_dfs, "pages_per_s"),
        ("dedup_ops", bench_dedup_ops, "ops_per_s"),
    ]
    vals: dict[str, list[float]] = {name: [] for name, _, _ in comps}
    for _ in range(draws):
        for name, fn, key in comps:
            _fresh_session(num_cpus)
            vals[name].append(float(fn()[key]))
    ray.shutdown()
    return {
        name: {"median": round(statistics.median(v), 1),
               "min": round(min(v), 1), "max": round(max(v), 1)}
        for name, v in vals.items()
    }


def run_once(num_cpus: int, sf_dir: str, flat_only: bool = False) -> dict:
    _cap_thread_pools(num_cpus)
    import ray

    def fresh_session():
        _fresh_session(num_cpus)

    queries: dict = {}
    result: dict = {}
    if not flat_only:
        fresh_session()
        join = bench_crawl_join()
        queries["crawl_join"] = round(join["sec"], 3)
        result["crawl_join_pages_per_s"] = round(join["pages_per_s"], 1)
    fresh_session()
    flat = bench_crawl_flat()
    queries["crawl_flat"] = round(flat["sec"], 3)
    result["crawl_pages_per_s"] = round(flat["pages_per_s"], 1)
    result["crawl_pages"] = flat["pages"]
    if not flat_only:
        fresh_session()
        flatd = bench_crawl_flat(dedup_content=True)
        queries["crawl_flat_dedup"] = round(flatd["sec"], 3)
        result["crawl_dedup_pages_per_s"] = round(flatd["pages_per_s"], 1)
        fresh_session()
        bfs = bench_crawl_bfs()
        queries["crawl_bfs"] = round(bfs["sec"], 3)
        result["crawl_bfs_pages_per_s"] = round(bfs["pages_per_s"], 1)
        fresh_session()
        dfs = bench_crawl_dfs()
        queries["crawl_dfs"] = round(dfs["sec"], 3)
        result["crawl_dfs_pages_per_s"] = round(dfs["pages_per_s"], 1)
        fresh_session()
        dedup = bench_dedup_ops()
        queries["dedup_ops"] = round(dedup["sec"], 3)
        result["dedup_ops_per_s"] = round(dedup["ops_per_s"], 1)
        queries.update(bench_queries(sf_dir))
    result["queries"] = queries
    result["value"] = round(sum(queries.values()), 3)
    ray.shutdown()
    return result


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        _flat_fixture()  # warm the corpus cache before the timed legs
        lo, hi = (int(x) for x in
                  os.environ.get("RAY_GRAFT_SCALE_LEVELS", "8,32").split(","))
        out = {}
        for n in (lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--flat-only"],
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            out[n] = json.loads(r.stdout.strip().splitlines()[-1])
        tput_lo = out[lo]["crawl_pages_per_s"]
        tput_hi = out[hi]["crawl_pages_per_s"]
        print(json.dumps({
            "metric": f"crawl throughput scaling {lo}->{hi} cpus "
                      "(N vs 4N stand-in)",
            f"sec_{lo}": out[lo]["queries"]["crawl_flat"],
            f"sec_{hi}": out[hi]["queries"]["crawl_flat"],
            f"pages_per_s_{lo}": tput_lo,
            f"pages_per_s_{hi}": tput_hi,
            "scaling_efficiency": round(tput_hi / (hi / lo * tput_lo), 3),
        }))
        return

    if "--quick" in sys.argv:
        draws = int(os.environ.get("RAY_GRAFT_QUICK_DRAWS", "3"))
        print(json.dumps({
            "metric": f"headline crawl components, median of {draws} "
                      "fresh-session draws (units: pages/s, dedup ops/s)",
            "num_cpus": num_cpus,
            "draws": draws,
            "components": run_quick(num_cpus, draws),
        }))
        return

    flat_only = "--flat-only" in sys.argv
    result = run_once(num_cpus, sf_dir, flat_only=flat_only)
    print(json.dumps({
        "metric": "crawl (fetch+parse+analyze+dedup) + seen-set ops + "
                  "doc/relational pipelines, total wall sec",
        "value": result.pop("value"),
        "unit": "sec",
        "queries": result.pop("queries"),
        "sf": sf_dir,
        "num_cpus": num_cpus,
        **result,
    }))


if __name__ == "__main__":
    main()
