"""Headline benchmark.  Prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-component sec...}, "sf": ..., "num_cpus": N,
     "crawl_pages_per_s": ..., "dedup_ops_per_s": ...}

Components:
  * crawl      -- BFS crawl (scale mode) over the deterministic BENCH
                  corpus (200 hosts, zipf(1.2) skew, 200k pages):
                  fetch + parse + per-page analysis + frontier dedup +
                  politeness + checkpoints.  The north-star metric.
  * dedup_ops  -- seen-shard check_and_add microbench (frontier dedup
                  ops/s) driven from parallel Ray tasks.
  * docs / relational -- representative query pipelines over
                  $GRAFT_SF_DIR (default /root/testdata/sf0.1).

``--scaling`` runs the crawl component in two FRESH processes at
num_cpus=8 and num_cpus=32 on the same (pre-generated) input and reports
both throughputs + scaling efficiency (the sandbox stand-in for N vs 4N
Ray nodes; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BENCH_CORPUS_DIR = "/tmp/pomp_bench_corpus"


def _gen_corpus():
    from pomp_ray.sources import gen_corpus
    return gen_corpus.generate(BENCH_CORPUS_DIR, gen_corpus.BENCH)


def bench_crawl(fix) -> dict:
    import pyarrow.parquet as pq

    from pomp_ray.crawl import CrawlConfig, CrawlEngine
    from pomp_ray.functions import analysis as an

    def enrich(batch):
        # per-page analysis work a real training-data crawl does inline
        import pyarrow as pa
        import pyarrow.compute as pc
        t = batch
        text = t["text"]
        t = t.append_column("n_words", pc.count_substring_regex(text, pattern=r"\S+"))
        return an.lang_id_batch(t, "text", "pred_lang")

    cfg = CrawlConfig(
        corpus_path=fix.pages_path, ckpt_dir="/tmp/pomp_bench_ckpt",
        robots_path=fix.robots_path, mode="bfs", exact_order=False,
        n_salts=4, n_seen_shards=8, min_distributed_rows=512,
        enrich_fn=enrich, round_budget_s=1e9,
    )
    eng = CrawlEngine(cfg)
    try:
        seeds = pq.read_table(fix.seeds_path).to_pylist()
        t0 = time.monotonic()
        s = eng.run(seeds=seeds)
        dt = time.monotonic() - t0
    finally:
        eng.close()
    return {"sec": dt, "pages": s.n_visited, "rounds": s.rounds,
            "pages_per_s": s.n_visited / dt}


def bench_dedup_ops(n_urls: int = 1_000_000, n_tasks: int = 32,
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


def bench_queries(sf_dir: str) -> dict:
    from pomp_ray.pipelines import docs, relational

    out = {}
    for name, fn in (
        ("docs_quality", lambda: docs.quality_stats(sf_dir).count()),
        ("docs_dedup", lambda: docs.dedup_exact(sf_dir).count()),
        ("lineitem_summary",
         lambda: relational.lineitem_pricing_summary(sf_dir).count()),
        ("events_rollup", lambda: relational.events_rollup(sf_dir).count()),
    ):
        t0 = time.monotonic()
        fn()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def run_once(num_cpus: int, sf_dir: str, crawl_only: bool = False) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    fix = _gen_corpus()
    queries: dict = {}
    crawl = bench_crawl(fix)
    queries["crawl"] = round(crawl["sec"], 3)
    result = {
        "crawl_pages_per_s": round(crawl["pages_per_s"], 1),
        "crawl_pages": crawl["pages"],
        "crawl_rounds": crawl["rounds"],
    }
    if not crawl_only:
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
        _gen_corpus()   # warm the corpus cache so both runs measure compute
        out = {}
        for n in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--crawl-only"],
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            out[n] = json.loads(r.stdout.strip().splitlines()[-1])
        tput8 = out[8]["crawl_pages_per_s"]
        tput32 = out[32]["crawl_pages_per_s"]
        print(json.dumps({
            "metric": "crawl throughput scaling 8->32 cpus (N vs 4N stand-in)",
            "sec_8": out[8]["queries"]["crawl"],
            "sec_32": out[32]["queries"]["crawl"],
            "pages_per_s_8": tput8,
            "pages_per_s_32": tput32,
            "scaling_efficiency": round(tput32 / (4 * tput8), 3),
        }))
        return

    crawl_only = "--crawl-only" in sys.argv
    result = run_once(num_cpus, sf_dir, crawl_only=crawl_only)
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
