"""Command-line entry point -- the thing ``ray job submit`` runs on a
cluster (north_rule: "the job runs via ray job submit on fixed
multi-node clusters"):

    ray job submit -- python -m pomp_ray.cli crawl \\
        --corpus pages.parquet --ckpt /data/ckpt --robots robots.parquet \\
        --mode bfs --scale --salts 8

Subcommands:
  crawl         run a crawl (resume with --resume; scale mode with --scale)
  dedup-corpus  write the exact-deduplicated documents corpus
  robots        build a robots table from a corpus's /robots.txt pages
  publish       ship a finished checkpoint as WARC shards + CDX index
  tick          continuous-crawl maintenance pass (requeue + stale
                recrawl + resume + optional publish)
  export-seeds  compact a stopped crawl's pending frontier to seeds

This module OWNS the Ray session (guarded init), unlike the library; on
a cluster ``ray.init(address="auto")`` attaches to the running cluster,
locally it starts one.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(address: str | None) -> None:
    import ray
    if not ray.is_initialized():
        kw = {"address": address} if address else {}
        ray.init(include_dashboard=False, **kw)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def cmd_crawl(args: argparse.Namespace) -> int:
    import pyarrow.parquet as pq

    from pomp_ray.crawl import CrawlConfig, run_crawl

    cfg = CrawlConfig(
        corpus_path=args.corpus, ckpt_dir=args.ckpt,
        robots_path=args.robots, mode=args.mode,
        exact_order=not args.scale, n_salts=args.salts,
        n_seen_shards=args.seen_shards, dfs_width=args.dfs_width,
        max_depth=args.max_depth, max_rounds=args.max_rounds,
        round_budget_s=args.round_budget,
        fetch_strategy=args.fetch_strategy,
        min_distributed_rows=args.min_distributed_rows,
        dedup_content=args.dedup_content,
        priority_aging=args.priority_aging,
        url_allow=args.url_allow, url_deny=args.url_deny,
        max_visited=args.max_visited,
        max_frontier_rows=args.max_frontier_rows,
        same_host_only=args.same_host_only,
    )
    seeds = None
    if not args.resume:
        if not args.seeds:
            print("error: --seeds required for a fresh crawl",
                  file=sys.stderr)
            return 2
        seeds = pq.read_table(args.seeds).to_pylist()
    s = run_crawl(cfg, seeds=seeds, resume=args.resume)
    print(json.dumps({"rounds": s.rounds, "visited": s.n_visited,
                      "items": s.n_items, "errors": s.n_errors,
                      "seen": s.n_seen, "wall_s": round(s.wall_s, 2)}))
    return 0


def cmd_dedup_corpus(args: argparse.Namespace) -> int:
    from pomp_ray.pipelines.docs import write_dedup_corpus
    n = write_dedup_corpus(args.sf_dir, args.out)
    print(json.dumps({"rows_written": n, "out": args.out}))
    return 0


def cmd_robots(args: argparse.Namespace) -> int:
    from pomp_ray.functions.robotsfns import write_robots_table
    n = write_robots_table(args.corpus, args.out, args.user_agent)
    print(json.dumps({"hosts": n, "out": args.out}))
    return 0


def cmd_publish(args: argparse.Namespace) -> int:
    from pomp_ray.pipelines.archive import publish_crawl_archive
    out = publish_crawl_archive(args.ckpt, args.out)
    print(json.dumps(out))
    return 0


def cmd_tick(args: argparse.Namespace) -> int:
    from pomp_ray.crawl import CrawlConfig
    from pomp_ray.pipelines.continuous import crawl_tick

    cfg = CrawlConfig(corpus_path=args.corpus, ckpt_dir=args.ckpt,
                      robots_path=args.robots, mode=args.mode,
                      fetch_strategy=args.fetch_strategy)
    out = crawl_tick(cfg, freshness_rounds=args.freshness_rounds,
                     archive_dir=args.archive)
    print(json.dumps(out))
    return 0


def cmd_fsck(args: argparse.Namespace) -> int:
    from pomp_ray.fsck import verify_checkpoint

    rep = verify_checkpoint(args.ckpt, deep=args.deep)
    print(json.dumps(rep))
    return 0 if rep["ok"] else 1


def cmd_gc(args: argparse.Namespace) -> int:
    from pomp_ray.fsck import gc_checkpoint

    rep = gc_checkpoint(args.ckpt)
    print(json.dumps(rep))
    return 0


def cmd_reshard(args: argparse.Namespace) -> int:
    from pomp_ray.fsck import reshard_checkpoint

    rep = reshard_checkpoint(args.ckpt, args.n_shards)
    print(json.dumps(rep))
    return 0


def cmd_export_seeds(args: argparse.Namespace) -> int:
    from pomp_ray.crawl import export_frontier_seeds
    n = export_frontier_seeds(args.ckpt, args.out)
    print(json.dumps({"seeds_exported": n, "out": args.out}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pomp_ray")
    p.add_argument("--address", default=None,
                   help='ray address ("auto" on a cluster; default: local)')
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run a crawl")
    c.add_argument("--corpus", required=True)
    c.add_argument("--ckpt", required=True)
    c.add_argument("--seeds", help="seeds parquet (url/priority/depth)")
    c.add_argument("--robots")
    c.add_argument("--mode", choices=("bfs", "dfs"), default="bfs")
    c.add_argument("--scale", action="store_true",
                   help="scale mode (relaxed order) instead of exact")
    c.add_argument("--resume", action="store_true")
    c.add_argument("--salts", type=int, default=8)
    c.add_argument("--seen-shards", type=int, default=8)
    c.add_argument("--dfs-width", type=int, default=1)
    c.add_argument("--max-depth", type=int, default=None)
    c.add_argument("--max-rounds", type=int, default=None)
    c.add_argument("--round-budget", type=float, default=10.0)
    c.add_argument("--min-distributed-rows", type=int, default=256)
    c.add_argument("--fetch-strategy", default="broadcast",
                   choices=("broadcast", "actor", "join"))
    c.add_argument("--dedup-content", action="store_true",
                   help="skip link expansion of pages whose extracted "
                        "text was already seen (trap/mirror defense)")
    c.add_argument("--priority-aging", type=int, default=0,
                   help="priority gained per round a frontier row is "
                        "deferred (starvation fix; 0 = off)")
    c.add_argument("--url-allow", default=None,
                   help="only enqueue links whose canonical url matches "
                        "this regex (seeds exempt)")
    c.add_argument("--url-deny", default=None,
                   help="never enqueue links whose canonical url matches "
                        "this regex (seeds exempt)")
    c.add_argument("--max-visited", type=int, default=None,
                   help="stop after this many visited pages "
                        "(round-granular)")
    c.add_argument("--max-frontier-rows", type=int, default=None,
                   help="bounded-frontier admission: keep only the best "
                        "N pending rows at each round barrier, drop the "
                        "overflow as frontier_cap errors")
    c.add_argument("--same-host-only", action="store_true",
                   help="drop links leaving their parent page's host "
                        "(stay-on-site crawl)")
    c.set_defaults(fn=cmd_crawl)

    d = sub.add_parser("dedup-corpus",
                       help="write the exact-deduplicated corpus")
    d.add_argument("--sf-dir", required=True)
    d.add_argument("--out", required=True)
    d.set_defaults(fn=cmd_dedup_corpus)

    r = sub.add_parser("robots", help="robots table from a pages corpus")
    r.add_argument("--corpus", required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--user-agent", default="*")
    r.set_defaults(fn=cmd_robots)

    pub = sub.add_parser("publish",
                         help="checkpoint -> WARC shards + CDX index")
    pub.add_argument("--ckpt", required=True)
    pub.add_argument("--out", required=True)
    pub.set_defaults(fn=cmd_publish)

    t = sub.add_parser("tick", help="continuous-crawl maintenance pass")
    t.add_argument("--corpus", required=True)
    t.add_argument("--ckpt", required=True)
    t.add_argument("--robots")
    t.add_argument("--mode", choices=("bfs", "dfs"), default="bfs")
    t.add_argument("--fetch-strategy", default="broadcast",
                   choices=("broadcast", "actor", "join"))
    t.add_argument("--freshness-rounds", type=int, default=0)
    t.add_argument("--archive", default=None,
                   help="also publish WARC+CDX here after the tick")
    t.set_defaults(fn=cmd_tick)

    k = sub.add_parser("fsck", help="verify checkpoint integrity "
                                    "(counters vs parquet metadata, "
                                    "sidecars, seen snapshots)")
    k.add_argument("--ckpt", required=True)
    k.add_argument("--deep", action="store_true",
                   help="also reconcile the logical errors table "
                        "(column reads)")
    k.set_defaults(fn=cmd_fsck)

    g = sub.add_parser("gc", help="collect consumed frontier/deferred "
                                  "inputs and compact seen/digest deltas")
    g.add_argument("--ckpt", required=True)
    g.set_defaults(fn=cmd_gc)

    rs = sub.add_parser("reshard", help="rewrite seen/digest snapshots "
                                        "for a new n_seen_shards")
    rs.add_argument("--ckpt", required=True)
    rs.add_argument("--n-shards", dest="n_shards", type=int, required=True)
    rs.set_defaults(fn=cmd_reshard)

    e = sub.add_parser("export-seeds",
                       help="pending frontier -> seeds parquet dir")
    e.add_argument("--ckpt", required=True)
    e.add_argument("--out", required=True)
    e.set_defaults(fn=cmd_export_seeds)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    _init_ray(args.address)
    try:
        return args.fn(args)
    finally:
        import ray
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
