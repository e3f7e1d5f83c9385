"""Continuous-crawl tick: the recurring maintenance pass a production
crawl runs between snapshots, composed from the engine's existing
primitives -- one call per scheduling interval:

  1. ``requeue_retryable``   -- transient fetch failures get another try;
  2. ``recrawl_stale``       -- pages older than the freshness horizon
                                re-enter the frontier (age policy);
  3. ``run(resume=True)``    -- one resumed crawl drains the combined
                                requeue frontier (plus any new links the
                                re-fetches discover);
  4. ``publish_crawl_archive`` -- the refreshed corpus ships as WARC
                                shards + SURT-sorted CDX.

Everything here is a composition -- no new distributed machinery -- so
its correctness rests on the compositional tests of each part plus the
end-to-end tick pytest (re-fetch happened, archive covers the visited
set).  At scale each step is already partition-parallel; the tick adds
only driver-side sequencing.
"""

from __future__ import annotations

import os

from pomp_ray import crawl as crawl_mod
from pomp_ray.crawl import CrawlConfig, CrawlEngine


def crawl_tick(cfg: CrawlConfig, freshness_rounds: int = 0,
               archive_dir: str | None = None) -> dict:
    """One maintenance tick over an EXISTING checkpoint (cfg.ckpt_dir).

    ``freshness_rounds``: re-fetch pages last visited before
    (last_round - freshness_rounds); 0 recrawls everything visited
    before the final round.  Returns counts for observability."""
    ckpt = cfg.ckpt_dir
    n_retry = crawl_mod.requeue_retryable(ckpt)
    import glob as _glob
    import json as _json
    rounds = sorted(_glob.glob(os.path.join(ckpt, "rounds",
                                            "round-*.json")))
    last = _json.load(open(rounds[-1]))["round"] if rounds else 0
    n_stale = crawl_mod.recrawl_stale(
        ckpt, before_round=max(0, last - freshness_rounds))
    eng = CrawlEngine(cfg)
    try:
        stats = eng.run(resume=True)
    finally:
        eng.close()
    out = {"requeued_retryable": n_retry, "requeued_stale": n_stale,
           "tick_rounds": stats.rounds, "tick_visited": stats.n_visited}
    if archive_dir is not None:
        from pomp_ray.pipelines.archive import publish_crawl_archive
        out["archive"] = publish_crawl_archive(ckpt, archive_dir)
    return out
