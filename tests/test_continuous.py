"""Continuous-crawl tick: requeue + stale recrawl + resume + publish,
composed end to end over a TINY checkpoint."""
import glob

import pyarrow.parquet as pq

from pomp_ray import crawl as crawl_mod
from pomp_ray.crawl import CrawlConfig, CrawlEngine
from pomp_ray.pipelines.continuous import crawl_tick
from pomp_ray.sources import gen_corpus


def test_crawl_tick_refreshes_and_publishes(ray_session, tmp_path):
    fix = gen_corpus.generate("/tmp/pomp_tick_corpus", gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs",
                      min_distributed_rows=16, n_seen_shards=2)
    eng = CrawlEngine(cfg)
    try:
        eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()
    before = crawl_mod.read_visited(ckpt)
    urls_before = set(before["url"].to_pylist())
    rounds_before = len(glob.glob(ckpt + "/rounds/round-*.json"))

    out = crawl_tick(cfg, freshness_rounds=0,
                     archive_dir=str(tmp_path / "archive"))
    # everything visited before the final round was requeued and
    # re-fetched in new rounds
    assert out["requeued_stale"] > 0
    after = crawl_mod.read_visited(ckpt)
    assert after.num_rows > before.num_rows       # revisits recorded
    assert set(after["url"].to_pylist()) == urls_before  # no new pages
    assert len(glob.glob(ckpt + "/rounds/round-*.json")) > rounds_before

    # the published archive covers each url exactly ONCE (latest capture)
    cdx = pq.read_table(str(tmp_path / "archive" / "cdx"))
    assert cdx.num_rows == len(urls_before)
    assert set(cdx["url"].to_pylist()) == urls_before
    assert out["archive"]["pages"] == len(urls_before)
