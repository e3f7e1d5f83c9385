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


def test_incremental_rollup_resumes_mid_stream(ray_session, tmp_path):
    """Kill-and-resume: run 3 of 5 ticks, 'crash', resume all 5 --
    finished ticks are skipped (idempotent markers) and the final state
    equals the one-shot batch rollup."""
    import os

    import duckdb
    import pyarrow.parquet as pq

    from pomp_ray.pipelines.relational import (incremental_rollup,
                                               run_incremental_tick)

    sf = "/root/testdata/sf0.001"
    state = str(tmp_path / "state")
    os.makedirs(state)
    n_events = pq.ParquetFile(sf + "/events.parquet").metadata.num_rows
    bounds = [n_events * i // 5 for i in range(6)]
    for tick in range(3):                       # partial run, then "crash"
        run_incremental_tick(sf, state, tick, bounds[tick],
                             bounds[tick + 1])
    mtime = os.path.getmtime(state + "/tick-0001.json")
    for tick in range(5):                       # resume from the top
        run_incremental_tick(sf, state, tick, bounds[tick],
                             bounds[tick + 1])
    assert os.path.getmtime(state + "/tick-0001.json") == mtime  # skipped

    got = pq.read_table(state + "/state.parquet").to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM '{sf}/events.parquet' GROUP BY event_type ORDER BY 1
    """).df().reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # the driver-facing wrapper reproduces the same state end to end
    full = incremental_rollup(sf, n_ticks=5).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(full, want, check_dtype=False)


def test_archive_bootstrap_roundtrip(ray_session, tmp_path):
    """publish -> archive_to_seeds -> fresh crawl from the seeds: the
    new engine's visited set equals the original crawl's (every
    captured page is a seed; expansion rediscovers only in-set links)."""
    import pyarrow.parquet as pq

    from pomp_ray import crawl as crawl_mod
    from pomp_ray.crawl import CrawlConfig, CrawlEngine
    from pomp_ray.pipelines.archive import (archive_to_seeds,
                                            publish_crawl_archive)
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_boot_corpus", gen_corpus.TINY)

    def crawl(ckpt, seed_arg):
        cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                          robots_path=fix.robots_path, mode="bfs",
                          min_distributed_rows=16, n_seen_shards=2)
        eng = CrawlEngine(cfg)
        try:
            eng.run(seeds=seed_arg)
        finally:
            eng.close()
        return set(crawl_mod.read_visited(ckpt)["url"].to_pylist())

    orig = crawl(str(tmp_path / "a"),
                 pq.read_table(fix.seeds_path).to_pylist())
    publish_crawl_archive(str(tmp_path / "a"), str(tmp_path / "pub"))
    n = archive_to_seeds(str(tmp_path / "pub"), str(tmp_path / "seeds"))
    assert n == len(orig)
    boot = crawl(str(tmp_path / "b"), str(tmp_path / "seeds"))
    assert boot == orig
