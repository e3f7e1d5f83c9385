

def test_recrawl_stale_refetches_old_pages(tmp_path):
    """Age-based recrawl: requeue pages visited before a cutoff round,
    resume, and the crawl re-fetches exactly those urls (and only
    discovers already-seen links, so the crawl terminates right away)."""
    import pyarrow.parquet as pq

    from pomp_ray import crawl as crawl_mod
    from pomp_ray.crawl import CrawlConfig, recrawl_stale, run_crawl
    from pomp_ray.sources import gen_corpus
    from tests.helpers import fixture_corpus

    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs",
                      n_seen_shards=2)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    s1 = run_crawl(cfg, seeds=seeds)
    before = crawl_mod.read_visited(ckpt)
    stale_cut = 2
    expect = sorted({u for u, r in zip(before["url"].to_pylist(),
                                       before["round"].to_pylist())
                     if r < stale_cut})
    n = recrawl_stale(ckpt, before_round=stale_cut)
    assert n == len(expect) > 0
    s2 = run_crawl(cfg, resume=True)
    after = crawl_mod.read_visited(ckpt)
    new_rows = after.to_pandas()[after.to_pandas()["round"] > s1.rounds - 1]
    assert sorted(new_rows["url"].unique()) == expect
    # links of refetched pages are all seen already: no growth beyond them
    assert s2.n_seen == s1.n_seen
