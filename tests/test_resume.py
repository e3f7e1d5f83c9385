

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


def test_export_frontier_seeds_continuation_covers_full_crawl(
        ray_session, tmp_path):
    """Migration contract: stop a crawl early (max_rounds), export the
    pending frontier as seeds, continue in a FRESH engine (new
    checkpoint, empty seen set) from that export -- the union of both
    crawls' visited sets must equal the uninterrupted crawl's set."""
    import pyarrow.parquet as pq

    from pomp_ray import crawl as crawl_mod
    from pomp_ray.crawl import (CrawlConfig, CrawlEngine,
                                export_frontier_seeds)
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_mig_corpus", gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()

    def crawl(ckpt, seed_arg, **kw):
        cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                          robots_path=fix.robots_path, mode="bfs",
                          min_distributed_rows=16, n_seen_shards=2, **kw)
        eng = CrawlEngine(cfg)
        try:
            eng.run(seeds=seed_arg)
        finally:
            eng.close()
        return set(crawl_mod.read_visited(ckpt)["url"].to_pylist())

    full = crawl(str(tmp_path / "full"), seeds)
    partial = crawl(str(tmp_path / "part"), seeds, max_rounds=3)
    assert partial < full   # actually stopped early

    out = str(tmp_path / "migrated_seeds")
    n = export_frontier_seeds(str(tmp_path / "part"), out)
    assert n > 0
    cont = crawl(str(tmp_path / "cont"), out)   # seeds as a parquet PATH
    assert partial | cont == full
