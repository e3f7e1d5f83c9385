"""Sitemap-freshness recrawl loop: XML sitemap lastmod -> staleness
report -> SitemapFreshnessPriority steers a best-first crawl, bit-exact
vs the serial oracle under the same scorer, with stale pages visited
earlier on average than under BFS."""

import pytest

from pomp_ray.crawl import CrawlConfig, CrawlEngine
from pomp_ray.sources import gen_corpus
from tests.helpers import (
    fixture_corpus,
    oracle_inputs,
    oracle_visited_tuples,
    read_ckpt,
    run_oracle,
    visited_tuples,
)


def _run_crawl(cfg, seeds):
    eng = CrawlEngine(cfg)
    try:
        return eng.run(seeds=seeds)
    finally:
        eng.close()


@pytest.mark.slow
def test_sitemap_freshness_priority_recrawl(ray_session, tmp_path):
    from pomp_ray.core.oracle import crawl_oracle
    from pomp_ray.sources.corpus import sitemap_stale_report
    from pomp_ray.stages.enqueue import SitemapFreshnessPriority

    fix = fixture_corpus(gen_corpus.XMLMAP, base="/tmp/pomp_q_corpus_xmlmap_t")
    corpus, seeds, robots, _ = oracle_inputs(fix)
    report = sitemap_stale_report(fix.pages_path).take_all()
    assert any(r["stale"] for r in report)
    assert any(not r["stale"] for r in report)
    pr = SitemapFreshnessPriority.from_stale_report(report)
    assert set(pr.pri.values()) == {1, 2}

    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="best",
                      best_width=64, priority_fn=pr,
                      min_distributed_rows=0, n_seen_shards=2)
    summary = _run_crawl(cfg, seeds)
    assert any(r["path"] == "exact" for r in summary.per_round)
    res = crawl_oracle(corpus, seeds, robots, mode="best", best_width=64,
                       priority_fn=pr)
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)

    # freshness check: stale-listed urls come earlier than under BFS
    stale_urls = {r["url"] for r in report if r["stale"]}

    def mean_rank(order):
        ranks = [i for i, u in enumerate(order) if u in stale_urls]
        return sum(ranks) / max(1, len(ranks))

    res_bfs = run_oracle(fix, mode="bfs")
    assert mean_rank([v["url"] for v in res.visited]) < \
        mean_rank([v["url"] for v in res_bfs.visited])
