"""Link-scope allow/deny regex filters (CrawlConfig url_allow/url_deny,
the Scrapy LinkExtractor shape) and the global visited budget
(max_visited).  Filters drop rejected links silently at enqueue time --
never marked seen, never errored; seeds are exempt.  The budget is
round-granular: the crossing round completes (the only budget a
wave-synchronous crawl can honor).  Serial spec: core/oracle.py."""

import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, CrawlEngine
from pomp_ray.sources import gen_corpus
from tests.helpers import (
    fixture_corpus,
    oracle_visited_tuples,
    read_ckpt,
    run_oracle,
    visited_tuples,
)


def _run(fix, ckpt, **cfg_kw):
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs",
                      n_seen_shards=4, **cfg_kw)
    eng = CrawlEngine(cfg)
    try:
        return eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()


def test_url_deny_both_paths(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    for sub, mdr in (("driver", 256), ("dist", 0)):
        ckpt = str(tmp_path / sub)
        _run(fix, ckpt, url_deny=r"/p/1[0-9]$", min_distributed_rows=mdr)
        res = run_oracle(fix, mode="bfs", url_deny=r"/p/1[0-9]$")
        vis = read_ckpt(ckpt, "visited")
        assert visited_tuples(vis) == oracle_visited_tuples(res)
        assert not any(u.rstrip("0123456789").endswith("/p/1") or
                       ("/p/1" in u and u.split("/p/")[1].startswith("1")
                        and len(u.split("/p/")[1]) == 2)
                       for u in vis["url"].to_pylist())


def test_url_allow_scale_set(tmp_path):
    """Allow filter under scale mode: visited set == oracle's (the
    filter is a pure per-url predicate, wave-order independent)."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    _run(fix, ckpt, url_allow=r"site0\.test", exact_order=False,
         min_distributed_rows=0)
    res = run_oracle(fix, mode="bfs", url_allow=r"site0\.test")
    vis = read_ckpt(ckpt, "visited")
    assert set(vis["url"].to_pylist()) == {v["url"] for v in res.visited}
    # the seed of site1 is exempt; its links are not
    assert sum("site1.test" in u for u in vis["url"].to_pylist()) == 1


def test_max_visited_budget(tmp_path):
    """Round-granular visited cap, exact vs oracle; a resumed crawl must
    honor the budget spent before the cut."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    s = _run(fix, ckpt, max_visited=25, min_distributed_rows=0)
    res = run_oracle(fix, mode="bfs", max_visited=25)
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)
    assert s.n_visited >= 25

    # resume on the finished budgeted crawl: nothing more runs
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs",
                      n_seen_shards=4, max_visited=25,
                      min_distributed_rows=0)
    eng = CrawlEngine(cfg)
    try:
        s2 = eng.run(resume=True)
    finally:
        eng.close()
    assert s2.n_visited == 0
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)


def test_same_host_only(tmp_path):
    """Stay-on-site crawl: cross-host links drop at enqueue (seeds
    still plant both hosts); exact conformance on both round paths."""
    fix = fixture_corpus(gen_corpus.TINY)
    for sub, mdr in (("driver", 256), ("dist", 0)):
        ckpt = str(tmp_path / sub)
        _run(fix, ckpt, same_host_only=True, min_distributed_rows=mdr)
        res = run_oracle(fix, mode="bfs", same_host_only=True)
        vis = read_ckpt(ckpt, "visited")
        assert visited_tuples(vis) == oracle_visited_tuples(res)
    plain = run_oracle(fix, mode="bfs")
    assert len(res.visited) <= len(plain.visited)


def test_all_policies_combined_conformance(tmp_path):
    """Everything on at once -- content dedup, priority aging, deny
    filter, same-host scope, global cap, per-host quota, politeness --
    against the oracle with the same knobs: policy INTERACTIONS (gate
    ordering, budget accounting under filtered enqueues, aging of
    quota-deferred rows) must stay bit-exact, not just each policy
    alone."""
    fix = fixture_corpus(gen_corpus.MIRROR)
    ckpt = str(tmp_path / "ckpt")
    kw = dict(dedup_content=True, priority_aging=1,
              url_deny=r"/p/9[0-9]$", same_host_only=True,
              max_visited=400, max_pages_per_host=80,
              max_errors_per_host=3, max_text_bytes=40_000,
              max_frontier_rows=300, round_budget_s=5.0)
    _run(fix, ckpt, min_distributed_rows=16, **kw)
    res = run_oracle(fix, mode="bfs", **kw)
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)


def test_max_links_per_page(tmp_path):
    """Per-page outlink cap: only the first N links in document order
    expand; items keep the page's FULL n_links.  Exact conformance on
    both round paths, and the cap composes into the all-policies suite
    via the combined test's spirit (cap + deny here)."""
    fix = fixture_corpus(gen_corpus.TINY)
    for sub, mdr in (("driver", 256), ("dist", 0)):
        ckpt = str(tmp_path / sub)
        _run(fix, ckpt, max_links_per_page=1, min_distributed_rows=mdr)
        res = run_oracle(fix, mode="bfs", max_links_per_page=1)
        vis = read_ckpt(ckpt, "visited")
        assert visited_tuples(vis) == oracle_visited_tuples(res)
        # cap=1 binds hard on TINY (8 of 57 pages reachable through
        # first-link-only chains)
        plain = run_oracle(fix, mode="bfs")
        assert len(res.visited) < len(plain.visited)
        # items report the uncapped link count
        items = read_ckpt(ckpt, "items")
        by_url = {r["url"]: r["n_links"]
                  for r in res.items}
        for u, n in zip(items["url"].to_pylist(),
                        items["n_links"].to_pylist()):
            assert n == by_url[u]

    # cap + deny filter together, exact
    ckpt = str(tmp_path / "combo")
    _run(ckpt=ckpt, fix=fix, max_links_per_page=1,
         url_deny=r"/p/1[0-9]$", min_distributed_rows=0)
    res = run_oracle(fix, mode="bfs", max_links_per_page=1,
                     url_deny=r"/p/1[0-9]$")
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)


def test_max_text_bytes_budget(tmp_path):
    """Round-granular extracted-text byte budget (the "collect N bytes
    of corpus" target), bit-exact vs oracle on both round paths, plus a
    resume no-op once the budget is spent."""
    fix = fixture_corpus(gen_corpus.TINY)
    res = run_oracle(fix, mode="bfs", max_text_bytes=1500)
    full = run_oracle(fix, mode="bfs")
    assert len(res.visited) < len(full.visited)  # budget actually cuts

    for sub, mdr in (("driver", 256), ("dist", 0)):
        ckpt = str(tmp_path / sub)
        s = _run(fix, ckpt, max_text_bytes=1500, min_distributed_rows=mdr)
        assert visited_tuples(read_ckpt(ckpt, "visited")) == \
            oracle_visited_tuples(res)
        # the crossing round completes: budget is met or first exceeded
        total = sum(int(i.get("n_text_bytes", 0)) for i in s.per_round)
        assert total >= 1500

    # resume on the spent budget: nothing more runs
    ckpt = str(tmp_path / "dist")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs",
                      n_seen_shards=4, max_text_bytes=1500,
                      min_distributed_rows=0)
    eng = CrawlEngine(cfg)
    try:
        s2 = eng.run(resume=True)
    finally:
        eng.close()
    assert s2.n_visited == 0

    # scale mode (deferral-free BFS): same visited set, same cut
    ckpt = str(tmp_path / "scale")
    _run(fix, ckpt, max_text_bytes=1500, exact_order=False,
         min_distributed_rows=0)
    assert set(read_ckpt(ckpt, "visited")["url"].to_pylist()) == \
        {v["url"] for v in res.visited}
