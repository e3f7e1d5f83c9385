"""Per-host fetch-error circuit breaker (max_errors_per_host): once a
host accumulates N fetch errors across committed rounds, its remaining
frontier rows drop through the host-cap channel (stage=host_budget),
exactly like an exhausted page budget.  Round-start snapshot semantics;
serial spec in core/oracle.py."""

import pytest
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


@pytest.mark.slow
def test_breaker_trips_and_matches_oracle(tmp_path):
    fix = fixture_corpus(gen_corpus.SMALL)
    res = run_oracle(fix, mode="bfs", max_errors_per_host=2)
    full = run_oracle(fix, mode="bfs")
    assert len(res.visited) < len(full.visited)  # breaker actually bites
    assert any(e["stage"] == "host_budget" for e in res.errors)

    for sub, mdr in (("driver", 100000), ("dist", 0)):
        ckpt = str(tmp_path / sub)
        _run(fix, ckpt, max_errors_per_host=2, min_distributed_rows=mdr)
        assert visited_tuples(read_ckpt(ckpt, "visited")) == \
            oracle_visited_tuples(res)
        errs = read_ckpt(ckpt, "errors")
        assert sorted(
            (u, s, r) for u, s, r in zip(errs["url"].to_pylist(),
                                         errs["stage"].to_pylist(),
                                         errs["round"].to_pylist())) == \
            sorted((e["url"], e["stage"], e["round"]) for e in res.errors)


def test_breaker_scale_set_and_resume(tmp_path):
    """Deferral-free config (no robots): politeness deferral reorders
    scale-mode wave membership, which legitimately shifts trip rounds
    (the content-dedup caveat, CLAUDE.md) -- set conformance is only
    promised without crawl_delay hosts."""
    from pomp_ray.core.oracle import crawl_oracle
    from tests.helpers import oracle_inputs

    fix = fixture_corpus(gen_corpus.SMALL)
    corpus, seeds, _, _ = oracle_inputs(fix)
    res = crawl_oracle(corpus, seeds, None, mode="bfs",
                       max_errors_per_host=2)
    ckpt = str(tmp_path / "scale")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=None, mode="bfs",
                      n_seen_shards=4, max_errors_per_host=2,
                      exact_order=False, min_distributed_rows=0)
    eng = CrawlEngine(cfg)
    try:
        eng.run(seeds=seeds)
    finally:
        eng.close()
    assert set(read_ckpt(ckpt, "visited")["url"].to_pylist()) == \
        {v["url"] for v in res.visited}

    # resume on the finished crawl: trip state restored, nothing re-runs
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=None, mode="bfs",
                      n_seen_shards=4, max_errors_per_host=2,
                      exact_order=False, min_distributed_rows=0)
    eng = CrawlEngine(cfg)
    try:
        s2 = eng.run(resume=True)
        assert s2.n_visited == 0
        assert any(n >= 2 for n in eng.errors_by_host.values())
    finally:
        eng.close()
