"""Per-host page budget (``CrawlConfig.max_pages_per_host``): host quota
over the whole crawl, enforced at selection time; exhausted hosts' rows
drop as stage="host_budget" errors (never defer).  Spec lives in the
serial oracle; driver and distributed-exact paths must match it
bit-for-bit, scale mode keeps the per-host bound."""

import collections

import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, CrawlEngine, read_errors, read_visited
from pomp_ray.functions.textfns import url_host
from pomp_ray.sources import gen_corpus
from tests.helpers import fixture_corpus, run_oracle
from tests.test_simple_crawler import _assert_conformance, _run_engine

BUDGET = 10


def _host_visit_counts(ckpt):
    t = read_visited(ckpt)
    return collections.Counter(url_host(u) for u in t["url"].to_pylist())


def test_budget_binds_and_matches_oracle_driver_path(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs", max_pages_per_host=BUDGET)
    _assert_conformance(fix, ckpt, s, "bfs", max_pages_per_host=BUDGET)
    # the quota must actually bind on this fixture (60 pages, 2 hosts)
    counts = _host_visit_counts(ckpt)
    assert counts and all(n <= BUDGET for n in counts.values()), counts
    unbudgeted = run_oracle(fix, mode="bfs")
    assert s.n_visited < len(unbudgeted.visited)
    errs = read_errors(ckpt)
    assert "host_budget" in set(errs["stage"].to_pylist())


def test_budget_distributed_exact(tmp_path):
    """Every round through the distributed path: BudgetCaps selection,
    dropped-row error write, and per-host attempt accounting must stay
    bit-exact vs the serial oracle."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs", max_pages_per_host=BUDGET,
                    min_distributed_rows=0, n_seen_shards=4)
    _assert_conformance(fix, ckpt, s, "bfs", max_pages_per_host=BUDGET)


def test_budget_scale_mode_bound_and_termination(tmp_path):
    """Scale mode relaxes WHICH rows win within a host (group order is
    block-dependent), so conformance is the invariant set: per-host
    attempts never exceed the quota, budget drops land as errors, and
    the crawl terminates with the same per-host visit totals as the
    oracle (every host has more reachable pages than quota here, so the
    totals are forced)."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs", max_pages_per_host=BUDGET,
                    exact_order=False, min_distributed_rows=0,
                    n_seen_shards=2)
    assert s.rounds > 0
    counts = _host_visit_counts(ckpt)
    assert counts and all(n <= BUDGET for n in counts.values()), counts
    res = run_oracle(fix, mode="bfs", max_pages_per_host=BUDGET)
    oracle_counts = collections.Counter(
        url_host(v["url"]) for v in res.visited)
    assert counts == oracle_counts
    errs = read_errors(ckpt)
    assert "host_budget" in set(errs["stage"].to_pylist())


def test_budget_survives_resume(tmp_path):
    """Kill after 2 rounds; a fresh engine must rebuild budget_spent from
    the committed rounds' hosts_selected records and finish identically
    to an uninterrupted budgeted crawl."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    seeds = pq.read_table(fix.seeds_path).to_pylist()

    def cfg():
        return CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                           robots_path=fix.robots_path, mode="bfs",
                           max_pages_per_host=BUDGET)

    c1 = cfg()
    c1.max_rounds = 2
    eng = CrawlEngine(c1)
    try:
        eng.run(seeds=seeds)
    finally:
        eng.close()
    eng2 = CrawlEngine(cfg())
    try:
        eng2.run(resume=True)
        assert eng2.budget_spent, "resume must rebuild spent counters"
    finally:
        eng2.close()
    from tests.helpers import (
        errors_set,
        items_map,
        oracle_errors_set,
        oracle_items_map,
        oracle_visited_tuples,
        read_ckpt,
        visited_tuples,
    )
    res = run_oracle(fix, mode="bfs", max_pages_per_host=BUDGET)
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)
    assert items_map(read_ckpt(ckpt, "items")) == oracle_items_map(res)
    assert errors_set(read_ckpt(ckpt, "errors")) == oracle_errors_set(res)
