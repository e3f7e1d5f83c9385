"""Content-dedup crawl (CrawlConfig.dedup_content) conformance.

Round-snapshot semantics (core/oracle.py dedup_content branch): a page
whose extracted-text digest was committed in a PRIOR round is visited
and emits its item but contributes no new frontier.  Exercised on the
MIRROR corpus (cross-host duplicate content) and the TRAP corpus (the
calendar trap: one text, an unbounded url chain) -- content dedup must
stop the trap without any robots rule.

Scale-mode caveat (asserted here): politeness deferral in scale mode
reorders wave membership relative to the serial oracle (an existing,
documented scale-mode property), and dedup decisions depend on wave
composition -- so scale-mode (url, round) equality is asserted on a
deferral-free run (no robots), while the exact paths conform under the
full robots fixture.
"""

import pytest
import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, CrawlEngine, read_visited
from pomp_ray.sources import gen_corpus
from tests.helpers import (
    errors_set,
    fixture_corpus,
    items_map,
    oracle_errors_set,
    oracle_items_map,
    oracle_visited_tuples,
    read_ckpt,
    run_oracle,
    visited_tuples,
)


def _run(fix, ckpt, **cfg_kw):
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      dedup_content=True, n_seen_shards=4, **cfg_kw)
    eng = CrawlEngine(cfg)
    try:
        summary = eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()
    return summary


@pytest.mark.slow
def test_dedup_bfs_exact_mirror(tmp_path):
    """Mixed driver/distributed exact rounds on the MIRROR corpus must be
    bit-exact vs the oracle, and must visit strictly fewer pages than a
    plain crawl (mirrored subtrees stop expanding)."""
    fix = fixture_corpus(gen_corpus.MIRROR)
    ckpt = str(tmp_path / "ckpt")
    s = _run(fix, ckpt, robots_path=fix.robots_path, mode="bfs",
             min_distributed_rows=16)
    res = run_oracle(fix, mode="bfs", dedup_content=True)
    plain = run_oracle(fix, mode="bfs")
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)
    assert items_map(read_ckpt(ckpt, "items")) == oracle_items_map(res)
    assert errors_set(read_ckpt(ckpt, "errors")) == oracle_errors_set(res)
    assert s.n_visited == len(res.visited) < len(plain.visited)


def test_dedup_stops_calendar_trap(tmp_path):
    """The TRAP corpus /cal chain serves one text over 120 urls; with
    dedup_content the crawl visits at most 2 of them (/cal/0 expands,
    /cal/1 is the first PRIOR-round duplicate and never expands), while
    the plain crawl walks the whole chain."""
    fix = fixture_corpus(gen_corpus.TRAP)
    ckpt = str(tmp_path / "ckpt")
    _run(fix, ckpt, robots_path=fix.robots_path, mode="bfs",
         min_distributed_rows=16)
    res = run_oracle(fix, mode="bfs", dedup_content=True)
    plain = run_oracle(fix, mode="bfs")
    vis = read_ckpt(ckpt, "visited")
    assert visited_tuples(vis) == oracle_visited_tuples(res)
    cal = [u for u in vis["url"].to_pylist() if "/cal/" in u]
    cal_plain = [v["url"] for v in plain.visited if "/cal/" in v["url"]]
    assert len(cal) <= 2 < len(cal_plain)


def test_dedup_scale_set_equality(tmp_path):
    """Scale mode (exact_order=False) on a deferral-free config (no
    robots -> no politeness reordering): the (url, round) set must equal
    the oracle's exactly -- the dedup gate's round-snapshot protocol is
    wave-synchronous in both."""
    fix = fixture_corpus(gen_corpus.MIRROR)
    ckpt = str(tmp_path / "ckpt")
    _run(fix, ckpt, robots_path=None, mode="bfs", exact_order=False,
         min_distributed_rows=16)
    from tests.helpers import oracle_inputs
    from pomp_ray.core.oracle import crawl_oracle
    corpus, seeds, _, _ = oracle_inputs(fix)
    res = crawl_oracle(corpus, seeds, None, mode="bfs", dedup_content=True)
    got = read_visited(ckpt)
    assert {(u, r) for u, r in zip(got["url"].to_pylist(),
                                   got["round"].to_pylist())} == \
        {(v["url"], v["round"]) for v in res.visited}


@pytest.mark.slow
def test_dedup_resume(tmp_path):
    """Kill after 3 rounds, resume: the digest shards must restore from
    the parquet deltas so post-resume rounds still honor digests
    committed before the cut.  End state == one-shot crawl."""
    fix = fixture_corpus(gen_corpus.MIRROR)
    full = str(tmp_path / "full")
    part = str(tmp_path / "part")
    _run(fix, full, robots_path=fix.robots_path, mode="bfs",
         min_distributed_rows=16)

    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=part,
                      robots_path=fix.robots_path, mode="bfs",
                      dedup_content=True, n_seen_shards=4,
                      min_distributed_rows=16, max_rounds=3)
    eng = CrawlEngine(cfg)
    try:
        eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()
    cfg2 = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=part,
                       robots_path=fix.robots_path, mode="bfs",
                       dedup_content=True, n_seen_shards=4,
                       min_distributed_rows=16)
    eng2 = CrawlEngine(cfg2)
    try:
        eng2.run(resume=True)
    finally:
        eng2.close()
    assert visited_tuples(read_ckpt(part, "visited")) == \
        visited_tuples(read_ckpt(full, "visited"))
