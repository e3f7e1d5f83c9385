"""Priority-aging conformance (CrawlConfig.priority_aging): every row a
round defers -- politeness overflow or best/dfs width-cut tail -- gains
priority before re-entering the frontier (the classic starvation fix for
priority-queue scheduling).  The serial spec is core/oracle.py's
priority_aging; the engine applies the same bump at deferred write-back
on all paths (driver concat, exact writer maps, scale-mode politeness
overflow + LIFO width-cut side files)."""

import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, CrawlEngine
from pomp_ray.sources import gen_corpus
from pomp_ray.stages.enqueue import HashPriority
from tests.helpers import (
    fixture_corpus,
    oracle_visited_tuples,
    read_ckpt,
    run_oracle,
    visited_tuples,
)


def _run(fix, ckpt, **cfg_kw):
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, n_seen_shards=4,
                      **cfg_kw)
    eng = CrawlEngine(cfg)
    try:
        eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()


def test_aging_best_first_exact(tmp_path):
    """Narrow best-first (width 8, driver+distributed mixed): aged
    deferrals must reorder rounds exactly as the oracle says -- and the
    order must actually DIFFER from the non-aged crawl (the feature is
    live, not a no-op)."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    _run(fix, ckpt, mode="best", best_width=8,
         priority_fn=HashPriority(7), priority_aging=1,
         min_distributed_rows=16)
    res = run_oracle(fix, mode="best", best_width=8,
                     priority_fn=HashPriority(7), priority_aging=1)
    got = visited_tuples(read_ckpt(ckpt, "visited"))
    assert got == oracle_visited_tuples(res)
    plain = run_oracle(fix, mode="best", best_width=8,
                       priority_fn=HashPriority(7))
    assert got != oracle_visited_tuples(plain)


def test_aging_dfs_wide_distributed(tmp_path):
    """Wide DFS runs the distributed exact path; the width-cut tail ages
    through the width_deferred writer."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    _run(fix, ckpt, mode="dfs", dfs_width=16, priority_aging=2,
         min_distributed_rows=0)
    res = run_oracle(fix, mode="dfs", dfs_width=16, priority_aging=2)
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)


def test_aging_politeness_deferral(tmp_path):
    """BFS under a tight crawl-delay budget: politeness-deferred rows
    age through the exact path's deferred writer."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    _run(fix, ckpt, mode="bfs", priority_aging=1, round_budget_s=3.0,
         min_distributed_rows=0)
    res = run_oracle(fix, mode="bfs", priority_aging=1, round_budget_s=3.0)
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)
