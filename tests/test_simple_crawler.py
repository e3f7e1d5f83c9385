"""Port of pomp's tests/test_simple_crawler e2e suite (SURVEY.md section 5,
BASELINE.json north_star): the engine's BFS/DFS crawl over the synthetic
sitemap corpus must match the serial reference loop -- visited set AND
per-round order, items, errors, seen set."""

import pytest
import os

import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, CrawlEngine
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


def _run_engine(fix, ckpt, **cfg_kw):
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, **cfg_kw)
    eng = CrawlEngine(cfg)
    try:
        seeds = pq.read_table(fix.seeds_path).to_pylist()
        summary = eng.run(seeds=seeds)
    finally:
        eng.close()
    return summary


def _assert_conformance(fix, ckpt, summary, mode, exact=True, **oracle_kw):
    res = run_oracle(fix, mode=mode, **oracle_kw)
    vis = read_ckpt(ckpt, "visited")
    items = read_ckpt(ckpt, "items")
    errs = read_ckpt(ckpt, "errors")
    if exact:
        assert visited_tuples(vis) == oracle_visited_tuples(res)
    else:
        assert set(vis["url"].to_pylist()) == {v["url"] for v in res.visited}
    assert items_map(items) == oracle_items_map(res)
    assert errors_set(errs) == oracle_errors_set(res)
    assert summary.n_seen == len(res.seen)
    assert summary.n_visited == len(res.visited)


def test_bfs_driver_path(tmp_path):
    """Tiny corpus -> every round takes the serial driver fast path."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs")
    _assert_conformance(fix, ckpt, s, "bfs")


def test_bfs_distributed_exact(tmp_path):
    """Force every round through the distributed path (groupby dedup,
    zip_with_index seq, seen-shard actors) -- must still be bit-exact."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs", min_distributed_rows=0,
                    n_seen_shards=4)
    _assert_conformance(fix, ckpt, s, "bfs")


def test_dfs_exact(tmp_path):
    """DFS = LIFO width-1 rounds; exact order vs the oracle stack loop."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="dfs")
    _assert_conformance(fix, ckpt, s, "dfs")


@pytest.mark.slow
def test_bfs_small_corpus_mixed_paths(tmp_path):
    """SMALL corpus with default threshold: big rounds distributed, tail
    rounds on the driver -- the hybrid must stay exact end to end."""
    fix = fixture_corpus(gen_corpus.SMALL)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs", min_distributed_rows=64)
    _assert_conformance(fix, ckpt, s, "bfs")


def test_byte_identity_engine_output(tmp_path):
    """Engine-extracted text equals the corpus golden text column
    byte-for-byte per url (BASELINE.json:15)."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    _run_engine(fix, ckpt, mode="bfs", min_distributed_rows=0)
    items = read_ckpt(ckpt, "items")
    pages = pq.read_table(fix.pages_path, columns=["url", "text"])
    golden = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    checked = 0
    for url, text in zip(items["url"].to_pylist(), items["text"].to_pylist()):
        assert text == golden[url], url
        checked += 1
    assert checked > 0


def test_resume_from_checkpoint(tmp_path):
    """Kill after 2 rounds; a fresh engine resumes from the Parquet
    checkpoints (frontier + seen shards) and finishes identically."""
    fix = fixture_corpus(gen_corpus.TINY)
    full_ckpt = str(tmp_path / "full")
    s_full = _run_engine(fix, full_ckpt, mode="bfs")

    part_ckpt = str(tmp_path / "part")
    _run_engine(fix, part_ckpt, mode="bfs", max_rounds=2)
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=part_ckpt,
                      robots_path=fix.robots_path, mode="bfs")
    eng = CrawlEngine(cfg)
    try:
        eng.run(resume=True)
    finally:
        eng.close()

    assert visited_tuples(read_ckpt(part_ckpt, "visited")) == \
        visited_tuples(read_ckpt(full_ckpt, "visited"))
    assert items_map(read_ckpt(part_ckpt, "items")) == \
        items_map(read_ckpt(full_ckpt, "items"))
    assert errors_set(read_ckpt(part_ckpt, "errors")) == \
        errors_set(read_ckpt(full_ckpt, "errors"))


def test_metrics_and_lineage_written(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    _run_engine(fix, ckpt, mode="bfs")
    assert os.path.isdir(os.path.join(ckpt, "metrics"))
    assert os.path.exists(os.path.join(ckpt, "rounds", "init.json"))
    mfiles = os.listdir(os.path.join(ckpt, "metrics"))
    assert len(mfiles) >= 1


def test_redirects_driver_path(tmp_path):
    """REDIR corpus: 1-/2-hop redirect chains resolve to the target's
    content, links join against the FINAL url, and the /loop pages
    exceed the hop cap into fetch errors -- bit-exact vs the oracle's
    independent redirect loop."""
    fix = fixture_corpus(gen_corpus.REDIR)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs")
    _assert_conformance(fix, ckpt, s, "bfs")
    errs = read_ckpt(ckpt, "errors")
    assert any("/loop/" in u for u in errs["url"].to_pylist())


def test_redirects_distributed_exact(tmp_path):
    """Same REDIR crawl forced through the distributed path (vectorized
    resolve_redirects_table instead of the driver's serial chain)."""
    fix = fixture_corpus(gen_corpus.REDIR)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs", min_distributed_rows=0,
                    n_seen_shards=4)
    _assert_conformance(fix, ckpt, s, "bfs")


@pytest.mark.slow
def test_redirects_join_fetch(tmp_path):
    """REDIR crawl through the all-large join-fetch path: redirect hops
    resolve via filtered parquet point reads (no broadcast corpus index
    ever built) and stay bit-exact vs the oracle."""
    fix = fixture_corpus(gen_corpus.REDIR)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs", fetch_strategy="join",
                    min_distributed_rows=0, join_num_partitions=4,
                    n_seen_shards=2)
    _assert_conformance(fix, ckpt, s, "bfs")
