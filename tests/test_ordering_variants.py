"""Priority ordering, wide DFS, best-first mode, and the join fetch path."""


import pytest
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from pomp_ray.crawl import CrawlConfig, read_items, run_crawl
from pomp_ray.sources import gen_corpus
from pomp_ray.stages.enqueue import HashPriority
from pomp_ray.stages.fetch import CorpusIndex, fetch_via_join
from tests.helpers import (
    fixture_corpus,
    oracle_visited_tuples,
    read_ckpt,
    run_oracle,
    visited_tuples,
)


def test_priority_ordering(tmp_path):
    """Higher-priority seeds are fetched first within a round (pomp's
    priority queue discipline); engine matches the oracle exactly."""
    fix = fixture_corpus(gen_corpus.TINY)
    seeds = [
        {"url": "http://site0.test/p/0", "priority": 0, "depth": 0},
        {"url": "http://site1.test/p/0", "priority": 5, "depth": 0},
    ]
    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs")
    run_crawl(cfg, seeds=seeds)
    corpus_res = run_oracle(fix, mode="bfs")  # builds inputs; rerun w/ seeds
    from tests.helpers import oracle_inputs
    corpus, _, robots, _ = oracle_inputs(fix)
    from pomp_ray.core.oracle import crawl_oracle
    res = crawl_oracle(corpus, seeds, robots, mode="bfs")
    assert visited_tuples(read_ckpt(ckpt, "visited")) == oracle_visited_tuples(res)
    # round 0 must fetch the priority-5 seed first
    first = min(res.visited, key=lambda v: (v["round"], 0 if v["url"].startswith("http://site1") else 1, v["seq"]))
    r0 = [v for v in res.visited if v["round"] == 0]
    assert r0[0]["url"] == "http://site1.test/p/0"


def test_dfs_wide(tmp_path):
    """DFS with width 4: same reachable set as serial DFS (ordering
    relaxed, like pomp's concurrent tests)."""
    fix = fixture_corpus(gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="dfs", dfs_width=4)
    run_crawl(cfg, seeds=seeds)
    res = run_oracle(fix, mode="dfs", dfs_width=4)
    engine_urls = set(read_items(ckpt)["url"].to_pylist())
    assert engine_urls == {v["url"] for v in res.visited}
    # and equal to the width-1 serial DFS set too (set order-invariance)
    res1 = run_oracle(fix, mode="dfs")
    assert engine_urls == {v["url"] for v in res1.visited}


def test_fetch_via_join(tmp_path):
    """The all-large fetch path (hash-partitioned Dataset.join) returns
    the same html per url as the broadcast-index path; misses keep
    fetch_ok=False."""
    fix = fixture_corpus(gen_corpus.TINY)
    index = CorpusIndex.build(fix.pages_path)
    urls = pq.read_table(fix.pages_path, columns=["url"])["url"].to_pylist()[:40]
    urls_miss = urls + ["http://site0.test/p/999999"]
    frontier = rd.from_arrow(pa.table({
        "canon_url": pa.array(urls_miss),
        "depth": pa.array([0] * len(urls_miss), pa.int32()),
    }))
    joined = fetch_via_join(frontier, fix.pages_path, num_partitions=4)
    rows = joined.take_all()
    got = {r["canon_url"]: (r["html"], r["fetch_ok"]) for r in rows}
    assert len(got) == len(urls_miss)
    assert got["http://site0.test/p/999999"] == (None, False)
    lookup = index.fetch_table(pa.table({"canon_url": pa.array(urls)}))
    want = dict(zip(lookup["canon_url"].to_pylist(), lookup["html"].to_pylist()))
    for u in urls:
        assert got[u][0] == want[u] and got[u][1]


@pytest.mark.slow
def test_dfs_distributed_exact(tmp_path):
    """Wide DFS through the DISTRIBUTED exact path (round-1 gap: every
    DFS round used to serialize onto the driver).  With dfs_width >=
    dfs_distributed_min_width and min_distributed_rows=0, rounds run the
    width-limited exact Dataset pipeline and must still match the serial
    oracle bit-for-bit (visited tuples incl. round+seq, items, errors)."""
    from pomp_ray.core.oracle import crawl_oracle
    from tests.helpers import (
        errors_set,
        items_map,
        oracle_errors_set,
        oracle_inputs,
        oracle_items_map,
    )

    fix = fixture_corpus(gen_corpus.SMALL)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="dfs", dfs_width=128,
                      min_distributed_rows=0, n_seen_shards=4)
    summary = run_crawl(cfg, seeds=seeds)
    assert any(r["path"] == "exact" for r in summary.per_round), \
        "distributed DFS path never exercised"
    res = crawl_oracle(corpus, seeds, robots, mode="dfs", dfs_width=128)
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)
    assert items_map(read_ckpt(ckpt, "items")) == oracle_items_map(res)
    assert errors_set(read_ckpt(ckpt, "errors")) == oracle_errors_set(res)
    assert summary.n_seen == len(res.seen)


@pytest.mark.slow
def test_crawl_with_join_and_actor_fetch(tmp_path):
    """The crawl's fetch stage through the all-large Dataset.join path and
    the actor-pool path (round-1 gap: join fetch was never the crawl's
    fetch stage in any test).  Exact BFS conformance must hold for both:
    the fetch shuffle reorders rows but seq-based ordering restores the
    oracle's exact visited tuples."""
    from tests.helpers import oracle_inputs

    fix = fixture_corpus(gen_corpus.TINY)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    res = run_oracle(fix, mode="bfs")
    for strategy in ("join", "actor"):
        ckpt = str(tmp_path / strategy)
        cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                          robots_path=fix.robots_path, mode="bfs",
                          fetch_strategy=strategy, min_distributed_rows=0,
                          join_num_partitions=4, fetch_concurrency=2,
                          n_seen_shards=2)
        run_crawl(cfg, seeds=seeds)
        assert visited_tuples(read_ckpt(ckpt, "visited")) == \
            oracle_visited_tuples(res), strategy


# library-shipped deterministic scorer: importable on Ray workers (a
# test-module function would not unpickle inside map_batches tasks)
md5_priority = HashPriority(n_buckets=7)


def test_best_first_exact_driver(tmp_path):
    """mode="best" (priority-queue discipline, north_rule "priority
    queue"): narrow width routes rounds through the serial driver path;
    visited order/items/errors must match the oracle's best-first walk
    bit-for-bit, with link priorities from the pluggable priority_fn."""
    from pomp_ray.core.oracle import crawl_oracle
    from tests.helpers import (
        errors_set,
        items_map,
        oracle_errors_set,
        oracle_inputs,
        oracle_items_map,
    )

    fix = fixture_corpus(gen_corpus.TINY)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="best", best_width=5,
                      priority_fn=md5_priority, n_seen_shards=2)
    summary = run_crawl(cfg, seeds=seeds)
    res = crawl_oracle(corpus, seeds, robots, mode="best", best_width=5,
                       priority_fn=md5_priority)
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)
    assert items_map(read_ckpt(ckpt, "items")) == oracle_items_map(res)
    assert errors_set(read_ckpt(ckpt, "errors")) == oracle_errors_set(res)
    assert summary.n_seen == len(res.seen)
    # the width actually bites: the crawl needs more rounds than BFS
    res_bfs = run_oracle(fix, mode="bfs")
    assert summary.rounds > res_bfs.rounds


@pytest.mark.slow
def test_best_first_distributed_exact(tmp_path):
    """Wide best-first through the DISTRIBUTED exact path (global
    (priority desc, seq asc) sort + width split): bit-exact vs the
    serial oracle, same proof shape as wide DFS."""
    from pomp_ray.core.oracle import crawl_oracle
    from tests.helpers import (
        errors_set,
        items_map,
        oracle_errors_set,
        oracle_inputs,
        oracle_items_map,
    )

    fix = fixture_corpus(gen_corpus.SMALL)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="best",
                      best_width=96, priority_fn=md5_priority,
                      min_distributed_rows=0, n_seen_shards=4)
    summary = run_crawl(cfg, seeds=seeds)
    assert any(r["path"] == "exact" for r in summary.per_round), \
        "distributed best-first path never exercised"
    res = crawl_oracle(corpus, seeds, robots, mode="best", best_width=96,
                       priority_fn=md5_priority)
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)
    assert items_map(read_ckpt(ckpt, "items")) == oracle_items_map(res)
    assert errors_set(read_ckpt(ckpt, "errors")) == oracle_errors_set(res)
    assert summary.n_seen == len(res.seen)


def test_best_scale_set_equality(tmp_path):
    """Approximate scale-mode best-first (exact_order=False): per-block
    priority cut + small global cut, no global frontier sort.  Contract:
    same visited SET as the oracle, every round selects <= best_width."""
    fix = fixture_corpus(gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="best",
                      best_width=16, priority_fn=md5_priority,
                      exact_order=False, min_distributed_rows=0,
                      dfs_distributed_min_width=16, n_seen_shards=2)
    s = run_crawl(cfg, seeds=seeds)
    res = run_oracle(fix, mode="best", best_width=16,
                     priority_fn=md5_priority)
    mine = set(read_items(ckpt)["url"].to_pylist())
    assert mine == {v["url"] for v in res.visited}
    assert all(r["n_selected"] <= 16 for r in s.per_round)
    assert any(r["n_deferred"] > 0 for r in s.per_round)


def test_crawl_with_cuckoo_seen_filter(tmp_path):
    """The cuckoo-filter-backed seen shards (seen_filter_kind="cuckoo",
    north_rule "bloom/cuckoo") must leave crawl semantics bit-identical:
    the filter is a RAM prefilter over the same exact digest set."""
    fix = fixture_corpus(gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs",
                      seen_filter_kind="cuckoo", n_seen_shards=2)
    s = run_crawl(cfg, seeds=seeds)
    res = run_oracle(fix, mode="bfs")
    assert visited_tuples(read_ckpt(ckpt, "visited")) == \
        oracle_visited_tuples(res)
    assert s.n_seen == len(res.seen)


def test_dfs_scale_set_equality(tmp_path):
    """Approximate scale-mode DFS (exact_order=False): the per-block LIFO
    width cut replaces the exact path's global frontier sort.  Contract:
    same visited SET as the serial oracle, every round selects at most
    dfs_width rows, and the crawl terminates."""
    fix = fixture_corpus(gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="dfs", dfs_width=16,
                      exact_order=False, min_distributed_rows=0,
                      dfs_distributed_min_width=16, n_seen_shards=2)
    s = run_crawl(cfg, seeds=seeds)
    res = run_oracle(fix, mode="dfs")
    mine = set(read_items(ckpt)["url"].to_pylist())
    assert mine == {v["url"] for v in res.visited}
    assert all(r["n_selected"] <= 16 for r in s.per_round)
    # the LIFO preference actually bites: some round defers width overflow
    assert any(r["n_deferred"] > 0 for r in s.per_round)


@pytest.mark.slow
def test_focused_crawl_distributed_exact(tmp_path):
    """Focused crawl = best-first with the HostPriority domain-whitelist
    scorer, through the DISTRIBUTED exact path: bit-exact vs the serial
    oracle, AND the whitelisted host is actually visited earlier on
    average than in plain BFS (the focus bites)."""
    from pomp_ray.core.oracle import crawl_oracle
    from pomp_ray.stages.enqueue import HostPriority
    from tests.helpers import oracle_inputs

    fix = fixture_corpus(gen_corpus.SMALL)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    pref = HostPriority({"site3.test", "site7.test"})
    hosts = {u.split("/")[2] for u in corpus}
    assert pref.preferred & hosts, f"whitelist missing from corpus: {hosts}"
    ckpt = str(tmp_path / "c")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="best",
                      best_width=96, priority_fn=pref,
                      min_distributed_rows=0, n_seen_shards=4)
    summary = run_crawl(cfg, seeds=seeds)
    assert any(r["path"] == "exact" for r in summary.per_round)
    res = crawl_oracle(corpus, seeds, robots, mode="best", best_width=96,
                       priority_fn=pref)
    got = visited_tuples(read_ckpt(ckpt, "visited"))
    assert got == oracle_visited_tuples(res)

    # focus check: mean visit rank of whitelisted-host pages is earlier
    # than under BFS
    def mean_rank(order):
        ranks = [i for i, u in enumerate(order)
                 if u.split("/")[2] in pref.preferred]
        return sum(ranks) / len(ranks)

    res_bfs = run_oracle(fix, mode="bfs")
    focused_order = [v["url"] for v in res.visited]
    bfs_order = [v["url"] for v in res_bfs.visited]
    assert mean_rank(focused_order) < mean_rank(bfs_order)


@pytest.mark.slow
def test_pagerank_priority_recrawl(tmp_path):
    """The continuous-crawl loop: BFS crawl -> host PageRank over its
    link graph -> PageRankPriority steers a best-first recrawl.  The
    recrawl is bit-exact vs the serial oracle under the same scorer,
    and top-ranked hosts' pages are visited earlier on average than
    under BFS (authority ordering bites)."""
    from pomp_ray.core.oracle import crawl_oracle
    from pomp_ray.pipelines.graph import host_pagerank_from_crawl
    from pomp_ray.stages.enqueue import PageRankPriority
    from tests.helpers import oracle_inputs

    fix = fixture_corpus(gen_corpus.SMALL)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    ckpt1 = str(tmp_path / "c1")
    cfg1 = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt1,
                       robots_path=fix.robots_path, mode="bfs",
                       min_distributed_rows=64)
    run_crawl(cfg1, seeds=seeds)
    ranks = host_pagerank_from_crawl(ckpt1, fix.pages_path)
    pr = PageRankPriority.from_rank_table(ranks, n_levels=4)
    assert set(pr.levels.values()) != {0}, "quantization must spread hosts"

    ckpt2 = str(tmp_path / "c2")
    cfg2 = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt2,
                       robots_path=fix.robots_path, mode="best",
                       best_width=96, priority_fn=pr,
                       min_distributed_rows=0, n_seen_shards=4)
    summary = run_crawl(cfg2, seeds=seeds)
    assert any(r["path"] == "exact" for r in summary.per_round)
    res = crawl_oracle(corpus, seeds, robots, mode="best", best_width=96,
                       priority_fn=pr)
    got = visited_tuples(read_ckpt(ckpt2, "visited"))
    assert got == oracle_visited_tuples(res)

    # authority check: pages on the top-level hosts come earlier than BFS
    top_hosts = {h for h, lv in pr.levels.items()
                 if lv == max(pr.levels.values())}

    def mean_rank(order):
        ranks_ = [i for i, u in enumerate(order)
                  if u.split("/")[2] in top_hosts]
        return sum(ranks_) / len(ranks_)

    res_bfs = run_oracle(fix, mode="bfs")
    assert mean_rank([v["url"] for v in res.visited]) < \
        mean_rank([v["url"] for v in res_bfs.visited])
