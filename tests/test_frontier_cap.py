"""Bounded-frontier admission (``CrawlConfig.max_frontier_rows``): at
each round barrier, only the best cap pending rows survive -- (priority
desc, seq asc), the "best"-mode total order -- and the overflow drops
as stage="frontier_cap" errors.  Spec lives in the serial oracle;
driver and distributed-exact paths must match it bit-for-bit, scale
mode keeps the bound + accounting (hash seqs make the survivor SET
legitimately oracle-divergent, the content-dedup caveat family)."""

import glob
import json
import os

import pyarrow.parquet as pq

from pomp_ray.crawl import read_errors
from pomp_ray.sources import gen_corpus
from tests.helpers import fixture_corpus, run_oracle
from tests.test_simple_crawler import _assert_conformance, _run_engine

CAP = 8


def test_frontier_cap_driver_path(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs", max_frontier_rows=CAP)
    _assert_conformance(fix, ckpt, s, "bfs", max_frontier_rows=CAP)
    # the cap must actually bind on this fixture
    uncapped = run_oracle(fix, mode="bfs")
    assert s.n_visited < len(uncapped.visited)
    errs = read_errors(ckpt)
    assert "frontier_cap" in set(errs["stage"].to_pylist())


def test_frontier_cap_distributed_exact(tmp_path):
    """Every round through the distributed path: the Dataset sort +
    split cut must keep exactly the oracle's survivor set (oracle-parity
    seqs), fold deferred side files in, and stay bit-exact end to end."""
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs", max_frontier_rows=CAP,
                    min_distributed_rows=0, n_seen_shards=4)
    _assert_conformance(fix, ckpt, s, "bfs", max_frontier_rows=CAP)


def test_frontier_cap_scale_mode_bound_and_accounting(tmp_path):
    """Scale mode: every committed round's pending frontier (on-disk,
    blocked rows excluded) is <= cap, drops are accounted in
    n_frontier_capped/n_errors, and the crawl terminates."""
    fix = fixture_corpus(gen_corpus.SMALL)
    ckpt = str(tmp_path / "ckpt")
    s = _run_engine(fix, ckpt, mode="bfs", max_frontier_rows=64,
                    exact_order=False, min_distributed_rows=0,
                    n_seen_shards=2)
    assert s.rounds > 0 and s.n_visited > 0
    capped_rounds = 0
    for p in sorted(glob.glob(os.path.join(ckpt, "rounds",
                                           "round-*.json"))):
        with open(p) as f:
            info = json.load(f)
        assert info["n_frontier_next"] <= 64, info["round"]
        if info.get("n_frontier_capped"):
            capped_rounds += 1
            # on-disk pending must agree with the committed count
            nxt = os.path.join(ckpt, "frontier",
                               f"round-{info['round'] + 1:06d}")
            pend = 0
            for fp in glob.glob(os.path.join(nxt, "*.parquet")):
                t = pq.read_table(fp, columns=["blocked"])
                pend += t.num_rows - sum(t["blocked"].to_pylist())
            assert pend == info["n_frontier_next"], info["round"]
    assert capped_rounds >= 1
    errs = read_errors(ckpt)
    assert "frontier_cap" in set(errs["stage"].to_pylist())
