"""Checkpoint integrity checker: clean checkpoints pass (both round
layouts, deep mode included); tampered sidecars / deleted files are
reported as problems."""

import glob
import json
import os

import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, CrawlEngine
from pomp_ray.fsck import verify_checkpoint
from pomp_ray.sources import gen_corpus
from tests.helpers import fixture_corpus


def _crawl(fix, ckpt, **kw):
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs",
                      n_seen_shards=4, **kw)
    eng = CrawlEngine(cfg)
    try:
        eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()


def test_fsck_clean_checkpoints(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    exact = str(tmp_path / "exact")
    _crawl(fix, exact, min_distributed_rows=0)
    rep = verify_checkpoint(exact, deep=True)
    assert rep["ok"], rep["problems"]
    assert rep["rounds"] > 1

    scale = str(tmp_path / "scale")
    _crawl(fix, scale, exact_order=False, min_distributed_rows=0)
    rep = verify_checkpoint(scale, deep=True)
    assert rep["ok"], rep["problems"]


def test_fsck_detects_tampering(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    _crawl(fix, ckpt, min_distributed_rows=0)

    # 1. stale sidecar: n off by one
    side = sorted(glob.glob(os.path.join(
        ckpt, "frontier", "round-*", "*.stats.json")))[-1]
    with open(side) as f:
        st = json.load(f)
    st["n"] += 1
    with open(side, "w") as f:
        json.dump(st, f)
    rep = verify_checkpoint(ckpt)
    assert not rep["ok"]
    assert any("sidecar mismatch" in p for p in rep["problems"])
    st["n"] -= 1
    with open(side, "w") as f:
        json.dump(st, f)
    assert verify_checkpoint(ckpt)["ok"]

    # 2. missing metrics lineage
    mp = sorted(glob.glob(os.path.join(ckpt, "metrics", "*.parquet")))[-1]
    os.rename(mp, mp + ".bak")
    rep = verify_checkpoint(ckpt)
    assert any("metrics lineage" in p for p in rep["problems"])
    os.rename(mp + ".bak", mp)

    # 3. missing seen-shard snapshot round
    sp = sorted(glob.glob(os.path.join(
        ckpt, "seen", "seen-shard0000-*.parquet")))[-1]
    os.rename(sp, sp + ".bak")
    rep = verify_checkpoint(ckpt)
    assert any("seen shard 0" in p for p in rep["problems"])
    os.rename(sp + ".bak", sp)
    assert verify_checkpoint(ckpt, deep=True)["ok"]
