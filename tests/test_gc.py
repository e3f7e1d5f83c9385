"""gc_checkpoint: collect consumed frontier/deferred inputs and compact
seen/digests deltas, then prove resume + fsck still work bit-for-bit."""

import glob
import os

import pyarrow.parquet as pq


def _crawl_cfg(fix, ckpt, **kw):
    from pomp_ray.crawl import CrawlConfig
    return CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                       robots_path=fix.robots_path, mode="bfs",
                       min_distributed_rows=16, n_seen_shards=2, **kw)


def test_gc_then_resume_matches_uninterrupted(ray_session, tmp_path):
    from pomp_ray import crawl as crawl_mod
    from pomp_ray.crawl import CrawlEngine
    from pomp_ray.fsck import gc_checkpoint, verify_checkpoint
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_gc_corpus", gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()

    def run(ckpt, *, resume=False, **kw):
        eng = CrawlEngine(_crawl_cfg(fix, ckpt, **kw))
        try:
            return eng.run(seeds=None if resume else seeds, resume=resume)
        finally:
            eng.close()

    s_full = run(str(tmp_path / "full"))
    full_visited = crawl_mod.read_visited(str(tmp_path / "full"))

    part = str(tmp_path / "part")
    run(part, max_rounds=3)
    n_frontier_dirs = len(glob.glob(os.path.join(part, "frontier",
                                                 "round-*")))
    n_seen_files = len(glob.glob(os.path.join(part, "seen", "*.parquet")))
    assert n_frontier_dirs >= 4 and n_seen_files > 2

    rep = gc_checkpoint(part)
    assert rep["last"] == 2
    assert rep["n_dirs_removed"] > 0 and rep["n_bytes_freed"] > 0
    # consumed inputs gone; the resume round's inputs kept
    left = sorted(glob.glob(os.path.join(part, "frontier", "round-*")))
    assert [os.path.basename(d) for d in left] == ["round-000003"]
    # seen deltas compacted to one file per shard at the last round slot
    seen_files = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(part, "seen", "*.parquet")))
    assert seen_files == ["seen-shard0000-round000003.parquet",
                          "seen-shard0001-round000003.parquet"]

    chk = verify_checkpoint(part)
    assert chk["ok"], chk["problems"]

    # gc is idempotent
    rep2 = gc_checkpoint(part)
    assert rep2["n_dirs_removed"] == 0 and rep2["n_files_compacted"] == 0

    s2 = run(part, resume=True)
    after = crawl_mod.read_visited(part)
    assert sorted(after["url"].to_pylist()) \
        == sorted(full_visited["url"].to_pylist())
    assert s2.n_seen == s_full.n_seen
    chk2 = verify_checkpoint(part)
    assert chk2["ok"], chk2["problems"]


def test_gc_compacts_content_digest_deltas(ray_session, tmp_path):
    from pomp_ray.crawl import CrawlEngine
    from pomp_ray.fsck import gc_checkpoint
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_gc_corpus", gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    part = str(tmp_path / "dd")
    eng = CrawlEngine(_crawl_cfg(fix, part, max_rounds=3,
                                 dedup_content=True))
    try:
        eng.run(seeds=seeds)
    finally:
        eng.close()
    before = set()
    for p in glob.glob(os.path.join(part, "digests", "*.parquet")):
        before |= set(pq.read_table(p, columns=["digest"])
                      ["digest"].to_pylist())
    assert before
    gc_checkpoint(part)
    files = sorted(glob.glob(os.path.join(part, "digests", "*.parquet")))
    assert len(files) == 2  # one per shard
    after = set()
    for p in files:
        after |= set(pq.read_table(p, columns=["digest"])
                     ["digest"].to_pylist())
    assert after == before
