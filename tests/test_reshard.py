"""reshard_checkpoint: rewrite seen/digest shard snapshots for a new
n_seen_shards, then prove restore-equivalence and resume-equivalence."""

import glob
import os

import pyarrow.parquet as pq


def _crawl_cfg(fix, ckpt, n_shards=2, **kw):
    from pomp_ray.crawl import CrawlConfig
    return CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                       robots_path=fix.robots_path, mode="bfs",
                       min_distributed_rows=16, n_seen_shards=n_shards,
                       **kw)


def _all_digests(ckpt, state="seen"):
    out = set()
    for p in glob.glob(os.path.join(ckpt, state, "seen-shard*.parquet")):
        out.update(pq.read_table(p, columns=["digest"])["digest"]
                   .to_pylist())
    return out


def test_reshard_preserves_membership_and_routing(ray_session, tmp_path):
    from pomp_ray.crawl import CrawlEngine
    from pomp_ray.fsck import reshard_checkpoint
    from pomp_ray.sources import gen_corpus
    from pomp_ray.state.seen import SeenSet, shard_of

    fix = gen_corpus.generate("/tmp/pomp_reshard_corpus", gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    ckpt = str(tmp_path / "c")
    eng = CrawlEngine(_crawl_cfg(fix, ckpt, n_shards=2))
    try:
        eng.run(seeds=seeds)
    finally:
        eng.close()

    before = _all_digests(ckpt)
    assert before

    rep = reshard_checkpoint(ckpt, 5)
    assert rep["n_shards_out"] == 5
    assert rep["n_digests"] >= len(before)

    # membership identical; every file's digests route to its own shard
    assert _all_digests(ckpt) == before
    for p in glob.glob(os.path.join(ckpt, "seen", "seen-shard*.parquet")):
        shard = int(os.path.basename(p).split("shard")[1].split("-")[0])
        assert shard < 5
        for d in pq.read_table(p)["digest"].to_pylist():
            assert shard_of(d, 5) == shard

    # a NEW-count SeenSet restores the full membership: every digest
    # routes to a shard that answers check_and_add with "already seen"
    seen = SeenSet(5)
    try:
        rounds = sorted(glob.glob(os.path.join(ckpt, "rounds",
                                               "round-*.json")))
        last = int(os.path.basename(rounds[-1]).split("-")[1]
                   .split(".")[0])
        n_restored = seen.restore(os.path.join(ckpt, "seen"), last + 1)
        assert n_restored == len(before)
        from pomp_ray import crawl as crawl_mod
        urls = crawl_mod.read_visited(ckpt).column("url").to_pylist()
        fresh = seen.check_and_add(urls)
        assert not any(fresh)   # all already-seen after reshard+restore
    finally:
        seen.kill()


def test_reshard_then_resume_matches_uninterrupted(ray_session, tmp_path):
    from pomp_ray import crawl as crawl_mod
    from pomp_ray.crawl import CrawlEngine
    from pomp_ray.fsck import reshard_checkpoint, verify_checkpoint
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_reshard_corpus", gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()

    full = str(tmp_path / "full")
    eng = CrawlEngine(_crawl_cfg(fix, full, n_shards=2))
    try:
        eng.run(seeds=seeds)
    finally:
        eng.close()
    want = crawl_mod.read_visited(full)

    part = str(tmp_path / "part")
    eng = CrawlEngine(_crawl_cfg(fix, part, n_shards=2, max_rounds=3))
    try:
        eng.run(seeds=seeds)
    finally:
        eng.close()

    reshard_checkpoint(part, 3)

    eng = CrawlEngine(_crawl_cfg(fix, part, n_shards=3))
    try:
        eng.run(resume=True)
    finally:
        eng.close()

    got = crawl_mod.read_visited(part)
    assert got.column("url").to_pylist() == want.column("url").to_pylist()
    chk = verify_checkpoint(part)
    assert chk["ok"], chk["problems"]
