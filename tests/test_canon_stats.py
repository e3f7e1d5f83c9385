"""Canonicalize fast-path coverage metric (VERDICT r3 item 5): the
per-row Python fallback leaves per-batch sidecars; the crawl driver
sums them into round JSONs as ``n_canon_slow``; generated corpora must
read 0 (the fast path covers them entirely)."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from pomp_ray.stages.enqueue import canonicalize_batch


def test_fast_batch_writes_no_sidecar(tmp_path):
    d = str(tmp_path / "cs")
    t = pa.table({"url": pa.array([
        "http://site0.test/p/0", "http://site1.test/a/b.html"])})
    out = canonicalize_batch(t, stats_dir=d)
    assert out["canon_url"].to_pylist() == t["url"].to_pylist()
    assert not os.path.isdir(d)   # nothing written on the fast path


def test_slow_batch_records_fallback_count(tmp_path):
    d = str(tmp_path / "cs")
    t = pa.table({
        "url": pa.array(["HTTP://Site0.test/p/0",     # uppercase -> slow
                         "http://site0.test/p/1?q=2",  # query -> slow
                         "http://site1.test/ok"]),     # fast
        "base": pa.array([None, None, None], pa.string()),
    })
    out = canonicalize_batch(t, stats_dir=d)
    # fallback still canonicalizes correctly (queries are KEPT by the
    # canonical form; the fast path merely refuses to vectorize them)
    assert out["canon_url"].to_pylist()[0] == "http://site0.test/p/0"
    assert out["canon_url"].to_pylist()[1] == "http://site0.test/p/1?q=2"
    files = glob.glob(os.path.join(d, "canon-*.json"))
    assert len(files) == 1
    st = json.load(open(files[0]))
    assert st == {"n": 3, "n_slow": 2}
    # retry idempotency: same batch -> same sidecar name, still 1 file
    canonicalize_batch(t, stats_dir=d)
    assert len(glob.glob(os.path.join(d, "canon-*.json"))) == 1


def test_crawl_round_jsons_report_zero_slow(ray_session, tmp_path):
    from pomp_ray.crawl import CrawlConfig, CrawlEngine
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_fixtures/"
                              + gen_corpus.TINY.key(), gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs",
                      min_distributed_rows=0, n_seen_shards=2)
    eng = CrawlEngine(cfg)
    try:
        eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()
    rounds = sorted(glob.glob(os.path.join(ckpt, "rounds",
                                           "round-*.json")))
    assert rounds
    seen_metric = 0
    for p in rounds:
        info = json.load(open(p))
        if "n_canon_slow" in info:
            seen_metric += 1
            assert info["n_canon_slow"] == 0, p
    assert seen_metric > 0   # distributed rounds carry the metric
