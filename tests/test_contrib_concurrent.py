"""Port of pomp's tests/test_contrib_concurrent (SURVEY.md section 5):
the concurrent/scale path must produce the same visited SET and identical
per-url items, with ordering relaxed -- exactly the relaxation pomp's own
concurrent-downloader tests accept."""

import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, CrawlEngine
from pomp_ray.sources import gen_corpus
from tests.helpers import (
    errors_set,
    fixture_corpus,
    items_map,
    oracle_errors_set,
    oracle_items_map,
    read_ckpt,
    run_oracle,
)


def test_scale_mode_set_conformance(tmp_path):
    """exact_order=False + salted politeness + local dedup + hash seq:
    same reachable set, same items, same errors."""
    fix = fixture_corpus(gen_corpus.SMALL)
    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(
        corpus_path=fix.pages_path, ckpt_dir=ckpt,
        robots_path=fix.robots_path, mode="bfs",
        exact_order=False, min_distributed_rows=0, n_salts=4,
        n_seen_shards=4,
    )
    eng = CrawlEngine(cfg)
    try:
        summary = eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()

    res = run_oracle(fix, mode="bfs")
    vis = read_ckpt(ckpt, "visited")
    assert set(vis["url"].to_pylist()) == {v["url"] for v in res.visited}
    assert items_map(read_ckpt(ckpt, "items")) == oracle_items_map(res)
    assert errors_set(read_ckpt(ckpt, "errors")) == oracle_errors_set(res)
    assert summary.n_seen == len(res.seen)
