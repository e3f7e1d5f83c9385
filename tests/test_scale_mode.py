"""Scale-mode specifics: binding politeness caps with deferred side
files, salted grouping, resume on the scale layout, and seen-shard
snapshot/restore."""

import pytest
import collections
import glob

import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, CrawlEngine, read_errors, read_items
from pomp_ray.sources import gen_corpus
from pomp_ray.state.seen import SeenSet
from tests.helpers import fixture_corpus


def _scale_cfg(fix, ckpt, **kw):
    base = dict(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                robots_path=fix.robots_path, mode="bfs", exact_order=False,
                n_salts=4, min_distributed_rows=64, n_seen_shards=4)
    base.update(kw)
    return CrawlConfig(**base)


def test_politeness_caps_and_deferral(tmp_path):
    """Budget 20s -> cap 20/round on delayed hosts; engine defers the
    overflow via side files and never exceeds the cap in any round."""
    fix = fixture_corpus(gen_corpus.SMALL)
    ckpt = str(tmp_path / "c")
    cfg = _scale_cfg(fix, ckpt, round_budget_s=20.0, max_rounds=20)
    eng = CrawlEngine(cfg)
    try:
        s = eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()
    assert any(r["n_deferred"] > 0 for r in s.per_round)
    assert glob.glob(f"{ckpt}/deferred/round-*/*.parquet")

    items = read_items(ckpt)
    per = collections.Counter()
    for u, r in zip(items["url"].to_pylist(), items["round"].to_pylist()):
        per[(u.split("/")[2], r)] += 1
    for (host, rnd), n in per.items():
        h = int(host.replace("site", "").replace(".test", ""))
        if h % 7 == 0:
            assert n <= 20, (host, rnd, n)


def test_scale_resume_with_deferral(tmp_path):
    fix = fixture_corpus(gen_corpus.SMALL)
    full, part = str(tmp_path / "f"), str(tmp_path / "p")
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    for ck, rounds in ((full, 40), (part, 5)):
        eng = CrawlEngine(_scale_cfg(fix, ck, round_budget_s=20.0,
                                     max_rounds=rounds))
        try:
            eng.run(seeds=seeds)
        finally:
            eng.close()
    eng = CrawlEngine(_scale_cfg(fix, part, round_budget_s=20.0,
                                 max_rounds=40))
    try:
        eng.run(resume=True)
    finally:
        eng.close()
    assert sorted(read_items(full)["url"].to_pylist()) == \
        sorted(read_items(part)["url"].to_pylist())


def test_scale_errors_assembled(tmp_path):
    fix = fixture_corpus(gen_corpus.SMALL)
    ckpt = str(tmp_path / "c")
    eng = CrawlEngine(_scale_cfg(fix, ckpt))
    try:
        eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()
    errs = read_errors(ckpt)
    stages = collections.Counter(errs["stage"].to_pylist())
    assert stages["fetch"] > 0      # dead links in the fixture
    assert stages["robots"] > 0     # /p/7 subtrees on every 5th host


def test_seen_snapshot_restore(tmp_path):
    seen = SeenSet(3)
    urls1 = [f"http://a.test/{i}" for i in range(500)]
    urls2 = [f"http://b.test/{i}" for i in range(300)]
    assert sum(seen.check_and_add(urls1)) == 500
    seen.snapshot(str(tmp_path), 1)
    assert sum(seen.check_and_add(urls2)) == 300
    seen.snapshot(str(tmp_path), 2)
    assert sum(seen.check_and_add(urls1)) == 0   # all dupes

    fresh = SeenSet(3)
    fresh.restore(str(tmp_path), 1)              # only snapshot 1
    assert fresh.size() == 500
    assert sum(fresh.check_and_add(urls2)) == 300   # not yet seen at rnd 1
    fresh.kill()

    fresh2 = SeenSet(3)
    fresh2.restore(str(tmp_path), 2)
    assert fresh2.size() == 800
    assert sum(fresh2.check_and_add(urls1 + urls2)) == 0
    fresh2.reset()
    assert fresh2.size() == 0
    fresh2.kill()
    seen.kill()


def _tiny_one_host_corpus(tmp_path, n_pages=40, crawl_delay=10.0):
    """40 leaf pages on one delayed host: with round_budget_s=10 the cap
    is 1/round -- the round-1 ADVICE starvation scenario (fixed salts with
    sub-cap 0 deferred forever, then a 0-selected round crashed exec B)."""
    import pyarrow as pa
    host = "slow.test"
    urls = [f"http://{host}/p/{i}" for i in range(n_pages)]
    htmls = [f"<html><title>t{i}</title><p>body {i}</p></html>".encode()
             for i in range(n_pages)]
    pages = pa.table({
        "url": urls,
        "warc_ts": pa.array([0] * n_pages, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": [f"t{i}\nbody {i}" for i in range(n_pages)],
        "lang": ["en"] * n_pages,
    })
    pages_path = str(tmp_path / "pages.parquet")
    robots_path = str(tmp_path / "robots.parquet")
    pq.write_table(pages, pages_path)
    pq.write_table(pa.table({
        "host": [host],
        "disallow_prefixes": pa.array([[]], pa.list_(pa.string())),
        "crawl_delay": [crawl_delay],
    }), robots_path)
    return pages_path, robots_path, urls


@pytest.mark.slow
def test_salted_cap_below_salts_no_starvation(tmp_path):
    """cap(1) < n_salts(4): every page must still be visited (clamped
    effective salts + rotating remainder), the per-round cap must hold,
    and no round may crash on an empty exec-A output."""
    pages_path, robots_path, urls = _tiny_one_host_corpus(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(corpus_path=pages_path, ckpt_dir=ckpt,
                      robots_path=robots_path, mode="bfs", exact_order=False,
                      n_salts=4, n_seen_shards=2, min_distributed_rows=0,
                      round_budget_s=10.0, max_rounds=60)
    eng = CrawlEngine(cfg)
    try:
        s = eng.run(seeds=[{"url": u, "depth": 0, "priority": 0}
                           for u in urls])
    finally:
        eng.close()
    items = read_items(ckpt)
    assert sorted(items["url"].to_pylist()) == sorted(urls)
    per_round = collections.Counter(items["round"].to_pylist())
    assert all(n <= 1 for n in per_round.values())   # cap respected
    assert s.n_visited == len(urls)


def test_derive_salt_counts_unit():
    """Salt counts derive from observed host frequency (north_rule skew
    handling): heavy hosts split up to the max, light hosts stay single,
    capped hosts never exceed their cap (starvation guard); the md5 salt
    assignment spreads a heavy host's urls evenly."""
    import hashlib

    from pomp_ray.stages.politeness import derive_salt_counts

    freq = {"heavy.test": 500_000, "light.test": 100, "capped.test": 50_000}
    caps = {"capped.test": 2, "light.test": 5}
    sc = derive_salt_counts(freq, caps, n_salts_max=8, target_rows=4096)
    assert sc["heavy.test"] == 8
    assert "light.test" not in sc          # default 1, no fragmentation
    assert sc["capped.test"] == 2          # clamped to cap
    counts = [0] * 8
    for i in range(20_000):
        u = f"http://heavy.test/p/{i}".encode()
        counts[int.from_bytes(hashlib.md5(u).digest()[:4], "little") % 8] += 1
    assert max(counts) < 20_000 / 8 * 1.15


def test_skewed_host_salted_politeness(tmp_path):
    """One host holds ~89% of the frontier: scale mode must split it into
    multiple (host, salt) politeness groups (observed-frequency salting),
    keep every per-round cap, and still visit every page."""
    import pyarrow as pa

    heavy, light = "heavy.test", "light.test"
    urls = [f"http://{heavy}/p/{i}" for i in range(512)] + \
           [f"http://{light}/p/{i}" for i in range(64)]
    n = len(urls)
    pages = pa.table({
        "url": urls,
        "warc_ts": pa.array([0] * n, pa.timestamp("us")),
        "html": [f"<html><title>t{i}</title></html>".encode()
                 for i in range(n)],
        "text": [f"t{i}" for i in range(n)],
        "lang": ["en"] * n,
    })
    pages_path = str(tmp_path / "pages.parquet")
    robots_path = str(tmp_path / "robots.parquet")
    pq.write_table(pages, pages_path)
    pq.write_table(pa.table({
        "host": [heavy],
        "disallow_prefixes": pa.array([[]], pa.list_(pa.string())),
        "crawl_delay": [0.1],
    }), robots_path)

    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(corpus_path=pages_path, ckpt_dir=ckpt,
                      robots_path=robots_path, mode="bfs", exact_order=False,
                      n_salts=4, politeness_group_rows=64, n_seen_shards=2,
                      min_distributed_rows=0, round_budget_s=10.0,  # cap=100
                      max_rounds=20)
    eng = CrawlEngine(cfg)
    try:
        s = eng.run(seeds=[{"url": u, "depth": 0, "priority": 0}
                           for u in urls])
    finally:
        eng.close()
    items = read_items(ckpt)
    assert sorted(items["url"].to_pylist()) == sorted(urls)
    per_round = collections.Counter(
        (r, u.split("/")[2]) for u, r in zip(items["url"].to_pylist(),
                                             items["round"].to_pylist()))
    for (rnd, host), cnt in per_round.items():
        if host == heavy:
            assert cnt <= 100, (rnd, cnt)
    # the heavy host's overflow was split across multiple salts
    salts = {f.rsplit("-s", 1)[1].split(".")[0]
             for f in glob.glob(f"{ckpt}/deferred/round-*/*.parquet")}
    assert len(salts) >= 2, salts


def test_resume_wipes_partial_round(tmp_path):
    """Crash recovery: a crashed (uncommitted) round leaves partial
    items/frontier files; resume must wipe and re-run it, ending with
    exactly a clean full run's outputs."""
    fix = fixture_corpus(gen_corpus.SMALL)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    full, part = str(tmp_path / "f"), str(tmp_path / "p")
    eng = CrawlEngine(_scale_cfg(fix, full, round_budget_s=20.0))
    try:
        eng.run(seeds=seeds)
    finally:
        eng.close()
    eng = CrawlEngine(_scale_cfg(fix, part, round_budget_s=20.0))
    try:
        eng.run(seeds=seeds, resume=False)
    finally:
        eng.close()
    # simulate a crash mid-round-3: drop the commit markers for rounds >= 3
    # and plant garbage partial outputs for round 3
    import os
    import pyarrow as pa
    for p in glob.glob(f"{part}/rounds/round-*.json"):
        if int(os.path.basename(p)[6:12]) >= 3:
            os.remove(p)
    os.makedirs(f"{part}/items/round-000003", exist_ok=True)
    pq.write_table(pa.table({"garbage": [1, 2, 3]}),
                   f"{part}/items/round-000003/partial.parquet")
    eng = CrawlEngine(_scale_cfg(fix, part, round_budget_s=20.0))
    try:
        eng.run(resume=True)
    finally:
        eng.close()
    a, b = read_items(full), read_items(part)
    assert sorted(a["url"].to_pylist()) == sorted(b["url"].to_pylist())
    assert sorted(read_errors(full)["url"].to_pylist()) == \
        sorted(read_errors(part)["url"].to_pylist())


def test_frontier_stats_sidecars_and_streaming_reader(tmp_path):
    """Every scale-mode frontier/deferred parquet part gets a .stats.json
    sidecar whose totals equal the real column data (the driver's
    per-round frontier pass is metadata-only), and the streaming
    items_dataset reader yields exactly read_items' rows."""
    import json
    import os

    import pyarrow.compute as pc

    from pomp_ray.crawl import items_dataset

    fix = fixture_corpus(gen_corpus.SMALL)
    ckpt = str(tmp_path / "c")
    cfg = _scale_cfg(fix, ckpt, round_budget_s=20.0, min_distributed_rows=0)
    eng = CrawlEngine(cfg)
    try:
        eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()

    parts = (glob.glob(f"{ckpt}/frontier/round-*/*.parquet")
             + glob.glob(f"{ckpt}/deferred/round-*/*.parquet"))
    assert parts
    for p in parts:
        sc = p[:-len(".parquet")] + ".stats.json"
        assert os.path.exists(sc), f"missing sidecar for {p}"
        with open(sc) as f:
            st = json.load(f)
        t = pq.read_table(p, columns=["blocked", "host"])
        nb = int(pc.sum(t["blocked"]).as_py() or 0)
        assert st["n"] == t.num_rows and st["n_blocked"] == nb, p
        assert sum(st["hosts"].values()) == t.num_rows - nb, p

    tbl = read_items(ckpt)
    ds_rows = sorted(items_dataset(ckpt).to_pandas()["url"])
    assert ds_rows == sorted(tbl["url"].to_pylist())


def test_distributed_seed_from_parquet_path(tmp_path):
    """Scale-mode seeding from a parquet PATH (the 10^10-seed shape: no
    driver loop) admits the same visited set and robots-blocked seed
    errors as the serial seed path."""
    from pomp_ray.core.oracle import crawl_oracle
    from tests.helpers import oracle_inputs

    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "c")
    cfg = _scale_cfg(fix, ckpt, min_distributed_rows=0, n_salts=1)
    eng = CrawlEngine(cfg)
    try:
        eng.run(seeds=fix.seeds_path)   # str -> _seed_distributed
    finally:
        eng.close()
    corpus, seeds, robots, _ = oracle_inputs(fix)
    res = crawl_oracle(corpus, seeds, robots, mode="bfs")
    assert set(read_items(ckpt)["url"].to_pylist()) == \
        {v["url"] for v in res.visited}
    errs = read_errors(ckpt)
    mine = {(u, s) for u, s in zip(errs["url"].to_pylist(),
                                   errs["stage"].to_pylist())}
    oracle = {(e["url"], e["stage"]) for e in res.errors}
    assert mine == oracle


def test_items_sidecar_accounting_matches_files(tmp_path):
    """The fused round's driver accounting is sidecar-driven (no counts
    execution): every committed round's (n_selected, n_visited,
    n_text_bytes) must equal a full read-back of the items parquet --
    the invariant that keeps the one-execution design honest."""
    import json
    import os

    import pyarrow.compute as pc

    fix = fixture_corpus(gen_corpus.SMALL)
    ckpt = str(tmp_path / "c")
    cfg = _scale_cfg(fix, ckpt, max_rounds=12)
    eng = CrawlEngine(cfg)
    s = eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    eng.close()
    checked = 0
    for p in sorted(glob.glob(os.path.join(ckpt, "rounds",
                                           "round-*.json"))):
        with open(p) as f:
            info = json.load(f)
        if info.get("path") != "scale":
            continue
        rd_dir = os.path.join(ckpt, "items",
                              f"round-{info['round']:06d}")
        files = glob.glob(os.path.join(rd_dir, "*.parquet"))
        n_sel = n_vis = n_bytes = 0
        for fp in files:
            t = pq.read_table(fp, columns=["fetch_ok", "text"])
            n_sel += t.num_rows
            n_vis += int(pc.sum(t["fetch_ok"]).as_py() or 0)
            n_bytes += int(pc.sum(pc.binary_length(
                t.filter(t["fetch_ok"])["text"])).as_py() or 0)
            # every part carries its sidecar
            assert os.path.exists(fp[:-len(".parquet")] + ".stats.json")
        assert info["n_selected"] == n_sel, info["round"]
        assert info["n_visited"] == n_vis, info["round"]
        assert info["n_text_bytes"] == n_bytes, info["round"]
        checked += 1
    assert checked >= 2    # the crawl really exercised scale rounds
    assert s.n_visited > 0
