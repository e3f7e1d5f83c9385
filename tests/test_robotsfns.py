"""robots.txt parsing + corpus ingestion -> crawl honoring the rules."""

import pyarrow as pa
import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, read_errors, read_items, run_crawl
from pomp_ray.functions.robotsfns import (
    parse_robots_txt,
    robots_table_from_corpus,
    write_robots_table,
)

ROBOTS_A = b"""
# comment
User-agent: *
Disallow: /private/
Disallow: /tmp/
Crawl-delay: 2.5

User-agent: evilbot
Disallow: /
"""

ROBOTS_B = b"""
User-agent: pompbot
User-agent: otherbot
Disallow: /secret/
Crawl-delay: 7

User-agent: *
Disallow:
"""


def test_parse_robots_txt_groups():
    star = parse_robots_txt(ROBOTS_A)
    assert star == {"disallow_prefixes": ["/private/", "/tmp/"],
                    "allow_prefixes": [], "crawl_delay": 2.5,
                    "sitemaps": []}
    evil = parse_robots_txt(ROBOTS_A, user_agent="EvilBot")
    assert evil["disallow_prefixes"] == ["/"]
    # stacked User-agent lines share one record group; specific UA
    # overrides the (empty) * group entirely
    pomp = parse_robots_txt(ROBOTS_B, user_agent="pompbot")
    assert pomp == {"disallow_prefixes": ["/secret/"],
                    "allow_prefixes": [], "crawl_delay": 7.0,
                    "sitemaps": []}
    other = parse_robots_txt(ROBOTS_B, user_agent="otherbot")
    assert other["disallow_prefixes"] == ["/secret/"]
    default = parse_robots_txt(ROBOTS_B)
    assert default == {"disallow_prefixes": [], "allow_prefixes": [],
                       "crawl_delay": 0.0, "sitemaps": []}
    assert parse_robots_txt(b"") == {"disallow_prefixes": [],
                                     "allow_prefixes": [],
                                     "crawl_delay": 0.0,
                                     "sitemaps": []}


def _pages(tmp_path, rows):
    t = pa.table({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "html": pa.array([r[1] for r in rows], pa.binary()),
        "text": [""] * len(rows),
        "lang": ["en"] * len(rows),
    })
    p = str(tmp_path / "pages.parquet")
    pq.write_table(t, p)
    return p


def test_robots_from_corpus_gates_crawl(tmp_path):
    """End to end: robots.txt pages in the corpus -> parsed ROBOTS table
    -> crawl refuses the disallowed subtree and records robots errors."""
    page = (b"<html><title>p</title>"
            b'<p>x</p><a href="q">q</a>'
            b'href="http://a.test/private/1" href="http://a.test/ok/1"'
            b"</html>")
    pages_path = _pages(tmp_path, [
        ("http://a.test/robots.txt", ROBOTS_A),
        ("http://b.test/robots.txt", b"User-agent: *\nDisallow:\n"),
        ("http://a.test/", page),
        ("http://a.test/ok/1", b"<html><title>ok</title></html>"),
        ("http://a.test/private/1", b"<html><title>no</title></html>"),
    ])
    robots = robots_table_from_corpus(pages_path)
    assert sorted(robots["host"].to_pylist()) == ["a.test", "b.test"]
    by_host = {r["host"]: r for r in robots.to_pylist()}
    assert by_host["a.test"]["disallow_prefixes"] == ["/private/", "/tmp/"]
    assert by_host["a.test"]["crawl_delay"] == 2.5
    assert by_host["b.test"]["disallow_prefixes"] == []

    robots_path = str(tmp_path / "robots.parquet")
    assert write_robots_table(pages_path, robots_path) == 2

    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(corpus_path=pages_path, ckpt_dir=ckpt,
                      robots_path=robots_path, mode="bfs", n_seen_shards=2)
    run_crawl(cfg, seeds=[{"url": "http://a.test/", "depth": 0,
                           "priority": 0}])
    visited = set(read_items(ckpt)["url"].to_pylist())
    assert "http://a.test/ok/1" in visited
    assert "http://a.test/private/1" not in visited
    errs = read_errors(ckpt)
    robots_errs = {u for u, s in zip(errs["url"].to_pylist(),
                                     errs["stage"].to_pylist())
                   if s == "robots"}
    assert "http://a.test/private/1" in robots_errs


def test_wildcard_rule_matching_semantics():
    """RFC 9309 wildcard rules: * spans path chars, trailing $ anchors;
    plain prefixes take the regex-free fast path (rule_regex -> None)."""
    from pomp_ray.functions.robotsfns import path_matches, rule_regex

    assert rule_regex("/p/7") is None
    assert rule_regex("/p/*3") is not None
    assert rule_regex("/p/1$") is not None

    assert path_matches("/p/73", "/p/7")          # prefix
    assert path_matches("/p/3", "/p/*3")
    assert path_matches("/p/13", "/p/*3")
    # RFC rules are PREFIX patterns: /p/*3 matches /p/31 via its /p/3
    # prefix; only a trailing $ pins the end
    assert path_matches("/p/31", "/p/*3")
    assert not path_matches("/p/41", "/p/*3$")
    assert path_matches("/p/1", "/p/1$")
    assert not path_matches("/p/10", "/p/1$")
    assert path_matches("/a.b/x", "/a.b/")        # escaping: '.' literal
    assert not path_matches("/aXb/x", "/a.b/")


def test_wildcard_robots_crawl_conformance(ray_session, tmp_path):
    """End-to-end: a robots table with * and $ rules gates the crawl
    bit-identically in the engine (vectorized regex path) and the
    serial oracle (shared path_matches)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pomp_ray import schemas
    from pomp_ray.crawl import CrawlConfig, CrawlEngine
    from pomp_ray.sources import gen_corpus
    from tests.helpers import (
        errors_set, fixture_corpus, oracle_errors_set, oracle_inputs,
        oracle_visited_tuples, read_ckpt, visited_tuples)
    from pomp_ray.core.oracle import crawl_oracle

    fix = fixture_corpus(gen_corpus.TINY)
    robots_rows = [
        {"host": "site0.test", "disallow_prefixes": ["/p/*3", "/p/1$"],
         "crawl_delay": 0.0},
        {"host": "site1.test", "disallow_prefixes": ["/p/2*7$"],
         "crawl_delay": 0.0},
    ]
    robots_path = str(tmp_path / "robots.parquet")
    pq.write_table(pa.Table.from_pylist(robots_rows,
                                        schema=schemas.ROBOTS),
                   robots_path)

    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=robots_path, mode="bfs",
                      min_distributed_rows=0, n_seen_shards=2)
    eng = CrawlEngine(cfg)
    try:
        seeds = pq.read_table(fix.seeds_path).to_pylist()
        eng.run(seeds=seeds)
    finally:
        eng.close()

    corpus, seeds, _, _ = oracle_inputs(fix)
    res = crawl_oracle(corpus, seeds, robots_rows, mode="bfs")
    assert visited_tuples(read_ckpt(ckpt, "visited")) \
        == oracle_visited_tuples(res)
    assert errors_set(read_ckpt(ckpt, "errors")) == oracle_errors_set(res)
    blocked = {u for u, _stage in
               ((e["url"], e.get("stage")) for e in res.errors)}
    # the wildcard rules actually fired on some urls
    assert any("/p/3" in u or "/p/13" in u for u in blocked) \
        or any(u.endswith("/p/1") for u in blocked)


def test_allow_rule_precedence_semantics():
    """RFC 9309 longest-match decision: allow carve-outs override
    shorter disallows, disallow wins when longer, allow wins ties."""
    from pomp_ray.functions.robotsfns import robots_blocked

    assert robots_blocked("/p/1", ["/p/"])
    assert not robots_blocked("/p/13", ["/p/"], ["/p/13"])
    assert robots_blocked("/p/13", ["/p/13x"[:5]], ["/p/"])  # longer dis
    # equal length -> allow (least restrictive)
    assert not robots_blocked("/p/1", ["/p/1"], ["/p/1"])
    # wildcard allow carve-out over a wildcard disallow
    assert robots_blocked("/cal/2026/1", ["/cal/*"])
    assert not robots_blocked("/cal/2026/1", ["/cal/*"], ["/cal/2026*"])


def test_allow_rules_crawl_conformance(ray_session, tmp_path):
    """End-to-end: Disallow /p/1 with an Allow /p/13 carve-out gates the
    crawl bit-identically in engine and oracle, and /p/13 is visited
    while /p/1 and /p/10 are robots-blocked."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pomp_ray import schemas
    from pomp_ray.core.oracle import crawl_oracle
    from pomp_ray.crawl import CrawlConfig, CrawlEngine
    from pomp_ray.sources import gen_corpus
    from tests.helpers import (
        errors_set, fixture_corpus, oracle_errors_set, oracle_inputs,
        oracle_visited_tuples, read_ckpt, visited_tuples)

    fix = fixture_corpus(gen_corpus.TINY)
    robots_rows = [
        {"host": "site0.test", "disallow_prefixes": ["/p/1"],
         "allow_prefixes": ["/p/13"], "crawl_delay": 0.0},
    ]
    robots_path = str(tmp_path / "robots.parquet")
    pq.write_table(pa.Table.from_pylist(robots_rows,
                                        schema=schemas.ROBOTS),
                   robots_path)

    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=robots_path, mode="bfs",
                      min_distributed_rows=0, n_seen_shards=2)
    eng = CrawlEngine(cfg)
    try:
        seeds = pq.read_table(fix.seeds_path).to_pylist()
        eng.run(seeds=seeds)
    finally:
        eng.close()

    corpus, seeds, _, _ = oracle_inputs(fix)
    res = crawl_oracle(corpus, seeds, robots_rows, mode="bfs")
    vis = read_ckpt(ckpt, "visited")
    assert visited_tuples(vis) == oracle_visited_tuples(res)
    assert errors_set(read_ckpt(ckpt, "errors")) == oracle_errors_set(res)
    urls = set(vis["url"].to_pylist())
    assert "http://site0.test/p/13" in urls
    assert "http://site0.test/p/1" not in urls
    blocked = {e["url"] for e in res.errors if e["stage"] == "robots"}
    assert "http://site0.test/p/1" in blocked


def test_sitemap_directive_and_seed_discovery(ray_session, tmp_path):
    """Sitemap: lines are group-independent, deduped in order; the
    discovery pass turns /robots.txt pages into a SEEDS table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pomp_ray.functions.robotsfns import parse_robots_txt
    from pomp_ray.sources.corpus import discover_robots_sitemap_seeds

    body = b"""User-agent: *\nDisallow: /x\nSitemap: http://a.test/sm1\n
User-agent: bot\nSitemap: http://a.test/sm1\nSitemap: http://a.test/sm2\n"""
    got = parse_robots_txt(body)
    assert got["sitemaps"] == ["http://a.test/sm1", "http://a.test/sm2"]
    # UA-specific view still sees the global sitemap list
    assert parse_robots_txt(body, user_agent="bot")["sitemaps"] \
        == ["http://a.test/sm1", "http://a.test/sm2"]

    pages = pa.table({
        "url": ["http://a.test/robots.txt", "http://a.test/p/1",
                "http://b.test/robots.txt"],
        "warc_ts": pa.array([0, 0, 0], pa.timestamp("us")),
        "html": [body, b"<p>x</p>",
                 b"Sitemap: http://b.test/map\nUser-agent: *\nDisallow:\n"],
        "text": ["", "x", ""],
        "lang": ["en", "en", "en"]})
    path = str(tmp_path / "pages.parquet")
    pq.write_table(pages, path)
    seeds = discover_robots_sitemap_seeds(path).to_pandas()
    assert sorted(seeds["url"]) == ["http://a.test/sm1",
                                    "http://a.test/sm2",
                                    "http://b.test/map"]
    assert set(seeds["depth"]) == {0}
