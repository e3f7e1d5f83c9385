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
                    "crawl_delay": 2.5}
    evil = parse_robots_txt(ROBOTS_A, user_agent="EvilBot")
    assert evil["disallow_prefixes"] == ["/"]
    # stacked User-agent lines share one record group; specific UA
    # overrides the (empty) * group entirely
    pomp = parse_robots_txt(ROBOTS_B, user_agent="pompbot")
    assert pomp == {"disallow_prefixes": ["/secret/"], "crawl_delay": 7.0}
    other = parse_robots_txt(ROBOTS_B, user_agent="otherbot")
    assert other["disallow_prefixes"] == ["/secret/"]
    default = parse_robots_txt(ROBOTS_B)
    assert default == {"disallow_prefixes": [], "crawl_delay": 0.0}
    assert parse_robots_txt(b"") == {"disallow_prefixes": [],
                                     "crawl_delay": 0.0}


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
