"""XML sitemap discovery (sitemaps.org urlset + sitemapindex): parser
fidelity vs the plain-text sibling, lastmod extraction, and the
superset conformance law for crawls seeded from discovered entries."""

import pytest
import pyarrow.parquet as pq

from pomp_ray import crawl as crawl_mod
from pomp_ray.crawl import CrawlConfig, CrawlEngine
from pomp_ray.sources import gen_corpus
from pomp_ray.sources.corpus import (
    discover_sitemap_seeds,
    discover_sitemap_xml_seeds,
    sitemap_xml_entries,
)


def _fix():
    return gen_corpus.generate("/tmp/pomp_q_corpus_xmlmap",
                               gen_corpus.XMLMAP)


def test_xml_entries_match_text_sitemap(ray_session):
    """The XML urlsets list exactly the urls of /sitemap.txt (the
    generator splits the same listing across the two children), and
    every entry carries a deterministic lastmod date."""
    fix = _fix()
    xml = sitemap_xml_entries(fix.pages_path).take_all()
    txt = discover_sitemap_seeds(fix.pages_path).take_all()
    assert {r["url"] for r in xml} == {r["url"] for r in txt}
    assert all(r["lastmod"].startswith("2026-01-") for r in xml)
    # urls are distinct after the Min-groupby
    assert len({r["url"] for r in xml}) == len(xml)


def test_xml_seeds_schema(ray_session):
    fix = _fix()
    seeds = discover_sitemap_xml_seeds(fix.pages_path).take_all()
    assert len(seeds) > 0
    assert all(s["url"].startswith("http://") and s["depth"] == 0
               for s in seeds)


def test_sitemapindex_recursion_only_reachable(ray_session, tmp_path):
    """An orphan urlset NOT referenced from any root sitemapindex must
    not contribute entries (reachability, not suffix matching)."""
    import pyarrow as pa

    fix = _fix()
    t = pq.read_table(fix.pages_path)
    orphan = ('<?xml version="1.0" encoding="UTF-8"?>'
              '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
              '<url><loc>http://siteX.test/p/999</loc>'
              '<lastmod>2026-01-01</lastmod></url></urlset>')
    extra = pa.table({
        "url": pa.array(["http://site0.test/sitemap-orphan.xml"]),
        "warc_ts": pa.array([t["warc_ts"][0].as_py()],
                            pa.timestamp("us")),
        "html": pa.array([orphan.encode()], pa.binary()),
        "text": pa.array([""]),
        "lang": pa.array(["en"]),
    }, schema=t.schema)
    merged = pa.concat_tables([t, extra])
    p = str(tmp_path / "pages.parquet")
    pq.write_table(merged, p)
    urls = {r["url"] for r in sitemap_xml_entries(p).take_all()}
    assert "http://siteX.test/p/999" not in urls
    # the reachable entries are unchanged
    base = {r["url"] for r in sitemap_xml_entries(fix.pages_path).take_all()}
    assert urls == base


@pytest.mark.slow
def test_xml_seeded_crawl_superset(ray_session, tmp_path):
    """Crawl seeded from XML sitemap entries covers everything the
    root-seeded crawl reached (directly listed pages behind blocked
    parents may additionally appear — the established sitemap law)."""
    fix = _fix()

    def crawl(ckpt, seed_rows):
        cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                          robots_path=fix.robots_path, mode="bfs",
                          min_distributed_rows=16, n_seen_shards=2)
        eng = CrawlEngine(cfg)
        try:
            eng.run(seeds=seed_rows)
        finally:
            eng.close()
        return set(crawl_mod.read_visited(ckpt)["url"].to_pylist())

    roots = [{"url": f"http://site{h}.test/p/0", "priority": 0,
              "depth": 0} for h in range(gen_corpus.XMLMAP.n_hosts)]
    seeds = discover_sitemap_xml_seeds(fix.pages_path).take_all()
    # xml seeds include every host root (stride listing starts at 0)
    assert {r["url"] for r in roots} <= {s["url"] for s in seeds}
    std = crawl(str(tmp_path / "std"), roots)
    sm = crawl(str(tmp_path / "sm"), list(seeds))
    assert std <= sm
    extras = sm - std
    corpus_urls = set(pq.read_table(
        fix.pages_path, columns=["url"])["url"].to_pylist())
    assert extras <= corpus_urls
    assert not {u for u in extras if "site0.test/p/7" in u}
