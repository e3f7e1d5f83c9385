"""Deterministic synthetic web-page corpus generator (FIXTURES.md).

Mirrors the reference's test strategy (SURVEY.md section 5): pomp's e2e
tests crawl a synthetic in-memory sitemap built by test helpers
(tests/utils.py / mockserver.py [estimated]); expected outputs are computed
from the same generator.  We replace the mock HTTP server with Parquet
tables matching the driver's ``input_hint`` schema (BASELINE.json:15).

Everything is keyed off ``seed`` (default 42) and the size profile; a
manifest file makes generation idempotent so benches can cache under /tmp.

Link topology per FIXTURES.md section 1: within each host page ``i`` links
to children ``2i+1``/``2i+2`` (binary tree) while in range; plus 5% seeded
cross-host links, 2% links to nonexistent URLs (fetch-miss path), 1%
duplicate links and 1% links back to the root (dedup path); 20% of
same-host links rendered as relative hrefs (exercises url_join).

IMPORTANT: the golden ``text`` column is built directly from the page
template strings here -- NOT by calling the extractor -- so the pytest
byte-identity check (extractor(html) == text) is a real two-implementation
comparison.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pomp_ray import schemas

_WORDS = (
    "crawl frontier fetch parse arrow batch shard actor stream block "
    "politeness robots budget depth queue page link host seed round "
    "vector token corpus index hash salt skew spill lineage metric"
).split()


@dataclass(frozen=True)
class CorpusProfile:
    name: str
    n_hosts: int
    n_pages: int          # total pages across all hosts
    zipf_skew: float = 0.0  # 0 = uniform; >0 = zipf(s) host sizes
    sentence_words: int = 8   # length of the seeded random sentence
    seed: int = 42
    # every k-th host mirrors the previous host's page content (same
    # title+para at the same page index; links/urls stay its own) --
    # the cross-host duplication web mirrors produce.  0 = off.
    mirror_every: int = 0
    # redirect stand-ins: child links with child%3==2 point at /r/child
    # (-> /p/child), child%7==3 at /r2/child (-> /r/child, a 2-hop
    # chain); each host gains /r/i,/r2/i pages for every i plus a
    # /loop/a<->/loop/b pair linked from page 0 (exceeds the hop cap ->
    # fetch error).  False = off (default; existing corpora unchanged).
    redirects: bool = False
    # crawler-trap pages: host 0 gains /cal/{i} pages (i < trap_pages)
    # carrying IDENTICAL text, each linking to /cal/{i+1} -- the
    # calendar-trap shape (infinite url space, no new content).  0 = off.
    trap_pages: int = 0
    # XML sitemaps (sitemaps.org): each host gains /sitemap.xml (a
    # sitemapindex referencing two child urlsets) plus /sitemap-0.xml
    # and /sitemap-1.xml listing the SAME urls as the plain-text
    # /sitemap.txt, each with a deterministic <lastmod> date.  False =
    # off (existing corpora unchanged).
    xml_sitemaps: bool = False

    def key(self) -> str:
        # -v2: page template gained per-link anchor words; -v3: per-host
        # -v4: pages.parquet written with 8k row groups (content
        # identical; layout change invalidates cached corpora)
        # plain-text sitemap pages.  The version suffix invalidates /tmp
        # corpus caches built from older templates.  mirror_every only
        # appears when enabled so existing profile caches stay valid
        # (the post-pass is a no-op at 0: rng stream untouched).
        m = f"-m{self.mirror_every}" if self.mirror_every else ""
        m += "-r1" if self.redirects else ""
        # "l": trap chains are LINKED from host 0's root page (key bump
        # invalidating pre-link trap corpora; no-op for trap_pages=0)
        m += f"-t{self.trap_pages}l" if self.trap_pages else ""
        m += "-x1" if self.xml_sitemaps else ""
        return (
            f"{self.name}-h{self.n_hosts}-p{self.n_pages}"
            f"-z{self.zipf_skew}-w{self.sentence_words}-s{self.seed}{m}-v4"
        )


TINY = CorpusProfile("tiny", n_hosts=2, n_pages=60)
SMALL = CorpusProfile("small", n_hosts=20, n_pages=2000)
# Mirror fixture: hosts 3,7,11 serve byte-identical content to hosts
# 2,6,10 -- exercises mirror detection and cross-host line dedup.
MIRROR = CorpusProfile("mirror", n_hosts=12, n_pages=1200, mirror_every=4)
# Redirect fixture: ~1/3 of tree links route through 1- or 2-hop
# redirect pages; a per-host redirect loop exercises the hop cap.
REDIR = CorpusProfile("redir", n_hosts=4, n_pages=240, redirects=True)
# Trap fixture: host 0 carries a 120-page calendar trap (one template,
# identical content) beside the normal per-host page trees.
TRAP = CorpusProfile("trap", n_hosts=6, n_pages=300, trap_pages=120)
# XML-sitemap fixture: per-host sitemapindex + two urlset children with
# lastmod dates, beside the plain-text /sitemap.txt.
XMLMAP = CorpusProfile("xmlmap", n_hosts=4, n_pages=240, xml_sitemaps=True)
BENCH = CorpusProfile("bench", n_hosts=200, n_pages=200_000, zipf_skew=1.2,
                      sentence_words=60)
# Flat throughput corpus: one production-shaped mega-round (each round at
# 10^10-URL scale is millions of urls; per-round overhead amortizes away).
BENCH_FLAT = CorpusProfile("benchflat", n_hosts=200, n_pages=600_000,
                           zipf_skew=1.2, sentence_words=100)


def host_page_counts(p: CorpusProfile) -> list[int]:
    if p.zipf_skew <= 0:
        base = p.n_pages // p.n_hosts
        rem = p.n_pages - base * p.n_hosts
        return [base + (1 if h < rem else 0) for h in range(p.n_hosts)]
    w = 1.0 / np.arange(1, p.n_hosts + 1) ** p.zipf_skew
    w /= w.sum()
    counts = np.maximum(1, np.floor(w * p.n_pages)).astype(int)
    # distribute the rounding remainder onto the biggest host
    counts[0] += p.n_pages - counts.sum()
    return counts.tolist()


def _page_url(h: int, i: int) -> str:
    return f"http://site{h}.test/p/{i}"


def _sentence(rng: np.random.Generator, n: int) -> str:
    return " ".join(_WORDS[j] for j in rng.integers(0, len(_WORDS), size=n))


@dataclass
class GeneratedCorpus:
    pages_path: str
    seeds_path: str
    robots_path: str
    profile: CorpusProfile
    host_counts: list[int] = field(default_factory=list)


def generate(out_dir: str, profile: CorpusProfile = TINY) -> GeneratedCorpus:
    """Write pages/seeds/robots parquet under ``out_dir``; idempotent via a
    manifest keyed on the profile."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "MANIFEST.json")
    counts = host_page_counts(profile)
    paths = GeneratedCorpus(
        pages_path=os.path.join(out_dir, "pages.parquet"),
        seeds_path=os.path.join(out_dir, "seeds.parquet"),
        robots_path=os.path.join(out_dir, "robots.parquet"),
        profile=profile,
        host_counts=counts,
    )
    if os.path.exists(manifest):
        try:
            with open(manifest) as f:
                if json.load(f).get("key") == profile.key():
                    return paths
        except (json.JSONDecodeError, OSError):
            pass

    rng = np.random.default_rng(profile.seed)
    urls: list[str] = []
    warc_ts: list[int] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    epoch_us = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in unix us

    lang_draw = rng.random(profile.n_pages)
    host_start: list[int] = []
    for h, n_in_host in enumerate(counts):
        host_start.append(len(urls))
        for i in range(n_in_host):
            url = _page_url(h, i)
            links: list[str] = []
            for child in (2 * i + 1, 2 * i + 2):
                if child < n_in_host:
                    # redirect profiles route some tree links through
                    # redirect pages (AFTER the rng draw, so redirect-off
                    # profiles generate byte-identical corpora)
                    seg = "p"
                    if profile.redirects and child % 3 == 2:
                        seg = "r"
                    elif profile.redirects and child % 7 == 3:
                        seg = "r2"
                    # 20% of same-host links are relative hrefs
                    if rng.random() < 0.20:
                        links.append(f"/{seg}/{child}")
                    else:
                        links.append(f"http://site{h}.test/{seg}/{child}")
            if rng.random() < 0.05 and profile.n_hosts > 1:  # cross-host link
                oh = int(rng.integers(0, profile.n_hosts))
                if oh == h:
                    oh = (oh + 1) % profile.n_hosts
                links.append(_page_url(oh, int(rng.integers(0, counts[oh]))))
            if rng.random() < 0.02:  # dead link -> fetch-miss/errors path
                links.append(_page_url(h, n_in_host + int(rng.integers(0, 50))))
            if rng.random() < 0.01 and links:  # duplicate link
                links.append(links[0])
            if rng.random() < 0.01:  # link back to the root -> seen-set path
                links.append(_page_url(h, 0))
            if profile.redirects and i == 0:
                links.append(f"http://site{h}.test/loop/a")
            if profile.trap_pages and h == 0 and i == 0:
                # the trap is REACHABLE: an unguarded crawl walks the
                # whole /cal chain (after the rng draws -- trap-off
                # profiles stay byte-identical)
                links.append("/cal/0")

            title = f"site{h} page {i}"
            para = f"text {h}-{i} {_sentence(rng, profile.sentence_words)}"
            # mirror hosts copy the previous host's content verbatim
            # (AFTER the rng draws above, so profiles with mirroring off
            # generate byte-identical corpora to before this feature)
            if (profile.mirror_every
                    and h % profile.mirror_every == profile.mirror_every - 1
                    and h > 0 and i < counts[h - 1]):
                title, para = texts[host_start[h - 1] + i].split("\n", 1)
            anchors = "".join(
                f'<a href="{l}">{_WORDS[(h * 13 + i * 7 + j * 3) % len(_WORDS)]}</a>'
                for j, l in enumerate(links))
            html = (
                f"<html><head><title>{title}</title></head>"
                f"<body><p>{para}</p>{anchors}</body></html>"
            )
            k = len(urls)
            urls.append(url)
            warc_ts.append(epoch_us + (h * 100_000 + i) * 1_000_000)
            htmls.append(html.encode("utf-8"))
            texts.append(f"{title}\n{para}")
            d = lang_draw[k] if k < len(lang_draw) else rng.random()
            langs.append("en" if d < 0.90 else ("de" if d < 0.95 else "fr"))

    # one plain-text sitemap page per host (sitemaps.org text format:
    # one url per line) -- unreachable from the link graph, so crawl
    # goldens are untouched; ``sources.corpus.discover_sitemap_seeds`` reads them
    for h, n_in_host in enumerate(counts):
        listed = [_page_url(h, i) for i in range(0, n_in_host,
                                                 max(1, n_in_host // 8))]
        body = "\n".join(listed)
        title = f"sitemap site{h}"
        urls.append(f"http://site{h}.test/sitemap.txt")
        warc_ts.append(epoch_us + (profile.n_hosts * 100_000 + h)
                       * 1_000_000)
        htmls.append((f"<html><head><title>{title}</title></head>"
                      f"<body><p>{body}</p></body></html>").encode())
        texts.append(f"{title}\n{body}")
        langs.append("en")

    if profile.xml_sitemaps:
        # XML sitemaps (sitemaps.org): one <sitemapindex> per host
        # referencing two <urlset> children that split the same listing
        # as /sitemap.txt; each entry carries a deterministic <lastmod>.
        # Raw XML has no <title>/<p>, so the golden text is "" (the
        # extractor byte-identity invariant holds).  Emitted after the
        # rng stream -- xml-off profiles stay byte-identical.
        def _emit_xml(url: str, body: str) -> None:
            urls.append(url)
            warc_ts.append(epoch_us
                           + (profile.n_hosts * 400_000 + len(urls))
                           * 1_000_000)
            htmls.append(body.encode("utf-8"))
            texts.append("")
            langs.append("en")

        _XMLNS = "http://www.sitemaps.org/schemas/sitemap/0.9"
        for h, n_in_host in enumerate(counts):
            listed = [_page_url(h, i)
                      for i in range(0, n_in_host, max(1, n_in_host // 8))]
            cut = (len(listed) + 1) // 2
            halves = (listed[:cut], listed[cut:])
            child_urls = [f"http://site{h}.test/sitemap-{j}.xml"
                          for j in range(2)]
            _emit_xml(
                f"http://site{h}.test/sitemap.xml",
                '<?xml version="1.0" encoding="UTF-8"?>'
                f'<sitemapindex xmlns="{_XMLNS}">'
                + "".join(f"<sitemap><loc>{c}</loc></sitemap>"
                          for c in child_urls)
                + "</sitemapindex>")
            for j, part in enumerate(halves):
                entries = "".join(
                    f"<url><loc>{u}</loc>"
                    f"<lastmod>2026-01-{(h * 7 + ei) % 28 + 1:02d}"
                    f"</lastmod></url>"
                    for ei, u in enumerate(part))
                _emit_xml(child_urls[j],
                          '<?xml version="1.0" encoding="UTF-8"?>'
                          f'<urlset xmlns="{_XMLNS}">{entries}</urlset>')

    if profile.trap_pages:
        # calendar trap on host 0: every /cal/i serves the SAME text and
        # links onward -- url space grows, content diversity doesn't
        # (emitted after the rng stream, so trap-off profiles are
        # byte-identical to before this feature)
        trap_para = "calendar of upcoming events for site0"
        for i in range(profile.trap_pages):
            title = "site0 calendar"
            html = (f"<html><head><title>{title}</title></head>"
                    f"<body><p>{trap_para}</p>"
                    f'<a href="/cal/{i + 1}">next</a></body></html>')
            urls.append(f"http://site0.test/cal/{i}")
            warc_ts.append(epoch_us + (profile.n_hosts * 300_000 + i)
                           * 1_000_000)
            htmls.append(html.encode("utf-8"))
            texts.append(f"{title}\n{trap_para}")
            langs.append("en")

    if profile.redirects:
        def _emit_redirect(url: str, target: str) -> None:
            html = (f'<html><head><meta http-equiv="refresh" '
                    f'content="0;url={target}"></head><body></body></html>')
            urls.append(url)
            warc_ts.append(epoch_us
                           + (profile.n_hosts * 200_000 + len(urls))
                           * 1_000_000)
            htmls.append(html.encode("utf-8"))
            texts.append("")    # no title/<p>: extractor yields ""
            langs.append("en")

        for h, n_in_host in enumerate(counts):
            for i in range(n_in_host):
                _emit_redirect(f"http://site{h}.test/r/{i}",
                               _page_url(h, i))
                _emit_redirect(f"http://site{h}.test/r2/{i}",
                               f"http://site{h}.test/r/{i}")
            _emit_redirect(f"http://site{h}.test/loop/a",
                           f"http://site{h}.test/loop/b")
            _emit_redirect(f"http://site{h}.test/loop/b",
                           f"http://site{h}.test/loop/a")

    pages = pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(warc_ts, pa.timestamp("us")),
            pa.array(htmls, pa.binary()),
            pa.array(texts, pa.string()),
            pa.array(langs, pa.string()),
        ],
        schema=schemas.PAGES,
    )
    # 8k-row groups: a single giant row group caps every downstream
    # corpus-scanning Dataset at ~1 read task (the frontier writers
    # already do this; the corpus itself was the remaining offender)
    pq.write_table(pages, paths.pages_path, row_group_size=8192)

    # seeds: each host's root, plus 3 duplicate seeds and 1 unknown url
    seed_urls = [_page_url(h, 0) for h in range(profile.n_hosts)]
    seed_urls += [_page_url(0, 0)] * 3 + [_page_url(0, 999_999)]
    seeds = pa.Table.from_arrays(
        [
            pa.array(seed_urls, pa.string()),
            pa.array([0] * len(seed_urls), pa.int32()),
            pa.array([0] * len(seed_urls), pa.int32()),
        ],
        schema=schemas.SEEDS,
    )
    pq.write_table(seeds, paths.seeds_path)

    # robots: every 5th host blocks the /p/7 prefix subtree; every 7th host
    # has crawl_delay 1.0 (budget-limited)
    robots = pa.Table.from_arrays(
        [
            pa.array([f"site{h}.test" for h in range(profile.n_hosts)]),
            pa.array(
                [["/p/7"] if h % 5 == 0 else [] for h in range(profile.n_hosts)],
                pa.list_(pa.string()),
            ),
            pa.array([[] for _ in range(profile.n_hosts)],
                     pa.list_(pa.string())),
            pa.array(
                [1.0 if h % 7 == 0 else 0.0 for h in range(profile.n_hosts)],
                pa.float64(),
            ),
        ],
        schema=schemas.ROBOTS,
    )
    pq.write_table(robots, paths.robots_path)

    with open(manifest, "w") as f:
        json.dump({"key": profile.key(), "n_pages": len(urls)}, f)
    return paths
