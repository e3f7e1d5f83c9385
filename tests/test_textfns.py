from pomp_ray.functions.textfns import (
    html_extract_links,
    html_extract_text,
    html_extract_title,
    url_canonicalize,
    url_host,
    url_join,
)


def test_canonicalize():
    assert url_canonicalize("HTTP://Site0.TEST:80/p/1#frag") == "http://site0.test/p/1"
    assert url_canonicalize("http://a.test") == "http://a.test/"
    assert url_canonicalize("https://a.test:443/x?q=1") == "https://a.test/x?q=1"
    assert url_canonicalize("http://a.test:8080/x") == "http://a.test:8080/x"
    assert url_canonicalize("  http://a.test/x  ") == "http://a.test/x"
    assert url_canonicalize("") == ""


def test_host_join():
    assert url_host("http://Site3.TEST/p/9") == "site3.test"
    assert url_join("http://a.test/p/0", "/p/5") == "http://a.test/p/5"
    assert url_join("http://a.test/p/0", "http://b.test/p/1") == "http://b.test/p/1"


def test_extract():
    html = (b'<html><head><title>t1</title></head>'
            b'<body><p>hello <b>world</b></p><p>two</p>'
            b'<a href="/p/1">l</a><a href="http://x.test/p/2">l</a></body></html>')
    assert html_extract_title(html) == "t1"
    assert html_extract_text(html) == "t1\nhello world\ntwo"
    assert html_extract_links(html) == ["/p/1", "http://x.test/p/2"]
    assert html_extract_text(b"") == ""
    assert html_extract_links(b"no links") == []


def test_canonicalize_fast_path_equivalence():
    """The fast-path regex must NEVER change the result vs the full
    urlsplit path (property-based over url-shaped strings)."""
    from hypothesis import given, settings, strategies as st

    from pomp_ray.functions import textfns

    def slow(url: str) -> str:
        # the full path, with the fast path disabled
        import re as _re
        old = textfns._CANON_FAST_RE
        textfns._CANON_FAST_RE = _re.compile(r"(?!x)x")  # never matches
        try:
            return textfns.url_canonicalize(url)
        finally:
            textfns._CANON_FAST_RE = old

    url_chars = st.sampled_from(list("abcXYZ09.-_/:?#@ %~[]"))
    hostish = st.text(alphabet=list("abcXYZ09.-"), min_size=1, max_size=12)
    pathish = st.text(alphabet=url_chars, max_size=20)
    scheme = st.sampled_from(["http", "https", "HTTP", "ftp", ""])

    @settings(max_examples=500, deadline=None)
    @given(scheme, hostish, pathish)
    def check(sch, host, path):
        url = f"{sch}://{host}/{path}" if sch else f"{host}/{path}"
        assert textfns.url_canonicalize(url) == slow(url)

    check()


def test_byte_identity_over_corpus():
    """BASELINE.json:15 invariant: extractor(html) == golden text column,
    byte-for-byte, for every page of the generated corpus."""
    from tests.helpers import fixture_corpus
    import pyarrow.parquet as pq
    from pomp_ray.sources import gen_corpus

    fix = fixture_corpus(gen_corpus.SMALL)
    pages = pq.read_table(fix.pages_path)
    for url, html, text in zip(pages["url"].to_pylist(),
                               pages["html"].to_pylist(),
                               pages["text"].to_pylist()):
        assert html_extract_text(html) == text, url


def test_canonicalize_batch_equivalence():
    """The vectorized canonicalize_batch (Arrow regex fast path + per-row
    residue) must equal the straight per-row reference on every shape:
    relative hrefs, ports, queries, fragments, uppercase, userinfo."""
    import pyarrow as pa

    from pomp_ray.functions.textfns import (
        url_canonicalize, url_host, url_join, url_path)
    from pomp_ray.stages.enqueue import canonicalize_batch

    urls = [
        "http://site0.test/p/1", "https://a.b-c.test/x/y.z",
        "/p/7", "p/8", "../up", "HTTP://Site0.TEST/p/1",
        "http://site0.test:80/p/1", "http://site0.test:8080/p/1",
        "http://site0.test/p/1?q=2", "http://site0.test/p/1#frag",
        "http://user@site0.test/p/1", "http://site0.test", "",
        "http://site0.test/p/sp ace", "//proto.test/x", "//proto.test",
    ]
    bases = ["http://base.test/dir/page"] * len(urls)
    batch = pa.table({"url": pa.array(urls, pa.string()),
                      "base": pa.array(bases, pa.string())})
    out = canonicalize_batch(batch)
    for u, b, c, h, p in zip(urls, bases, out["canon_url"].to_pylist(),
                             out["host"].to_pylist(),
                             out["path"].to_pylist()):
        ref = url_canonicalize(url_join(b, u) if b else u)
        assert c == ref, (u, c, ref)
        assert h == url_host(ref), (u, h)
        assert p == url_path(ref), (u, p)
    # and the no-base shape (seed admission)
    out2 = canonicalize_batch(pa.table({"url": pa.array(urls, pa.string())}))
    for u, c in zip(urls, out2["canon_url"].to_pylist()):
        assert c == url_canonicalize(u), (u, c)


def test_canonicalize_protocol_relative_not_rel_tier():
    """A protocol-relative href ('//other.test/x') in a batch that is
    otherwise fully fast/rel-covered must resolve to the OTHER host via
    the per-row urljoin path, not be mis-joined against the base host by
    the root-relative Arrow tier (ADVICE r4 high)."""
    import pyarrow as pa

    from pomp_ray.functions.textfns import url_canonicalize, url_join
    from pomp_ray.stages.enqueue import canonicalize_batch

    urls = ["http://fast.test/a", "/rel/b", "/", "//other.test/x"]
    bases = ["http://base.test/dir/page"] * len(urls)
    out = canonicalize_batch(pa.table({
        "url": pa.array(urls, pa.string()),
        "base": pa.array(bases, pa.string())}))
    canon = out["canon_url"].to_pylist()
    for u, b, c in zip(urls, bases, canon):
        assert c == url_canonicalize(url_join(b, u)), (u, c)
    assert canon[3] == "http://other.test/x"
    assert out["host"].to_pylist()[3] == "other.test"
    # and WITHOUT the protocol-relative row the batch must still take the
    # all-Arrow merged tier (same answers; coverage asserted indirectly by
    # the n_canon_slow==0 crawl invariant on generated corpora)
    out2 = canonicalize_batch(pa.table({
        "url": pa.array(urls[:3], pa.string()),
        "base": pa.array(bases[:3], pa.string())}))
    for u, b, c in zip(urls[:3], bases[:3], out2["canon_url"].to_pylist()):
        assert c == url_canonicalize(url_join(b, u)), (u, c)


def test_minhash_signatures_batch_equivalence():
    """minhash_signatures_batch must be bit-identical to the per-row
    minhash_signature on every shape (empty, <k tokens, normal docs)."""
    import numpy as np

    from pomp_ray.functions import analysis as an

    texts = ["", "one", "a b", "a b c d", "a b c d e", "a b c d e f",
             "the quick brown fox jumps over the lazy dog " * 8,
             "wort " * 3, "x y z w v u t s r q p o n m"]
    params = an._minhash_params(64)
    mat = an.minhash_signatures_batch(texts, 64, params=params, chunk=4)
    for i, x in enumerate(texts):
        assert np.array_equal(mat[i],
                              an.minhash_signature(x, 64, params=params)), i


def test_html_extract_anchors_pairs():
    html = ('<html><head><title>t</title></head><body><p>x</p>'
            '<a href="/p/1">alpha</a><a href="http://h.test/p/2">beta</a>'
            '</body></html>')
    from pomp_ray.functions.textfns import html_extract_anchors
    assert html_extract_anchors(html) == [("/p/1", "alpha"),
                                          ("http://h.test/p/2", "beta")]
    assert html_extract_anchors(html.encode()) == html_extract_anchors(html)
    assert html_extract_anchors("<p>no links</p>") == []


def test_extract_hrefs_batch_matches_scalar():
    """Vectorized href extraction must equal _HREF_RE.findall per row,
    including the nasty shapes: no closing quote, empty href, href in
    text, newlines inside values, null/empty html, non-anchor hrefs."""
    import numpy as np
    import pyarrow as pa

    from pomp_ray.functions.textfns import (extract_hrefs_batch,
                                            html_extract_links)

    docs = [
        b'<a href="http://a/x">1</a><link href="/css"><a href="/y">2</a>',
        b'no links at all',
        b'<a href="">empty</a><a href="/ok">fine</a>',
        b'broken <a href="http://tail-without-quote',
        b'text mentioning href=" quote then more "later"',
        b'multi\nline <a href="/a\nb">x</a>',
        None,
        b'',
        b'<a href="x"><a href="x">dup</a>',
    ]
    arr = pa.array(docs, pa.binary())
    hrefs, parent = extract_hrefs_batch(arr)
    got = {}
    for h, p in zip(hrefs.to_pylist(), parent.tolist()):
        got.setdefault(p, []).append(h)
    for i, d in enumerate(docs):
        want = html_extract_links(d or b"")
        assert got.get(i, []) == want, (i, d)


def test_host_edge_rows_matches_scalar():
    """_host_edge_rows (vectorized corpus link scanner) must equal the
    per-row url_join/url_canonicalize/url_host pipeline on a corpus
    batch."""
    import pyarrow as pa

    from pomp_ray.functions.textfns import (html_extract_links,
                                            url_canonicalize, url_host,
                                            url_join)
    from pomp_ray.pipelines.graph import _host_edge_rows

    urls = ["http://site0.test/p/0", "http://site1.test/a/b",
            "http://odd.test/x"]
    htmls = [
        b'<a href="/p/1">a</a><a href="http://site9.test/p/2">b</a>',
        b'<a href="../up">rel</a><a href="HTTP://UPPER.test/Q">u</a>',
        None,
    ]
    t = pa.table({"url": pa.array(urls), "html": pa.array(htmls,
                                                          pa.binary())})
    rows = _host_edge_rows(t)
    got = list(zip(rows["src"].to_pylist(), rows["dst"].to_pylist(),
                   rows["target"].to_pylist()))
    want = []
    for u, h in zip(urls, htmls):
        if h is None:
            continue
        for href in html_extract_links(h):
            canon = url_canonicalize(url_join(u, href))
            want.append((url_host(u), url_host(canon), canon))
    assert got == want
