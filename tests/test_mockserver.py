"""Tier-2 downloader tests against a REAL loopback socket (pomp
`test_contrib_urllib` / `test_contrib_asyncio` parity [estimated],
SURVEY.md §5): `HttpFetcher`'s sync urllib path and async seam fetch
from a live stdlib HTTP server, including retry-after-500,
retry-after-connection-reset, and permanent-404 classification; a full
crawl routed through the socket must visit the same set as the
broadcast corpus fetcher."""

import pyarrow as pa
import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, CrawlEngine
from pomp_ray.sources import gen_corpus
from pomp_ray.stages.fetch import HttpFetcher
from tests.helpers import (
    errors_set,
    fixture_corpus,
    items_map,
    oracle_errors_set,
    oracle_items_map,
    read_ckpt,
    run_oracle,
)
from tests.mockserver import (
    CorpusHTTPServer,
    make_async_socket_opener,
    make_socket_opener,
)


def _batch(urls):
    return pa.table({"canon_url": pa.array(urls, pa.string())})


def _col(t, name):
    return t[name].to_pylist()


def test_httpfetcher_sync_over_socket():
    fix = fixture_corpus(gen_corpus.TINY)
    corpus_urls = sorted(
        CorpusHTTPServer(fix.pages_path).corpus)  # canon, not started
    good, flaky, resetting = corpus_urls[0], corpus_urls[1], corpus_urls[2]
    missing = "http://site0.test/nope/404"
    srv = CorpusHTTPServer(fix.pages_path, fail_500={flaky},
                           reset_once={resetting}).start()
    try:
        f = HttpFetcher(timeout=5.0, max_retries=2,
                        opener=make_socket_opener(srv.port))
        out = f(_batch([good, flaky, resetting, missing]))
        ok = _col(out, "fetch_ok")
        att = _col(out, "fetch_attempts")
        retry = _col(out, "fetch_retryable")
        err = _col(out, "fetch_err")
        html = _col(out, "html")
        # clean fetch: real bytes over the wire, single attempt
        assert ok[0] and att[0] == 1 and html[0] == srv.corpus[good]
        # HTTP 500 then 200: one in-stage retry recovers
        assert ok[1] and att[1] == 2 and html[1] == srv.corpus[flaky]
        # connection dropped then 200: RemoteDisconnected is retryable
        assert ok[2] and att[2] == 2 and html[2] == srv.corpus[resetting]
        # 404: permanent, no retry burned
        assert not ok[3] and att[3] == 1 and not retry[3]
        assert err[3] == "HTTP 404"
        assert srv.hits(good) == 1 and srv.hits(flaky) == 2
    finally:
        srv.stop()


def test_httpfetcher_async_over_socket():
    fix = fixture_corpus(gen_corpus.TINY)
    corpus_urls = sorted(CorpusHTTPServer(fix.pages_path).corpus)
    good, flaky, resetting = corpus_urls[0], corpus_urls[1], corpus_urls[2]
    missing = "http://site9.test/nope/404"
    srv = CorpusHTTPServer(fix.pages_path, fail_500={flaky},
                           reset_once={resetting}).start()
    try:
        f = HttpFetcher(timeout=5.0, max_retries=2,
                        async_opener=make_async_socket_opener(srv.port),
                        max_concurrency=4)
        out = f(_batch([good, flaky, resetting, missing]))
        ok = _col(out, "fetch_ok")
        att = _col(out, "fetch_attempts")
        retry = _col(out, "fetch_retryable")
        html = _col(out, "html")
        assert ok[0] and html[0] == srv.corpus[good]
        assert ok[1] and att[1] == 2 and html[1] == srv.corpus[flaky]
        assert ok[2] and att[2] == 2 and html[2] == srv.corpus[resetting]
        assert not ok[3] and not retry[3] and att[3] == 1
    finally:
        srv.stop()


def test_httpfetcher_exhausted_retries_over_socket():
    """A url that keeps failing transiently is emitted in-band with
    fetch_retryable=True after max_retries+1 real socket attempts."""
    fix = fixture_corpus(gen_corpus.TINY)
    url = sorted(CorpusHTTPServer(fix.pages_path).corpus)[0]
    srv = CorpusHTTPServer(fix.pages_path, fail_500={url},
                           n_500=99).start()
    try:
        f = HttpFetcher(timeout=5.0, max_retries=2,
                        opener=make_socket_opener(srv.port))
        out = f(_batch([url]))
        assert not out["fetch_ok"][0].as_py()
        assert out["fetch_retryable"][0].as_py()
        assert out["fetch_attempts"][0].as_py() == 3
        assert out["fetch_err"][0].as_py() == "HTTP 500"
        assert srv.hits(url) == 3
    finally:
        srv.stop()


def test_crawl_over_socket_matches_oracle(tmp_path):
    """Full crawl with the fetch stage on a real socket (actor-pool
    HttpFetcher, every round distributed): same visited set, identical
    items, same error set as the serial oracle — upgrading S2/S3 from
    seam-tested to socket-tested.  One url also drops its first
    connection, so the in-crawl retry path crosses the wire too."""
    fix = fixture_corpus(gen_corpus.TINY)
    corpus_urls = sorted(CorpusHTTPServer(fix.pages_path).corpus)
    srv = CorpusHTTPServer(fix.pages_path,
                           reset_once={corpus_urls[3]}).start()
    try:
        ckpt = str(tmp_path / "ckpt")
        cfg = CrawlConfig(
            corpus_path=fix.pages_path, ckpt_dir=ckpt,
            robots_path=fix.robots_path, mode="bfs",
            exact_order=False, min_distributed_rows=0,
            fetcher_cls=HttpFetcher,
            fetcher_kwargs={"timeout": 5.0, "max_retries": 2,
                            "opener": make_socket_opener(srv.port)},
            fetch_concurrency=2,
        )
        eng = CrawlEngine(cfg)
        try:
            eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
        finally:
            eng.close()
        res = run_oracle(fix, mode="bfs")
        vis = read_ckpt(ckpt, "visited")
        assert set(vis["url"].to_pylist()) == {v["url"] for v in res.visited}
        assert items_map(read_ckpt(ckpt, "items")) == oracle_items_map(res)
        assert errors_set(read_ckpt(ckpt, "errors")) == oracle_errors_set(res)
    finally:
        srv.stop()
