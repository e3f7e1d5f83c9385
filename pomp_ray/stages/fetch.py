"""The fetch stage: ``map_batches`` over the frontier against the corpus.

In the reference, fetching is live I/O -- ``UrllibDownloader.get()`` calls
``urllib.request.urlopen`` per request (pomp/contrib/urllibtools.py
~L75-130 [estimated]) and ``ConcurrentDownloader`` runs the same through a
``concurrent.futures`` pool (pomp/contrib/concurrenttools.py [estimated]).
This sandbox has no network, so "fetch" is a LOOKUP against the Parquet
pages corpus: semantically a left join frontier JOIN pages ON canon_url
(SURVEY.md J1).  Misses become fetch errors, exactly like a 404/timeout
flowing through pomp's ``process_exception`` middleware hook.

Three implementations, smallest broadcast to largest shuffle:

* ``CorpusIndex`` + ``make_fetch_fn`` -- the default: the driver builds a
  url-hash -> row index ONCE (sorted uint64 arrays + the html column),
  ``ray.put``s it, and fetch runs as STATELESS tasks that ``ray.get`` the
  refs (zero-copy for numpy/Arrow from the object store -- nothing is
  re-shipped per batch or per round).  This is the broadcast-small-side
  join pattern.
* ``CorpusFetcher`` -- classic actor-pool form (pomp's
  ConcurrentDownloader analog): each actor loads the corpus in
  ``__init__``.  Used where a long-lived stateful downloader is wanted
  (e.g. a real HTTP fetcher with sessions/politeness timers).
* ``fetch_via_join`` -- the all-large path using Ray Data's
  hash-partitioned ``Dataset.join`` (both sides shuffle once); the 100 TB
  corpus path when no broadcast fits.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from pomp_ray.functions.textfns import url_canonicalize, url_join


def _url_hash2(urls: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per url (md5 halves).  128 bits total
    keeps collision odds negligible at 10^10-url scale."""
    h1 = np.empty(len(urls), np.uint64)
    h2 = np.empty(len(urls), np.uint64)
    for i, u in enumerate(urls):
        d = hashlib.md5(u.encode("utf-8", "surrogateescape")).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:16], "little")
    return h1, h2


@dataclass
class CorpusIndex:
    """Driver-held corpus lookup: sorted url-hash arrays + html payloads.
    ``refs`` ships it to workers through the object store exactly once."""

    h1_sorted: np.ndarray      # uint64, sorted
    h2_sorted: np.ndarray      # uint64, aligned with h1_sorted
    row_sorted: np.ndarray     # int64 row index into htmls, aligned
    htmls: pa.ChunkedArray

    @classmethod
    def build(cls, pages_path: str) -> "CorpusIndex":
        t = pq.read_table(pages_path, columns=["url", "html"])
        canon = [url_canonicalize(u) for u in t["url"].to_pylist()]
        h1, h2 = _url_hash2(canon)
        order = np.argsort(h1, kind="stable")
        # large_binary: 64-bit offsets -- a multi-million-page corpus's
        # html column exceeds the 2 GiB 32-bit-offset limit and plain
        # combine_chunks dies with "offset overflow" (found by the 3M-page
        # scale-stress run)
        return cls(
            h1_sorted=h1[order],
            h2_sorted=h2[order],
            row_sorted=order.astype(np.int64),
            htmls=pc.cast(t["html"],
                          pa.large_binary()).combine_chunks(),
        )

    def put(self) -> "CorpusIndexRefs":
        return CorpusIndexRefs(
            h1=ray.put(self.h1_sorted),
            h2=ray.put(self.h2_sorted),
            row=ray.put(self.row_sorted),
            htmls=ray.put(self.htmls),
        )

    def lookup_rows(self, canon_urls: list[str]) -> np.ndarray:
        """Row index per url, -1 for miss."""
        return _lookup(self.h1_sorted, self.h2_sorted, self.row_sorted,
                       canon_urls)

    def fetch_table(self, batch: pa.Table) -> pa.Table:
        fetched = _attach_html(batch, self.lookup_rows(
            batch["canon_url"].to_pylist()), self.htmls)
        return resolve_redirects_table(
            fetched, index_lookup_html(self.lookup_rows, self.htmls))


@dataclass
class CorpusIndexRefs:
    h1: ray.ObjectRef
    h2: ray.ObjectRef
    row: ray.ObjectRef
    htmls: ray.ObjectRef


def _lookup(h1s: np.ndarray, h2s: np.ndarray, rows: np.ndarray,
            canon_urls: list[str]) -> np.ndarray:
    q1, q2 = _url_hash2(canon_urls)
    pos = np.searchsorted(h1s, q1)
    out = np.full(len(canon_urls), -1, np.int64)
    n = len(h1s)
    for i in range(len(canon_urls)):
        p = pos[i]
        # walk h1 ties (rare) verifying the second hash
        while p < n and h1s[p] == q1[i]:
            if h2s[p] == q2[i]:
                out[i] = rows[p]
                break
            p += 1
    return out


def _attach_html(batch: pa.Table, rows: np.ndarray,
                 htmls: pa.ChunkedArray) -> pa.Table:
    take = pa.array(
        [int(r) if r >= 0 else None for r in rows], pa.int64()
    )
    html = pc.take(htmls, take)
    batch = batch.append_column("html", html)
    return batch.append_column("fetch_ok", pc.is_valid(html))


# ------------------------------------------------------------- redirects
# A corpus page whose html starts with this marker is an HTTP-redirect
# stand-in (the meta-refresh form real crawls see); fetch follows the
# chain up to MAX_REDIRECTS hops.  Semantics (mirrored in
# core/oracle.py): visited/items record the ORIGINAL url; title/text/
# links come from the FINAL page; links resolve against the FINAL url
# (browser base semantics); a mid-chain miss or a chain longer than
# MAX_REDIRECTS (incl. loops) is a fetch miss.  ``fetch_via_join``
# resolves the (rare) redirect subset with filtered parquet point reads
# per hop instead of extra join rounds (see make_parquet_lookup_html).
REDIRECT_PREFIX = b'<html><head><meta http-equiv="refresh" content="0;url='
MAX_REDIRECTS = 3


def redirect_target(html) -> str | None:
    """Target url if ``html`` is a redirect stand-in page, else None."""
    if html is None or not html.startswith(REDIRECT_PREFIX):
        return None
    rest = html[len(REDIRECT_PREFIX):]
    end = rest.find(b'"')
    if end < 0:
        return None
    return rest[:end].decode("utf-8", "replace")


def resolve_redirect_chain(html, base: str, lookup_rows, htmls,
                           max_redirects: int = MAX_REDIRECTS):
    """Serial per-row resolution: (final_html | None, final_base)."""
    for _ in range(max_redirects):
        t = redirect_target(html)
        if t is None:
            return html, base
        tgt = url_canonicalize(url_join(base, t))
        r = int(lookup_rows([tgt])[0])
        if r < 0:
            return None, base
        html, base = htmls[int(r)].as_py(), tgt
    return (None, base) if redirect_target(html) is not None \
        else (html, base)


def index_lookup_html(lookup_rows, htmls):
    """``lookup_html`` adapter over a broadcast/driver CorpusIndex:
    canonical urls -> list[bytes | None]."""

    def f(urls: list[str]) -> list:
        rows = lookup_rows(urls)
        return [htmls[int(r)].as_py() if r >= 0 else None for r in rows]

    return f


def make_parquet_lookup_html(pages_path: str):
    """``lookup_html`` adapter for the join-fetch path: resolve the
    (rare) redirect targets with ONE filtered parquet read per hop --
    O(redirect-rows) point lookups instead of another corpus-wide join
    round.  Scale assumption (documented in fetch_via_join): the corpus
    stores urls in CANONICAL form (true for all generated corpora; the
    natural layout at 100 TB, where url-sorted row groups make the
    ``url IN (...)`` filter a row-group-pruned point read)."""

    def f(urls: list[str]) -> list:
        want = sorted(set(urls))
        tbl = pq.read_table(pages_path, columns=["url", "html"],
                            filters=[("url", "in", want)])
        d = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
        return [d.get(u) for u in urls]

    return f


def resolve_redirects_table(batch: pa.Table, lookup_html,
                            max_redirects: int = MAX_REDIRECTS) -> pa.Table:
    """Vectorized-path resolution over a fetched batch (html/fetch_ok
    present): follows chains for the (rare) redirect subset only, then
    rebuilds html/fetch_ok and appends ``base_url`` -- the final url the
    parse stage resolves links against.  Redirect-free batches are
    zero-copy: one Arrow prefix scan gates the python path."""
    any_redir = pc.sum(pc.fill_null(pc.starts_with(
        batch["html"], pattern=REDIRECT_PREFIX.decode()), False))
    if int(any_redir.as_py() or 0) == 0:
        return batch.append_column("base_url", batch["canon_url"])
    html_list = batch["html"].to_pylist()
    base = batch["canon_url"].to_pylist()
    for _ in range(max_redirects):
        pend = [i for i in range(len(html_list))
                if redirect_target(html_list[i]) is not None]
        if not pend:
            break
        targets = [url_canonicalize(url_join(
            base[i], redirect_target(html_list[i]))) for i in pend]
        found = lookup_html(targets)
        for i, tgt, h in zip(pend, targets, found):
            if h is not None:
                html_list[i] = h
                base[i] = tgt
            else:
                html_list[i] = None
    for i in range(len(html_list)):
        if redirect_target(html_list[i]) is not None:
            html_list[i] = None
    names = batch.column_names
    out = batch.set_column(names.index("html"), "html",
                           pa.array(html_list, pa.binary()))
    out = out.set_column(names.index("fetch_ok"), "fetch_ok",
                         pa.array([h is not None for h in html_list],
                                  pa.bool_()))
    return out.append_column("base_url", pa.array(base, pa.string()))


def make_fetch_fn(refs: CorpusIndexRefs):
    """Stateless-task fetch: each task gets the broadcast index zero-copy."""

    def fetch(batch: pa.Table) -> pa.Table:
        h1s = ray.get(refs.h1)
        h2s = ray.get(refs.h2)
        rows = ray.get(refs.row)
        htmls = ray.get(refs.htmls)
        found = _lookup(h1s, h2s, rows, batch["canon_url"].to_pylist())
        fetched = _attach_html(batch, found, htmls)
        return resolve_redirects_table(fetched, index_lookup_html(
            lambda urls: _lookup(h1s, h2s, rows, urls), htmls))

    return fetch


class CorpusFetcher:
    """Callable-class for ``map_batches(..., concurrency=N)``: the stateful
    downloader worker (SURVEY.md T1).  The index is built once per actor;
    ``__call__`` is a vectorized lookup per batch."""

    def __init__(self, pages_path: str):
        self.index = CorpusIndex.build(pages_path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.index.fetch_table(batch)


class HttpFetcher:
    """Real-network downloader worker, pomp ``UrllibDownloader`` semantics
    (pomp/contrib/urllibtools.py ~L75-130 [estimated]): one
    ``urllib.request.urlopen(url, timeout=t)`` per url, with IN-STAGE
    retries and retryable-error classification:

    * timeouts / connection errors / HTTP 5xx  -> retryable (retried up to
      ``max_retries`` inside the stage; if exhausted the row is emitted
      with ``fetch_ok=False, fetch_retryable=True``)
    * HTTP 4xx / malformed urls                -> permanent
      (``fetch_retryable=False``), exactly a pomp ``process_exception``
      flow -- errors ride in-band, never raise.

    Use as an actor-pool stage: ``map_batches(HttpFetcher,
    fn_constructor_kwargs=..., concurrency=N)``; the opener (and any
    session state) lives once per actor.  The sandbox has no network, so
    tests inject a fake ``opener`` callable -- the classification/retry
    logic is the contract under test.

    Optional TIME-BASED crawl-delay pacing (``crawl_delay``: host ->
    seconds, or a float applied to every host): consecutive requests to
    the same host within this worker wait out the remaining interval
    (monotonic clock, injectable for tests).  This is per-worker pacing
    -- the per-round politeness caps bound the GLOBAL per-host rate
    (cap = round_budget / delay), and in-worker pacing spaces the
    requests inside the round; a stricter global spacing would need a
    per-host token actor, which the round-synchronous budget model makes
    redundant.
    """

    def __init__(self, timeout: float = 10.0, max_retries: int = 2,
                 opener=None, crawl_delay=None, clock=None, sleep=None,
                 async_opener=None, max_concurrency: int = 8):
        self.timeout = timeout
        self.max_retries = max_retries
        self.crawl_delay = crawl_delay
        import time as _time
        self.clock = clock or _time.monotonic
        self.sleep = sleep or _time.sleep
        self._last_fetch: dict[str, float] = {}
        # Async seam (pomp AiohttpDownloader / TwistedDownloader parity,
        # SURVEY.md S4/S5): an ``async def async_opener(url, timeout)``
        # coroutine runs the batch through one event loop per call with
        # at most ``max_concurrency`` fetches in flight (bounded
        # semaphore) -- in-actor I/O concurrency on top of the actor
        # pool's process concurrency.  Retry/classification semantics
        # are IDENTICAL to the sync path (_classify is shared).
        self.async_opener = async_opener
        self.max_concurrency = max_concurrency
        if opener is None:
            import urllib.request

            def opener(url, timeout):
                with urllib.request.urlopen(url, timeout=timeout) as r:
                    return r.read()
        self.opener = opener

    def _delay_for(self, host: str) -> float:
        if self.crawl_delay is None:
            return 0.0
        if isinstance(self.crawl_delay, dict):
            return float(self.crawl_delay.get(host, 0.0))
        return float(self.crawl_delay)

    def _pace(self, url: str) -> None:
        from pomp_ray.functions.textfns import url_host
        host = url_host(url)
        d = self._delay_for(host)
        if d <= 0:
            return
        last = self._last_fetch.get(host)
        if last is not None:
            wait = d - (self.clock() - last)
            if wait > 0:
                self.sleep(wait)
        self._last_fetch[host] = self.clock()

    def _classify(self, exc: Exception) -> tuple[str, bool]:
        """(message, retryable) for an opener exception.  URLError is NOT
        uniformly retryable: name-resolution failures (NXDOMAIN), malformed
        urls / unknown schemes (ValueError or plain-string reasons) are
        PERMANENT -- retrying them burns max_retries per fetch and, worse,
        labels them fetch_retryable=True, which a re-enqueue policy keyed
        on that column would retry forever.  Only transient transport
        reasons (timeouts, connection drops, other OS-level errno) stay
        retryable."""
        import socket
        import urllib.error
        if isinstance(exc, urllib.error.HTTPError):
            return f"HTTP {exc.code}", 500 <= exc.code < 600
        if isinstance(exc, (TimeoutError, ConnectionError)):
            return type(exc).__name__, True
        if isinstance(exc, urllib.error.URLError):
            r = exc.reason
            permanent = (isinstance(r, (socket.gaierror, ValueError))
                         or not isinstance(r, OSError))
            return f"URLError: {r}", not permanent
        return f"{type(exc).__name__}: {exc}", False

    def fetch_one(self, url: str) -> tuple[bytes | None, str, bool, int]:
        """(html, message, retryable, attempts)."""
        self._pace(url)
        attempts = 0
        while True:
            attempts += 1
            try:
                return self.opener(url, self.timeout), "", False, attempts
            except Exception as exc:   # in-band errors, never raise
                msg, retryable = self._classify(exc)
                if not retryable or attempts > self.max_retries:
                    return None, msg, retryable, attempts

    async def _fetch_one_async(self, url: str):
        """Async mirror of fetch_one: same in-stage retry loop, same
        _classify semantics; no time-based pacing (the bounded semaphore
        is the in-actor rate control; per-round politeness caps bound
        the global per-host rate)."""
        attempts = 0
        while True:
            attempts += 1
            try:
                html = await self.async_opener(url, self.timeout)
                return html, "", False, attempts
            except Exception as exc:   # in-band errors, never raise
                msg, retryable = self._classify(exc)
                if not retryable or attempts > self.max_retries:
                    return None, msg, retryable, attempts

    def _fetch_batch_async(self, urls: list[str]) -> list[tuple]:
        import asyncio

        async def run_all():
            sem = asyncio.Semaphore(self.max_concurrency)

            async def one(u):
                async with sem:
                    return await self._fetch_one_async(u)

            return await asyncio.gather(*(one(u) for u in urls))

        return asyncio.run(run_all())

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["canon_url"].to_pylist()
        if self.async_opener is not None:
            results = self._fetch_batch_async(urls)
            htmls = [r[0] for r in results]
            msgs = [r[1] for r in results]
            retry = [r[2] for r in results]
            att = [r[3] for r in results]
        else:
            htmls, msgs, retry, att = [], [], [], []
            for u in urls:
                h, m, r, a = self.fetch_one(u)
                htmls.append(h); msgs.append(m); retry.append(r); att.append(a)
        batch = batch.append_column("html", pa.array(htmls, pa.binary()))
        batch = batch.append_column(
            "fetch_ok", pa.array([h is not None for h in htmls], pa.bool_()))
        batch = batch.append_column("fetch_err", pa.array(msgs, pa.string()))
        batch = batch.append_column("fetch_retryable",
                                    pa.array(retry, pa.bool_()))
        return batch.append_column("fetch_attempts",
                                   pa.array(att, pa.int32()))


class FlakyCorpusFetcher(HttpFetcher):
    """Test double wiring HttpFetcher's retry/classification machinery to
    the corpus lookup: every url's FIRST attempt (per actor) raises a
    retryable TimeoutError, the retry succeeds; urls missing from the
    corpus raise HTTP 404 (permanent).  Lets a crawl exercise the
    timeout->retry->success path and the retryable error column without
    any network."""

    def __init__(self, pages_path: str, timeout: float = 10.0,
                 max_retries: int = 2):
        self.index = CorpusIndex.build(pages_path)
        self._seen_once: set[str] = set()

        def opener(url, timeout):
            import urllib.error
            if url not in self._seen_once:
                self._seen_once.add(url)
                raise TimeoutError("first attempt always times out")
            row = self.index.lookup_rows([url])[0]
            if row < 0:
                raise urllib.error.HTTPError(url, 404, "not in corpus",
                                             None, None)
            return self.index.htmls[int(row)].as_py()

        super().__init__(timeout=timeout, max_retries=max_retries,
                         opener=opener)


class AsyncFlakyCorpusFetcher(HttpFetcher):
    """Async test double (no network in the sandbox): an ``async_opener``
    backed by the corpus lookup that yields to the event loop, times out
    every url's FIRST attempt (per actor), 404s corpus misses, and
    records the max number of fetches in flight -- lets a crawl exercise
    the async seam's bounded concurrency + retry classification
    end-to-end.  The in-flight high-water mark rides back in-band as the
    ``fetch_attempts`` sign bit would be ugly, so it is exposed via the
    ``max_inflight`` attribute checked by a direct-call pytest."""

    def __init__(self, pages_path: str, timeout: float = 10.0,
                 max_retries: int = 2, max_concurrency: int = 8):
        self.index = CorpusIndex.build(pages_path)
        self._seen_once: set[str] = set()
        self._inflight = 0
        self.max_inflight = 0

        async def async_opener(url, timeout):
            import asyncio
            import urllib.error
            self._inflight += 1
            self.max_inflight = max(self.max_inflight, self._inflight)
            try:
                await asyncio.sleep(0.001)   # real suspension point
                if url not in self._seen_once:
                    self._seen_once.add(url)
                    raise TimeoutError("first attempt always times out")
                row = self.index.lookup_rows([url])[0]
                if row < 0:
                    raise urllib.error.HTTPError(url, 404, "not in corpus",
                                                 None, None)
                return self.index.htmls[int(row)].as_py()
            finally:
                self._inflight -= 1

        super().__init__(timeout=timeout, max_retries=max_retries,
                         async_opener=async_opener,
                         max_concurrency=max_concurrency)


def canon_pages_batch(t: pa.Table) -> pa.Table:
    """(url, html) corpus batch -> (canon_url, html).  Vectorized fast
    path: urls already in canonical shape are identity (one Arrow regex
    match for the whole batch); only the residue pays the per-row
    library call.  Shared by the join-fetch path and the link-graph
    reconstruction in pipelines/graph.py."""
    from pomp_ray.stages.enqueue import _FAST_EXTRACT
    urls = t["url"]
    fast = pc.is_valid(pc.extract_regex(urls, pattern=_FAST_EXTRACT))
    if int(pc.sum(fast).as_py() or 0) == t.num_rows:
        canon = pc.cast(urls, pa.string())
    else:
        fast_py = fast.to_pylist()
        canon = pa.array(
            [u if ok else url_canonicalize(u)
             for u, ok in zip(urls.to_pylist(), fast_py)])
    return pa.table({"canon_url": canon, "html": t["html"]})


def fetch_via_join(frontier: rd.Dataset, pages_path: str,
                   num_partitions: int = 64) -> rd.Dataset:
    """Scale path: hash-join the frontier against the pages corpus on the
    canonical url.  Left join keeps misses (null html -> fetch_ok False),
    the same error semantics as the lookup paths.  Redirect chains are
    followed per batch with filtered parquet point reads (at most
    MAX_REDIRECTS reads per batch, each over the batch's redirect rows
    only) -- a hop never re-shuffles the corpus, and redirect-free
    batches pay one Arrow prefix scan."""

    def finish(t: pa.Table) -> pa.Table:
        fetched = t.append_column("fetch_ok", pc.is_valid(t["html"]))
        return resolve_redirects_table(
            fetched, make_parquet_lookup_html(pages_path))

    pages = rd.read_parquet(pages_path, columns=["url", "html"]).map_batches(
        canon_pages_batch, batch_format="pyarrow"
    )
    joined = frontier.join(
        pages,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("canon_url",),
    )
    return joined.map_batches(finish, batch_format="pyarrow")
