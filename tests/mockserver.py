"""Local mock HTTP server for the tier-2 downloader tests (pomp
`tests/mockserver.py` parity [estimated], SURVEY.md §5): serves a
generated corpus parquet over a REAL loopback socket so `HttpFetcher`'s
sync and async paths are exercised end-to-end against actual network
I/O, not just injected fakes.

URL mapping: corpus url ``http://site0.test/p/0`` is served at
``GET /site0.test/p/0`` — the opener helpers below rewrite scheme-less
host+path onto ``127.0.0.1:<port>``.

Failure injection (for retry/classification coverage):
* ``fail_500``  — canon urls that answer HTTP 500 on their first
  ``n_500`` hits, then succeed (retryable → in-stage retry succeeds).
* ``reset_once`` — canon urls whose FIRST hit closes the connection
  without a response (RemoteDisconnected / ConnectionResetError →
  retryable), succeeding afterwards.
* urls absent from the corpus answer HTTP 404 (permanent).

Hit counting is server-global and thread-safe, so a retry from any
worker process sees the post-failure behavior.
"""

from __future__ import annotations

import http.server
import threading

import pyarrow.parquet as pq

from pomp_ray.functions.textfns import url_canonicalize


class _Handler(http.server.BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.0"

    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):
        owner: CorpusHTTPServer = self.server.owner  # type: ignore[attr-defined]
        url = "http://" + self.path.lstrip("/")
        n = owner.record_hit(url)
        if url in owner.reset_once and n <= 1:
            # drop the connection without any response bytes: the client
            # sees RemoteDisconnected (a ConnectionResetError subclass)
            self.close_connection = True
            return
        if url in owner.fail_500 and n <= owner.n_500:
            self.send_error(500, "injected transient failure")
            return
        body = owner.corpus.get(url)
        if body is None:
            self.send_error(404, "not in corpus")
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


class CorpusHTTPServer:
    """Threaded stdlib HTTP server over a corpus parquet; bind with
    ``start()`` (ephemeral port), always ``stop()`` in a finally."""

    def __init__(self, pages_path: str, fail_500: set[str] | None = None,
                 reset_once: set[str] | None = None, n_500: int = 1):
        t = pq.read_table(pages_path, columns=["url", "html"])
        self.corpus: dict[str, bytes] = {
            url_canonicalize(u): h
            for u, h in zip(t["url"].to_pylist(), t["html"].to_pylist())
        }
        self.fail_500 = set(fail_500 or ())
        self.reset_once = set(reset_once or ())
        self.n_500 = n_500
        self._hits: dict[str, int] = {}
        self._lock = threading.Lock()
        self._srv: http.server.ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def record_hit(self, url: str) -> int:
        with self._lock:
            self._hits[url] = self._hits.get(url, 0) + 1
            return self._hits[url]

    def hits(self, url: str) -> int:
        with self._lock:
            return self._hits.get(url, 0)

    @property
    def port(self) -> int:
        assert self._srv is not None, "server not started"
        return self._srv.server_address[1]

    def start(self) -> "CorpusHTTPServer":
        self._srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0),
                                                    _Handler)
        self._srv.owner = self  # type: ignore[attr-defined]
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._srv is not None:
            self._srv.shutdown()
            self._srv.server_close()
            self._srv = None


def make_socket_opener(port: int):
    """Sync opener for ``HttpFetcher(opener=...)``: rewrites the corpus
    url onto the loopback server and performs a REAL urllib fetch.
    Picklable-by-cloudpickle (captures only the port int), so it ships
    into actor-pool fetch stages."""

    def opener(url: str, timeout: float) -> bytes:
        import urllib.request
        host_path = url.split("://", 1)[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/{host_path}",
                timeout=timeout) as r:
            return r.read()

    return opener


def make_async_socket_opener(port: int):
    """Async opener for ``HttpFetcher(async_opener=...)``: a raw
    asyncio-streams HTTP/1.0 GET against the loopback server (stdlib
    only — no aiohttp in the sandbox).  Raises ``urllib.error.HTTPError``
    for non-200 answers and ``ConnectionResetError`` when the server
    drops the connection, matching ``HttpFetcher._classify``'s
    retryable/permanent split."""

    async def async_opener(url: str, timeout: float) -> bytes:
        import asyncio
        import urllib.error
        host_path = url.split("://", 1)[1]
        reader, writer = await asyncio.wait_for(
            asyncio.open_connection("127.0.0.1", port), timeout)
        try:
            writer.write((f"GET /{host_path} HTTP/1.0\r\n"
                          f"Host: 127.0.0.1\r\n\r\n").encode())
            await writer.drain()
            raw = await asyncio.wait_for(reader.read(), timeout)
        finally:
            writer.close()
        if not raw:
            raise ConnectionResetError("server closed connection")
        head, _, body = raw.partition(b"\r\n\r\n")
        status = int(head.split(b" ", 2)[1])
        if status != 200:
            raise urllib.error.HTTPError(url, status, "mockserver", None,
                                         None)
        return body

    return async_opener
