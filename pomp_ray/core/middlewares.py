"""Ready-made middleware implementations (the contrib-middleware layer;
pomp ships e.g. UrllibAdapterMiddleware and statistics middleware as
contrib -- SURVEY.md M7/T5).  These are package-level classes so they
pickle by reference into Ray workers."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pomp_ray.core.api import BaseMiddleware


class HostFilterMiddleware(BaseMiddleware):
    """process_request: drop requests to the given hosts (the vectorized
    form of pomp's 'return None to drop' request middleware)."""

    def __init__(self, deny_hosts: set[str] | None = None,
                 allow_hosts: set[str] | None = None):
        self.deny = set(deny_hosts or ())
        self.allow = set(allow_hosts) if allow_hosts else None

    def process_request_batch(self, batch: pa.Table) -> pa.Table:
        hosts = batch["host"].to_pylist()
        keep = [
            (h not in self.deny) and (self.allow is None or h in self.allow)
            for h in hosts
        ]
        return batch.filter(pa.array(keep, pa.bool_()))


class DepthLimitMiddleware(BaseMiddleware):
    """process_request: drop requests beyond a depth limit."""

    def __init__(self, max_depth: int):
        self.max_depth = max_depth

    def process_request_batch(self, batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch["depth"], self.max_depth))


class BodyTagMiddleware(BaseMiddleware):
    """process_response: prefix fetched titles (a visible body transform
    used by the middleware-order tests)."""

    def __init__(self, tag: bytes = b"MW "):
        self.tag = tag

    def process_response_batch(self, batch: pa.Table) -> pa.Table:
        htmls = [
            h.replace(b"<title>", b"<title>" + self.tag) if h is not None else None
            for h in batch["html"].to_pylist()
        ]
        i = batch.column_names.index("html")
        return batch.set_column(i, "html", pa.array(htmls, pa.binary()))


class RequestCounterMiddleware(BaseMiddleware):
    """Statistics middleware (docs pattern, SURVEY.md T5): counts rows
    seen at each hook.  NOTE: counters are per-worker-copy when run
    distributed; authoritative crawl metrics come from the engine's
    per-round metrics parquet -- this exists for pomp API parity and for
    driver-path use."""

    def __init__(self):
        self.n_requests = 0
        self.n_responses = 0

    def process_request_batch(self, batch: pa.Table) -> pa.Table:
        self.n_requests += batch.num_rows
        return batch

    def process_response_batch(self, batch: pa.Table) -> pa.Table:
        self.n_responses += batch.num_rows
        return batch


class ErrorTagMiddleware(BaseMiddleware):
    """Exception-hook middleware (SURVEY.md M6): appends a tag to every
    error row's message.  Chains unwind in reverse order, so middlewares
    (ErrorTagMiddleware('a'), ErrorTagMiddleware('b')) append '|b|a'."""

    def __init__(self, tag: str):
        self.tag = tag

    def process_exception_batch(self, batch: pa.Table) -> pa.Table:
        msg = [f"{m}|{self.tag}" for m in batch["message"].to_pylist()]
        i = batch.column_names.index("message")
        return batch.set_column(i, "message", pa.array(msg, pa.string()))
