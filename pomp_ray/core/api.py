"""User-extension surface mirroring pomp's class-level API (SURVEY.md
section 2.10), re-expressed batch-first.

Reference surface -> ours:

* ``Item`` + ``Field`` (pomp/core/item.py [estimated]) -- declarative
  extracted records whose FIELD DEFINITION ORDER is load-bearing (pomp's
  CsvPipeline writes ``item.values()`` in that order).  Our metaclass
  collects Fields in definition order and derives a fixed pyarrow schema.
* ``BaseCrawler`` (ENTRY_REQUESTS, extract_items, next_requests;
  pomp/core/base.py [estimated]) -- ``CrawlerSpec``: seeds + a batch
  parse hook.  ``RowCrawler`` adapts per-response generator crawlers
  (the literal pomp programming model) into the batch hook.
* ``BaseMiddleware`` (process_request/response/exception) -- ordered
  batch hooks around the fetch stage.
* ``BasePipeline`` (start/process/stop) -- ordered item-batch hooks plus
  sink writers; ``CsvPipeline`` reproduces the contrib CSV sink
  (pomp/contrib/pipelines.py [estimated]) writing fields in definition
  order.
"""

from __future__ import annotations

import csv
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field as dc_field

import pyarrow as pa

from pomp_ray.functions.textfns import (
    html_extract_links,
    html_extract_text,
    html_extract_title,
)

# ----------------------------------------------------------------- Item/Field
_FIELD_COUNTER = 0


class Field:
    """Declarative item field; collected by ItemMeta in definition order
    (pomp/core/item.py metaclass pattern [estimated])."""

    def __init__(self, type: pa.DataType = pa.string()):  # noqa: A002
        global _FIELD_COUNTER
        _FIELD_COUNTER += 1
        self._order = _FIELD_COUNTER
        self.type = type


class ItemMeta(type):
    def __new__(mcls, name, bases, ns):
        cls = super().__new__(mcls, name, bases, ns)
        fields: list[tuple[str, Field]] = []
        for base in reversed(bases):
            fields.extend(getattr(base, "_fields", []))
        own = [(k, v) for k, v in ns.items() if isinstance(v, Field)]
        own.sort(key=lambda kv: kv[1]._order)
        fields.extend(own)
        cls._fields = fields
        cls.schema = pa.schema([(k, f.type) for k, f in fields])
        return cls


class Item(metaclass=ItemMeta):
    """Usage::

        class PageItem(Item):
            url = Field()
            title = Field()

    Instances behave like ordered records: ``values()`` iterates field
    values in definition order (the CSV byte-compat contract)."""

    def __init__(self, **kw):
        for name, _ in self._fields:
            setattr(self, name, kw.get(name))

    def keys(self) -> list[str]:
        return [k for k, _ in self._fields]

    def values(self) -> list:
        return [getattr(self, k) for k, _ in self._fields]

    def to_dict(self) -> dict:
        return dict(zip(self.keys(), self.values()))

    @classmethod
    def table_from(cls, items: list["Item"]) -> pa.Table:
        cols = {k: [getattr(i, k) for i in items] for k, _ in cls._fields}
        return pa.table(cols, schema=cls.schema)


# ---------------------------------------------------------------- CrawlerSpec
@dataclass
class CrawlerSpec:
    """Batch-native crawler definition (the BaseCrawler equivalent)."""

    seeds: list[dict]                        # rows: url, priority, depth
    parse: Callable[[bytes], tuple[str, str, list[str]]] | None = None
    mode: str = "bfs"                        # CRAWL_WIDTH_FIRST / DEPTH_FIRST
    middlewares: list = dc_field(default_factory=list)
    pipelines: list = dc_field(default_factory=list)

    def parse_fn(self):
        from pomp_ray.stages.parse import default_parse
        return self.parse or default_parse


class RowCrawler:
    """Adapter for the literal pomp programming model: subclass with
    ``ENTRY_REQUESTS`` and per-response ``extract_items`` /
    ``next_requests`` generators; ``to_spec()`` wraps them into the batch
    engine.  Compat layer: per-row Python, so slower than a vectorized
    ``CrawlerSpec.parse`` -- fine for porting, not for the hot path."""

    ENTRY_REQUESTS: Iterable[str] | str = ()

    class Response:
        def __init__(self, url: str, body: bytes):
            self.url = url
            self.body = body

    def extract_items(self, response: "RowCrawler.Response"):
        yield {"url": response.url, "title": html_extract_title(response.body),
               "text": html_extract_text(response.body)}

    def next_requests(self, response: "RowCrawler.Response"):
        return html_extract_links(response.body)

    def to_spec(self, mode: str = "bfs") -> CrawlerSpec:
        entry = self.ENTRY_REQUESTS
        if isinstance(entry, str):
            entry = [entry]
        seeds = [{"url": u, "priority": 0, "depth": 0} for u in entry]

        def parse(html: bytes) -> tuple[str, str, list[str]]:
            resp = RowCrawler.Response("", html)
            items = list(self.extract_items(resp))
            links = list(self.next_requests(resp) or [])
            title = items[0].get("title", "") if items else ""
            text = items[0].get("text", "") if items else ""
            return title, text, links

        return CrawlerSpec(seeds=seeds, parse=parse, mode=mode)


# ---------------------------------------------------------------- middlewares
class BaseMiddleware:
    """Batch middleware chain hooks (pomp/core/base.py process_request /
    process_response / process_exception [estimated]).  Each hook takes
    and returns a pyarrow Table; returning a filtered table drops rows
    (pomp's "return None to drop" per-record contract, vectorized)."""

    def process_request_batch(self, batch: pa.Table) -> pa.Table:
        return batch

    def process_response_batch(self, batch: pa.Table) -> pa.Table:
        return batch

    def process_exception_batch(self, batch: pa.Table) -> pa.Table:
        return batch


def apply_middlewares(batch: pa.Table, middlewares, hook: str) -> pa.Table:
    """THE middleware-chain ordering rule (single source -- the engine's
    _mw_hook delegates here): request/response hooks run in chain order,
    the exception hook unwinds in REVERSE chain order like pomp's engine.
    Objects without the hook are skipped (duck-typed middlewares)."""
    chain = (tuple(reversed(tuple(middlewares)))
             if hook == "process_exception_batch" else middlewares)
    for mw in chain:
        fn = getattr(mw, hook, None)
        if fn is not None:
            batch = fn(batch)
    return batch


# ------------------------------------------------------------------ pipelines
class BasePipeline:
    """Item pipeline chain (pomp/core/base.py BasePipeline [estimated]):
    start/stop lifecycle around the crawl, process per item batch."""

    def start(self, crawler) -> None:
        pass

    def process_batch(self, crawler, items: pa.Table) -> pa.Table:
        return items

    def stop(self, crawler) -> None:
        pass


class CsvPipeline(BasePipeline):
    """Contrib CSV sink parity (pomp/contrib/pipelines.py CsvPipeline
    [estimated]): one row per item, field definition order = column
    order, open at start / close at stop."""

    def __init__(self, path: str, columns: list[str] | None = None):
        self.path = path
        self.columns = columns
        self._fh = None
        self._writer = None

    def start(self, crawler) -> None:
        self._fh = open(self.path, "w", newline="")
        self._writer = csv.writer(self._fh)

    def process_batch(self, crawler, items: pa.Table) -> pa.Table:
        cols = self.columns or items.column_names
        data = [items[c].to_pylist() for c in cols]
        for row in zip(*data):
            self._writer.writerow(row)
        return items

    def stop(self, crawler) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None


class ConsolePipeline(BasePipeline):
    """Docs/examples print-pipeline parity (SURVEY.md S7)."""

    def process_batch(self, crawler, items: pa.Table) -> pa.Table:
        for row in items.to_pylist():
            print(row)
        return items
