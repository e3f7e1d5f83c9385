"""Middleware chain + CrawlerSpec + pipeline lifecycle, wired through the
engine (pomp's test_middleware / pipeline-ordering coverage, SURVEY.md
M4-M8)."""

import pyarrow as pa
import pyarrow.parquet as pq

from pomp_ray.core.api import BasePipeline, CrawlerSpec
from pomp_ray.core.middlewares import (
    BodyTagMiddleware,
    ErrorTagMiddleware,
    HostFilterMiddleware,
)
from pomp_ray.crawl import (
    CrawlConfig,
    crawl_spec,
    read_items,
    run_crawl,
    run_pipelines,
)
from pomp_ray.sources import gen_corpus
from tests.helpers import fixture_corpus, run_oracle


DropSite1Requests = lambda: HostFilterMiddleware(deny_hosts={"site1.test"})  # noqa: E731
TagResponses = BodyTagMiddleware


class CountingPipeline(BasePipeline):
    def __init__(self):
        self.started = False
        self.stopped = False
        self.n = 0

    def start(self, crawler):
        self.started = True

    def process_batch(self, crawler, items):
        self.n += items.num_rows
        return items

    def stop(self, crawler):
        self.stopped = True


def _cfg(fix, ckpt, **kw):
    return CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                       robots_path=fix.robots_path, **kw)


def test_request_middleware_drops_host(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "c")
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    run_crawl(_cfg(fix, ckpt, middlewares=(DropSite1Requests(),)),
              seeds=seeds)
    items = read_items(ckpt)
    hosts = {u.split("/")[2] for u in items["url"].to_pylist()}
    assert "site1.test" not in hosts
    assert "site0.test" in hosts


def test_request_middleware_distributed(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "c")
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    run_crawl(_cfg(fix, ckpt, middlewares=(DropSite1Requests(),),
                   min_distributed_rows=0), seeds=seeds)
    hosts = {u.split("/")[2] for u in read_items(ckpt)["url"].to_pylist()}
    assert "site1.test" not in hosts


def test_response_middleware_transforms(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "c")
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    run_crawl(_cfg(fix, ckpt, middlewares=(TagResponses(),)), seeds=seeds)
    items = read_items(ckpt)
    assert all(t.startswith("MW ") for t in items["title"].to_pylist())


def test_crawl_spec_with_pipeline(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    pipe = CountingPipeline()
    spec = CrawlerSpec(seeds=seeds, mode="bfs", pipelines=[pipe])
    s = crawl_spec(spec, fix.pages_path, str(tmp_path / "c"),
                   robots_path=fix.robots_path)
    res = run_oracle(fix, mode="bfs")
    assert s.n_items == len(res.items)
    assert pipe.started and pipe.stopped
    assert pipe.n == len(res.items)


def test_run_pipelines_filtering(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    ckpt = str(tmp_path / "c")
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    run_crawl(_cfg(fix, ckpt), seeds=seeds)

    class DropAll(BasePipeline):
        def process_batch(self, crawler, items):
            return items.slice(0, 0)

    after = CountingPipeline()
    n = run_pipelines(ckpt, [DropAll(), after])
    assert n == 0
    assert after.n == 0   # chain short-circuits on empty batch
    assert after.started and after.stopped



def test_exception_middleware_fires_both_paths(tmp_path):
    """process_exception_batch must fire on fetch-miss errors on BOTH
    hybrid paths, unwinding in REVERSE chain order (pomp's engine
    semantics): chain (a, b) must append '|b|a'."""
    from pomp_ray.crawl import read_errors

    fix = fixture_corpus(gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    for name, min_rows in (("driver", 10**6), ("exact", 0)):
        ckpt = str(tmp_path / name)
        run_crawl(_cfg(fix, ckpt, min_distributed_rows=min_rows,
                       middlewares=(ErrorTagMiddleware("a"),
                                    ErrorTagMiddleware("b"))),
                  seeds=seeds)
        errs = read_errors(ckpt)
        fetch_msgs = [m for m, s in zip(errs["message"].to_pylist(),
                                        errs["stage"].to_pylist())
                      if s == "fetch"]
        assert fetch_msgs, name
        assert all(m.endswith("|b|a") for m in fetch_msgs), (name, fetch_msgs)
