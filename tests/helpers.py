"""Shared fixtures/helpers for the conformance suite."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from pomp_ray.core.oracle import OracleResult, crawl_oracle
from pomp_ray.functions.textfns import url_canonicalize
from pomp_ray.sources import gen_corpus


def fixture_corpus(profile=gen_corpus.TINY, base="/tmp/pomp_fixtures"):
    out = os.path.join(base, profile.key())
    return gen_corpus.generate(out, profile)


def oracle_inputs(fix):
    pages = pq.read_table(fix.pages_path)
    corpus = {
        url_canonicalize(u): h
        for u, h in zip(pages["url"].to_pylist(), pages["html"].to_pylist())
    }
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    robots = pq.read_table(fix.robots_path).to_pylist()
    return corpus, seeds, robots, pages


def run_oracle(fix, **kw) -> OracleResult:
    corpus, seeds, robots, _ = oracle_inputs(fix)
    return crawl_oracle(corpus, seeds, robots, **kw)


def read_ckpt(ckpt_dir: str, kind: str) -> pa.Table:
    from pomp_ray.crawl import read_errors, read_items, read_visited
    return {"items": read_items, "visited": read_visited,
            "errors": read_errors}[kind](ckpt_dir)


def visited_tuples(t: pa.Table) -> list[tuple]:
    rows = sorted(
        zip(t["round"].to_pylist(), t["seq"].to_pylist(), t["url"].to_pylist(),
            t["depth"].to_pylist())
    )
    return [(u, r, d, s) for r, s, u, d in rows]


def oracle_visited_tuples(res: OracleResult) -> list[tuple]:
    rows = sorted((v["round"], v["seq"], v["url"], v["depth"]) for v in res.visited)
    return [(u, r, d, s) for r, s, u, d in rows]


def items_map(t: pa.Table) -> dict:
    return {
        u: (ti, te, n)
        for u, ti, te, n in zip(
            t["url"].to_pylist(), t["title"].to_pylist(),
            t["text"].to_pylist(), t["n_links"].to_pylist())
    }


def oracle_items_map(res: OracleResult) -> dict:
    return {i["url"]: (i["title"], i["text"], i["n_links"]) for i in res.items}


def errors_set(t: pa.Table | None) -> set:
    if t is None:
        return set()
    return set(zip(t["url"].to_pylist(), t["stage"].to_pylist()))


def oracle_errors_set(res: OracleResult) -> set:
    return {(e["url"], e["stage"]) for e in res.errors}
