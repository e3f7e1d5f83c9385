"""End-to-end composite: crawl checkpoint -> cleaned, deduplicated,
lang-partitioned training corpus, checked against an independent pandas
recomputation from the same checkpoint."""

import glob
import os

import pyarrow.parquet as pq

from pomp_ray.crawl import CrawlConfig, read_items, run_crawl
from pomp_ray.functions import analysis as an
from pomp_ray.pipelines.corpus_from_crawl import corpus_from_crawl
from pomp_ray.sources import gen_corpus
from tests.helpers import fixture_corpus


def test_corpus_from_crawl(tmp_path):
    fix = fixture_corpus(gen_corpus.TINY)
    seeds = pq.read_table(fix.seeds_path).to_pylist()
    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs",
                      exact_order=False, min_distributed_rows=64,
                      n_seen_shards=2)
    run_crawl(cfg, seeds=seeds)

    out = str(tmp_path / "corpus")
    counts = corpus_from_crawl(ckpt, out, min_words=1)

    # independent recompute: quality gate (>=1 word), min-url survivor
    # per distinct text, per-lang counts
    items = read_items(ckpt).to_pandas()
    items = items[items["text"].fillna("").str.strip() != ""]
    survivors = items.groupby("text", as_index=False)["url"].min()
    expect = {}
    for _, r in survivors.iterrows():
        lang = an.lang_id(r["text"])
        expect[lang] = expect.get(lang, 0) + 1
    assert counts == expect

    files = glob.glob(os.path.join(out, "pred_lang=*", "*.parquet"))
    assert files
    # no duplicate texts survive anywhere in the output
    texts = []
    for p in files:
        texts += pq.read_table(p, columns=["clean_text"])["clean_text"].to_pylist()
    assert len(texts) == len(set(texts)) == sum(counts.values())
