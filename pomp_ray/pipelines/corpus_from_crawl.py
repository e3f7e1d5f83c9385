"""The end-to-end shipping pipeline: a finished CRAWL CHECKPOINT in,
a cleaned, deduplicated, language-partitioned TRAINING CORPUS out.

This is the composition a user of the reference framework ultimately
runs (crawl -> extract -> filter -> dedup -> export), expressed as one
streaming Dataset chain over the crawl's items files:

    items_dataset(ckpt)                  # streaming reader, no driver copy
      -> lang_id_batch                   # vectorized stopword vote
      -> quality gate                    # Arrow regex counters
      -> content-hash dedup (semi-join)  # min-url survivor per distinct text
      -> whitespace normalize            # Arrow kernels
      -> write_parquet(partition_cols=["pred_lang"])   # resumable layout

Every stage is a map_batches / groupby / join over Arrow blocks; nothing
is ever collected on the driver except the final per-partition metadata
counts.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Min

from pomp_ray.functions import analysis as an

_WS_RE = r"\s+"


def corpus_from_crawl(ckpt_dir: str, out_dir: str,
                      min_words: int = 5) -> dict:
    """Build the training corpus from a crawl checkpoint.  Returns
    per-language row counts read from the written files' metadata."""
    from pomp_ray.crawl import items_dataset

    items = items_dataset(ckpt_dir)

    def score(t: pa.Table) -> pa.Table:
        t = an.lang_id_batch(t)
        keep = an.quality_filter_mask(t, min_words=min_words)
        t = t.filter(keep)
        t = an.content_hash_batch(t)
        return t.select(["url", "pred_lang", "text", "content_hash"])

    scored = items.map_batches(score, batch_format="pyarrow")

    # survivor per distinct text: min url (lexicographic -- urls are the
    # stable id in a crawl corpus); only (hash, url) shuffles
    survivors = (scored.map_batches(
        lambda t: t.select(["content_hash", "url"]), batch_format="pyarrow")
        .groupby("content_hash").aggregate(Min("url", alias_name="url"))
        .map_batches(lambda t: t.select(["url"]), batch_format="pyarrow"))

    deduped = scored.join(survivors, join_type="inner", on=("url",),
                          num_partitions=16)

    def norm(t: pa.Table) -> pa.Table:
        clean = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(t["text"], pattern=_WS_RE,
                                       replacement=" "))
        return pa.table({"url": t["url"], "pred_lang": t["pred_lang"],
                         "clean_text": clean})

    deduped.map_batches(norm, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["pred_lang"], mode="overwrite")

    counts: dict[str, int] = {}
    for p in glob.glob(os.path.join(out_dir, "pred_lang=*", "*.parquet")):
        lang = os.path.basename(os.path.dirname(p)).split("=", 1)[1]
        counts[lang] = counts.get(lang, 0) + \
            pq.ParquetFile(p).metadata.num_rows
    return counts
