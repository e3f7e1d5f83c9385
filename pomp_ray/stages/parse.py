"""Parse stage: the distributed form of pomp's ``extract_items`` /
``next_requests`` hooks (pomp/core/base.py ~L105-135 [estimated];
SURVEY.md M1-M3).

One vectorized ``map_batches`` pass per fetched batch produces BOTH the
item columns (title, byte-identical text, n_links) and the outgoing-link
rows (pomp master merges item- and request-yielding into one generator;
we mirror that by emitting both from one stage).  The heavy ``html``
column is dropped here so the materialized per-round barrier holds only
compact parsed rows.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

from pomp_ray.functions.textfns import (
    html_extract_links,
    html_extract_text,
    html_extract_title,
)

# A user "crawler spec" parse hook: html bytes -> (title, text, links).
ParseFn = Callable[[bytes], tuple[str, str, list[str]]]


def default_parse(html: bytes) -> tuple[str, str, list[str]]:
    return html_extract_title(html), html_extract_text(html), html_extract_links(html)


def make_parse_batch(rnd: int, parse_fn: ParseFn = default_parse):
    """Batch fn: fetched frontier rows -> parsed rows.  Keeps misses
    (fetch_ok=False) so the error path stays in-band (pomp's
    process_exception contract: errors flow, never raise)."""

    def parse_batch(batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        oks = batch["fetch_ok"].to_pylist()
        titles: list[str | None] = []
        texts: list[str | None] = []
        links: list[list[str] | None] = []
        n_links: list[int] = []
        for ok, html in zip(oks, htmls):
            if not ok or html is None:
                titles.append(None); texts.append(None); links.append(None)
                n_links.append(0)
                continue
            title, text, hrefs = parse_fn(html)
            titles.append(title); texts.append(text); links.append(hrefs)
            n_links.append(len(hrefs))
        out = batch.drop_columns(["html"])
        out = out.append_column("round", pa.array([rnd] * len(oks), pa.int32()))
        out = out.append_column("title", pa.array(titles, pa.string()))
        out = out.append_column("text", pa.array(texts, pa.string()))
        out = out.append_column("links", pa.array(links, pa.list_(pa.string())))
        return out.append_column("n_links", pa.array(n_links, pa.int32()))

    return parse_batch


def explode_links(batch: pa.Table) -> pa.Table:
    """Parsed rows -> one candidate row per outgoing link, carrying the
    parent's ordering coordinates so enqueue order reproduces pomp's
    (parent fetch order, link position) insertion order.  Fully
    vectorized: list_flatten + list_parent_indices explode the link
    lists, the in-list position (link_idx) is one arange-minus-starts
    pass, and every parent column rides a take -- no Python loop on the
    mega-round hot path (~10 links x 10^6 pages per scale round)."""
    import numpy as np

    # links resolve against the FINAL url after redirects (base_url,
    # appended by the fetch stage) -- browser base semantics; batches
    # from redirect-free paths fall back to canon_url
    base_col = ("base_url" if "base_url" in batch.column_names
                else "canon_url")
    links = batch["links"].combine_chunks() if isinstance(
        batch["links"], pa.ChunkedArray) else batch["links"]
    flat = pc.list_flatten(links)
    parent = pc.list_parent_indices(links)
    ll = pc.fill_null(pc.list_value_length(links), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    present = ll.copy()
    total = int(present.sum())
    starts = np.cumsum(present) - present
    l_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, present)
    return pa.table(
        {
            "url": pc.cast(flat, pa.string()),
            "base": pc.cast(pc.take(batch[base_col], parent), pa.string()),
            "depth": pc.cast(
                pc.add(pc.take(batch["depth"], parent),
                       pa.scalar(1, pa.int32())), pa.int32()),
            "priority": pa.array(np.zeros(total, np.int32), pa.int32()),
            "parent_priority": pc.cast(pc.take(batch["priority"], parent),
                                       pa.int32()),
            "parent_seq": pc.cast(pc.take(batch["seq"], parent),
                                  pa.int64()),
            "link_idx": pa.array(l_idx, pa.int64()),
        }
    )
