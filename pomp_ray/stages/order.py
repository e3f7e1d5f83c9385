"""Deterministic global sequence assignment over a sorted Dataset.

pomp's queue discipline assigns every request an implicit global enqueue
position (FIFO/LIFO order, SURVEY.md section 2.6).  To reproduce it
distributedly we need "sort, then number rows 0..n-1 contiguously".
Ray Data has no zip_with_index, so this is one of the rare places we drop
to raw Ray tasks (allowed as a last resort per the design rules): sort the
dataset, take its block refs IN ORDER, count rows per block remotely
(metadata-sized driver traffic only -- no block bodies ever reach the
driver), prefix-sum the counts, then append the index column per block in
parallel.  Scales as O(blocks) driver work.

Only the exact-conformance mode uses this per round; the scale mode
(``exact_order=False``) skips it entirely.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd


@ray.remote(num_cpus=0.25)
def _nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote(num_cpus=0.25)
def _with_index(t: pa.Table, offset: int, col: str) -> pa.Table:
    idx = pa.array(range(offset, offset + t.num_rows), pa.int64())
    if col in t.column_names:
        t = t.drop_columns([col])
    return t.append_column(col, idx)


def zip_with_index_sorted(
    ds: rd.Dataset,
    keys: list[str],
    descending: list[bool],
    offset: int = 0,
    col: str = "seq",
) -> tuple[rd.Dataset, int]:
    """Sort ``ds`` by ``keys`` and append a contiguous int64 ``col`` starting
    at ``offset`` in that order.  Returns (dataset, total_rows)."""
    ds = ds.sort(keys, descending=descending)
    refs = ds.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    out, off = [], offset
    for r, c in zip(refs, counts):
        out.append(_with_index.remote(r, off, col))
        off += c
    if not out:
        return ds, 0
    return rd.from_arrow_refs(out), off - offset
