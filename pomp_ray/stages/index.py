"""Global position assignment (the Spark ``zipWithIndex`` shape) --
Ray Data has no native row-index operator, and a training-data export
needs one for the reproducible global shuffle: order docs by a hash of
their id and number them 0..n-1, so every retry/run/cluster-size
produces the SAME "shuffled" sequence (the engine's no-randomness
discipline: md5 order replaces random_shuffle, which is neither
session- nor block-structure-stable).

Two passes over the SORTED-AND-MATERIALIZED dataset (materializing pins
block boundaries so both passes see identical blocks; ``batch_size=None``
makes each batch exactly one block):

  1. per-block (first key, row count) partials -- O(blocks) rows to the
     driver, never data;
  2. driver prefix-sums the counts into per-block offsets keyed by first
     key, broadcasts the tiny dict, and each block assigns
     ``offset + arange(len)``.

Requires UNIQUE keys (a total order): with duplicates spanning a block
boundary, two blocks could share a first key.  The md5-of-id keys the
exports use are unique by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def zip_with_index(ds: rd.Dataset, key: str,
                   out_col: str = "pos") -> rd.Dataset:
    """Sort by ``key`` ascending and append ``out_col`` = global
    0-based position.  Keys must be unique across the dataset."""
    s = ds.sort(key).materialize()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"first": [str(t[key][0].as_py())],
                         "n": pa.array([t.num_rows], pa.int64())})

    parts = sorted(
        s.map_batches(partial, batch_size=None,
                      batch_format="pyarrow").take_all(),
        key=lambda r: r["first"])
    offsets: dict[str, int] = {}
    acc = 0
    for r in parts:
        offsets[r["first"]] = acc
        acc += r["n"]
    ref = ray.put(offsets)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        off = ray.get(ref)[str(t[key][0].as_py())]
        return t.append_column(
            out_col, pa.array(np.arange(off, off + t.num_rows), pa.int64()))

    return s.map_batches(assign, batch_size=None, batch_format="pyarrow")
