"""Distributed prefix scan (running aggregate over a global order) --
the stream-analytics primitive Ray Data lacks natively: cumulative
window functions (``MAX(x) OVER (ORDER BY k ROWS UNBOUNDED
PRECEDING)``) need each row to see every earlier row's contribution,
which naively serializes the whole stream.

The ``zip_with_index`` trick generalizes: sort + materialize pins block
boundaries, each block reduces to ONE (first_key, block_max) partial --
O(blocks) rows to the driver, never data -- the driver prefix-combines
the partials into a per-block SEED, and each block then runs its local
``np.maximum.accumulate`` seeded with everything before it.  Two linear
passes, one tiny broadcast; works for any associative combine (max
here; min/sum are the same shape).

Requires unique ``order_key`` values (total order), same as
zip_with_index; partials are ordered by the key's NATIVE type (ints
compare numerically, never as strings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def prefix_max(ds: rd.Dataset, order_key: str, value_col: str,
               out_col: str = "prev_max") -> rd.Dataset:
    """Sort by ``order_key`` and append ``out_col`` = the EXCLUSIVE
    running maximum of ``value_col`` (max over all strictly-earlier
    rows; null for the global first row -- the SQL ``ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING`` frame)."""
    s = ds.sort(order_key).materialize()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "first": pa.array([t[order_key][0].as_py()]),
            "mx": pa.array([float(v.max())], pa.float64())})

    parts = sorted(
        s.map_batches(partial, batch_size=None,
                      batch_format="pyarrow").take_all(),
        key=lambda r: r["first"])
    seeds: dict = {}
    acc: float | None = None
    for r in parts:
        seeds[r["first"]] = acc
        acc = r["mx"] if acc is None else max(acc, r["mx"])
    ref = ray.put(seeds)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.float64()))
        seed = ray.get(ref)[t[order_key][0].as_py()]
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        run = np.maximum.accumulate(v)
        prev = np.empty(len(v), np.float64)
        prev[0] = -np.inf if seed is None else seed
        prev[1:] = run[:-1] if seed is None else np.maximum(run[:-1], seed)
        mask = np.zeros(len(v), bool)
        if seed is None:
            mask[0] = True   # global first row: empty frame -> null
        return t.append_column(
            out_col, pa.array(prev, pa.float64(), mask=mask))

    return s.map_batches(assign, batch_size=None, batch_format="pyarrow")


def prefix_sum(ds: rd.Dataset, order_key: str, value_col: str,
               out_col: str = "prev_sum") -> rd.Dataset:
    """Sort by ``order_key`` and append ``out_col`` = the EXCLUSIVE
    running int64 SUM of ``value_col`` (0 for the global first row) --
    same two-pass shape as ``prefix_max`` with + as the combine; exact
    integer arithmetic end to end."""
    s = ds.sort(order_key).materialize()

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first": pa.array([], pa.float64()),
                             "sm": pa.array([], pa.int64())})
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "first": pa.array([t[order_key][0].as_py()]),
            "sm": pa.array([int(v.sum())], pa.int64())})

    parts = sorted(
        s.map_batches(partial, batch_size=None,
                      batch_format="pyarrow").take_all(),
        key=lambda r: r["first"])
    seeds: dict = {}
    acc = 0
    for r in parts:
        seeds[r["first"]] = acc
        acc += r["sm"]
    ref = ray.put(seeds)

    def assign(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        seed = ray.get(ref)[t[order_key][0].as_py()]
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        prev = seed + np.concatenate([[0], np.cumsum(v[:-1])])
        return t.append_column(out_col, pa.array(prev, pa.int64()))

    return s.map_batches(assign, batch_size=None, batch_format="pyarrow")
