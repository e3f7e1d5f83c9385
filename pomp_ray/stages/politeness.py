"""Politeness selection: per-host crawl-delay budget (north_rule; absent
from pomp, whose queue discipline is plain FIFO/LIFO -- SURVEY.md A1/O3/T4).

Per round a host with ``crawl_delay > 0`` may contribute at most
``k = max(1, floor(round_budget_s / crawl_delay))`` requests, taken in
selection order (priority desc, seq asc for BFS); the rest defer to the
next round keeping their seq.

Two paths:

* distributed -- ``groupby(host).map_groups`` (SHUFFLE 1 of the round
  loop).  Skew from heavy hosts is handled by SALTING: when a frontier is
  large, the group key becomes (host, salt=hash(url) %% n_salts) and the
  per-host cap is divided across the salts (sum of sub-caps == cap), so no
  single task ever holds a whole heavy host.  Salting keeps the selected
  SET size per host exact but relaxes which k rows win -- scale mode only,
  mirroring how pomp's own concurrent tests relax ordering.
* driver-side -- for small frontiers (or exact DFS), a serial walk
  identical to the oracle's: exact conformance, no shuffle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


_UNLIMITED_CAP = 10**8   # caps at/above this can never bind; drop them

_MISS = object()


class BudgetCaps(dict):
    """Per-host caps with a global DEFAULT (the host page budget,
    ``CrawlConfig.max_pages_per_host``): explicit entries are
    min(politeness cap, remaining quota) for hosts already spent or
    delay-capped; every other host gets the full budget.  An entry <= 0
    marks an EXHAUSTED host -- its rows are dropped by the selection
    stages (stage="host_budget" errors), never deferred.

    ``get`` intentionally returns the default for missing hosts even
    when a fallback is passed (the selection stages all ask
    ``caps.get(host)`` / ``caps.get(host, None)`` meaning "the effective
    cap"), and the object is truthy whenever a default exists so
    budget-only crawls still run the politeness stage."""

    def __init__(self, base: dict[str, int], default: int):
        super().__init__(base)
        self.default = default

    def get(self, key, fallback=None):   # noqa: ARG002 (see docstring)
        v = super().get(key, _MISS)
        return self.default if v is _MISS else v

    def __bool__(self) -> bool:
        return True

    def __reduce__(self):
        return (BudgetCaps, (dict(self), self.default))


def caps_from_delay(delay: dict[str, float], round_budget_s: float) -> dict[str, int]:
    caps = {
        h: max(1, math.floor(round_budget_s / d))
        for h, d in delay.items()
        if d > 0
    }
    return {h: c for h, c in caps.items() if c < _UNLIMITED_CAP}


def derive_salt_counts(host_freq: dict[str, int], caps: dict[str, int],
                       n_salts_max: int, target_rows: int = 4096
                       ) -> dict[str, int]:
    """Scale-aware salting (north_rule: salted repartitioning of skew):
    the number of salts per host derives from the OBSERVED frontier host
    frequency, not a static config -- a host holding half the frontier
    splits into enough (host, salt) groups that no politeness group
    exceeds ~``target_rows`` rows, while light hosts keep a single group
    (no needless fragmentation).  Clamped to [1, n_salts_max] and to the
    host's cap (a salt with sub-cap 0 would starve; see
    select_distributed).  Only hosts needing >1 salt appear in the
    returned dict (lookup default is 1)."""
    out: dict[str, int] = {}
    for host, freq in host_freq.items():
        k = min(n_salts_max, max(1, -(-freq // max(1, target_rows))))
        cap = caps.get(host)
        if cap is not None:
            k = min(k, max(1, cap))
        if k > 1:
            out[host] = k
    return out


def select_distributed(
    frontier: rd.Dataset,
    caps: dict[str, int],
    mode: str = "bfs",
    n_salts: int = 1,
    rnd: int = 0,
) -> rd.Dataset:
    """Mark each frontier row selected/deferred.  Returns the marked
    dataset (caller materializes once, then filters both ways)."""
    seq_asc = mode != "dfs"   # bfs + best share the FIFO tiebreak

    def _eff(host: str) -> int:
        # clamp effective salts to the host's cap so no salt has sub-cap 0
        # (hash-fixed salts with a 0 sub-cap would starve forever)
        cap = caps.get(host)
        return n_salts if cap is None else min(n_salts, max(1, cap))

    if n_salts > 1:
        # effective-salt lookup precomputed for capped hosts; uncapped
        # hosts default to n_salts (Series.map C path, no per-row Python)
        eff_map = {h: min(n_salts, max(1, c)) for h, c in caps.items()}

        def add_salt(t: pa.Table) -> pa.Table:
            # pandas' keyed siphash, NOT builtin hash(): per-process hash
            # salting would make salt assignment nondeterministic across
            # workers/retries; vectorized, no per-row md5
            urls = np.asarray(t["canon_url"].to_pylist(), dtype=object)
            h = pd.util.hash_array(urls)
            eff = (pd.Series(t["host"].to_pylist(), dtype=object)
                   .map(eff_map).fillna(n_salts).to_numpy(np.uint64))
            salt = pa.array((h % eff).astype(np.int32), pa.int32())
            return t.append_column("salt", salt)

        frontier = frontier.map_batches(add_salt, batch_format="pyarrow")
        group_keys = ["host", "salt"]
    else:
        group_keys = ["host"]

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        host = g["host"].iloc[0]
        cap = caps.get(host)
        if cap is not None and cap <= 0:
            # page budget exhausted (BudgetCaps entry <= 0): drop the
            # whole host group -- errors, never deferred
            g = g.assign(selected=False, dropped=True)
            if "salt" in g.columns:
                g = g.drop(columns=["salt"])
            return g
        n_eff = _eff(host)
        if cap is not None and n_eff > 1:
            salt = int(g["salt"].iloc[0])
            # split the host budget across salts; the remainder slot
            # ROTATES by round so the uneven extra budget cycles across
            # salts deterministically
            cap = cap // n_eff + (
                1 if (salt - rnd) % n_eff < cap % n_eff else 0)
        if cap is None or len(g) <= cap:
            g = g.assign(selected=True, dropped=False)
        else:
            g = g.sort_values(["priority", "seq"], ascending=[False, seq_asc])
            sel = np.zeros(len(g), dtype=bool)
            sel[:cap] = True
            g = g.assign(selected=sel, dropped=False)
        if "salt" in g.columns:
            g = g.drop(columns=["salt"])
        return g

    return frontier.groupby(group_keys).map_groups(mark, batch_format="pandas")


def select_serial(
    rows: pa.Table,
    caps: dict[str, int],
    mode: str,
    width: int | None,
) -> tuple[pa.Table, pa.Table, pa.Table]:
    """Driver-side selection, bit-identical to the oracle's round walk:
    sort all rows by the queue discipline, take while under per-host caps
    and the global width; rows of page-budget-EXHAUSTED hosts
    (BudgetCaps entry <= 0) are dropped, not deferred.  Returns
    (selected, deferred, dropped) tables."""
    df = rows.to_pandas()
    if mode == "dfs":
        df = df.sort_values(["priority", "seq"], ascending=[False, False])
    else:   # bfs + best: FIFO within priority
        df = df.sort_values(["priority", "seq"], ascending=[False, True])
    if width is None:
        width = len(df)
    per_host: dict[str, int] = {}
    chosen = []
    dropped = []
    n_sel = 0
    for host in df["host"].tolist():
        cap = caps.get(host, None)
        if cap is not None and cap <= 0:
            chosen.append(False)
            dropped.append(True)
            continue
        used = per_host.get(host, 0)
        if n_sel < width and (cap is None or used < cap):
            per_host[host] = used + 1
            chosen.append(True)
            n_sel += 1
        else:
            chosen.append(False)
        dropped.append(False)
    df = df.assign(selected=chosen, dropped=dropped)
    aux = ["selected", "dropped"]
    sel = pa.Table.from_pandas(df[df["selected"]].drop(columns=aux),
                               preserve_index=False)
    def_ = pa.Table.from_pandas(
        df[~df["selected"] & ~df["dropped"]].drop(columns=aux),
        preserve_index=False)
    drop = pa.Table.from_pandas(df[df["dropped"]].drop(columns=aux),
                                preserve_index=False)
    return sel, def_, drop
