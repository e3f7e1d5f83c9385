"""Relational operator demos over the TPC-H-ish testdata tables.

These exercise the engine's join / aggregate / sort / filter building
blocks (the same primitives the crawl loop composes: fetch-join J1,
metrics rollups A2, ordering O1) in a form the driver's DuckDB oracle can
verify 1:1.  Column names match the oracle SQL exactly.

Float discipline: aggregates avoid cross-engine float-sum nondeterminism
by using exact aggregates (count/min/max) or rounding sums to 2 decimals.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _t(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns)


def events_rollup(sf_dir: str) -> rd.Dataset:
    """Per-event-type metrics rollup (crawl A2 analog): count + exact
    min/max + rounded sum."""
    ds = _t(sf_dir, "events", ["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Min("value", alias_name="vmin"),
        Max("value", alias_name="vmax"),
        Sum("value", alias_name="vsum"),
    )
    def fin(t: pa.Table) -> pa.Table:
        t = t.set_column(t.column_names.index("vsum"), "vsum",
                         pc.round(t["vsum"], 2))
        return t.set_column(t.column_names.index("n"), "n",
                            pc.cast(t["n"], pa.int64()))
    return out.map_batches(fin, batch_format="pyarrow")


def events_sorted_head(sf_dir: str, n: int = 100) -> rd.Dataset:
    """Deterministic ordering projection (O1 analog): first n events by
    (ts, event_id)."""
    ds = _t(sf_dir, "events", ["event_id", "ts"])
    return ds.sort(["ts", "event_id"]).limit(n)


def orders_by_mktsegment(sf_dir: str) -> rd.Dataset:
    """Fetch-join analog (J1): orders joined to customers (broadcast small
    side would also work; this uses the hash join) then rolled up per
    market segment."""
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, join_type="inner", num_partitions=8,
                         on=("o_custkey",), right_on=("c_custkey",))
    out = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"),
        Min("o_totalprice", alias_name="min_price"),
        Max("o_totalprice", alias_name="max_price"),
    )
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("n_orders"), "n_orders",
                               pc.cast(t["n_orders"], pa.int64())),
        batch_format="pyarrow")


def lineitem_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H Q1-shaped rollup: per (returnflag, linestatus) with partial
    aggregation inside map_batches before the groupby (the pre-aggregate
    pattern that shrinks the shuffle)."""
    ds = _t(sf_dir, "lineitem",
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
             "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))
        tmp = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": t["l_quantity"],
            "disc_price": disc_price,
        })
        df = tmp.to_pandas().groupby(
            ["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"), sum_disc_price=("disc_price", "sum"),
            n=("qty", "size"))
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("n", alias_name="count_order"),
    )

    def fin(t: pa.Table) -> pa.Table:
        t = t.set_column(t.column_names.index("sum_qty"), "sum_qty",
                         pc.round(t["sum_qty"], 2))
        t = t.set_column(t.column_names.index("sum_disc_price"),
                         "sum_disc_price", pc.round(t["sum_disc_price"], 2))
        return t.set_column(t.column_names.index("count_order"), "count_order",
                            pc.cast(t["count_order"], pa.int64()))
    return out.map_batches(fin, batch_format="pyarrow")


def filter_project(sf_dir: str) -> rd.Dataset:
    """Predicate pushdown + projection demo (M4 middleware filter analog):
    high-value open orders."""
    ds = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["o_orderstatus"], pa.scalar("O")),
                    pc.greater(t["o_totalprice"], pa.scalar(200000.0)))
        ).select(["o_orderkey", "o_totalprice"]),
        batch_format="pyarrow")


def events_normalized(sf_dir: str) -> rd.Dataset:
    """Per-group feature scaling, the two-phase broadcast-stats pattern
    every training-data pipeline uses for normalization: phase 1 reduces
    the table to per-event-type (sum, sumsq, n) partials (one tiny row
    per group per batch -> small groupby), phase 2 broadcasts the
    group-stats dict (ray.put) and z-scores every row vectorized.
    Population std; z rounded to 2dp so the oracle's different
    summation order cannot flip the value hash."""
    import math

    import numpy as np
    import ray as _ray

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy()
        tmp = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                            "s": v, "ss": v * v})
        g = tmp.groupby("event_type", as_index=False).agg(
            s=("s", "sum"), ss=("ss", "sum"), n=("s", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    stats_rows = (_t(sf_dir, "events", ["event_type", "value"])
                  .map_batches(partial, batch_format="pyarrow")
                  .groupby("event_type")
                  .aggregate(Sum("s", alias_name="s"),
                             Sum("ss", alias_name="ss"),
                             Sum("n", alias_name="n"))).take_all()
    stats = {}
    for r in stats_rows:
        mean = r["s"] / r["n"]
        var = max(r["ss"] / r["n"] - mean * mean, 0.0)
        stats[r["event_type"]] = (mean, math.sqrt(var) or 1.0)
    ref = _ray.put(stats)

    def score(t: pa.Table) -> pa.Table:
        st = _ray.get(ref)
        types = t["event_type"].to_pylist()
        means = np.array([st[x][0] for x in types])
        stds = np.array([st[x][1] for x in types])
        z = (t["value"].to_numpy() - means) / stds
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "z": pa.array(np.round(z, 2), pa.float64())})

    return _t(sf_dir, "events", ["event_id", "event_type", "value"]) \
        .map_batches(score, batch_format="pyarrow")


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1998-01-01", k: int = 10) -> rd.Dataset:
    """TPC-H Q3 shape: the classic 3-way join (customer ⋈ orders ⋈
    lineitem) with predicate pushdown on both date sides, per-order
    revenue aggregation, top-k.  Scale notes: every read is
    column-pruned and filtered BEFORE the join; the two hash joins
    shuffle only join keys + the few carried columns; revenue is
    pre-aggregated per batch before the final groupby; only the tiny
    aggregate is sorted.  Revenue ROUNDed to 2dp for the oracle's
    different summation order."""
    import numpy as np

    cutoff_ts = pd.Timestamp(cutoff)

    cust = _t(sf_dir, "customer", ["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["c_mktsegment"], segment)).select(["c_custkey"]),
            batch_format="pyarrow")
    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"]) \
        .map_batches(lambda t: t.filter(
            pc.less(t["o_orderdate"], pa.scalar(cutoff_ts))),
            batch_format="pyarrow")
    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]) \
        .map_batches(lambda t: t.filter(
            pc.greater(t["l_shipdate"], pa.scalar(cutoff_ts))),
            batch_format="pyarrow")

    j1 = orders.join(cust, join_type="inner", num_partitions=8,
                     on=("o_custkey",), right_on=("c_custkey",))
    j2 = li.join(j1, join_type="inner", num_partitions=8,
                 on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        tmp = pa.table({"l_orderkey": t["l_orderkey"],
                        "o_orderdate": t["o_orderdate"],
                        "o_orderpriority": t["o_orderpriority"],
                        "rev": rev})
        df = tmp.to_pandas().groupby(
            ["l_orderkey", "o_orderdate", "o_orderpriority"],
            as_index=False)["rev"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    agg = j2.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_orderkey", "o_orderdate", "o_orderpriority"]) \
        .aggregate(Sum("rev", alias_name="revenue"))
    top = agg.sort(["revenue", "o_orderdate", "l_orderkey"],
                   descending=[True, False, False]).limit(k)
    return top.map_batches(
        lambda t: pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "o_orderdate": pc.cast(t["o_orderdate"], pa.timestamp("us")),
            "o_orderpriority": t["o_orderpriority"],
            "revenue": pc.round(t["revenue"], ndigits=2)}),
        batch_format="pyarrow")


# ------------------------------------------------------------ HLL sketches
_HLL_P = 12                       # 2^12 = 4096 registers, ~1.6% typ. error


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized integer bit_length for uint64 -- integer ops only (a
    float log2 is imprecise above 2^53 and its rounding would change
    sketch ranks between platforms)."""
    x = x.copy()
    out = np.zeros(len(x), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = (x >> np.uint64(s)) != 0
        out += s * m
        x = np.where(m, x >> np.uint64(s), x)
    return out + (x != 0)


def _hll_accumulate(regs: np.ndarray, users: np.ndarray,
                    p: int = _HLL_P) -> np.ndarray:
    """Fold a uint64-hash batch into the 2^p register array (max rank per
    bucket).  pd.util.hash_array: keyed siphash, deterministic across
    worker processes -- never builtin hash()."""
    h = pd.util.hash_array(users.astype(np.int64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)            # remaining bits, mod 2^64
    rank = np.minimum(64 - _bit_length_u64(w) + 1, 64 - p + 1)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray, p: int = _HLL_P) -> float:
    """Standard HLL estimator (Flajolet et al. 2007) with the
    small-range linear-counting correction; registers have a fixed
    length, so the float reduction order -- and thus the estimate -- is
    deterministic."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    v = int(np.sum(regs == 0))
    if e <= 2.5 * m and v > 0:
        e = m * float(np.log(m / v))
    return e


def hll_users_by_type(sf_dir: str) -> rd.Dataset:
    """Approximate COUNT(DISTINCT user_id) per event_type via a
    HyperLogLog sketch as a custom AggregateFn -- THE cardinality shape
    at 100 TB: an exact distinct shuffles every (type, user) pair, while
    the sketch ships 4 KiB of registers per group and merges with an
    elementwise max, so any block order / partitioning yields the SAME
    registers.  Deterministic end to end (keyed siphash + integer rank
    extraction + fixed-order float reduction); pinned by an
    independently-recomputed golden parquet (tools/gen_golden.py
    gen_hll_golden) and tolerance-checked against the exact count in
    pytest."""
    from ray.data.aggregate import AggregateFn

    m = 1 << _HLL_P

    hll = AggregateFn(
        init=lambda k: np.zeros(m, np.int8),
        accumulate_block=lambda st, blk: _hll_accumulate(
            st, blk.column("user_id").to_numpy()),
        merge=lambda a, b: np.maximum(a, b),
        finalize=lambda regs: float(_hll_estimate(regs)),
        name="n_users_hll")

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "user_id"])
    agg = ds.groupby("event_type").aggregate(hll)
    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "n_users_hll": pc.round(t["n_users_hll"], ndigits=4)}),
        batch_format="pyarrow")


def rolling_user_spend(sf_dir: str, window: int = 5) -> rd.Dataset:
    """Per-user ROLLING window aggregate over the events log: for every
    event, the sum of the user's last ``window`` event values (ordered by
    ts, event_id) -- the per-entity sliding feature every
    sessionized-training-data pipeline derives.

    Exactness discipline: values become integer CENTS via floor(value*100)
    (floor of the identical float64 product is bit-identical across
    engines; ROUND's half-way rule is not), and integer rolling sums are
    exact in float64, so the output matches DuckDB's window SUM bit for
    bit with no rounding tolerance.

    Shape: users hash into 64 buckets (the sessionize lesson: millions of
    per-user map_groups calls are pandas-overhead-bound; a bucket runs ONE
    C-speed pandas grouped-rolling pass), one shuffle total.  The
    partitioning assumption -- all events of a user in one group -- is the
    same one sessionize documents."""
    def add_bucket(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.multiply(t["value"], pa.scalar(100.0))),
                        pa.int64())
        t = t.append_column("cents", cents)
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        r = g.groupby("user_id", sort=False)["cents"] \
            .rolling(window, min_periods=1).sum()
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "roll_cents": r.to_numpy().astype(np.int64),
        })

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "value"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(roll, batch_format="pandas")
    return out.map_batches(
        lambda t: pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "roll_cents": pc.cast(t["roll_cents"], pa.int64())}),
        batch_format="pyarrow")


def q6_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q6 (forecasting revenue change): one filtered scan of
    lineitem, one scalar SUM(l_extendedprice * l_discount).  Prices and
    discounts are exact 2-decimal values, so each product is formed in
    integer 10^-4 currency units (rint(p*100) * rint(d*100)) and summed
    as int64: the distributed sum is order-independent and the final
    double (sum / 10000.0) is bit-identical to the DuckDB oracle, which
    mirrors the same integer arithmetic.  Only the four touched columns
    leave the parquet scan."""
    ds = _t(sf_dir, "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
    # the testdata's shipdates start 1995 (TPC-H-ish, not stock TPC-H);
    # the window is shifted to select a real slice
    lo = np.datetime64("1996-01-01")
    hi = np.datetime64("1997-01-01")

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy()
        disc = t["l_discount"].to_numpy()
        m = ((ship >= lo) & (ship < hi)
             & (disc >= 0.05) & (disc <= 0.07)
             & (t["l_quantity"].to_numpy() < 24))
        cents_p = np.rint(t["l_extendedprice"].to_numpy()[m] * 100) \
            .astype(np.int64)
        cents_d = np.rint(disc[m] * 100).astype(np.int64)
        s = int((cents_p * cents_d).sum())
        return pa.table({"s": pa.array([s], pa.int64())})

    total = ds.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"))["s"]
    return pa.table({"revenue": pa.array([float(total) / 10000.0],
                                         pa.float64())})


def record_events(sf_dir: str) -> rd.Dataset:
    """Record-breaking detection over the event stream: for every event
    (in event_id arrival order) the all-time-maximum ``value`` seen
    BEFORE it and whether this event sets a new record -- the classic
    streaming cumulative-window query (alerting on new maxima), and the
    driver query for the distributed prefix-scan primitive
    (``stages.scan.prefix_max``: one sort, O(blocks) partials to the
    driver, block-local seeded cummax -- never a serial pass over the
    stream).  Running max involves NO summation, so engine and DuckDB
    window-function doubles agree bit-for-bit."""
    from pomp_ray.stages.scan import prefix_max

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "value"])
    out = prefix_max(ev, "event_id", "value", out_col="prev_max")

    def fin(t: pa.Table) -> pa.Table:
        prev = t["prev_max"]
        rec = pc.fill_null(pc.greater(t["value"], prev), True)
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "value": pc.cast(t["value"], pa.float64()),
            "prev_max": prev,
            "is_record": rec,
        })

    return out.map_batches(fin, batch_format="pyarrow")


def late_events(sf_dir: str, lateness_s: int = 60) -> rd.Dataset:
    """Watermark / late-arrival accounting (the §2.9 streaming concern):
    events carry a deterministically JITTERED event-time (md5 bucket of
    the id, ±60 s -- the synthetic stand-in for out-of-order delivery;
    the testdata stream itself arrives perfectly ordered), the
    watermark is the running max event-time over arrival (event_id)
    order via the distributed prefix scan, and an event is LATE when it
    trails the watermark by more than ``lateness_s`` -- what a windowed
    aggregation would have dropped or re-triggered on.

    Integer microsecond arithmetic end to end; the DuckDB oracle
    mirrors the jitter formula and the cumulative window frame
    exactly."""
    import hashlib

    from pomp_ray.stages.scan import prefix_max

    def jitter(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_pylist()
        off = np.fromiter(
            (int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
             % 121 - 60 for i in ids), np.int64, len(ids))
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()  # us since epoch
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "ets": pa.array(ts + off * 1_000_000, pa.int64()),
        })

    ev = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_id", "ts"]).map_batches(
        jitter, batch_format="pyarrow")
    out = prefix_max(ev, "event_id", "ets", out_col="wm")

    def fin(t: pa.Table) -> pa.Table:
        wm = t["wm"].to_numpy(zero_copy_only=False)  # float64, nan first
        ets = t["ets"].to_numpy(zero_copy_only=False).astype(np.float64)
        late = np.where(np.isnan(wm), False,
                        ets + lateness_s * 1_000_000 < wm)
        lag = np.where(np.isnan(wm) | (wm <= ets), 0.0, wm - ets)
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "ets": pc.cast(t["ets"], pa.int64()),
            "late": pa.array(late, pa.bool_()),
            "lag_us": pa.array(lag.astype(np.int64), pa.int64()),
        })

    return out.map_batches(fin, batch_format="pyarrow")


def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA",
                             date_lo: str = "1996-01-01",
                             date_hi: str = "1997-01-01") -> pa.Table:
    """TPC-H Q5 (local supplier volume): revenue by nation for orders
    where the CUSTOMER and the SUPPLIER share a nation inside one
    region -- the deep multi-join shape (lineitem ⋈ orders ⋈ customer ⋈
    supplier, with region/nation as broadcast dimensions).

    Plan: date predicate pushed below everything; region→nation-set and
    nation names broadcast (tiny dims, the customers_per_region
    discipline); customer and supplier ride HASH joins (at scale they
    are large tables); each live join materializes before the next (the
    two-live-joins deadlock lesson).  Revenue forms in integer 10^-4
    currency units (rint(p*100) * (100 - rint(d*100)), the q6_revenue
    discipline) so the distributed sum is order-independent and the
    final doubles are bit-identical to the mirrored DuckDB oracle."""
    import ray

    # broadcast dims: region -> nation keys + names
    reg = _t(sf_dir, "region").take_all()
    rkey = next(r["r_regionkey"] for r in reg if r["r_name"] == region)
    nat = _t(sf_dir, "nation").take_all()
    nkeys = {n["n_nationkey"] for n in nat if n["n_regionkey"] == rkey}
    names = {n["n_nationkey"]: n["n_name"] for n in nat}
    lo = np.datetime64(date_lo)
    hi = np.datetime64(date_hi)

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(
        lambda t: pa.table({
            "o_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "c_nation": pc.cast(t["c_nationkey"], pa.int64())})
        .filter(pa.array(np.isin(
            t["c_nationkey"].to_numpy(zero_copy_only=False),
            list(nkeys)))),
        batch_format="pyarrow")

    def ord_prep(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy()
        m = (d >= lo) & (d < hi)
        t = t.filter(pa.array(m))
        return pa.table({
            "l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64())})

    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_prep, batch_format="pyarrow")
    ord_cust = orders.join(cust, join_type="inner", on=("o_custkey",),
                           num_partitions=8).map_batches(
        lambda t: t.select(["l_orderkey", "c_nation"]),
        batch_format="pyarrow").materialize()

    def li_prep(t: pa.Table) -> pa.Table:
        cents_p = np.rint(
            t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        cents_d = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "rev": pa.array(cents_p * (100 - cents_d), pa.int64())})

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow")
    li_ord = li.join(ord_cust, join_type="inner", on=("l_orderkey",),
                     num_partitions=8).materialize()

    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(
        lambda t: pa.table({
            "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
            "s_nation": pc.cast(t["s_nationkey"], pa.int64())}),
        batch_format="pyarrow")
    full = li_ord.join(supp, join_type="inner", on=("s_suppkey",),
                       num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        cn = t["c_nation"].to_numpy(zero_copy_only=False)
        sn = t["s_nation"].to_numpy(zero_copy_only=False)
        m = cn == sn
        rev = t["rev"].to_numpy(zero_copy_only=False)[m]
        nk = cn[m]
        uniq, inv = np.unique(nk, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, rev)
        return pa.table({"nation": pa.array(uniq, pa.int64()),
                         "rev": pa.array(sums, pa.int64())})

    from ray.data.aggregate import Sum as _Sum
    agg = full.map_batches(partial, batch_format="pyarrow") \
        .groupby("nation").aggregate(_Sum("rev", alias_name="rev"))
    rows = sorted(agg.take_all(),
                  key=lambda r: (-r["rev"], names[r["nation"]]))
    return pa.table({
        "n_name": pa.array([names[r["nation"]] for r in rows], pa.string()),
        "revenue": pa.array([r["rev"] / 10_000.0 for r in rows],
                            pa.float64()),
    })


def incremental_rollup(sf_dir: str, n_ticks: int = 5,
                       state_dir: str | None = None) -> rd.Dataset:
    """Incremental materialized view -- the micro-batch streaming shape
    (§2.9): the event log arrives in ``n_ticks`` arrival chunks
    (event_id ranges); each tick aggregates ONLY its chunk and merges
    into a checkpointed state parquet (count/sum per (event_type)),
    exactly how a structured-streaming rollup maintains state between
    triggers.  After the last tick the state must equal the one-shot
    batch aggregate -- which is what the DuckDB oracle computes, so the
    equality IS the correctness check.  Sums stay in floor-cents int64
    (the rolling_user_spend discipline): merge order cannot move a
    float.

    Restart safety: each tick rewrites the state atomically
    (content-complete replace) keyed by tick number; re-running a
    finished tick is a no-op (the tick marker is checked), so a killed
    run resumes at the failed tick."""
    import json as _json
    import shutil as _shutil

    if state_dir is None:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        state_dir = f"/tmp/pomp_incr_state_{tag}"
    if os.path.isdir(state_dir):
        _shutil.rmtree(state_dir)   # fresh demo run; resume is tested
    os.makedirs(state_dir, exist_ok=True)

    n_events = pq.ParquetFile(
        os.path.join(sf_dir, "events.parquet")).metadata.num_rows
    bounds = [n_events * i // n_ticks for i in range(n_ticks + 1)]

    for tick in range(n_ticks):
        run_incremental_tick(sf_dir, state_dir, tick,
                             bounds[tick], bounds[tick + 1])
    t = pq.read_table(os.path.join(state_dir, "state.parquet"))
    return rd.from_arrow(t)


def run_incremental_tick(sf_dir: str, state_dir: str, tick: int,
                         lo: int, hi: int) -> None:
    """One micro-batch trigger: aggregate events with lo <= event_id <
    hi, merge into the state table, commit atomically (state + marker).
    Idempotent per tick: an existing marker skips the work."""
    import json as _json

    marker = os.path.join(state_dir, f"tick-{tick:04d}.json")
    if os.path.exists(marker):
        return

    def partial(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["event_id"], pa.int64()).to_numpy()
        m = (ids >= lo) & (ids < hi)
        t = t.filter(pa.array(m))
        cents = np.rint(t["value"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "cents": cents})
        g = df.groupby("event_type", as_index=False).agg(
            n=("cents", "size"), cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum as _Sum
    delta = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"]).map_batches(
        partial, batch_format="pyarrow").groupby("event_type").aggregate(
        _Sum("n", alias_name="n"), _Sum("cents", alias_name="cents"))
    dt = pa.concat_tables(
        b for b in delta.iter_batches(batch_format="pyarrow"))

    state_path = os.path.join(state_dir, "state.parquet")
    if os.path.exists(state_path):
        st = pq.read_table(state_path).to_pandas().set_index("event_type")
    else:
        st = pd.DataFrame(columns=["n", "cents"]).rename_axis("event_type")
    dd = dt.to_pandas().set_index("event_type")
    merged = st.add(dd, fill_value=0).astype("int64").reset_index()
    out = pa.table({
        "event_type": pa.array(merged["event_type"], pa.string()),
        "n": pa.array(merged["n"], pa.int64()),
        "total_value": pa.array(merged["cents"] / 100.0, pa.float64()),
        "cents": pa.array(merged["cents"], pa.int64()),
    })
    tmp = state_path + f".tmp{os.getpid()}"
    pq.write_table(out.select(["event_type", "n", "cents"]), tmp)
    os.replace(tmp, state_path)
    with open(marker, "w") as f:
        _json.dump({"tick": tick, "lo": lo, "hi": hi,
                    "rows": int(dt.num_rows)}, f)


def q4_order_priority(sf_dir: str, date_lo: str = "1996-01-01",
                      date_hi: str = "1996-04-01",
                      late_days: int = 60) -> rd.Dataset:
    """TPC-H Q4 shape (order priority checking): count orders per
    priority that had AT LEAST ONE late lineitem -- the EXISTS
    semi-join, the one relational shape the suite was missing.  The
    slim testdata lineitem has no commit/receipt dates, so "late" is
    l_shipdate > o_orderdate + late_days (same per-order existential
    semantics as stock Q4's l_commitdate < l_receiptdate).

    Scale shape: both scans are column-pruned and the orders side is
    date-filtered BEFORE the one hash join; EXISTS is computed as
    per-batch DISTINCT (orderkey, priority) partials -> a
    key-bounded groupby -- never a row-per-lineitem shuffle after the
    filter.  All comparisons are integer microsecond timestamps; the
    counts are exact, so engine == DuckDB bit-for-bit.

    (pomp parity: the multi-way ordering/aggregation this exercises
    corresponds to post-crawl metrics rollups, SURVEY §2.6 A2.)"""
    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_orderdate", "o_orderpriority"]) \
        .map_batches(lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)))),
            batch_format="pyarrow")
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    j = li.join(orders, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def late_distinct(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy()
        od = t["o_orderdate"].to_numpy()
        m = ship > od + np.timedelta64(late_days, "D")
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_numpy()[m],
            "o_orderpriority": t["o_orderpriority"].to_pandas()[m],
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    keys = j.map_batches(late_distinct, batch_format="pyarrow") \
        .groupby(["l_orderkey", "o_orderpriority"]) \
        .aggregate(Count(alias_name="_c"))
    out = keys.groupby("o_orderpriority") \
        .aggregate(Count(alias_name="order_count"))
    return out.map_batches(
        lambda t: pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "order_count": pc.cast(t["order_count"], pa.int64())}),
        batch_format="pyarrow").sort("o_orderpriority")


def q13_customer_distribution(sf_dir: str,
                              excl_priority: str = "1-URGENT") -> rd.Dataset:
    """TPC-H Q13 shape (customer distribution): histogram of
    orders-per-customer INCLUDING zero-order customers -- the
    left-outer-join + double-aggregation shape.  Stock Q13 excludes a
    comment pattern; the slim testdata carries no comments, so the
    stand-in exclusion is one order priority class (same
    join-with-residual-predicate structure).

    Scale shape: orders collapse to per-batch value_counts partials ->
    groupby(custkey) sum (one row per customer ever shuffled), a
    repartition guard before the join (the ray 2.49 empty-schema-block
    trap, CLAUDE.md), customer LEFT joins the counts (null -> 0), and
    the final histogram is again partial value_counts -> a tiny
    groupby.  Pure integer counts: exact vs DuckDB."""
    orders = _t(sf_dir, "orders", ["o_custkey", "o_orderpriority"]) \
        .map_batches(lambda t: t.filter(
            pc.not_equal(t["o_orderpriority"], excl_priority))
            .select(["o_custkey"]), batch_format="pyarrow")

    def count_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["o_custkey"].combine_chunks())
        return pa.table({"o_custkey": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = orders.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(Sum("n", alias_name="c_count")) \
        .repartition(4)

    cust = _t(sf_dir, "customer", ["c_custkey"])
    j = cust.join(counts, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",), right_on=("o_custkey",))

    def hist_partial(t: pa.Table) -> pa.Table:
        cc = t["c_count"].to_pandas().fillna(0).astype(np.int64)
        vc = cc.value_counts()
        return pa.table({
            "c_count": pa.array(vc.index.to_numpy(np.int64), pa.int64()),
            "n": pa.array(vc.to_numpy(np.int64), pa.int64())})

    out = j.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("c_count").aggregate(Sum("n", alias_name="custdist"))
    return out.map_batches(
        lambda t: pa.table({
            "c_count": pc.cast(t["c_count"], pa.int64()),
            "custdist": pc.cast(t["custdist"], pa.int64())}),
        batch_format="pyarrow").sort(
        ["custdist", "c_count"], descending=[True, True])


def q18_large_volume(sf_dir: str, min_qty: int = 300) -> rd.Dataset:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds ``min_qty``, with the customer attached --
    the groupby-HAVING semi-join shape.

    Scale shape: lineitem collapses to per-batch (orderkey -> qty)
    partials before the one orderkey-keyed shuffle; the HAVING filter
    leaves an output-scale table that is materialized (two live hash
    joins in one streaming DAG deadlock small sessions -- CLAUDE.md),
    then orders semi-filter via a broadcast key set and ONE hash join
    attaches the customer.  Quantities are integral doubles; summing
    int64 casts == DuckDB's CAST(SUM(..) AS BIGINT), so the gate and
    the output are exact."""
    import ray

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "o_orderkey": t["l_orderkey"].to_numpy(),
            "q": t["l_quantity"].to_numpy().astype(np.int64)})
        g = df.groupby("o_orderkey", as_index=False)["q"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    qty = (li.map_batches(qty_partial, batch_format="pyarrow")
           .groupby("o_orderkey").aggregate(Sum("q", alias_name="total_qty"))
           .map_batches(lambda t: t.filter(
               pc.greater(t["total_qty"], min_qty)), batch_format="pyarrow")
           .repartition(2).materialize())

    keys_ref = ray.put(set(
        int(k) for b in qty.iter_batches(batch_format="pyarrow")
        for k in b["o_orderkey"].to_pylist()))

    def order_gate(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        m = pa.array([int(k) in keys for k in t["o_orderkey"].to_pylist()])
        return t.filter(m)

    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(order_gate, batch_format="pyarrow")
    cust = _t(sf_dir, "customer", ["c_custkey", "c_name"])
    j = orders.join(cust, join_type="inner", num_partitions=4,
                    on=("o_custkey",), right_on=("c_custkey",))
    j2 = j.join(qty, join_type="inner", num_partitions=4,
                on=("o_orderkey",))

    def fin(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_name": t["c_name"],
            "c_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_orderdate": pc.cast(t["o_orderdate"],
                                   pa.timestamp("us")),
            "o_totalprice": t["o_totalprice"],
            "total_qty": pc.cast(t["total_qty"], pa.int64())})
    return j2.map_batches(fin, batch_format="pyarrow") \
        .sort(["o_totalprice", "o_orderdate"], descending=[True, False])


def q10_returned_revenue(sf_dir: str, date_lo: str = "1996-01-01",
                         date_hi: str = "1996-07-01",
                         k: int = 20) -> rd.Dataset:
    """TPC-H Q10 shape (returned-item revenue report): top-k customers
    by revenue lost to returned lineitems in a date window, with the
    nation attached -- the multi-join + top-k-by-revenue shape.

    Scale shape: the returned-lineitem scan collapses to integer
    10^-4-unit revenue partials per orderkey (the q6_revenue exactness
    trick: round(ep*100) * (100-round(disc*100)) in int64) before the
    one orderkey shuffle; date-filtered orders hash-join the revenue,
    the per-customer aggregate is materialized (two-live-join trap),
    ONE hash join attaches the customer, and the nation is a broadcast
    dict lookup.  Revenue ordering and the top-k cut are exact integer
    comparisons; the emitted revenue is one int/1e4 IEEE division,
    bit-identical in both engines."""
    import ray

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"])

    def rev_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        ep = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"l_orderkey": t["l_orderkey"].to_numpy(),
                           "r": ep * (100 - disc)})
        g = df.groupby("l_orderkey", as_index=False)["r"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    rev = li.map_batches(rev_partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("r", alias_name="r"))

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
            .select(["o_orderkey", "o_custkey"]), batch_format="pyarrow")

    per_cust = (orders.join(rev, join_type="inner", num_partitions=8,
                            on=("o_orderkey",), right_on=("l_orderkey",))
                .map_batches(lambda t: t.select(["o_custkey", "r"]),
                             batch_format="pyarrow")
                .groupby("o_custkey").aggregate(Sum("r", alias_name="r"))
                .repartition(2).materialize())

    cust = _t(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey",
                                   "c_acctbal"])
    j = cust.join(per_cust, join_type="inner", num_partitions=4,
                  on=("c_custkey",), right_on=("o_custkey",))

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"])
    nmap_ref = ray.put(dict(zip(nat["n_nationkey"].to_pylist(),
                                nat["n_name"].to_pylist())))

    def fin(t: pa.Table) -> pa.Table:
        nmap = ray.get(nmap_ref)
        names = [nmap[int(x)] for x in t["c_nationkey"].to_pylist()]
        r = t["r"].to_numpy().astype(np.int64)
        return pa.table({
            "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "c_name": t["c_name"],
            "n_name": pa.array(names, pa.string()),
            "c_acctbal": t["c_acctbal"],
            "revenue": pa.array(r.astype(np.float64) / 10000.0),
            "_ri": pa.array(r, pa.int64())})

    out = j.map_batches(fin, batch_format="pyarrow") \
        .sort(["_ri", "c_custkey"], descending=[True, False]).limit(k)
    return out.map_batches(lambda t: t.drop_columns(["_ri"]),
                           batch_format="pyarrow")


def q14_promo_revenue(sf_dir: str, date_lo: str = "1996-09-01",
                      date_hi: str = "1996-10-01") -> pa.Table:
    """TPC-H Q14 (promotion effect): one month of lineitem hash-joined
    to part's promo flag, reduced to two integer revenue sums.  The part
    side ships only (partkey, is_promo) through the join -- at scale
    both sides shuffle once on partkey, nothing is broadcast.  Revenue
    forms in integer 10^-4 units (the q6_revenue discipline); the final
    percentage is two mirrored IEEE ops (mul then div), bit-identical to
    the DuckDB oracle."""
    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    def li_prep(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].to_numpy()
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        cents_p = np.rint(
            t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        cents_d = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "rev": pa.array(cents_p * (100 - cents_d), pa.int64())})

    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow")
    part = _t(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table({
            "l_partkey": pc.cast(t["p_partkey"], pa.int64()),
            "is_promo": pc.equal(t["p_type"], "PROMO")}),
        batch_format="pyarrow")
    j = li.join(part, join_type="inner", on=("l_partkey",),
                num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        rev = t["rev"].to_numpy(zero_copy_only=False)
        pm = t["is_promo"].to_numpy(zero_copy_only=False)
        return pa.table({"promo": pa.array([int(rev[pm].sum())], pa.int64()),
                         "total": pa.array([int(rev.sum())], pa.int64())})

    agg = j.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("promo", alias_name="promo"), Sum("total", alias_name="total"))
    promo, total = int(agg["promo"]), int(agg["total"])
    return pa.table({
        "promo_revenue": pa.array([promo / 10000.0], pa.float64()),
        "total_revenue": pa.array([total / 10000.0], pa.float64()),
        "promo_pct": pa.array([(100.0 * float(promo)) / float(total)],
                              pa.float64())})


def q15_top_supplier(sf_dir: str, date_lo: str = "1996-01-01",
                     date_hi: str = "1996-04-01") -> pa.Table:
    """TPC-H Q15 (top supplier): one quarter's revenue per supplier
    (filtered scan + partial-agg groupby on suppkey -- only (suppkey,
    int-units rev) shuffles), then the max-revenue winners resolve
    driver-side (the post-agg table is one row per supplier, and the
    winner set is O(ties)); names come from a pruned supplier read
    filtered to the winner keys."""
    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    def li_prep(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].to_numpy()
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        cents_p = np.rint(
            t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        cents_d = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        return pa.table({
            "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "rev": pa.array(cents_p * (100 - cents_d), pa.int64())})

    rev = _t(sf_dir, "lineitem",
             ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow") \
        .groupby("s_suppkey").aggregate(Sum("rev", alias_name="rev")) \
        .materialize()
    mx = rev.max("rev")
    winners = {r["s_suppkey"]: r["rev"]
               for r in rev.filter(expr=f"rev == {int(mx)}").take_all()}
    names = _t(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda t: t.filter(pa.array(np.isin(
            t["s_suppkey"].to_numpy(), list(winners)))),
        batch_format="pyarrow").take_all()
    rows = sorted(names, key=lambda r: r["s_suppkey"])
    return pa.table({
        "s_suppkey": pa.array([r["s_suppkey"] for r in rows], pa.int64()),
        "s_name": pa.array([r["s_name"] for r in rows], pa.string()),
        "total_revenue": pa.array(
            [winners[r["s_suppkey"]] / 10000.0 for r in rows],
            pa.float64())})


def q17_small_quantity_revenue(sf_dir: str,
                               brand: str = "Brand#1") -> pa.Table:
    """TPC-H Q17 (small-quantity-order revenue), adapted to the testdata
    schema (no p_container column -- the gate is brand-only): average
    yearly revenue lost if small-quantity orders (below 20% of the
    part's average quantity) moved to a larger program.

    Shape: the brand's partkey set broadcasts (it is p_size-bounded, a
    fraction of the part dim); the brand's lineitems reduce to per-part
    (qty_sum, n) integer partials -> one tiny groupby; the threshold
    joins back via ONE hash join; quantities are integral doubles so
    every sum is exact and the 0.2*avg threshold is the same two IEEE
    ops in both engines."""
    import ray

    pk = _t(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda t: t.filter(pc.equal(t["p_brand"], brand))
        .select(["p_partkey"]), batch_format="pyarrow").take_all()
    keys_ref = ray.put(np.sort(np.array([r["p_partkey"] for r in pk],
                                        np.int64)))

    def li_prep(t: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        k = t["l_partkey"].to_numpy()
        t = t.filter(pa.array(np.isin(k, keys)))
        return pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "qty": pc.cast(t["l_quantity"], pa.float64()),
            "price_c": pa.array(np.rint(
                t["l_extendedprice"].to_numpy() * 100).astype(np.int64),
                pa.int64())})

    # repartition(2) clears ray 2.49's empty-schema zero-row blocks a
    # filtered chain can emit before they reach the hash join (CLAUDE.md)
    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice"]) \
        .map_batches(li_prep, batch_format="pyarrow") \
        .repartition(2).materialize()

    def qpartial(t: pa.Table) -> pa.Table:
        k = t["l_partkey"].to_numpy()
        q = t["qty"].to_numpy()
        uniq, inv = np.unique(k, return_inverse=True)
        qs = np.zeros(len(uniq), np.int64)
        np.add.at(qs, inv, np.rint(q).astype(np.int64))
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({"l_partkey": pa.array(uniq, pa.int64()),
                         "qs": pa.array(qs, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    avg = li.map_batches(qpartial, batch_format="pyarrow") \
        .groupby("l_partkey").aggregate(Sum("qs", alias_name="qs"),
                                        Sum("n", alias_name="n")) \
        .map_batches(
        lambda t: pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "thr": pa.array(
                0.2 * (t["qs"].to_numpy(zero_copy_only=False)
                       / t["n"].to_numpy(zero_copy_only=False)),
                pa.float64())}),
        batch_format="pyarrow").repartition(2)
    j = li.join(avg, join_type="inner", on=("l_partkey",),
                num_partitions=8)

    def spartial(t: pa.Table) -> pa.Table:
        m = t["qty"].to_numpy() < t["thr"].to_numpy(zero_copy_only=False)
        s = int(t["price_c"].to_numpy(zero_copy_only=False)[m].sum())
        return pa.table({"s": pa.array([s], pa.int64())})

    total = j.map_batches(spartial, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"))["s"]
    return pa.table({"avg_yearly": pa.array(
        [float(total) / 100.0 / 7.0], pa.float64())})


def q7_volume_shipping(sf_dir: str, nation_a: str = "NATION_1",
                       nation_b: str = "NATION_2",
                       date_lo: str = "1996-01-01",
                       date_hi: str = "1998-01-01") -> pa.Table:
    """TPC-H Q7 (volume shipping): revenue between two nations by
    (supplier nation, customer nation, ship year).  Supplier nations
    ride a broadcast lookup (supplier is ~1/10000 of lineitem; the
    filtered two-nation slice is tiny), the customer side rides HASH
    joins through orders (both large at scale), and the two join stages
    are separated by a materialize (the two-live-joins lesson).  Revenue
    in integer 10^-4 units, bit-identical to the DuckDB oracle."""
    import ray

    nat = _t(sf_dir, "nation").take_all()
    keys = {n["n_name"]: n["n_nationkey"] for n in nat}
    names = {n["n_nationkey"]: n["n_name"] for n in nat}
    ka, kb = keys[nation_a], keys[nation_b]
    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    s_nat = {r["s_suppkey"]: r["s_nationkey"] for r in supp
             if r["s_nationkey"] in (ka, kb)}
    empty = pa.table({"supp_nation": pa.array([], pa.string()),
                      "cust_nation": pa.array([], pa.string()),
                      "l_year": pa.array([], pa.int64()),
                      "revenue": pa.array([], pa.float64())})
    if not s_nat:
        # no supplier in either nation: the join's left side would be a
        # schemaless empty dataset (ray 2.49 cannot key it) -- the result
        # is exactly empty, so return it schema-stable without executing
        return empty
    s_ref = ray.put((np.sort(np.array(list(s_nat), np.int64)),
                     np.array([s_nat[k] for k in sorted(s_nat)], np.int64)))

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(
        lambda t: t.filter(pa.array(np.isin(
            t["c_nationkey"].to_numpy(), [ka, kb]))),
        batch_format="pyarrow").map_batches(
        lambda t: pa.table({
            "o_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "c_nat": pc.cast(t["c_nationkey"], pa.int64())}),
        batch_format="pyarrow")
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table({
            "l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64())}),
        batch_format="pyarrow")
    ord_cust = orders.join(cust, join_type="inner", on=("o_custkey",),
                           num_partitions=8).map_batches(
        lambda t: t.select(["l_orderkey", "c_nat"]),
        batch_format="pyarrow").repartition(2).materialize()

    def li_prep(t: pa.Table) -> pa.Table:
        skeys, snats = ray.get(s_ref)
        d = t["l_shipdate"].to_numpy()
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        sk = t["l_suppkey"].to_numpy()
        if len(skeys):
            pos = np.clip(np.searchsorted(skeys, sk), 0, len(skeys) - 1)
            m = skeys[pos] == sk
        else:
            m = np.zeros(len(sk), bool)
        t = t.filter(pa.array(m))
        d = t["l_shipdate"].to_numpy()
        cents_p = np.rint(
            t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        cents_d = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        yr = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "s_nat": pa.array(snats[np.searchsorted(
                skeys, t["l_suppkey"].to_numpy())], pa.int64()),
            "l_year": pa.array(yr, pa.int64()),
            "rev": pa.array(cents_p * (100 - cents_d), pa.int64())})

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow").repartition(2)
    full = li.join(ord_cust, join_type="inner", on=("l_orderkey",),
                   num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        sn = t["s_nat"].to_numpy(zero_copy_only=False)
        cn = t["c_nat"].to_numpy(zero_copy_only=False)
        m = sn != cn
        df = pd.DataFrame({"s_nat": sn[m], "c_nat": cn[m],
                           "l_year": t["l_year"]
                           .to_numpy(zero_copy_only=False)[m],
                           "rev": t["rev"].to_numpy(zero_copy_only=False)[m]})
        g = df.groupby(["s_nat", "c_nat", "l_year"], as_index=False)["rev"] \
            .sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = full.map_batches(partial, batch_format="pyarrow") \
        .groupby(["s_nat", "c_nat", "l_year"]) \
        .aggregate(Sum("rev", alias_name="rev"))
    rows = sorted(agg.take_all(),
                  key=lambda r: (names[r["s_nat"]], names[r["c_nat"]],
                                 r["l_year"]))
    return pa.table({
        "supp_nation": pa.array([names[r["s_nat"]] for r in rows],
                                pa.string()),
        "cust_nation": pa.array([names[r["c_nat"]] for r in rows],
                                pa.string()),
        "l_year": pa.array([r["l_year"] for r in rows], pa.int64()),
        "revenue": pa.array([r["rev"] / 10000.0 for r in rows],
                            pa.float64())})


def q8_market_share(sf_dir: str, region: str = "ASIA",
                    nation: str = "NATION_12", ptype: str = "STANDARD",
                    date_lo: str = "1996-01-01",
                    date_hi: str = "1998-01-01") -> pa.Table:
    """TPC-H Q8 (national market share): the deepest join tree in the
    suite -- lineitem x part x orders x customer x nation(2 roles) x
    region x supplier.  One nation's share of the revenue that a
    region's customers spent on one part type, by order year.

    Plan: region/nation dims and the supplier->nation map broadcast
    (dim-scale, the q7 discipline); part rides a HASH join on partkey
    (large at scale) and customer/orders ride a HASH join on custkey;
    the two live joins are separated by materialize.  Revenue in
    integer 10^-4 units; the share is one mirrored IEEE division."""
    import ray

    nat = _t(sf_dir, "nation").take_all()
    reg = _t(sf_dir, "region").take_all()
    rkey = next(r["r_regionkey"] for r in reg if r["r_name"] == region)
    region_nations = {n["n_nationkey"] for n in nat
                      if n["n_regionkey"] == rkey}
    share_key = next(n["n_nationkey"] for n in nat
                     if n["n_name"] == nation)
    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()
    s_map = {r["s_suppkey"]: r["s_nationkey"] for r in supp}
    s_ref = ray.put((np.sort(np.array(list(s_map), np.int64)),
                     np.array([s_map[k] for k in sorted(s_map)], np.int64)))

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]) \
        .map_batches(
        lambda t: pa.table({"o_custkey": pc.cast(t.filter(pa.array(
            np.isin(t["c_nationkey"].to_numpy(),
                    list(region_nations))))["c_custkey"], pa.int64())}),
        batch_format="pyarrow")

    def ord_prep(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy()
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        yr = t["o_orderdate"].to_numpy().astype("datetime64[Y]") \
            .astype(np.int64) + 1970
        return pa.table({
            "l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "o_year": pa.array(yr, pa.int64())})

    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(ord_prep, batch_format="pyarrow")
    ord_cust = orders.join(cust, join_type="inner", on=("o_custkey",),
                           num_partitions=8).map_batches(
        lambda t: t.select(["l_orderkey", "o_year"]),
        batch_format="pyarrow").repartition(2).materialize()

    part = _t(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table({"l_partkey": pc.cast(t.filter(
            pc.equal(t["p_type"], ptype))["p_partkey"], pa.int64())}),
        batch_format="pyarrow").repartition(2)

    def li_prep(t: pa.Table) -> pa.Table:
        skeys, snats = ray.get(s_ref)
        cents_p = np.rint(
            t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        cents_d = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        sn = snats[np.searchsorted(skeys, t["l_suppkey"].to_numpy())]
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "s_nat": pa.array(sn, pa.int64()),
            "rev": pa.array(cents_p * (100 - cents_d), pa.int64())})

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey",
             "l_extendedprice", "l_discount"]) \
        .map_batches(li_prep, batch_format="pyarrow")
    li_part = li.join(part, join_type="inner", on=("l_partkey",),
                      num_partitions=8).map_batches(
        lambda t: t.select(["l_orderkey", "s_nat", "rev"]),
        batch_format="pyarrow").repartition(2).materialize()
    full = li_part.join(ord_cust, join_type="inner", on=("l_orderkey",),
                        num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        yr = t["o_year"].to_numpy(zero_copy_only=False)
        sn = t["s_nat"].to_numpy(zero_copy_only=False)
        rev = t["rev"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "o_year": yr,
            "nat_rev": np.where(sn == share_key, rev, 0),
            "tot_rev": rev})
        g = df.groupby("o_year", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = full.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_year").aggregate(Sum("nat_rev", alias_name="nat_rev"),
                                     Sum("tot_rev", alias_name="tot_rev"))
    rows = sorted(agg.take_all(), key=lambda r: r["o_year"])
    return pa.table({
        "o_year": pa.array([r["o_year"] for r in rows], pa.int64()),
        "mkt_share": pa.array(
            [float(r["nat_rev"]) / float(r["tot_rev"]) for r in rows],
            pa.float64())})


def q22_inactive_customers(sf_dir: str,
                           since: str = "1999-01-01") -> pa.Table:
    """TPC-H Q22 shape adapted to the testdata schema (no c_phone
    column -- the country gate becomes the nation key; "never ordered"
    becomes DORMANT since ``since``, because this testdata's order keys
    cover nearly every customer): per nation, the wealthy customers
    (account balance above the positive-balance average) with no order
    since the cutoff.  The ANTI-JOIN shape (SQL NOT EXISTS): wealthy
    customers left_outer-join the recent order custkeys and keep the
    null-marker rows.

    Exactness: balances form integer cents; the average threshold is one
    mirrored IEEE division; the final sums are integer cents / 100.0."""
    cust = _t(sf_dir, "customer",
              ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        lambda t: pa.table({
            "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
            "nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            "bal_c": pa.array(np.rint(
                t["c_acctbal"].to_numpy() * 100).astype(np.int64),
                pa.int64())}),
        batch_format="pyarrow").materialize()

    def thr_partial(t: pa.Table) -> pa.Table:
        b = t["bal_c"].to_numpy(zero_copy_only=False)
        pos = b[b > 0]
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    agg = cust.map_batches(thr_partial, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    thr = float(agg["s"]) / float(agg["n"])

    wealthy = cust.map_batches(
        lambda t: t.filter(pa.array(
            t["bal_c"].to_numpy(zero_copy_only=False) > thr)),
        batch_format="pyarrow").repartition(2)
    lo = np.datetime64(since)
    okeys = _t(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({"c_custkey": pc.cast(t.filter(pa.array(
            t["o_orderdate"].to_numpy() >= lo))["o_custkey"], pa.int64())}),
        batch_format="pyarrow") \
        .groupby("c_custkey").aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: pa.table({
            "c_custkey": t["c_custkey"],
            "has_order": pa.array([True] * t.num_rows, pa.bool_())}),
        batch_format="pyarrow").repartition(2)
    j = wealthy.join(okeys, join_type="left_outer", on=("c_custkey",),
                     num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        miss = pc.is_null(t["has_order"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "nationkey": t["nationkey"].to_numpy(zero_copy_only=False)[miss],
            "bal_c": t["bal_c"].to_numpy(zero_copy_only=False)[miss]})
        g = df.groupby("nationkey", as_index=False).agg(
            n_custs=("bal_c", "size"), bal=("bal_c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("nationkey").aggregate(
        Sum("n_custs", alias_name="n_custs"),
        Sum("bal", alias_name="bal")).take_all()
    rows.sort(key=lambda r: r["nationkey"])
    return pa.table({
        "nationkey": pa.array([r["nationkey"] for r in rows], pa.int64()),
        "n_custs": pa.array([int(r["n_custs"]) for r in rows], pa.int64()),
        "total_acctbal": pa.array([r["bal"] / 100.0 for r in rows],
                                  pa.float64())})


def q9_product_profit(sf_dir: str, name_token: str = "red") -> pa.Table:
    """TPC-H Q9 (product-type profit), ADAPTED to the testdata schema:
    there is no partsupp table, so supply cost stands in as
    ``p_retailprice * l_quantity`` (ref TPC-H Q9's
    ps_supplycost*l_quantity).  The deepest fact-side chain in the
    suite: lineitem ⋈ part(name filter) ⋈ orders ⋈ supplier, nation
    names broadcast, profit rolled up by (nation, order year).

    Plan: the name filter prunes part BEFORE its hash join (and the
    filtered chain is repartitioned -- the ray 2.49 empty-schema-block
    trap); each live join materializes before the next (the
    two-live-joins deadlock lesson); profit forms in integer 10^-4
    currency units (rev = cents*(100-d_cents); cost =
    retail_cents*100*qty), so distributed sums are order-independent
    and the final doubles are bit-identical to the DuckDB oracle."""
    nat = _t(sf_dir, "nation").take_all()
    names = {int(n["n_nationkey"]): n["n_name"] for n in nat}

    def part_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.match_substring(t["p_name"], name_token))
        rc = np.rint(t["p_retailprice"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        return pa.table({
            "l_partkey": pc.cast(t["p_partkey"], pa.int64()),
            "retail_cents": pa.array(rc, pa.int64())})

    part = _t(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]) \
        .map_batches(part_prep, batch_format="pyarrow").repartition(2)

    def li_prep(t: pa.Table) -> pa.Table:
        cents_p = np.rint(
            t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        cents_d = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = np.rint(t["l_quantity"].to_numpy()).astype(np.int64)
        return pa.table({
            "l_orderkey": pc.cast(t["l_orderkey"], pa.int64()),
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "s_suppkey": pc.cast(t["l_suppkey"], pa.int64()),
            "rev": pa.array(cents_p * (100 - cents_d), pa.int64()),
            "qty": pa.array(qty, pa.int64())})

    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
             "l_discount", "l_quantity"]) \
        .map_batches(li_prep, batch_format="pyarrow")
    li_part = li.join(part, join_type="inner", on=("l_partkey",),
                      num_partitions=8).map_batches(
        lambda t: pa.table({
            "l_orderkey": t["l_orderkey"],
            "s_suppkey": t["s_suppkey"],
            "profit": pc.subtract(
                t["rev"],
                pc.multiply(
                    pc.multiply(t["retail_cents"],
                                pa.scalar(100, pa.int64())),
                    t["qty"]))}),
        batch_format="pyarrow").materialize()

    def ord_prep(t: pa.Table) -> pa.Table:
        years = (t["o_orderdate"].to_numpy().astype("datetime64[Y]")
                 .astype(np.int64) + 1970)
        return pa.table({
            "l_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_year": pa.array(years, pa.int64())})

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(ord_prep, batch_format="pyarrow")
    li_ord = li_part.join(orders, join_type="inner", on=("l_orderkey",),
                          num_partitions=8).materialize()

    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]) \
        .map_batches(lambda t: pa.table({
            "s_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
            "s_nation": pc.cast(t["s_nationkey"], pa.int64())}),
        batch_format="pyarrow")
    full = li_ord.join(supp, join_type="inner", on=("s_suppkey",),
                       num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        key = (t["s_nation"].to_numpy(zero_copy_only=False) * 10_000
               + t["o_year"].to_numpy(zero_copy_only=False))
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, t["profit"].to_numpy(zero_copy_only=False))
        return pa.table({"k": pa.array(uniq, pa.int64()),
                         "profit": pa.array(sums, pa.int64())})

    agg = full.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("profit", alias_name="profit"))
    rows = sorted(agg.take_all(),
                  key=lambda r: (names[r["k"] // 10_000],
                                 -(r["k"] % 10_000)))
    return pa.table({
        "nation": pa.array([names[r["k"] // 10_000] for r in rows],
                           pa.string()),
        "o_year": pa.array([r["k"] % 10_000 for r in rows], pa.int64()),
        "profit": pa.array([r["profit"] / 10_000.0 for r in rows],
                           pa.float64())})


def q16_supplier_part_counts(
        sf_dir: str, exclude_brand: str = "Brand#7",
        exclude_type_prefix: str = "LARGE",
        sizes: tuple = (1, 3, 9, 14, 19, 23, 36, 45)) -> pa.Table:
    """TPC-H Q16 (parts/supplier relationship), ADAPTED: the supplier
    relation comes from lineitem (who actually shipped the part) since
    the testdata has no partsupp table.  COUNT(DISTINCT supplier) per
    (brand, type, size) -- the canonical distributed count-distinct
    shape: local distinct partials, one groupby on the full distinct
    key, then tiny per-batch count partials into a second groupby."""
    def part_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.invert(pc.equal(t["p_brand"], exclude_brand)),
            pc.invert(pc.starts_with(t["p_type"], exclude_type_prefix)))
        m = pc.and_(m, pc.is_in(t["p_size"],
                                value_set=pa.array(sizes, pa.int32())))
        t = t.filter(m)
        return pa.table({
            "l_partkey": pc.cast(t["p_partkey"], pa.int64()),
            "p_brand": t["p_brand"], "p_type": t["p_type"],
            "p_size": pc.cast(t["p_size"], pa.int64())})

    part = _t(sf_dir, "part",
              ["p_partkey", "p_brand", "p_type", "p_size"]) \
        .map_batches(part_prep, batch_format="pyarrow").repartition(2)
    li = _t(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]) \
        .map_batches(lambda t: pa.table({
            "l_partkey": pc.cast(t["l_partkey"], pa.int64()),
            "l_suppkey": pc.cast(t["l_suppkey"], pa.int64())}),
        batch_format="pyarrow")
    joined = li.join(part, join_type="inner", on=("l_partkey",),
                     num_partitions=8)

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.select(["p_brand", "p_type", "p_size", "l_suppkey"]) \
            .group_by(["p_brand", "p_type", "p_size", "l_suppkey"]) \
            .aggregate([])

    distinct = joined.map_batches(local_distinct, batch_format="pyarrow") \
        .groupby(["p_brand", "p_type", "p_size", "l_suppkey"]) \
        .aggregate(Count(alias_name="_n"))

    def count_partial(t: pa.Table) -> pa.Table:
        return t.select(["p_brand", "p_type", "p_size"]) \
            .group_by(["p_brand", "p_type", "p_size"]) \
            .aggregate([([], "count_all")]) \
            .rename_columns(["p_brand", "p_type", "p_size", "n"])

    rows = distinct.map_batches(count_partial, batch_format="pyarrow") \
        .groupby(["p_brand", "p_type", "p_size"]) \
        .aggregate(Sum("n", alias_name="supplier_cnt")).take_all()
    rows.sort(key=lambda r: (-r["supplier_cnt"], r["p_brand"],
                             r["p_type"], r["p_size"]))
    return pa.table({
        "p_brand": pa.array([r["p_brand"] for r in rows], pa.string()),
        "p_type": pa.array([r["p_type"] for r in rows], pa.string()),
        "p_size": pa.array([r["p_size"] for r in rows], pa.int64()),
        "supplier_cnt": pa.array([int(r["supplier_cnt"]) for r in rows],
                                 pa.int64())})


def revenue_rollup(sf_dir: str) -> pa.Table:
    """GROUP BY ROLLUP(year, quarter) over order revenue -- the
    multi-level subtotal shape (detail rows + per-year subtotals + one
    grand total, NULL marking each aggregated-out level, exactly
    DuckDB's ROLLUP output).

    Plan: one pass of per-batch integer-cent partials into a tiny
    (year, quarter) groupby; the three rollup levels then derive on the
    driver from that O(years x 4) table -- re-aggregating upward from
    exact integer sums, so every level is bit-identical to the oracle.
    Nullable group keys surface as float64 (NaN = rolled up): DuckDB's
    nullable BIGINT comes back as float64 through .df(), so matching
    dtypes on the engine side is what makes the compare exact."""
    def partial(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy()
        years = d.astype("datetime64[Y]").astype(np.int64) + 1970
        months = d.astype("datetime64[M]").astype(np.int64) % 12
        quarters = months // 3 + 1
        cents = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        key = years * 10 + quarters
        uniq, inv = np.unique(key, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        cnts = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, cents)
        np.add.at(cnts, inv, 1)
        return pa.table({"k": pa.array(uniq, pa.int64()),
                         "cents": pa.array(sums, pa.int64()),
                         "n": pa.array(cnts, pa.int64())})

    rows = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("cents", alias_name="cents"),
                                Sum("n", alias_name="n")).take_all()
    detail = sorted((r["k"] // 10, r["k"] % 10, int(r["cents"]), int(r["n"]))
                    for r in rows)
    years: dict[int, list[int]] = {}
    for y, q, c, n in detail:
        acc = years.setdefault(y, [0, 0])
        acc[0] += c
        acc[1] += n
    out_y, out_q, out_c, out_n = [], [], [], []
    for y, q, c, n in detail:
        out_y.append(float(y)); out_q.append(float(q))
        out_c.append(c); out_n.append(n)
    for y in sorted(years):
        out_y.append(float(y)); out_q.append(None)
        out_c.append(years[y][0]); out_n.append(years[y][1])
    out_y.append(None); out_q.append(None)
    out_c.append(sum(v[0] for v in years.values()))
    out_n.append(sum(v[1] for v in years.values()))
    return pa.table({
        "o_year": pa.array(out_y, pa.float64()),
        "o_quarter": pa.array(out_q, pa.float64()),
        "revenue": pa.array([c / 100.0 for c in out_c], pa.float64()),
        "n_orders": pa.array(out_n, pa.int64())})


def spend_magnitude_histogram(sf_dir: str) -> pa.Table:
    """Order-of-magnitude histogram of event spend: events bucketed by
    the BIT LENGTH of their floor-cents value (the integer-exact log2
    bucket -- float log2 wobbles at power-of-two boundaries, frexp's
    exponent does not: cents < 2^53 make the float64 representation
    exact).  One partial pass, one tiny groupby."""
    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(t["value"].to_numpy() * 100).astype(np.int64)
        cents = np.maximum(cents, 0)
        _, exp = np.frexp(cents.astype(np.float64))
        bl = exp.astype(np.int64)   # bit_length; 0 stays 0
        uniq, cnt = np.unique(bl, return_counts=True)
        return pa.table({"magnitude": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    rows = _t(sf_dir, "events", ["value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("magnitude").aggregate(Sum("n", alias_name="n")) \
        .take_all()
    rows.sort(key=lambda r: r["magnitude"])
    return pa.table({
        "magnitude": pa.array([int(r["magnitude"]) for r in rows],
                              pa.int64()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64())})


# ---------------------------------------------------- synthesized partsupp
# The slim testdata has no partsupp table; the classic TPC-H generation
# rule (4 suppliers per part at fixed offsets, dbgen's layout) is
# re-derived as a pure integer formula over (p_partkey, supplier count),
# so the engine AND the DuckDB oracle can each synthesize the identical
# table without materializing it anywhere:
#   ps_suppkey  = (p_partkey + i*((S+3)//4)) % S        for i in 0..3
#   ps_availqty = (p_partkey*7  + ps_suppkey*11) % 5000 + 1
#   ps_cost_c   = (p_partkey*31 + ps_suppkey*17) % 99901 + 100   (cents)
# All keys in the testdata are 0-based; every op is non-negative integer
# arithmetic, so numpy % == DuckDB % and the tables match bit for bit.
# This unlocks the partsupp third of TPC-H (Q2 / Q11 / Q20) as real
# distributed pipelines: partsupp is generated INSIDE map_batches over
# the part scan (4x row expansion, never shipped from the driver).

def _supplier_count(sf_dir: str) -> int:
    return pq.ParquetFile(
        os.path.join(sf_dir, "supplier.parquet")).metadata.num_rows


def _partsupp_batch(t: pa.Table, S: int, carry: list[str] = ()) -> pa.Table:
    """Expand a part batch to its 4 synthesized partsupp rows each
    (vectorized np.repeat/tile -- no Python per row)."""
    pk = t["p_partkey"].to_numpy().astype(np.int64)
    n = len(pk)
    pk4 = np.repeat(pk, 4)
    i4 = np.tile(np.arange(4, dtype=np.int64), n)
    # floor step: 3*(S//4) < S, so the four offsets never wrap past S
    # and the suppkeys are always DISTINCT (ceil stepped past S for
    # S % 4 != 0, e.g. S=9 -> {0,3,6,0}; hypothesis-found)
    sk = (pk4 + i4 * (S // 4)) % S
    cols = {
        "ps_partkey": pa.array(pk4, pa.int64()),
        "ps_suppkey": pa.array(sk, pa.int64()),
        "ps_availqty": pa.array((pk4 * 7 + sk * 11) % 5000 + 1, pa.int64()),
        "ps_cost_c": pa.array((pk4 * 31 + sk * 17) % 99901 + 100,
                              pa.int64()),
    }
    for c in carry:
        cols[c] = t[c].take(pa.array(np.repeat(np.arange(n), 4)))
    return pa.table(cols)


# shared SQL prefix mirroring the same synthesis (oracle side)
PARTSUPP_SQL = """
    sc AS (SELECT COUNT(*) AS s FROM supplier),
    ps0 AS (
        SELECT p_partkey, p_size, p_type,
               (p_partkey + t.i * (sc.s // 4)) % sc.s AS ps_suppkey
        FROM part CROSS JOIN sc
             CROSS JOIN (SELECT UNNEST(range(0, 4)) AS i) t),
    ps AS (
        SELECT p_partkey AS ps_partkey, ps_suppkey, p_size, p_type,
               (p_partkey * 7  + ps_suppkey * 11) % 5000 + 1 AS ps_availqty,
               (p_partkey * 31 + ps_suppkey * 17) % 99901 + 100 AS ps_cost_c
        FROM ps0)
"""


_Q2_SCHEMA = pa.schema([("s_acctbal", pa.float64()),
                        ("s_name", pa.string()),
                        ("n_name", pa.string()),
                        ("p_partkey", pa.int64()),
                        ("supply_cost", pa.float64())])


def q2_min_cost_supplier(sf_dir: str, size: int = 15,
                         ptype: str = "STANDARD", region: str = "ASIA",
                         k: int = 100) -> pa.Table:
    """TPC-H Q2 (minimum-cost supplier) over the synthesized partsupp:
    for every part of one size+type, the cheapest supplier(s) inside a
    region, ranked by account balance.

    Scale shape: the part scan filters FIRST (size+type prune), then
    expands 4x to partsupp inside map_batches; the supplier side is
    region-gated via the broadcast nation set before its ONE hash join;
    the per-part minimum is a groupby on the already-joined (bounded)
    eligible table joined back by (partkey, cost) equality -- integer
    cents, so the tie semantics are exact.  Each live hash join
    materializes before the next (two-live-joins deadlock lesson).
    Final ordering uses integer balance cents; ties break through
    (n_name, s_name, partkey), a total order."""
    import ray

    S = _supplier_count(sf_dir)

    reg = _t(sf_dir, "region").take_all()
    rkey = next(r["r_regionkey"] for r in reg if r["r_name"] == region)
    nat = _t(sf_dir, "nation").take_all()
    nkeys = {n["n_nationkey"] for n in nat if n["n_regionkey"] == rkey}
    names = {n["n_nationkey"]: n["n_name"] for n in nat}
    names_ref = ray.put(names)

    # p_size <= size (a range gate keeps the slice non-trivial at every
    # sf; an equality gate selects ~n_parts/300 rows and can go EMPTY at
    # tiny scales -- an all-empty join side cannot be keyed at all, the
    # q7/q17 lesson) -- mirrored in the oracle
    pt = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                       columns=["p_partkey", "p_size", "p_type"])
    pt = pt.filter(pc.and_(pc.less_equal(pt["p_size"], size),
                           pc.equal(pt["p_type"], ptype)))
    if pt.num_rows == 0:
        return _Q2_SCHEMA.empty_table()
    ps = rd.from_arrow(pt).map_batches(
        lambda t: _partsupp_batch(t, S), batch_format="pyarrow") \
        .repartition(2)

    def supp_prep(t: pa.Table) -> pa.Table:
        nm = ray.get(names_ref)
        t = t.filter(pa.array(np.isin(
            t["s_nationkey"].to_numpy(zero_copy_only=False), list(nkeys))))
        nk = t["s_nationkey"].to_pylist()
        return pa.table({
            "ps_suppkey": pc.cast(t["s_suppkey"], pa.int64()),
            "s_name": t["s_name"],
            "s_acctbal": pc.cast(t["s_acctbal"], pa.float64()),
            "bal_c": pa.array(np.rint(
                t["s_acctbal"].to_numpy() * 100).astype(np.int64)),
            "n_name": pa.array([nm[int(x)] for x in nk], pa.string())})

    supp = _t(sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal",
                                   "s_nationkey"]) \
        .map_batches(supp_prep, batch_format="pyarrow").repartition(2)

    eligible = ps.join(supp, join_type="inner", on=("ps_suppkey",),
                       num_partitions=4).materialize()
    mn = eligible.groupby("ps_partkey") \
        .aggregate(Min("ps_cost_c", alias_name="mc")).repartition(2) \
        .materialize()
    win = eligible.join(mn, join_type="inner", on=("ps_partkey",),
                        num_partitions=4).map_batches(
        lambda t: t.filter(pc.equal(t["ps_cost_c"], t["mc"])),
        batch_format="pyarrow")

    rows = win.take_all()
    rows.sort(key=lambda r: (-r["bal_c"], r["n_name"], r["s_name"],
                             r["ps_partkey"]))
    rows = rows[:k]
    return pa.table({
        "s_acctbal": pa.array([r["s_acctbal"] for r in rows], pa.float64()),
        "s_name": pa.array([r["s_name"] for r in rows], pa.string()),
        "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
        "p_partkey": pa.array([r["ps_partkey"] for r in rows], pa.int64()),
        "supply_cost": pa.array([r["ps_cost_c"] / 100.0 for r in rows],
                                pa.float64())})


def q11_important_stock(sf_dir: str, nation: str = "NATION_12") -> pa.Table:
    """TPC-H Q11 (important stock identification): per-part stock value
    (cost x availqty, integer cents) held by one nation's suppliers,
    keeping parts whose value exceeds the MEAN part value -- the
    global-threshold-then-filter shape (stock Q11's fraction threshold,
    made scale-free).  The nation's supplier keys broadcast (one
    nation's suppliers = a dim slice); partsupp generates inside
    map_batches; the per-part aggregate is integer-exact, and the
    threshold (total // n_parts, integer floor division) is computed
    once from the tiny aggregate and applied driver-side."""
    S = _supplier_count(sf_dir)
    nat = _t(sf_dir, "nation").take_all()
    nkey = next(n["n_nationkey"] for n in nat if n["n_name"] == nation)
    sk = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                       columns=["s_suppkey", "s_nationkey"])
    skeys = np.sort(sk.filter(pc.equal(sk["s_nationkey"], nkey))
                    ["s_suppkey"].to_numpy().astype(np.int64))

    def partial(t: pa.Table) -> pa.Table:
        e = _partsupp_batch(t, S)
        m = np.isin(e["ps_suppkey"].to_numpy(), skeys)
        e = e.filter(pa.array(m))
        pk = e["ps_partkey"].to_numpy()
        v = e["ps_cost_c"].to_numpy() * e["ps_availqty"].to_numpy()
        uniq, inv = np.unique(pk, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, v)
        return pa.table({"p_partkey": pa.array(uniq, pa.int64()),
                         "v": pa.array(sums, pa.int64())})

    g = _t(sf_dir, "part", ["p_partkey"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("p_partkey").aggregate(Sum("v", alias_name="v")) \
        .materialize()
    tot = g.aggregate(Sum("v", alias_name="t"), Count(alias_name="n"))
    thr = int(tot["t"]) // int(tot["n"])
    rows = g.filter(expr=f"v > {thr}").take_all()
    rows.sort(key=lambda r: (-r["v"], r["p_partkey"]))
    return pa.table({
        "p_partkey": pa.array([r["p_partkey"] for r in rows], pa.int64()),
        "stock_value": pa.array([r["v"] / 100.0 for r in rows],
                                pa.float64())})


def q20_promotion_parts(sf_dir: str, ptype: str = "SMALL",
                        date_lo: str = "1996-01-01",
                        date_hi: str = "1997-01-01") -> pa.Table:
    """TPC-H Q20 (potential part promotion): suppliers holding excess
    stock (availqty > half the year's shipped quantity) of a part type,
    reported with their nation -- the semi-join-of-semi-join shape.
    (Stock Q20 gates one nation; a single nation holds ~S/25 suppliers
    and goes empty at tiny scales, so the nation is an output column
    instead -- same join structure.)

    Scale shape: the year's lineitem scan collapses to per-batch
    (partkey, suppkey) integer quantity partials before its ONE
    composite-key shuffle; partsupp generates from the type-filtered
    part scan; the availqty gate is a composite-key hash join
    (2*availqty > qty, integer-exact); candidate suppliers collapse by
    groupby and the nation gate + name attach happen on the tiny
    winner set driver-side."""
    S = _supplier_count(sf_dir)
    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    def li_partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].to_numpy()
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        df = pd.DataFrame({
            "ps_partkey": t["l_partkey"].to_numpy().astype(np.int64),
            "ps_suppkey": t["l_suppkey"].to_numpy().astype(np.int64),
            "q": np.rint(t["l_quantity"].to_numpy()).astype(np.int64)})
        g = df.groupby(["ps_partkey", "ps_suppkey"], as_index=False)["q"] \
            .sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    shipped = _t(sf_dir, "lineitem",
                 ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow") \
        .groupby(["ps_partkey", "ps_suppkey"]) \
        .aggregate(Sum("q", alias_name="q")).repartition(2)

    ps = _t(sf_dir, "part", ["p_partkey", "p_type"]) \
        .map_batches(lambda t: _partsupp_batch(
            t.filter(pc.equal(t["p_type"], ptype)), S),
            batch_format="pyarrow").repartition(2)

    j = ps.join(shipped, join_type="inner",
                on=("ps_partkey", "ps_suppkey"), num_partitions=4)
    cand = j.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t["ps_availqty"], pa.scalar(2)), t["q"]))
        .select(["ps_suppkey"]), batch_format="pyarrow") \
        .groupby("ps_suppkey").aggregate(Count(alias_name="_c"))
    ckeys = {int(r["ps_suppkey"]) for r in cand.take_all()}

    nat = _t(sf_dir, "nation").take_all()
    names = {n["n_nationkey"]: n["n_name"] for n in nat}
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    rows = [(names[int(nk)], n, int(k))
            for k, n, nk in zip(sup["s_suppkey"].to_pylist(),
                                sup["s_name"].to_pylist(),
                                sup["s_nationkey"].to_pylist())
            if int(k) in ckeys]
    rows.sort()
    return pa.table({
        "n_name": pa.array([r[0] for r in rows], pa.string()),
        "s_name": pa.array([r[1] for r in rows], pa.string()),
        "s_suppkey": pa.array([r[2] for r in rows], pa.int64())})


def q12_ship_lag_priority(sf_dir: str, late_days: int = 60,
                          date_lo: str = "1996-01-01",
                          date_hi: str = "1997-01-01") -> rd.Dataset:
    """TPC-H Q12 shape (shipping-mode priority), adapted to the slim
    schema (no l_shipmode / receiptdate): lineitems bucket by ship LAG
    (days between order date and ship date, fast < late_days <= slow)
    and each bucket counts high-priority vs low-priority orders -- the
    join + CASE-sum rollup.  One hash join (both sides column-pruned,
    lineitem date-filtered first), per-batch integer CASE partials, a
    two-row groupby.  Pure counts: exact vs DuckDB."""
    lo, hi = np.datetime64(date_lo), np.datetime64(date_hi)

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]) \
        .map_batches(lambda t: t.filter(pa.array(
            (t["l_shipdate"].to_numpy() >= lo)
            & (t["l_shipdate"].to_numpy() < hi))),
            batch_format="pyarrow").repartition(2)
    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = li.join(orders, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        lag = (t["l_shipdate"].to_numpy() - t["o_orderdate"].to_numpy()) \
            / np.timedelta64(1, "D")
        slow = lag >= late_days
        pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = (pr == "1-URGENT") | (pr == "2-HIGH")
        return pa.table({
            "ship_bucket": pa.array(["fast", "slow"], pa.string()),
            "high_line_count": pa.array(
                [int((~slow & high).sum()), int((slow & high).sum())],
                pa.int64()),
            "low_line_count": pa.array(
                [int((~slow & ~high).sum()), int((slow & ~high).sum())],
                pa.int64())})

    out = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("ship_bucket").aggregate(
            Sum("high_line_count", alias_name="high_line_count"),
            Sum("low_line_count", alias_name="low_line_count"))
    return out.map_batches(
        lambda t: pa.table({
            "ship_bucket": t["ship_bucket"],
            "high_line_count": pc.cast(t["high_line_count"], pa.int64()),
            "low_line_count": pc.cast(t["low_line_count"], pa.int64())}),
        batch_format="pyarrow").sort("ship_bucket")


_Q19_BRACKETS = (  # (brand, size_lo, size_hi, qty_lo, qty_hi, dc_lo, dc_hi)
    ("Brand#12", 1, 5, 1, 11, 2, 4),
    ("Brand#23", 1, 10, 10, 20, 4, 6),
    ("Brand#34", 1, 15, 20, 30, 6, 8),
)


def q19_discounted_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19 (discounted revenue): revenue from lineitems matching
    any of three (brand, size-range, quantity-range, discount-range)
    brackets -- the join-then-multi-predicate shape.  ONE hash join on
    partkey ships only (brand, size); every bracket test is a
    vectorized mask over integer discount cents / integral quantities;
    revenue accumulates in integer 10^-4 units (q6_revenue discipline)
    so the scalar is bit-identical to the oracle."""
    part = _t(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]) \
        .map_batches(lambda t: pa.table({
            "l_partkey": pc.cast(t["p_partkey"], pa.int64()),
            "p_brand": t["p_brand"],
            "p_size": pc.cast(t["p_size"], pa.int64())}),
            batch_format="pyarrow")
    li = _t(sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]) \
        .map_batches(lambda t: t.set_column(
            t.column_names.index("l_partkey"), "l_partkey",
            pc.cast(t["l_partkey"], pa.int64())), batch_format="pyarrow")
    j = li.join(part, join_type="inner", on=("l_partkey",),
                num_partitions=8)

    def partial(t: pa.Table) -> pa.Table:
        brand = t["p_brand"].to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False)
        qty = np.rint(t["l_quantity"].to_numpy()).astype(np.int64)
        dc = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        m = np.zeros(len(brand), bool)
        for b, s0, s1, q0, q1, d0, d1 in _Q19_BRACKETS:
            m |= ((brand == b) & (size >= s0) & (size <= s1)
                  & (qty >= q0) & (qty <= q1) & (dc >= d0) & (dc <= d1))
        cents_p = np.rint(
            t["l_extendedprice"].to_numpy()[m] * 100).astype(np.int64)
        s = int((cents_p * (100 - dc[m])).sum())
        return pa.table({"s": pa.array([s], pa.int64())})

    total = j.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"))["s"]
    return pa.table({"revenue": pa.array([float(total) / 10000.0],
                                         pa.float64())})


def q21_waiting_suppliers(sf_dir: str, k: int = 25) -> pa.Table:
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    the slim schema (no commit/receipt dates): in finished multi-supplier
    orders, the supplier whose lineitems shipped LAST (unique latest max
    shipdate) "kept the order waiting" -- the double-existential
    (EXISTS other supplier / NOT EXISTS other equally-late supplier)
    re-expressed as exact aggregates.

    Scale shape: lineitem hash-joins the F-status order keys once;
    (orderkey, suppkey, max shipdate) collapses via per-batch pandas
    partials -> composite groupby; the per-order rollup is an
    aggregate + join back (the span_dup_stats lesson: never map_groups
    over millions of tiny groups), filtered to unique-latest winners;
    the per-supplier count is a tiny final groupby with names attached
    from the pruned supplier read.  Timestamps compare as int64
    microseconds; counts are exact."""
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["o_orderstatus"], "F")).select(["o_orderkey"]),
            batch_format="pyarrow").repartition(2)
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    j = li.join(orders, join_type="inner", num_partitions=8,
                on=("l_orderkey",), right_on=("o_orderkey",)).materialize()

    def a_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "l_orderkey": t["l_orderkey"].to_numpy().astype(np.int64),
            "l_suppkey": t["l_suppkey"].to_numpy().astype(np.int64),
            "sd": pc.cast(t["l_shipdate"], pa.int64()).to_numpy()})
        g = df.groupby(["l_orderkey", "l_suppkey"], as_index=False)["sd"] \
            .max()
        return pa.Table.from_pandas(g, preserve_index=False)

    a = j.map_batches(a_partial, batch_format="pyarrow") \
        .groupby(["l_orderkey", "l_suppkey"]) \
        .aggregate(Max("sd", alias_name="sd")).repartition(4).materialize()

    o = a.groupby("l_orderkey").aggregate(
        Max("sd", alias_name="mx"), Count(alias_name="n_supp")) \
        .repartition(4).materialize()
    w = a.join(o, join_type="inner", on=("l_orderkey",),
               num_partitions=4).map_batches(
        lambda t: t.filter(pc.and_(
            pc.equal(t["sd"], t["mx"]),
            pc.greater(t["n_supp"], 1))).select(
            ["l_orderkey", "l_suppkey"]),
        batch_format="pyarrow").repartition(2).materialize()
    u = w.groupby("l_orderkey").aggregate(Count(alias_name="n_at_max")) \
        .map_batches(lambda t: t.filter(pc.equal(t["n_at_max"], 1)),
                     batch_format="pyarrow").repartition(2).materialize()
    wins = w.join(u, join_type="inner", on=("l_orderkey",),
                  num_partitions=4)
    per_supp = wins.groupby("l_suppkey").aggregate(
        Count(alias_name="numwait")).take_all()

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_name"])
    names = dict(zip(sup["s_suppkey"].to_pylist(),
                     sup["s_name"].to_pylist()))
    rows = [(names[int(r["l_suppkey"])], int(r["numwait"]))
            for r in per_supp]
    rows.sort(key=lambda x: (-x[1], x[0]))
    rows = rows[:k]
    return pa.table({
        "s_name": pa.array([r[0] for r in rows], pa.string()),
        "numwait": pa.array([r[1] for r in rows], pa.int64())})


_PROFILE_COLS = ("event_id", "ts", "user_id", "event_type", "value",
                 "props")


def table_profile(sf_dir: str) -> pa.Table:
    """Column-statistics profiler over the events table (the generic
    data-quality pass every ingestion pipeline runs first): per column
    row count, null count, and min/max (numerics as DOUBLE, timestamps
    as epoch microseconds, strings profile NULL min/max -- the typed
    matrix stays rectangular).  One streamed pass: each batch emits ONE
    partial row per column (never values), the groupby is
    column-bounded.  min/max involve no summation, so doubles match
    DuckDB bit for bit."""
    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, vmins, vmaxs = [], [], [], [], []
        for c in _PROFILE_COLS:
            a = t[c]
            names.append(c)
            ns.append(len(a))
            nulls.append(a.null_count)
            if pa.types.is_timestamp(a.type):
                a = pc.cast(a, pa.int64())
            if (pa.types.is_integer(a.type)
                    or pa.types.is_floating(a.type)):
                mm = pc.min_max(a)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
                vmins.append(None if mn is None else float(mn))
                vmaxs.append(None if mx is None else float(mx))
            else:
                vmins.append(None)
                vmaxs.append(None)
        return pa.table({
            "col_name": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "vmin": pa.array(vmins, pa.float64()),
            "vmax": pa.array(vmaxs, pa.float64())})

    agg = _t(sf_dir, "events", list(_PROFILE_COLS)) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("col_name").aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("vmin", alias_name="vmin"),
            Max("vmax", alias_name="vmax"))
    rows = agg.take_all()
    rows.sort(key=lambda r: r["col_name"])
    return pa.table({
        "col_name": pa.array([r["col_name"] for r in rows], pa.string()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        "n_null": pa.array([int(r["n_null"]) for r in rows], pa.int64()),
        "vmin": pa.array([r["vmin"] for r in rows], pa.float64()),
        "vmax": pa.array([r["vmax"] for r in rows], pa.float64())})


def key_skew_report(sf_dir: str, topk: int = 10) -> pa.Table:
    """Join-key skew detector over lineitem's partkey -- the pre-flight
    check a 100-TB shuffle plan runs before picking salting factors
    (the politeness derive_salt_counts discipline, applied to a
    relational key): total rows, distinct keys, and the ppm share of
    the hottest 1 / hottest ``topk`` keys.  Per-batch partial counts ->
    one key-bounded groupby; the top-share scan sorts only the tiny
    aggregate.  Integer ppm (x * 1e6 // total), exact vs DuckDB."""
    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["l_partkey"].combine_chunks())
        return pa.table({"k": pc.cast(vc.field("values"), pa.int64()),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = _t(sf_dir, "lineitem", ["l_partkey"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n", alias_name="n")).materialize()
    tot = counts.aggregate(Sum("n", alias_name="t"),
                           Count(alias_name="n_keys"))
    total, n_keys = int(tot["t"]), int(tot["n_keys"])
    top = counts.sort(["n", "k"], descending=[True, False]).limit(topk) \
        .take_all()
    top1 = int(top[0]["n"]) if top else 0
    topk_sum = sum(int(r["n"]) for r in top)
    return pa.table({
        "n_rows": pa.array([total], pa.int64()),
        "n_keys": pa.array([n_keys], pa.int64()),
        "top1_ppm": pa.array([top1 * 1_000_000 // total], pa.int64()),
        "topk_ppm": pa.array([topk_sum * 1_000_000 // total], pa.int64()),
    })


def revenue_cube(sf_dir: str) -> pa.Table:
    """GROUP BY CUBE(year, status) over order revenue -- all four
    grouping sets (detail, per-year, per-status, grand total) from ONE
    pass of integer-cent partials (exact sums re-aggregate upward, the
    revenue_rollup discipline).  Year is float64-nullable (NaN = rolled
    up, matching DuckDB's .df()); status NULL marks its margin."""
    def partial(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy()
        years = d.astype("datetime64[Y]").astype(np.int64) + 1970
        cents = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({
            "y": years, "s": t["o_orderstatus"].to_pylist(),
            "cents": cents})
        g = df.groupby(["y", "s"], as_index=False).agg(
            cents=("cents", "sum"), n=("cents", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = _t(sf_dir, "orders",
              ["o_orderdate", "o_orderstatus", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["y", "s"]).aggregate(Sum("cents", alias_name="cents"),
                                       Sum("n", alias_name="n")).take_all()
    detail = sorted((int(r["y"]), r["s"], int(r["cents"]), int(r["n"]))
                    for r in rows)
    by_year: dict = {}
    by_status: dict = {}
    tot_c = tot_n = 0
    for y, s, c, n in detail:
        ya = by_year.setdefault(y, [0, 0])
        sa = by_status.setdefault(s, [0, 0])
        ya[0] += c; ya[1] += n
        sa[0] += c; sa[1] += n
        tot_c += c; tot_n += n
    out = []
    for y, s, c, n in detail:
        out.append((float(y), s, c, n))
    for y in sorted(by_year):
        out.append((float(y), None, *by_year[y]))
    for s in sorted(by_status):
        out.append((None, s, *by_status[s]))
    out.append((None, None, tot_c, tot_n))
    return pa.table({
        "o_year": pa.array([o[0] for o in out], pa.float64()),
        "o_orderstatus": pa.array([o[1] for o in out], pa.string()),
        "revenue": pa.array([o[2] / 100.0 for o in out], pa.float64()),
        "n_orders": pa.array([o[3] for o in out], pa.int64())})


def customer_balance_deciles(sf_dir: str, n_tiles: int = 10) -> pa.Table:
    """NTILE(10) decile rollup over customer balances -- the
    equal-height binning window shape, distributed as one global
    zip_with_index over a composite sortable key (shifted balance
    cents, zero-padded, then custkey -- the lang_rank discipline: never
    co-locate a partition) followed by the EXACT NTILE rule computed
    from the global position (first n%t tiles get one extra row,
    DuckDB's semantics).  Per-decile count + min/max balance; min/max
    involve no summation, so doubles match bit for bit."""
    from pomp_ray.stages.index import zip_with_index

    n_cust = pq.ParquetFile(
        os.path.join(sf_dir, "customer.parquet")).metadata.num_rows
    size, rem = divmod(n_cust, n_tiles)

    def keyed(t: pa.Table) -> pa.Table:
        bal_c = np.rint(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        shifted = bal_c + 1_000_000_000           # lexicographic-safe
        keys = [f"{s:013d}:{k:012d}" for s, k in
                zip(shifted, t["c_custkey"].to_numpy())]
        return pa.table({"k": pa.array(keys, pa.string()),
                         "c_acctbal": t["c_acctbal"]})

    ds = _t(sf_dir, "customer", ["c_custkey", "c_acctbal"]) \
        .map_batches(keyed, batch_format="pyarrow")
    pos = zip_with_index(ds, "k", out_col="pos")

    def tile_partial(t: pa.Table) -> pa.Table:
        p = t["pos"].to_numpy()
        cut = rem * (size + 1)
        tile = np.where(p < cut, p // (size + 1) + 1,
                        rem + (p - cut) // max(size, 1) + 1)
        bal = t["c_acctbal"].to_numpy()
        df = pd.DataFrame({"tile": tile, "bal": bal})
        g = df.groupby("tile", as_index=False).agg(
            n=("bal", "size"), vmin=("bal", "min"), vmax=("bal", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = pos.map_batches(tile_partial, batch_format="pyarrow") \
        .groupby("tile").aggregate(
            Sum("n", alias_name="n"),
            Min("vmin", alias_name="min_bal"),
            Max("vmax", alias_name="max_bal"))
    rows = out.take_all()
    rows.sort(key=lambda r: r["tile"])
    return pa.table({
        "tile": pa.array([int(r["tile"]) for r in rows], pa.int64()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        "min_bal": pa.array([r["min_bal"] for r in rows], pa.float64()),
        "max_bal": pa.array([r["max_bal"] for r in rows], pa.float64())})


def melt(ds: rd.Dataset, id_cols: list[str], value_cols: list[str],
         var_name: str = "attr", val_name: str = "val") -> rd.Dataset:
    """Wide->long reshape (the inverse of the pivot at
    docs.lang_source_pivot): every input row emits one output row per
    value column, keyed by the column NAME.  A pure per-batch map --
    k stacked zero-copy column selections per batch, no shuffle, no
    driver residency -- so it streams at any scale.  Value columns are
    cast to a common float64 (the usual long-format contract)."""

    def unpivot(t: pa.Table) -> pa.Table:
        outs = []
        for c in value_cols:
            cols = {k: t[k] for k in id_cols}
            cols[var_name] = pa.array([c] * t.num_rows, pa.string())
            cols[val_name] = pc.cast(t[c], pa.float64())
            outs.append(pa.table(cols))
        if not outs:
            return pa.table({k: t[k] for k in id_cols})
        return pa.concat_tables(outs)

    return ds.map_batches(unpivot, batch_format="pyarrow")


def part_attrs_long(sf_dir: str) -> rd.Dataset:
    """The part table's numeric attributes in long format -- the melt
    demo query (id = p_partkey, attrs = p_size / p_retailprice)."""
    ds = _t(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    return melt(ds, ["p_partkey"], ["p_size", "p_retailprice"])


def zorder_layout_stats(sf_dir: str,
                        rows_per_part: int = 1024) -> pa.Table:
    """Z-order (Morton) clustering audit for the events table: interleave
    the low 16 bits of user_id with the low 16 bits of the epoch-minute,
    sort globally by the resulting Morton code, cut into
    ``rows_per_part`` partitions, and report each partition's min/max
    user and minute.  The point of the layout: a single sort gives
    BOTH columns tight per-part min/max ranges, so parquet row-group /
    partition pruning works for user-range AND time-range scans at once
    (the multi-dimensional clustering trick behind Delta/Iceberg
    OPTIMIZE ZORDER).  The stats table below IS the prune index a
    reader would consult.

    Shape: the Morton code is 16 vectorized shift/or passes per batch;
    global order comes from one sort + zip_with_index over a
    fixed-width digit key (z then event_id -- unique, and lexicographic
    equals numeric); per-part min/max is one small groupby.  All
    integers, exact vs the DuckDB unrolled-bit-interleave oracle."""
    from pomp_ray.stages.index import zip_with_index

    def add_z(t: pa.Table) -> pa.Table:
        # interleave user's LOW 8 bits with the minute's TOP 8 bits --
        # matching each dimension's actual span (users are dense small
        # ints; minutes span ~16 bits), so parts tile BOXES in
        # (user, time) space instead of degenerating to a time sort
        u = t["user_id"].to_numpy().astype(np.int64) & 0xFF
        minute = (pc.cast(t["ts"], pa.int64()).to_numpy()
                  // 60_000_000) & 0xFFFF
        mhi = (minute >> 8) & 0xFF
        z = np.zeros(len(u), np.int64)
        for i in range(8):
            z |= ((u >> i) & 1) << (2 * i)
            z |= ((mhi >> i) & 1) << (2 * i + 1)
        eid = t["event_id"].to_numpy()
        key = pc.binary_join_element_wise(
            pa.array(np.char.zfill(z.astype("U12"), 12)),
            pa.array(np.char.zfill(eid.astype("U12"), 12)), "")
        return pa.table({"zkey": key,
                         "user_id": t["user_id"],
                         "minute": pa.array(minute, pa.int64())})

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id"]) \
        .map_batches(add_z, batch_format="pyarrow")
    idx = zip_with_index(ds, "zkey", out_col="pos")
    per_part = idx.map_batches(
        lambda t, rpp=rows_per_part: pa.table({
            "part": pc.cast(pc.divide(t["pos"], rpp), pa.int64()),
            "user_id": t["user_id"], "minute": t["minute"]}),
        batch_format="pyarrow").groupby("part").aggregate(
        Count(alias_name="n_rows"),
        Min("user_id", alias_name="user_min"),
        Max("user_id", alias_name="user_max"),
        Min("minute", alias_name="minute_min"),
        Max("minute", alias_name="minute_max"))
    out = per_part.map_batches(
        lambda t: pa.table({
            "part": t["part"],
            "n_rows": pc.cast(t["n_rows"], pa.int64()),
            "user_min": pc.cast(t["user_min"], pa.int64()),
            "user_max": pc.cast(t["user_max"], pa.int64()),
            "minute_min": pc.cast(t["minute_min"], pa.int64()),
            "minute_max": pc.cast(t["minute_max"], pa.int64())}),
        batch_format="pyarrow")
    tbl = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    return tbl.sort_by("part")


def referential_integrity_report(sf_dir: str) -> pa.Table:
    """Data-quality audit of the star-schema key constraints: orphan
    lineitem rows (l_orderkey missing from orders), order rows whose
    o_custkey is missing from customer, order keys with no lineitems,
    customers with no orders, and duplicate-primary-key counts -- the
    ingest fsck an ETL pipeline runs before publishing a snapshot.

    Shape: every check reduces to per-key Count aggregates (one row per
    key crosses the shuffle, never the raw rows) stitched by ONE
    full-outer hash join per key family; null-side partial counts
    reduce per batch, so the driver only sees one row per block.
    Exact integer DuckDB anti-join oracle."""
    def keyed_counts(ds, key, alias):
        out = ds.groupby(key).aggregate(Count(alias_name=alias))
        # ray 2.49: hash groupby can emit zero-row empty-schema blocks
        # that break a downstream join; repartition rebuilds the schema
        return out.map_batches(
            lambda t, k=key, a=alias: pa.table({
                "k": pc.cast(t[k], pa.int64()),
                a: pc.cast(t[a], pa.int64())}),
            batch_format="pyarrow").repartition(2).materialize()

    def null_side_counts(joined, left_n, right_n):
        """(sum of left_n where right missing, n keys right-only,
        n dup left keys, n dup right keys) partials per batch."""
        def partial(t: pa.Table) -> pa.Table:
            ln = t[left_n].to_pandas()
            rn = t[right_n].to_pandas()
            return pa.table({
                "orphan_rows": pa.array(
                    [int(ln[rn.isna()].sum())], pa.int64()),
                "right_only_keys": pa.array(
                    [int((ln.isna()).sum())], pa.int64()),
                "dup_left_keys": pa.array([int((ln > 1).sum())],
                                          pa.int64()),
                "dup_right_keys": pa.array([int((rn > 1).sum())],
                                           pa.int64())})
        rows = joined.map_batches(partial,
                                  batch_format="pyarrow").take_all()
        return (sum(r["orphan_rows"] for r in rows),
                sum(r["right_only_keys"] for r in rows),
                sum(r["dup_left_keys"] for r in rows),
                sum(r["dup_right_keys"] for r in rows))

    li = keyed_counts(_t(sf_dir, "lineitem", ["l_orderkey"]),
                      "l_orderkey", "n_li")
    orders_by_key = keyed_counts(_t(sf_dir, "orders", ["o_orderkey"]),
                                 "o_orderkey", "n_ord")
    j1 = li.join(orders_by_key, join_type="full_outer", on=("k",),
                 num_partitions=4)
    (li_orphans, orders_no_li, _, dup_ord) = null_side_counts(
        j1, "n_li", "n_ord")

    ord_cust = keyed_counts(_t(sf_dir, "orders", ["o_custkey"]),
                            "o_custkey", "n_ordc")
    cust = keyed_counts(_t(sf_dir, "customer", ["c_custkey"]),
                        "c_custkey", "n_cust")
    j2 = ord_cust.join(cust, join_type="full_outer", on=("k",),
                       num_partitions=4)
    (ord_no_cust, cust_no_orders, _, dup_cust) = null_side_counts(
        j2, "n_ordc", "n_cust")

    return pa.table({
        "check": pa.array([
            "customers_without_orders", "duplicate_customer_keys",
            "duplicate_order_keys", "lineitem_orphan_rows",
            "order_keys_without_lineitems", "order_rows_no_customer",
        ], pa.string()),
        "n": pa.array([cust_no_orders, dup_cust, dup_ord, li_orphans,
                       orders_no_li, ord_no_cust], pa.int64())})


def lineitem_corr_stats(sf_dir: str) -> rd.Dataset:
    """Exact Pearson correlation of (l_quantity, l_discount) per
    l_returnflag via INTEGER sufficient statistics -- the distributed
    two-pass-free correlation shape: one map_batches pass emits per-batch
    int64 partials (n, Sx, Sy, Sxx, Syy, Sxy) over integer-scaled units
    (quantity is integral; discount x100 = cents-of-percent), one tiny
    groupby sums them, and the final ratio is computed from EXACT
    integers on the bounded per-flag table.  Integer moments make the
    result bit-identical to the DuckDB oracle computing the same formula
    (float corr() would differ in the last ulp; the length_outlier_docs
    convention).  Products stay in Python ints (arbitrary precision) on
    the driver so no 100-TB row count can overflow the numerator."""
    import math

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy().astype(np.int64)
        d = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"f": t["l_returnflag"].to_numpy(zero_copy_only=False),
                           "n": 1, "sx": q, "sy": d, "sxx": q * q,
                           "syy": d * d, "sxy": q * d})
        g = df.groupby("f", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    sums = _t(sf_dir, "lineitem",
              ["l_returnflag", "l_quantity", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("f").aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"))

    df = sums.to_pandas()  # bounded: one row per returnflag
    rows = []
    for r in df.itertuples(index=False):
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        num = n * int(r.sxy) - sx * sy
        dx = n * int(r.sxx) - sx * sx
        dy = n * int(r.syy) - sy * sy
        corr = float(num) / math.sqrt(float(dx) * float(dy))
        rows.append((r.f, n, corr))
    out = pd.DataFrame(rows, columns=["l_returnflag", "n", "corr_qty_disc"])
    out = out.sort_values("l_returnflag").reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return rd.from_pandas(out)


def grouping_sets_revenue(sf_dir: str) -> pa.Table:
    """GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus)) over
    discounted revenue -- the non-hierarchical cousin of
    revenue_rollup/revenue_cube: two independent single-key summaries
    in one result, each with the other key NULLed out.

    Plan mirrors revenue_rollup: ONE pass of per-batch integer
    10^-4-unit partials into a tiny (flag, status) groupby, then both
    grouping sets re-aggregate upward on the driver from exact integer
    sums (bit-identical to the oracle; the base grid is bounded at
    flags x statuses regardless of fact volume)."""
    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100) \
            .astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        units = cents * (100 - disc)
        df = pd.DataFrame({
            "f": t["l_returnflag"].to_numpy(zero_copy_only=False),
            "s": t["l_linestatus"].to_numpy(zero_copy_only=False),
            "u": units, "n": 1})
        g = df.groupby(["f", "s"], sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = _t(sf_dir, "lineitem",
              ["l_returnflag", "l_linestatus", "l_extendedprice",
               "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["f", "s"]).aggregate(Sum("u", alias_name="u"),
                                       Sum("n", alias_name="n")).take_all()
    by_f: dict[str, list[int]] = {}
    by_s: dict[str, list[int]] = {}
    for r in rows:
        for d, k in ((by_f, r["f"]), (by_s, r["s"])):
            acc = d.setdefault(k, [0, 0])
            acc[0] += int(r["u"])
            acc[1] += int(r["n"])
    out_f, out_s, out_u, out_n = [], [], [], []
    for f in sorted(by_f):
        out_f.append(f); out_s.append(None)
        out_u.append(by_f[f][0]); out_n.append(by_f[f][1])
    for s in sorted(by_s):
        out_f.append(None); out_s.append(s)
        out_u.append(by_s[s][0]); out_n.append(by_s[s][1])
    return pa.table({
        "l_returnflag": pa.array(out_f, pa.string()),
        "l_linestatus": pa.array(out_s, pa.string()),
        "revenue_units": pa.array(out_u, pa.int64()),
        "n": pa.array(out_n, pa.int64())})


def monthly_growth(sf_dir: str) -> pa.Table:
    """Month-over-month revenue growth in ppm (integer LAG ratio:
    (cur - prev) * 1e6 // prev) -- the seasonality read on the orders
    table.  One integer-cent partial pass + a tiny month groupby; the
    LAG fold runs on the bounded month series (the ewma_daily_events
    lesson)."""
    def partial(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy()
        ym = (d.astype("datetime64[M]").astype(np.int64))
        cents = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"ym": ym, "cents": cents, "n": 1})
        g = df.groupby("ym", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = _t(sf_dir, "orders", ["o_orderdate", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("ym").aggregate(Sum("cents", alias_name="cents"),
                                 Sum("n", alias_name="n")).take_all()
    ser = sorted((int(r["ym"]), int(r["cents"]), int(r["n"]))
                 for r in rows)
    out_y, out_m, out_c, out_g = [], [], [], []
    prev = None
    for ym, cents, n in ser:
        out_y.append(1970 + ym // 12)
        out_m.append(ym % 12 + 1)
        out_c.append(cents)
        if prev is None:
            out_g.append(None)
        else:
            delta = (cents - prev) * 1_000_000
            # DuckDB integer // TRUNCATES toward zero (C semantics);
            # python floors -- mirror by dividing magnitudes
            q = abs(delta) * 1 // prev
            out_g.append(-q if delta < 0 else q)
        prev = cents
    return pa.table({
        "year": pa.array(out_y, pa.int64()),
        "month": pa.array(out_m, pa.int64()),
        "revenue_cents": pa.array(out_c, pa.int64()),
        # nullable BIGINT comes back float64 through DuckDB .df() --
        # match dtypes on the engine side (first month has no prior)
        "growth_ppm": pa.array(
            [float(g) if g is not None else None for g in out_g],
            pa.float64())})


def market_basket_pairs(sf_dir: str, min_support: int = 2,
                        n_buckets: int = 64) -> rd.Dataset:
    """Association-rule pair mining (market-basket analysis) over the
    lineitem fact table: for every pair of parts bought together in the
    same order, the number of co-occurring orders and its support in ppm
    of all orders.

    Scale shape: orders hash into ``n_buckets`` groups (one C-speed
    pandas self-merge per bucket -- the sessionize bucketing lesson;
    size n_buckets so a bucket's orders fit one worker), pair partials
    reduce through a (part_a, part_b) groupby, and the support
    denominator is the orders parquet metadata count (no extra pass).
    Per-order pair fan-out is k*(k-1)/2 for a k-part order -- bounded by
    basket size, never by corpus size.  Reference analog: pomp item
    pipelines compute per-crawl co-occurrence rollups serially
    (SURVEY.md section 2 A2)."""
    n_orders_total = pq.read_metadata(
        os.path.join(sf_dir, "orders.parquet")).num_rows

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["l_orderkey"], n_buckets - 1),
                    pa.int32())
        return t.append_column("bucket", b)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        out = (m.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
                .size().reset_index(name="n"))
        return out.rename(columns={"l_partkey_x": "part_a",
                                   "l_partkey_y": "part_b"})

    def pair_bucket(t: pa.Table) -> pa.Table:
        # re-bucket the pair partials by pair hash: a Dataset groupby
        # over ~100k 1-2 row groups pays Python per group boundary in
        # the sort-based aggregate (the span_dup_stats lesson); 64
        # groups each running ONE C-speed pandas groupby do not
        a = t["part_a"].to_numpy()
        b = t["part_b"].to_numpy()
        pb = ((a * 2654435761 + b * 40503) & 63).astype(np.int32)
        return t.append_column("pbucket", pa.array(pb))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["part_a", "part_b"], sort=False)["n"]
                .sum().reset_index(name="n_orders"))
        return out

    agg = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas") \
        .map_batches(pair_bucket, batch_format="pyarrow") \
        .groupby("pbucket").map_groups(combine, batch_format="pandas")

    def fin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["n_orders"], min_support))
        n = pc.cast(t["n_orders"], pa.int64())
        supp = pc.divide(pc.multiply(n, pa.scalar(1_000_000, pa.int64())),
                         pa.scalar(n_orders_total, pa.int64()))
        return pa.table({
            "part_a": pc.cast(t["part_a"], pa.int64()),
            "part_b": pc.cast(t["part_b"], pa.int64()),
            "n_orders": n,
            "support_ppm": pc.cast(supp, pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def item_similarity_topk(sf_dir: str, k: int = 3,
                         min_support: int = 2) -> pa.Table:
    """Item-item collaborative filtering: for every part, its top-k
    most-similar parts by cosine^2 over order-basket co-occurrence
    (score_ppb = floor(1e9 * c_ab^2 / (c_a * c_b)) -- integer, so the
    ranking is bit-identical cross-engine; ties break on neighbor key).

    Scale shape: co-occurrence counts reuse ``market_basket_pairs``
    (order-bucketed pandas self-merges, pair-hash combine); per-part
    basket counts are a two-stage distinct groupby; the per-part count
    table is catalog-scale (bounded by #parts, not corpus size) so it
    broadcasts like a dim table; top-k per part runs as per-batch
    partial top-k (a global winner is a batch winner) with one final
    output-scale merge.  Reference analog: pomp item pipelines rank
    related items serially per crawl (SURVEY.md section 2 A2)."""
    import ray as _ray

    # distinct (order, part) -> baskets per part (catalog-scale table)
    cnt_rows = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .groupby(["l_orderkey", "l_partkey"]).aggregate(
            Count(alias_name="_one")) \
        .groupby("l_partkey").aggregate(Count(alias_name="c")).take_all()
    c_of = {int(r["l_partkey"]): int(r["c"]) for r in cnt_rows}
    c_ref = _ray.put(c_of)

    pairs = market_basket_pairs(sf_dir, min_support=min_support)

    def score(t: pa.Table) -> pa.Table:
        c = _ray.get(c_ref)
        a = t["part_a"].to_numpy()
        b = t["part_b"].to_numpy()
        n = t["n_orders"].to_numpy()
        ca = np.fromiter((c[int(x)] for x in a), np.int64, len(a))
        cb = np.fromiter((c[int(x)] for x in b), np.int64, len(b))
        # n*n*1e9 overflows int64 once a pair co-occurs in >~95k orders
        # (the DuckDB oracle widens to HUGEINT); Python-int math via an
        # object array keeps the quotient exact at any scale
        ppb = ((n.astype(object) * n.astype(object) * 1_000_000_000)
               // (ca.astype(object) * cb.astype(object))).astype(np.int64)
        # directed expansion: each undirected pair serves both items
        return pa.table({
            "part_a": pa.array(np.concatenate([a, b]), pa.int64()),
            "part_b": pa.array(np.concatenate([b, a]), pa.int64()),
            "n_orders": pa.array(np.concatenate([n, n]), pa.int64()),
            "score_ppb": pa.array(np.concatenate([ppb, ppb]), pa.int64())})

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["part_a", "score_ppb", "part_b"],
                            ascending=[True, False, True])
        return df.groupby("part_a", sort=False).head(k)

    partials = pairs.map_batches(score, batch_format="pyarrow") \
        .map_batches(partial_topk, batch_format="pandas").to_pandas()
    fin = partials.sort_values(["part_a", "score_ppb", "part_b"],
                               ascending=[True, False, True])
    fin = fin.groupby("part_a", sort=False).head(k).reset_index(drop=True)
    fin["rnk"] = fin.groupby("part_a", sort=False).cumcount() + 1
    return pa.table({
        "part_a": pa.array(fin["part_a"].to_numpy(np.int64)),
        "part_b": pa.array(fin["part_b"].to_numpy(np.int64)),
        "n_orders": pa.array(fin["n_orders"].to_numpy(np.int64)),
        "score_ppb": pa.array(fin["score_ppb"].to_numpy(np.int64)),
        "rnk": pa.array(fin["rnk"].to_numpy(np.int64))})


def acctbal_percentile_ranks(sf_dir: str) -> rd.Dataset:
    """PERCENT_RANK within nation over customer account balance, in
    exact integer ppm: pr_ppm = (rank-1) * 1e6 // (n_nation - 1), rank
    ordered by (balance, custkey).  The lang_rank shape -- ONE global
    zip_with_index over the composite key nation:zfill(cents):zfill(
    custkey) minus broadcast per-nation prefix offsets (25 nations is
    the only driver state; no nation partition ever co-locates)."""
    from pomp_ray.stages.index import zip_with_index

    def add_key(t: pa.Table) -> pa.Table:
        nk = pc.cast(t["c_nationkey"], pa.int64()).to_numpy()
        ck = pc.cast(t["c_custkey"], pa.int64()).to_numpy()
        cents = np.rint(t["c_acctbal"].to_numpy() * 100).astype(np.int64)
        key = [f"{n:03d}:{c + 10_000_000:09d}:{u:012d}"
               for n, c, u in zip(nk, cents, ck)]
        return pa.table({"c_custkey": pa.array(ck, pa.int64()),
                         "c_nationkey": pa.array(nk, pa.int64()),
                         "k": pa.array(key, pa.string())})

    ds = _t(sf_dir, "customer",
            ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
        add_key, batch_format="pyarrow")
    pos = zip_with_index(ds, "k", out_col="pos")

    counts = {int(r["c_nationkey"]): int(r["count()"])
              for r in _t(sf_dir, "customer", ["c_nationkey"])
              .groupby("c_nationkey").count().take_all()}
    off: dict[int, int] = {}
    acc = 0
    for nk in sorted(counts):
        off[nk] = acc
        acc += counts[nk]

    def fin(t: pa.Table) -> pa.Table:
        nk = pc.cast(t["c_nationkey"], pa.int64()).to_numpy()
        p = pc.cast(t["pos"], pa.int64()).to_numpy()
        o = np.fromiter((off[int(x)] for x in nk), np.int64, len(nk))
        n = np.fromiter((counts[int(x)] for x in nk), np.int64, len(nk))
        rank = p - o   # 0-based within nation
        ppm = np.where(n > 1, rank * 1_000_000 // np.maximum(n - 1, 1), 0)
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"],
                         "pr_ppm": pa.array(ppm, pa.int64())})

    return pos.map_batches(fin, batch_format="pyarrow")


def quantity_quantiles_cont(sf_dir: str) -> pa.Table:
    """Interpolated (PERCENT_CONT-style) quartiles of l_quantity per
    return flag -- the continuous sibling of ``length_quantiles``'s
    quantile_disc rule.  Exactness: l_quantity is a small integer (as a
    double) and the quartile fractions are dyadic, so position
    ``q*(n-1)``, its fractional part, and the interpolation
    ``(crn-pos)*v_lo + (pos-frn)*v_hi`` are ALL exactly-representable
    floats -- any algebraically equivalent formula (DuckDB's included)
    yields the identical double, no last-ulp risk.

    Shape: the corpus reduces to a per-(flag, quantity) HISTOGRAM via
    per-batch value_counts partials (value cardinality << rows, the
    length_quantiles trick); the driver walks the tiny cumulative grid.
    """
    import math

    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"f": t["l_returnflag"],
                       "v": t["l_quantity"]}).to_pandas()
        vc = df.value_counts().rename("c").reset_index()
        vc["c"] = vc["c"].astype("int64")
        return pa.Table.from_pandas(vc, preserve_index=False)

    hist = _t(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["f", "v"]).aggregate(_Sum("c", alias_name="c")) \
        .take_all()
    by_flag: dict[str, list[tuple[float, int]]] = {}
    for r in hist:
        by_flag.setdefault(r["f"], []).append((float(r["v"]),
                                               int(r["c"])))
    out_f, out_q, out_v = [], [], []
    for f in sorted(by_flag):
        vals = sorted(by_flag[f])
        vs = [v for v, _ in vals]
        cum = np.cumsum([c for _, c in vals])
        n = int(cum[-1])

        def at(i: int) -> float:
            return vs[int(np.searchsorted(cum, i + 1))]

        for q in (0.25, 0.5, 0.75):
            pos = q * (n - 1)
            frn, crn = math.floor(pos), math.ceil(pos)
            v = (at(frn) if frn == crn
                 else (crn - pos) * at(frn) + (pos - frn) * at(crn))
            out_f.append(f)
            out_q.append(q)
            out_v.append(v)
    return pa.table({"l_returnflag": pa.array(out_f, pa.string()),
                     "q": pa.array(out_q, pa.float64()),
                     "quantile_val": pa.array(out_v, pa.float64())})


def brand_price_size_slopes(sf_dir: str) -> rd.Dataset:
    """Per-brand OLS slope of retail price (cents) on part size, as the
    EXACT integer rational (slope_num, slope_den) -- the
    daily_trend_slopes moment discipline on catalog data: does a brand
    price by size?  Moments are int64 partial sums (cents and sizes are
    small); the division is never performed, so no rounding convention
    can diverge cross-engine."""
    def moments(t: pa.Table) -> pa.Table:
        x = pc.cast(t["p_size"], pa.int64()).to_numpy()
        cents = np.rint(t["p_retailprice"].to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({"p_brand": t["p_brand"],
                         "x": pa.array(x, pa.int64()),
                         "y": pa.array(cents, pa.int64()),
                         "xy": pa.array(x * cents, pa.int64()),
                         "xx": pa.array(x * x, pa.int64())})

    agg = _t(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"]) \
        .map_batches(moments, batch_format="pyarrow") \
        .groupby("p_brand").aggregate(
            Count(alias_name="n_parts"), Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"), Sum("xy", alias_name="sxy"),
            Sum("xx", alias_name="sxx"))

    def fin(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_parts"], pa.int64()).to_numpy()
        sx = pc.cast(t["sx"], pa.int64()).to_numpy()
        sy = pc.cast(t["sy"], pa.int64()).to_numpy()
        sxy = pc.cast(t["sxy"], pa.int64()).to_numpy()
        sxx = pc.cast(t["sxx"], pa.int64()).to_numpy()
        num = [int(a) * int(b) - int(c) * int(d)
               for a, b, c, d in zip(n, sxy, sx, sy)]
        den = [int(a) * int(b) - int(c) * int(c)
               for a, b, c in zip(n, sxx, sx)]
        return pa.table({"p_brand": t["p_brand"],
                         "n_parts": pa.array(n, pa.int64()),
                         "slope_num": pa.array(num, pa.int64()),
                         "slope_den": pa.array(den, pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def order_gap_histogram(sf_dir: str) -> rd.Dataset:
    """Corpus-wide histogram of per-customer consecutive-order gaps in
    whole days (reorder cadence): customers hash into 64 buckets (all
    of a customer's orders co-locate), one C-speed sort + shift per
    bucket emits gap partials, a tiny groupby(gap) sums.  Ties on the
    same date order by o_orderkey (gap 0 rows count)."""
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["o_custkey"], 63), pa.int32())
        day = pc.divide(pc.cast(t["o_orderdate"], pa.int64()),
                        pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"],
                         "day": pc.cast(day, pa.int64()),
                         "bucket": b})

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "day", "o_orderkey"])
        same = g["o_custkey"].to_numpy()[1:] == g["o_custkey"].to_numpy()[:-1]
        d = g["day"].to_numpy()
        gap = (d[1:] - d[:-1])[same]
        vc = pd.Series(gap).value_counts()
        return pd.DataFrame({"gap_days": vc.index.astype("int64"),
                             "n": vc.to_numpy().astype("int64")})

    ds = _t(sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(gaps, batch_format="pandas")
    agg = out.groupby("gap_days").aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"gap_days": pc.cast(t["gap_days"], pa.int64()),
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow")


def priority_transitions(sf_dir: str) -> rd.Dataset:
    """First-order transition counts between a customer's consecutive
    order PRIORITIES (ordered by o_orderdate then o_orderkey) -- the
    event_type_transitions shape on relational data: does urgency
    escalate or decay across a customer's order history?"""
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["o_custkey"], 63), pa.int32())
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"],
                         "o_orderdate": t["o_orderdate"],
                         "o_orderpriority": t["o_orderpriority"],
                         "bucket": b})

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        same = g["o_custkey"].to_numpy()[1:] == g["o_custkey"].to_numpy()[:-1]
        p = g["o_orderpriority"].to_numpy()
        vc = pd.DataFrame({"prev_priority": p[:-1][same],
                           "next_priority": p[1:][same]}).value_counts()
        out = vc.rename("n").reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    ds = _t(sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderdate",
             "o_orderpriority"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(trans, batch_format="pandas")
    agg = out.groupby(["prev_priority", "next_priority"]).aggregate(
        Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"prev_priority": t["prev_priority"],
                            "next_priority": t["next_priority"],
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow")


def order_brand_diversity(sf_dir: str) -> rd.Dataset:
    """Histogram of per-order distinct-brand counts: how many brands a
    basket mixes -- the assortment-diversity statistic.  One hash join
    attaches p_brand to lineitem (part is the catalog-scale dim side),
    a distinct groupby collapses (order, brand), a per-order Count, and
    a final tiny histogram groupby."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    pt = _t(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda t: t.rename_columns(["l_partkey", "p_brand"]),
        batch_format="pyarrow").materialize()
    n_parts = max(2, min(64, li.count() // 500_000))
    joined = li.join(pt, join_type="inner", on=("l_partkey",),
                     num_partitions=n_parts).repartition(2)
    ob = joined.groupby(["l_orderkey", "p_brand"]).aggregate(
        Count(alias_name="_c"))
    per_order = ob.groupby("l_orderkey").aggregate(
        Count(alias_name="n_brands"))
    hist = per_order.groupby("n_brands").aggregate(
        Count(alias_name="n_orders"))
    return hist.map_batches(
        lambda t: pa.table({
            "n_brands": pc.cast(t["n_brands"], pa.int64()),
            "n_orders": pc.cast(t["n_orders"], pa.int64())}),
        batch_format="pyarrow")


def supplier_hhi_by_type(sf_dir: str) -> rd.Dataset:
    """Supplier-concentration Herfindahl-Hirschman index per part type
    over the SYNTHESIZED partsupp (the Q2/Q11/Q20 table): HHI_ppm =
    sum_s(share_s^2) where share_s is supplier s's fraction of the
    type's total avail quantity -- computed as the exact integer
    floor SUM(q_s^2 * 10^6) // T^2 ... NOT quite: the ppm floor must
    apply ONCE over the summed squares (sum(q_s^2) * 10^6 // T^2), so
    engine and SQL agree bit for bit.  Partsupp expands 4x inside
    map_batches over the part scan (never materialized); per-(type,
    supplier) quantities reduce through one groupby; the per-type fold
    is a second tiny groupby."""
    S = _supplier_count(sf_dir)

    def expand(t: pa.Table) -> pa.Table:
        e = _partsupp_batch(t, S, carry=["p_type"])
        return pa.table({"p_type": e["p_type"],
                         "ps_suppkey": e["ps_suppkey"],
                         "q": e["ps_availqty"]})

    ts = _t(sf_dir, "part", ["p_partkey", "p_type"]) \
        .map_batches(expand, batch_format="pyarrow") \
        .groupby(["p_type", "ps_suppkey"]).aggregate(
            Sum("q", alias_name="q"))

    def squares(t: pa.Table) -> pa.Table:
        q = pc.cast(t["q"], pa.int64()).to_numpy()
        return pa.table({"p_type": t["p_type"],
                         "q": pa.array(q, pa.int64()),
                         "qq": pa.array(q * q, pa.int64())})

    agg = ts.map_batches(squares, batch_format="pyarrow") \
        .groupby("p_type").aggregate(
            Sum("q", alias_name="total"), Sum("qq", alias_name="ss"),
            Count(alias_name="n_suppliers"))

    def fin(t: pa.Table) -> pa.Table:
        tot = pc.cast(t["total"], pa.int64()).to_numpy()
        ss = pc.cast(t["ss"], pa.int64()).to_numpy()
        hhi = [int(s) * 1_000_000 // (int(x) * int(x))
               for s, x in zip(ss, tot)]
        return pa.table({
            "p_type": t["p_type"],
            "n_suppliers": pc.cast(t["n_suppliers"], pa.int64()),
            "total_qty": pa.array(tot, pa.int64()),
            "hhi_ppm": pa.array(hhi, pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def benford_first_digits(sf_dir: str) -> rd.Dataset:
    """Benford's-law audit of order totals: the distribution of first
    significant digits of o_totalprice cents -- the classic synthetic-
    data / fraud smoke test (generated uniform data FAILS Benford, and
    this table records by how much).  First digit extracted vectorized
    (repeated integer division by 10 -- no string round-trip); exact
    counts."""
    def digits(t: pa.Table) -> pa.Table:
        c = np.rint(t["o_totalprice"].to_numpy() * 100).astype(np.int64)
        c = np.abs(c)
        c = np.maximum(c, 1)
        while (c >= 10).any():
            c = np.where(c >= 10, c // 10, c)
        vc = pd.Series(c).value_counts()
        return pa.table({"digit": pa.array(vc.index.to_numpy(np.int64)),
                         "n": pa.array(vc.to_numpy().astype(np.int64))})

    agg = _t(sf_dir, "orders", ["o_totalprice"]) \
        .map_batches(digits, batch_format="pyarrow") \
        .groupby("digit").aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"digit": pc.cast(t["digit"], pa.int64()),
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow")


def discount_band_quantity(sf_dir: str) -> rd.Dataset:
    """Price-elasticity probe: average ordered quantity per discount
    band (cents band = round(discount*100)), as the exact integer pair
    (sum_qty, n_rows) plus the floor average in centi-units -- no float
    division crosses engines."""
    def keys(t: pa.Table) -> pa.Table:
        band = np.rint(t["l_discount"].to_numpy() * 100).astype(np.int64)
        qty = t["l_quantity"].to_numpy().astype(np.int64)
        return pa.table({"band": pa.array(band, pa.int64()),
                         "qty": pa.array(qty, pa.int64())})

    agg = _t(sf_dir, "lineitem", ["l_discount", "l_quantity"]) \
        .map_batches(keys, batch_format="pyarrow") \
        .groupby("band").aggregate(Sum("qty", alias_name="sum_qty"),
                                   Count(alias_name="n_rows"))

    def fin(t: pa.Table) -> pa.Table:
        s = pc.cast(t["sum_qty"], pa.int64()).to_numpy()
        n = pc.cast(t["n_rows"], pa.int64()).to_numpy()
        return pa.table({
            "band": pc.cast(t["band"], pa.int64()),
            "sum_qty": pa.array(s, pa.int64()),
            "n_rows": pa.array(n, pa.int64()),
            "avg_qty_centi": pa.array(s * 100 // n, pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def market_basket_triples(sf_dir: str, min_support: int = 3,
                          n_buckets: int = 64, k: int = 50) -> pa.Table:
    """3-itemset mining: the top-``k`` part TRIPLES co-bought in the
    same order (ordered a < b < c), the Apriori step beyond
    ``market_basket_pairs``.  Same 64-bucket order hashing; per bucket
    the triple fan-out is one double self-merge over the distinct
    (order, part) rows -- C(k,3) per k-part basket, bounded by basket
    size; triple partials reduce through one pair-hash bucketing +
    per-bucket pandas combine and a driver top-k."""
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["l_orderkey"], n_buckets - 1),
                    pa.int32())
        return t.append_column("bucket", b)

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = d.merge(d, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        m = m.merge(d, on="l_orderkey")
        m = m[m["l_partkey_y"] < m["l_partkey"]]
        out = (m.groupby(["l_partkey_x", "l_partkey_y", "l_partkey"],
                         sort=False).size().reset_index(name="n"))
        return out.rename(columns={"l_partkey_x": "part_a",
                                   "l_partkey_y": "part_b",
                                   "l_partkey": "part_c"})

    def tri_bucket(t: pa.Table) -> pa.Table:
        a = t["part_a"].to_numpy()
        b = t["part_b"].to_numpy()
        c = t["part_c"].to_numpy()
        pb = ((a * 2654435761 + b * 40503 + c * 69069) & 63) \
            .astype(np.int32)
        return t.append_column("pbucket", pa.array(pb))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["part_a", "part_b", "part_c"], sort=False)["n"]
                .sum().reset_index(name="n_orders"))
        return out[out["n_orders"] >= min_support]

    parts = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(triples, batch_format="pandas") \
        .map_batches(tri_bucket, batch_format="pyarrow") \
        .groupby("pbucket").map_groups(combine, batch_format="pandas") \
        .take_all()
    df = pd.DataFrame([{c: r[c] for c in
                        ("part_a", "part_b", "part_c", "n_orders")}
                       for r in parts])
    if df.empty:
        return pa.table({"part_a": pa.array([], pa.int64()),
                         "part_b": pa.array([], pa.int64()),
                         "part_c": pa.array([], pa.int64()),
                         "n_orders": pa.array([], pa.int64())})
    df = df.sort_values(["n_orders", "part_a", "part_b", "part_c"],
                        ascending=[False, True, True, True]).head(k)
    return pa.table({
        "part_a": pa.array(df["part_a"].to_numpy(np.int64)),
        "part_b": pa.array(df["part_b"].to_numpy(np.int64)),
        "part_c": pa.array(df["part_c"].to_numpy(np.int64)),
        "n_orders": pa.array(df["n_orders"].to_numpy(np.int64))})


def nation_revenue_share(sf_dir: str) -> rd.Dataset:
    """Percent-of-total window shape: each nation's share (ppm,
    integer cents) of its REGION's customer-order revenue -- two
    grouped sums stitched by one broadcast-dim join chain (region and
    nation are catalog tables), the share computed as exact integer
    cents * 10^6 // region cents."""
    import ray as _ray

    cust = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"]).take_all()
    nat = _t(sf_dir, "nation",
             ["n_nationkey", "n_name", "n_regionkey"]).take_all()
    reg = _t(sf_dir, "region", ["r_regionkey", "r_name"]).take_all()
    nation_of_cust = {int(r["c_custkey"]): int(r["c_nationkey"])
                      for r in cust}
    n_name = {int(r["n_nationkey"]): r["n_name"] for r in nat}
    region_of_nat = {int(r["n_nationkey"]): int(r["n_regionkey"])
                     for r in nat}
    r_name = {int(r["r_regionkey"]): r["r_name"] for r in reg}
    ref = _ray.put((nation_of_cust, n_name, region_of_nat, r_name))

    def partial(t: pa.Table) -> pa.Table:
        noc, nn, ron, rn = _ray.get(ref)
        ck = t["o_custkey"].to_numpy()
        cents = np.rint(t["o_totalprice"].to_numpy() * 100) \
            .astype(np.int64)
        nk = np.array([noc[int(c)] for c in ck], np.int64)
        df = pd.DataFrame({"nk": nk, "cents": cents})
        g = df.groupby("nk", as_index=False)["cents"].sum()
        return pa.table({
            "n_name": pa.array([nn[int(k)] for k in g["nk"]], pa.string()),
            "r_name": pa.array([rn[ron[int(k)]] for k in g["nk"]],
                               pa.string()),
            "cents": pa.array(g["cents"].to_numpy(np.int64), pa.int64())})

    per_nat = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["r_name", "n_name"]).aggregate(
            Sum("cents", alias_name="cents")).take_all()
    per_reg: dict[str, int] = {}
    for r in per_nat:
        per_reg[r["r_name"]] = per_reg.get(r["r_name"], 0) \
            + int(r["cents"])
    rows = sorted(per_nat, key=lambda r: (r["r_name"], r["n_name"]))
    return rd.from_arrow(pa.table({
        "r_name": pa.array([r["r_name"] for r in rows], pa.string()),
        "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
        "revenue_cents": pa.array([int(r["cents"]) for r in rows],
                                  pa.int64()),
        "share_ppm": pa.array(
            [int(r["cents"]) * 1_000_000 // per_reg[r["r_name"]]
             for r in rows], pa.int64())}))


def parts_above_type_p90(sf_dir: str) -> rd.Dataset:
    """Above-quantile gate: parts priced strictly above their TYPE's
    p90 retail price (quantile_disc rule sorted[ceil(n*q)-1] over exact
    cents) -- the outlier-pricing screen.  Per-(type, cents) histogram
    partials bound the shuffle (value cardinality << rows); the tiny
    cut table broadcasts back into one vectorized filter pass."""
    import math

    import ray as _ray

    def hist_partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["p_retailprice"].to_numpy() * 100) \
            .astype(np.int64)
        df = pd.DataFrame({"p_type": t["p_type"].to_pylist(),
                           "c": cents})
        g = df.value_counts().rename("n").reset_index()
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _t(sf_dir, "part", ["p_type", "p_retailprice"]) \
        .map_batches(hist_partial, batch_format="pyarrow") \
        .groupby(["p_type", "c"]).aggregate(Sum("n", alias_name="n")) \
        .take_all()
    by_type: dict[str, list[tuple[int, int]]] = {}
    for r in hist:
        by_type.setdefault(r["p_type"], []).append((int(r["c"]),
                                                    int(r["n"])))
    cuts: dict[str, int] = {}
    for ty, vals in by_type.items():
        vals.sort()
        cum = np.cumsum([n for _, n in vals])
        k = max(1, math.ceil(int(cum[-1]) * 0.9))
        cuts[ty] = vals[int(np.searchsorted(cum, k))][0]
    ref = _ray.put(cuts)

    def gate(t: pa.Table) -> pa.Table:
        cs = _ray.get(ref)
        cents = np.rint(t["p_retailprice"].to_numpy() * 100) \
            .astype(np.int64)
        cut = np.array([cs[ty] for ty in t["p_type"].to_pylist()],
                       np.int64)
        keep = cents > cut
        return pa.table({
            "p_partkey": pc.cast(t["p_partkey"], pa.int64()),
            "p_type": t["p_type"],
            "price_cents": pa.array(cents, pa.int64()),
            "p90_cents": pa.array(cut, pa.int64())}).filter(
            pa.array(keep, pa.bool_()))

    return _t(sf_dir, "part",
              ["p_partkey", "p_type", "p_retailprice"]) \
        .map_batches(gate, batch_format="pyarrow")


def basket_concentration_histogram(sf_dir: str) -> rd.Dataset:
    """Basket revenue concentration: per order, the top line item's
    share of order revenue (integer cents, ppm floor), rolled into a
    decile histogram -- single-item-dominated baskets vs spread ones.
    Per 64-bucket orderkey hashing: one pandas groupby max/sum pass per
    bucket; only (decile, 1) partials shuffle."""
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["l_orderkey"], 63), pa.int32())
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100) \
            .astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "cents": pa.array(cents, pa.int64()),
                         "bucket": b})

    def conc(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("l_orderkey")["cents"].agg(["max", "sum"])
        ppm = (a["max"].to_numpy(np.int64) * 1_000_000
               // a["sum"].to_numpy(np.int64))
        dec = np.minimum(ppm // 100_000, 9)
        vc = pd.Series(dec).value_counts()
        return pd.DataFrame({"decile": vc.index.astype("int64"),
                             "n_orders": vc.to_numpy().astype("int64")})

    ds = _t(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    agg = ds.groupby("bucket").map_groups(conc, batch_format="pandas") \
        .groupby("decile").aggregate(Sum("n_orders",
                                         alias_name="n_orders"))
    return agg.map_batches(
        lambda t: pa.table({"decile": pc.cast(t["decile"], pa.int64()),
                            "n_orders": pc.cast(t["n_orders"],
                                                pa.int64())}),
        batch_format="pyarrow")


def q6_sensitivity_grid(sf_dir: str) -> rd.Dataset:
    """TPC-H Q6 what-if grid: revenue under all 9 combinations of
    discount band {5-7, 6-8, 7-9 cents} x quantity cap {23, 24, 25},
    evaluated in ONE lineitem pass (9 masked integer-cents sums per
    batch -- the multi-predicate single-scan shape a parameter sweep
    wants; 9 separate scans would read the fact table 9 times)."""
    W_LO = (5, 6, 7)
    Q_CAP = (23, 24, 25)

    def partial(t: pa.Table) -> pa.Table:
        price_c = np.rint(t["l_extendedprice"].to_numpy() * 100) \
            .astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy() * 100) \
            .astype(np.int64)
        qty = t["l_quantity"].to_numpy().astype(np.int64)
        # revenue in 10^-4 units: price_cents * disc_cents
        rev = price_c * disc_c
        out_lo, out_cap, out_rev = [], [], []
        for lo in W_LO:
            band = (disc_c >= lo) & (disc_c <= lo + 2)
            for cap in Q_CAP:
                m = band & (qty < cap)
                out_lo.append(lo)
                out_cap.append(cap)
                out_rev.append(int(rev[m].sum()))
        return pa.table({"disc_lo": pa.array(out_lo, pa.int64()),
                         "qty_cap": pa.array(out_cap, pa.int64()),
                         "rev_e4": pa.array(out_rev, pa.int64())})

    agg = _t(sf_dir, "lineitem",
             ["l_extendedprice", "l_discount", "l_quantity"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["disc_lo", "qty_cap"]).aggregate(
            Sum("rev_e4", alias_name="rev_e4"))
    return agg.map_batches(
        lambda t: pa.table({
            "disc_lo": pc.cast(t["disc_lo"], pa.int64()),
            "qty_cap": pc.cast(t["qty_cap"], pa.int64()),
            "rev_e4": pc.cast(t["rev_e4"], pa.int64())}),
        batch_format="pyarrow")


def heavy_hitter_users(sf_dir: str, k: int = 256,
                       min_share_ppm: int = 7000) -> rd.Dataset:
    """Heavy-hitter users by event volume via a Misra-Gries summary
    (Misra & Gries 1982) -- the deterministic-guarantee frequent-items
    sketch beside the count-min estimate (``cms_word_counts``): a
    ``k``-counter dict accumulates per block (vectorized value_counts,
    one decrement-trim per overflow) and merges by counter addition +
    re-trim.  The classic guarantee: every key with true share >
    1/k survives every trim order, so with k > 10^6 / min_share_ppm the
    candidate set is a SUPERSET of the answer regardless of block
    order/partitioning.  A second exact pass recounts only the <= k
    candidates (bounded broadcast) and applies the integer ppm gate, so
    the OUTPUT is exact and deterministic even though intermediate
    sketch states are merge-order-dependent.  At 100 TB the sketch
    ships k counters per partition instead of shuffling every event.
    Exact integer-division DuckDB oracle."""
    from ray.data.aggregate import AggregateFn

    assert k > 1_000_000 // min_share_ppm, "MG guarantee needs k > 1/share"

    # sketch state = (m, 2) int64 array of [user, count] rows (Arrow-
    # friendly, like the CMS counter matrix; dict states don't convert)
    def _trim(st: np.ndarray) -> np.ndarray:
        u, inv = np.unique(st[:, 0], return_inverse=True)
        c = np.zeros(len(u), np.int64)
        np.add.at(c, inv, st[:, 1])
        if len(u) > k:
            # subtract the (k+1)-th largest count; drop <= 0
            cut = np.partition(c, len(c) - k - 1)[len(c) - k - 1]
            keep = c > cut
            u, c = u[keep], c[keep] - cut
        return np.stack([u, c], axis=1)

    def accumulate(st: np.ndarray, blk: pa.Table) -> np.ndarray:
        vc = blk.column("user_id").combine_chunks().value_counts()
        rows = np.stack([
            vc.field("values").to_numpy().astype(np.int64),
            vc.field("counts").to_numpy().astype(np.int64)], axis=1)
        return _trim(np.concatenate([st, rows]))

    mg = AggregateFn(
        init=lambda _: np.zeros((0, 2), np.int64),
        accumulate_block=accumulate,
        merge=lambda a, b: _trim(np.concatenate([a, b])),
        finalize=lambda st: sorted(int(x) for x in st[:, 0]),
        name="candidates")

    ev = _t(sf_dir, "events", ["user_id"])
    cand = set(ev.aggregate(mg)["candidates"])

    def exact_counts(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        hit = np.isin(u, np.fromiter(cand, np.int64, len(cand)))
        vc = pa.array(u[hit], pa.int64()).value_counts()
        return pa.table({
            "user_id": pc.cast(vc.field("values"), pa.int64()),
            "n": pc.cast(vc.field("counts"), pa.int64())})

    from ray.data.aggregate import Sum as _Sum
    # total event count rides the same pass as a per-block column, but
    # the global total must sum over ALL blocks -- aggregate separately
    total = ev.count()
    agg = ev.map_batches(exact_counts, batch_format="pyarrow") \
        .groupby("user_id").aggregate(_Sum("n", alias_name="n_events"))

    def fin(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_events"], pa.int64()).to_numpy()
        ppm = n * 1_000_000 // total
        keep = ppm >= min_share_ppm
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()).filter(
                pa.array(keep)),
            "n_events": pa.array(n[keep], pa.int64()),
            "share_ppm": pa.array(ppm[keep], pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def order_lines_histogram(sf_dir: str) -> rd.Dataset:
    """Distribution of line counts per order -- the order-fanout shape
    a capacity planner reads: groupby(orderkey) count, then a TINY
    second groupby over the bounded line-count domain.  The first
    shuffle ships only (orderkey) keys; the histogram is
    corpus-size-independent."""
    from ray.data.aggregate import Count as _Count

    per_order = _t(sf_dir, "lineitem", ["l_orderkey"]) \
        .groupby("l_orderkey").aggregate(_Count(alias_name="n_lines"))
    hist = per_order.map_batches(
        lambda t: pa.table({"n_lines": pc.cast(t["n_lines"], pa.int64())}),
        batch_format="pyarrow") \
        .groupby("n_lines").aggregate(_Count(alias_name="n_orders"))
    return hist.map_batches(
        lambda t: pa.table({
            "n_lines": pc.cast(t["n_lines"], pa.int64()),
            "n_orders": pc.cast(t["n_orders"], pa.int64())}),
        batch_format="pyarrow")


def supplier_balance_deciles(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Account-balance deciles over suppliers: per decile the count and
    min/max balance in integer CENTS (floor(bal*100) -- the exact
    cross-engine float convention).  Decile assignment mirrors DuckDB's
    NTILE rule (first n %% k tiles take the extra row) off one global
    zip_with_index over the (cents, suppkey) composite key (the
    curriculum_shards pattern); negative balances zfill via a +10^6
    offset."""
    from ray.data.aggregate import (Count as _Count, Max as _Max,
                                    Min as _Min)

    from pomp_ray.stages.index import zip_with_index

    sup = _t(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    n = sup.count()
    base, extra = n // k, n % k

    def key(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["s_acctbal"].to_numpy().astype(np.float64) * 100
        ).astype(np.int64)
        sk = pc.cast(t["s_suppkey"], pa.int64()).to_numpy()
        ck = [f"{c + 1_000_000:012d}:{s:012d}" for c, s in zip(cents, sk)]
        return pa.table({"cents": pa.array(cents, pa.int64()),
                         "ck": pa.array(ck, pa.string())})

    pos = zip_with_index(sup.map_batches(key, batch_format="pyarrow"),
                         key="ck", out_col="gpos")

    def decile_of(t: pa.Table) -> pa.Table:
        p = t["gpos"].to_numpy()
        cut = extra * (base + 1)
        d = np.where(p < cut, p // (base + 1),
                     extra + (p - cut) // max(1, base)) + 1
        return pa.table({"decile": pa.array(d.astype(np.int64), pa.int64()),
                         "cents": t["cents"]})

    agg = pos.map_batches(decile_of, batch_format="pyarrow") \
        .groupby("decile").aggregate(
            _Count(alias_name="n_suppliers"),
            _Min("cents", alias_name="min_bal_c"),
            _Max("cents", alias_name="max_bal_c"))
    return agg.map_batches(
        lambda t: pa.table({
            "decile": pc.cast(t["decile"], pa.int64()),
            "n_suppliers": pc.cast(t["n_suppliers"], pa.int64()),
            "min_bal_c": pc.cast(t["min_bal_c"], pa.int64()),
            "max_bal_c": pc.cast(t["max_bal_c"], pa.int64())}),
        batch_format="pyarrow")


def rfm_segments(sf_dir: str) -> rd.Dataset:
    """RFM customer segmentation (recency / frequency / monetary
    quartiles) -- the classic CRM cube: per customer the last order
    day, order count, and lifetime cents (floor(price*100) per order,
    the exact float convention); each axis ranks DESC with custkey
    tie-break and quartiles follow DuckDB's NTILE rule off one global
    zip_with_index per axis (the curriculum_shards machinery); output
    is the bounded 4x4x4 segment histogram.  Joins between the three
    rank tables carry the empty-schema repartition guard."""
    from ray.data.aggregate import (Count as _Count, Max as _Max,
                                    Sum as _Sum)

    from pomp_ray.stages.index import zip_with_index

    def prep(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["o_totalprice"].to_numpy().astype(np.float64) * 100
        ).astype(np.int64)
        day = t["o_orderdate"].cast(pa.int64()).to_numpy()  # epoch us
        return pa.table({
            "custkey": pc.cast(t["o_custkey"], pa.int64()),
            "day": pa.array(day, pa.int64()),
            "cents": pa.array(cents, pa.int64())})

    cu = _t(sf_dir, "orders", ["o_custkey", "o_orderdate",
                               "o_totalprice"]) \
        .map_batches(prep, batch_format="pyarrow") \
        .groupby("custkey").aggregate(
            _Max("day", alias_name="last_day"),
            _Count(alias_name="n_orders"),
            _Sum("cents", alias_name="cents"))

    def keys(t: pa.Table) -> pa.Table:
        ck = pc.cast(t["custkey"], pa.int64()).to_numpy()
        d = pc.cast(t["last_day"], pa.int64()).to_numpy()
        f = pc.cast(t["n_orders"], pa.int64()).to_numpy()
        m = pc.cast(t["cents"], pa.int64()).to_numpy()
        mk = lambda big, v: [f"{big - x:020d}:{c:012d}"
                             for x, c in zip(v, ck)]
        return pa.table({
            "custkey": pa.array(ck, pa.int64()),
            "rk": pa.array(mk(10**18, d), pa.string()),
            "fk": pa.array(mk(10**6, f), pa.string()),
            "mk": pa.array(mk(10**13, m), pa.string())})

    keyed = cu.map_batches(keys, batch_format="pyarrow").materialize()
    n = keyed.count()
    base, extra = n // 4, n % 4

    def quart(col: str, out: str):
        zi = zip_with_index(keyed.map_batches(
            lambda t, _c=col: t.select(["custkey", _c]),
            batch_format="pyarrow"), key=col, out_col="gpos")

        def f(t: pa.Table, _o=out) -> pa.Table:
            p = t["gpos"].to_numpy()
            cut = extra * (base + 1)
            q = np.where(p < cut, p // (base + 1),
                         extra + (p - cut) // max(1, base)) + 1
            return pa.table({
                "custkey": pc.cast(t["custkey"], pa.int64()),
                _o: pa.array(q.astype(np.int64), pa.int64())})
        return zi.map_batches(f, batch_format="pyarrow") \
            .repartition(2).materialize()

    r = quart("rk", "r")
    f_ = quart("fk", "f")
    m = quart("mk", "m")
    rf = r.join(f_, join_type="inner", on=("custkey",),
                num_partitions=2).repartition(2).materialize()
    rfm = rf.join(m, join_type="inner", on=("custkey",), num_partitions=2)
    agg = rfm.map_batches(
        lambda t: t.select(["r", "f", "m"]), batch_format="pyarrow") \
        .groupby(["r", "f", "m"]) \
        .aggregate(_Count(alias_name="n_customers"))
    return agg.map_batches(
        lambda t: pa.table({
            "r": pc.cast(t["r"], pa.int64()),
            "f": pc.cast(t["f"], pa.int64()),
            "m": pc.cast(t["m"], pa.int64()),
            "n_customers": pc.cast(t["n_customers"], pa.int64())}),
        batch_format="pyarrow")


def ship_lag_by_priority(sf_dir: str) -> rd.Dataset:
    """Order-to-ship lead time by order priority: per priority class the
    line count, total and mean floor-day lag (diff in microseconds
    FIRST, then floor-divide -- the date_diff mirror; mean as integer
    sum // n).  One hash join on orderkey shipping only two timestamp
    columns, partial (priority, n, sum) rows, tiny groupby."""
    from ray.data.aggregate import Sum as _Sum

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    od = _t(sf_dir, "orders", ["o_orderkey", "o_orderdate",
                               "o_orderpriority"]) \
        .map_batches(lambda t: t.select(
            ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ).rename_columns(["l_orderkey", "o_orderdate",
                          "o_orderpriority"]),
                     batch_format="pyarrow") \
        .repartition(2).materialize()
    joined = li.repartition(2).join(od, join_type="inner",
                                    on=("l_orderkey",), num_partitions=4)

    def partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy()
        order = t["o_orderdate"].cast(pa.int64()).to_numpy()
        lag = (ship - order) // 86_400_000_000
        df = pd.DataFrame({"o_orderpriority":
                           t["o_orderpriority"].to_pylist(),
                           "lag": lag})
        g = df.groupby("o_orderpriority", sort=False).agg(
            n=("lag", "size"), s=("lag", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority").aggregate(
            _Sum("n", alias_name="n_lines"),
            _Sum("s", alias_name="sum_lag_days"))

    def fin(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_lines"], pa.int64()).to_numpy()
        s = pc.cast(t["sum_lag_days"], pa.int64()).to_numpy()
        return pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "n_lines": pa.array(n, pa.int64()),
            "sum_lag_days": pa.array(s, pa.int64()),
            "mean_lag_days": pa.array(s // n, pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def brand_type_chi2(sf_dir: str) -> pa.Table:
    """Pearson chi-square of the (p_brand, p_type-prefix) contingency
    table in exact integer ppm: per cell the term
    (o*N - r*c)^2 * 10^6 // (N * r * c), summed in python ints -- the
    log-free association test between two categorical part attributes
    (the pmi_top_pairs convention at table level).  Per-batch cell
    partials, one tiny groupby, bounded driver finalize."""
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        ty = [x.split(" ")[0] for x in t["p_type"].to_pylist()]
        df = pd.DataFrame({"brand": t["p_brand"].to_pylist(), "ty": ty})
        g = df.groupby(["brand", "ty"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = _t(sf_dir, "part", ["p_brand", "p_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["brand", "ty"]).aggregate(_Sum("n", alias_name="o")) \
        .take_all()   # bounded: brands x type-prefixes
    rows: dict[str, int] = {}
    cols: dict[str, int] = {}
    N = 0
    for c in cells:
        o = int(c["o"])
        rows[c["brand"]] = rows.get(c["brand"], 0) + o
        cols[c["ty"]] = cols.get(c["ty"], 0) + o
        N += o
    chi2_ppm = 0
    for c in cells:
        o, r, col = int(c["o"]), rows[c["brand"]], cols[c["ty"]]
        chi2_ppm += (o * N - r * col) ** 2 * 1_000_000 // (N * r * col)
    # cells with zero observed count contribute (0*N - r*c)^2/(N*r*c)
    # = r*c*1e6//N... include them: iterate the FULL grid
    seen = {(c["brand"], c["ty"]) for c in cells}
    for br, r in rows.items():
        for ty, col in cols.items():
            if (br, ty) not in seen:
                chi2_ppm += (r * col) ** 2 * 1_000_000 // (N * r * col)
    return pa.table({
        "n_parts": pa.array([N], pa.int64()),
        "n_brands": pa.array([len(rows)], pa.int64()),
        "n_types": pa.array([len(cols)], pa.int64()),
        "chi2_ppm": pa.array([chi2_ppm], pa.int64())})
