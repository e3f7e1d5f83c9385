"""Custom join operators the reference ecosystem lacks but a data engine
needs (task brief: as-of join, range join; guide patterns: broadcast
small side, bucketed merge).

* ``asof_click_before_purchase`` -- AS-OF JOIN: per user, attach the most
  recent prior 'click' to each 'purchase'.  Implemented as
  ``groupby(user).map_groups`` with ``pd.merge_asof`` over the ts-sorted
  group (the documented partitioning assumption: one group holds all of
  a user's events).
* ``errors_near_purchases`` -- RANGE JOIN: count 'error' events within
  +-5 minutes of each purchase.  The error-timestamp array is tiny vs
  the fact side, so it's broadcast once (ray.put) and each batch does two
  vectorized searchsorted probes -- the broadcast-small-side range join.
  When both sides are large, bucket both by floor(ts/width) with
  replication to adjacent buckets and join per bucket.
* ``customers_per_region`` -- BROADCAST DIM JOIN: customer x nation x
  region via ray.put'd lookup dicts inside map_batches (no shuffle),
  with partial per-batch counts pre-aggregated before the tiny groupby.

All three have exact DuckDB oracles.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum


def _t(sf_dir: str, name: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                           columns=columns)


def asof_click_before_purchase(sf_dir: str) -> rd.Dataset:
    """(purchase event_id, user_id, ts, click_event_id) with the latest
    click at-or-before the purchase; null when the user never clicked
    before.  Ties on ts resolve to the highest event_id (both sides)."""

    # BUCKETED per-user as-of: users hash into ~64 buckets (one C-speed
    # merge_asof(by="user_id") per bucket instead of one pandas call per
    # user -- millions of users would otherwise pay per-group overhead).
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        p = g[g["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
        if p.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "ts": pd.Series([], dtype="datetime64[us]"),
                                 "click_event_id": pd.Series([], dtype="float64")})
        c = g[g["event_type"] == "click"][["event_id", "user_id", "ts"]] \
            .rename(columns={"event_id": "click_event_id", "ts": "click_ts"})
        m = pd.merge_asof(p, c, left_on="ts", right_on="click_ts",
                          by="user_id", direction="backward")
        # float64 (NaN for no-prior-click), matching what DuckDB's .df()
        # yields for a nullable BIGINT -- the driver hashes VALUES, and
        # Int64 <NA> vs float64 NaN hash differently (round-1 red entry)
        m["click_event_id"] = m["click_event_id"].astype("float64")
        return m[["event_id", "user_id", "ts", "click_event_id"]]

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(asof, batch_format="pandas")
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("user_id"), "user_id",
                               pc.cast(t["user_id"], pa.int64())),
        batch_format="pyarrow")


def errors_near_purchases(sf_dir: str, window_minutes: int = 5) -> rd.Dataset:
    """Per purchase: count of 'error' events (any user) within the
    +-window.  Broadcast-small-side range join."""
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["ts", "event_type"])
    err_ts = np.sort(np.asarray(
        ev.filter(pc.equal(ev["event_type"], "error"))["ts"]
        .cast(pa.int64()).to_numpy(zero_copy_only=False)))
    ref = ray.put(err_ts)
    w_us = window_minutes * 60 * 1_000_000

    def count_near(t: pa.Table) -> pa.Table:
        errs = ray.get(ref)
        p = t.filter(pc.equal(t["event_type"], "purchase"))
        ts = p["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lo = np.searchsorted(errs, ts - w_us, side="left")
        hi = np.searchsorted(errs, ts + w_us, side="right")
        return pa.table({"event_id": p["event_id"],
                         "n_errors_nearby": pa.array(hi - lo, pa.int64())})

    ds = _t(sf_dir, "events", ["event_id", "ts", "event_type"])
    return ds.map_batches(count_near, batch_format="pyarrow")


def errors_near_purchases_bucketed(sf_dir: str,
                                   window_minutes: int = 5) -> rd.Dataset:
    """The LARGE-LARGE form of the range join (round 1 documented it,
    round 2 implements it): bucket both sides by floor(ts / window),
    REPLICATE each error row to its bucket and both neighbours (a +-w
    range can only reach adjacent buckets when bucket width == w), then
    groupby(bucket) co-locates and a per-bucket searchsorted counts.
    Nothing is broadcast; the bucket id is the only shuffle key -- this
    is the shape that scales when the error side no longer fits in the
    object store.  Output is identical to the broadcast variant (same
    DuckDB oracle)."""
    w_us = window_minutes * 60 * 1_000_000

    def bucketize(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        bucket = pc.divide(ts, w_us)
        is_err = pc.equal(t["event_type"], "error")
        is_p = pc.equal(t["event_type"], "purchase")
        parts = []
        p = t.filter(is_p)
        pts = pc.cast(p["ts"], pa.int64())
        parts.append(pa.table({
            "bucket": pc.divide(pts, w_us),
            "side": pa.array(["p"] * p.num_rows),
            "event_id": p["event_id"],
            "ts_us": pts}))
        e = t.filter(is_err)
        ets = pc.cast(e["ts"], pa.int64())
        for d in (-1, 0, 1):      # replicate errors to adjacent buckets
            parts.append(pa.table({
                "bucket": pc.add(pc.divide(ets, w_us), d),
                "side": pa.array(["e"] * e.num_rows),
                "event_id": e["event_id"],
                "ts_us": ets}))
        return pa.concat_tables(parts)

    def count_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["side"] == "p"]
        if p.empty:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_errors_nearby": pd.Series([],
                                                              dtype="int64")})
        errs = np.sort(g.loc[g["side"] == "e", "ts_us"].to_numpy(np.int64))
        ts = p["ts_us"].to_numpy(np.int64)
        lo = np.searchsorted(errs, ts - w_us, side="left")
        hi = np.searchsorted(errs, ts + w_us, side="right")
        return pd.DataFrame({"event_id": p["event_id"].to_numpy(np.int64),
                             "n_errors_nearby": (hi - lo).astype("int64")})

    ds = _t(sf_dir, "events", ["event_id", "ts", "event_type"])
    return ds.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(count_in_bucket, batch_format="pandas")


def customers_per_region(sf_dir: str) -> rd.Dataset:
    """Customer count per region name via two broadcast dimension
    lookups (no shuffle until the 5-row final groupby)."""
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    n2r = dict(zip(nation["n_nationkey"].to_pylist(),
                   nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(),
                      region["r_name"].to_pylist()))
    ref = ray.put((n2r, r2name))

    def partial(t: pa.Table) -> pa.Table:
        n2r_, r2name_ = ray.get(ref)
        names = [r2name_[n2r_[nk]] for nk in t["c_nationkey"].to_pylist()]
        df = pd.DataFrame({"r_name": names})
        out = df.groupby("r_name", as_index=False).size()
        return pa.table({"r_name": out["r_name"],
                         "n": pa.array(out["size"], pa.int64())})

    ds = _t(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("r_name").aggregate(Sum("n", alias_name="n_customers"))
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("n_customers"),
                               "n_customers",
                               pc.cast(t["n_customers"], pa.int64())),
        batch_format="pyarrow")


def asof_click_after_purchase(sf_dir: str) -> rd.Dataset:
    """FORWARD as-of join (the recovery-action lookup: for every
    purchase, the EARLIEST click at-or-after it, per user) -- the
    direction="forward" sibling of asof_click_before_purchase, same
    64-bucket per-user shape.  Ties on ts resolve to the LOWEST
    event_id (the sorted order's first row), mirrored by the oracle's
    ORDER BY ts ASC, event_id ASC LIMIT 1."""
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        p = g[g["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
        if p.empty:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "next_click_event_id": pd.Series([], dtype="float64")})
        c = g[g["event_type"] == "click"][["event_id", "user_id", "ts"]] \
            .rename(columns={"event_id": "next_click_event_id",
                             "ts": "click_ts"})
        m = pd.merge_asof(p, c, left_on="ts", right_on="click_ts",
                          by="user_id", direction="forward")
        m["next_click_event_id"] = m["next_click_event_id"] \
            .astype("float64")
        return m[["event_id", "user_id", "ts", "next_click_event_id"]]

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(asof, batch_format="pandas")
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("user_id"), "user_id",
                               pc.cast(t["user_id"], pa.int64())),
        batch_format="pyarrow")


def salted_join_rollup(sf_dir: str, n_salts: int = 8) -> rd.Dataset:
    """SKEW-MITIGATED (salted) hash join, the 100-TB shape for a fact
    table whose join key is hot: per-user first-active-day dim joined
    back to the events fact, rolled up to (first_day, n_events).

    Technique under test (guide: "salt hot keys"): the dim side is
    REPLICATED n_salts times (dim x salt), the fact side gets a salt
    column derived from a NON-KEY attribute (event_id) so one hot
    user's rows spread across n_salts shuffle partitions, and the join
    key becomes (user_id, salt).  The result is provably identical to
    the unsalted join -- which is exactly what the DuckDB oracle runs.
    Both join inputs here stay Datasets (nothing broadcast / collected);
    the dim is small only AFTER its own aggregation, as at scale."""
    US_DAY = 86_400_000_000
    ev = _t(sf_dir, "events", ["event_id", "ts", "user_id"])
    # join partitions sized to the fact volume (metadata-only count):
    # near-empty shuffle partitions cost ~1 s of actor-pool spinup each
    n_parts = max(2, min(64, ev.count() // 500_000))

    def to_day(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()), US_DAY)
        return pa.table({"user_id": t["user_id"],
                         "day": pc.cast(day, pa.int64())})

    dim = ev.map_batches(to_day, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Min("day", alias_name="first_day"))

    def replicate(t: pa.Table) -> pa.Table:
        import numpy as np
        u = t["user_id"].to_numpy()
        fd = t["first_day"].to_numpy()
        rep = np.repeat(np.arange(n_salts, dtype=np.int64), len(u))
        return pa.table({
            "user_id": pa.array(np.tile(u, n_salts), pa.int64()),
            "salt": pa.array(rep, pa.int64()),
            "first_day": pa.array(np.tile(fd, n_salts), pa.int64())})

    dim_salted = dim.map_batches(replicate, batch_format="pyarrow") \
        .materialize()  # ends-in-join rule: never feed a live join a live join side

    def salt_fact(t: pa.Table) -> pa.Table:
        s = pc.bit_wise_and(t["event_id"], n_salts - 1)
        return pa.table({"user_id": t["user_id"],
                         "salt": pc.cast(s, pa.int64())})

    fact = ev.map_batches(salt_fact, batch_format="pyarrow")
    joined = fact.join(dim_salted, join_type="inner",
                       num_partitions=n_parts, on=("user_id", "salt"))
    out = joined.repartition(2).groupby("first_day").aggregate(
        Count(alias_name="n_events"))
    return out.map_batches(
        lambda t: pa.table({"first_day": pc.cast(t["first_day"], pa.int64()),
                            "n_events": pc.cast(t["n_events"], pa.int64())}),
        batch_format="pyarrow").sort("first_day")


def exclusion_funnel(sf_dir: str) -> rd.Dataset:
    """NOT-step (exclusion) funnel: for every purchase, the latest
    same-user click at-or-before it (the asof_click_before_purchase
    pair), plus ``clean`` = no same-user ERROR event strictly between
    the click and the purchase -- the funnel variant product analytics
    uses to separate converted-despite-friction from clean conversions.
    Purchases with no prior click report clean = false (the funnel
    never started).

    Shape: the 64-bucket per-user asof (one C-speed merge_asof per
    bucket), then error lookups inside the same bucket via ONE
    composite-axis searchsorted (factorized user codes x in-bucket
    time offset, the rolling_window_1h trick) -- no per-pair loop, no
    second shuffle.  Composite keys stay in int64 while
    bucket-user-count x time-span-us < 2^63 (at larger spans widen to
    int128 via two-level searchsorted)."""
    import numpy as np

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        p = g[g["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
        out_cols = ["event_id", "user_id", "ts", "click_event_id", "clean"]
        if p.empty:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "click_event_id": pd.Series([], dtype="float64"),
                "clean": pd.Series([], dtype="bool")})
        c = g[g["event_type"] == "click"][["event_id", "user_id", "ts"]] \
            .rename(columns={"event_id": "click_event_id",
                             "ts": "click_ts"})
        m = pd.merge_asof(p, c, left_on="ts", right_on="click_ts",
                          by="user_id", direction="backward")
        e = g[g["event_type"] == "error"][["user_id", "ts"]]
        has_click = m["click_event_id"].notna().to_numpy()
        n_err = np.zeros(len(m), np.int64)
        if len(e) and has_click.any():
            all_users = pd.concat([e["user_id"], m["user_id"]])
            codes_all, _ = pd.factorize(all_users)
            ce = codes_all[:len(e)]
            cm = codes_all[len(e):]
            t0 = int(g["ts"].astype("int64").min())
            span = int(g["ts"].astype("int64").max()) - t0 + 2
            ekey = np.sort(ce * span + (e["ts"].astype("int64").to_numpy()
                                        - t0))
            lo = cm * span + (m["click_ts"].astype("int64")
                              .fillna(0).to_numpy() - t0)
            hi = cm * span + (m["ts"].astype("int64").to_numpy() - t0)
            n_err = (np.searchsorted(ekey, hi, side="left")
                     - np.searchsorted(ekey, lo, side="right"))
        m["click_event_id"] = m["click_event_id"].astype("float64")
        m["clean"] = has_click & (n_err == 0)
        return m[out_cols]

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(funnel, batch_format="pandas")
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("user_id"), "user_id",
                               pc.cast(t["user_id"], pa.int64())),
        batch_format="pyarrow")


def conversion_latency_quantiles(sf_dir: str) -> pa.Table:
    """Click-to-purchase latency distribution: p50/p90/p99 of the
    seconds between each purchase and its latest same-user prior click
    (the asof pair), via the quantile_disc rule sorted[ceil(n*q)-1] --
    exact integers end to end.  Shape: the 64-bucket per-user asof
    emits floor-second latencies, a SECOND-granularity histogram bounds
    the shuffle (the event_gap_quantiles trick), and the driver walks
    the tiny cumulative grid."""
    import math

    import numpy as np
    from ray.data.aggregate import Sum as _Sum

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def latencies(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        p = g[g["event_type"] == "purchase"][["event_id", "user_id", "ts"]]
        c = g[g["event_type"] == "click"][["user_id", "ts"]] \
            .rename(columns={"ts": "click_ts"})
        if p.empty or c.empty:
            return pd.DataFrame({"lat_s": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        m = pd.merge_asof(p, c, left_on="ts", right_on="click_ts",
                          by="user_id", direction="backward")
        m = m[m["click_ts"].notna()]
        lat = ((m["ts"].astype("int64") - m["click_ts"].astype("int64"))
               // 1_000_000)
        vc = lat.value_counts()
        return pd.DataFrame({"lat_s": vc.index.astype("int64"),
                             "n": vc.to_numpy().astype("int64")})

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    hist = ds.groupby("bucket").map_groups(latencies,
                                           batch_format="pandas") \
        .groupby("lat_s").aggregate(_Sum("n", alias_name="n")).take_all()
    lat = np.array([r["lat_s"] for r in hist], np.int64)
    cnt = np.array([r["n"] for r in hist], np.int64)
    order = np.argsort(lat)
    lat, cnt = lat[order], cnt[order]
    cum = np.cumsum(cnt)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in (0.5, 0.9, 0.99):
        k = max(1, math.ceil(n * q))
        v = int(lat[int(np.searchsorted(cum, k))]) if n else 0
        out_q.append(q)
        out_v.append(v)
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "latency_s": pa.array(out_v, pa.int64())})


def first_touch_attribution(sf_dir: str,
                            window_days: int = 7) -> rd.Dataset:
    """First-touch attribution: for every purchase, the EARLIEST
    same-user click within the preceding ``window_days`` (the marketing
    counterpart of the asof join's last-touch).  Per 64-bucket: clicks
    sort once per user; each purchase does two searchsorted probes
    (window start / purchase ts) on the composite user x time axis and
    takes the first hit -- no per-pair loop.  Ties on the same ts pick
    the lowest event_id (positional first)."""
    import numpy as np

    w_us = window_days * 86_400_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def attribute(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        p = g[g["event_type"] == "purchase"]
        c = g[g["event_type"] == "click"]
        out = {"event_id": p["event_id"].to_numpy(np.int64),
               "user_id": p["user_id"].to_numpy(np.int64),
               "ts": p["ts"].to_numpy()}
        if c.empty or p.empty:
            first = np.full(len(p), np.nan)
        else:
            all_u = pd.concat([c["user_id"], p["user_id"]])
            codes, _ = pd.factorize(all_u)
            cc, cp = codes[:len(c)], codes[len(c):]
            ct = c["ts"].astype("int64").to_numpy()
            ce = c["event_id"].to_numpy(np.int64)
            t0 = int(g["ts"].astype("int64").min())
            span = int(g["ts"].astype("int64").max()) - t0 + w_us + 2
            # sort clicks by (user, ts, event_id) so the first in-window
            # index is the earliest click with the lowest event_id
            order = np.lexsort((ce, ct, cc))
            key = (cc * span + (ct - t0))[order]
            ce_s = ce[order]
            pt = p["ts"].astype("int64").to_numpy()
            # half-open window (pt - w, pt]: side="right" skips clicks
            # EXACTLY window_days before the purchase, mirroring the
            # oracle's strict `c.ts > p.ts - INTERVAL w DAY` (ADVICE r4)
            lo = np.searchsorted(key, cp * span + (pt - w_us - t0),
                                 side="right")
            hi = np.searchsorted(key, cp * span + (pt - t0),
                                 side="right")
            first = np.where(hi > lo, ce_s[np.minimum(lo, len(ce_s) - 1)],
                             np.nan)
        out["first_click_event_id"] = first.astype("float64")
        return pd.DataFrame(out)

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(attribute,
                                          batch_format="pandas")
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("user_id"), "user_id",
                               pc.cast(t["user_id"], pa.int64())),
        batch_format="pyarrow")


def multi_touch_credit(sf_dir: str, window_days: int = 7) -> rd.Dataset:
    """Linear multi-touch attribution: every purchase splits 10^6 ppm
    of credit EVENLY (integer floor) across all same-user clicks in the
    preceding ``window_days``; each click's total credit sums over the
    purchases it assisted.  The many-to-many sibling of first/last
    touch.  Per 64-bucket: one sorted click axis, two searchsorted
    probes per purchase, and ONE np.add.at over the concatenated
    in-window index ranges -- fan-out bounded by clicks-per-window,
    no per-pair Python."""
    import numpy as np

    w_us = window_days * 86_400_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def credit(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["event_type"] == "click"]
        p = g[g["event_type"] == "purchase"]
        if c.empty:
            return pd.DataFrame({
                "click_event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "credit_ppm": pd.Series([], dtype="int64")})
        all_u = pd.concat([c["user_id"], p["user_id"]])
        codes, _ = pd.factorize(all_u)
        cc, cp = codes[:len(c)], codes[len(c):]
        ct = c["ts"].astype("int64").to_numpy()
        ce = c["event_id"].to_numpy(np.int64)
        cu = c["user_id"].to_numpy(np.int64)
        t0 = int(g["ts"].astype("int64").min())
        span = (int(g["ts"].astype("int64").max()) - t0 + w_us + 2)
        order = np.lexsort((ce, ct, cc))
        key = (cc * span + (ct - t0))[order]
        ce_s, cu_s = ce[order], cu[order]
        cred = np.zeros(len(ce_s), np.int64)
        if len(p):
            pt = p["ts"].astype("int64").to_numpy()
            # half-open window (pt - w, pt]: side="right" skips clicks
            # EXACTLY window_days before the purchase, mirroring the
            # oracle's strict `c.ts > p.ts - INTERVAL w DAY` (ADVICE r4)
            lo = np.searchsorted(key, cp * span + (pt - w_us - t0),
                                 side="right")
            hi = np.searchsorted(key, cp * span + (pt - t0),
                                 side="right")
            n = hi - lo
            m = n > 0
            per = np.zeros(len(n), np.int64)
            per[m] = 1_000_000 // n[m]
            reps = n[m]
            idx = np.concatenate([np.arange(a, b)
                                  for a, b in zip(lo[m], hi[m])]) \
                if m.any() else np.array([], np.int64)
            vals = np.repeat(per[m], reps)
            np.add.at(cred, idx, vals)
        keep = cred > 0
        return pd.DataFrame({
            "click_event_id": pd.Series(ce_s[keep], dtype="int64"),
            "user_id": pd.Series(cu_s[keep], dtype="int64"),
            "credit_ppm": pd.Series(cred[keep], dtype="int64")})

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    return ds.groupby("bucket").map_groups(credit, batch_format="pandas")


def ushape_touch_credit(sf_dir: str, window_days: int = 7) -> rd.Dataset:
    """Position-based (U-shaped 40/20/40) attribution: per purchase,
    the FIRST in-window click takes 400000 ppm, the LAST 400000, the
    middles split 200000 evenly (integer floors; 1 click takes the
    full 10^6, 2 clicks split 500000/500000) -- the position-weighted
    member of the attribution family beside first/last touch and
    linear credit.  Same bucketed double-searchsorted machinery; the
    endpoint adds are two np.add.at calls on lo / hi-1."""
    import numpy as np

    w_us = window_days * 86_400_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def credit(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["event_type"] == "click"]
        p = g[g["event_type"] == "purchase"]
        if c.empty:
            return pd.DataFrame({
                "click_event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "credit_ppm": pd.Series([], dtype="int64")})
        all_u = pd.concat([c["user_id"], p["user_id"]])
        codes, _ = pd.factorize(all_u)
        cc, cp = codes[:len(c)], codes[len(c):]
        ct = c["ts"].astype("int64").to_numpy()
        ce = c["event_id"].to_numpy(np.int64)
        cu = c["user_id"].to_numpy(np.int64)
        t0 = int(g["ts"].astype("int64").min())
        span = (int(g["ts"].astype("int64").max()) - t0 + w_us + 2)
        order = np.lexsort((ce, ct, cc))
        key = (cc * span + (ct - t0))[order]
        ce_s, cu_s = ce[order], cu[order]
        cred = np.zeros(len(ce_s), np.int64)
        if len(p):
            pt = p["ts"].astype("int64").to_numpy()
            # half-open window (pt - w, pt]: side="right" skips clicks
            # EXACTLY window_days before the purchase, mirroring the
            # oracle's strict `c.ts > p.ts - INTERVAL w DAY` (ADVICE r4)
            lo = np.searchsorted(key, cp * span + (pt - w_us - t0),
                                 side="right")
            hi = np.searchsorted(key, cp * span + (pt - t0),
                                 side="right")
            n = hi - lo
            one = n == 1
            two = n == 2
            many = n > 2
            np.add.at(cred, lo[one], 1_000_000)
            np.add.at(cred, lo[two], 500_000)
            np.add.at(cred, hi[two] - 1, 500_000)
            np.add.at(cred, lo[many], 400_000)
            np.add.at(cred, hi[many] - 1, 400_000)
            if many.any():
                mid_per = 200_000 // (n[many] - 2)
                idx = np.concatenate(
                    [np.arange(a + 1, b - 1)
                     for a, b in zip(lo[many], hi[many])])
                vals = np.repeat(mid_per, n[many] - 2)
                np.add.at(cred, idx, vals)
        keep = cred > 0
        return pd.DataFrame({
            "click_event_id": pd.Series(ce_s[keep], dtype="int64"),
            "user_id": pd.Series(cu_s[keep], dtype="int64"),
            "credit_ppm": pd.Series(cred[keep], dtype="int64")})

    ds = _t(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    return ds.groupby("bucket").map_groups(credit, batch_format="pandas")
