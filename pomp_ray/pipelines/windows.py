"""Stream-shaped operators over the ``events`` log table.

Ray Data has no event-time windows/watermarks (guide: treat the input as
an ordered, partitioned log).  Windows are expressed as:

* tumbling window -- a derived window-start column + groupby (pure
  shuffle-aggregate; exactly how a batch engine computes closed windows);
* session windows -- ``groupby(user).map_groups`` over the ts-sorted
  group with a gap rule (incremental state stays inside the group fn;
  the partitioning assumption -- all events of a user in one group -- is
  the documented requirement).

Both have exact DuckDB oracles (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _events(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                           columns=columns)


def tumbling_window(sf_dir: str) -> rd.Dataset:
    """Hourly tumbling window per event_type: count + exact min/max."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        # keep timestamp[us] (floor_temporal narrows to [s]; DuckDB's
        # date_trunc stays [us] and the driver hashes dtypes-sensitive values)
        w = pc.cast(pc.floor_temporal(t["ts"], unit="hour"),
                    pa.timestamp("us"))
        return t.append_column("window_start", w)

    out = ds.map_batches(add_window, batch_format="pyarrow") \
        .groupby(["event_type", "window_start"]).aggregate(
            Count(alias_name="n"),
            Min("value", alias_name="vmin"),
            Max("value", alias_name="vmax"),
        )
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("n"), "n",
                               pc.cast(t["n"], pa.int64()))
        .set_column(t.column_names.index("window_start"), "window_start",
                    pc.cast(t["window_start"], pa.timestamp("us"))),
        batch_format="pyarrow")


def hopping_window(sf_dir: str, size_minutes: int = 60,
                   hop_minutes: int = 30) -> rd.Dataset:
    """Hopping (sliding) window per event_type: 1h windows every 30min,
    so each event lands in size/hop windows.  Expressed batch-native by
    EXPLODING each event to its window starts inside map_batches (pure
    derived-column work, no per-row Python), then one groupby -- the
    standard batch formulation of overlapping windows."""
    ds = _events(sf_dir, ["ts", "event_type", "value"])
    n_win = size_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    def explode_windows(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        base = pc.multiply(pc.divide(ts, hop_us), hop_us)  # floor to hop
        parts = []
        for i in range(n_win):
            w = pc.subtract(base, i * hop_us)
            parts.append(pa.table({
                "event_type": t["event_type"],
                "value": t["value"],
                "window_start": pc.cast(w, pa.timestamp("us")),
            }))
        return pa.concat_tables(parts)

    out = ds.map_batches(explode_windows, batch_format="pyarrow") \
        .groupby(["event_type", "window_start"]).aggregate(
            Count(alias_name="n"),
            Min("value", alias_name="vmin"),
            Max("value", alias_name="vmax"),
        )
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("n"), "n",
                               pc.cast(t["n"], pa.int64()))
        .set_column(t.column_names.index("window_start"), "window_start",
                    pc.cast(t["window_start"], pa.timestamp("us"))),
        batch_format="pyarrow")


def sessionize(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per user: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``.  Returns one row per session
    (user_id, session_start, n_events).  Partitioning assumption: one
    group holds ALL events of a user (hash-partition by user_id); events
    are sorted by ts inside the group fn."""
    gap = pd.Timedelta(minutes=gap_minutes)

    # BUCKETED grouping: millions of users would mean millions of tiny
    # map_groups calls (pandas overhead per group); hashing users into
    # ~64 buckets keeps the shuffle but runs ONE C-speed pandas groupby
    # per bucket.  Partitioning assumption unchanged: all events of a
    # user land in one bucket.
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new = (g["user_id"] != g["user_id"].shift()) | (g["ts"].diff() > gap)
        sid = new.cumsum()
        out = g.groupby(sid).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "first"),
            n_events=("ts", "size"),
        )
        return out.reset_index(drop=True)

    ds = _events(sf_dir, ["event_id", "ts", "user_id"]).map_batches(
        add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(sessions, batch_format="pandas")
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("n_events"), "n_events",
                               pc.cast(t["n_events"], pa.int64()))
        .set_column(t.column_names.index("user_id"), "user_id",
                    pc.cast(t["user_id"], pa.int64())),
        batch_format="pyarrow")


def funnel_counts(sf_dir: str,
                  stages: tuple = ("view", "click", "purchase")) -> pa.Table:
    """Sequential-pattern (funnel) analysis: how many users completed
    each prefix of the stage sequence IN ORDER (first 'view', then the
    first 'click' strictly after it, then the first 'purchase' strictly
    after that).  The MATCH_RECOGNIZE-ish op product analytics runs.

    Shape: users hash into 64 buckets; each bucket runs one chained
    merge-filter-min pandas pass per stage (all C-speed -- the first
    draft looped users in Python, a scale-killer at billions of users);
    per-bucket partial counts reduce to one tiny (stage, n_users) table.
    Exact integer DuckDB oracle (chained min-ts joins: the bucket pass
    computes the SAME per-user first-completion timestamps)."""
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def depth(g: pd.DataFrame) -> pd.DataFrame:
        counts = [0] * len(stages)
        prev = None   # Series user_id -> ts of the previous stage's FIRST
        for i, st in enumerate(stages):
            ev = g[g["event_type"] == st]
            if prev is not None:
                ev = ev.merge(prev.rename("prev_ts"),
                              left_on="user_id", right_index=True)
                ev = ev[ev["ts"] > ev["prev_ts"]]
            cur = ev.groupby("user_id")["ts"].min()
            counts[i] = len(cur)
            if cur.empty:
                break
            prev = cur
        return pd.DataFrame({"stage": pd.Series(list(stages), dtype="object"),
                             "n_users": pd.Series(counts, dtype="int64")})

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    partials = ds.groupby("bucket").map_groups(depth, batch_format="pandas")
    agg = partials.groupby("stage").aggregate(
        Sum("n_users", alias_name="n_users"))
    t = pa.Table.from_pandas(agg.to_pandas(), preserve_index=False)
    idx = {s: i for i, s in enumerate(stages)}
    order = sorted(range(t.num_rows),
                   key=lambda i: idx[t["stage"][i].as_py()])
    t = t.take(pa.array(order, pa.int64()))
    return pa.table({"stage": t["stage"],
                     "n_users": pc.cast(t["n_users"], pa.int64())})


def event_type_transitions(sf_dir: str) -> rd.Dataset:
    """First-order Markov transition counts over each user's event
    stream: how often event type A is immediately followed by B (ordered
    by ts, event_id within the user) -- the sequence statistic behind
    next-action models and session-shape monitoring.

    Shape: users hash into 64 buckets (all of a user's events co-locate;
    the sessionize partitioning assumption), each bucket runs ONE
    C-speed pandas sort + shift + value_counts, and the per-bucket
    partial counts reduce through a tiny groupby(prev,next) sum.  Pure
    integer counts, exact vs the DuckDB LEAD() oracle."""
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        same = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        prev = g["event_type"].to_numpy()[:-1][same]
        nxt = g["event_type"].to_numpy()[1:][same]
        vc = pd.DataFrame({"prev_type": prev, "next_type": nxt}) \
            .value_counts()
        out = vc.rename("n").reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(trans, batch_format="pandas")
    agg = out.groupby(["prev_type", "next_type"]).aggregate(
        Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"prev_type": t["prev_type"],
                            "next_type": t["next_type"],
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow").sort(["prev_type", "next_type"])


def cohort_retention(sf_dir: str) -> rd.Dataset:
    """Cohort retention triangle: users grouped by the epoch-week of
    their FIRST event (the cohort), counted as active in each later
    week-offset -- the curve a data team watches to see whether a
    pipeline's users (or a recrawl's hosts) keep coming back.

    Shape: timestamps collapse to int64 epoch-weeks inside the batch;
    per-batch distinct (user, week) partials feed one groupby that
    dedups globally AND a user-keyed Min gives each cohort; one hash
    join ships the cohort back to the (user, week) rows; per-batch
    value_counts partials reduce to the tiny (cohort, offset) triangle.
    All integers, exact vs the DuckDB oracle."""
    WEEK = 604800

    def wk_partial(t: pa.Table) -> pa.Table:
        w = t["ts"].to_numpy().astype("datetime64[s]").astype(np.int64) \
            // WEEK
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(),
                           "wk": w}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    uw = _events(sf_dir, ["user_id", "ts"]).map_batches(
        wk_partial, batch_format="pyarrow") \
        .groupby(["user_id", "wk"]).aggregate(Count(alias_name="_c")) \
        .map_batches(lambda t: t.select(["user_id", "wk"]),
                     batch_format="pyarrow").materialize()

    first = uw.groupby("user_id").aggregate(
        Min("wk", alias_name="cohort_week"))
    j = uw.join(first, join_type="inner", on=("user_id",),
                num_partitions=8)

    def tri_partial(t: pa.Table) -> pa.Table:
        c = t["cohort_week"].to_numpy().astype(np.int64)
        off = t["wk"].to_numpy().astype(np.int64) - c
        vc = pd.DataFrame({"cohort_week": c, "week_offset": off}) \
            .value_counts()
        out = vc.rename("n").reset_index()
        out["n"] = out["n"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = j.map_batches(tri_partial, batch_format="pyarrow") \
        .groupby(["cohort_week", "week_offset"]).aggregate(
        Sum("n", alias_name="n_users"))
    return agg.map_batches(
        lambda t: pa.table({
            "cohort_week": pc.cast(t["cohort_week"], pa.int64()),
            "week_offset": pc.cast(t["week_offset"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64())}),
        batch_format="pyarrow").sort(["cohort_week", "week_offset"])


def session_duration_stats(sf_dir: str, gap_minutes: int = 30) -> pa.Table:
    """Session-level rollup: per events-per-session size, how many
    sessions and their total duration in exact integer microseconds -- the shape a
    product dashboard bins engagement by.  Extends sessionize's bucketed
    gaps-and-islands pass with last-event timestamps; everything after
    the per-bucket pandas groupby is exact integer sums (the DuckDB
    oracle mirrors the island construction with window functions)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        new = (g["user_id"] != g["user_id"].shift()) | (g["ts"].diff() > gap)
        sid = new.cumsum()
        out = g.groupby(sid).agg(
            n_events=("ts", "size"),
            start=("ts", "first"),
            end=("ts", "last"),
        )
        dur = ((out["end"] - out["start"])
               // pd.Timedelta(microseconds=1)).astype("int64")
        return pd.DataFrame({
            "n_events": out["n_events"].astype("int64"),
            "dur_us": dur}).reset_index(drop=True)

    ds = _events(sf_dir, ["event_id", "ts", "user_id"]).map_batches(
        add_bucket, batch_format="pyarrow")
    per = ds.groupby("bucket").map_groups(sessions, batch_format="pandas")

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "n_events": t["n_events"].to_numpy(zero_copy_only=False),
            "dur_us": t["dur_us"].to_numpy(zero_copy_only=False)})
        g = df.groupby("n_events", as_index=False).agg(
            n_sessions=("dur_us", "size"),
            total_dur_us=("dur_us", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum as _Sum
    rows = per.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_events").aggregate(
            _Sum("n_sessions", alias_name="n_sessions"),
            _Sum("total_dur_us", alias_name="total_dur_us")).take_all()
    rows.sort(key=lambda r: r["n_events"])
    return pa.table({
        "n_events": pa.array([int(r["n_events"]) for r in rows],
                             pa.int64()),
        "n_sessions": pa.array([int(r["n_sessions"]) for r in rows],
                               pa.int64()),
        "total_dur_us": pa.array([int(r["total_dur_us"]) for r in rows],
                                 pa.int64())})


def window_unique_users(sf_dir: str) -> rd.Dataset:
    """Exact COUNT(DISTINCT user_id) per daily tumbling window -- the
    dedup-then-count two-stage shuffle shape (distinct from the plain
    count rollup: an exact distinct must shuffle (window, user) keys,
    so the per-batch DISTINCT partial is what bounds the exchange to
    one row per (window, user) per batch).  Window key is integer
    days-since-epoch (epoch_us // 86_400_000_000), mirrored exactly in
    the DuckDB oracle."""
    US_DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        w = pc.cast(t["ts"], pa.int64()).to_numpy() // US_DAY
        df = pd.DataFrame({"window_day": w,
                           "user_id": t["user_id"].to_numpy()})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    keys = _events(sf_dir, ["ts", "user_id"]).map_batches(
        partial, batch_format="pyarrow") \
        .groupby(["window_day", "user_id"]).aggregate(
            Count(alias_name="_c"))
    out = keys.groupby("window_day").aggregate(
        Count(alias_name="n_users"))
    return out.map_batches(
        lambda t: pa.table({
            "window_day": pc.cast(t["window_day"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64())}),
        batch_format="pyarrow").sort("window_day")


def user_activity_span(sf_dir: str) -> rd.Dataset:
    """Per-user lifetime rollup: event count, first/last event time and
    the count of DISTINCT active days -- the per-entity lifespan table a
    retention pipeline derives first.  Two distributed phases sharing
    one read: (1) plain per-user Count/Min/Max, (2) distinct
    (user, day) partials -> per-user day count; a single hash join
    stitches the two per-user aggregates (both one-row-per-user).
    Day key = epoch_us // 86.4e9, timestamps exact min/max."""
    US_DAY = 86_400_000_000

    base = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts": t["ts"],
            "day": pa.array(pc.cast(t["ts"], pa.int64()).to_numpy()
                            // US_DAY, pa.int64())}),
        batch_format="pyarrow").materialize()

    spans = base.groupby("user_id").aggregate(
        Count(alias_name="n_events"),
        Min("ts", alias_name="first_ts"),
        Max("ts", alias_name="last_ts")).repartition(2).materialize()

    def day_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(),
                           "day": t["day"].to_numpy()}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    days = base.map_batches(day_partial, batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(Count(alias_name="_c")) \
        .groupby("user_id").aggregate(Count(alias_name="active_days")) \
        .repartition(2)

    out = spans.join(days, join_type="inner", on=("user_id",),
                     num_partitions=4)
    return out.map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "first_ts": pc.cast(t["first_ts"], pa.timestamp("us")),
            "last_ts": pc.cast(t["last_ts"], pa.timestamp("us")),
            "active_days": pc.cast(t["active_days"], pa.int64())}),
        batch_format="pyarrow").sort("user_id")


def peak_concurrency(sf_dir: str) -> pa.Table:
    """Peak simultaneous active users -- each user is active over the
    CLOSED interval [first event, last event]; the answer is the classic
    boundary sweep: a +1 delta at every span start, a -1 at every end,
    a global running sum in endpoint order, and the max of the running
    count.  The sweep order is pinned by a composite string key
    zfill(epoch_us) + flag + zfill(user_id) with starts (flag 0) before
    ends (flag 1) at equal timestamps (closed intervals: a span ending
    at t still overlaps one starting at t); the running sum is the
    two-pass distributed prefix_sum (stages/scan.py) -- only O(blocks)
    partials ever reach the driver.  Output: one row with the peak, the
    earliest endpoint time the peak is reached, and the span count."""
    from pomp_ray.stages.scan import prefix_sum

    spans = _events(sf_dir, ["user_id", "ts"]).groupby("user_id") \
        .aggregate(Min("ts", alias_name="a"), Max("ts", alias_name="b")) \
        .repartition(2).materialize()

    def deltas(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "delta": pa.array([], pa.int64())})
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = []
        for col, flag, d in (("a", "0", 1), ("b", "1", -1)):
            us = pc.cast(t[col], pa.int64()).to_numpy(zero_copy_only=False)
            key = np.char.add(np.char.add(
                np.char.zfill(us.astype("U20"), 20), flag),
                np.char.zfill(uid.astype("U12"), 12))
            out.append(pa.table({
                "key": pa.array(key, pa.string()),
                "ts": pc.cast(t[col], pa.timestamp("us")),
                "delta": pa.array(np.full(len(us), d), pa.int64())}))
        return pa.concat_tables(out)

    run = prefix_sum(spans.map_batches(deltas, batch_format="pyarrow"),
                     "key", "delta", out_col="prev")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"peak": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "n_start": pa.array([], pa.int64())})
        conc = (t["prev"].to_numpy(zero_copy_only=False)
                + t["delta"].to_numpy(zero_copy_only=False))
        pk = int(conc.max())
        at = pc.min(t["ts"].filter(pa.array(conc == pk, pa.bool_())))
        return pa.table({
            "peak": pa.array([pk], pa.int64()),
            "ts": pa.array([at.as_py()], pa.timestamp("us")),
            "n_start": pa.array([int((t["delta"].to_numpy(
                zero_copy_only=False) == 1).sum())], pa.int64())})

    parts = run.map_batches(partial, batch_size=None,
                            batch_format="pyarrow").take_all()
    peak = max(r["peak"] for r in parts)
    at = min(r["ts"] for r in parts if r["peak"] == peak)
    n_users = sum(r["n_start"] for r in parts)
    return pa.table({"peak_concurrency": pa.array([peak], pa.int64()),
                     "peak_ts": pa.array([at], pa.timestamp("us")),
                     "n_users": pa.array([n_users], pa.int64())})


def user_state_history(sf_dir: str) -> rd.Dataset:
    """SCD2-style state history per user: collapse each user's event
    stream (ordered by ts, event_id) into runs of consecutive identical
    event types, emitting one validity interval per run -- (user_id,
    state, valid_from, valid_to, n_events), where valid_to is the next
    run's start and the open tail interval closes at a fixed sentinel
    (2100-01-01, so the output carries no NULL timestamps).  This is
    the change-data-capture shape a dimension-table build runs over an
    append-only event log.

    Shape: users hash into 64 buckets (all of a user's events co-locate
    -- the sessionize partitioning assumption); each bucket runs ONE
    C-speed pandas sort + shift-compare + cumsum-groupby pass; run
    boundaries and interval ends are computed inside the bucket, so
    nothing user-level ever reaches the driver.  Exact vs the DuckDB
    LAG/LEAD window oracle (integer counts, microsecond timestamps)."""
    SENTINEL = pd.Timestamp("2100-01-01")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def history(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        change = ((g["user_id"] != g["user_id"].shift())
                  | (g["event_type"] != g["event_type"].shift()))
        run = change.cumsum()
        out = g.groupby(run).agg(
            user_id=("user_id", "first"),
            state=("event_type", "first"),
            valid_from=("ts", "first"),
            n_events=("ts", "size"),
        ).reset_index(drop=True)
        nxt = out["valid_from"].shift(-1)
        same = out["user_id"] == out["user_id"].shift(-1)
        out["valid_to"] = nxt.where(same, SENTINEL)
        return out[["user_id", "state", "valid_from", "valid_to",
                    "n_events"]]

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(history, batch_format="pandas")
    return out.map_batches(
        lambda t: pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "state": t["state"],
            "valid_from": pc.cast(t["valid_from"], pa.timestamp("us")),
            "valid_to": pc.cast(t["valid_to"], pa.timestamp("us")),
            "n_events": pc.cast(t["n_events"], pa.int64())}),
        batch_format="pyarrow")


def event_gap_quantiles(sf_dir: str) -> pa.Table:
    """EXACT distributed quantiles (p50/p90/p99) of the inter-event gap
    per PRECEDING event type: after a 'view', how long until the user's
    next event -- the dwell-time statistic behind session-timeout and
    recrawl-interval tuning.

    Shape: users hash into 64 buckets (sessionize partitioning
    assumption); each bucket computes same-user consecutive gaps with
    one numpy sorted-diff pass at SECOND granularity (truncate-then-
    subtract = DuckDB date_diff 'second'), emitting a partial
    (event_type, gap_s, count) HISTOGRAM -- seconds granularity bounds
    the histogram by the corpus time span, so the shuffle payload stays
    compact no matter how many events flow in (the length_quantiles
    trick).  The driver walks the tiny cumulative histogram with the
    probed quantile_disc index rule sorted[ceil(n*q)-1]."""
    import collections
    import math

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        same = uid[1:] == uid[:-1]
        sec = g["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
        gap = sec[1:][same] - sec[:-1][same]
        prev = g["event_type"].to_numpy()[:-1][same]
        vc = pd.DataFrame({"event_type": prev, "gap_s": gap}) \
            .value_counts()
        out = vc.rename("c").reset_index()
        out["c"] = out["c"].astype("int64")
        return out

    hist = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(gaps, batch_format="pandas") \
        .groupby(["event_type", "gap_s"]) \
        .aggregate(Sum("c", alias_name="c")).take_all()

    by_type: dict = collections.defaultdict(list)
    for r in hist:
        by_type[r["event_type"]].append((int(r["gap_s"]), int(r["c"])))
    types, ns, p50s, p90s, p99s = [], [], [], [], []
    for et in sorted(by_type):
        vals = sorted(by_type[et])
        total = sum(c for _, c in vals)
        qs = {}
        for q in (0.5, 0.9, 0.99):
            idx = max(0, math.ceil(total * q) - 1)
            cum = 0
            for v, c in vals:
                cum += c
                if cum > idx:
                    qs[q] = v
                    break
        types.append(et)
        ns.append(total)
        p50s.append(qs[0.5])
        p90s.append(qs[0.9])
        p99s.append(qs[0.99])
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "n_gaps": pa.array(ns, pa.int64()),
        "p50": pa.array(p50s, pa.int64()),
        "p90": pa.array(p90s, pa.int64()),
        "p99": pa.array(p99s, pa.int64())})


def rolling_window_1h(sf_dir: str) -> rd.Dataset:
    """Trailing time-RANGE window: per event, the user's spend total and
    event count over [ts - 1h, ts] -- the RANGE BETWEEN INTERVAL frame
    (tie timestamps share a frame, unlike a ROWS window).  The rate /
    burst signal an abuse monitor computes per action.

    Shape: users hash into 64 buckets; inside a bucket one numpy pass
    per user-run -- prefix sums over integer cents + two searchsorted
    calls give every row's frame in O(n log n), no per-row Python.
    Cents are exact integers, so the sums are bit-equal to the DuckDB
    RANGE-window oracle."""
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    HOUR = 3_600_000_000  # us

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass for the WHOLE bucket: user segments embed
        # into a composite axis (dense user code * stride + relative
        # ts, stride > span + 1h) so a single pair of searchsorted
        # calls finds every row's frame without crossing users -- no
        # per-user Python loop
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        # floor-cents, the rolling_user_spend exactness discipline
        # (DuckDB floor mirrors exactly; round() differs half-to-even)
        cents = np.floor(g["value"].to_numpy() * 100).astype(np.int64)
        rel = ts - ts.min()
        stride = np.int64(int(rel.max()) + HOUR + 1)
        codes = np.unique(uid, return_inverse=True)[1].astype(np.int64)
        comb = codes * stride + rel
        pref = np.r_[0, np.cumsum(cents)]
        lo = np.searchsorted(comb, comb - HOUR, side="left")
        hi = np.searchsorted(comb, comb, side="right")
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": uid,
            "spend_cents_1h": pref[hi] - pref[lo],
            "n_events_1h": hi - lo})

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(roll, batch_format="pandas")
    return out.map_batches(
        lambda t: pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "spend_cents_1h": pc.cast(t["spend_cents_1h"], pa.int64()),
            "n_events_1h": pc.cast(t["n_events_1h"], pa.int64())}),
        batch_format="pyarrow")


def event_user_set_ops(sf_dir: str, type_a: str = "click",
                       type_b: str = "purchase") -> pa.Table:
    """Set algebra over user populations (the INTERSECT / EXCEPT /
    UNION class): how many users did A only, B only, both, either --
    the audience-overlap question behind funnel and retention cuts.

    Shape: per-batch distinct (user, flag) partials, one Max-groupby
    folding both flags per user (a user's rows co-locate on the hash
    key), and a four-counter rollup -- user lists never reach the
    driver.  Exact integer DuckDB oracle (INTERSECT/EXCEPT mirrors)."""
    from ray.data.aggregate import Max, Sum

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        mask = pc.or_(pc.equal(et, type_a), pc.equal(et, type_b))
        t = t.filter(mask)
        a = pc.cast(pc.equal(t["event_type"], type_a), pa.int64())
        b = pc.cast(pc.equal(t["event_type"], type_b), pa.int64())
        tmp = pa.table({"user_id": t["user_id"], "a": a, "b": b})
        agg = tmp.group_by(["user_id"]).aggregate(
            [("a", "max"), ("b", "max")])
        return pa.table({"user_id": agg["user_id"],
                         "a": agg["a_max"], "b": agg["b_max"]})

    flags = _events(sf_dir, ["user_id", "event_type"]).map_batches(
        partial, batch_format="pyarrow").groupby("user_id").aggregate(
        Max("a", alias_name="a"), Max("b", alias_name="b"))
    counts = flags.map_batches(
        lambda t: pa.table({
            "a_only": [int(pc.sum(pc.and_(
                pc.equal(t["a"], 1), pc.equal(t["b"], 0))).as_py() or 0)],
            "b_only": [int(pc.sum(pc.and_(
                pc.equal(t["a"], 0), pc.equal(t["b"], 1))).as_py() or 0)],
            "both": [int(pc.sum(pc.and_(
                pc.equal(t["a"], 1), pc.equal(t["b"], 1))).as_py() or 0)]}),
        batch_format="pyarrow").take_all()
    a_only = sum(r["a_only"] for r in counts)
    b_only = sum(r["b_only"] for r in counts)
    both = sum(r["both"] for r in counts)
    return pa.table({
        "set_op": pa.array([f"{type_a}_only", f"{type_b}_only",
                            "both", "either"], pa.string()),
        "n_users": pa.array([a_only, b_only, both,
                             a_only + b_only + both], pa.int64())})


def daily_top_actions(sf_dir: str, k: int = 3) -> pa.Table:
    """Trending-items query: the top-``k`` `props.k` action codes per
    DAY by event count (ties -> lower code), the windowed heavy-hitter
    report a feed/monitoring pipeline refreshes per window.

    Shape: day + code derive vectorized per batch (extract_regex +
    floor to days), per-batch (day, code) partial counts shrink the
    shuffle, one groupby sums, and the per-day rank cut runs on the
    aggregate (windows x codes -- tiny by construction, the top_words
    discipline).  Exact integer DuckDB QUALIFY oracle."""
    def partial(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], pattern=r'"k": (?P<k>\d+)')
        code = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        tmp = pa.table({"day": day, "code": code})
        agg = tmp.group_by(["day", "code"]).aggregate([([], "count_all")])
        return pa.table({"day": agg["day"], "code": agg["code"],
                         "n": pc.cast(agg["count_all"], pa.int64())})

    agg = _events(sf_dir, ["ts", "props"]).map_batches(
        partial, batch_format="pyarrow").groupby(["day", "code"]) \
        .aggregate(Sum("n", alias_name="n")).take_all()
    import collections
    by_day: dict = collections.defaultdict(list)
    for r in agg:
        by_day[r["day"]].append((-int(r["n"]), int(r["code"])))
    days, codes, ns, ranks = [], [], [], []
    for d in sorted(by_day):
        for rank, (negn, code) in enumerate(sorted(by_day[d])[:k], 1):
            days.append(d)
            codes.append(code)
            ns.append(-negn)
            ranks.append(rank)
    return pa.table({
        "day": pc.cast(pa.array(days), pa.timestamp("us")),
        "rank": pa.array(ranks, pa.int64()),
        "code": pa.array(codes, pa.int64()),
        "n": pa.array(ns, pa.int64())})


def weekly_active_users(sf_dir: str) -> rd.Dataset:
    """Trailing 7-day active-user counts: for every day in the extended
    range, COUNT(DISTINCT user) over the window [day-6, day] -- the WAU
    metric, and the canonical "distinct over a sliding window" problem
    (no window function computes it; SQL needs a range self-join).

    Shape: per-batch DISTINCT (user, day) partials bound the first
    shuffle to one row per user-day, a groupby dedups globally, then
    each user-day EXPLODES to the 7 window days it contributes to
    (day..day+6) and a second distinct-then-count groupby finishes.
    Shuffle volume is 7x the user-day count by construction -- the
    documented price of an exact sliding distinct (an approximate HLL
    sibling would cut it; this is the exact baseline).  Integer day
    keys = epoch_us // 86.4e9, mirrored in the DuckDB range-join
    oracle."""
    US_DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(t["ts"], pa.int64()).to_numpy() // US_DAY
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(),
                           "day": day}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    user_days = _events(sf_dir, ["ts", "user_id"]).map_batches(
        partial, batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(Count(alias_name="_c"))

    def explode(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy()
        d = t["day"].to_numpy()
        off = np.tile(np.arange(7, dtype=np.int64), len(u))
        return pa.table({
            "user_id": pa.array(np.repeat(u, 7), pa.int64()),
            "window_day": pa.array(np.repeat(d, 7) + off, pa.int64())})

    out = user_days.map_batches(explode, batch_format="pyarrow") \
        .groupby(["window_day", "user_id"]).aggregate(
            Count(alias_name="_c")) \
        .groupby("window_day").aggregate(Count(alias_name="n_users"))
    return out.map_batches(
        lambda t: pa.table({
            "window_day": pc.cast(t["window_day"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64())}),
        batch_format="pyarrow").sort("window_day")


def session_paths(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Session path motifs: counts of consecutive event-type TRIGRAMS
    inside a session (same gap rule as ``sessionize``: a break when the
    gap to the previous event exceeds ``gap_minutes``) -- the sequence
    pattern behind "what do users do next" product analytics, one order
    up from ``event_type_transitions``' bigrams.

    Shape: users hash into 64 buckets (the sessionize co-location
    assumption), each bucket runs ONE C-speed pandas pass (sort, gap
    cumsum for session ids, two shifts for the lookahead types, a
    same-session mask, value_counts), and the per-bucket partials
    reduce through a tiny groupby(t1,t2,t3) sum.  Exact vs the DuckDB
    LEAD()-within-(user, session) oracle."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def tri(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        brk = (g["user_id"] != g["user_id"].shift()) | (g["ts"].diff() > gap)
        sid = brk.cumsum().to_numpy()
        et = g["event_type"].to_numpy()
        n = len(et)
        if n < 3:
            return pd.DataFrame({"t1": pd.Series([], dtype="object"),
                                 "t2": pd.Series([], dtype="object"),
                                 "t3": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64")})
        same = sid[:-2] == sid[2:]   # all 3 rows in one session
        vc = pd.DataFrame({"t1": et[:-2][same], "t2": et[1:-1][same],
                           "t3": et[2:][same]}).value_counts()
        out = vc.rename("n").reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(tri, batch_format="pandas")
    agg = out.groupby(["t1", "t2", "t3"]).aggregate(
        Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"t1": t["t1"], "t2": t["t2"], "t3": t["t3"],
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow").sort(["t1", "t2", "t3"])


def ewma_daily_events(sf_dir: str) -> rd.Dataset:
    """Integer EWMA (alpha = 1/2 in floor arithmetic) over each event
    type's daily count series: ewma_0 = c_0, ewma_i =
    (ewma_{i-1} + c_i) // 2 over the type's OBSERVED days in order.

    Shape: the distributed part is the (event_type, day) count groupby
    -- the only pass that touches event volume; the sequential fold runs
    over the resulting bounded series (types x days, independent of
    event count), the bpe_merges / driver-reduce lesson.  Integer floor
    arithmetic makes the recurrence order-exact vs the DuckDB recursive
    CTE oracle (float EWMA would differ in the last ulp)."""
    US_DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(t["ts"], pa.int64()).to_numpy() // US_DAY
        df = pd.DataFrame({"event_type": t["event_type"].to_numpy(zero_copy_only=False),
                           "day": day})
        g = df.groupby(["event_type", "day"], sort=False).size()
        g = g.reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "day"]).aggregate(Sum("n", alias_name="n"))

    # bounded series: fold on the driver (types x days rows, not events)
    df = daily.to_pandas().sort_values(["event_type", "day"])
    out_rows = []
    for et, g in df.groupby("event_type", sort=True):
        ewma = None
        for day, n in zip(g["day"], g["n"]):
            n = int(n)
            ewma = n if ewma is None else (ewma + n) // 2
            out_rows.append((et, int(day), n, ewma))
    out = pd.DataFrame(out_rows,
                       columns=["event_type", "day", "n", "ewma"])
    return rd.from_pandas(out)


def activity_streaks(sf_dir: str) -> rd.Dataset:
    """Longest consecutive-day activity streak per user, rolled up to a
    histogram (streak_len, n_users) -- the gaps-and-islands pattern.

    Shape: distinct (user, day) partials bound the shuffle, a 64-bucket
    user hash gives C-speed vectorized island detection per bucket
    (day - cumcount within user = island id; the sessionize lesson:
    never one pandas group per user), then a tiny histogram groupby."""
    US_DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(t["ts"], pa.int64()).to_numpy() // US_DAY
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(),
                           "day": day}).drop_duplicates()
        df["bucket"] = (df["user_id"] & 63).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    user_days = _events(sf_dir, ["ts", "user_id"]).map_batches(
        partial, batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(
            Min("bucket", alias_name="bucket"))

    def max_streak(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "day"])
        rn = g.groupby("user_id", sort=False).cumcount()
        island = g["day"].to_numpy() - rn.to_numpy()
        lens = g.groupby([g["user_id"].to_numpy(), island],
                         sort=False).size()
        best = lens.groupby(level=0).max()
        return pd.DataFrame({"user_id": best.index.to_numpy(),
                             "streak_len": best.to_numpy()})

    per_user = user_days.groupby("bucket").map_groups(
        max_streak, batch_format="pandas")
    out = per_user.groupby("streak_len").aggregate(
        Count(alias_name="n_users"))
    return out.map_batches(
        lambda t: pa.table({
            "streak_len": pc.cast(t["streak_len"], pa.int64()),
            "n_users": pc.cast(t["n_users"], pa.int64())}),
        batch_format="pyarrow").sort("streak_len")


def props_k_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured extraction: parse the integer ``k`` field out of
    the JSON ``props`` column and aggregate it per event_type (n, sum,
    min, max -- all integer-exact).

    The observed props shape is flat single-key JSON, so extraction is
    ONE vectorized pc.extract_regex pass per batch (the Arrow fast
    path); a general engine would fall back to a per-batch JSON parser
    for nested shapes.  The DuckDB oracle goes through its real JSON
    reader (json_extract), so the regex fast path is cross-checked
    against a proper parser, not against itself."""
    PAT = r'"k":\s*(?P<k>-?\d+)'

    def extract(t: pa.Table) -> pa.Table:
        k = pc.struct_field(
            pc.extract_regex(t["props"], pattern=PAT), "k")
        return pa.table({"event_type": t["event_type"],
                         "k": pc.cast(k, pa.int64())})

    out = _events(sf_dir, ["event_type", "props"]) \
        .map_batches(extract, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Count(alias_name="n"), Sum("k", alias_name="sum_k"),
            Min("k", alias_name="min_k"), Max("k", alias_name="max_k"))
    return out.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "n": pc.cast(t["n"], pa.int64()),
            "sum_k": pc.cast(t["sum_k"], pa.int64()),
            "min_k": pc.cast(t["min_k"], pa.int64()),
            "max_k": pc.cast(t["max_k"], pa.int64())}),
        batch_format="pyarrow").sort("event_type")


def event_count_anomalies(sf_dir: str) -> pa.Table:
    """Days whose event count sits more than 2 population-sigmas from
    the event type's own daily mean -- anomaly detection squared into
    pure integers (the length_outlier_docs convention): x is anomalous
    iff (n*x - S)^2 > 4 * n_sq_dev where n_sq_dev = n*Sxx - S^2, so no
    float mean/stddev ever enters the comparison and the DuckDB HUGEINT
    oracle is exact.  (2 sigmas: the synthetic daily counts are uniform
    enough that 3 sigmas never fires even on the partial boundary
    days -- probed.)"""
    US_DAY = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(t["ts"], pa.int64()).to_numpy() // US_DAY
        df = pd.DataFrame({"event_type":
                           t["event_type"].to_numpy(zero_copy_only=False),
                           "day": day})
        g = df.groupby(["event_type", "day"], sort=False).size() \
            .reset_index(name="x")
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "day"]).aggregate(Sum("x", alias_name="x")) \
        .materialize()

    def moments(t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy().astype(np.int64)
        df = pd.DataFrame({"event_type":
                           t["event_type"].to_numpy(zero_copy_only=False),
                           "n": 1, "s": x, "sxx": x * x})
        g = df.groupby("event_type", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    mom = daily.map_batches(moments, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"),
            Sum("sxx", alias_name="sxx")).take_all()
    # bounded: one row per event type; broadcast exact python ints
    import ray as _ray
    stats = {r["event_type"]: (int(r["n"]), int(r["s"]), int(r["sxx"]))
             for r in mom}
    ref = _ray.put(stats)

    def flag(t: pa.Table) -> pa.Table:
        st = _ray.get(ref)
        keep, devs = [], []
        for et, x in zip(t["event_type"].to_pylist(),
                         t["x"].to_pylist()):
            n, s, sxx = st[et]
            lhs = (n * x - s) ** 2          # exact python ints
            rhs = 4 * (n * sxx - s * s)
            keep.append(lhs > rhs)
            devs.append(n * x - s)
        t = t.append_column("n_dev", pa.array(devs, pa.int64()))
        return t.filter(pa.array(keep, pa.bool_()))

    # anomaly rows are output-scale tiny; assemble an explicitly-typed
    # table so an all-filtered result keeps its schema (empty blocks
    # bypass map_batches -- the ray 2.49 empty-schema family)
    hits = daily.map_batches(flag, batch_format="pyarrow").take_all()
    hits.sort(key=lambda r: (r["event_type"], r["day"]))
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in hits],
                               pa.string()),
        "day": pa.array([int(r["day"]) for r in hits], pa.int64()),
        "x": pa.array([int(r["x"]) for r in hits], pa.int64()),
        "n_dev": pa.array([int(r["n_dev"]) for r in hits], pa.int64())})


def constrained_funnel(sf_dir: str,
                       window_minutes: int = 60) -> rd.Dataset:
    """Time-constrained funnel: users who completed click -> purchase
    with the purchase at most ``window_minutes`` after the click -- the
    windowed sibling of funnel_counts (an unbounded funnel overcounts
    users whose steps are days apart).

    Shape: the 64-bucket user hash (sessionize lesson) gives one
    C-speed pd.merge_asof(by=user, direction=forward, tolerance=w) per
    bucket -- the as-of join WITH tolerance is exactly the windowed
    funnel primitive; per-bucket partials then sum in a tiny groupby.
    Output: one row (n_users_click, n_users_converted)."""
    tol_us = window_minutes * 60 * 1_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        c = g[g["event_type"] == "click"][["user_id", "ts"]]
        p = g[g["event_type"] == "purchase"][["user_id", "ts"]] \
            .rename(columns={"ts": "p_ts"})
        n_click = c["user_id"].nunique()
        if c.empty or p.empty:
            return pd.DataFrame({"n_users_click": [int(n_click)],
                                 "n_users_converted": [0]})
        m = pd.merge_asof(c, p, left_on="ts", right_on="p_ts",
                          by="user_id", direction="forward",
                          tolerance=pd.Timedelta(microseconds=tol_us))
        conv = m.loc[m["p_ts"].notna(), "user_id"].nunique()
        return pd.DataFrame({"n_users_click": [int(n_click)],
                             "n_users_converted": [int(conv)]})

    parts = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pandas")
    out = parts.map_batches(
        lambda t: pa.table({
            "n_users_click": pa.array(
                [int(pc.sum(t["n_users_click"]).as_py() or 0)], pa.int64()),
            "n_users_converted": pa.array(
                [int(pc.sum(t["n_users_converted"]).as_py() or 0)],
                pa.int64())}),
        batch_format="pyarrow")
    rows = out.take_all()
    return rd.from_arrow(pa.table({
        "n_users_click": pa.array(
            [sum(r["n_users_click"] for r in rows)], pa.int64()),
        "n_users_converted": pa.array(
            [sum(r["n_users_converted"] for r in rows)], pa.int64())}))


def rfm_segments(sf_dir: str, k: int = 5) -> rd.Dataset:
    """RFM (recency / frequency / monetary) customer segmentation over
    purchase events, with exact NTILE(k) quintile scores.

    Distributed shape: per-user aggregates are a partial-agg groupby
    (floor-cents integers, day-granular recency vs the global max
    purchase day); each score is one global sort + zip_with_index pass
    over a composite ``metric:user_id`` key (the lang_rank pattern -- no
    partition ever co-locates), and the NTILE tile is a closed-form
    function of the global position and row count, mirroring DuckDB's
    first-(n%k)-tiles-get-one-extra rule exactly.  Three sorted passes
    over the USER table (already reduced), not the event log."""
    from pomp_ray.stages.index import zip_with_index

    def partial(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["event_type"], "purchase")
        t = t.filter(mask)
        day = t["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        cents = np.floor(t["value"].to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({"user_id": t["user_id"].to_numpy(),
                           "day": day, "cents": cents, "n": 1})
        g = df.groupby("user_id", sort=False).agg(
            max_day=("day", "max"), n=("n", "sum"), cents=("cents", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    users = _events(sf_dir, ["user_id", "ts", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Max("max_day", alias_name="max_day"),
            Sum("n", alias_name="frequency"),
            Sum("cents", alias_name="monetary_cents")).materialize()
    gmax = users.aggregate(Max("max_day"))["max(max_day)"]
    n_users = users.count()

    def base_cols(t: pa.Table) -> pa.Table:
        rec = gmax - pc.cast(t["max_day"], pa.int64()).to_numpy()
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "recency_days": pa.array(rec, pa.int64()),
            "frequency": pc.cast(t["frequency"], pa.int64()),
            "monetary_cents": pc.cast(t["monetary_cents"], pa.int64())})

    ds = users.map_batches(base_cols, batch_format="pyarrow")

    def ntile(pos: np.ndarray) -> np.ndarray:
        # DuckDB NTILE(k): first n%k tiles hold ceil(n/k) rows
        base, rem = divmod(n_users, k)
        cut = rem * (base + 1)
        small = pos // (base + 1) + 1
        large = rem + (pos - cut) // max(base, 1) + 1
        return np.where(pos < cut, small, large).astype(np.int64)

    for metric, score in (("recency_days", "r_score"),
                          ("frequency", "f_score"),
                          ("monetary_cents", "m_score")):
        def add_key(t: pa.Table, m=metric) -> pa.Table:
            v = t[m].to_numpy()
            u = t["user_id"].to_numpy()
            key = [f"{a:015d}:{b:012d}" for a, b in zip(v, u)]
            return t.append_column("k", pa.array(key, pa.string()))

        pos = zip_with_index(
            ds.map_batches(add_key, batch_format="pyarrow"), "k")

        def assign(t: pa.Table, s=score) -> pa.Table:
            p = pc.cast(t["pos"], pa.int64()).to_numpy()
            t = t.drop_columns(["k", "pos"])
            return t.append_column(s, pa.array(ntile(p), pa.int64()))

        ds = pos.map_batches(assign, batch_format="pyarrow")
    return ds


def session_bounce_rate(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Per-day session bounce rate (sessions with exactly one event, in
    ppm of that day's sessions) -- rides the sessionize pipeline's
    64-bucket user hashing, then one tiny day groupby."""
    s = sessionize(sf_dir, gap_minutes)

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["session_start"], unit="day"),
                      pa.timestamp("us"))
        b = pc.cast(pc.equal(t["n_events"], 1), pa.int64())
        return pa.table({"day": day,
                         "s": pa.array(np.ones(t.num_rows, np.int64)),
                         "b": b})

    g = s.map_batches(partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("s", alias_name="n_sessions"),
                                  Sum("b", alias_name="n_bounce"))

    def fin(t: pa.Table) -> pa.Table:
        ns = pc.cast(t["n_sessions"], pa.int64())
        nb = pc.cast(t["n_bounce"], pa.int64())
        ppm = pc.divide(pc.multiply(nb, pa.scalar(1_000_000, pa.int64())),
                        ns)
        # hash groupby narrows timestamp[us] keys to [s] -- re-widen
        return pa.table({"day": pc.cast(t["day"], pa.timestamp("us")),
                         "n_sessions": ns,
                         "n_bounce": nb,
                         "bounce_ppm": pc.cast(ppm, pa.int64())})

    return g.map_batches(fin, batch_format="pyarrow")


def markov_stationary(sf_dir: str, n_iters: int = 40,
                      scale: int = 10**12) -> pa.Table:
    """Stationary distribution of the first-order event-type Markov
    chain (the long-run share of each action) by integer fixed-point
    power iteration -- the steady-state sibling of
    ``event_type_transitions``.

    Shape: transition counts come from the distributed 64-bucket
    transition pipeline (the only corpus-scale pass); the chain itself
    is a k x k matrix (k = #event types, bounded), so the power
    iteration folds on the driver in exact python ints:
    ``pi'_j = sum_i pi_i * c_ij // rowsum_i`` with dangling rows
    (rowsum 0) spreading uniformly, n_iters fixed -- every term is
    order-independent integer math, so the distributed count table
    yields bit-identical results to the serial golden
    (tools/gen_golden.py gen_markov_golden)."""
    rows = event_type_transitions(sf_dir).take_all()
    types = sorted({r["prev_type"] for r in rows}
                   | {r["next_type"] for r in rows})
    idx = {t: i for i, t in enumerate(types)}
    k = len(types)
    c = [[0] * k for _ in range(k)]
    for r in rows:
        c[idx[r["prev_type"]]][idx[r["next_type"]]] = int(r["n"])
    rowsum = [sum(row) for row in c]
    pi = [scale] * k
    for _ in range(n_iters):
        nxt = [0] * k
        for i in range(k):
            if rowsum[i] == 0:
                for j in range(k):
                    nxt[j] += pi[i] // k
            else:
                for j in range(k):
                    nxt[j] += pi[i] * c[i][j] // rowsum[i]
        pi = nxt
    tot = sum(pi)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "stationary_ppm": pa.array(
            [p * 1_000_000 // tot for p in pi], pa.int64())})


def daily_cusum_drift(sf_dir: str) -> pa.Table:
    """One-sided CUSUM drift statistic per event type over daily counts:
    ``S_t = max(0, S_{t-1} + (n_t - mu))`` with ``mu = floor(total /
    n_days)`` -- the classic change-point accumulator (a sustained rate
    shift grows S linearly; isolated spikes decay).  The distributed
    pass is one (event_type, day) groupby; the fold runs on the bounded
    day series in exact ints (the ewma_daily_events shape), mirrored by
    a DuckDB recursive CTE."""
    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.divide(pc.cast(t["ts"], pa.int64()),
                                pa.scalar(86_400_000_000, pa.int64())),
                      pa.int64())
        return pa.table({"event_type": t["event_type"], "day": day,
                         "n": pa.array(np.ones(t.num_rows, np.int64))})

    rows = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "day"]).aggregate(
            Sum("n", alias_name="n")).take_all()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (int(r["day"]), int(r["n"])))
    out_e, out_d, out_n, out_c = [], [], [], []
    for et in sorted(by_type):
        ser = sorted(by_type[et])
        mu = sum(n for _, n in ser) // len(ser)
        s = 0
        for day, n in ser:
            s = max(0, s + n - mu)
            out_e.append(et)
            out_d.append(day)
            out_n.append(n)
            out_c.append(s)
    return pa.table({"event_type": pa.array(out_e, pa.string()),
                     "day": pa.array(out_d, pa.int64()),
                     "n": pa.array(out_n, pa.int64()),
                     "cusum": pa.array(out_c, pa.int64())})


def ab_assignment_metrics(sf_dir: str, n_arms: int = 2) -> pa.Table:
    """Deterministic experiment-arm assignment + per-arm conversion
    metrics: users hash into arms by md5 of their id (stable across
    sessions, workers and cluster sizes -- the reproducible-assignment
    requirement of any A/B readout; builtin hash() is salted per process
    and must never cross workers), then each arm reports users,
    purchasers and purchase rate in ppm.

    Shape: per-batch distinct (user, purchased) partials; one tiny
    groupby(user) resolves cross-batch purchases; arm math runs on the
    bounded arm table.  The md5-hex-prefix arm rule is the same integer
    contract DuckDB can mirror (token_shard_stats pattern)."""
    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(),
            "p": pc.equal(t["event_type"], "purchase").to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = df.groupby("user_id", sort=False)["p"].max().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    users = _events(sf_dir, ["user_id", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Max("p", alias_name="p"))

    def arm_partial(t: pa.Table) -> pa.Table:
        import hashlib
        uid = t["user_id"].to_pylist()
        arm = np.fromiter(
            (int(hashlib.md5(str(u).encode()).hexdigest()[:4], 16) % n_arms
             for u in uid), np.int64, len(uid))
        return pa.table({
            "arm": pa.array(arm, pa.int64()),
            "n_users": pa.array(np.ones(len(uid), np.int64)),
            "n_purchasers": pc.cast(t["p"], pa.int64())})

    agg = users.map_batches(arm_partial, batch_format="pyarrow") \
        .groupby("arm").aggregate(Sum("n_users", alias_name="n_users"),
                                  Sum("n_purchasers",
                                      alias_name="n_purchasers"))

    def fin(t: pa.Table) -> pa.Table:
        nu = pc.cast(t["n_users"], pa.int64())
        np_ = pc.cast(t["n_purchasers"], pa.int64())
        rate = pc.divide(pc.multiply(np_, pa.scalar(1_000_000, pa.int64())),
                         nu)
        return pa.table({"arm": pc.cast(t["arm"], pa.int64()),
                         "n_users": nu, "n_purchasers": np_,
                         "purchase_rate_ppm": pc.cast(rate, pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def daily_trend_slopes(sf_dir: str) -> rd.Dataset:
    """Per-type linear trend of daily event volume, as an EXACT integer
    rational: slope = slope_num / slope_den with
    slope_num = n*S(xy) - S(x)*S(y), slope_den = n*S(xx) - S(x)^2 over
    (x = epoch day, y = daily count) -- the ordinary-least-squares
    closed form with the division never performed, so sign/rounding
    conventions cannot diverge cross-engine (the lineitem_corr_stats
    moment discipline).  Fully distributed: daily counts via one
    groupby, moment columns derived per batch, one tiny groupby(type)
    Sum -- the day table is bounded by the time span, never event
    volume."""
    us_per_day = 86_400_000_000

    def add_day(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t["ts"], pa.int64()),
                        pa.scalar(us_per_day, pa.int64()))
        return pa.table({"event_type": t["event_type"],
                         "x": pc.cast(day, pa.int64())})

    daily = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(add_day, batch_format="pyarrow") \
        .groupby(["event_type", "x"]).aggregate(Count(alias_name="y"))

    def moments(t: pa.Table) -> pa.Table:
        x = pc.cast(t["x"], pa.int64()).to_numpy()
        y = pc.cast(t["y"], pa.int64()).to_numpy()
        return pa.table({"event_type": t["event_type"],
                         "x": pa.array(x, pa.int64()),
                         "y": pa.array(y, pa.int64()),
                         "xy": pa.array(x * y, pa.int64()),
                         "xx": pa.array(x * x, pa.int64())})

    agg = daily.map_batches(moments, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Count(alias_name="n_days"), Sum("x", alias_name="sx"),
            Sum("y", alias_name="sy"), Sum("xy", alias_name="sxy"),
            Sum("xx", alias_name="sxx"))

    def fin(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_days"], pa.int64()).to_numpy()
        sx = pc.cast(t["sx"], pa.int64()).to_numpy()
        sy = pc.cast(t["sy"], pa.int64()).to_numpy()
        sxy = pc.cast(t["sxy"], pa.int64()).to_numpy()
        sxx = pc.cast(t["sxx"], pa.int64()).to_numpy()
        # python-int products: n*sxy overflows int64 only past ~1e14
        # day-count mass; keep exact regardless of scale
        num = [int(a) * int(b) - int(c) * int(d)
               for a, b, c, d in zip(n, sxy, sx, sy)]
        den = [int(a) * int(b) - int(c) * int(c)
               for a, b, c in zip(n, sxx, sx)]
        return pa.table({"event_type": t["event_type"],
                         "n_days": pa.array(n, pa.int64()),
                         "slope_num": pa.array(num, pa.int64()),
                         "slope_den": pa.array(den, pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def point_in_time_join(sf_dir: str, fact_type: str = "purchase") -> rd.Dataset:
    """Point-in-time (as-of-state) join -- the feature-store
    correctness primitive: each ``fact_type`` event joins to the user
    state that was valid AT its timestamp, where state = the user's
    current run of non-fact activity (the SCD2 intervals of
    ``user_state_history`` computed over the stream WITH the fact type
    excluded, so the feature never leaks the label).  Facts before any
    state interval get 'none' (both engines COALESCE).

    Shape: users hash into 64 buckets (facts and state derive from the
    SAME co-located event slice, so no second shuffle); each bucket
    builds its interval runs with one shift/cumsum pass and resolves
    facts with ONE C-speed backward merge_asof -- intervals sorted by
    (valid_from, valid_to) so zero-length same-timestamp runs order
    before the covering interval and the asof tie-pick is exactly the
    containing one.  Exact vs the DuckDB interval-containment LEFT
    JOIN."""
    SENTINEL = pd.Timestamp("2100-01-01")

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def pit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        p = g[g["event_type"] == fact_type][["event_id", "user_id", "ts"]]
        if p.empty:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "state_at_ts": pd.Series([], dtype="object")})
        s = g[g["event_type"] != fact_type]
        if s.empty:
            m = p.copy()
            m["state_at_ts"] = "none"
            return m[["event_id", "user_id", "ts", "state_at_ts"]]
        change = ((s["user_id"] != s["user_id"].shift())
                  | (s["event_type"] != s["event_type"].shift()))
        run = change.cumsum()
        runs = s.groupby(run).agg(
            user_id=("user_id", "first"),
            state_at_ts=("event_type", "first"),
            valid_from=("ts", "first")).reset_index(drop=True)
        nxt = runs["valid_from"].shift(-1)
        same = runs["user_id"] == runs["user_id"].shift(-1)
        runs["valid_to"] = nxt.where(same, SENTINEL)
        runs = runs.sort_values(["valid_from", "valid_to"])
        m = pd.merge_asof(p.sort_values(["ts", "event_id"]), runs,
                          left_on="ts", right_on="valid_from",
                          by="user_id", direction="backward")
        m["state_at_ts"] = m["state_at_ts"].fillna("none")
        return m[["event_id", "user_id", "ts", "state_at_ts"]]

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(pit, batch_format="pandas")
    return out.map_batches(
        lambda t: pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "ts": pc.cast(t["ts"], pa.timestamp("us")),
            "state_at_ts": pc.cast(t["state_at_ts"], pa.string())}),
        batch_format="pyarrow")


def event_trigram_transitions(sf_dir: str, k: int = 50) -> pa.Table:
    """Second-order Markov transition counts: how often the event-type
    pair (A, B) is immediately followed by C within one user's stream
    (ordered by ts, event_id), global top-``k`` by count -- the
    sequence statistic behind second-order next-action models, the
    order-2 sibling of ``event_type_transitions``.

    Shape: the same 64-bucket user hashing (a user's events co-locate);
    each bucket runs one sort + two shifts + value_counts; per-bucket
    partials reduce through a tiny groupby(t1,t2,t3) sum and one
    bounded top-k sort (type-vocabulary^3 rows at most).  Exact vs the
    DuckDB double-LEAD oracle; ties rank lexicographically."""
    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        e = g["event_type"].to_numpy()
        same2 = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        vc = pd.DataFrame({"t1": e[:-2][same2], "t2": e[1:-1][same2],
                           "t3": e[2:][same2]}).value_counts()
        out = vc.rename("n").reset_index()
        out["n"] = out["n"].astype("int64")
        return out

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(trans, batch_format="pandas")
    agg = out.groupby(["t1", "t2", "t3"]).aggregate(
        Sum("n", alias_name="n"))
    top = agg.sort(["n", "t1", "t2", "t3"],
                   descending=[True, False, False, False]).limit(k)
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    return pa.table({"t1": t["t1"], "t2": t["t2"], "t3": t["t3"],
                     "n": pc.cast(t["n"], pa.int64())})


def user_action_simpson(sf_dir: str) -> rd.Dataset:
    """Per-user Simpson (collision) index over event types, in exact
    ppm: sum(count_t^2) * 10^6 // n^2 -- the log-free diversity metric
    (char_collision_stats' discipline applied to behavior): 10^6 means
    the user does one thing; near 1/|types| means uniform behavior.
    Bot/script detection reads high Simpson + high volume.

    Shape: per-batch (user, type) counts collapse through ONE
    groupby(user, type) sum (type vocabulary is tiny, so rows are
    bounded by users x |types|), then a second groupby(user) folds the
    squares -- no event row ever shuffles twice.  Exact integer DuckDB
    oracle."""
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        df = pa.table({"user_id": t["user_id"],
                       "event_type": t["event_type"]}).to_pandas()
        vc = df.value_counts().rename("c").reset_index()
        vc["c"] = vc["c"].astype("int64")
        return pa.Table.from_pandas(vc, preserve_index=False)

    ut = _events(sf_dir, ["user_id", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["user_id", "event_type"]).aggregate(
            _Sum("c", alias_name="c"))

    def squares(t: pa.Table) -> pa.Table:
        c = pc.cast(t["c"], pa.int64())
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "n": c,
                         "ss": pc.multiply(c, c)})

    agg = ut.map_batches(squares, batch_format="pyarrow") \
        .groupby("user_id").aggregate(_Sum("n", alias_name="n"),
                                      _Sum("ss", alias_name="ss"))

    def fin(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.int64()).to_numpy()
        ss = pc.cast(t["ss"], pa.int64()).to_numpy()
        ppm = ss * 1_000_000 // (n * n)
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "n_events": pa.array(n, pa.int64()),
                         "simpson_ppm": pa.array(ppm, pa.int64())})

    return agg.map_batches(fin, batch_format="pyarrow")


def episode_counts(sf_dir: str, window_minutes: int = 30) -> rd.Dataset:
    """Windowed co-occurrence episodes: for every ordered event-type
    pair (A, B), how often a user's A event is followed by a B event of
    the SAME user within ``window_minutes`` (NOT necessarily adjacent
    -- the episode-mining statistic, vs event_type_transitions'
    adjacency).  Per 64-bucket: one sort, then per type pair ONE
    composite-axis double-searchsorted (user code x in-bucket offset)
    counts all B events in each A event's (t, t+w] -- no per-user or
    per-event loop; the pair space is |types|^2."""
    import numpy as np

    w_us = window_minutes * 60_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def episodes(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        et = g["event_type"].to_numpy()
        codes, _ = pd.factorize(u)
        t0 = int(ts.min()) if len(ts) else 0
        span = (int(ts.max()) - t0 + w_us + 2) if len(ts) else 1
        key = codes * span + (ts - t0)
        types = sorted(set(et))
        rows = []
        for tb in types:
            kb = np.sort(key[et == tb])
            for ta in types:
                ka = key[et == ta]
                n = int((np.searchsorted(kb, ka + w_us, side="right")
                         - np.searchsorted(kb, ka, side="right")).sum())
                if n:
                    rows.append((ta, tb, n))
        return pd.DataFrame({
            "t_a": pd.Series([r[0] for r in rows], dtype="object"),
            "t_b": pd.Series([r[1] for r in rows], dtype="object"),
            "n": pd.Series([r[2] for r in rows], dtype="int64")})

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(episodes, batch_format="pandas")
    agg = out.groupby(["t_a", "t_b"]).aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"t_a": t["t_a"], "t_b": t["t_b"],
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow")


def debounced_events(sf_dir: str, window_minutes: int = 5) -> rd.Dataset:
    """Debounce / throttle dedup: keep an event only if the same user's
    PREVIOUS event of the same type is more than ``window_minutes``
    older (or absent) -- the duplicate-suppression rule event ingestion
    applies to double-clicks and retry storms.  Per 64-bucket: one sort
    + one shift; emits the surviving event ids."""
    import numpy as np

    w_us = window_minutes * 60_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts"].astype("int64").to_numpy()
        same = np.zeros(len(g), bool)
        same[1:] = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        gap_ok = np.ones(len(g), bool)
        gap_ok[1:] = (ts[1:] - ts[:-1]) > w_us
        keep = ~same | gap_ok
        out = g[keep][["event_id", "user_id", "event_type", "ts"]].copy()
        out["user_id"] = out["user_id"].astype("int64")
        return out

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    return ds.groupby("bucket").map_groups(debounce,
                                           batch_format="pandas")


def events_dow_hour_heatmap(sf_dir: str) -> rd.Dataset:
    """Traffic heatmap: event counts per (ISO weekday, hour-of-day) --
    the ops/capacity matrix.  Pure integer epoch arithmetic (day
    1970-01-01 was a Thursday => dow = (epoch_day + 3) % 7 + 1 matches
    DuckDB's isodow), one groupby over the bounded 7x24 key space."""
    US_H, US_D = 3_600_000_000, 86_400_000_000

    def keys(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        day = us // US_D
        dow = (day + 3) % 7 + 1
        hour = (us % US_D) // US_H
        df = pd.DataFrame({"dow": dow, "hour": hour})
        vc = df.value_counts().rename("n").reset_index()
        vc["n"] = vc["n"].astype("int64")
        return pa.Table.from_pandas(vc, preserve_index=False)

    agg = _events(sf_dir, ["ts"]) \
        .map_batches(keys, batch_format="pyarrow") \
        .groupby(["dow", "hour"]).aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"dow": pc.cast(t["dow"], pa.int64()),
                            "hour": pc.cast(t["hour"], pa.int64()),
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow")


def reactivation_report(sf_dir: str, dormant_days: int = 60) -> rd.Dataset:
    """Winback analytics over orders: reactivations (an order placed
    after more than ``dormant_days`` of customer silence) counted per
    reactivation month -- the retention team's recovery curve.  The
    64-bucket custkey shape: one sort + shift per bucket emits
    (month, 1) partials, a tiny month groupby sums."""
    import numpy as np

    US_D = 86_400_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["o_custkey"], 63), pa.int32())
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"],
                         "o_orderdate": t["o_orderdate"],
                         "bucket": b})

    def react(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        u = g["o_custkey"].to_numpy()
        d = g["o_orderdate"].astype("int64").to_numpy() // US_D
        same = np.zeros(len(g), bool)
        same[1:] = u[1:] == u[:-1]
        gap = np.zeros(len(g), np.int64)
        gap[1:] = d[1:] - d[:-1]
        hit = same & (gap > dormant_days)
        months = g["o_orderdate"].dt.strftime("%Y-%m").to_numpy()[hit]
        vc = pd.Series(months).value_counts()
        return pd.DataFrame({"month": vc.index.astype(str),
                             "n": vc.to_numpy().astype("int64")})

    ds = _t(sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    out = ds.groupby("bucket").map_groups(react, batch_format="pandas")
    agg = out.groupby("month").aggregate(Sum("n", alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"month": t["month"],
                            "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow")


def _t(sf_dir, name, columns=None):
    import os as _os

    import ray.data as _rd
    return _rd.read_parquet(_os.path.join(sf_dir, f"{name}.parquet"),
                            columns=columns)


def churn_labels(sf_dir: str, horizon_days: int = 14) -> rd.Dataset:
    """ML label engineering: per-user churn label + feature row --
    ``churned`` = no activity in the final ``horizon_days`` of the
    observed window (label), with n_events / n_purchases /
    active_days / last_seen_day features.  One pass of per-user
    partials (the user_activity_span shape), the global window end from
    parquet statistics-level aggregates; exact integer day math."""
    US_D = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        day = us // US_D
        et = t["event_type"].to_pylist()
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(),
            "day": day,
            "purchase": np.array([1 if x == "purchase" else 0
                                  for x in et], np.int64)})
        g = df.groupby("user_id").agg(
            n_events=("day", "size"), n_purchases=("purchase", "sum"),
            last_day=("day", "max"),
            days=("day", lambda s: len(set(s)))).reset_index()
        for c in ("n_events", "n_purchases", "last_day", "days"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Max as _Max

    parts = _events(sf_dir, ["ts", "user_id", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow")
    # NOTE: per-batch "days" partials may double-count a day split
    # across batches; collapse via a second exact distinct pass instead
    days = _events(sf_dir, ["ts", "user_id"]).map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"],
            "day": pc.cast(pc.divide(pc.cast(t["ts"], pa.int64()),
                                     pa.scalar(US_D, pa.int64())),
                           pa.int64())}),
        batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(Count(alias_name="_c")) \
        .groupby("user_id").aggregate(Count(alias_name="active_days"))
    agg = parts.groupby("user_id").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_purchases", alias_name="n_purchases"),
        _Max("last_day", alias_name="last_seen_day"))
    end_day = int(agg.max("last_seen_day"))
    joined = agg.join(days.materialize(), join_type="inner",
                      on=("user_id",), num_partitions=2)

    def fin(t: pa.Table) -> pa.Table:
        last = pc.cast(t["last_seen_day"], pa.int64()).to_numpy()
        churned = last < (end_day - horizon_days)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "n_purchases": pc.cast(t["n_purchases"], pa.int64()),
            "active_days": pc.cast(t["active_days"], pa.int64()),
            "last_seen_day": pa.array(last, pa.int64()),
            "churned": pa.array(churned, pa.bool_())})

    return joined.map_batches(fin, batch_format="pyarrow")


def cohort_ltv_curves(sf_dir: str) -> rd.Dataset:
    """Cohort LTV curves: cumulative spend CENTS per (first-seen-week
    cohort, week offset) -- the canonical retention-revenue matrix.
    Per 64-bucket: each user's first week and per-week spend come from
    one sorted pandas pass; the (cohort, offset) partials reduce
    through a tiny groupby, and the cumulative fold runs on the
    driver-side bounded week grid (weeks x weeks cells)."""
    import numpy as np

    US_W = 7 * 86_400_000_000

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        w = (g["ts"].astype("int64") // US_W).to_numpy()
        cents = np.rint(g["value"].to_numpy() * 100).astype(np.int64)
        u = g["user_id"].to_numpy()
        df = pd.DataFrame({"u": u, "w": w, "c": cents})
        first = df.groupby("u")["w"].min().rename("cohort")
        df = df.join(first, on="u")
        df["off"] = df["w"] - df["cohort"]
        out = df.groupby(["cohort", "off"], as_index=False)["c"].sum()
        out["c"] = out["c"].astype("int64")
        return out

    ds = _events(sf_dir, ["ts", "user_id", "value"]) \
        .map_batches(add_bucket, batch_format="pyarrow")
    agg = ds.groupby("bucket").map_groups(partial,
                                          batch_format="pandas") \
        .groupby(["cohort", "off"]).aggregate(Sum("c", alias_name="c")) \
        .take_all()
    rows = sorted(((int(r["cohort"]), int(r["off"]), int(r["c"]))
                   for r in agg))
    out_c, out_o, out_cum = [], [], []
    cum, cur = 0, None
    for coh, off, c in rows:
        if coh != cur:
            cur, cum = coh, 0
        cum += c
        out_c.append(coh)
        out_o.append(off)
        out_cum.append(cum)
    return rd.from_arrow(pa.table({
        "cohort_week": pa.array(out_c, pa.int64()),
        "week_offset": pa.array(out_o, pa.int64()),
        "cum_spend_cents": pa.array(out_cum, pa.int64())}))


def weekday_seasonality_index(sf_dir: str) -> rd.Dataset:
    """Per-type weekday seasonality index: each ISO weekday's share of
    the type's volume vs a uniform week, in ppm (n_cell * 7 * 10^6 //
    n_type; 10^6 = flat) -- the day-of-week effect table.  One bounded
    (type, dow) groupby; the per-type totals fold on the tiny grid."""
    US_D = 86_400_000_000

    def keys(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy()
        dow = (us // US_D + 3) % 7 + 1
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "dow": dow})
        vc = df.value_counts().rename("n").reset_index()
        vc["n"] = vc["n"].astype("int64")
        return pa.Table.from_pandas(vc, preserve_index=False)

    cells = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(keys, batch_format="pyarrow") \
        .groupby(["event_type", "dow"]).aggregate(
            Sum("n", alias_name="n")).take_all()
    totals: dict[str, int] = {}
    for r in cells:
        totals[r["event_type"]] = totals.get(r["event_type"], 0) \
            + int(r["n"])
    rows = sorted(cells, key=lambda r: (r["event_type"], r["dow"]))
    return rd.from_arrow(pa.table({
        "event_type": pa.array([r["event_type"] for r in rows],
                               pa.string()),
        "dow": pa.array([int(r["dow"]) for r in rows], pa.int64()),
        "n": pa.array([int(r["n"]) for r in rows], pa.int64()),
        "index_ppm": pa.array(
            [int(r["n"]) * 7 * 1_000_000 // totals[r["event_type"]]
             for r in rows], pa.int64())}))


def daily_type_correlation(sf_dir: str) -> rd.Dataset:
    """Pearson correlation between event types' DAILY volumes, for
    every type pair over the shared day grid -- do clicks and
    purchases move together?  The lineitem_corr_stats discipline: the
    corpus reduces to the bounded (type, day) count grid, all moments
    are exact Python-int sums, and the final r is ONE float expression
    over exact ints -- the SQL mirror computes the identical formula
    (never the built-in corr(), whose accumulation order differs)."""
    import math

    US_D = 86_400_000_000

    def keys(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.divide(pc.cast(t["ts"], pa.int64()),
                                pa.scalar(US_D, pa.int64())), pa.int64())
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "day": day.to_numpy()})
        vc = df.value_counts().rename("n").reset_index()
        vc["n"] = vc["n"].astype("int64")
        return pa.Table.from_pandas(vc, preserve_index=False)

    cells = _events(sf_dir, ["ts", "event_type"]) \
        .map_batches(keys, batch_format="pyarrow") \
        .groupby(["event_type", "day"]).aggregate(
            Sum("n", alias_name="n")).take_all()
    by_type: dict[str, dict[int, int]] = {}
    days: set[int] = set()
    for r in cells:
        by_type.setdefault(r["event_type"], {})[int(r["day"])] = \
            int(r["n"])
        days.add(int(r["day"]))
    grid = sorted(days)
    types = sorted(by_type)
    out_a, out_b, out_r = [], [], []
    for i, a in enumerate(types):
        xa = [by_type[a].get(d, 0) for d in grid]
        for b in types[i + 1:]:
            xb = [by_type[b].get(d, 0) for d in grid]
            n = len(grid)
            sx, sy = sum(xa), sum(xb)
            sxy = sum(p * q for p, q in zip(xa, xb))
            sxx = sum(p * p for p in xa)
            syy = sum(q * q for q in xb)
            num = float(n * sxy - sx * sy)
            den = math.sqrt(float(n * sxx - sx * sx)) \
                * math.sqrt(float(n * syy - sy * sy))
            out_a.append(a)
            out_b.append(b)
            out_r.append(num / den if den else 0.0)
    return rd.from_arrow(pa.table({
        "type_a": pa.array(out_a, pa.string()),
        "type_b": pa.array(out_b, pa.string()),
        "r": pa.array([round(v, 6) for v in out_r], pa.float64())}))


def dau_mau_stickiness(sf_dir: str) -> rd.Dataset:
    """Monthly DAU/MAU stickiness in exact ppm: per month,
    sum-of-daily-distinct-users * 10^6 // (n_active_days * MAU) -- the
    classic engagement ratio, integer-exact so both engines agree to
    the last digit.  One distinct (month, day, user) pass feeds both
    the daily and the monthly distinct counts; everything after is
    bounded by the calendar."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    def mdu(t: pa.Table) -> pa.Table:
        # timestamp[us] keys: the floor_temporal-narrows-in-groupby trap
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"),
                      pa.timestamp("us"))
        month = pc.cast(pc.floor_temporal(t["ts"], unit="month"),
                        pa.timestamp("us"))
        return pa.table({"month": month, "day": day,
                         "user_id": pc.cast(t["user_id"], pa.int64())}) \
            .group_by(["month", "day", "user_id"]).aggregate([])

    distinct = _events(sf_dir, ["ts", "user_id"]) \
        .map_batches(mdu, batch_format="pyarrow") \
        .groupby(["month", "day", "user_id"]) \
        .aggregate(_Count(alias_name="_c"))

    dau = distinct.map_batches(
        lambda t: t.select(["month", "day"]), batch_format="pyarrow") \
        .groupby(["month", "day"]).aggregate(_Count(alias_name="dau"))
    mau = distinct.map_batches(
        lambda t: t.select(["month", "user_id"]).group_by(
            ["month", "user_id"]).aggregate([]),
        batch_format="pyarrow") \
        .groupby(["month", "user_id"]).aggregate(_Count(alias_name="_c")) \
        .map_batches(lambda t: t.select(["month"]),
                     batch_format="pyarrow") \
        .groupby("month").aggregate(_Count(alias_name="mau"))

    # bounded: one row per (month, day) / month -- join on the calendar
    dsum = dau.map_batches(
        lambda t: pa.table({"month": pc.cast(t["month"],
                                             pa.timestamp("us")),
                            "dau": pc.cast(t["dau"], pa.int64())}),
        batch_format="pyarrow").groupby("month").aggregate(
        _Sum("dau", alias_name="dau_sum"), _Count(alias_name="n_days"))
    # .repartition(2): a hash groupby can emit a zero-row EMPTY-SCHEMA
    # block that breaks the next join (the ray 2.49 trap family)
    mau_m = mau.map_batches(
        lambda t: pa.table({"month": pc.cast(t["month"],
                                             pa.timestamp("us")),
                            "mau": pc.cast(t["mau"], pa.int64())}),
        batch_format="pyarrow").repartition(2).materialize()
    # the groupby narrows timestamp[us] keys to [s] -- re-widen AFTER
    dsum = dsum.map_batches(
        lambda t: pa.table({"month": pc.cast(t["month"],
                                             pa.timestamp("us")),
                            "dau_sum": pc.cast(t["dau_sum"], pa.int64()),
                            "n_days": pc.cast(t["n_days"], pa.int64())}),
        batch_format="pyarrow")
    joined = dsum.repartition(2).join(mau_m, join_type="inner",
                                      on=("month",), num_partitions=2)

    def fin(t: pa.Table) -> pa.Table:
        ds = pc.cast(t["dau_sum"], pa.int64()).to_numpy()
        nd = pc.cast(t["n_days"], pa.int64()).to_numpy()
        ma = pc.cast(t["mau"], pa.int64()).to_numpy()
        import numpy as np
        ppm = ds * 1_000_000 // (nd * ma)
        return pa.table({
            "month": t["month"],
            "n_days": pa.array(nd, pa.int64()),
            "mau": pa.array(ma, pa.int64()),
            "stickiness_ppm": pa.array(ppm, pa.int64())})

    return joined.map_batches(fin, batch_format="pyarrow")


def repeat_purchase_rate(sf_dir: str) -> pa.Table:
    """Repeat-buyer share: users with >= 2 purchase events as exact ppm
    of users with >= 1 -- the one-number retention headline.  Per-batch
    partial (user, count) rows, one groupby, bounded finalize."""
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "purchase")
        vc = t.filter(m)["user_id"].combine_chunks().value_counts()
        return pa.table({
            "user_id": pc.cast(vc.field("values"), pa.int64()),
            "n": pc.cast(vc.field("counts"), pa.int64())})

    per_user = _events(sf_dir, ["user_id", "event_type"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(_Sum("n", alias_name="n_purchases"))
    rows = per_user.map_batches(
        lambda t: pa.table({
            "b": pa.array([t.num_rows], pa.int64()),
            "r": pa.array([int(pc.sum(pc.greater_equal(
                pc.cast(t["n_purchases"], pa.int64()), 2)).as_py() or 0)],
                pa.int64())}),
        batch_format="pyarrow").take_all()
    n_buyers = sum(r["b"] for r in rows)
    n_repeat = sum(r["r"] for r in rows)
    return pa.table({
        "n_buyers": pa.array([n_buyers], pa.int64()),
        "n_repeaters": pa.array([n_repeat], pa.int64()),
        "repeat_ppm": pa.array(
            [n_repeat * 1_000_000 // max(1, n_buyers)], pa.int64())})


def winsorized_value_stats(sf_dir: str, lo_q: float = 0.05,
                           hi_q: float = 0.95) -> pa.Table:
    """Winsorized (clamped-tail) value statistics per event type -- the
    robust-mean a spend dashboard shows when outliers poison the plain
    average.  Values become integer CENTS (floor(value*100), the exact
    cross-engine convention); per-(type, cents) histogram partials fold
    through one groupby into a BOUNDED table (types x distinct cents),
    from which the driver derives the quantile_disc cut points
    (sorted[ceil(n*q)-1], DuckDB's rule) and the exact clamped sum --
    the full pass never runs twice and nothing float touches the
    result."""
    import math

    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["value"].to_numpy().astype(np.float64) * 100
        ).astype(np.int64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pylist(),
                           "cents": cents})
        g = df.groupby(["event_type", "cents"], sort=False).size() \
            .reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = _events(sf_dir, ["event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "cents"]) \
        .aggregate(_Sum("n", alias_name="n")).take_all()

    rows = {}
    for r in hist:
        rows.setdefault(r["event_type"], []).append(
            (int(r["cents"]), int(r["n"])))
    out = {"event_type": [], "n": [], "lo_c": [], "hi_c": [],
           "winsorized_sum_c": [], "winsorized_mean_c": []}
    for et in sorted(rows):
        pairs = sorted(rows[et])
        cents = np.array([p[0] for p in pairs], np.int64)
        cnt = np.array([p[1] for p in pairs], np.int64)
        n = int(cnt.sum())
        cum = np.cumsum(cnt)

        def q_disc(q: float) -> int:
            k = math.ceil(n * q) - 1          # 0-based rank, DuckDB rule
            return int(cents[np.searchsorted(cum, k, side="right")])

        lo, hi = q_disc(lo_q), q_disc(hi_q)
        clamped = np.clip(cents, lo, hi)
        s = int((clamped * cnt).sum())
        out["event_type"].append(et)
        out["n"].append(n)
        out["lo_c"].append(lo)
        out["hi_c"].append(hi)
        out["winsorized_sum_c"].append(s)
        out["winsorized_mean_c"].append(s // n)
    return pa.table({k: pa.array(v, pa.string() if k == "event_type"
                                 else pa.int64())
                     for k, v in out.items()})


def gap_burstiness_by_type(sf_dir: str) -> pa.Table:
    """Inter-arrival burstiness per event type: CV^2 of the per-(user,
    type) consecutive gaps in exact integer ppm --
    (n * sum(d^2) - sum(d)^2) * 10^6 // sum(d)^2 over floor-second gaps
    (diff in microseconds FIRST, then floor-divide: floor of the diff,
    not diff of floors -- the date_diff mirror).  0 = metronome,
    1e6 = Poisson, above = bursty.  Shape: 64-bucket by user, per-batch
    lexsort + segment diff, integer moment partials; the driver reduce
    runs in Python ints (sum d^2 would overflow int64 at full scale;
    DuckDB's HUGEINT SUM mirrors)."""
    from ray.data.aggregate import Sum as _Sum

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return t.append_column("bucket", b)

    def partials(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].astype("int64").to_numpy()
        eid = g["event_id"].to_numpy(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        et, ecode = pd.factorize(g["event_type"])
        order = np.lexsort((eid, ts, et, uid))
        ts_s, et_s, uid_s = ts[order], et[order], uid[order]
        same = (uid_s[1:] == uid_s[:-1]) & (et_s[1:] == et_s[:-1])
        d = (ts_s[1:] - ts_s[:-1]) // 1_000_000
        d, grp = d[same], et_s[1:][same]
        out = []
        for code in np.unique(grp):
            m = grp == code
            dd = d[m]
            out.append((ecode[code], len(dd), int(dd.sum()),
                        int((dd.astype(object) ** 2).sum())))
        return pd.DataFrame(out, columns=["event_type", "n_gaps",
                                          "sum_d", "sum_d2"]) \
            .astype({"n_gaps": "int64", "sum_d": "int64"})

    parts = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(partials, batch_format="pandas") \
        .take_all()

    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["event_type"], [0, 0, 0])
        a[0] += int(r["n_gaps"])
        a[1] += int(r["sum_d"])
        a[2] += int(r["sum_d2"])
    ets = sorted(agg)
    return pa.table({
        "event_type": pa.array(ets, pa.string()),
        "n_gaps": pa.array([agg[e][0] for e in ets], pa.int64()),
        "sum_gap_s": pa.array([agg[e][1] for e in ets], pa.int64()),
        "burstiness_ppm": pa.array(
            [(agg[e][0] * agg[e][2] - agg[e][1] ** 2) * 1_000_000
             // (agg[e][1] ** 2) for e in ets], pa.int64())})


def type_user_jaccard_matrix(sf_dir: str) -> pa.Table:
    """Pairwise Jaccard overlap of the USER sets behind each event type
    in exact ppm (|A ∩ B| * 10^6 // |A ∪ B|) -- the audience-overlap
    matrix behind funnel design (do clickers and purchasers share a
    population?).  One distinct (type, user) groupby bounds everything;
    the pair fold runs on the tiny type grid."""
    from ray.data.aggregate import Count as _Count

    distinct = _events(sf_dir, ["event_type", "user_id"]) \
        .groupby(["event_type", "user_id"]) \
        .aggregate(_Count(alias_name="_c")).take_all()
    sets: dict[str, set] = {}
    for r in distinct:
        sets.setdefault(r["event_type"], set()).add(int(r["user_id"]))
    types = sorted(sets)
    out_a, out_b, out_j, out_i, out_u = [], [], [], [], []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            out_a.append(a)
            out_b.append(b)
            out_i.append(inter)
            out_u.append(union)
            out_j.append(inter * 1_000_000 // max(1, union))
    return pa.table({
        "type_a": pa.array(out_a, pa.string()),
        "type_b": pa.array(out_b, pa.string()),
        "n_common": pa.array(out_i, pa.int64()),
        "n_union": pa.array(out_u, pa.int64()),
        "jaccard_ppm": pa.array(out_j, pa.int64())})
