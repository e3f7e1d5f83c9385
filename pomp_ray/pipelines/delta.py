"""Snapshot delta: the incremental-crawl diff between two corpus
snapshots (the Common-Crawl monthly-snapshot shape -- what changed since
the last crawl drives recrawl scheduling and incremental downstream
processing; pomp has no equivalent, this is 100-TB-pipeline surface).

Both snapshots are reduced to skinny (doc_id, digest) tables inside
map_batches -- TEXT NEVER SHUFFLES, only 16-byte digests do -- then one
``Dataset.join(full_outer)`` on doc_id classifies every page:

  - ``added``   -- in the new snapshot only,
  - ``removed`` -- in the old snapshot only,
  - ``changed`` -- in both but content digest differs,

and unchanged pages are filtered out in the same pass, so the delta the
driver sees is output-scale (the churn), not corpus-scale.  At 100 TB
the two digest tables are what a production crawl would persist beside
each snapshot anyway (the CDX digest column); the join shuffles only
those.

The test snapshots are derived deterministically from ``documents`` by
an md5 bucket b = md5(doc_id) % 10 (mirrored literally in the DuckDB
oracle): bucket 0 is missing from OLD (-> added), bucket 1 is missing
from NEW (-> removed), bucket 2's text gains a revision suffix in NEW
(-> changed), everything else is identical (-> dropped).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from pomp_ray.pipelines.docs import _docs, _shard_ids


def _digests(t: pa.Table, texts: list[str]) -> pa.Array:
    return pa.array([hashlib.md5(s.encode("utf-8")).hexdigest()
                     for s in texts], pa.string())


def _old_side(t: pa.Table) -> pa.Table:
    b = _shard_ids(t["doc_id"].to_pylist(), 10)
    t = t.filter(pa.array(b != 0))
    return pa.table({
        "doc_id": pc.cast(t["doc_id"], pa.int64()),
        "d_old": _digests(t, t["text"].to_pylist()),
    })


def _new_side(t: pa.Table) -> pa.Table:
    b = _shard_ids(t["doc_id"].to_pylist(), 10)
    keep = b != 1
    t = t.filter(pa.array(keep))
    texts = t["text"].to_pylist()
    changed = b[keep] == 2
    texts = [s + " [rev2]" if c else s for s, c in zip(texts, changed)]
    return pa.table({
        "doc_id": pc.cast(t["doc_id"], pa.int64()),
        "d_new": _digests(t, texts),
    })


def snapshot_delta(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """(doc_id, status) rows for every added / removed / changed page
    between the derived OLD and NEW snapshots of ``documents``."""
    old = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _old_side, batch_format="pyarrow")
    new = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _new_side, batch_format="pyarrow")
    j = old.join(new, join_type="full_outer", on=("doc_id",),
                 num_partitions=num_partitions)

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "status": pa.array([], pa.string())})
        d_old, d_new = t["d_old"], t["d_new"]
        added = pc.is_null(d_old).to_numpy(zero_copy_only=False)
        removed = pc.is_null(d_new).to_numpy(zero_copy_only=False)
        # not_equal is null on added/removed rows; Kleene AND with the
        # false "both present" mask pins those to false, never null
        changed = pc.and_kleene(
            pa.array(~added & ~removed),
            pc.not_equal(d_old, d_new).combine_chunks()
            if isinstance(d_old, pa.ChunkedArray)
            else pc.not_equal(d_old, d_new),
        ).to_numpy(zero_copy_only=False)
        status = np.full(t.num_rows, "", dtype=object)
        status[added] = "added"
        status[removed] = "removed"
        status[changed] = "changed"
        out = pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                        "status": pa.array(status, pa.string())})
        return out.filter(pc.not_equal(out["status"], ""))

    return j.map_batches(classify, batch_format="pyarrow")


def host_change_rates(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """Per-source change rates between the two derived snapshots -- the
    signal an adaptive recrawl scheduler feeds back into per-host
    priorities (hosts that churn get short revisit intervals; see
    ``enqueue.HostPriority`` / ``PageRankPriority`` for the consuming
    side).  Counts docs present in BOTH snapshots per source and how
    many of those changed, as integer parts-per-million.

    Shape: the delta is already churn-scale; one hash join attaches the
    source key, two tiny groupbys aggregate.  All integers, exact SQL
    oracle composed from the same snapshot CTEs."""
    changed = snapshot_delta(sf_dir, num_partitions).map_batches(
        lambda t: t.filter(pc.equal(t["status"], "changed"))
        .select(["doc_id"]),
        batch_format="pyarrow").repartition(2).materialize()
    # ^ repartition: the upstream join can leave zero-row EMPTY-SCHEMA
    #   blocks that the next join cannot key (ray 2.49 trap);
    #   materialize = barrier before the second live join

    def in_both(t: pa.Table) -> pa.Table:
        b = _shard_ids(t["doc_id"].to_pylist(), 10)
        keep = (b != 0) & (b != 1)   # present in old AND new
        t = t.filter(pa.array(keep))
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "source": t["source"]})

    base = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        in_both, batch_format="pyarrow")
    j = base.join(changed.map_batches(
        lambda t: t.append_column(
            "chg", pa.array([True] * t.num_rows, pa.bool_())),
        batch_format="pyarrow"), join_type="left_outer", on=("doc_id",),
        num_partitions=num_partitions)

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        chg = pc.fill_null(t["chg"], False).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"source": t["source"].to_pylist(),
                           "c": chg.astype("int64")})
        g = df.groupby("source", as_index=False).agg(
            n_docs=("c", "size"), n_changed=("c", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum as _Sum
    agg = j.map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(
        _Sum("n_docs", alias_name="n_docs"),
        _Sum("n_changed", alias_name="n_changed"))

    def fin(t: pa.Table) -> pa.Table:
        nd = pc.cast(t["n_docs"], pa.int64()).to_numpy()
        nc = pc.cast(t["n_changed"], pa.int64()).to_numpy()
        return pa.table({
            "source": t["source"],
            "n_docs": pa.array(nd, pa.int64()),
            "n_changed": pa.array(nc, pa.int64()),
            "change_ppm": pa.array(nc * 1_000_000 // nd, pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def recrawl_intervals(sf_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """Adaptive recrawl schedule derived from the observed change rates:
    sources that churn get short revisit intervals (the feedback loop a
    production crawler closes between snapshot deltas and its frontier
    priorities; ``enqueue.PageRankPriority`` is the consuming side).

    Policy table (integer ppm thresholds -> hours, mirrored verbatim in
    the CASE oracle): >=500000 ppm -> 6h, >=200000 -> 24h, >=50000 ->
    72h, else 168h (weekly).  Pure derived-column work on the tiny
    per-source change table."""
    rates = host_change_rates(sf_dir, num_partitions)

    def policy(t: pa.Table) -> pa.Table:
        ppm = t["change_ppm"].to_numpy(zero_copy_only=False)
        hours = np.select(
            [ppm >= 500_000, ppm >= 200_000, ppm >= 50_000],
            [6, 24, 72], default=168).astype(np.int64)
        return t.append_column("revisit_hours",
                               pa.array(hours, pa.int64()))

    return rates.map_batches(policy, batch_format="pyarrow")


def moved_content(sf_dir: str, num_partitions: int = 16) -> pa.Table:
    """Content MOVES between snapshots: pages whose text digest appears
    at a different doc id in the new snapshot -- the url-migration signal
    a recrawl scheduler uses to transfer history (change rates, PageRank)
    to the new address instead of treating a move as remove+add (and the
    digest-keyed sibling of the url-keyed ``snapshot_delta``).

    Derivation (own buckets, mirrored in the DuckDB oracle): OLD = all
    documents; NEW drops bucket 1 and relocates bucket 3 to
    ``doc_id + 10_000_000``.  A move is reported only when the digest is
    UNIQUE on both sides (ambiguous duplicate content never pairs --
    the standard move-detection guard).

    Scale shape: both sides reduce to (digest, doc_id) inside
    map_batches (text never shuffles); per-side uniqueness is ONE
    groupby(digest) with Count+Min (count==1 => the Min IS the row);
    one inner hash join on digest pairs the sides.  Aggregates are
    materialized before the join (live-join pool starvation) and
    repartitioned (ray 2.49 empty-schema zero-row groupby blocks cannot
    feed a join)."""
    from ray.data.aggregate import Count, Min

    def old_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "d": _digests(t, t["text"].to_pylist()),
            "doc_id": pc.cast(t["doc_id"], pa.int64())})

    def new_side(t: pa.Table) -> pa.Table:
        b = _shard_ids(t["doc_id"].to_pylist(), 10)
        keep = b != 1
        t = t.filter(pa.array(keep))
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy().copy()
        ids[b[keep] == 3] += 10_000_000
        return pa.table({
            "d": _digests(t, t["text"].to_pylist()),
            "doc_id": pa.array(ids, pa.int64())})

    def unique_only(side_fn, id_name: str) -> rd.Dataset:
        agg = (_docs(sf_dir, ["doc_id", "text"])
               .map_batches(side_fn, batch_format="pyarrow")
               .groupby("d")
               .aggregate(Count(alias_name="n"),
                          Min("doc_id", alias_name=id_name)))
        return agg.map_batches(
            lambda t: pa.table({
                "d": t["d"],
                id_name: pc.cast(t[id_name], pa.int64())})
            .filter(pc.equal(t["n"], 1)),
            batch_format="pyarrow").repartition(2).materialize()

    ou = unique_only(old_side, "old_doc_id")
    nu = unique_only(new_side, "new_doc_id")
    j = ou.join(nu, join_type="inner", on=("d",),
                num_partitions=num_partitions)
    out = j.map_batches(
        lambda t: pa.table({"old_doc_id": t["old_doc_id"],
                            "new_doc_id": t["new_doc_id"]})
        .filter(pc.not_equal(t["old_doc_id"], t["new_doc_id"])),
        batch_format="pyarrow")
    tbl = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow"))
        or [pa.table({"old_doc_id": pa.array([], pa.int64()),
                      "new_doc_id": pa.array([], pa.int64())})])
    return tbl.sort_by("old_doc_id")


def merge_upsert_docs(sf_dir: str, num_partitions: int = 8) -> rd.Dataset:
    """CDC MERGE (lakehouse upsert): apply a change-set of
    inserts/updates/deletes to the documents snapshot in one pass --
    rows matched by an UPDATE take the new payload, DELETE rows drop,
    INSERT rows append, everything else carries over.

    The change-set is derived deterministically from the snapshot
    itself (so the DuckDB oracle can re-derive it): doc_id % 7 == 0 ->
    UPDATE (text doubles, version 2), doc_id % 11 == 3 -> DELETE, and
    one INSERT per update with doc_id + 10^9.  Engine shape: the
    change-set is its own Dataset, one full_outer hash join on doc_id
    merges it with the base (both sides shuffle once; nothing
    broadcast), and the row-level MERGE rules are a vectorized case
    select per batch.  Output: (doc_id, n_chars, version) --
    payload-derived columns so the compare covers the merged TEXT, not
    just membership."""
    base = _docs(sf_dir, ["doc_id", "text"])

    def changes(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy()
        upd = pa.array(did % 7 == 0, pa.bool_())
        dele = pa.array((did % 11 == 3) & (did % 7 != 0), pa.bool_())
        u = t.filter(upd)
        d = t.filter(dele)
        doubled = pc.binary_join_element_wise(u["text"], u["text"], " ")
        parts = [
            pa.table({"doc_id": u["doc_id"], "new_text": doubled,
                      "op": pa.array(["U"] * u.num_rows, pa.string())}),
            pa.table({"doc_id": pc.add(u["doc_id"], 1_000_000_000),
                      "new_text": u["text"],
                      "op": pa.array(["I"] * u.num_rows, pa.string())}),
            pa.table({"doc_id": d["doc_id"],
                      "new_text": pa.nulls(d.num_rows, pa.string()),
                      "op": pa.array(["D"] * d.num_rows, pa.string())}),
        ]
        return pa.concat_tables(parts)

    chg = base.map_batches(changes, batch_format="pyarrow") \
        .repartition(2).materialize()

    def base_cols(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "text": t["text"]})

    merged = base.map_batches(base_cols, batch_format="pyarrow") \
        .join(chg, join_type="full_outer", on=("doc_id",),
              num_partitions=num_partitions).repartition(2)

    def apply_merge(t: pa.Table) -> pa.Table:
        # vectorized MERGE rules: drop D rows, changed rows take the
        # new payload, carried rows keep the old one
        t = t.filter(pc.invert(pc.equal(
            pc.fill_null(t["op"], ""), "D")))
        op = pc.fill_null(t["op"], "")
        changed = pc.is_in(op, value_set=pa.array(["U", "I"]))
        text = pc.if_else(changed, t["new_text"], t["text"])
        n = pc.cast(pc.utf8_length(pc.fill_null(text, "")), pa.int64())
        version = pc.if_else(pc.equal(op, "U"),
                             pa.scalar(2, pa.int64()),
                             pa.scalar(1, pa.int64()))
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "n_chars": n, "version": version})

    return merged.map_batches(apply_merge, batch_format="pyarrow") \
        .sort("doc_id")
