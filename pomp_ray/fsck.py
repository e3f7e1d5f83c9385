"""Checkpoint integrity checker (``pomp_ray.cli fsck``): verify that a
crawl checkpoint's on-disk state is consistent with its committed round
records before trusting it for resume / publish / analytics.

What a 100-TB operator actually needs to know after a crash or a copy:

* every committed round JSON's counters agree with the parquet files it
  points at (items rows, next-frontier rows, error rows);
* every frontier/deferred part's ``.stats.json`` sidecar agrees with the
  parquet metadata it summarizes (the driver's metadata-only round loop
  TRUSTS these -- a stale sidecar silently mis-sizes rounds);
* the seen-set snapshot deltas cover every committed round for a
  consistent shard set (a missing shard file breaks restore).

All checks are METADATA-reads only (parquet footers + sidecars + round
JSONs) except ``deep=True``, which additionally assembles the logical
errors table (column reads) and reconciles total error counts.  Returns
a report dict; ``ok`` is False iff any problem was found.

Ref: pomp has no checkpointing at all (SURVEY.md section 2.3 T2 [NR]);
this tool audits the north_rule's "resumes from Parquet checkpoints of
frontier + seen-set state" surface.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq


def _round_of(path: str) -> int:
    return int(os.path.basename(path)[len("round-"):].split(".")[0])


def _dir_rows(d: str) -> int:
    return sum(pq.ParquetFile(p).metadata.num_rows
               for p in glob.glob(os.path.join(d, "*.parquet")))


def verify_checkpoint(ckpt_dir: str, deep: bool = False) -> dict:
    problems: list[str] = []
    rounds_dir = os.path.join(ckpt_dir, "rounds")
    infos: dict[int, dict] = {}
    for p in sorted(glob.glob(os.path.join(rounds_dir, "round-*.json"))):
        with open(p) as f:
            infos[_round_of(p)] = json.load(f)
    if not infos:
        return {"ok": False, "rounds": 0,
                "problems": ["no committed rounds"]}
    last = max(infos)
    if sorted(infos) != list(range(last + 1)):
        problems.append(
            f"round gap: committed rounds {sorted(infos)} not contiguous")

    # gc horizon: consumed frontier/deferred inputs below it were
    # legitimately collected by gc_checkpoint -- skip their
    # next-frontier reconciliation (the files are gone by design)
    gc_upto = -1
    gc_marker = os.path.join(rounds_dir, "gc.json")
    if os.path.exists(gc_marker):
        with open(gc_marker) as f:
            gc_upto = json.load(f).get("collected_upto", -1)

    # --- per-round counter reconciliation (metadata only) ---
    for r, info in sorted(infos.items()):
        items_dir = os.path.join(ckpt_dir, "items", f"round-{r:06d}")
        n_items_files = _dir_rows(items_dir)
        # scale-layout items keep misses in-band (rows == n_selected);
        # driver/exact layouts write visited rows only (== n_items)
        want = (info["n_selected"] if info.get("path") == "scale"
                else info["n_items"])
        if n_items_files != want:
            problems.append(
                f"round {r}: items rows {n_items_files} != committed "
                f"{want} ({info.get('path', '?')} layout)")
        # next frontier: new + deferred rows, minus in-band blocked rows
        if r + 1 <= gc_upto:
            continue
        nf_dir = os.path.join(ckpt_dir, "frontier", f"round-{r + 1:06d}")
        df_dir = os.path.join(ckpt_dir, "deferred", f"round-{r:06d}")
        n_next = 0
        for d in (nf_dir, df_dir):
            for part in glob.glob(os.path.join(d, "*.parquet")):
                side = part[:-len(".parquet")] + ".stats.json"
                meta_rows = pq.ParquetFile(part).metadata.num_rows
                if os.path.exists(side):
                    with open(side) as f:
                        st = json.load(f)
                    if st.get("n") != meta_rows:
                        problems.append(
                            f"sidecar mismatch: {part} sidecar n="
                            f"{st.get('n')} vs parquet {meta_rows}")
                    n_next += st.get("n", meta_rows) \
                        - st.get("n_blocked", 0)
                else:
                    # sidecar-less part (driver-written pre-sidecar or
                    # foreign file): count unblocked via the column
                    t = pq.read_table(part, columns=["blocked"])
                    import pyarrow.compute as pc
                    n_next += t.num_rows \
                        - int(pc.sum(t["blocked"]).as_py() or 0)
        if n_next != info["n_frontier_next"]:
            problems.append(
                f"round {r}: next-frontier rows {n_next} != committed "
                f"n_frontier_next {info['n_frontier_next']}")

    # --- seen-set snapshot coverage ---
    seen_dir = os.path.join(ckpt_dir, "seen")
    shard_rounds: dict[int, set[int]] = {}
    for p in glob.glob(os.path.join(seen_dir, "seen-shard*.parquet")):
        name = os.path.basename(p)
        shard = int(name.split("shard")[1].split("-")[0])
        rnd = int(name.split("round")[1].split(".")[0])
        shard_rounds.setdefault(shard, set()).add(rnd)
    if not shard_rounds:
        problems.append("no seen-set snapshots")
    else:
        want_rounds = set.union(*shard_rounds.values())
        for shard, have in sorted(shard_rounds.items()):
            missing = want_rounds - have
            if missing:
                problems.append(
                    f"seen shard {shard}: missing snapshot rounds "
                    f"{sorted(missing)} (restore would silently drop "
                    f"those urls)")

    # --- metrics lineage present per committed round ---
    for r in infos:
        mp = os.path.join(ckpt_dir, "metrics", f"round-{r:06d}.parquet")
        if not os.path.exists(mp):
            problems.append(f"round {r}: metrics lineage file missing")

    if deep:
        from pomp_ray.crawl import read_errors
        n_err = read_errors(ckpt_dir).num_rows
        want_err = sum(i["n_errors"] for i in infos.values())
        if n_err != want_err:
            problems.append(
                f"deep: logical errors table has {n_err} rows, committed "
                f"rounds sum to {want_err}")

    return {"ok": not problems, "rounds": last + 1,
            "n_problems": len(problems), "problems": problems}


def gc_checkpoint(ckpt_dir: str) -> dict:
    """Garbage-collect a crawl checkpoint without touching anything a
    ``run(resume=True)`` (or publish/analytics read) still needs.  At
    100-TB scale the frontier history and per-round seen-set deltas
    dominate checkpoint size long after they stop being useful:

    * ``frontier/round-r`` for r <= last and ``deferred/round-r`` for
      r <= last-1 are CONSUMED inputs (round r reads frontier/round-r
      plus deferred/round-(r-1)); resume starts at last+1 and only
      reads frontier/round-(last+1) + deferred/round-last.  Deleted.
    * seen/digests shard deltas are replayed in full on restore
      (``restore(upto=last+1)`` -- round r's snapshot is written under
      r+1); they compact to ONE file per shard (union of digests,
      atomically renamed into the round-``last+1`` slot) -- restore
      replays the compacted file and is set-identical.
    * items / errors / metrics / rounds JSONs are outputs or lineage:
      untouched.

    Leaves ``rounds/gc.json`` recording the collection horizon so
    ``verify_checkpoint`` skips next-frontier reconciliation for rounds
    whose consumed inputs are gone.  Returns
    {last, n_dirs_removed, n_files_compacted, n_bytes_freed}."""
    import pyarrow as pa

    rounds = sorted(glob.glob(os.path.join(ckpt_dir, "rounds",
                                           "round-*.json")))
    if not rounds:
        raise FileNotFoundError("no committed rounds to gc")
    last = _round_of(rounds[-1])

    import shutil

    def _tree_bytes(d: str) -> int:
        return sum(os.path.getsize(os.path.join(dp, f))
                   for dp, _, fs in os.walk(d) for f in fs)

    n_dirs = 0
    n_bytes = 0
    # canonstats sidecars are folded into the round JSON at commit time;
    # past-round dirs are pure lineage residue
    for kind, upto in (("frontier", last), ("deferred", last - 1),
                       ("canonstats", last)):
        for d in sorted(glob.glob(os.path.join(ckpt_dir, kind,
                                               "round-*"))):
            if _round_of(d) <= upto:
                n_bytes += _tree_bytes(d)
                shutil.rmtree(d)
                n_dirs += 1

    n_compacted = 0
    for state in ("seen", "digests"):
        sdir = os.path.join(ckpt_dir, state)
        if not os.path.isdir(sdir):
            continue
        by_shard: dict[int, list[str]] = {}
        for p in glob.glob(os.path.join(sdir, "seen-shard*.parquet")):
            name = os.path.basename(p)
            shard = int(name.split("shard")[1].split("-")[0])
            rnd = int(name.split("round")[1].split(".")[0])
            if rnd <= last + 1:
                by_shard.setdefault(shard, []).append(p)
        for shard, files in sorted(by_shard.items()):
            target = os.path.join(
                sdir,
                f"seen-shard{shard:04d}-round{last + 1:06d}.parquet")
            if files == [target]:
                continue
            digs = pa.concat_tables(
                [pq.read_table(p, columns=["digest"]) for p in files])
            uniq = digs.group_by(["digest"]).aggregate([]).sort_by("digest")
            before = sum(os.path.getsize(p) for p in files)
            tmp = target + ".tmp"
            pq.write_table(uniq, tmp)
            os.replace(tmp, target)
            for p in files:
                if p != target:
                    os.remove(p)
            n_bytes += before - os.path.getsize(target)
            n_compacted += len(files)

    with open(os.path.join(ckpt_dir, "rounds", "gc.json"), "w") as f:
        json.dump({"collected_upto": last}, f)
    return {"last": last, "n_dirs_removed": n_dirs,
            "n_files_compacted": n_compacted, "n_bytes_freed": n_bytes}


def reshard_checkpoint(ckpt_dir: str, new_n_shards: int) -> dict:
    """Re-shard the seen/digest state of a checkpoint so a crawl can
    RESUME on a different ``n_seen_shards`` -- the operational move when
    the cluster grows (more shards = more check-and-add throughput) or
    shrinks.  Digests route to shards by ``shard_of(digest, n)``, so
    snapshot files written under one shard count are unreadable under
    another; this tool rewrites them.

    For each state dir (seen/, digests/): union every shard delta up to
    the committed horizon (round last+1 -- round r's snapshot lives
    under r+1, the gc_checkpoint convention), reassign each digest with
    the NEW shard function, and write one compacted file per new shard
    atomically into the round-(last+1) slot before deleting the old
    layout.  Restore replays only files matching the shard's own id, so
    stale old-count files MUST be removed (a shrink would otherwise
    silently drop the high shards' digests).  Leaves
    ``rounds/reshard.json`` recording the new count.  Returns
    {last, n_files_in, n_shards_out, n_digests}."""
    import pyarrow as pa

    from pomp_ray.state.seen import shard_of

    rounds = sorted(glob.glob(os.path.join(ckpt_dir, "rounds",
                                           "round-*.json")))
    if not rounds:
        raise FileNotFoundError("no committed rounds to reshard")
    last = _round_of(rounds[-1])

    n_in = 0
    n_digests = 0
    for state in ("seen", "digests"):
        sdir = os.path.join(ckpt_dir, state)
        if not os.path.isdir(sdir):
            continue
        files = [p for p in glob.glob(os.path.join(
                     sdir, "seen-shard*.parquet"))
                 if int(os.path.basename(p)
                        .split("round")[1].split(".")[0]) <= last + 1]
        if not files:
            continue
        n_in += len(files)
        digs = pa.concat_tables(
            [pq.read_table(p, columns=["digest"]) for p in files])
        uniq = digs.group_by(["digest"]).aggregate([]).sort_by("digest")
        col = uniq["digest"].to_pylist()
        n_digests += len(col)
        by_new: dict[int, list[bytes]] = {}
        for d in col:
            by_new.setdefault(shard_of(d, new_n_shards), []).append(d)
        tmps: list[tuple[str, str]] = []
        for shard, ds in sorted(by_new.items()):
            target = os.path.join(
                sdir,
                f"seen-shard{shard:04d}-round{last + 1:06d}.parquet")
            tmp = target + ".reshard.tmp"
            pq.write_table(
                pa.table({"digest": pa.array(ds, pa.binary())}), tmp)
            tmps.append((tmp, target))
        # all new files staged; now swap the layout atomically-enough:
        # remove old files first (so a same-named slot file is not both
        # input and output), then rename the staged ones in
        for p in files:
            os.remove(p)
        for tmp, target in tmps:
            os.replace(tmp, target)

    with open(os.path.join(ckpt_dir, "rounds", "reshard.json"), "w") as f:
        json.dump({"n_shards": new_n_shards, "at_round": last}, f)
    return {"last": last, "n_files_in": n_in,
            "n_shards_out": new_n_shards, "n_digests": n_digests}
