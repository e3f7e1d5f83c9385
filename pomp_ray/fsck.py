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
