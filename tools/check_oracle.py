"""Local stand-in for the driver's correctness gate: run every
``__ray_entry__.queries()`` entry at sf0.01 and compare against its
``oracle_sql()`` DuckDB result -- row count, column names, and an
order-insensitive value comparison (sorted rows, columns sorted by name).

Usage: python tools/check_oracle.py [sf_dir] [--only name1,name2,...]
                                    [--shard i/n] [--first k]

--shard i/n  checks only queries whose board position % n == i (0-based),
             so two sessions can split a full sweep (VERDICT r3 item 6).
--first k    checks only the first k registrations (the driver's window).

NOTE: the fingerprints / simhash_dup_groups oracles are committed golden
parquet generated for sf0.01 (the scale the driver's gate runs at, per
the task spec) -- running this script against another sf_dir reports
those two as expected mismatches.
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    args = sys.argv[1:]
    only: set[str] | None = None
    shard_i, shard_n, first_k = 0, 1, None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    if "--shard" in args:
        i = args.index("--shard")
        shard_i, shard_n = map(int, args[i + 1].split("/"))
        args = args[:i] + args[i + 2:]
    if "--first" in args:
        i = args.index("--first")
        first_k = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_fail = 0
    for pos, (name, fn) in enumerate(qs.items()):
        if only is not None and name not in only:
            continue
        if first_k is not None and pos >= first_k:
            continue
        if pos % shard_n != shard_i:
            continue
        t0 = time.monotonic()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(mine)} rows, {dt:.1f}s)")
            continue
        try:
            ref = canon(con.sql(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL  {name}: oracle raised {ex}")
            n_fail += 1
            continue
        problems = []
        if list(mine.columns) != list(ref.columns):
            problems.append(f"cols {list(mine.columns)} vs {list(ref.columns)}")
        elif len(mine) != len(ref):
            problems.append(f"rows {len(mine)} vs {len(ref)}")
        elif list(map(str, mine.dtypes)) != list(map(str, ref.dtypes)):
            # the driver hashes VALUES; a dtype mismatch (Int64 <NA> vs
            # float64 NaN, int32 vs int64) changes the hash even when the
            # values "look" equal -- fail it locally too
            problems.append(
                "dtypes "
                f"{dict(zip(mine.columns, map(str, mine.dtypes)))} vs "
                f"{dict(zip(ref.columns, map(str, ref.dtypes)))}")
        else:
            try:
                pd.testing.assert_frame_equal(
                    mine, ref, check_dtype=True, check_exact=False,
                    rtol=0, atol=1e-9)
            except AssertionError as ex:
                problems.append(str(ex).split("\n")[0] + " ...")
        if problems:
            print(f"FAIL  {name}: {problems[0]}")
            if len(mine) == len(ref) and list(mine.columns) == list(ref.columns):
                diff_cols = [
                    c for c in mine.columns
                    if not mine[c].reset_index(drop=True).equals(
                        ref[c].reset_index(drop=True))
                ]
                print(f"      differing cols: {diff_cols}")
            n_fail += 1
        else:
            print(f"OK    {name} ({len(mine)} rows, {dt:.1f}s)")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
