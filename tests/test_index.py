"""zip_with_index (stages/index.py): global 0-based positions by key
across multiple blocks, stable across runs and block structures."""

import hashlib

import pyarrow as pa
import ray.data as rd

from pomp_ray.stages.index import zip_with_index


def _ds(n=257, n_blocks=7):
    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in range(n)]
    t = pa.table({"i": pa.array(range(n), pa.int64()),
                  "h": pa.array(keys, pa.string())})
    return rd.from_arrow(t).repartition(n_blocks)


def test_positions_are_global_rank(ray_session):
    rows = zip_with_index(_ds(), "h").take_all()
    assert sorted(r["pos"] for r in rows) == list(range(257))
    by_pos = sorted(rows, key=lambda r: r["pos"])
    assert [r["h"] for r in by_pos] == sorted(r["h"] for r in rows)


def test_stable_across_block_structures(ray_session):
    a = {r["i"]: r["pos"]
         for r in zip_with_index(_ds(n_blocks=3), "h").take_all()}
    b = {r["i"]: r["pos"]
         for r in zip_with_index(_ds(n_blocks=11), "h").take_all()}
    assert a == b


def test_empty_dataset(ray_session):
    empty = rd.from_arrow(pa.table({"i": pa.array([], pa.int64()),
                                    "h": pa.array([], pa.string())}))
    assert zip_with_index(empty, "h").take_all() == []


def test_prefix_max_matches_pandas_cummax(ray_session):
    """Distributed exclusive prefix max == pandas cummax().shift(1),
    across forced multi-block layouts and int keys that would break a
    lexicographic partial order (2 vs 10)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pomp_ray.stages.scan import prefix_max

    rng = np.random.default_rng(7)
    n = 5000
    keys = rng.permutation(n).astype(np.int64)   # unsorted arrival
    vals = np.round(rng.random(n) * 100, 2)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(13)
    out = prefix_max(ds, "k", "v", out_col="pm").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = pd.DataFrame({"k": np.sort(keys)})
    sv = pd.Series(vals[np.argsort(keys)])
    want["pm"] = sv.cummax().shift(1)
    assert out["pm"].isna().tolist() == want["pm"].isna().tolist()
    got = out["pm"].fillna(-1).to_numpy()
    exp = want["pm"].fillna(-1).to_numpy()
    assert (got == exp).all()


def test_prefix_sum_matches_pandas_cumsum(ray_session):
    """Distributed exclusive prefix sum == pandas cumsum().shift(1),
    across multi-block layouts and numeric keys."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pomp_ray.stages.scan import prefix_sum

    rng = np.random.default_rng(11)
    n = 4000
    keys = rng.permutation(n).astype(np.int64)
    vals = rng.integers(0, 50, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys, "v": vals})).repartition(9)
    out = prefix_sum(ds, "k", "v", out_col="ps").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    sv = pd.Series(vals[np.argsort(keys)])
    want = sv.cumsum().shift(1).fillna(0).astype("int64")
    assert (out["ps"].to_numpy() == want.to_numpy()).all()
