"""Property-based tests (hypothesis) for pure kernels whose correctness
the pipelines lean on: SWAR popcount vs Python bit_count, and
label-propagation components vs a brute-force union-find."""

import pytest
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pomp_ray.pipelines.docs import _popcount64


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=200))
@settings(max_examples=200, deadline=None)
def test_popcount64_matches_python(xs):
    arr = np.array(xs, np.uint64)
    got = _popcount64(arr)
    expect = np.array([x.bit_count() for x in xs], np.uint64)
    assert (got == expect).all()


def _uf_components(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=1, max_size=25))
@settings(max_examples=5, deadline=None)   # each example is a full
                                           # multi-iteration Ray pipeline
@pytest.mark.slow
def test_connected_components_matches_union_find(edges):
    from pomp_ray.pipelines.graph import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    pairs = pa.table({
        "doc_a": pa.array([e[0] for e in edges], pa.int64()),
        "doc_b": pa.array([e[1] for e in edges], pa.int64())})
    out = connected_components(pairs)
    got = dict(zip(out["doc_id"].to_pylist(), out["component"].to_pylist()))
    assert got == _uf_components(edges)


# --------------------------------------------------- approx membership
from pomp_ray.state.approx import BloomFilter, CuckooFilter
from pomp_ray.state.seen import url_digests


@given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=300),
       st.lists(st.text(min_size=1, max_size=40), max_size=100))
@settings(max_examples=100, deadline=None)
def test_cuckoo_no_false_negatives(added, probed):
    """Every added digest answers True; the no-false-negative contract the
    seen set leans on (a false negative = a silently dropped URL)."""
    f = CuckooFilter(n_buckets=1 << 8)   # tiny: forces eviction walks
    da = url_digests(sorted(set(added)))
    f.add_bulk(da)
    assert f.contains_bulk(da).all()
    # absent probes may false-positive but never crash / mis-shape
    dp = url_digests([p for p in probed if p not in set(added)])
    if dp:
        assert f.contains_bulk(dp).shape == (len(dp),)


@given(st.lists(st.text(min_size=1, max_size=40), min_size=2, max_size=200))
@settings(max_examples=100, deadline=None)
def test_cuckoo_delete_keeps_survivors(items):
    """Deleting half the items never false-negatives the surviving half
    (the deletion property Bloom lacks; SeenShard.forget relies on it)."""
    uniq = sorted(set(items))
    half = len(uniq) // 2
    gone, keep = uniq[:half], uniq[half:]
    f = CuckooFilter(n_buckets=1 << 8)
    f.add_bulk(url_digests(uniq))
    if gone:
        assert f.delete_bulk(url_digests(gone)).all()
    if keep:
        assert f.contains_bulk(url_digests(keep)).all()


@given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=300))
@settings(max_examples=50, deadline=None)
def test_bloom_no_false_negatives(added):
    f = BloomFilter(bloom_bits=1 << 10)
    d = url_digests(sorted(set(added)))
    f.add_bulk(d)
    assert f.contains_bulk(d).all()


def test_cuckoo_overflow_rollback():
    """Past capacity, failed inserts land in the overflow set and the
    eviction rollback keeps every earlier item answering True."""
    f = CuckooFilter(n_buckets=4, slots=2, max_kicks=8)   # 8 slots total
    d = url_digests([f"http://x.test/{i}" for i in range(64)])
    f.add_bulk(d)
    assert f.contains_bulk(d).all()
    assert f.overflow, "expected overflow at 8x capacity"
    assert f.delete_bulk(d).all()
    assert f.n_items == 0 and not f.overflow


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=100, deadline=None)
def test_winnow_kernel_matches_horner(buf):
    """Vectorized winnowing == char-at-a-time Horner reference on
    arbitrary byte strings (hash formula, window minima, short-doc
    edges)."""
    from pomp_ray.functions.analysis import winnow_doc_fps

    k, w, m = 8, 4, (1 << 64) - 1
    hs = []
    for i in range(len(buf) - k + 1):
        h = 0
        for j in range(k):
            h = (h * 1099511628211 + buf[i + j]) & m
        hs.append(h)
    if not hs:
        want = set()
    elif len(hs) < w:
        want = {min(hs)}
    else:
        want = {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}
    assert set(int(x) for x in winnow_doc_fps(buf)) == want


@given(st.integers(min_value=4, max_value=10_000),
       st.integers(min_value=0, max_value=1 << 20))
@settings(max_examples=200, deadline=None)
def test_partsupp_formula_bounds(S, pk):
    """Synthesized partsupp invariants: 4 DISTINCT suppliers per part,
    all in [0, S); availqty/cost in their documented ranges."""
    import numpy as np
    import pyarrow as pa

    from pomp_ray.pipelines.relational import _partsupp_batch

    t = pa.table({"p_partkey": pa.array([pk], pa.int64())})
    e = _partsupp_batch(t, S)
    sk = e["ps_suppkey"].to_pylist()
    assert len(sk) == 4 and len(set(sk)) == 4
    assert all(0 <= s < S for s in sk)
    assert all(1 <= q <= 5000 for q in e["ps_availqty"].to_pylist())
    assert all(100 <= c <= 100000 for c in e["ps_cost_c"].to_pylist())


def test_ntile_rule_matches_duckdb():
    """The engine's NTILE position rule == DuckDB NTILE for ragged
    sizes (first n%t tiles get the extra row)."""
    import duckdb
    import numpy as np

    for n, t in [(10, 10), (13, 4), (7, 10), (100, 7), (1, 3)]:
        size, rem = divmod(n, t)
        cut = rem * (size + 1)
        p = np.arange(n)
        mine = np.where(p < cut, p // (size + 1) + 1,
                        rem + (p - cut) // max(size, 1) + 1)
        ref = duckdb.sql(
            f"SELECT NTILE({t}) OVER (ORDER BY i) AS x "
            f"FROM range({n}) r(i) ORDER BY i").df()["x"].to_numpy()
        assert (mine == ref).all(), (n, t)


def test_skyline_kernel_matches_brute_dominance():
    """_skyline == the O(n^2) dominance definition on random integer
    point sets (duplicates and ties included)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pomp_ray.pipelines.docs import _skyline

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                    min_size=1, max_size=40))
    def run(pts):
        x = np.array([p[0] for p in pts], np.int64)
        y = np.array([p[1] for p in pts], np.int64)
        doc = np.arange(len(pts), dtype=np.int64)
        keep = _skyline(doc, x, y)
        for i in range(len(pts)):
            dominated = any(
                x[j] >= x[i] and y[j] >= y[i]
                and (x[j] > x[i] or y[j] > y[i])
                for j in range(len(pts)))
            assert keep[i] == (not dominated), (pts, i)

    run()


def test_rolling_range_window_matches_brute():
    """The composite-axis searchsorted 1h-frame kernel == the O(n^2)
    RANGE-frame definition (tie timestamps share frames; users never
    bleed into each other)."""
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HOUR = 3_600_000_000

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 2),          # user
                              st.integers(0, 4 * 3600),   # ts seconds
                              st.integers(0, 500)),       # cents
                    min_size=1, max_size=30))
    def run(rows):
        df = pd.DataFrame(rows, columns=["user_id", "sec", "cents"])
        df["event_id"] = np.arange(len(df))
        df["ts_us"] = df["sec"].astype(np.int64) * 1_000_000
        g = df.sort_values(["user_id", "ts_us", "event_id"])
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        rel = ts - ts.min()
        stride = np.int64(int(rel.max()) + HOUR + 1)
        codes = np.unique(uid, return_inverse=True)[1].astype(np.int64)
        comb = codes * stride + rel
        pref = np.r_[0, np.cumsum(cents)]
        lo = np.searchsorted(comb, comb - HOUR, side="left")
        hi = np.searchsorted(comb, comb, side="right")
        got_sum = pref[hi] - pref[lo]
        got_n = hi - lo
        for i in range(len(g)):
            m = (uid == uid[i]) & (ts >= ts[i] - HOUR) & (ts <= ts[i])
            assert got_sum[i] == cents[m].sum(), rows
            assert got_n[i] == int(m.sum()), rows

    run()
