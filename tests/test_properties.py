"""Property-based tests (hypothesis) for pure kernels whose correctness
the pipelines lean on: SWAR popcount vs Python bit_count, and
label-propagation components vs a brute-force union-find."""

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
