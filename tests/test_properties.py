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
