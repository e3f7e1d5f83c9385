"""Connected components: pointer-jumping (label doubling) must converge
in O(log n) rounds on a path graph where plain min-label propagation
needs O(diameter) rounds and fails the same budget loudly."""

import pyarrow as pa
import pytest

from pomp_ray.pipelines.graph import connected_components


def _chain(n: int) -> pa.Table:
    return pa.table({
        "doc_a": pa.array(list(range(n - 1)), pa.int64()),
        "doc_b": pa.array(list(range(1, n)), pa.int64())})


@pytest.mark.slow
def test_pointer_jump_converges_on_chain():
    n = 64
    out = connected_components(_chain(n), max_iters=12)
    assert out.num_rows == n
    assert set(out["component"].to_pylist()) == {0}


@pytest.mark.slow
def test_plain_propagation_exceeds_budget_loudly(monkeypatch):
    # force the DISTRIBUTED loop (the budget under test); the bounded
    # union-find fast path would just converge
    import pomp_ray.pipelines.graph as G
    monkeypatch.setattr(G, "_PR_DRIVER_MAX_EDGES", 0)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_chain(64), max_iters=12, pointer_jump=False)


def test_two_components_and_isolates_pairless():
    pairs = pa.table({
        "doc_a": pa.array([5, 6, 20, 30], pa.int64()),
        "doc_b": pa.array([6, 7, 21, 20], pa.int64())})
    out = connected_components(pairs, max_iters=10)
    comp = dict(zip(out["doc_id"].to_pylist(),
                    out["component"].to_pylist()))
    assert comp == {5: 5, 6: 5, 7: 5, 20: 20, 21: 20, 30: 20}


def test_scc_unit_digraph():
    """FW-BW coloring SCC on a hand-built digraph: 3-cycle, 2-cycle,
    one-way bridges, a feeder chain -- labels must equal each SCC's
    minimum member."""
    import pyarrow as pa
    import ray.data as rd

    from pomp_ray.pipelines.graph import strongly_connected_components

    edges = pa.table({
        "src": pa.array(["a", "b", "c", "d", "e", "f", "d", "g"],
                        pa.string()),
        "dst": pa.array(["b", "c", "a", "e", "d", "a", "c", "f"],
                        pa.string()),
    })
    out = strongly_connected_components(rd.from_arrow(edges))
    got = dict(zip(out["node"].to_pylist(), out["scc"].to_pylist()))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d",
                   "f": "f", "g": "g"}


@pytest.mark.slow
def test_scc_all_singletons_dag():
    """A pure DAG has only singleton SCCs (and exercises the
    empty-edge-table early-exit path on the later rounds)."""
    import pyarrow as pa
    import ray.data as rd

    from pomp_ray.pipelines.graph import strongly_connected_components

    edges = pa.table({
        "src": pa.array(["a", "a", "b"], pa.string()),
        "dst": pa.array(["b", "c", "c"], pa.string()),
    })
    out = strongly_connected_components(rd.from_arrow(edges))
    got = dict(zip(out["node"].to_pylist(), out["scc"].to_pylist()))
    assert got == {"a": "a", "b": "b", "c": "c"}


def test_scc_driver_twin_equals_distributed(monkeypatch):
    """The bounded Kosaraju fast path and the distributed FW-BW loop
    must emit identical (node, scc) tables (SCC membership + min-member
    label is a set property)."""
    import ray.data as rd

    import pomp_ray.pipelines.graph as G

    edges = pa.table({
        "src": pa.array(list("aabbccdexy"), pa.string()),
        "dst": pa.array(list("bccaadeexz"), pa.string())})
    fast = G.strongly_connected_components(rd.from_arrow(edges))
    monkeypatch.setattr(G, "_PR_DRIVER_MAX_EDGES", 0)
    slow = G.strongly_connected_components(rd.from_arrow(edges))
    assert sorted(zip(fast["node"].to_pylist(),
                      fast["scc"].to_pylist())) == \
        sorted(zip(slow["node"].to_pylist(), slow["scc"].to_pylist()))
