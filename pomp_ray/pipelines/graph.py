"""Graph operations over near-dup pair tables: connected components via
distributed min-label propagation.

A dedup pipeline's final act is turning verified near-dup PAIRS into dup
GROUPS (keep one representative per group).  At 100 TB the pair table is
itself large, so components are computed as an ITERATIVE Dataset
pipeline: each round every node adopts the minimum label among itself
and its neighbours (one join + one groupby per round, both
hash-partitioned on node id), converging in O(graph diameter) rounds --
the standard label-propagation formulation (no driver-side union-find,
nothing O(nodes) ever collected until the caller asks for the result).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Min


def connected_components(pairs: pa.Table, max_iters: int = 50) -> pa.Table:
    """(doc_id, component) for every node appearing in ``pairs``
    (columns doc_a, doc_b); component = the minimum doc_id reachable
    from the node (the group representative a dedup pass keeps).

    Shape: labels start as (node, label=node); each iteration sends
    every node's label across every edge (join on src), then each node
    takes the min of incoming + own labels (groupby(node) min).  The
    convergence check is a tiny count of changed labels -- Datasets all
    the way down."""
    a = pairs["doc_a"].combine_chunks()
    b = pairs["doc_b"].combine_chunks()
    if len(a) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})
    # undirected: both directions
    src = pa.concat_arrays([a, b])
    dst = pa.concat_arrays([b, a])
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    nodes = pc.unique(src)
    labels = rd.from_arrow(pa.table({"node": nodes, "label": nodes}))

    prev_sum = int(pc.sum(nodes).as_py())
    converged = False
    for _ in range(max_iters):
        # messages: each edge ships its src's current label to dst
        msgs = edges.join(
            labels.map_batches(
                lambda t: t.rename_columns(["src", "label"]),
                batch_format="pyarrow"),
            join_type="inner", on=("src",), num_partitions=8)
        msgs = msgs.map_batches(
            lambda t: pa.table({"node": t["dst"], "cand": t["label"]}),
            batch_format="pyarrow")
        own = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "cand": t["label"]}),
            batch_format="pyarrow")
        # repartition: the hash aggregate can emit a zero-row block with
        # an EMPTY schema (ray 2.49 quirk) which the next iteration's
        # Acero join cannot resolve key fields against; repartition
        # merges/drops such blocks (map_batches won't -- empty blocks
        # bypass the UDF)
        new_labels = (
            msgs.union(own).groupby("node")
            .aggregate(Min("cand", alias_name="label"))
            .repartition(8).materialize())
        # convergence without a join: labels only ever DECREASE, so the
        # label sum is strictly monotone until fixpoint -- one tiny
        # aggregate per round instead of a compare join
        s = int(new_labels.sum("label") or 0)
        labels = new_labels
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # a silent partial result would merge only nodes within
        # max_iters hops of their component minimum -- wrong groups, no
        # signal.  Long-diameter graphs (chains) need a bigger budget or
        # a pointer-doubling variant; fail loudly instead of guessing.
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations (graph diameter exceeds the budget); raise "
            f"max_iters")

    out = sorted((r["node"], r["label"]) for r in labels.take_all())
    return pa.table({
        "doc_id": pa.array([o[0] for o in out], pa.int64()),
        "component": pa.array([o[1] for o in out], pa.int64())})


def dup_components(sf_dir: str) -> pa.Table:
    """Near-dup GROUPS over the documents table: simhash blocking finds
    verified pairs (pipelines.docs.simhash_dup_groups, exact by
    pigeonhole at hamming<=3), label propagation contracts them into
    components.  Oracle: recursive-CTE reachability over the committed
    simhash golden pairs."""
    from pomp_ray.pipelines.docs import simhash_dup_groups

    return connected_components(simhash_dup_groups(sf_dir))
