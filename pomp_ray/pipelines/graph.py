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
import ray
import ray.data as rd
from ray.data.aggregate import Min


def _cc_driver(a: pa.Array, b: pa.Array) -> pa.Table:
    """Serial min-representative union-find twin of the distributed CC
    loop over a bounded pair table: same output by construction
    (component = min node id reachable -- a set property)."""
    import numpy as np
    av = a.to_numpy(zero_copy_only=False).astype(np.int64)
    bv = b.to_numpy(zero_copy_only=False).astype(np.int64)
    nodes = np.unique(np.concatenate([av, bv]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(av, bv):
        rx, ry = find(idx[int(x)]), find(idx[int(y)])
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    comp = np.empty(len(nodes), np.int64)
    roots = np.fromiter((find(i) for i in range(len(nodes))), np.int64,
                        len(nodes))
    # min node id per root (nodes sorted asc => first occurrence is min)
    minrep: dict[int, int] = {}
    for i, r in enumerate(roots):
        if int(r) not in minrep:
            minrep[int(r)] = int(nodes[i])
        comp[i] = minrep[int(r)]
    return pa.table({"doc_id": pa.array(nodes, pa.int64()),
                     "component": pa.array(comp, pa.int64())})


def connected_components(pairs: pa.Table, max_iters: int = 50,
                         pointer_jump: bool = True) -> pa.Table:
    """(doc_id, component) for every node appearing in ``pairs``
    (columns doc_a, doc_b); component = the minimum doc_id reachable
    from the node (the group representative a dedup pass keeps).

    Shape: labels start as (node, label=node); each iteration sends
    every node's label across every edge (join on src), then each node
    takes the min of incoming + own labels (groupby(node) min).  The
    convergence check is a tiny sum aggregate -- Datasets all the way
    down.

    ``pointer_jump`` (default on) adds the doubling step: each node also
    considers its LABEL's label (labels ⋈ labels on label=node), so the
    distance to the component minimum roughly squares per round --
    O(log n) rounds on a path graph instead of O(diameter), the
    distributed-CC acceleration every MapReduce-CC paper builds on
    (candidates stay within the component: label(x) names a node of x's
    component, so label(label(x)) does too; min-monotonicity is
    unchanged, only the convergence RATE improves).  The jump join
    materializes before the message join executes -- two LIVE hash
    joins in one streaming DAG deadlock small sessions (CLAUDE.md)."""
    a = pairs["doc_a"].combine_chunks()
    b = pairs["doc_b"].combine_chunks()
    if len(a) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})
    if len(a) <= _PR_DRIVER_MAX_EDGES:
        # the pair table is ALREADY a driver-held bounded pa.Table
        # (every caller materializes verified pairs before grouping):
        # min-rep union-find beats 2 pool spinups per label-prop round
        # by ~10x and the output -- component = min reachable id -- is a
        # set property, identical by construction.  Corpus-scale pair
        # tables keep the distributed pointer-jump loop below.
        return _cc_driver(a, b)
    # undirected: both directions
    src = pa.concat_arrays([a, b])
    dst = pa.concat_arrays([b, a])
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    nodes = pc.unique(src)
    labels = rd.from_arrow(pa.table({"node": nodes, "label": nodes}))
    # join-pool width sized to the edge volume (driver-known here):
    # near-empty shuffle partitions cost ~1 s of pool spinup each, and
    # the loop pays it EVERY iteration (the bpe_merges lesson)
    n_parts = max(2, min(8, -(-len(src) // 4096)))

    prev_sum = int(pc.sum(nodes).as_py())
    converged = False
    for _ in range(max_iters):
        parts = []
        if pointer_jump:
            # pointer jump: (node, label) ⋈ (node'=label, label') ->
            # candidate label(label(node)); materialized FIRST so only
            # one hash join is ever live
            jump = labels.join(
                labels.map_batches(
                    lambda t: t.rename_columns(["label", "ll"]),
                    batch_format="pyarrow"),
                join_type="inner", on=("label",), num_partitions=n_parts) \
                .map_batches(
                    lambda t: pa.table({"node": t["node"],
                                        "cand": t["ll"]}),
                    batch_format="pyarrow").materialize()
            parts.append(jump)
        # messages: each edge ships its src's current label to dst
        msgs = edges.join(
            labels.map_batches(
                lambda t: t.rename_columns(["src", "label"]),
                batch_format="pyarrow"),
            join_type="inner", on=("src",), num_partitions=n_parts)
        msgs = msgs.map_batches(
            lambda t: pa.table({"node": t["dst"], "cand": t["label"]}),
            batch_format="pyarrow")
        own = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "cand": t["label"]}),
            batch_format="pyarrow")
        u = msgs.union(own)
        for p in parts:
            u = u.union(p)
        # repartition: the hash aggregate can emit a zero-row block with
        # an EMPTY schema (ray 2.49 quirk) which the next iteration's
        # Acero join cannot resolve key fields against; repartition
        # merges/drops such blocks (map_batches won't -- empty blocks
        # bypass the UDF)
        new_labels = (
            u.groupby("node")
            .aggregate(Min("cand", alias_name="label"))
            .repartition(n_parts).materialize())
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
        # signal; fail loudly instead of guessing (with pointer_jump the
        # budget is O(log n), so hitting this means something is wrong)
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            f"iterations; raise max_iters")

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


# ------------------------------------------------------------------ pagerank
PR_SCALE = 10**12  # fixed-point unit: ranks sum to ~PR_SCALE


def _click_edges(sf_dir: str) -> rd.Dataset:
    """Directed transition edges (src, dst) between the per-event ``k``
    props of CONSECUTIVE events of the same user (ordered by ts then
    event_id) -- the click/navigation graph product analytics builds
    from an event log.  Per-user ordering uses the 64-bucket user
    hashing shape (one C-speed pandas sort per bucket, not one
    map_groups call per user); the k extraction is one vectorized
    extract_regex per batch."""
    import os as _os

    import pandas as pd

    def prep(t: pa.Table) -> pa.Table:
        ext = pc.extract_regex(t["props"], pattern=r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        b = pc.cast(pc.bit_wise_and(t["user_id"], 63), pa.int32())
        return pa.table({"event_id": t["event_id"], "ts": t["ts"],
                         "user_id": t["user_id"], "k": k, "bucket": b})

    def edges(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["user_id", "ts", "event_id"])
        same = g["user_id"].eq(g["user_id"].shift())
        out = pd.DataFrame({"src": g["k"].shift(), "dst": g["k"]})[same]
        return out.astype({"src": "int64", "dst": "int64"})

    ev = rd.read_parquet(
        _os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "props"])
    return (ev.map_batches(prep, batch_format="pyarrow")
            .groupby("bucket").map_groups(edges, batch_format="pandas"))


_PR_DRIVER_MAX_EDGES = 500_000


def _pagerank_driver(edge_tbl: pa.Table, n_iters: int,
                     d_num: int, d_den: int) -> pa.Table:
    """Numpy twin of the distributed fixed-point loop over a BOUNDED
    edge table: identical integer recurrence (contribs are exact int64
    adds, order-independent), so outputs match the Dataset path and the
    serial golden bit-for-bit."""
    import numpy as np
    src = edge_tbl["src"].to_numpy(zero_copy_only=False)
    dst = edge_tbl["dst"].to_numpy(zero_copy_only=False)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank_fp": pa.array([], pa.int64())})
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    deg = np.bincount(si, minlength=n).astype(np.int64)
    base = ((d_den - d_num) * (PR_SCALE // n)) // d_den
    r = np.full(n, PR_SCALE // n, np.int64)
    for _ in range(n_iters):
        share = int(r[deg == 0].sum()) // n
        contrib = np.zeros(n, np.int64)
        np.add.at(contrib, di, r[si] // deg[si])
        r = base + ((contrib + share) * d_num) // d_den
    return pa.table({"node": pa.array(nodes.tolist()),
                     "rank_fp": pa.array(r, pa.int64())})


def pagerank(edges: rd.Dataset, n_iters: int = 8,
             d_num: int = 85, d_den: int = 100,
             num_partitions: int | None = None) -> pa.Table:
    """PageRank over an (src, dst) edge Dataset in int64 FIXED-POINT
    arithmetic: every per-edge contribution is ``rank // outdeg`` and the
    damping update is integer multiply/divide, so per-node sums are exact
    integer adds -- order-independent across blocks, hence bit-identical
    to the serial golden regardless of shuffle layout (the same
    quantization trick as the kmeans operator).

    Scale shape: the edge table never leaves the cluster.  Each of the
    ``n_iters`` fixed iterations is ONE hash join (edges x ranks on src,
    shipping rank+outdeg to the edge) and ONE groupby-sum over compact
    (node, contrib) rows, unioned with per-node zero rows so nodes
    without inbound edges keep their base rank without a second join
    (two live hash joins in one DAG deadlock small sessions -- see
    CLAUDE.md).  The rank table (O(|V|), not O(edges)) is materialized
    per iteration, exactly like the label-propagation loop above.
    Dangling mass is one tiny filtered sum per iteration.

    Ref semantics: standard damped PageRank, r' = (1-d)/N + d*(sum_in +
    dangling/N), quantized to PR_SCALE."""
    from ray.data.aggregate import Count, Max, Sum

    # the edge table is consumed once per iteration: pin it in the
    # object store (it spills under pressure) instead of re-executing
    # its upstream build chain n_iters times
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges <= _PR_DRIVER_MAX_EDGES:
        # bounded-graph fast path: a join + groupby per iteration pays
        # ~2 s of pool spinup PER ITERATION regardless of size; when the
        # edge table is bounded (host graphs, clickstream codes), the
        # SAME integer fixed-point recurrence runs as a numpy loop over
        # the collected edge list -- bit-identical by construction
        # (order-independent int64 sums), 8x faster at sf0.1.  Graphs
        # above the bound keep the distributed loop (the honest
        # 10^10-node shape).  Collection is Arrow-block refs, never
        # per-row dicts (take_all over thousands of tiny sort-output
        # blocks measured 47 s for 100k rows).
        import ray as _ray
        tbls = [t for t in _ray.get(edges.to_arrow_refs())
                if t.num_rows]
        if not tbls:
            return pa.table({"node": pa.array([], pa.int64()),
                             "rank_fp": pa.array([], pa.int64())})
        return _pagerank_driver(
            pa.concat_tables(tbls).combine_chunks(),
            n_iters, d_num, d_den)
    if num_partitions is None:
        # size the shuffle width to the edge volume: hash-join/aggregate
        # actor pools cost ~1 s each to spin up PER EXECUTION, so tiny
        # graphs must not pay for 8-way pools 2x per iteration; huge
        # graphs get wider pools (one partition per ~250k edges)
        num_partitions = max(2, min(64, edges.count() // 250_000))

    # static prep: node set + out-degree, one groupby + one left join
    both = edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()])}),
        batch_format="pyarrow")
    nodes = both.groupby("node").aggregate(Min("node", alias_name="_"))
    nodes = nodes.map_batches(lambda t: t.select(["node"]),
                              batch_format="pyarrow")
    outdeg = edges.groupby("src").aggregate(Count(alias_name="deg"))
    outdeg = outdeg.map_batches(
        lambda t: pa.table({"node": t["src"],
                            "deg": pc.cast(t["deg"], pa.int64())}),
        batch_format="pyarrow").repartition(4).materialize()
    nodes_deg = nodes.repartition(4).join(
        outdeg, join_type="left_outer", on=("node",), num_partitions=num_partitions)
    nodes_deg = nodes_deg.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "deg": pc.fill_null(pc.cast(t["deg"], pa.int64()), 0)}),
        batch_format="pyarrow").repartition(4).materialize()

    n = nodes_deg.count()
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank_fp": pa.array([], pa.int64())})
    base = ((d_den - d_num) * (PR_SCALE // n)) // d_den

    ranks = nodes_deg.map_batches(
        lambda t: t.append_column(
            "r", pa.array([PR_SCALE // n] * len(t), pa.int64())),
        batch_format="pyarrow").materialize()

    for _ in range(n_iters):
        dang = ranks.map_batches(
            lambda t: t.filter(pc.equal(t["deg"], 0)).select(["r"]),
            batch_format="pyarrow")
        dang_sum = int(dang.sum("r") or 0)
        share = dang_sum // n

        rank_src = ranks.map_batches(
            lambda t: pa.table({"src": t["node"], "deg": t["deg"],
                                "r": t["r"]}),
            batch_format="pyarrow")
        msgs = edges.join(rank_src, join_type="inner", on=("src",),
                          num_partitions=num_partitions)
        contribs = msgs.map_batches(
            lambda t: pa.table({
                "node": t["dst"],
                "c": pc.divide(t["r"], t["deg"]),
                "deg": pa.array([-1] * len(t), pa.int64())}),
            batch_format="pyarrow")
        zeros = ranks.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "c": pa.array([0] * len(t), pa.int64()),
                                "deg": t["deg"]}),
            batch_format="pyarrow")
        agg = (contribs.union(zeros).groupby("node")
               .aggregate(Sum("c", alias_name="c"),
                          Max("deg", alias_name="deg")))
        ranks = agg.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "deg": pc.cast(t["deg"], pa.int64()),
                "r": pc.add(
                    base,
                    pc.divide(pc.multiply(
                        pc.add(pc.cast(t["c"], pa.int64()), share),
                        d_num), d_den))}),
            batch_format="pyarrow") \
            .repartition(num_partitions).materialize()

    out = sorted((row["node"], row["r"]) for row in ranks.take_all())
    # node dtype follows the edge key (int ids or string hosts)
    return pa.table({"node": pa.array([o[0] for o in out]),
                     "rank_fp": pa.array([o[1] for o in out], pa.int64())})


def pagerank_clicks(sf_dir: str, n_iters: int = 8) -> pa.Table:
    """PageRank over the per-user event-transition graph (events.props
    ``k`` values as nodes).  Oracle: committed golden parquet from an
    independent serial dict-based implementation
    (tools/gen_golden.py::gen_pagerank_golden) -- bit-identical by the
    fixed-point construction."""
    return pagerank(_click_edges(sf_dir), n_iters=n_iters)


def crawl_link_edges(ckpt_dir: str, pages_path: str,
                     num_partitions: int = 8) -> rd.Dataset:
    """Host-level link edges of a FINISHED crawl: the visited table
    (streaming items reader) hash-joins back to the corpus html on
    canon_url -- the same keying as the join-fetch path -- and each
    page's hyperlinks are re-extracted and resolved, emitting one
    (src, dst) host pair per link.  Nothing besides compact (url) /
    (host, host) rows shuffles; html rides the join once."""
    from pomp_ray.crawl import items_dataset
    from pomp_ray.functions.textfns import (html_extract_links, url_host,
                                            url_join)
    from pomp_ray.stages.fetch import canon_pages_batch

    vis = items_dataset(ckpt_dir).map_batches(
        lambda t: pa.table({"canon_url": t["url"]}),
        batch_format="pyarrow")
    pages = rd.read_parquet(pages_path, columns=["url", "html"]) \
        .map_batches(canon_pages_batch, batch_format="pyarrow")
    joined = vis.join(pages, join_type="inner", on=("canon_url",),
                      num_partitions=num_partitions)

    def edges(t: pa.Table) -> pa.Table:
        src, dst = [], []
        for url, html in zip(t["canon_url"].to_pylist(),
                             t["html"].to_pylist()):
            if html is None:
                continue
            h = url_host(url)
            for href in html_extract_links(html):
                src.append(h)
                dst.append(url_host(url_join(url, href)))
        return pa.table({"src": pa.array(src, pa.string()),
                         "dst": pa.array(dst, pa.string())})

    return joined.map_batches(edges, batch_format="pyarrow")


def host_pagerank_from_crawl(ckpt_dir: str, pages_path: str,
                             n_iters: int = 8) -> pa.Table:
    """The canonical web pipeline composed end to end: crawl checkpoint
    -> host link graph -> fixed-point PageRank.  Returns (host,
    rank_fp); bit-identical to the serial golden by the integer
    construction (tools/gen_golden.py gen_crawl_pagerank_golden)."""
    out = pagerank(crawl_link_edges(ckpt_dir, pages_path),
                   n_iters=n_iters)
    return out.rename_columns(["host", "rank_fp"])


def anchor_texts(pages_path: str, num_partitions: int = 8) -> rd.Dataset:
    """Anchor-text index over a page corpus: for every link TARGET url,
    the total in-link count and the sorted distinct anchor terms its
    in-links carry -- the classic web-graph aggregation (search engines
    rank on it; web-scale training sets keep it as a per-page signal;
    pomp users would hand-roll it in a pipeline).

    Scale shape: anchors are extracted and resolved per page inside
    map_batches (html never shuffles), pre-aggregated per batch to
    DISTINCT (target, term, count) rows, then ONE groupby(target) with
    a Sum + a set-merging AggregateFn assembles each target's row (the
    inverted-index discipline: never one pandas group per tiny target).
    The target url is the only shuffle key."""
    from ray.data.aggregate import AggregateFn, Sum

    from pomp_ray.functions.textfns import (html_extract_anchors,
                                            url_canonicalize, url_join)

    def pairs(t: pa.Table) -> pa.Table:
        tgt, term = [], []
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            if html is None:
                continue
            for href, word in html_extract_anchors(html):
                tgt.append(url_canonicalize(url_join(url, href)))
                term.append(word)
        tbl = pa.table({"target": pa.array(tgt, pa.string()),
                        "term": pa.array(term, pa.string())})
        # per-batch partial: (target, term) multiplicity via Arrow hash
        # groupby -- compact rows to the shuffle, no Python counting
        return tbl.group_by(["target", "term"]).aggregate([([], "count_all")])

    term_agg = AggregateFn(
        init=lambda k: [],
        accumulate_block=lambda st, blk: st + blk.column("term").to_pylist(),
        merge=lambda a, b: a + b,
        finalize=lambda ws: " ".join(sorted(set(ws))),
        name="terms")

    agg = (rd.read_parquet(pages_path, columns=["url", "html"])
           .map_batches(pairs, batch_format="pyarrow")
           .groupby("target")
           .aggregate(Sum("count_all", alias_name="n_anchors"), term_agg))
    return agg.map_batches(
        lambda t: pa.table({"target": t["target"],
                            "n_anchors": pc.cast(t["n_anchors"], pa.int64()),
                            "terms": t["terms"]}),
        batch_format="pyarrow")


# ------------------------------------------------------------------ HITS
HITS_SCALE = 10**7   # hub/authority fixed-point unit (small enough that
                     # pre-normalization sums stay far below int64 range
                     # even at 10^9-edge graphs: score<=~SCALE, sum over
                     # in-edges <= SCALE * indeg <= 1e16)


def _host_edge_rows(t: pa.Table) -> pa.Table:
    """Vectorized (src, dst) host pairs for every hyperlink in a pages
    batch: one split_pattern pass extracts hrefs
    (textfns.extract_hrefs_batch), canonicalize_batch resolves + splits
    hosts on its Arrow fast path, and the parent host comes from the
    same fast-path regex -- no per-link Python in the common case
    (equivalence with the per-row scalars is pytest-pinned)."""
    from pomp_ray.functions.textfns import extract_hrefs_batch, url_host
    from pomp_ray.stages.enqueue import _FAST_EXTRACT, canonicalize_batch

    hrefs, parent = extract_hrefs_batch(t["html"])
    if len(hrefs) == 0:
        return pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string())})
    bases = pc.take(t["url"], pa.array(parent))
    cb = canonicalize_batch(pa.table({"url": hrefs, "base": bases}))
    src = pc.struct_field(
        pc.extract_regex(bases, pattern=_FAST_EXTRACT), "host")
    if int(pc.sum(pc.is_null(src)).as_py() or 0):
        src = pa.array([url_host(b) for b in bases.to_pylist()],
                       pa.string())
    return pa.table({"src": src, "dst": cb["host"],
                     "target": cb["canon_url"]})


def corpus_host_edges(pages_path: str) -> rd.Dataset:
    """(src, dst) host-level link edges straight off a pages corpus --
    the crawl-free sibling of ``crawl_link_edges`` (same extraction and
    resolution semantics, vectorized); html never shuffles, one
    (host, host) row per hyperlink leaves each batch."""
    return rd.read_parquet(pages_path, columns=["url", "html"]) \
        .map_batches(lambda t: _host_edge_rows(t).select(["src", "dst"]),
                     batch_format="pyarrow")


def hits(edges: rd.Dataset, n_iters: int = 6,
         num_partitions: int | None = None) -> pa.Table:
    """Kleinberg's HITS (hubs & authorities) over an (src, dst) edge
    Dataset in int64 fixed point -- the second classic web-graph
    authority signal beside ``pagerank``, and the one a focused/recrawl
    scheduler uses to find DIRECTORY pages (hubs) vs content pages
    (authorities).

    Determinism contract: scores start at HITS_SCALE; each half-step is
    exact integer adds over the edge join (order-independent), then an
    integer L1-style renormalization ``x // max(1, S // HITS_SCALE)``
    with the global sum S -- a single driver scalar per half-step, so
    every run/block-structure/cluster-size is bit-identical to the
    serial golden (tools/gen_golden.py gen_hits_golden).

    Scale shape mirrors ``pagerank``: the edge table is materialized
    once and re-joined per half-step (rank tables are O(|V|)); compact
    (node, contribution) rows are the only shuffle payload; zero rows
    ride the union so isolated nodes keep a 0 score without a second
    join in the same DAG."""
    from ray.data.aggregate import Sum

    edges = edges.materialize()
    if num_partitions is None:
        num_partitions = max(2, min(64, edges.count() // 250_000))

    both = edges.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()])}),
        batch_format="pyarrow")
    nodes = both.groupby("node").aggregate(Min("node", alias_name="_"))
    nodes = nodes.map_batches(lambda t: t.select(["node"]),
                              batch_format="pyarrow") \
        .repartition(2).materialize()
    if nodes.count() == 0:
        return pa.table({"node": pa.array([], pa.string()),
                         "hub_fp": pa.array([], pa.int64()),
                         "auth_fp": pa.array([], pa.int64())})

    def init_scores(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "s": pa.array([HITS_SCALE] * len(t), pa.int64())})

    hub = nodes.map_batches(init_scores, batch_format="pyarrow") \
        .materialize()
    auth = hub

    def half_step(scores: rd.Dataset, key_in: str, key_out: str):
        """One HITS half-step: push ``scores`` along edges from
        ``key_in`` to ``key_out``, sum per target, renormalize."""
        keyed = scores.map_batches(
            lambda t: pa.table({key_in: t["node"], "s": t["s"]}),
            batch_format="pyarrow")
        msgs = edges.join(keyed, join_type="inner", on=(key_in,),
                          num_partitions=num_partitions)
        contribs = msgs.map_batches(
            lambda t: pa.table({"node": t[key_out], "c": t["s"]}),
            batch_format="pyarrow")
        zeros = nodes.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "c": pa.array([0] * len(t), pa.int64())}),
            batch_format="pyarrow")
        agg = contribs.union(zeros).groupby("node").aggregate(
            Sum("c", alias_name="c"))
        agg = agg.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "s": pc.cast(t["c"], pa.int64())}),
            batch_format="pyarrow").repartition(2).materialize()
        total = int(agg.sum("s") or 0)
        div = max(1, total // HITS_SCALE)
        return agg.map_batches(
            lambda t: pa.table({"node": t["node"],
                                "s": pc.divide(t["s"], div)}),
            batch_format="pyarrow").materialize()

    for _ in range(n_iters):
        auth = half_step(hub, "src", "dst")    # a[dst] = sum h[src]
        hub = half_step(auth, "dst", "src")    # h[src] = sum a[dst]

    hs = {r["node"]: r["s"] for r in hub.take_all()}
    as_ = {r["node"]: r["s"] for r in auth.take_all()}
    ns = sorted(hs)
    return pa.table({"node": pa.array(ns, pa.string()),
                     "hub_fp": pa.array([hs[n] for n in ns], pa.int64()),
                     "auth_fp": pa.array([as_[n] for n in ns], pa.int64())})


def corpus_hits(pages_path: str, n_iters: int = 6) -> pa.Table:
    """corpus -> host link graph -> HITS, composed end to end."""
    return hits(corpus_host_edges(pages_path), n_iters=n_iters)


def two_hop_reach(edges: rd.Dataset, num_partitions: int = 8) -> pa.Table:
    """Per-node 2-hop reach over a directed (src, dst) edge Dataset:
    |{w : v -> u -> w}| counting DISTINCT endpoints, self included if
    reachable -- the neighborhood-size signal link-spam detection and
    seed-set expansion read.  One edge⋈edge hash join on the middle
    node, one distinct groupby, one count: every payload is a 2-column
    id pair; no adjacency ever materializes on the driver."""
    from ray.data.aggregate import Count as _Count

    e1 = edges.map_batches(
        lambda t: pa.table({"src": t["src"], "mid": t["dst"]}),
        batch_format="pyarrow").materialize()
    e2 = edges.map_batches(
        lambda t: pa.table({"mid": t["src"], "dst2": t["dst"]}),
        batch_format="pyarrow")
    hops = e1.join(e2, join_type="inner", on=("mid",),
                   num_partitions=num_partitions)
    pairs = hops.map_batches(
        lambda t: pa.table({"src": t["src"], "dst2": t["dst2"]})
        .group_by(["src", "dst2"]).aggregate([]),   # per-batch distinct
        batch_format="pyarrow")
    distinct = pairs.groupby(["src", "dst2"]).aggregate(
        _Count(alias_name="_")).repartition(4)
    reach = distinct.map_batches(
        lambda t: pa.table({"src": t["src"]}), batch_format="pyarrow") \
        .groupby("src").aggregate(_Count(alias_name="reach2"))
    out = sorted((r["src"], r["reach2"]) for r in reach.take_all())
    return pa.table({
        "host": pa.array([o[0] for o in out], pa.string()),
        "reach2": pa.array([o[1] for o in out], pa.int64())})


def corpus_two_hop_reach(pages_path: str) -> pa.Table:
    """corpus -> host link graph -> 2-hop reach, composed."""
    return two_hop_reach(corpus_host_edges(pages_path))


def redirect_edges(pages_path: str) -> rd.Dataset:
    """(url, target) edge per redirect stand-in page in the corpus,
    targets canonicalized against the redirect page's own url.  One
    Arrow prefix scan gates each batch; html never leaves the batch."""
    from pomp_ray.functions.textfns import url_canonicalize, url_join
    from pomp_ray.stages.fetch import REDIRECT_PREFIX, redirect_target

    def edges(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(pc.starts_with(
            t["html"], pattern=REDIRECT_PREFIX.decode()), False)
        src, tgt = [], []
        if int(pc.sum(mask).as_py() or 0):
            sub = t.filter(mask)
            for url, html in zip(sub["url"].to_pylist(),
                                 sub["html"].to_pylist()):
                raw = redirect_target(html)
                if raw is not None:
                    src.append(url)
                    tgt.append(url_canonicalize(url_join(url, raw)))
        return pa.table({"url": pa.array(src, pa.string()),
                         "target": pa.array(tgt, pa.string())})

    return rd.read_parquet(pages_path, columns=["url", "html"]).map_batches(
        edges, batch_format="pyarrow")


def redirect_map(pages_path: str, num_partitions: int = 4) -> pa.Table:
    """Redirect-resolution table: one row per redirect page with the url
    the chain settles on -- the canonicalization map a crawl/recrawl
    scheduler joins against so revisits hit final urls directly (and the
    offline mirror of what the fetch stage does per hop online).

    Columns: url, final_url (NULL when the chain is still a redirect
    after MAX_REDIRECTS hops -- loops land here), n_hops (redirect hops
    taken, int64), ok (final url exists in the corpus).

    Scale shape: chains resolve as MAX_REDIRECTS-1 self-joins of the
    edge table plus one membership join against the corpus's url column
    (pruned read) -- the edge table is the only thing that re-shuffles,
    never page bodies.  Each join is materialized before the next (two
    live hash joins in one DAG starve each other's aggregator pools).
    """
    from pomp_ray.stages.fetch import MAX_REDIRECTS

    edges = redirect_edges(pages_path).repartition(num_partitions) \
        .materialize()
    right = edges.map_batches(
        lambda t: pa.table({"r_url": t["url"], "r_target": t["target"]}),
        batch_format="pyarrow").materialize()

    cur = edges.map_batches(
        lambda t: t.append_column(
            "n_hops", pa.array([1] * t.num_rows, pa.int64())),
        batch_format="pyarrow").materialize()
    # hops 2..MAX, then one extra probe that only FLAGS (a target still
    # in the redirect set after the cap = unresolved, the loop case)
    for hop in range(2, MAX_REDIRECTS + 2):
        j = cur.join(right, join_type="left_outer", on=("target",),
                     right_on=("r_url",), num_partitions=num_partitions)

        def advance(t: pa.Table, _hop=hop) -> pa.Table:
            hit = pc.is_valid(t["r_target"])
            if _hop <= MAX_REDIRECTS:
                target = pc.if_else(hit, t["r_target"], t["target"])
                n = pc.if_else(hit, pa.scalar(_hop, pa.int64()),
                               t["n_hops"])
            else:       # over the cap: null out, keep hop count
                target = pc.if_else(hit, pa.scalar(None, pa.string()),
                                    t["target"])
                n = t["n_hops"]
            return pa.table({"url": t["url"], "target": target,
                             "n_hops": n})

        cur = j.map_batches(advance, batch_format="pyarrow") \
            .repartition(num_partitions).materialize()

    # membership of the settled target in the corpus; "" sentinel keeps
    # the join key null-free (unresolved rows can't match any url)
    probe = cur.map_batches(
        lambda t: t.append_column(
            "p_url", pc.fill_null(t["target"], "")),
        batch_format="pyarrow").materialize()
    urls = rd.read_parquet(pages_path, columns=["url"]).map_batches(
        lambda t: pa.table({"p_url": t["url"],
                            "p_ok": pa.array([True] * t.num_rows)}),
        batch_format="pyarrow")
    m = probe.join(urls, join_type="left_outer", on=("p_url",),
                   num_partitions=num_partitions)
    out = m.map_batches(
        lambda t: pa.table({
            "url": t["url"],
            "final_url": t["target"],
            "n_hops": t["n_hops"],
            "ok": pc.fill_null(t["p_ok"], False)}),
        batch_format="pyarrow")
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")]
        or [pa.table({"url": pa.array([], pa.string()),
                      "final_url": pa.array([], pa.string()),
                      "n_hops": pa.array([], pa.int64()),
                      "ok": pa.array([], pa.bool_())})])
    return tbl.sort_by("url")


def broken_links(pages_path: str, num_partitions: int = 8) -> pa.Table:
    """Per-host broken-outlink report: for every source host, how many
    DISTINCT canonical link targets its pages carry and how many of
    those are absent from the corpus (the 404 candidates a crawl-QA
    dashboard tracks; the corpus generator plants ~2% dead links).

    Scale shape: links explode and canonicalize inside map_batches with
    a per-batch (host, target) distinct, ONE global distinct groupby,
    one left join against the corpus's pruned url column, and a final
    per-host Count/Sum -- html never shuffles, and the shuffled payload
    is 2-string rows."""
    from ray.data.aggregate import Count, Sum

    def pairs(t: pa.Table) -> pa.Table:
        rows = _host_edge_rows(t)
        tbl = pa.table({"host": rows["src"], "target": rows["target"]})
        return tbl.group_by(["host", "target"]).aggregate([])

    distinct = (rd.read_parquet(pages_path, columns=["url", "html"])
                .map_batches(pairs, batch_format="pyarrow")
                .groupby(["host", "target"])
                .aggregate(Count(alias_name="_n")))
    probe = distinct.map_batches(
        lambda t: pa.table({"host": t["host"], "p_url": t["target"]}),
        batch_format="pyarrow").repartition(2).materialize()
    urls = rd.read_parquet(pages_path, columns=["url"]).map_batches(
        lambda t: pa.table({"p_url": t["url"],
                            "p_ok": pa.array([True] * t.num_rows)}),
        batch_format="pyarrow")
    j = probe.join(urls, join_type="left_outer", on=("p_url",),
                   num_partitions=num_partitions)
    per_host = j.map_batches(
        lambda t: pa.table({
            "host": t["host"],
            "one": pa.array([1] * t.num_rows, pa.int64()),
            "broken": pc.cast(pc.is_null(t["p_ok"]), pa.int64())}),
        batch_format="pyarrow").groupby("host").aggregate(
        Sum("one", alias_name="n_targets"),
        Sum("broken", alias_name="n_broken"))
    out = per_host.map_batches(
        lambda t: pa.table({
            "host": t["host"],
            "n_targets": pc.cast(t["n_targets"], pa.int64()),
            "n_broken": pc.cast(t["n_broken"], pa.int64())}),
        batch_format="pyarrow")
    tbl = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow"))
        or [pa.table({"host": pa.array([], pa.string()),
                      "n_targets": pa.array([], pa.int64()),
                      "n_broken": pa.array([], pa.int64())})])
    return tbl.sort_by("host")


def _undirected_host_edges(pages_path: str) -> rd.Dataset:
    """Distinct undirected (a < b) foreign host edges, materialized --
    shared base of the triangle / clustering-coefficient family."""
    from ray.data.aggregate import Count

    def und(t: pa.Table) -> pa.Table:
        m = pc.invert(pc.equal(t["src"], t["dst"]))
        t = t.filter(m)
        lo = pc.min_element_wise(t["src"], t["dst"])
        hi = pc.max_element_wise(t["src"], t["dst"])
        return pa.table({"a": lo, "b": hi})

    return corpus_host_edges(pages_path) \
        .map_batches(und, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["a", "b"]),
                     batch_format="pyarrow") \
        .repartition(2).materialize()


def host_triangles(pages_path: str, num_partitions: int = 4,
                   edges: rd.Dataset | None = None) -> pa.Table:
    """Triangle participation per host over the UNDIRECTED foreign host
    graph -- the classic clustering-structure probe (link rings / spam
    constellations close many triangles; organic link graphs are
    sparse).  Shape: distinct undirected edges (a < b, one groupby over
    skinny host pairs), a hash self-join on the shared endpoint builds
    2-paths (a-b-c with a < b < c after orientation -- each triangle
    enumerated exactly once), and one membership join against the edge
    table closes them.  Per-host counts then roll up from the closed
    (a, b, c) rows: each triangle credits all three corners."""
    if edges is None:
        edges = _undirected_host_edges(pages_path)

    # 2-paths pivoting on the LOWEST corner: (a,b) ⋈ (a,c) with b < c
    left = edges.map_batches(
        lambda t: pa.table({"a": t["a"], "b": t["b"]}),
        batch_format="pyarrow")
    right = edges.map_batches(
        lambda t: pa.table({"a": t["a"], "c": t["b"]}),
        batch_format="pyarrow")
    wedges = left.join(right, join_type="inner", on=("a",),
                       num_partitions=num_partitions) \
        .map_batches(lambda t: t.filter(pc.less(t["b"], t["c"])),
                     batch_format="pyarrow").repartition(2).materialize()
    # close the wedge: (b, c) must be an edge
    closer = edges.map_batches(
        lambda t: pa.table({"b": t["a"], "c": t["b"],
                            "closed": pa.array([True] * t.num_rows,
                                               pa.bool_())}),
        batch_format="pyarrow")
    tri = wedges.join(closer, join_type="inner", on=("b", "c"),
                      num_partitions=num_partitions)

    def corner_partial(t: pa.Table) -> pa.Table:
        import numpy as np
        hosts, cnts = np.unique(
            np.concatenate([t["a"].to_numpy(zero_copy_only=False),
                            t["b"].to_numpy(zero_copy_only=False),
                            t["c"].to_numpy(zero_copy_only=False)]),
            return_counts=True)
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "n_triangles": pa.array(cnts, pa.int64())})

    from ray.data.aggregate import Sum as _Sum
    rows = tri.map_batches(corner_partial, batch_format="pyarrow") \
        .groupby("host").aggregate(
            _Sum("n_triangles", alias_name="n_triangles")).take_all()
    rows.sort(key=lambda r: r["host"])
    return pa.table({
        "host": pa.array([r["host"] for r in rows], pa.string()),
        "n_triangles": pa.array([int(r["n_triangles"]) for r in rows],
                                pa.int64())})


def host_core_numbers(pages_path: str) -> pa.Table:
    """Core number per host over the undirected foreign host graph --
    the standard graph-density decomposition (a node's core number is
    the largest k such that it survives in the k-core).  Link farms and
    mirror rings sit in high cores; peripheral hosts peel off at k=1.

    Shape: the distinct undirected edge table stays a Dataset; each peel
    step is ONE distributed degree groupby, and the set of hosts peeled
    this step broadcasts into the next filter (host-cardinality state,
    the robots-map posture -- O(hosts), never O(edges), on the driver).
    Oracle: an independent serial dict peeler in tools/gen_golden.py."""
    from ray.data.aggregate import Count

    def und(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["src"], t["dst"])))
        lo = pc.min_element_wise(t["src"], t["dst"])
        hi = pc.max_element_wise(t["src"], t["dst"])
        return pa.table({"a": lo, "b": hi})

    pairs = corpus_host_edges(pages_path) \
        .map_batches(und, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["a", "b"]),
                     batch_format="pyarrow").repartition(2).materialize()
    # both directions so one groupby yields full degrees
    edges = pairs.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([t["a"].combine_chunks(),
                                     t["b"].combine_chunks()]),
            "dst": pa.concat_arrays([t["b"].combine_chunks(),
                                     t["a"].combine_chunks()])}),
        batch_format="pyarrow").repartition(2).materialize()

    core: dict[str, int] = {}
    k = 1
    while True:
        n_alive = edges.count()
        if n_alive == 0:
            break
        peeled_any = True
        while peeled_any:
            deg = edges.groupby("src").aggregate(
                Count(alias_name="deg")).take_all()
            low = {r["src"] for r in deg if int(r["deg"]) < k}
            if not low:
                peeled_any = False
                break
            for h in low:
                core[h] = k - 1
            lowset = low
            edges = edges.map_batches(
                lambda t, ls=lowset: t.filter(pa.array(
                    [s not in ls and d not in ls
                     for s, d in zip(t["src"].to_pylist(),
                                     t["dst"].to_pylist())],
                    pa.bool_())),
                batch_format="pyarrow").repartition(2).materialize()
            if edges.count() == 0:
                break
        if edges.count() == 0:
            break
        # survivors of the k-peel have core >= k
        for r in edges.groupby("src").aggregate(
                Count(alias_name="deg")).take_all():
            core[r["src"]] = k
        k += 1

    hosts = sorted(core)
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "core": pa.array([core[h] for h in hosts], pa.int64())})


def _scc_driver(edge_tbl: pa.Table, node_list: list) -> pa.Table:
    """Serial iterative Kosaraju twin of the distributed FW-BW loop over
    a bounded graph: SCC membership plus label = min member id is a SET
    property, so the output is identical by construction (and the
    algorithm differs from both the distributed FW-BW coloring AND the
    golden's Tarjan, keeping the three-way independence)."""
    nodes = sorted(set(node_list))
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj: list[list[int]] = [[] for _ in range(n)]
    radj: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(edge_tbl["src"].to_pylist(),
                    edge_tbl["dst"].to_pylist()):
        si, di = idx[s], idx[d]
        adj[si].append(di)
        radj[di].append(si)
    seen = [False] * n
    order: list[int] = []
    for start in range(n):
        if seen[start]:
            continue
        stack = [(start, 0)]
        seen[start] = True
        while stack:
            v, ei = stack[-1]
            if ei < len(adj[v]):
                stack[-1] = (v, ei + 1)
                w = adj[v][ei]
                if not seen[w]:
                    seen[w] = True
                    stack.append((w, 0))
            else:
                order.append(v)
                stack.pop()
    comp = [-1] * n
    labels: dict[int, str] = {}
    for v in reversed(order):
        if comp[v] != -1:
            continue
        members = [v]
        comp[v] = v
        stack2 = [v]
        while stack2:
            x = stack2.pop()
            for w in radj[x]:
                if comp[w] == -1:
                    comp[w] = v
                    members.append(w)
                    stack2.append(w)
        labels[v] = min(nodes[m] for m in members)
    return pa.table({
        "node": pa.array(nodes, pa.string()),
        "scc": pa.array([labels[comp[i]] for i in range(n)],
                        pa.string())})


def strongly_connected_components(edges: rd.Dataset, max_rounds: int = 30,
                                  max_prop_iters: int = 60,
                                  num_partitions: int = 4) -> pa.Table:
    """Distributed strongly-connected components over a DIRECTED
    (src, dst) edge Dataset -- the forward-backward coloring algorithm
    (FW-BW / coloring of Orzan's SCC family; the standard
    Pregel-style SCC): per round, (1) propagate color(v) = MIN node id
    that forward-reaches v to fixpoint (iterated join + Min-groupby --
    every color class provably contains its pivot, the node equal to
    its color), (2) mark backward reachability from each pivot along
    INTRA-COLOR edges only, (3) the marked nodes of color c are exactly
    SCC(c): assigned and removed; repeat on the remainder.  Rounds are
    bounded by the condensation-DAG depth.

    Scale shape: edges stay a Dataset end to end (each step is a hash
    join + groupby, materialized per the two-live-joins rule); only the
    per-round REMOVED node set (output scale) and final assignments
    (node cardinality -- the robots-map posture) touch the driver.
    Raises on non-convergence rather than returning partial labels
    (the connected_components contract)."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Min as _Min

    E = edges.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["src"], t["dst"]))),
        batch_format="pyarrow") \
        .groupby(["src", "dst"]).aggregate(_Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["src", "dst"]),
                     batch_format="pyarrow").repartition(2).materialize()

    nodes = E.map_batches(
        lambda t: pa.table({"node": pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()])}),
        batch_format="pyarrow").groupby("node") \
        .aggregate(_Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["node"]),
                     batch_format="pyarrow").repartition(2).materialize()

    if E.count() <= _PR_DRIVER_MAX_EDGES:
        # bounded-graph fast path (the pagerank/CC convention): SCC
        # membership + min-member label is a set property, identical
        # from any correct algorithm; the serial Kosaraju twin skips
        # ~4 pool spinups per FW-BW round.  Arrow-ref collection, never
        # per-row take_all.
        import ray as _ray
        et = [t for t in _ray.get(E.to_arrow_refs()) if t.num_rows]
        nt = [t for t in _ray.get(nodes.to_arrow_refs()) if t.num_rows]
        nl = (pa.concat_tables(nt)["node"].to_pylist() if nt else [])
        if not et:
            return pa.table({"node": pa.array(sorted(set(nl)),
                                              pa.string()),
                             "scc": pa.array(sorted(set(nl)),
                                             pa.string())})
        return _scc_driver(pa.concat_tables(et), nl)

    assigned: dict = {}
    for _round in range(max_rounds):
        if nodes.count() == 0:
            break
        if E.count() == 0:
            # remaining nodes lost every edge to removed SCCs: all
            # singletons (and an empty E would feed the joins an
            # unkeyable empty-schema block -- the ray 2.49 trap)
            for r in nodes.take_all():
                assigned[r["node"]] = r["node"]
            break
        # ---- forward min-color propagation to fixpoint
        V = nodes.map_batches(
            lambda t: pa.table({"node": t["node"], "color": t["node"]}),
            batch_format="pyarrow").repartition(2).materialize()
        for _ in range(max_prop_iters):
            left = E.join(
                V.map_batches(lambda t: pa.table(
                    {"src": t["node"], "c_src": t["color"]}),
                    batch_format="pyarrow").repartition(2),
                join_type="inner", on=("src",),
                num_partitions=num_partitions).materialize()
            # pointer jump (the connected_components doubling step,
            # valid here because min-REACHING labels compose: if c
            # reaches v and c' reaches c then c' reaches v, so
            # color(color(v)) is always a sound candidate) -- distance
            # to the color root roughly squares per iteration
            jump = V.join(
                V.map_batches(lambda t: pa.table(
                    {"color": t["node"], "cc": t["color"]}),
                    batch_format="pyarrow").repartition(2),
                join_type="inner", on=("color",),
                num_partitions=num_partitions).map_batches(
                lambda t: pa.table({"dst": t["node"], "c_src": t["cc"]}),
                batch_format="pyarrow").repartition(2).materialize()
            msgs = left.map_batches(
                lambda t: t.select(["dst", "c_src"]),
                batch_format="pyarrow").union(jump)
            newc = msgs.groupby("dst").aggregate(
                _Min("c_src", alias_name="c_new")).repartition(2) \
                .materialize()
            V2 = V.join(newc, join_type="left_outer", on=("node",),
                        right_on=("dst",),
                        num_partitions=num_partitions).map_batches(
                lambda t: pa.table({
                    "node": t["node"],
                    "color": pc.min_element_wise(
                        t["color"], pc.fill_null(t["c_new"], "￿")),
                    "_old": t["color"]}),
                batch_format="pyarrow").repartition(2).materialize()
            n_changed = V2.map_batches(
                lambda t: pa.table({"c": pa.array(
                    [int(pc.sum(pc.cast(pc.invert(pc.equal(
                        t["color"], t["_old"])), pa.int64())).as_py()
                     or 0)], pa.int64())}),
                batch_format="pyarrow").sum("c")
            V = V2.map_batches(lambda t: t.select(["node", "color"]),
                               batch_format="pyarrow").repartition(2) \
                .materialize()
            if not n_changed:
                break
        else:
            raise RuntimeError("SCC color propagation did not converge")

        # ---- intra-color edge table with both endpoint colors
        Ec = E.join(
            V.map_batches(lambda t: pa.table(
                {"src": t["node"], "c_src": t["color"]}),
                batch_format="pyarrow").repartition(2),
            join_type="inner", on=("src",),
            num_partitions=num_partitions).repartition(2).materialize()
        Ec = Ec.join(
            V.map_batches(lambda t: pa.table(
                {"dst": t["node"], "c_dst": t["color"]}),
                batch_format="pyarrow").repartition(2),
            join_type="inner", on=("dst",),
            num_partitions=num_partitions).map_batches(
            lambda t: t.filter(pc.equal(t["c_src"], t["c_dst"]))
            .select(["src", "dst"]), batch_format="pyarrow") \
            .repartition(2).materialize()

        # ---- backward marking from pivots (node == color) along
        # intra-color edges; marked set is per-color SCC-bounded, and
        # each wave broadcasts only the NEWLY marked frontier
        marked = {r["node"] for r in V.map_batches(
            lambda t: t.filter(pc.equal(t["node"], t["color"]))
            .select(["node"]), batch_format="pyarrow").take_all()}
        frontier = set(marked)
        for _ in range(max_prop_iters):
            if not frontier:
                break
            fr = frontier
            new_rows = Ec.map_batches(
                lambda t, fr=fr: t.filter(pa.array(
                    [d in fr for d in t["dst"].to_pylist()], pa.bool_()))
                .select(["src"]), batch_format="pyarrow").take_all()
            frontier = {r["src"] for r in new_rows} - marked
            marked |= frontier
        else:
            raise RuntimeError("SCC backward marking did not converge")

        colors = {r["node"]: r["color"] for r in V.take_all()}
        for n in marked:
            assigned[n] = colors[n]
        ms = marked
        nodes = nodes.map_batches(
            lambda t, ms=ms: t.filter(pa.array(
                [x not in ms for x in t["node"].to_pylist()], pa.bool_())),
            batch_format="pyarrow").repartition(2).materialize()
        E = E.map_batches(
            lambda t, ms=ms: t.filter(pa.array(
                [s not in ms and d not in ms
                 for s, d in zip(t["src"].to_pylist(),
                                 t["dst"].to_pylist())], pa.bool_())),
            batch_format="pyarrow").repartition(2).materialize()
    else:
        raise RuntimeError("SCC did not converge within max_rounds")

    ks = sorted(assigned)
    return pa.table({"node": pa.array(ks, pa.string()),
                     "scc": pa.array([assigned[k] for k in ks],
                                     pa.string())})


def host_scc(pages_path: str) -> pa.Table:
    """SCC labels of the directed foreign-host link graph (which host
    clusters are mutually reachable -- mirror rings and link exchanges
    form non-trivial SCCs; one-way feeder hosts stay singletons).
    Golden: an independent serial iterative Tarjan in
    tools/gen_golden.py (gen_scc_golden), own href/host extraction."""
    edges = corpus_host_edges(pages_path)
    return strongly_connected_components(edges)


def host_condensation_report(pages_path: str) -> pa.Table:
    """Condensation-DAG summary of the host link graph: SCC count,
    non-trivial SCC count, largest SCC size, and the number of DISTINCT
    condensation edges (inter-SCC links) -- the collapsed topology a
    crawl scheduler reasons about (an SCC is one politeness/recrawl
    unit; condensation edges are the discovery order constraints).
    Composes ``host_scc`` with one relabeling join pass over the edge
    table; all counts exact, oracle recomputed from the Tarjan golden
    by the same SQL-free rule in tools/gen_golden.py."""
    from ray.data.aggregate import Count as _Count

    scc = host_scc(pages_path)
    labels = {n: s for n, s in zip(scc["node"].to_pylist(),
                                   scc["scc"].to_pylist())}
    sizes: dict = {}
    for s in labels.values():
        sizes[s] = sizes.get(s, 0) + 1
    n_sccs = len(sizes)
    n_nontrivial = sum(1 for v in sizes.values() if v > 1)
    largest = max(sizes.values()) if sizes else 0

    import ray as _ray
    lab_ref = _ray.put(labels)

    def relabel(t: pa.Table) -> pa.Table:
        lab = _ray.get(lab_ref)
        src = [lab.get(x) for x in t["src"].to_pylist()]
        dst = [lab.get(x) for x in t["dst"].to_pylist()]
        out = pa.table({"a": pa.array(src, pa.string()),
                        "b": pa.array(dst, pa.string())})
        return out.filter(pc.and_(
            pc.and_(pc.is_valid(out["a"]), pc.is_valid(out["b"])),
            pc.invert(pc.equal(out["a"], out["b"]))))

    dag = corpus_host_edges(pages_path).map_batches(
        relabel, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(_Count(alias_name="_n"))
    n_dag_edges = dag.count()
    return pa.table({
        "n_sccs": pa.array([n_sccs], pa.int64()),
        "n_nontrivial": pa.array([n_nontrivial], pa.int64()),
        "largest_scc": pa.array([largest], pa.int64()),
        "n_dag_edges": pa.array([n_dag_edges], pa.int64())})


def host_distances(pages_path: str, n_seeds: int = 2, max_depth: int = 10,
                   num_partitions: int = 4) -> pa.Table:
    """Multi-source BFS over the directed host link graph: shortest
    hop distance from the ``n_seeds`` lexicographically smallest hosts
    to every reachable host -- the seed-coverage question a crawl
    planner asks before committing a seed list (which hosts are within
    k hops of the seeds, which are unreachable).

    Scale shape: the distinct host-edge table is materialized ONCE
    (skinny 2-string rows; html never shuffles) and re-joined per BFS
    round against the CURRENT FRONTIER only -- each round is one hash
    join (frontier x edges) plus one Min-groupby merging newly reached
    hosts into the known-distance table, so a round's shuffle volume is
    O(frontier out-edges), not O(graph).  Rounds = graph eccentricity,
    bounded by ``max_depth``.  Mirrors DuckDB's recursive-CTE BFS
    bit-for-bit (integer hop counts).  Ref: pomp has no graph ops; this
    extends the crawl-analysis suite (SURVEY.md section 8)."""
    from ray.data.aggregate import Count

    edges = corpus_host_edges(pages_path) \
        .map_batches(lambda t: t.filter(
            pc.invert(pc.equal(t["src"], t["dst"]))),
            batch_format="pyarrow") \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["src", "dst"]),
                     batch_format="pyarrow") \
        .repartition(2).materialize()

    # seed pick: distinct page hosts, smallest n_seeds (host table is
    # the small side by construction -- one row per host)
    from pomp_ray.stages.enqueue import _FAST_EXTRACT
    hosts = rd.read_parquet(pages_path, columns=["url"]).map_batches(
        lambda t: pa.table({"host": pc.struct_field(
            pc.extract_regex(t["url"], pattern=_FAST_EXTRACT), "host")}),
        batch_format="pyarrow").groupby("host").aggregate(
            Count(alias_name="_n")).take_all()
    seeds = sorted(r["host"] for r in hosts)[:n_seeds]

    known = rd.from_arrow(pa.table({
        "host": pa.array(seeds, pa.string()),
        "dist": pa.array([0] * len(seeds), pa.int64())})).materialize()
    frontier = known
    for r in range(1, max_depth + 1):
        probe = frontier.map_batches(
            lambda t: pa.table({"src": t["host"]}),
            batch_format="pyarrow").repartition(2).materialize()
        reached = probe.join(edges, join_type="inner", on=("src",),
                             num_partitions=num_partitions) \
            .map_batches(lambda t, rr=r: pa.table({
                "host": t["dst"],
                "dist": pa.array([rr] * t.num_rows, pa.int64())}),
                batch_format="pyarrow")
        merged = known.union(reached).groupby("host").aggregate(
            Min("dist", alias_name="dist"))
        known = merged.map_batches(
            lambda t: pa.table({"host": t["host"],
                                "dist": pc.cast(t["dist"], pa.int64())}),
            batch_format="pyarrow").repartition(2).materialize()
        frontier = known.map_batches(
            lambda t, rr=r: t.filter(pc.equal(t["dist"], rr)),
            batch_format="pyarrow").repartition(2).materialize()
        if frontier.count() == 0:
            break

    tbl = pa.concat_tables(
        list(known.iter_batches(batch_format="pyarrow"))
        or [pa.table({"host": pa.array([], pa.string()),
                      "dist": pa.array([], pa.int64())})])
    return tbl.sort_by("host")


def orphan_pages(pages_path: str, num_partitions: int = 8) -> pa.Table:
    """Pages never referenced by any hyperlink in the corpus (per host):
    the complement of ``broken_links`` -- orphans are fetchable only
    via seeds/sitemaps, so a link-following recrawl silently drops
    them.  Scale shape: distinct canonical link targets (per-batch
    distinct, one global groupby over skinny strings), one left join
    pages-vs-targets, per-host count rollup; html never shuffles."""
    from ray.data.aggregate import Count, Sum

    def targets(t: pa.Table) -> pa.Table:
        rows = _host_edge_rows(t)
        return pa.table({"target": rows["target"]}) \
            .group_by(["target"]).aggregate([])

    tgt = (rd.read_parquet(pages_path, columns=["url", "html"])
           .map_batches(targets, batch_format="pyarrow")
           .groupby("target").aggregate(Count(alias_name="_n")))
    probe = tgt.map_batches(
        lambda t: pa.table({"p_url": t["target"],
                            "linked": pa.array([True] * t.num_rows)}),
        batch_format="pyarrow").repartition(2).materialize()

    from pomp_ray.stages.enqueue import _FAST_EXTRACT
    pages = rd.read_parquet(pages_path, columns=["url"]).map_batches(
        lambda t: pa.table({
            "p_url": t["url"],
            "host": pc.struct_field(
                pc.extract_regex(t["url"], pattern=_FAST_EXTRACT),
                "host")}),
        batch_format="pyarrow")
    j = pages.join(probe, join_type="left_outer", on=("p_url",),
                   num_partitions=num_partitions)
    per_host = j.map_batches(
        lambda t: pa.table({
            "host": t["host"],
            "one": pa.array([1] * t.num_rows, pa.int64()),
            "orphan": pc.cast(pc.is_null(t["linked"]), pa.int64())}),
        batch_format="pyarrow").groupby("host").aggregate(
        Sum("one", alias_name="n_pages"),
        Sum("orphan", alias_name="n_orphans"))
    out = per_host.map_batches(
        lambda t: pa.table({
            "host": t["host"],
            "n_pages": pc.cast(t["n_pages"], pa.int64()),
            "n_orphans": pc.cast(t["n_orphans"], pa.int64())}),
        batch_format="pyarrow")
    tbl = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow"))
        or [pa.table({"host": pa.array([], pa.string()),
                      "n_pages": pa.array([], pa.int64()),
                      "n_orphans": pa.array([], pa.int64())})])
    return tbl.sort_by("host")


def host_cocitation(pages_path: str, num_partitions: int = 4) -> pa.Table:
    """Co-citation coupling over the foreign host graph: host pairs
    (a < b) ranked by how many DISTINCT destination hosts both link to
    -- the classic bibliographic-coupling signal for discovering hosts
    with the same outlink profile (mirror farms, template networks).

    Shape: distinct (src, dst) foreign edges (one skinny groupby), a
    hash self-join pivoting on dst builds the co-citing pairs, one
    count groupby finishes.  Same join discipline as host_triangles:
    .repartition(2) + materialize between chained joins (the ray 2.49
    empty-schema-block family)."""
    from ray.data.aggregate import Count as _Count

    def foreign(t: pa.Table) -> pa.Table:
        m = pc.invert(pc.equal(t["src"], t["dst"]))
        return t.filter(m)

    edges = corpus_host_edges(pages_path) \
        .map_batches(foreign, batch_format="pyarrow") \
        .groupby(["src", "dst"]).aggregate(_Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["src", "dst"]),
                     batch_format="pyarrow") \
        .repartition(2).materialize()

    left = edges.map_batches(
        lambda t: pa.table({"a": t["src"], "dst": t["dst"]}),
        batch_format="pyarrow")
    right = edges.map_batches(
        lambda t: pa.table({"b": t["src"], "dst": t["dst"]}),
        batch_format="pyarrow")
    pairs = left.join(right, join_type="inner", on=("dst",),
                      num_partitions=num_partitions) \
        .map_batches(lambda t: t.filter(pc.less(t["a"], t["b"])),
                     batch_format="pyarrow").repartition(2)
    rows = pairs.groupby(["a", "b"]).aggregate(
        _Count(alias_name="n_shared_dsts")).take_all()
    rows.sort(key=lambda r: (r["a"], r["b"]))
    return pa.table({
        "a": pa.array([r["a"] for r in rows], pa.string()),
        "b": pa.array([r["b"] for r in rows], pa.string()),
        "n_shared_dsts": pa.array([int(r["n_shared_dsts"])
                                   for r in rows], pa.int64())})


def degree_assortativity(pages_path: str,
                         num_partitions: int = 4) -> pa.Table:
    """Degree assortativity of the undirected foreign host graph: the
    Pearson correlation of endpoint degrees over all edges (Newman
    2002) -- negative means hubs link to leaves (organic webs),
    positive means hubs link to hubs (link farms).

    Exact integer sufficient statistics, the lineitem_corr_stats
    convention: each undirected edge contributes BOTH (deg_a, deg_b)
    and (deg_b, deg_a), the per-batch partials are int64 sums, and the
    single-row result is computed from exact Python ints so the float
    ops (cast, sqrt, multiply, divide) mirror the DuckDB oracle
    bit for bit.  Degrees reach the edge table via two hash joins with
    a materialize between them (the two-live-joins rule)."""
    import math

    from ray.data.aggregate import Count as _Count, Sum as _Sum

    def und(t: pa.Table) -> pa.Table:
        m = pc.invert(pc.equal(t["src"], t["dst"]))
        t = t.filter(m)
        lo = pc.min_element_wise(t["src"], t["dst"])
        hi = pc.max_element_wise(t["src"], t["dst"])
        return pa.table({"a": lo, "b": hi})

    edges = corpus_host_edges(pages_path) \
        .map_batches(und, batch_format="pyarrow") \
        .groupby(["a", "b"]).aggregate(_Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["a", "b"]),
                     batch_format="pyarrow") \
        .repartition(2).materialize()

    def halves(t: pa.Table) -> pa.Table:
        return pa.table({"host": pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()])})

    deg = edges.map_batches(halves, batch_format="pyarrow") \
        .groupby("host").aggregate(_Count(alias_name="deg")) \
        .repartition(2).materialize()

    da = deg.map_batches(
        lambda t: pa.table({"a": t["host"], "deg_a": t["deg"]}),
        batch_format="pyarrow")
    db = deg.map_batches(
        lambda t: pa.table({"b": t["host"], "deg_b": t["deg"]}),
        batch_format="pyarrow")
    j1 = edges.join(da, join_type="inner", on=("a",),
                    num_partitions=num_partitions) \
        .repartition(2).materialize()
    j2 = j1.join(db, join_type="inner", on=("b",),
                 num_partitions=num_partitions).repartition(2)

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        x = t["deg_a"].to_numpy().astype(np.int64)
        y = t["deg_b"].to_numpy().astype(np.int64)
        # both orientations of every undirected edge
        sx = int(x.sum() + y.sum())
        sxx = int((x * x).sum() + (y * y).sum())
        sxy = int(2 * (x * y).sum())
        return pa.table({"n": pa.array([2 * t.num_rows], pa.int64()),
                         "sx": pa.array([sx], pa.int64()),
                         "sxx": pa.array([sxx], pa.int64()),
                         "sxy": pa.array([sxy], pa.int64())})

    r = j2.map_batches(partial, batch_format="pyarrow").aggregate(
        _Sum("n", alias_name="n"), _Sum("sx", alias_name="sx"),
        _Sum("sxx", alias_name="sxx"), _Sum("sxy", alias_name="sxy"))
    n, sx, sxx, sxy = (int(r["n"]), int(r["sx"]), int(r["sxx"]),
                       int(r["sxy"]))
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    assort = float(num) / float(den)
    return pa.table({"n_endpoints": pa.array([n], pa.int64()),
                     "assortativity": pa.array([assort], pa.float64())})


def host_clustering_coeffs(pages_path: str,
                           num_partitions: int = 4) -> pa.Table:
    """Local clustering coefficient per host (2 * triangles /
    deg * (deg-1), exact integer ppm) over the undirected foreign host
    graph -- the per-node sibling of host_triangles: template networks
    read near 0, mirror rings near 1e6.

    Shape: ONE materialized distinct-edge table feeds both the triangle
    pipeline (reused verbatim) and a degree groupby; the final
    host-cardinality merge runs on the driver (O(hosts) state, the
    robots-map posture).  Hosts of degree < 2 have no defined
    coefficient and are excluded, matching the oracle."""
    from ray.data.aggregate import Sum as _Sum

    edges = _undirected_host_edges(pages_path)
    tri = host_triangles(pages_path, num_partitions, edges=edges)

    def deg_partial(t: pa.Table) -> pa.Table:
        import numpy as np
        hosts, cnts = np.unique(
            np.concatenate([t["a"].to_numpy(zero_copy_only=False),
                            t["b"].to_numpy(zero_copy_only=False)]),
            return_counts=True)
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "degree": pa.array(cnts, pa.int64())})

    deg_rows = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("host").aggregate(
            _Sum("degree", alias_name="degree")).take_all()
    tri_map = {h.as_py(): n.as_py()
               for h, n in zip(tri["host"], tri["n_triangles"])}
    out_h, out_d, out_t, out_c = [], [], [], []
    for r in sorted(deg_rows, key=lambda r: r["host"]):
        d = int(r["degree"])
        if d < 2:
            continue
        n_tri = int(tri_map.get(r["host"], 0))
        out_h.append(r["host"])
        out_d.append(d)
        out_t.append(n_tri)
        out_c.append(2 * n_tri * 1_000_000 // (d * (d - 1)))
    return pa.table({"host": pa.array(out_h, pa.string()),
                     "degree": pa.array(out_d, pa.int64()),
                     "n_triangles": pa.array(out_t, pa.int64()),
                     "cc_ppm": pa.array(out_c, pa.int64())})


def rich_club_coefficients(pages_path: str) -> pa.Table:
    """Rich-club curve over the undirected foreign host graph: for each
    degree threshold k, the density phi(k) (in ppm) of the subgraph
    induced by hosts of degree >= k -- link cliques between big hubs
    push phi toward 1e6 while organic graphs thin out.

    Shape: one degree groupby over the shared distinct-edge table, one
    per-edge min-endpoint-degree partial, then two O(max_degree)
    suffix-sum folds on the driver (degree histograms, never edges)."""
    from ray.data.aggregate import Sum as _Sum

    edges = _undirected_host_edges(pages_path)

    def deg_partial(t: pa.Table) -> pa.Table:
        import numpy as np
        hosts, cnts = np.unique(
            np.concatenate([t["a"].to_numpy(zero_copy_only=False),
                            t["b"].to_numpy(zero_copy_only=False)]),
            return_counts=True)
        return pa.table({"host": pa.array(hosts, pa.string()),
                         "degree": pa.array(cnts, pa.int64())})

    deg_rows = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("host").aggregate(
            _Sum("degree", alias_name="degree")).take_all()
    deg = {r["host"]: int(r["degree"]) for r in deg_rows}
    deg_ref = ray.put(deg)

    def edge_min_deg(t: pa.Table) -> pa.Table:
        import numpy as np
        d = ray.get(deg_ref)
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        m = np.fromiter((min(d[x], d[y]) for x, y in zip(a, b)),
                        np.int64, len(a))
        md, cnt = np.unique(m, return_counts=True)
        return pa.table({"min_deg": pa.array(md, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    m_rows = edges.map_batches(edge_min_deg, batch_format="pyarrow") \
        .groupby("min_deg").aggregate(_Sum("n", alias_name="n")).take_all()
    if not deg:
        return pa.table({"k": pa.array([], pa.int64()),
                         "n_hosts": pa.array([], pa.int64()),
                         "n_edges": pa.array([], pa.int64()),
                         "phi_ppm": pa.array([], pa.int64())})
    max_k = max(deg.values())
    # suffix counts: hosts with degree >= k / edges with min endpoint
    # degree >= k
    hist_h = [0] * (max_k + 2)
    for v in deg.values():
        hist_h[v] += 1
    hist_e = [0] * (max_k + 2)
    for r in m_rows:
        hist_e[int(r["min_deg"])] += int(r["n"])
    out_k, out_h, out_e, out_p = [], [], [], []
    nh = ne = 0
    acc = []
    for k in range(max_k, 0, -1):
        nh += hist_h[k]
        ne += hist_e[k]
        acc.append((k, nh, ne))
    for k, nh, ne in sorted(acc):
        if nh < 2:
            continue
        out_k.append(k)
        out_h.append(nh)
        out_e.append(ne)
        out_p.append(ne * 1_000_000 // (nh * (nh - 1) // 2))
    return pa.table({"k": pa.array(out_k, pa.int64()),
                     "n_hosts": pa.array(out_h, pa.int64()),
                     "n_edges": pa.array(out_e, pa.int64()),
                     "phi_ppm": pa.array(out_p, pa.int64())})


def host_harmonic_centrality(pages_path: str, n_seeds: int = 4,
                             max_depth: int = 10,
                             num_partitions: int = 4) -> pa.Table:
    """Sampled harmonic centrality over the directed host graph:
    centrality(h) = sum over sample sources s of 1/d(s, h), the
    standard finite-distance-safe closeness variant (Boldi & Vigna,
    "Axioms for Centrality"), here in exact integer ppm
    (1_000_000 // d sums, so cross-engine bit-identical) from the
    ``n_seeds`` lexicographically smallest hosts -- the sampling
    estimator a full graph would run from a hash-sampled source set.

    Scale shape: the ``host_distances`` BFS loop generalized to a
    composite (seed, host) frontier -- per-seed distances ride ONE
    shared edge join per round (shuffle volume = frontier out-edges x
    live seeds, never graph x seeds); the final rollup is a tiny
    groupby(host).  Exact vs the DuckDB recursive-CTE per-seed BFS."""
    from ray.data.aggregate import Count, Min, Sum

    edges = corpus_host_edges(pages_path) \
        .map_batches(lambda t: t.filter(
            pc.invert(pc.equal(t["src"], t["dst"]))),
            batch_format="pyarrow") \
        .groupby(["src", "dst"]).aggregate(Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["src", "dst"]),
                     batch_format="pyarrow") \
        .repartition(2).materialize()

    from pomp_ray.stages.enqueue import _FAST_EXTRACT
    hosts = rd.read_parquet(pages_path, columns=["url"]).map_batches(
        lambda t: pa.table({"host": pc.struct_field(
            pc.extract_regex(t["url"], pattern=_FAST_EXTRACT), "host")}),
        batch_format="pyarrow").groupby("host").aggregate(
            Count(alias_name="_n")).take_all()
    seeds = sorted(r["host"] for r in hosts)[:n_seeds]

    known = rd.from_arrow(pa.table({
        "seed": pa.array(seeds, pa.string()),
        "host": pa.array(seeds, pa.string()),
        "dist": pa.array([0] * len(seeds), pa.int64())})).materialize()
    frontier = known
    for r in range(1, max_depth + 1):
        probe = frontier.map_batches(
            lambda t: pa.table({"seed": t["seed"], "src": t["host"]}),
            batch_format="pyarrow").repartition(2).materialize()
        reached = probe.join(edges, join_type="inner", on=("src",),
                             num_partitions=num_partitions) \
            .map_batches(lambda t, rr=r: pa.table({
                "seed": t["seed"], "host": t["dst"],
                "dist": pa.array([rr] * t.num_rows, pa.int64())}),
                batch_format="pyarrow")
        merged = known.union(reached).groupby(["seed", "host"]).aggregate(
            Min("dist", alias_name="dist"))
        known = merged.map_batches(
            lambda t: pa.table({"seed": t["seed"], "host": t["host"],
                                "dist": pc.cast(t["dist"], pa.int64())}),
            batch_format="pyarrow").repartition(2).materialize()
        frontier = known.map_batches(
            lambda t, rr=r: t.filter(pc.equal(t["dist"], rr)),
            batch_format="pyarrow").repartition(2).materialize()
        if frontier.count() == 0:
            break

    def rollup(t: pa.Table) -> pa.Table:
        import numpy as np   # graph.py keeps no module-level numpy
        t = t.filter(pc.greater_equal(t["dist"], 1))
        d = pc.cast(t["dist"], pa.int64()).to_numpy()
        return pa.table({"host": t["host"],
                         "one": pa.array(np.ones(len(d), np.int64)),
                         "hp": pa.array(1_000_000 // d, pa.int64())})

    agg = known.map_batches(rollup, batch_format="pyarrow") \
        .groupby("host").aggregate(
            Sum("one", alias_name="n_reached"),
            Sum("hp", alias_name="harmonic_ppm"))
    tbl = pa.concat_tables(
        list(agg.iter_batches(batch_format="pyarrow"))
        or [pa.table({"host": pa.array([], pa.string()),
                      "n_reached": pa.array([], pa.int64()),
                      "harmonic_ppm": pa.array([], pa.int64())})])
    out = pa.table({"host": tbl["host"],
                    "n_reached": pc.cast(tbl["n_reached"], pa.int64()),
                    "harmonic_ppm": pc.cast(tbl["harmonic_ppm"],
                                            pa.int64())})
    return out.sort_by("host")


def host_adamic_adar(pages_path: str, num_partitions: int = 4) -> pa.Table:
    """Adamic-Adar-style link similarity over the foreign host graph:
    host pairs (a < b) scored by the sum over SHARED destinations of
    an inverse-popularity weight -- rare shared outlinks say more than
    links everyone makes (Adamic & Adar 2003).  The classic weight is
    1/log(indeg); this engine uses the log-free exact-integer variant
    w(dst) = 10^9 // indeg(dst) (the pmi_top_pairs discipline: integer
    ratios rank identically cross-engine, no last-ulp float risk).

    Shape: distinct foreign (src, dst) edges (one skinny groupby), an
    in-degree groupby on dst, ONE hash join attaching weights to edges
    (materialized -- the two-live-joins rule), then the cocitation
    dst-pivot self-join and a pair-sum groupby.  Everything after the
    corpus scan is host-cardinality-scale."""
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    def foreign(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.equal(t["src"], t["dst"])))

    edges = corpus_host_edges(pages_path) \
        .map_batches(foreign, batch_format="pyarrow") \
        .groupby(["src", "dst"]).aggregate(_Count(alias_name="_n")) \
        .map_batches(lambda t: t.select(["src", "dst"]),
                     batch_format="pyarrow") \
        .repartition(2).materialize()

    indeg = edges.groupby("dst").aggregate(_Count(alias_name="indeg")) \
        .map_batches(
            lambda t: pa.table({
                "dst": t["dst"],
                "w": pc.cast(pc.divide(
                    pa.scalar(1_000_000_000, pa.int64()),
                    pc.cast(t["indeg"], pa.int64())), pa.int64())}),
            batch_format="pyarrow").repartition(2).materialize()

    weighted = edges.join(indeg, join_type="inner", on=("dst",),
                          num_partitions=num_partitions) \
        .repartition(2).materialize()
    left = weighted.map_batches(
        lambda t: pa.table({"a": t["src"], "dst": t["dst"], "w": t["w"]}),
        batch_format="pyarrow")
    right = weighted.map_batches(
        lambda t: pa.table({"b": t["src"], "dst": t["dst"]}),
        batch_format="pyarrow")
    pairs = left.join(right, join_type="inner", on=("dst",),
                      num_partitions=num_partitions) \
        .map_batches(lambda t: t.filter(pc.less(t["a"], t["b"])),
                     batch_format="pyarrow").repartition(2)
    rows = pairs.groupby(["a", "b"]).aggregate(
        _Sum("w", alias_name="aa_ppb")).take_all()
    rows.sort(key=lambda r: (r["a"], r["b"]))
    return pa.table({
        "a": pa.array([r["a"] for r in rows], pa.string()),
        "b": pa.array([r["b"] for r in rows], pa.string()),
        "aa_ppb": pa.array([int(r["aa_ppb"]) for r in rows], pa.int64())})


def dup_component_size_histogram(sf_dir: str) -> pa.Table:
    """Near-dup component SIZE distribution -- the dedup-governance
    number that says whether duplication is pairwise noise or giant
    mirror clusters (a long tail here changes the dedup strategy).
    Sizes fold from the bounded dup_components table (docs that appear
    in at least one verified near-dup pair); one numpy pass."""
    import numpy as np

    comp = dup_components(sf_dir)
    if comp.num_rows == 0:
        return pa.table({"size": pa.array([], pa.int64()),
                         "n_components": pa.array([], pa.int64())})
    c = comp["component"].to_numpy()
    _, sizes = np.unique(c, return_counts=True)
    u, n = np.unique(sizes, return_counts=True)
    return pa.table({"size": pa.array(u.astype(np.int64), pa.int64()),
                     "n_components": pa.array(n.astype(np.int64),
                                              pa.int64())})
