"""Guards for the VERDICT r3 scale-shape fixes: the corpus-scale paths
must not collect the input to the driver (`take_all`) or broadcast a
driver-built dict, and the rewritten operators must agree with an
independent in-test brute computation at fixture scale."""

import inspect

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_no_driver_materialization_in_scale_paths():
    import pomp_ray.pipelines.docs as D
    import pomp_ray.pipelines.embeddings as E
    import pomp_ray.pipelines.webtext as W
    for fn in (E.knn_graph_edges, E.hard_negatives, E.neardup_pairs):
        src = inspect.getsource(fn)
        assert "take_all" not in src, fn.__name__
        assert "ray.put" not in src, fn.__name__
    # the IVF sibling may broadcast CENTROIDS (bounded) but must not
    # collect the corpus-scale pair table to the driver
    src = inspect.getsource(E.neardup_pairs_ivf)
    assert "take_all" not in src
    src = inspect.getsource(D.leakage_safe_splits)
    assert "ray.put" not in src
    assert "dict(" not in src
    # dedup_savings_by_source: survivors are corpus-scale -- must be a
    # marker-column hash join, never a driver set (ADVICE r4 medium)
    src = inspect.getsource(D.dedup_savings_by_source)
    assert "take_all" not in src
    assert "ray.put" not in src
    # dedup_lines joins with metadata-sized partitions, not a constant
    src = inspect.getsource(W.dedup_lines)
    assert "num_partitions=16" not in src
    # scaled ExactSubstr: the LCP verify shards by prefix bucket; the
    # corpus text/codes must never be broadcast or collected (VERDICT
    # r4 #3 -- the bounded exactsubstr_spans keeps its documented
    # broadcast, the _scaled path is the 100-TB shape)
    import pomp_ray.pipelines.suffix as X
    for fn in (X.exactsubstr_spans_scaled, X._window_rows):
        src = inspect.getsource(fn)
        assert "take_all" not in src, fn.__name__
        assert "ray.put" not in src, fn.__name__


def test_ppjoin_nondyadic_threshold_candidate_complete():
    """ADVICE r3: at a non-dyadic threshold the rational prefix/length
    arithmetic must lose no qualifying pair vs brute-force Jaccard."""
    from pomp_ray.functions.analysis import shingles
    from pomp_ray.pipelines.docs import ppjoin_pairs
    thr = 0.3
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    sh = {d: frozenset(shingles(x or ""))
          for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())}
    ids = sorted(sh)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sh[a], sh[b]
            if not sa and not sb:
                continue
            inter = len(sa & sb)
            if inter / (len(sa) + len(sb) - inter) >= thr:
                want.add((a, b))
    got = ppjoin_pairs(SF, threshold=thr)
    assert set(zip(got["doc_a"].to_pylist(),
                   got["doc_b"].to_pylist())) == want


def _brute_knn(ids, mat, k):
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    sims = (mat @ mat.T) / (n[:, None] * n[None, :])
    np.fill_diagonal(sims, -np.inf)
    edges = set()
    for i in range(len(ids)):
        order = np.lexsort((ids, -sims[i]))[:min(k, len(ids) - 1)]
        for j in order:
            edges.add((int(ids[i]), int(ids[j])))
    return edges


def test_knn_graph_edges_matches_brute():
    from pomp_ray.pipelines.embeddings import knn_graph_edges
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    want = _brute_knn(ids, mat, k=5)
    got = {(r["vec_id"], r["neighbor_id"])
           for r in knn_graph_edges(SF, k=5).take_all()}
    assert got == want


def test_hard_negatives_matches_brute():
    from pomp_ray.pipelines.embeddings import hard_negatives
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    lab = np.asarray(t["label"].to_pylist(), np.int64)
    n = np.linalg.norm(mat, axis=1)
    n[n == 0] = 1.0
    sims = (mat @ mat.T) / (n[:, None] * n[None, :])
    sims[lab[:, None] == lab[None, :]] = -np.inf
    want = {}
    for i in range(len(ids)):
        j = np.lexsort((ids, -sims[i]))[0]
        want[int(ids[i])] = (int(ids[j]), int(lab[j]))
    got = {r["vec_id"]: (r["negative_id"], r["negative_label"])
           for r in hard_negatives(SF).take_all()}
    assert got == want
