"""Generate committed golden parquet oracles under tests/golden/.

Two families, both INDEPENDENT of the engine code paths they check:

* Crawl outputs (crawl_bfs_visited / crawl_bfs_items / crawl_dfs_visited /
  crawl_bfs_errors): produced by the serial pomp-semantics oracle loop
  (pomp_ray/core/oracle.py) over the TINY corpus -- the same spec the
  pytest conformance suite trusts, NOT the distributed engine.  The
  driver's correctness gate can then hash-compare the engine's output
  against these via ``SELECT * FROM read_parquet(...)`` oracle SQL.

* Signature tables at sf0.01 (fingerprints / simhash_dup_groups): computed
  by straight-line pure-Python reimplementations in THIS file (per-token
  md5 + integer bit counting, byte-at-a-time FNV), deliberately avoiding
  pomp_ray.functions.analysis's vectorized/cached code so a vectorization
  bug cannot propagate into its own oracle.  simhash_dup_groups is a
  brute-force ALL-PAIRS Hamming scan (no LSH blocking) -- for
  max_hamming=3 over 4 quarters the engine's blocking is exact by
  pigeonhole, so the sets must match exactly.

The sf0.01 goldens are valid only for /root/testdata/sf0.01 (the scale the
driver's correctness gate runs at, per the task spec).

Usage: python tools/gen_golden.py
"""

from __future__ import annotations

import hashlib
import os
import re
import sys

import numpy as np

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
SF001 = "/root/testdata/sf0.01"


# ------------------------------------------------- independent signature impls
def indep_fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) % (1 << 64)
    return h & 0x7FFFFFFFFFFFFFFF


def indep_simhash63(text: str) -> int:
    tokens = re.findall(r"\S+", text)
    if not tokens:
        return 0
    counts = [0] * 64
    for tok in tokens:
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")
        for i in range(64):
            counts[i] += (h >> i) & 1
    out = 0
    n = len(tokens)
    for i in range(64):
        if 2 * counts[i] - n > 0:
            out |= 1 << i
    return out & 0x7FFFFFFFFFFFFFFF


def gen_signature_goldens() -> None:
    t = pq.read_table(os.path.join(SF001, "documents.parquet"),
                      columns=["doc_id", "text"])
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    fps = [indep_fnv1a64((x or "").encode()) for x in texts]
    sims = [indep_simhash63(x or "") for x in texts]
    pq.write_table(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "fingerprint": pa.array(fps, pa.int64()),
                  "simhash": pa.array(sims, pa.int64())}),
        os.path.join(GOLDEN_DIR, "fingerprints_sf001.parquet"))

    pairs = []
    order = sorted(zip(doc_ids, sims))
    for i, (a, sa) in enumerate(order):
        for b, sb in order[i + 1:]:
            if bin(sa ^ sb).count("1") <= 3:
                pairs.append((a, b))
    pairs.sort()
    pq.write_table(
        pa.table({"doc_a": pa.array([p[0] for p in pairs], pa.int64()),
                  "doc_b": pa.array([p[1] for p in pairs], pa.int64())}),
        os.path.join(GOLDEN_DIR, "simhash_dup_groups_sf001.parquet"))
    print(f"signature goldens: {len(doc_ids)} docs, {len(pairs)} simhash pairs")


# ------------------------------------------------------------- IVF goldens
def gen_ivf_goldens() -> None:
    """Independent straight-line reimplementation of the IVF similarity
    spec (pipelines/embeddings.py neardup_pairs_ivf / ivf_topk): seeded
    random-projection centroids (default_rng(42)), multi-probe cell
    assignment, cosine scoring.  Deliberately avoids the engine's Dataset
    pipeline / explode / groupby machinery -- every step here is a plain
    numpy scan, so a pipeline bug (wrong groupby key, lost explode rows,
    bad dedup) cannot propagate into its own oracle.  The engine's output
    is approximate-BY-DESIGN (pair found iff a probed cell is shared);
    these goldens pin that exact deterministic spec at sf0.01."""
    t = pq.read_table(os.path.join(SF001, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    import numpy as np
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    nm = mat / norms
    n, dim = nm.shape
    n_cells = 16
    rng = np.random.default_rng(42)
    cent = rng.standard_normal((n_cells, dim))
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    # --- neardup_pairs_ivf (threshold 0.35, n_probe=6): pair iff the two
    # vectors share >= 1 of their 6 closest cells AND cosine > threshold
    n_probe = 6
    probed = [set(np.argsort(-(nm[i] @ cent.T))[:n_probe].tolist())
              for i in range(n)]
    pairs = []
    for i in range(n):
        for j in range(i + 1, n):
            if probed[i] & probed[j] and float(nm[i] @ nm[j]) > 0.35:
                a, b = int(ids[i]), int(ids[j])
                pairs.append((a, b) if a < b else (b, a))
    pairs.sort()
    pq.write_table(
        pa.table({"id_a": pa.array([p[0] for p in pairs], pa.int64()),
                  "id_b": pa.array([p[1] for p in pairs], pa.int64())}),
        os.path.join(GOLDEN_DIR, "neardup_pairs_ivf_sf001.parquet"))

    # --- ivf_topk (query vec_id=0, k=10, n_probe=4): a vector is a
    # candidate iff its single closest cell is among the 4 cells closest
    # to the query; top-10 by (cosine desc, vec_id asc), score rounded
    q = nm[ids.tolist().index(0)]
    probe_q = set(np.argsort(-(cent @ q))[:4].tolist())
    cand = []
    for i in range(n):
        if int(ids[i]) == 0:
            continue
        if int(np.argmax(nm[i] @ cent.T)) in probe_q:
            cand.append((float(nm[i] @ q), int(ids[i])))
    cand.sort(key=lambda x: (-x[0], x[1]))
    top = cand[:10]
    pq.write_table(
        pa.table({"vec_id": pa.array([c[1] for c in top], pa.int64()),
                  "score": pa.array([round(c[0], 6) for c in top],
                                    pa.float64())}),
        os.path.join(GOLDEN_DIR, "ivf_topk_sf001.parquet"))
    print(f"ivf goldens: {len(pairs)} neardup pairs, {len(top)} topk rows")


# ----------------------------------------------------------- crawl goldens
def gen_crawl_goldens() -> None:
    from pomp_ray import schemas
    from pomp_ray.functions.textfns import url_path
    from pomp_ray.sources import gen_corpus
    from tests.helpers import oracle_inputs

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus", gen_corpus.TINY)
    corpus, seeds, robots, _ = oracle_inputs(fix)

    from pomp_ray.core.oracle import crawl_oracle

    from pomp_ray.stages.enqueue import HashPriority, HostPriority

    # "focused" = best-first with a domain-whitelist scorer (HostPriority);
    # "budget" = BFS under a per-host page quota (max_pages_per_host)
    for mode in ("bfs", "dfs", "best", "focused", "budget", "aged",
                 "filtered", "capped", "linkcap", "bytecap", "fcap"):
        kw = {}
        oracle_mode = mode
        if mode == "filtered":
            # link-scope deny regex (the Scrapy LinkExtractor shape)
            kw = {"url_deny": r"/p/1[0-9]$"}
            oracle_mode = "bfs"
        elif mode == "capped":
            # global visited budget, round-granular
            kw = {"max_visited": 25}
            oracle_mode = "bfs"
        elif mode == "linkcap":
            # per-page outlink cap: first link only (binds hard on TINY)
            kw = {"max_links_per_page": 1}
            oracle_mode = "bfs"
        elif mode == "bytecap":
            # extracted-text byte budget, round-granular
            kw = {"max_text_bytes": 800}
            oracle_mode = "bfs"
        elif mode == "fcap":
            # bounded-frontier admission: cap 8 binds hard on TINY
            kw = {"max_frontier_rows": 8}
            oracle_mode = "bfs"
        if mode == "best":
            # mirrors _crawl_outputs' config: width 32, md5-bucket scorer
            kw = {"best_width": 32, "priority_fn": HashPriority(7)}
        elif mode == "aged":
            # best-first + deferred-row priority aging (starvation fix)
            kw = {"best_width": 32, "priority_fn": HashPriority(7),
                  "priority_aging": 1}
            oracle_mode = "best"
        elif mode == "focused":
            kw = {"best_width": 32,
                  "priority_fn": HostPriority({"site1.test"})}
            oracle_mode = "best"
        elif mode == "budget":
            # mirrors _crawl_outputs: quota 10 binds on TINY (2 hosts)
            kw = {"max_pages_per_host": 10}
            oracle_mode = "bfs"
        res = crawl_oracle(corpus, seeds, robots, mode=oracle_mode, **kw)
        depth_by_url = {v["url"]: v["depth"] for v in res.visited}
        visited = pa.Table.from_pylist(res.visited, schema=schemas.VISITED)
        pq.write_table(visited, os.path.join(
            GOLDEN_DIR, f"crawl_{mode}_visited.parquet"))
        if mode in ("bfs", "budget", "fcap"):
            if mode == "bfs":
                items = pa.Table.from_pylist(
                    [{**i, "depth": depth_by_url[i["url"]]}
                     for i in res.items],
                    schema=schemas.ITEMS)
                pq.write_table(items, os.path.join(
                    GOLDEN_DIR, "crawl_bfs_items.parquet"))
            exc = {"fetch": ("FetchMiss", lambda u: "not in corpus"),
                   "robots": ("RobotsDisallowed", url_path),
                   "host_budget": ("HostBudget",
                                   lambda u: "host page budget exhausted"),
                   "frontier_cap": ("FrontierCap",
                                    lambda u: "frontier row cap exceeded")}
            errors = pa.Table.from_pylist(
                [{"url": e["url"], "stage": e["stage"],
                  "exc_type": exc[e["stage"]][0],
                  "message": exc[e["stage"]][1](e["url"]),
                  "retryable": False, "round": e["round"]}
                 for e in res.errors],
                schema=schemas.ERRORS)
            pq.write_table(errors, os.path.join(
                GOLDEN_DIR, f"crawl_{mode}_errors.parquet"))
        print(f"crawl golden {mode}: visited={visited.num_rows} "
              f"errors={len(res.errors)}")


def gen_kmeans_golden(sf_dir: str = "/root/testdata/sf0.01",
                      k: int = 8, n_iter: int = 5) -> None:
    """Independent serial Lloyd's k-means (one full-matrix numpy loop, no
    Ray/Dataset machinery) against embeddings.kmeans_clusters' arithmetic
    contract: int64 micro-unit quantization (exact order-independent
    sums), per-centroid (x-c)^2 reductions, argmin ties -> lowest
    cluster, init = vec_ids 0..k-1, empty clusters keep their centroid."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    q = np.rint(mat * float(1 << 20)).astype(np.int64)
    order = np.argsort(ids)
    ids, q = ids[order], q[order]
    cent = q[:k].astype(np.float64)   # ids sorted => rows 0..k-1

    def assign_all(c):
        x = q.astype(np.float64)
        d2 = np.empty((len(x), k))
        for j in range(k):
            diff = x - c[j]
            d2[:, j] = np.einsum("ij,ij->i", diff, diff)
        return d2.argmin(axis=1)

    for _ in range(n_iter):
        a = assign_all(cent)
        for j in range(k):
            m = a == j
            if m.any():
                cent[j] = q[m].sum(axis=0).astype(np.float64) / m.sum()
    final = assign_all(cent)
    out = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "cluster": pa.array(final.astype(np.int64), pa.int64())})
    pq.write_table(out, os.path.join(GOLDEN_DIR, "kmeans_sf001.parquet"))
    sizes = np.bincount(final, minlength=k)
    print(f"kmeans golden: {len(ids)} vectors, cluster sizes {sizes.tolist()}")


def gen_hll_golden(sf_dir: str = "/root/testdata/sf0.01",
                   p: int = 12) -> None:
    """Independent serial HyperLogLog (per-unique-hash python
    int.bit_length ranks + a pandas groupby-max over register indices --
    none of the engine's vectorized clz / np.maximum.at path) against
    relational.hll_users_by_type.  The hash itself (pandas keyed
    siphash) is shared by necessity: it defines the sketch."""
    import pandas as pd

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_type", "user_id"])
    df = t.to_pandas()
    m = 1 << p
    rows = []
    for et, g in df.groupby("event_type", sort=True):
        hs = pd.util.hash_array(
            g["user_id"].to_numpy(np.int64)).astype(np.uint64)
        reg: dict[int, int] = {}
        for h in np.unique(hs):
            h = int(h)
            idx = h >> (64 - p)
            w = (h << p) & ((1 << 64) - 1)
            rank = min((64 - w.bit_length()) + 1, 64 - p + 1)
            reg[idx] = max(reg.get(idx, 0), rank)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        regs = np.zeros(m, np.int8)
        for i, r in reg.items():
            regs[i] = r
        e = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
        v = int(np.sum(regs == 0))
        if e <= 2.5 * m and v > 0:
            e = m * float(np.log(m / v))
        exact = g["user_id"].nunique()
        rel_err = abs(e - exact) / max(1, exact)
        rows.append((et, round(e, 4), exact, rel_err))
        assert rel_err < 0.05, (et, e, exact)
    pq.write_table(
        pa.table({"event_type": pa.array([r[0] for r in rows], pa.string()),
                  "n_users_hll": pa.array([r[1] for r in rows],
                                          pa.float64())}),
        os.path.join(GOLDEN_DIR, "hll_users_sf001.parquet"))
    print("hll golden:", [(r[0], r[1], r[2]) for r in rows])


def gen_trigram_lm_golden(sf_dir: str = SF001) -> None:
    """Independent serial trigram-LM scorer against docs.trigram_lm_scores:
    dict counting over byte slices + a per-doc python accumulation loop --
    none of the engine's unique/searchsorted/reduceat machinery.  np.log2
    on the identical (tri/big) float64 quotient in the identical
    left-to-right order makes the pre-round sums bit-identical, so the
    4dp round is cosmetic, not a tolerance."""
    from collections import Counter

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = [s.encode("utf-8", "surrogateescape")
             for s in t["text"].to_pylist()]
    tri: Counter = Counter()
    big: Counter = Counter()
    for b in texts:
        for j in range(len(b) - 2):
            tri[b[j:j + 3]] += 1
            big[b[j:j + 2]] += 1
    out = []
    for b in texts:
        n = len(b) - 2
        if n <= 0:
            out.append(0.0)
            continue
        s = 0.0
        for j in range(n):
            s += float(np.log2(tri[b[j:j + 3]] / big[b[j:j + 2]]))
        out.append(round(s / n, 4))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "lp_mean": pa.array(out, pa.float64())}),
        os.path.join(GOLDEN_DIR, "trigram_lm_sf001.parquet"))
    print("trigram lm golden:", len(out), "docs")


def gen_srp_golden(sf_dir: str = SF001, threshold: float = 0.35,
                   n_bits: int = 4, n_tables: int = 32) -> None:
    """Independent serial SRP-LSH near-dup scan against
    embeddings.srp_neardup_pairs: per-vector python loops over tables
    with plain integer dots for the sign codes (bit-identical to the
    engine's int64 matmul because integer arithmetic is exact), a dict of
    buckets, and per-pair float cosine verify -- none of the engine's
    explode/groupby machinery."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    q = np.rint(mat * float(1 << 20)).astype(np.int64)
    qn = np.rint(mat * float(1 << 20)).astype(np.int64).astype(np.float64)
    qnorm = np.linalg.norm(qn, axis=1, keepdims=True)
    qnorm[qnorm == 0] = 1.0
    nm = qn / qnorm
    n, dim = mat.shape
    rng = np.random.default_rng(7)
    planes = np.rint(rng.standard_normal((n_tables * n_bits, dim))
                     * 1024.0).astype(np.int64)
    buckets: dict = {}
    for i in range(n):
        for ti in range(n_tables):
            code = 0
            for b in range(n_bits):
                if int(np.dot(q[i], planes[ti * n_bits + b])) > 0:
                    code |= 1 << b
            buckets.setdefault((ti, code), []).append(i)
    cand = set()
    for mem in buckets.values():
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                i, j = mem[x], mem[y]
                a, b = int(ids[i]), int(ids[j])
                cand.add((i, j) if a < b else (j, i))
    pairs = sorted(
        (int(ids[i]), int(ids[j])) for i, j in cand
        if float(nm[i] @ nm[j]) > threshold)
    pq.write_table(
        pa.table({"id_a": pa.array([p[0] for p in pairs], pa.int64()),
                  "id_b": pa.array([p[1] for p in pairs], pa.int64())}),
        os.path.join(GOLDEN_DIR, "srp_neardup_sf001.parquet"))
    print("srp golden:", len(pairs), "pairs")


def _serial_pagerank(edges, n_iters=8, d_num=85, d_den=100):
    """Shared serial dict-based fixed-point PageRank core (int64
    arithmetic, scale 10**12) -- the independent reference for the
    engine's distributed join/groupby loop."""
    scale = 10**12
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    n = len(nodes)
    deg = {v: 0 for v in nodes}
    for src, _ in edges:
        deg[src] += 1
    base = ((d_den - d_num) * (scale // n)) // d_den
    rank = {v: scale // n for v in nodes}
    for _ in range(n_iters):
        share = sum(rank[v] for v in nodes if deg[v] == 0) // n
        inbox = {v: 0 for v in nodes}
        for src, dst in edges:
            inbox[dst] += rank[src] // deg[src]
        rank = {v: base + (d_num * (inbox[v] + share)) // d_den
                for v in nodes}
    return nodes, rank


def gen_pagerank_golden(sf_dir: str = SF001, n_iters: int = 8,
                        d_num: int = 85, d_den: int = 100) -> None:
    """Serial dict-based fixed-point PageRank over the per-user event
    transition graph -- deliberately NO Dataset/numpy machinery, so the
    engine's distributed join/groupby loop (pipelines/graph.py pagerank)
    is checked by an independent implementation.  All arithmetic is
    int64 fixed-point (scale 10**12), so the comparison is bit-exact."""
    scale = 10**12
    rows = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "props"]).to_pylist()
    rows.sort(key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    edges = []
    prev_user, prev_k = None, None
    for r in rows:
        k = int(re.search(r'"k": (\d+)', r["props"]).group(1))
        if r["user_id"] == prev_user:
            edges.append((prev_k, k))
        prev_user, prev_k = r["user_id"], k
    nodes, rank = _serial_pagerank(edges, n_iters, d_num, d_den)
    pq.write_table(
        pa.table({"node": pa.array(nodes, pa.int64()),
                  "rank_fp": pa.array([rank[v] for v in nodes],
                                      pa.int64())}),
        os.path.join(GOLDEN_DIR, "pagerank_sf001.parquet"))
    print("pagerank golden:", len(nodes), "nodes,", len(edges),
          "edges, mass", sum(rank.values()) / scale)


def gen_pq_golden(sf_dir: str = SF001, query_vec_id: int = 0, k: int = 10,
                  m_sub: int = 16, k_sub: int = 64, n_iter: int = 4,
                  shortlist: int = 50) -> None:
    """Independent serial product-quantization top-k (straight-line
    numpy, no Ray/Dataset machinery) against embeddings.pq_topk's
    arithmetic contract: L2-normalize rows, quantize to 2^20 micro-units
    (exact integer sums), per-subspace Lloyd's with init = vec_ids
    0..k_sub-1, per-centroid (x-c)^2 einsum reductions, argmin ties ->
    lowest, ADC scores accumulated subspace 0..m-1 left-to-right."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    nrm = np.linalg.norm(mat, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    q = np.rint(mat / nrm * float(1 << 20)).astype(np.int64)
    nmat = mat / nrm
    order = np.argsort(ids)
    ids, q, nmat = ids[order], q[order], nmat[order]
    dim = q.shape[1]
    sd = dim // m_sub
    books = np.stack([q[:k_sub, m * sd:(m + 1) * sd].astype(np.float64)
                      for m in range(m_sub)])

    def assign(m, b):
        x = q[:, m * sd:(m + 1) * sd].astype(np.float64)
        d2 = np.empty((len(x), k_sub))
        for j in range(k_sub):
            diff = x - b[m, j]
            d2[:, j] = np.einsum("ij,ij->i", diff, diff)
        return d2.argmin(axis=1)

    for _ in range(n_iter):
        prev = books.copy()
        for m in range(m_sub):
            a = assign(m, prev)
            for j in range(k_sub):
                msk = a == j
                if msk.any():
                    books[m, j] = (q[msk, m * sd:(m + 1) * sd]
                                   .sum(axis=0).astype(np.float64)
                                   / msk.sum())
    codes = np.stack([assign(m, books) for m in range(m_sub)], axis=1)
    qi = int(np.flatnonzero(ids == query_vec_id)[0])
    qv = mat[order][qi]
    qv = qv / (np.linalg.norm(qv) or 1.0)
    table = np.stack([(books[m] / float(1 << 20))
                      @ qv[m * sd:(m + 1) * sd] for m in range(m_sub)])
    s = table[0][codes[:, 0]].copy()
    for m in range(1, m_sub):
        s += table[m][codes[:, m]]
    keep = ids != query_vec_id
    sids, s = ids[keep], s[keep]
    short = sids[np.lexsort((sids, -s))[:shortlist]]
    # exact re-rank of the ADC shortlist over the RAW normalized vectors
    sel = np.isin(ids, short)
    rids = ids[sel]
    rs = nmat[sel] @ qv
    top = np.lexsort((rids, -rs))[:k]
    pq.write_table(
        pa.table({"vec_id": pa.array(rids[top], pa.int64()),
                  "score": pa.array(np.round(rs[top], 6), pa.float64())}),
        os.path.join(GOLDEN_DIR, "pq_topk_sf001.parquet"))
    print("pq golden:", rids[top].tolist())


def gen_dsir_golden(sf_dir: str = SF001, n_buckets: int = 4096,
                    target_lang: str = "en") -> None:
    """Independent serial DSIR importance weights (per-doc Python loop,
    no Dataset machinery) against docs.dsir_weights' arithmetic
    contract: pd.util.hash_array unigram buckets, +1 Laplace smoothing,
    lr = log2(((c_t+1)/(N_t+B)) / ((c_r+1)/(N_r+B))), per-doc
    np.add.reduceat segment sums / token count (the reduction primitive
    is part of the contract -- reduceat's blocked order differs from a
    scalar loop in the last ulp), 0.0 for token-less docs."""
    import pandas as pd

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text", "lang"])
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    toks = [re.findall(r"[a-z]+", (x or "").lower()) for x in texts]
    bks = [(pd.util.hash_array(np.asarray(tk, object))
            % np.uint64(n_buckets)).astype(np.int64)
           if tk else np.array([], np.int64) for tk in toks]
    cr = np.zeros(n_buckets, np.int64)
    ct = np.zeros(n_buckets, np.int64)
    for lang, b in zip(langs, bks):
        for x in b:
            cr[x] += 1
            if lang == target_lang:
                ct[x] += 1
    nr, nt = int(cr.sum()), int(ct.sum())
    pt = (ct + 1.0) / float(nt + n_buckets)
    pr = (cr + 1.0) / float(nr + n_buckets)
    lr = np.log2(pt / pr)
    out = []
    for b in bks:
        if len(b) == 0:
            out.append(0.0)
            continue
        s = np.add.reduceat(lr[b], np.array([0]))[0]
        out.append(float(s / len(b)))
    pq.write_table(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "dsir_lw": pa.array(out, pa.float64())}),
        os.path.join(GOLDEN_DIR, "dsir_sf001.parquet"))
    en = [w for w, lg in zip(out, langs) if lg == target_lang]
    rest = [w for w, lg in zip(out, langs) if lg != target_lang]
    print("dsir golden:", len(out), "docs; mean lw en",
          round(float(np.mean(en)), 3), "vs other",
          round(float(np.mean(rest)), 3))


def gen_crawl_pagerank_golden(n_iters: int = 8) -> None:
    """Serial host-PageRank over a SMALL-corpus BFS crawl: the visited
    set comes from the serial pomp-semantics oracle loop (NOT the
    distributed engine), pages are looked up in a plain dict, links are
    re-extracted with the SPEC functions (textfns -- the same public
    link/url semantics the crawl oracle trusts), edges accumulate in a
    Python loop, and the shared serial fixed-point PageRank core runs.
    Independent of the engine's Dataset join/groupby machinery end to
    end.  SMALL (20 hosts / ~1.9k visited) makes the graph non-trivial;
    TINY has only 2 hosts."""
    from pomp_ray.core.oracle import crawl_oracle
    from pomp_ray.functions.textfns import (html_extract_links,
                                            url_canonicalize, url_host,
                                            url_join)
    from pomp_ray.sources import gen_corpus
    from tests.helpers import oracle_inputs

    fix = gen_corpus.generate("/tmp/pomp_golden_small", gen_corpus.SMALL)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    res = crawl_oracle(corpus, seeds, robots, mode="bfs")
    pages = pq.read_table(fix.pages_path, columns=["url", "html"])
    html_by = {url_canonicalize(u): h
               for u, h in zip(pages["url"].to_pylist(),
                               pages["html"].to_pylist())}
    edges = []
    for v in res.visited:
        u = v["url"]
        html = html_by.get(u)
        if html is None:
            continue
        sh = url_host(u)
        for href in html_extract_links(html):
            edges.append((sh, url_host(url_join(u, href))))
    nodes, rank = _serial_pagerank(edges, n_iters)
    pq.write_table(
        pa.table({"host": pa.array(nodes, pa.string()),
                  "rank_fp": pa.array([rank[v] for v in nodes],
                                      pa.int64())}),
        os.path.join(GOLDEN_DIR, "crawl_pagerank.parquet"))
    print("crawl pagerank golden:", len(nodes), "hosts,", len(edges),
          "edges")


def gen_pack_golden(sf_dir: str = SF001, budget: int = 512,
                    n_shards: int = 16) -> None:
    """Independent serial sequence packing (plain dict/loop, no Dataset
    machinery) against docs.pack_sequences' contract: md5[:4] shard,
    md5-hex order inside the shard (tie doc_id), greedy fill with
    overflow starting a new pack, whitespace token counts."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = []
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        h = hashlib.md5(str(d).encode()).hexdigest()
        shard = int(h[:4], 16) % n_shards
        ntok = len(re.findall(r"\S+", x or ""))
        rows.append((shard, h, d, ntok))
    out = []
    for shard in range(n_shards):
        mine = sorted(r for r in rows if r[0] == shard)
        pid, fill = -1, 0
        for _, _, d, n in mine:
            if pid < 0 or fill + n > budget:
                pid += 1
                fill = 0
            fill += n
            out.append((d, shard, shard * (1 << 32) + pid, n))
    out.sort()
    pq.write_table(
        pa.table({"doc_id": pa.array([o[0] for o in out], pa.int64()),
                  "shard": pa.array([o[1] for o in out], pa.int64()),
                  "pack_id": pa.array([o[2] for o in out], pa.int64()),
                  "n_tokens": pa.array([o[3] for o in out], pa.int64())}),
        os.path.join(GOLDEN_DIR, "pack_sequences_sf001.parquet"))
    n_packs = len({o[2] for o in out})
    tot = sum(o[3] for o in out)
    print("pack golden:", len(out), "docs ->", n_packs, "packs, fill",
          round(tot / (n_packs * budget), 3))


def gen_cms_golden(sf_dir: str = SF001, k: int = 20) -> None:
    """Independent serial count-min sketch (Counter + per-word md5
    positions, no Dataset machinery) against docs.cms_word_counts'
    contract: 4 x 4096 int64 counters, positions = 4 LE-uint32 md5
    chunks mod w, estimate = min over rows, reported for the exact
    top-k words (count desc, word asc ties)."""
    import collections

    d, w = 4, 4096
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    cnt = collections.Counter()
    for x in t["text"].to_pylist():
        cnt.update(re.findall(r"[a-z]+", (x or "").lower()))
    sketch = np.zeros((d, w), np.int64)
    pos = {}
    for word, n in cnt.items():
        p = np.frombuffer(hashlib.md5(word.encode()).digest(),
                          np.uint32) % np.uint32(w)
        pos[word] = p
        sketch[np.arange(d), p] += n
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    words = [wd for wd, _ in top]
    ests = [int(sketch[np.arange(d), pos[wd]].min()) for wd in words]
    pq.write_table(
        pa.table({"word": pa.array(words, pa.string()),
                  "n_est": pa.array(ests, pa.int64())}),
        os.path.join(GOLDEN_DIR, "cms_sf001.parquet"))
    over = [e - n for e, (_, n) in zip(ests, top)]
    print("cms golden:", k, "words, overestimates", over[:5], "...")


def gen_bloom_decon_golden(sf_dir: str = SF001, bench_mod: int = 97,
                           m: int = 1 << 20, k_hash: int = 4) -> None:
    """Independent serial Bloom decontamination (straight-line numpy +
    per-token md5, no Dataset machinery, no engine hash cache) against
    docs.decontaminate_bloom's spec: \\S+ lowercase tokens, md5[:8] LE
    token hashes, rolling-polynomial 5-shingle hashes (prime
    1099511628211, uint64 wrap, k = len when shorter), unique per doc,
    Kirsch-Mitzenmacher double-hash slots, byte-per-slot filter."""
    prime = np.uint64(1099511628211)

    def shingles(text: str) -> np.ndarray:
        toks = re.findall(r"\S+", (text or "").lower())
        if not toks:
            return np.empty(0, np.uint64)
        th = np.array([int.from_bytes(hashlib.md5(w.encode()).digest()[:8],
                                      "little") for w in toks], np.uint64)
        k = min(5, len(th))
        n = len(th) - k + 1
        sh = np.zeros(n, np.uint64)
        for j in range(k):
            sh = sh * prime + th[j:n + j]
        return np.unique(sh)

    def positions(h: np.ndarray) -> np.ndarray:
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = (h >> np.uint64(32)) | np.uint64(1)
        i = np.arange(k_hash, dtype=np.uint64)
        return ((h1[:, None] + i[None, :] * h2[:, None])
                & np.uint64(m - 1)).astype(np.int64)

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    bloom = np.zeros(m, np.uint8)
    for d, x in zip(ids, texts):
        if d % bench_mod == 0:
            sh = shingles(x)
            if len(sh):
                bloom[positions(sh).ravel()] = 1
    clean = []
    for d, x in zip(ids, texts):
        if d % bench_mod == 0:
            continue
        sh = shingles(x)
        if len(sh) and bloom[positions(sh)].all(axis=1).any():
            continue
        clean.append(d)
    clean.sort()
    pq.write_table(
        pa.table({"doc_id": pa.array(clean, pa.int64())}),
        os.path.join(GOLDEN_DIR, "bloom_decon_sf001.parquet"))
    print("bloom decon golden:", len(clean), "clean docs of", len(ids))


def gen_bpe_golden(sf_dir: str = SF001, n_merges: int = 24,
                   min_count: int = 2) -> None:
    """Serial Counter-based BPE merge learning (Sennrich-style), the
    independent oracle for pipelines/tokenizer.py: word freqs via a
    plain re.findall Counter, pair counts via a per-word Python loop,
    max-count/lexicographic tie-break, left-to-right non-overlapping
    merge.  Integer counts make the comparison exact."""
    import collections

    texts = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["text"])["text"].to_pylist()
    wf = collections.Counter()
    for x in texts:
        wf.update(re.findall(r"[a-z]+", (x or "").lower()))
    syms = {w: tuple(list(w) + ["</w>"]) for w in wf}
    out = []
    for rank in range(n_merges):
        pairs = collections.Counter()
        for w, n in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        (left, right), n = sorted(
            pairs.items(), key=lambda kv: (-kv[1],
                                           kv[0][0] + " " + kv[0][1]))[0]
        if n < min_count:
            break
        out.append((rank, left, right, n))
        for w in syms:
            s = syms[w]
            if left in s and right in s:
                new, i = [], 0
                while i < len(s):
                    if (s[i] == left and i + 1 < len(s)
                            and s[i + 1] == right):
                        new.append(left + right)
                        i += 2
                    else:
                        new.append(s[i])
                        i += 1
                syms[w] = tuple(new)
    pq.write_table(
        pa.table({"rank": pa.array([o[0] for o in out], pa.int64()),
                  "left": pa.array([o[1] for o in out], pa.string()),
                  "right": pa.array([o[2] for o in out], pa.string()),
                  "n": pa.array([o[3] for o in out], pa.int64())}),
        os.path.join(GOLDEN_DIR, "bpe_merges_sf001.parquet"))
    print("bpe golden:", len(out), "merges, first",
          out[0] if out else None)



def gen_semdedup_golden(sf_dir: str = SF001, k: int = 8, n_iter: int = 5,
                        threshold: float = 0.35) -> None:
    """Independent serial SemDeDup (full-matrix numpy, dict union-find,
    no Dataset machinery) against embeddings.semdedup's contract: the
    gen_kmeans_golden serial k-means for clusters, row-normalized
    embeddings, per-cluster all-pairs cosine on the vec_id-sorted
    cluster matrix (same-BLAS convention), connected components over
    sims > threshold, keeper = smallest vec_id per component."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    q = np.rint(mat * float(1 << 20)).astype(np.int64)
    order = np.argsort(ids)
    ids, mat, q = ids[order], mat[order], q[order]
    cent = q[:k].astype(np.float64)

    def assign_all(c):
        x = q.astype(np.float64)
        d2 = np.empty((len(x), k))
        for j in range(k):
            diff = x - c[j]
            d2[:, j] = np.einsum("ij,ij->i", diff, diff)
        return d2.argmin(axis=1)

    for _ in range(n_iter):
        a = assign_all(cent)
        for j in range(k):
            m = a == j
            if m.any():
                cent[j] = q[m].sum(axis=0).astype(np.float64) / m.sum()
    final = assign_all(cent)

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    nm = mat / norms
    keep = np.zeros(len(ids), bool)
    for cl in range(k):
        sel = np.flatnonzero(final == cl)   # ids sorted globally
        if len(sel) == 0:
            continue
        sub = nm[sel]
        sims = sub @ sub.T
        n = len(sel)
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        ai, bj = np.nonzero(np.triu(sims > threshold, 1))
        for a, b in zip(ai, bj):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        for i in range(n):
            if find(i) == i:
                keep[sel[i]] = True
    out_order = np.argsort(ids)
    pq.write_table(
        pa.table({"vec_id": pa.array(ids[out_order], pa.int64()),
                  "cluster": pa.array(final[out_order].astype(np.int64),
                                      pa.int64()),
                  "keep": pa.array(keep[out_order], pa.bool_())}),
        os.path.join(GOLDEN_DIR, "semdedup_sf001.parquet"))
    print("semdedup golden:", len(ids), "vectors,", int(keep.sum()),
          "kept,", k, "clusters")



def gen_bpe_encode_golden(sf_dir: str = SF001, n_merges: int = 24,
                          min_count: int = 2) -> None:
    """Independent serial BPE ENCODE golden (plain Counter/loop, no
    Dataset machinery): re-learns the merge table exactly as
    gen_bpe_golden, then counts each doc's subword tokens as the sum of
    len(final symbol tuple) over its [a-z]+ lowercase tokens."""
    import collections

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    wf = collections.Counter()
    for x in texts:
        wf.update(re.findall(r"[a-z]+", (x or "").lower()))
    syms = {w: tuple(list(w) + ["</w>"]) for w in wf}
    for _rank in range(n_merges):
        pairs = collections.Counter()
        for w, n in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        (left, right), n = sorted(
            pairs.items(), key=lambda kv: (-kv[1],
                                           kv[0][0] + " " + kv[0][1]))[0]
        if n < min_count:
            break
        for w in syms:
            s = syms[w]
            if left in s and right in s:
                new, i = [], 0
                while i < len(s):
                    if (s[i] == left and i + 1 < len(s)
                            and s[i + 1] == right):
                        new.append(left + right)
                        i += 2
                    else:
                        new.append(s[i])
                        i += 1
                syms[w] = tuple(new)
    counts = []
    for x in texts:
        counts.append(sum(len(syms[w]) for w in
                          re.findall(r"[a-z]+", (x or "").lower())))
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "n_tokens_bpe": pa.array(counts, pa.int64())}),
        os.path.join(GOLDEN_DIR, "bpe_encode_sf001.parquet"))
    print("bpe encode golden:", len(ids), "docs, mean",
          round(sum(counts) / len(counts), 2), "subtokens")


def gen_lsq_classifier_golden(sf_dir: str = "/root/testdata/sf0.01") -> None:
    """Independent serial least-squares classifier vs
    pipelines/classify.py: features via Python string ops (len,
    re.findall, str.count -- not Arrow kernels), sufficient statistics
    accumulated in PLAIN PYTHON INTS per doc (not numpy matmul), the
    same pinned np.linalg.solve contract, predictions via per-row
    Python float dot (not a batch matmul)."""
    import re as _re

    from pomp_ray.pipelines.classify import (
        FEATURE_CHARS,
        FEATURES,
        TEACHER_A,
        TEACHER_CHARS,
    )

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    k = len(FEATURES)
    xtx = [[0] * k for _ in range(k)]
    xty = [0] * k
    rows = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        x = [1, len(text), len(_re.findall(r"\S+", text))] + \
            [text.count(c) for c in FEATURE_CHARS]
        y = 1 if 2 * (TEACHER_A * x[3] - TEACHER_CHARS * x[1]) + 1 > 0 else -1
        for i in range(k):
            xi = x[i]
            xty[i] += xi * y
            row = xtx[i]
            for j in range(k):
                row[j] += xi * x[j]
        rows.append((doc_id, x, y))
    w = np.linalg.solve(np.array(xtx, np.float64), np.array(xty, np.float64))
    pq.write_table(
        pa.table({"feature": pa.array(list(FEATURES), pa.string()),
                  "weight": pa.array([float(v) for v in w], pa.float64())}),
        os.path.join(GOLDEN_DIR, "lsq_classifier_weights_sf001.parquet"))
    preds, labels, ids = [], [], []
    for doc_id, x, y in rows:
        m = float(np.dot(np.asarray(x, np.float64), w))
        ids.append(doc_id)
        preds.append(m > 0.0)
        labels.append(y > 0)
    acc = sum(p == l for p, l in zip(preds, labels)) / len(preds)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "pred": pa.array(preds, pa.bool_()),
                  "label": pa.array(labels, pa.bool_())}),
        os.path.join(GOLDEN_DIR, "lsq_classifier_scores_sf001.parquet"))
    print(f"lsq classifier golden: {len(preds)} docs, train acc {acc:.3f}")



def gen_pca_golden(sf_dir: str = SF001, k: int = 2) -> None:
    """Independent serial PCA against embeddings.embedding_pca's pinned
    arithmetic contract: int64 micro-unit Gram/sums (one full-matrix
    numpy pass, no Dataset machinery), covariance via the same fixed
    double expression, np.linalg.eigh, peak-weight-positive sign rule,
    int64-requantized components, exact integer projections centered by
    sWq/n."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    scale1 = float(1 << 20)
    q = np.rint(mat * scale1).astype(np.int64)
    n = len(q)
    G = q.T @ q
    s = q.sum(axis=0)
    mu = s / n
    cov = (G / n - np.outer(mu, mu)) / (scale1 * scale1)
    w, v = np.linalg.eigh(cov)
    comp = v[:, ::-1][:, :k]
    for c in range(k):
        p = int(np.abs(comp[:, c]).argmax())
        if comp[p, c] < 0:
            comp[:, c] = -comp[:, c]
    Wq = np.rint(comp * scale1).astype(np.int64)
    sWq = s @ Wq
    sc = (q @ Wq - sWq / n) / (scale1 * scale1)
    cols = {"vec_id": pa.array(ids, pa.int64())}
    for c in range(k):
        cols[f"pc{c + 1}"] = pa.array(sc[:, c], pa.float64())
    pq.write_table(pa.table(cols),
                   os.path.join(GOLDEN_DIR, "pca_sf001.parquet"))
    var = w[::-1][:k] / w.sum()
    print(f"pca golden: {n} vectors, top-{k} explained {var.round(3)}")



def gen_anchor_golden() -> None:
    """Independent serial anchor-text index over the SMALL corpus:
    anchors parsed by STRING SPLITTING (no regex shared with the
    engine), resolved with the shared pure url scalars, aggregated in
    one dict walk."""
    from pomp_ray.functions.textfns import url_canonicalize, url_join
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_small",
                              gen_corpus.SMALL)
    t = pq.read_table(fix.pages_path, columns=["url", "html"])
    counts: dict[str, int] = {}
    terms: dict[str, set] = {}
    for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        doc = html.decode("utf-8")
        for seg in doc.split('<a href="')[1:]:
            href, rest = seg.split('"', 1)
            word = rest[rest.index(">") + 1:rest.index("</a>")]
            tgt = url_canonicalize(url_join(url, href))
            counts[tgt] = counts.get(tgt, 0) + 1
            terms.setdefault(tgt, set()).add(word)
    tgts = sorted(counts)
    out = pa.table({
        "target": pa.array(tgts, pa.string()),
        "n_anchors": pa.array([counts[k] for k in tgts], pa.int64()),
        "terms": pa.array([" ".join(sorted(terms[k])) for k in tgts],
                          pa.string()),
    })
    pq.write_table(out, os.path.join(GOLDEN_DIR,
                                     "anchor_texts_small.parquet"))
    print(f"anchor golden: {len(tgts)} targets, "
          f"{sum(counts.values())} anchors")



def gen_hits_golden(n_iters: int = 6) -> None:
    """Independent serial HITS over the SMALL corpus host graph: edges
    re-extracted with the shared pure scalars, scores as plain Python
    int dicts with the same integer renormalization contract
    (x // max(1, S // 10**7))."""
    from pomp_ray.functions.textfns import (html_extract_links, url_host,
                                            url_join)
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_small",
                              gen_corpus.SMALL)
    t = pq.read_table(fix.pages_path, columns=["url", "html"])
    edges = []
    for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        h = url_host(url)
        for href in html_extract_links(html.decode("utf-8")):
            edges.append((h, url_host(url_join(url, href))))
    nodes = sorted({n for e in edges for n in e})
    SCALE = 10**7
    hub = {n: SCALE for n in nodes}
    auth = {n: SCALE for n in nodes}

    def half(src_scores, src_key):
        out = {n: 0 for n in nodes}
        for s, d in edges:
            if src_key == "src":
                out[d] += src_scores[s]
            else:
                out[s] += src_scores[d]
        div = max(1, sum(out.values()) // SCALE)
        return {n: v // div for n, v in out.items()}

    for _ in range(n_iters):
        auth = half(hub, "src")
        hub = half(auth, "dst")
    out = pa.table({
        "node": pa.array(nodes, pa.string()),
        "hub_fp": pa.array([hub[n] for n in nodes], pa.int64()),
        "auth_fp": pa.array([auth[n] for n in nodes], pa.int64()),
    })
    pq.write_table(out, os.path.join(GOLDEN_DIR, "hits_small.parquet"))
    top = max(nodes, key=lambda n: auth[n])
    print(f"hits golden: {len(nodes)} hosts, top authority {top}")



def gen_compression_golden(sf_dir: str = SF001, level: int = 6) -> None:
    """Independent serial zlib counters for docs.compression_stats
    (same pinned zlib level; plain Python loop, no Dataset/arrow
    machinery)."""
    import zlib

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids, nb, ncp, flag = [], [], [], []
    for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        b = s.encode("utf-8")
        c = zlib.compress(b, level)
        ids.append(d)
        nb.append(len(b))
        ncp.append(len(c))
        flag.append(2 * len(c) < len(b))
    out = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "n_bytes": pa.array(nb, pa.int64()),
                    "n_comp": pa.array(ncp, pa.int64()),
                    "too_compressible": pa.array(flag, pa.bool_())})
    pq.write_table(out, os.path.join(GOLDEN_DIR,
                                     "compression_sf001.parquet"))
    print(f"compression golden: {len(ids)} docs, "
          f"{sum(flag)} too-compressible")



def gen_quantized_golden(sf_dir: str = SF001) -> None:
    """Independent serial int8 quantizer mirroring
    embeddings.quantized_embeddings' elementwise expressions."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    out_ids, scales, qvecs = [], [], []
    for i in range(len(ids)):
        row = mat[i]
        m = float(np.abs(row).max()) or 1.0
        q = np.rint(row * (127.0 / m)).astype(np.int8)
        out_ids.append(int(ids[i]))
        scales.append(m / 127.0)
        qvecs.append(q)
    out = pa.table({
        "vec_id": pa.array(out_ids, pa.int64()),
        "scale": pa.array(scales, pa.float64()),
        "qhex": pa.array([q.astype(np.uint8).tobytes().hex()
                          for q in qvecs], pa.string()),
    })
    pq.write_table(out, os.path.join(GOLDEN_DIR, "quantized_sf001.parquet"))
    print(f"quantized golden: {len(out_ids)} vectors")



def gen_sq8_golden(sf_dir: str = SF001, query_vec_id: int = 0,
                   k: int = 10, shortlist_mult: int = 4) -> None:
    """Independent serial SQ8 top-k mirroring embeddings.sq8_topk's
    pinned arithmetic (single full-matrix pass, no Dataset code)."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.array(t["embedding"].to_pylist(), np.float64)
    qx = mat[list(ids).index(query_vec_id)]
    qmax = float(np.abs(qx).max()) or 1.0
    qq = np.rint(qx * (127.0 / qmax)).astype(np.int8)
    sq = qmax / 127.0
    qn = qx / (np.linalg.norm(qx) or 1.0)
    maxabs = np.abs(mat).max(axis=1)
    maxabs[maxabs == 0] = 1.0
    codes = np.rint(mat * (127.0 / maxabs)[:, None]).astype(np.int8)
    idot = codes.astype(np.int32) @ qq.astype(np.int32)
    approx = idot * ((maxabs / 127.0) * sq)
    keep = ids != query_vec_id
    ids2, approx2, mat2 = ids[keep], approx[keep], mat[keep]
    short = k * shortlist_mult
    order = np.lexsort((ids2, -approx2))[:short]
    ids3 = ids2[order]
    m3 = mat2[order]
    n = np.linalg.norm(m3, axis=1, keepdims=True)
    n[n == 0] = 1.0
    exact = (m3 / n) @ qn
    fin = np.lexsort((ids3, -exact))[:k]
    out = pa.table({"vec_id": pa.array(ids3[fin], pa.int64()),
                    "score": pa.array(np.round(exact[fin], 6),
                                      pa.float64())})
    pq.write_table(out, os.path.join(GOLDEN_DIR, "sq8_topk_sf001.parquet"))
    print(f"sq8 golden: top-{k} ids {ids3[fin].tolist()}")



def gen_two_hop_golden() -> None:
    """Independent serial 2-hop reach over the SMALL corpus host graph
    (set-of-sets walk, no Dataset code)."""
    from pomp_ray.functions.textfns import (html_extract_links, url_host,
                                            url_join)
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_small",
                              gen_corpus.SMALL)
    t = pq.read_table(fix.pages_path, columns=["url", "html"])
    adj: dict[str, set] = {}
    for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        h = url_host(url)
        for href in html_extract_links(html.decode("utf-8")):
            adj.setdefault(h, set()).add(url_host(url_join(url, href)))
    reach = {}
    for v, mids in adj.items():
        out = set()
        for u in mids:
            out |= adj.get(u, set())
        if out:
            reach[v] = len(out)
    hosts = sorted(reach)
    pq.write_table(pa.table({
        "host": pa.array(hosts, pa.string()),
        "reach2": pa.array([reach[h] for h in hosts], pa.int64())}),
        os.path.join(GOLDEN_DIR, "two_hop_small.parquet"))
    print(f"two-hop golden: {len(hosts)} hosts, "
          f"max reach {max(reach.values())}")



def gen_weighted_sample_golden(sf_dir: str = SF001, k: int = 50) -> None:
    """Independent serial A-ES sample mirroring docs.weighted_sample's
    pinned float expression."""
    import re

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    rows = []
    for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        w = max(1.0, float(len(re.findall(r"\S+", s))))
        u = max(int(hashlib.md5(f"ws:{d}".encode()).hexdigest()[:12], 16)
                / float(1 << 48), 1e-15)
        rows.append((np.log(u) / w, d, int(w)))
    rows.sort(key=lambda r: (-r[0], r[1]))
    rows = rows[:k]
    pq.write_table(pa.table({
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "weight": pa.array([r[2] for r in rows], pa.int64()),
        "key": pa.array([r[0] for r in rows], pa.float64())}),
        os.path.join(GOLDEN_DIR, "weighted_sample_sf001.parquet"))
    print(f"weighted sample golden: top-{k}, first doc {rows[0][1]}")


def gen_kcenter_golden(sf_dir: str = SF001, k: int = 8) -> None:
    """Independent serial greedy k-center over the 2^20-quantized
    embeddings: plain python loop + per-row integer dot (no einsum, no
    lexsort -- a different argmax/tie implementation than the engine)."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = [int(x) for x in t["vec_id"].to_pylist()]
    mat = [np.rint(np.asarray(v, np.float64) * float(1 << 20))
           .astype(np.int64) for v in t["embedding"].to_pylist()]
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    seed_pos = order[0]
    chosen = [seed_pos]
    rows = [(0, ids[seed_pos], 0)]
    dmin = [None] * len(ids)
    for i in range(len(ids)):
        diff = mat[i] - mat[seed_pos]
        dmin[i] = int((diff * diff).sum())
    for step in range(1, k):
        best_i, best_d = None, -1
        for i in range(len(ids)):
            if i in chosen:
                continue
            if dmin[i] > best_d or (dmin[i] == best_d
                                    and ids[i] < ids[best_i]):
                best_i, best_d = i, dmin[i]
        chosen.append(best_i)
        rows.append((step, ids[best_i], best_d))
        for i in range(len(ids)):
            diff = mat[i] - mat[best_i]
            d = int((diff * diff).sum())
            if d < dmin[i]:
                dmin[i] = d
    out = pa.table({
        "sel_order": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "d2": pa.array([r[2] for r in rows], pa.int64())})
    pq.write_table(out, os.path.join(GOLDEN_DIR, "kcenter_sf001.parquet"))
    print("kcenter golden:", rows)



def gen_redirect_goldens() -> None:
    """BFS crawl goldens over the REDIR corpus (redirect chains, loop
    pages): serial oracle output, hash-compared against the engine by
    the driver's gate."""
    from pomp_ray import schemas
    from pomp_ray.core.oracle import crawl_oracle
    from pomp_ray.functions.textfns import url_path
    from pomp_ray.sources import gen_corpus
    from tests.helpers import oracle_inputs

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_redir",
                              gen_corpus.REDIR)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    res = crawl_oracle(corpus, seeds, robots, mode="bfs")
    visited = pa.Table.from_pylist(res.visited, schema=schemas.VISITED)
    pq.write_table(visited, os.path.join(
        GOLDEN_DIR, "crawl_redirect_visited.parquet"))
    exc = {"fetch": ("FetchMiss", lambda u: "not in corpus"),
           "robots": ("RobotsDisallowed", url_path)}
    errors = pa.Table.from_pylist(
        [{"url": e["url"], "stage": e["stage"],
          "exc_type": exc[e["stage"]][0],
          "message": exc[e["stage"]][1](e["url"]),
          "retryable": False, "round": e["round"]}
         for e in res.errors],
        schema=schemas.ERRORS)
    pq.write_table(errors, os.path.join(
        GOLDEN_DIR, "crawl_redirect_errors.parquet"))
    print(f"redirect goldens: visited={visited.num_rows} "
          f"errors={errors.num_rows}")


def gen_samehost_golden() -> None:
    """Stay-on-site BFS over the SMALL corpus (20 hosts, 5% cross-host
    links): on TINY the visited table is identical to plain BFS (every
    cross-host link hits an already-seen root), so the distinguishing
    golden uses SMALL, where dropping cross-host candidates changes both
    the set (1904 vs 1907) and seq assignment."""
    from pomp_ray import schemas
    from pomp_ray.core.oracle import crawl_oracle
    from pomp_ray.sources import gen_corpus
    from tests.helpers import oracle_inputs

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_small",
                              gen_corpus.SMALL)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    res = crawl_oracle(corpus, seeds, robots, mode="bfs",
                       same_host_only=True)
    visited = pa.Table.from_pylist(res.visited, schema=schemas.VISITED)
    pq.write_table(visited, os.path.join(
        GOLDEN_DIR, "crawl_samehost_visited.parquet"))
    print(f"samehost golden: visited={visited.num_rows}")


def gen_breaker_golden() -> None:
    """Fetch-error circuit-breaker BFS over the SMALL corpus (its ~2%
    dead links trip hosts at 2 errors; TINY has too few misses to
    distinguish the golden from plain BFS)."""
    from pomp_ray import schemas
    from pomp_ray.core.oracle import crawl_oracle
    from pomp_ray.sources import gen_corpus
    from tests.helpers import oracle_inputs

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_small",
                              gen_corpus.SMALL)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    res = crawl_oracle(corpus, seeds, robots, mode="bfs",
                       max_errors_per_host=2)
    visited = pa.Table.from_pylist(res.visited, schema=schemas.VISITED)
    pq.write_table(visited, os.path.join(
        GOLDEN_DIR, "crawl_breaker_visited.parquet"))
    from pomp_ray.functions.textfns import url_path
    exc = {"fetch": ("FetchMiss", lambda u: "not in corpus"),
           "robots": ("RobotsDisallowed", url_path),
           "host_budget": ("HostBudget",
                           lambda u: "host page budget exhausted")}
    errors = pa.Table.from_pylist(
        [{"url": e["url"], "stage": e["stage"],
          "exc_type": exc[e["stage"]][0],
          "message": exc[e["stage"]][1](e["url"]),
          "retryable": False, "round": e["round"]}
         for e in res.errors],
        schema=schemas.ERRORS)
    pq.write_table(errors, os.path.join(
        GOLDEN_DIR, "crawl_breaker_errors.parquet"))
    print(f"breaker golden: visited={visited.num_rows} "
          f"errors={errors.num_rows}")


def gen_dedup_crawl_goldens() -> None:
    """BFS content-dedup crawl goldens over the TRAP corpus (the
    calendar trap: 120 urls, one text): serial oracle with
    dedup_content=True -- the dedup gate must stop the trap after
    /cal/0 + /cal/1 without any robots rule."""
    from pomp_ray import schemas
    from pomp_ray.core.oracle import crawl_oracle
    from pomp_ray.functions.textfns import url_path
    from pomp_ray.sources import gen_corpus
    from tests.helpers import oracle_inputs

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_trap",
                              gen_corpus.TRAP)
    corpus, seeds, robots, _ = oracle_inputs(fix)
    res = crawl_oracle(corpus, seeds, robots, mode="bfs",
                       dedup_content=True)
    visited = pa.Table.from_pylist(res.visited, schema=schemas.VISITED)
    pq.write_table(visited, os.path.join(
        GOLDEN_DIR, "crawl_dedup_visited.parquet"))
    exc = {"fetch": ("FetchMiss", lambda u: "not in corpus"),
           "robots": ("RobotsDisallowed", url_path)}
    errors = pa.Table.from_pylist(
        [{"url": e["url"], "stage": e["stage"],
          "exc_type": exc[e["stage"]][0],
          "message": exc[e["stage"]][1](e["url"]),
          "retryable": False, "round": e["round"]}
         for e in res.errors],
        schema=schemas.ERRORS)
    pq.write_table(errors, os.path.join(
        GOLDEN_DIR, "crawl_dedup_errors.parquet"))
    n_cal = sum("/cal/" in v["url"] for v in res.visited)
    print(f"dedup crawl goldens: visited={visited.num_rows} "
          f"errors={errors.num_rows} cal_pages={n_cal}")


def gen_redirect_map_golden() -> None:
    """redirect_map golden: an independent SERIAL resolver -- regex
    target extraction over the raw corpus html (not fetch.py's prefix
    parser), dict-chained hops, set membership -- over the REDIR
    corpus."""
    import re as _re

    from pomp_ray.functions.textfns import url_canonicalize, url_join
    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_redir",
                              gen_corpus.REDIR)
    pages = pq.read_table(fix.pages_path, columns=["url", "html"])
    pat = _re.compile(
        rb'^<html><head><meta http-equiv="refresh" content="0;url=([^"]*)"')
    edge: dict[str, str] = {}
    all_urls: set[str] = set()
    for url, html in zip(pages["url"].to_pylist(),
                         pages["html"].to_pylist()):
        all_urls.add(url)
        m = pat.match(html or b"")
        if m:
            edge[url] = url_canonicalize(
                url_join(url, m.group(1).decode("utf-8", "replace")))
    rows = []
    for url in sorted(edge):
        tgt, hops = edge[url], 1
        while hops < 3 and tgt in edge:
            tgt = edge[tgt]
            hops += 1
        if tgt in edge:     # still a redirect after the cap: unresolved
            rows.append({"url": url, "final_url": None, "n_hops": hops,
                         "ok": False})
        else:
            rows.append({"url": url, "final_url": tgt, "n_hops": hops,
                         "ok": tgt in all_urls})
    tbl = pa.Table.from_pylist(rows, schema=pa.schema(
        [("url", pa.string()), ("final_url", pa.string()),
         ("n_hops", pa.int64()), ("ok", pa.bool_())]))
    pq.write_table(tbl, os.path.join(GOLDEN_DIR, "redirect_map.parquet"))
    print(f"redirect_map golden: {tbl.num_rows} rows")


def gen_broken_links_golden() -> None:
    """broken_links golden over the SMALL corpus: independent serial
    impl -- its own href regex + stdlib urljoin (not textfns) -- per-host
    distinct targets and corpus-membership misses."""
    import re as _re
    from urllib.parse import urljoin, urlparse

    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_small",
                              gen_corpus.SMALL)
    pages = pq.read_table(fix.pages_path, columns=["url", "html"])
    urls = set(pages["url"].to_pylist())
    href = _re.compile(rb'<a href="([^"]*)"')
    seen: set[tuple[str, str]] = set()
    for url, html in zip(pages["url"].to_pylist(),
                         pages["html"].to_pylist()):
        host = urlparse(url).netloc
        for m in href.finditer(html or b""):
            tgt = urljoin(url, m.group(1).decode("utf-8", "replace"))
            seen.add((host, tgt))
    agg: dict[str, list[int]] = {}
    for host, tgt in seen:
        a = agg.setdefault(host, [0, 0])
        a[0] += 1
        a[1] += tgt not in urls
    rows = sorted(agg.items())
    tbl = pa.table({
        "host": pa.array([r[0] for r in rows], pa.string()),
        "n_targets": pa.array([r[1][0] for r in rows], pa.int64()),
        "n_broken": pa.array([r[1][1] for r in rows], pa.int64())})
    pq.write_table(tbl, os.path.join(GOLDEN_DIR, "broken_links.parquet"))
    print(f"broken_links golden: {tbl.num_rows} hosts, "
          f"{sum(r[1][1] for r in rows)} broken")


def gen_kcore_golden() -> None:
    """host_core_numbers golden over the MIRROR corpus: independent
    serial peeler -- its own href regex + urlparse host extraction and a
    plain dict/set k-core algorithm (Batagelj-Zaversnik-style repeated
    peeling), none of the engine's code paths."""
    import re as _re
    from urllib.parse import urljoin, urlparse

    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_mirror",
                              gen_corpus.MIRROR)
    pages = pq.read_table(fix.pages_path, columns=["url", "html"])
    href = _re.compile(rb'<a href="([^"]*)"')
    adj: dict[str, set[str]] = {}
    for url, html in zip(pages["url"].to_pylist(),
                         pages["html"].to_pylist()):
        host = urlparse(url).netloc.lower()
        for m in href.finditer(html or b""):
            tgt = urljoin(url, m.group(1).decode("utf-8", "replace"))
            th = urlparse(tgt).netloc.lower()
            if th and th != host:
                adj.setdefault(host, set()).add(th)
                adj.setdefault(th, set()).add(host)
    core: dict[str, int] = {}
    k = 1
    alive = {h: set(n) for h, n in adj.items()}
    while alive:
        changed = True
        while changed:
            low = [h for h, n in alive.items() if len(n) < k]
            changed = bool(low)
            for h in low:
                core[h] = k - 1
                for n in alive[h]:
                    alive[n].discard(h)
                del alive[h]
        for h in alive:
            core[h] = k
        k += 1
    hosts = sorted(core)
    tbl = pa.table({
        "host": pa.array(hosts, pa.string()),
        "core": pa.array([core[h] for h in hosts], pa.int64())})
    pq.write_table(tbl, os.path.join(GOLDEN_DIR, "kcore_mirror.parquet"))
    print(f"kcore golden: {tbl.num_rows} hosts, max core "
          f"{max(core.values()) if core else 0}")




def indep_winnow_fps(bs: bytes, k: int = 8, w: int = 4) -> set:
    """Char-at-a-time Horner rolling hash + per-window min -- the
    independent mirror of analysis.winnow_doc_fps (which uses a
    vectorized power-vector dot; both are the same polynomial mod
    2^64)."""
    m = (1 << 64) - 1
    hs = []
    for i in range(len(bs) - k + 1):
        h = 0
        for j in range(k):
            h = (h * 1099511628211 + bs[i + j]) & m
        hs.append(h)
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}


def gen_winnow_goldens(sf_dir: str = SF001, max_df: int = 10,
                       min_shared: int = 2) -> None:
    """winnow_fingerprints + winnow_dup_pairs goldens at sf0.01."""
    import itertools

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    fps = {i: indep_winnow_fps((s or "").encode())
           for i, s in zip(ids, texts)}

    n_fp, xors = [], []
    for i in ids:
        x = 0
        for f in fps[i]:
            x ^= f
        n_fp.append(len(fps[i]))
        xors.append(format(x, "016x"))
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_fp": pa.array(n_fp, pa.int64()),
        "fp_xor": pa.array(xors, pa.string())}),
        os.path.join(GOLDEN_DIR, "winnow_fps_sf001.parquet"))

    df: dict = {}
    for i in ids:
        for f in fps[i]:
            df.setdefault(f, []).append(i)
    shared: dict = {}
    for f, docs in df.items():
        if 2 <= len(docs) <= max_df:
            for a, b in itertools.combinations(sorted(docs), 2):
                shared[(a, b)] = shared.get((a, b), 0) + 1
    pairs = sorted(p for p, n in shared.items() if n >= min_shared)
    pq.write_table(pa.table({
        "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
        "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
        "n_shared": pa.array([shared[p] for p in pairs], pa.int64())}),
        os.path.join(GOLDEN_DIR, "winnow_pairs_sf001.parquet"))




def gen_scc_golden() -> None:
    """host_scc golden over the MIRROR corpus: independent serial
    ITERATIVE Tarjan over the directed foreign-host graph -- own href
    regex + urlparse extraction (the kcore golden's), none of the
    engine's coloring machinery.  SCC id = min member (matches the
    engine's min-color pivot labels)."""
    import re as _re
    from urllib.parse import urljoin, urlparse

    from pomp_ray.sources import gen_corpus

    fix = gen_corpus.generate("/tmp/pomp_golden_corpus_mirror",
                              gen_corpus.MIRROR)
    pages = pq.read_table(fix.pages_path, columns=["url", "html"])
    href = _re.compile(rb'<a href="([^"]*)"')
    adj: dict[str, set] = {}
    for url, html in zip(pages["url"].to_pylist(),
                         pages["html"].to_pylist()):
        host = urlparse(url).netloc.lower()
        for m in href.finditer(html or b""):
            tgt = urljoin(url, m.group(1).decode("utf-8", "replace"))
            th = urlparse(tgt).netloc.lower()
            if th and th != host:
                adj.setdefault(host, set()).add(th)
                adj.setdefault(th, set())
    # iterative Tarjan
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    sccs: list = []
    counter = [0]

    def strongconnect(v0):
        work = [(v0, iter(sorted(adj.get(v0, ()))))]
        index[v0] = low[v0] = counter[0]
        counter[0] += 1
        stack.append(v0)
        on_stack.add(v0)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on_stack.add(w)
                    work.append((w, iter(sorted(adj.get(w, ())))))
                    advanced = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if not advanced:
                work.pop()
                if work:
                    pv = work[-1][0]
                    low[pv] = min(low[pv], low[v])
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    sccs.append(comp)

    for v in sorted(adj):
        if v not in index:
            strongconnect(v)
    out = {}
    for comp in sccs:
        root = min(comp)
        for v in comp:
            out[v] = root
    hosts = sorted(out)
    tbl = pa.table({
        "node": pa.array(hosts, pa.string()),
        "scc": pa.array([out[h] for h in hosts], pa.string())})
    pq.write_table(tbl, os.path.join(GOLDEN_DIR, "scc_mirror.parquet"))
    n_nontrivial = sum(1 for c in sccs if len(c) > 1)
    print(f"scc golden: {tbl.num_rows} hosts, {len(sccs)} sccs, "
          f"{n_nontrivial} non-trivial")

    # condensation report golden (same pass: labels + directed adj)
    dag_edges = set()
    for u, nbrs in adj.items():
        for v in nbrs:
            if out[u] != out[v]:
                dag_edges.add((out[u], out[v]))
    rep = pa.table({
        "n_sccs": pa.array([len(sccs)], pa.int64()),
        "n_nontrivial": pa.array([n_nontrivial], pa.int64()),
        "largest_scc": pa.array([max(len(c) for c in sccs)], pa.int64()),
        "n_dag_edges": pa.array([len(dag_edges)], pa.int64())})
    pq.write_table(rep, os.path.join(GOLDEN_DIR,
                                     "scc_condensation_mirror.parquet"))
    print(f"condensation golden: {len(dag_edges)} dag edges")


def gen_ncd_golden(sf_dir: str = SF001, threshold: float = 0.6) -> None:
    """Independent serial NCD pairs for docs.ncd_pairs_sample: plain
    nested loop, same md5 1/16 gate, same pinned zlib level 6, same
    single-IEEE-division -- no engine code shared."""
    import hashlib
    import zlib

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    sample = []
    for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        if hashlib.md5(str(d).encode()).hexdigest()[0] == "0":
            sample.append((d, s or ""))
    sample.sort()
    out_a, out_b, out_n = [], [], []
    for i in range(len(sample)):
        a, ta = sample[i]
        ca = len(zlib.compress(ta.encode(), 6))
        for j in range(i + 1, len(sample)):
            b, tb = sample[j]
            cb = len(zlib.compress(tb.encode(), 6))
            cab = len(zlib.compress((ta + tb).encode(), 6))
            ncd = (cab - min(ca, cb)) / max(ca, cb)
            if ncd < threshold:
                out_a.append(a)
                out_b.append(b)
                out_n.append(ncd)
    out = pa.table({"doc_a": pa.array(out_a, pa.int64()),
                    "doc_b": pa.array(out_b, pa.int64()),
                    "ncd": pa.array(out_n, pa.float64())})
    pq.write_table(out, os.path.join(GOLDEN_DIR, "ncd_pairs_sf001.parquet"))
    print(f"ncd golden: {len(sample)} sampled docs, {len(out_a)} pairs")


def gen_mmr_golden(sf_dir: str = SF001, k: int = 10,
                   query_vec_id: int = 0) -> None:
    """Independent serial MMR (lambda=1/2 folded out: score =
    rel - max_sim over exact int64 dots of 2^20-quantized vectors);
    plain loops, no engine code shared."""
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = [int(x) for x in t["vec_id"].to_pylist()]
    mat = [np.rint(np.asarray(v, np.float64) * (1 << 20)).astype(np.int64)
           for v in t["embedding"].to_pylist()]
    by_id = dict(zip(ids, mat))
    q = by_id[query_vec_id]
    selected = []
    for _ in range(k):
        best = None
        for i in sorted(by_id):
            if i == query_vec_id or any(i == s for s, _, _ in selected):
                continue
            v = by_id[i]
            rel = int(np.dot(v, q))
            if selected:
                ms = max(int(np.dot(v, sv)) for _, sv, _ in selected)
                score = rel - ms
            else:
                score = rel
            if best is None or score > best[2] or \
                    (score == best[2] and i < best[0]):
                best = (i, v, score)
        selected.append(best)
    out = pa.table({
        "rank": pa.array(range(len(selected)), pa.int64()),
        "vec_id": pa.array([s[0] for s in selected], pa.int64()),
        "score": pa.array([s[2] for s in selected], pa.int64())})
    pq.write_table(out, os.path.join(GOLDEN_DIR, "mmr_topk_sf001.parquet"))
    print(f"mmr golden: picked {[s[0] for s in selected]}")


def gen_pava_golden(sf_dir: str = SF001) -> None:
    """Independent serial PAVA calibration of props k vs the purchase
    label: plain dict counting + textbook pool-adjacent-violators with
    exact fraction compares; one float division at report time."""
    import json as _json

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_type", "props"])
    agg: dict[int, list[int]] = {}
    for et, pr in zip(t["event_type"].to_pylist(), t["props"].to_pylist()):
        k = int(_json.loads(pr)["k"])
        a = agg.setdefault(k, [0, 0])
        a[0] += 1
        a[1] += 1 if et == "purchase" else 0
    rows = sorted((k, v[0], v[1]) for k, v in agg.items())
    # O(n^2) repeated-full-scan PAVA (different formulation from the
    # engine's violator stack; same fixpoint by PAVA uniqueness)
    pools = [[k, k, n, p] for k, n, p in rows]
    changed = True
    while changed:
        changed = False
        i = 0
        while i + 1 < len(pools):
            a, b = pools[i], pools[i + 1]
            if a[3] * b[2] > b[3] * a[2]:
                pools[i] = [a[0], b[1], a[2] + b[2], a[3] + b[3]]
                del pools[i + 1]
                changed = True
            else:
                i += 1
    out_k, out_n, out_p, out_r = [], [], [], []
    for k_lo, k_hi, n, p in pools:
        for k, bn, bp in rows:
            if k_lo <= k <= k_hi:
                out_k.append(k)
                out_n.append(bn)
                out_p.append(bp)
                out_r.append(p / n)
    out = pa.table({
        "k": pa.array(out_k, pa.int64()),
        "n": pa.array(out_n, pa.int64()),
        "n_pos": pa.array(out_p, pa.int64()),
        "calibrated_rate": pa.array(out_r, pa.float64())})
    pq.write_table(out, os.path.join(GOLDEN_DIR, "pava_sf001.parquet"))
    print(f"pava golden: {len(rows)} buckets -> {len(pools)} pools")


def gen_unigram_golden(sf_dir: str = SF001, n_iters: int = 3,
                       max_len: int = 4, top_m: int = 48) -> None:
    """Independent serial unigram-LM (hard-EM Viterbi) trainer: plain
    dict word counts, nested-loop substring candidates, memoized
    recursive Viterbi (same pinned arithmetic contract: dp[j] + logp
    single additions, strict improvement, j ascending)."""
    import math
    import re

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["text"])
    wf: dict[str, int] = {}
    for s in t["text"].to_pylist():
        for w in re.findall(r"[a-z]+", (s or "").lower()):
            wf[w] = wf.get(w, 0) + 1

    cand: dict[str, int] = {}
    for w, n in wf.items():
        for L in range(1, max_len + 1):
            for i in range(len(w) - L + 1):
                s = w[i:i + L]
                cand[s] = cand.get(s, 0) + n
    chars = sorted((p, n) for p, n in cand.items() if len(p) == 1)
    multi = sorted(((p, n) for p, n in cand.items() if len(p) > 1),
                   key=lambda x: (-x[1], x[0]))[:top_m]
    counts = dict(chars + sorted(multi))

    def viterbi(word: str, logp: dict) -> list:
        memo: dict[int, float] = {0: 0.0}
        back: dict[int, int] = {}

        for i in range(1, len(word) + 1):
            best = float("-inf")
            bj = 0
            for j in range(max(0, i - max_len), i):
                lp = logp.get(word[j:i])
                if lp is None or memo.get(j, float("-inf")) == float("-inf"):
                    continue
                c = memo[j] + lp
                if c > best:
                    best = c
                    bj = j
            memo[i] = best
            back[i] = bj
        out = []
        i = len(word)
        while i > 0:
            j = back[i]
            out.append(word[j:i])
            i = j
        return out[::-1]

    for _ in range(n_iters):
        total = sum(counts.values())
        ppb = {p: n * 1_000_000_000 // total for p, n in counts.items()
               if n > 0}
        logz = math.log(sum(ppb.values()))
        logp = {p: math.log(v) - logz for p, v in ppb.items() if v > 0}
        acc: dict[str, int] = {}
        for w, n in wf.items():
            for piece in viterbi(w, logp):
                acc[piece] = acc.get(piece, 0) + n
        for p in counts:
            if len(p) == 1:
                acc[p] = max(acc.get(p, 0), 1)
        counts = {p: n for p, n in acc.items() if n > 0}

    total = sum(counts.values())
    pieces = sorted(counts)
    out = pa.table({
        "piece": pa.array(pieces, pa.string()),
        "n": pa.array([counts[p] for p in pieces], pa.int64()),
        "prob_ppb": pa.array([counts[p] * 1_000_000_000 // total
                              for p in pieces], pa.int64())})
    pq.write_table(out, os.path.join(GOLDEN_DIR,
                                     "unigram_lm_sf001.parquet"))
    print(f"unigram golden: {len(pieces)} pieces after {n_iters} EM iters")


def gen_coverage_golden(sf_dir: str = SF001, k: int = 8,
                        shingle_k: int = 3) -> None:
    """Independent serial greedy max-coverage: plain loops, same
    md5-derived shingle hashes and (gain, doc_id) tie rule."""
    import hashlib
    import re

    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    tok = re.compile(r"[a-z0-9]+")
    hsets = {}
    for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = tok.findall((s or "").lower())
        if len(toks) < shingle_k:
            sh = {" ".join(toks)} if toks else set()
        else:
            sh = {" ".join(toks[i:i + shingle_k])
                  for i in range(len(toks) - shingle_k + 1)}
        hsets[int(d)] = {int.from_bytes(
            hashlib.md5(x.encode()).digest()[:8], "little") for x in sh}
    covered = set()
    picked = []
    for _ in range(k):
        best = None
        for d in sorted(hsets):
            if any(d == p for p, _ in picked):
                continue
            gain = len(hsets[d] - covered)
            if best is None or gain > best[1]:
                best = (d, gain)
        picked.append(best)
        covered |= hsets[best[0]]
    out = pa.table({
        "rank": pa.array(range(len(picked)), pa.int64()),
        "doc_id": pa.array([d for d, _ in picked], pa.int64()),
        "gain": pa.array([g for _, g in picked], pa.int64())})
    pq.write_table(out, os.path.join(GOLDEN_DIR,
                                     "coverage_sf001.parquet"))
    print(f"coverage golden: picks {[d for d, _ in picked]}")


def gen_markov_golden(n_iters: int = 40, scale: int = 10**12) -> None:
    """Independent serial Markov stationary distribution over sf0.01
    events: transition counts from a plain per-user python walk (sorted
    by ts, event_id), then the SAME pinned integer power-iteration
    contract as pipelines/windows.markov_stationary
    (pi'_j = sum_i pi_i * c_ij // rowsum_i, dangling rows uniform)."""
    t = pq.read_table("/root/testdata/sf0.01/events.parquet",
                      columns=["event_id", "ts", "user_id", "event_type"])
    rows = sorted(t.to_pylist(),
                  key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    counts: dict[tuple, int] = {}
    prev_user, prev_type = None, None
    for r in rows:
        if r["user_id"] == prev_user:
            k2 = (prev_type, r["event_type"])
            counts[k2] = counts.get(k2, 0) + 1
        prev_user, prev_type = r["user_id"], r["event_type"]
    types = sorted({a for a, _ in counts} | {b for _, b in counts})
    idx = {t2: i for i, t2 in enumerate(types)}
    k = len(types)
    c = [[0] * k for _ in range(k)]
    for (a, b), n in counts.items():
        c[idx[a]][idx[b]] = n
    rowsum = [sum(row) for row in c]
    pi = [scale] * k
    for _ in range(n_iters):
        nxt = [0] * k
        for i in range(k):
            if rowsum[i] == 0:
                for j in range(k):
                    nxt[j] += pi[i] // k
            else:
                for j in range(k):
                    nxt[j] += pi[i] * c[i][j] // rowsum[i]
        pi = nxt
    tot = sum(pi)
    out = pa.table({
        "event_type": pa.array(types, pa.string()),
        "stationary_ppm": pa.array([p * 1_000_000 // tot for p in pi],
                                   pa.int64())})
    pq.write_table(out, os.path.join(GOLDEN_DIR, "markov_sf001.parquet"))
    print(f"markov golden: {k} types, ppm={[p * 1_000_000 // tot for p in pi]}")


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    gen_signature_goldens()
    gen_ivf_goldens()
    gen_crawl_goldens()
    gen_kmeans_golden()
    gen_hll_golden()
    gen_trigram_lm_golden()
    gen_srp_golden()
    gen_pagerank_golden()
    gen_bpe_golden()
    gen_pq_golden()
    gen_dsir_golden()
    gen_pca_golden()
    gen_anchor_golden()
    gen_hits_golden()
    gen_two_hop_golden()
    gen_compression_golden()
    gen_quantized_golden()
    gen_weighted_sample_golden()
    gen_sq8_golden()
    gen_crawl_pagerank_golden()
    gen_pack_golden()
    gen_cms_golden()
    gen_bloom_decon_golden()
    gen_semdedup_golden()
    gen_bpe_encode_golden()
    gen_lsq_classifier_golden()
    gen_kcenter_golden()
    gen_redirect_goldens()
    gen_redirect_map_golden()
    gen_broken_links_golden()
    gen_dedup_crawl_goldens()
    gen_samehost_golden()
    gen_breaker_golden()
    gen_winnow_goldens()
    gen_scc_golden()
    gen_ncd_golden()
    gen_mmr_golden()
    gen_pava_golden()
    gen_unigram_golden()
    gen_coverage_golden()
    gen_markov_golden()
