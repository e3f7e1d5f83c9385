"""Distributed linear-classifier training over the corpus: the
model-based filtering step of a training-data pipeline (CCNet/fastText
quality- and language-classifier shape), reduced to its distributed
core -- aggregate EXACT sufficient statistics in one pass, solve the
tiny normal-equations system on the driver, broadcast the weights back,
score vectorized.

The learner is LEAST-SQUARES CLASSIFICATION (the Fisher discriminant:
regress y in {-1,+1} on integer text features, threshold at 0).  Its
sufficient statistics X'X (k x k) and X'y (k) are INTEGER matrix sums,
so per-block partials accumulate order-independently and the learned
weights are bit-identical across block structures, worker counts and
retries (the int64 discipline of kmeans/pagerank/q6); the float
arithmetic contract is pinned to ONE ``np.linalg.solve`` call on the
exact integer matrices.  Unlike an iterative learner this converges by
construction -- one map_batches pass over the corpus, a k^2-sized
reduce, and a k x k solve, regardless of corpus size (k = 11).

Label: the synthetic corpus is UNIFORM by construction (no natural
lang/source/quality correlation exists to learn -- probed: per-lang and
per-source feature means are indistinguishable), so the driver query
plants a linear TEACHER concept over the same feature space -- y = sign
of ``2*(1000*c_a - 84*n_chars) + 1`` (an a-frequency threshold at the
corpus median; the +1 makes every integer teacher margin nonzero).  The
checked contract is concept RECOVERY: the distributed learner's weights
match the independent serial learner byte-for-byte and the planted
labels are predicted well above chance (0.97 at sf0.01).  On real data
the label column is whatever teacher you have (fastText lang id, human
quality tags); the machinery is label-agnostic.

Overflow bound: X'X entries grow as sum over docs of x_i*x_j
(~n_docs * max_feature^2 ~ 1e7 per doc at these features), so int64
holds through ~1e11 docs per partial; beyond that, widen to per-block
float128 or shard the reduce (documented, not silently capped).

Golden contract (tools/gen_golden.py gen_lsq_classifier_golden): an
independent serial implementation -- Python string ops per doc, plain
int accumulation, the same pinned np.linalg.solve -- must produce
byte-identical weights and predictions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from pomp_ray.functions import analysis as an
from pomp_ray.pipelines.docs import _docs

#: feature columns, in weight-vector order: bias, global counters, then
#: per-character counts (chars that actually occur in the corpus
#: alphabet -- an all-zero column makes X'X singular)
FEATURE_CHARS = "aeiouskw"
FEATURES = ["bias", "n_chars", "n_words"] + [f"c_{c}" for c in FEATURE_CHARS]

#: planted teacher concept: y = sign(2*(1000*c_a - 84*n_chars) + 1)
TEACHER_A, TEACHER_CHARS = 1000, 84


def feature_matrix(text: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, k) int64 feature matrix, all-Arrow counters: utf8 length,
    whitespace-token count, per-character counts."""
    n = len(text)
    cols = [np.ones(n, np.int64),
            pc.utf8_length(text).to_numpy(zero_copy_only=False)
            .astype(np.int64),
            an.count_tokens_arr(text).to_numpy(zero_copy_only=False)
            .astype(np.int64)]
    for ch in FEATURE_CHARS:
        cols.append(pc.count_substring(text, pattern=ch)
                    .to_numpy(zero_copy_only=False).astype(np.int64))
    return np.stack(cols, axis=1)


def teacher_labels(x: np.ndarray) -> np.ndarray:
    """Planted-concept labels (+1/-1) from the feature matrix rows."""
    ia, ic = FEATURES.index("c_a"), FEATURES.index("n_chars")
    margin = 2 * (TEACHER_A * x[:, ia] - TEACHER_CHARS * x[:, ic]) + 1
    return np.where(margin > 0, 1, -1).astype(np.int64)


def _suffstat_partial(t: pa.Table) -> pa.Table:
    """One block's exact integer sufficient statistics: flattened X'X
    (k*k), X'y (k), and the row count, as a single int64 row."""
    x = feature_matrix(t["text"])
    y = teacher_labels(x)
    xtx = (x.T @ x).ravel()
    xty = x.T @ y
    k = len(FEATURES)
    cols = {f"s{i}": pa.array([int(v)], pa.int64())
            for i, v in enumerate(xtx)}
    cols |= {f"t{j}": pa.array([int(v)], pa.int64())
             for j, v in enumerate(xty)}
    cols["n"] = pa.array([t.num_rows], pa.int64())
    return pa.table(cols)


def lsq_train(sf_dir: str):
    """One distributed pass -> exact (X'X, X'y) -> the pinned float64
    solve.  Returns (weights float64 (k,), n_docs)."""
    parts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        _suffstat_partial, batch_format="pyarrow").take_all()
    k = len(FEATURES)
    xtx = np.zeros(k * k, np.int64)
    xty = np.zeros(k, np.int64)
    n = 0
    for r in parts:
        xtx += np.array([r[f"s{i}"] for i in range(k * k)], np.int64)
        xty += np.array([r[f"t{j}"] for j in range(k)], np.int64)
        n += r["n"]
    w = np.linalg.solve(xtx.reshape(k, k).astype(np.float64),
                        xty.astype(np.float64))
    return w, n


def lsq_classifier_weights(sf_dir: str) -> pa.Table:
    """Driver query: learned float64 weight per feature (bit-exact vs
    the serial golden -- integer sufficient statistics + the pinned
    solve)."""
    w, _ = lsq_train(sf_dir)
    return pa.table({"feature": pa.array(list(FEATURES), pa.string()),
                     "weight": pa.array([float(v) for v in w],
                                        pa.float64())})


def lsq_classifier_scores(sf_dir: str) -> rd.Dataset:
    """Apply the learned model: per-doc prediction vs planted label --
    the vectorized model-scoring gate (broadcast weights, no shuffle).
    Emits booleans only: each prediction is an 11-term per-row dot
    against the bit-pinned weights (margins are O(1), far from the
    float threshold -- asserted in pytest)."""
    w, _ = lsq_train(sf_dir)
    w_ref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        ww = np.asarray(ray.get(w_ref), np.float64)
        x = feature_matrix(t["text"])
        margin = x.astype(np.float64) @ ww
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "pred": pa.array(margin > 0.0, pa.bool_()),
            "label": pa.array(teacher_labels(x) > 0, pa.bool_()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow")


def pava_calibration(sf_dir: str) -> pa.Table:
    """Isotonic calibration (pool-adjacent-violators, Ayer 1955) of the
    props ``k`` score against the purchase label: the monotone step
    function a production classifier's raw scores go through before
    thresholds mean anything.

    Shape: the only corpus-scale pass is the per-bucket (n, n_pos)
    groupby; PAVA itself runs on the bounded bucket table (<= 100 rows
    regardless of event volume).  Determinism: violator comparisons use
    CROSS-MULTIPLIED integer fractions (pos_a * n_b vs pos_b * n_a), so
    pooling decisions never touch floats; only the final reported rate
    is one IEEE division -- bit-identical to the independent serial
    golden."""
    import os as _os

    import pandas as _pd
    import pyarrow.compute as _pc
    import ray.data as _rd
    from ray.data.aggregate import Sum as _Sum

    def partial(t: pa.Table) -> pa.Table:
        k = _pc.struct_field(
            _pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>-?\d+)'),
            "k")
        k = _pc.cast(k, pa.int64()).to_numpy()
        pos = _pc.equal(t["event_type"], "purchase").to_numpy(
            zero_copy_only=False).astype(np.int64)
        df = _pd.DataFrame({"k": k, "n": 1, "n_pos": pos})
        g = df.groupby("k", sort=False).sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    buckets = _rd.read_parquet(
        _os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "props"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(_Sum("n", alias_name="n"),
                                _Sum("n_pos", alias_name="n_pos")) \
        .take_all()
    rows = sorted((int(r["k"]), int(r["n"]), int(r["n_pos"]))
                  for r in buckets)

    # PAVA over the bounded bucket table: pool while the previous
    # pool's rate exceeds the next one's (exact fraction compare)
    pools: list[list[int]] = []   # [k_lo, k_hi, n, n_pos]
    for k, n, p in rows:
        pools.append([k, k, n, p])
        while len(pools) > 1 and \
                pools[-2][3] * pools[-1][2] > pools[-1][3] * pools[-2][2]:
            b = pools.pop()
            a = pools[-1]
            a[1] = b[1]
            a[2] += b[2]
            a[3] += b[3]
    out_k, out_n, out_p, out_r = [], [], [], []
    for k_lo, k_hi, n, p in pools:
        for k, bn, bp in rows:
            if k_lo <= k <= k_hi:
                out_k.append(k)
                out_n.append(bn)
                out_p.append(bp)
                out_r.append(p / n)
    return pa.table({
        "k": pa.array(out_k, pa.int64()),
        "n": pa.array(out_n, pa.int64()),
        "n_pos": pa.array(out_p, pa.int64()),
        "calibrated_rate": pa.array(out_r, pa.float64())})
