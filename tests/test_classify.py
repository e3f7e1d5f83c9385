"""Distributed least-squares classifier (pipelines/classify.py):
bit-exact weights vs the independent serial golden, planted-concept
recovery well above chance, and float-threshold safety margins."""

import os

import numpy as np
import pyarrow.parquet as pq

from pomp_ray.pipelines.classify import (
    FEATURES,
    feature_matrix,
    lsq_classifier_scores,
    lsq_classifier_weights,
    lsq_train,
)

SF = "/root/testdata/sf0.01"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_weights_match_serial_golden(ray_session):
    got = lsq_classifier_weights(SF)
    want = pq.read_table(
        os.path.join(GOLDEN, "lsq_classifier_weights_sf001.parquet"))
    assert got["feature"].to_pylist() == want["feature"].to_pylist()
    gw = got["weight"].to_pylist()
    ww = want["weight"].to_pylist()
    assert gw == ww, list(zip(FEATURES, gw, ww))  # bit-exact float64


def test_scores_match_golden_and_beat_chance(ray_session):
    rows = {r["doc_id"]: r for r in lsq_classifier_scores(SF).take_all()}
    want = pq.read_table(
        os.path.join(GOLDEN, "lsq_classifier_scores_sf001.parquet"))
    n_ok = 0
    for d, p, l in zip(want["doc_id"].to_pylist(),
                       want["pred"].to_pylist(), want["label"].to_pylist()):
        assert rows[d]["pred"] == p and rows[d]["label"] == l
        n_ok += rows[d]["pred"] == rows[d]["label"]
    n = want.num_rows
    pos = sum(want["label"].to_pylist())
    majority = max(pos, n - pos) / n
    assert n_ok / n > max(0.9, majority), (n_ok / n, majority)


def test_margin_far_from_threshold(ray_session):
    """pred = (float margin > 0) is only stable if no doc sits at the
    threshold within float noise; assert a wide moat."""
    import pyarrow.compute as pc
    w, _ = lsq_train(SF)
    t = pq.read_table(os.path.join(SF, "documents.parquet"),
                      columns=["text"])
    x = feature_matrix(t["text"].combine_chunks())
    margins = np.abs(x.astype(np.float64) @ w)
    assert margins.min() > 1e-6, margins.min()
