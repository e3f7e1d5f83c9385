"""Distributed suffix array (prefix doubling) + ExactSubstr spans:
permutation/order invariants and end-to-end span verification against
the raw document texts."""

import numpy as np
import pytest
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pomp_ray.pipelines.suffix import exactsubstr_spans, suffix_array

SF = "/root/testdata/sf0.001"


def _sample_texts(max_docs=30):
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    t = t.filter(pc.less(t["doc_id"], max_docs)).sort_by("doc_id")
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


@pytest.mark.slow
def test_suffix_array_is_sorted_permutation(ray_session):
    texts = _sample_texts()
    joined = "\x01".join(texts[d] for d in sorted(texts))
    sa = suffix_array(SF).to_pandas().sort_values("rank")
    n = len(joined)
    assert len(sa) == n
    pos = sa["pos"].to_numpy()
    assert sorted(pos) == list(range(n))          # permutation
    assert list(sa["rank"]) == list(range(n))     # dense ranks
    # spot-check lexicographic order on a deterministic stride
    ps = pos[:: max(1, n // 200)]
    for a, b in zip(ps, ps[1:]):
        assert joined[a:] < joined[b:]
    # doc/off mapping round-trips
    offs = {}
    acc = 0
    for d in sorted(texts):
        offs[d] = acc
        acc += len(texts[d]) + 1
    for r in sa.head(50).itertuples():
        assert offs[r.doc_id] + r.off == r.pos


@pytest.mark.slow
def test_exactsubstr_spans_verify_in_texts(ray_session):
    texts = _sample_texts()
    spans = exactsubstr_spans(SF).to_pandas()
    assert len(spans) > 0
    for r in spans.itertuples():
        a = texts[r.doc_a][r.off_a:r.off_a + r.lcp]
        b = texts[r.doc_b][r.off_b:r.off_b + r.lcp]
        assert len(a) == r.lcp and a == b      # the span really repeats
        assert r.lcp >= 20
        if r.lcp < 80:   # below the cap the match is maximal
            ca = texts[r.doc_a][r.off_a + r.lcp:r.off_a + r.lcp + 1]
            cb = texts[r.doc_b][r.off_b + r.lcp:r.off_b + r.lcp + 1]
            assert ca != cb or (ca == "" and cb == "")


@pytest.mark.slow
def test_exactsubstr_scaled_equals_bounded(ray_session):
    """The prefix-bucket sharded LCP path (no corpus-text broadcast)
    must produce exactly the bounded broadcast path's span set on the
    same sample."""
    from pomp_ray.pipelines.suffix import exactsubstr_spans_scaled
    a = exactsubstr_spans(SF).to_pandas()
    b = exactsubstr_spans_scaled(SF, max_docs=30).to_pandas()
    cols = ["doc_a", "off_a", "doc_b", "off_b", "lcp"]
    sa = set(map(tuple, a[cols].itertuples(index=False)))
    sb = set(map(tuple, b[cols].itertuples(index=False)))
    assert sa == sb
