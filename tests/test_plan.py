"""Declarative plan runner: spec-built pipelines must reproduce the
hand-written composites exactly, and sinks/errors behave."""

import pytest


def _sorted_pandas(ds):
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_plan_reproduces_clean_corpus(ray_session):
    from pomp_ray.core.plan import run_plan
    from pomp_ray.pipelines import docs

    sf = "/root/testdata/sf0.001"
    spec = {
        "source": {"table": "documents",
                   "columns": ["doc_id", "lang", "text"]},
        "stages": [
            {"op": "dedup_exact", "key": "text", "id": "doc_id"},
            {"op": "filter_quality"},
            {"op": "normalize_text", "column": "text",
             "out": "clean_text"},
            {"op": "select", "columns": ["doc_id", "lang",
                                         "clean_text"]},
        ],
    }
    got = _sorted_pandas(run_plan(spec, sf))
    want = _sorted_pandas(docs.clean_corpus(sf))
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)


def test_plan_stages_and_sink(ray_session, tmp_path):
    import glob

    import pyarrow.parquet as pq

    from pomp_ray.core.plan import run_plan

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "out")
    spec = {
        "source": {"table": "documents", "columns": ["doc_id", "lang"]},
        "stages": [
            {"op": "filter_in", "column": "lang", "values": ["en"]},
            {"op": "sample_hash", "key": "doc_id", "keep_hex": "012345"},
            {"op": "limit", "n": 10},
        ],
        "sink": {"parquet": out},
    }
    ds = run_plan(spec, sf)
    assert ds.count() <= 10
    files = glob.glob(out + "/*.parquet")
    assert files
    t = pq.read_table(out)
    assert set(t["lang"].to_pylist()) <= {"en"}
    assert t.num_rows == ds.count()

    with pytest.raises(ValueError, match="unknown stage op"):
        run_plan({"source": {"table": "documents"},
                  "stages": [{"op": "nope"}]}, sf)
