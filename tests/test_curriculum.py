"""Curriculum shard sink: on-disk layout matches the stats query
exactly, files are ordered within shard, and a re-run is idempotent."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_write_curriculum_shards_round_trip(ray_session, tmp_path):
    from pomp_ray.pipelines.docs import (
        curriculum_shards,
        write_curriculum_shards,
    )

    out = str(tmp_path / "curr")
    info = write_curriculum_shards(SF, out)
    stats = curriculum_shards(SF).to_pandas()
    assert info["n_files"] == len(stats)
    assert info["n_docs"] == int(stats["n_docs"].sum())

    got = {}
    all_docs = []
    for p in glob.glob(os.path.join(out, "stage-*", "shard-*.parquet")):
        t = pq.read_table(p)
        key = (int(t["stage"][0].as_py()), int(t["shard"][0].as_py()))
        got[key] = (t.num_rows,
                    int(pd.Series(t["n_chars"].to_pylist()).sum()))
        # rank_in_shard is dense and sorted inside the file
        rk = t["rank_in_shard"].to_pylist()
        assert rk == list(range(len(rk)))
        all_docs.extend(t["doc_id"].to_pylist())
    want = {(int(r.stage), int(r.shard)): (int(r.n_docs),
                                           int(r.sum_chars))
            for r in stats.itertuples()}
    assert got == want
    # every doc appears exactly once across the layout
    assert sorted(all_docs) == sorted(set(all_docs))
    assert len(all_docs) == info["n_docs"]

    # idempotent republish: same files, same bytes
    sizes1 = {p: os.path.getsize(p)
              for p in glob.glob(os.path.join(out, "stage-*", "*.parquet"))}
    info2 = write_curriculum_shards(SF, out)
    sizes2 = {p: os.path.getsize(p)
              for p in glob.glob(os.path.join(out, "stage-*", "*.parquet"))}
    assert info2["n_files"] == info["n_files"]
    assert sizes1 == sizes2
