"""VersionedCorpus: manifest-pinned snapshot isolation, time travel,
vacuum of dropped + unreferenced (crashed-commit) directories."""

import os

import pyarrow.parquet as pq
import pytest
import ray.data as rd


def test_versioned_commit_time_travel_vacuum(ray_session, tmp_path):
    from pomp_ray.sources.versioned import VersionedCorpus

    vc = VersionedCorpus(str(tmp_path / "corpus"))
    ds1 = rd.range(100).map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")
    v1 = vc.commit(ds1, "initial")
    assert v1 == 1

    ds2 = rd.range(150).map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow")
    v2 = vc.commit(ds2, "append batch")
    assert v2 == 2

    # time travel: both versions read their own pinned rows
    assert vc.read(1).count() == 100
    assert vc.read(2).count() == 150
    assert vc.read().count() == 150

    # snapshot isolation: a stray file in v1's dir is invisible
    import pyarrow as pa

    stray = os.path.join(str(tmp_path / "corpus"), "v0001",
                         "zzz-stray.parquet")
    pq.write_table(pa.table({"doc_id": [1]}), stray)
    assert vc.read(1).count() == 100

    # crashed commit: an unreferenced dir appears -> vacuum collects it
    os.makedirs(os.path.join(str(tmp_path / "corpus"), "v0099"))
    rep = vc.vacuum(keep_last=1)
    assert rep["kept"] == [2]
    assert rep["n_dirs_removed"] == 2   # v0001 + the orphan v0099

    assert vc.read().count() == 150
    with pytest.raises(FileNotFoundError):
        vc.read(1)
    meta = vc.versions()
    assert [m["version"] for m in meta] == [2]
    assert meta[0]["n_rows"] == 150
