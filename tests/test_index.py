"""zip_with_index (stages/index.py): global 0-based positions by key
across multiple blocks, stable across runs and block structures."""

import hashlib

import pyarrow as pa
import ray.data as rd

from pomp_ray.stages.index import zip_with_index


def _ds(n=257, n_blocks=7):
    keys = [hashlib.md5(str(i).encode()).hexdigest() for i in range(n)]
    t = pa.table({"i": pa.array(range(n), pa.int64()),
                  "h": pa.array(keys, pa.string())})
    return rd.from_arrow(t).repartition(n_blocks)


def test_positions_are_global_rank(ray_session):
    rows = zip_with_index(_ds(), "h").take_all()
    assert sorted(r["pos"] for r in rows) == list(range(257))
    by_pos = sorted(rows, key=lambda r: r["pos"])
    assert [r["h"] for r in by_pos] == sorted(r["h"] for r in rows)


def test_stable_across_block_structures(ray_session):
    a = {r["i"]: r["pos"]
         for r in zip_with_index(_ds(n_blocks=3), "h").take_all()}
    b = {r["i"]: r["pos"]
         for r in zip_with_index(_ds(n_blocks=11), "h").take_all()}
    assert a == b


def test_empty_dataset(ray_session):
    empty = rd.from_arrow(pa.table({"i": pa.array([], pa.int64()),
                                    "h": pa.array([], pa.string())}))
    assert zip_with_index(empty, "h").take_all() == []
