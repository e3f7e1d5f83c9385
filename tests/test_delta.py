"""snapshot_delta vs an independent serial classification: the bucket
rule fully determines each doc's fate, so the serial walk needs no
join at all -- a genuinely different code path from the engine's
full-outer digest join."""
import hashlib

import pyarrow.parquet as pq

from pomp_ray.pipelines.delta import snapshot_delta


def test_snapshot_delta_matches_serial(ray_session):
    sf = "/root/testdata/sf0.001"
    got = {(r["doc_id"], r["status"])
           for r in snapshot_delta(sf).take_all()}
    ids = pq.read_table(
        sf + "/documents.parquet", columns=["doc_id"])["doc_id"].to_pylist()
    want = set()
    for d in ids:
        b = int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16) % 10
        if b == 0:
            want.add((d, "added"))
        elif b == 1:
            want.add((d, "removed"))
        elif b == 2:
            want.add((d, "changed"))
    assert got == want and len(got) > 0
