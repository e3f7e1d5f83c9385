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


def test_host_change_rates_consistent_with_delta(ray_session):
    """Per-source totals must equal the serial bucket classification:
    docs in both snapshots per source, changed = bucket 2."""
    import collections

    from pomp_ray.pipelines.delta import host_change_rates

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(sf + "/documents.parquet",
                      columns=["doc_id", "source"])
    nd = collections.Counter()
    nc = collections.Counter()
    for d, s in zip(t["doc_id"].to_pylist(), t["source"].to_pylist()):
        b = int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16) % 10
        if b in (0, 1):
            continue
        nd[s] += 1
        if b == 2:
            nc[s] += 1
    got = {r["source"]: (r["n_docs"], r["n_changed"], r["change_ppm"])
           for r in host_change_rates(sf).take_all()}
    assert got == {s: (nd[s], nc[s], nc[s] * 1_000_000 // nd[s])
                   for s in nd}
