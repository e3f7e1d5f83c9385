"""Range-partitioned CDX sink: layout, manifest, and the prune proof."""

import glob
import json
import os

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _out_dir():
    return "/tmp/pomp_cdx_parts_sf0.001"


def test_partitioned_write_layout_and_manifest():
    import shutil

    from pomp_ray.pipelines.archive import write_cdx_partitioned

    out = _out_dir()
    if os.path.isdir(out):
        shutil.rmtree(out)
    manifest = write_cdx_partitioned(SF, out, rows_per_part=100)
    files = sorted(glob.glob(os.path.join(out, "cdx-*.parquet")))
    assert len(files) == len(manifest)
    disk = json.load(open(os.path.join(out, "MANIFEST.json")))
    assert [m["part"] for m in disk] == sorted(m["part"] for m in disk)
    # parts tile the SURT order: ranges are disjoint and ascending
    for a, b in zip(disk, disk[1:]):
        assert a["max_surt"] < b["min_surt"]
    # every part file's row count matches its manifest entry
    for m in disk:
        f = os.path.join(out, f"cdx-{int(m['part']):05d}.parquet")
        assert pq.ParquetFile(f).metadata.num_rows == m["n_rows"]


def test_domain_lookup_reads_only_intersecting_parts(monkeypatch):
    from pomp_ray.pipelines import archive

    # ensure the partitioned layout exists
    test_partitioned_write_layout_and_manifest()

    read_paths = []
    real = pq.read_table

    def spy(path, *a, **kw):
        read_paths.append(path)
        return real(path, *a, **kw)

    monkeypatch.setattr(archive.pq, "read_table", spy)
    out = archive.cdx_domain_lookup(SF, host="src7.example.com")
    n_parts = len(glob.glob(os.path.join(_out_dir(), "cdx-*.parquet")))
    part_reads = [p for p in read_paths if "cdx-" in str(p)]
    assert 1 <= len(part_reads) < n_parts, (len(part_reads), n_parts)
    # and the result is exactly the domain's captures, in SURT order
    hosts = {u.split("/")[2] for u in out["url"].to_pylist()}
    assert hosts == {"src7.example.com"}
    idx = out["idx"].to_pylist()
    assert idx == sorted(idx)
    assert out.num_rows > 0


def test_rewrite_is_byte_identical():
    """Two independent writes of the same input produce bit-identical
    part files and MANIFEST — the property that makes a resumed or
    retried run safe to overwrite in place."""
    import hashlib
    import shutil

    from pomp_ray.pipelines.archive import write_cdx_partitioned

    dirs = ["/tmp/pomp_cdx_det_a", "/tmp/pomp_cdx_det_b"]
    for d in dirs:
        if os.path.isdir(d):
            shutil.rmtree(d)
        write_cdx_partitioned(SF, d, rows_per_part=100)

    names = [sorted(os.listdir(d)) for d in dirs]
    assert names[0] == names[1]
    for name in names[0]:
        digests = [hashlib.md5(open(os.path.join(d, name), "rb").read())
                   .hexdigest() for d in dirs]
        assert digests[0] == digests[1], name
    for d in dirs:
        shutil.rmtree(d)
