"""WARC-lite archive source/sink (sources/warc.py): record framing,
gzip-member compression, round-trip fidelity through real files, the
read_pages fmt="warc" normalization, and the sharded stats pipeline."""

import gzip

import pyarrow as pa

from pomp_ray import schemas
from pomp_ray.sources.warc import (
    encode_record,
    encode_warc,
    parse_warc,
    read_warc,
    write_warc,
)

ROWS = [
    {"url": "http://a.test/x", "warc_ts": 1_700_000_000_123_456,
     "html": b"<html>plain</html>"},
    # payload containing the record separator AND gzip magic bytes:
    # framing must be Content-Length-driven, not scan-driven
    {"url": "http://a.test/trap", "warc_ts": None,
     "html": b"ab\r\n\r\nWARC/1.0\r\n\x1f\x8b tail"},
    {"url": "http://b.test/empty", "warc_ts": 0, "html": b""},
]


def _pages_table():
    return pa.table({
        "url": pa.array([r["url"] for r in ROWS]),
        "warc_ts": pa.array([r["warc_ts"] for r in ROWS],
                            pa.timestamp("us")),
        "html": pa.array([r["html"] for r in ROWS], pa.binary()),
        "text": pa.nulls(len(ROWS), pa.string()),
        "lang": pa.nulls(len(ROWS), pa.string()),
    }, schema=schemas.PAGES)


def _roundtrip(compress):
    t = _pages_table()
    blob = encode_warc([r["url"] for r in ROWS],
                       [r["warc_ts"] for r in ROWS],
                       [r["html"] for r in ROWS], compress=compress)
    back = parse_warc(blob)
    assert back["url"].to_pylist() == t["url"].to_pylist()
    assert back["html"].to_pylist() == t["html"].to_pylist()
    assert back["warc_ts"].cast(pa.int64()).to_pylist() == \
        [r["warc_ts"] for r in ROWS]


def test_roundtrip_plain_and_gzip():
    _roundtrip(compress=False)
    _roundtrip(compress=True)


def test_gzip_members_are_per_record():
    blob = encode_warc(["http://a.test/1", "http://a.test/2"],
                       [None, None], [b"one", b"two"], compress=True)
    # two independent gzip members: a second magic header exists past
    # the first, and member-wise decompression yields record 1 alone
    assert blob.count(b"\x1f\x8b\x08") >= 2
    first = gzip.GzipFile(fileobj=__import__("io").BytesIO(blob))
    rec1 = encode_record("http://a.test/1", None, b"one")
    assert first.read().startswith(b"WARC/1.0")
    assert parse_warc(gzip.decompress(blob)[:len(rec1)],
                      compressed=False)["url"].to_pylist() == \
        ["http://a.test/1"]


def test_write_read_dataset_roundtrip(ray_session, tmp_path):
    import ray.data as rd
    out = str(tmp_path / "archive")
    stats = write_warc(rd.from_arrow(_pages_table()), out)
    assert sum(s["n_records"] for s in stats) == len(ROWS)
    assert sum(s["n_payload_bytes"] for s in stats) == \
        sum(len(r["html"]) for r in ROWS)
    back = read_warc(out).take_all()
    assert {r["url"] for r in back} == {r["url"] for r in ROWS}
    by_url = {r["url"]: r for r in back}
    for r in ROWS:
        assert by_url[r["url"]]["html"] == r["html"]


def test_write_is_idempotent(ray_session, tmp_path):
    import glob

    import ray.data as rd
    out = str(tmp_path / "archive")
    write_warc(rd.from_arrow(_pages_table()), out)
    files1 = sorted(glob.glob(out + "/*"))
    write_warc(rd.from_arrow(_pages_table()), out)   # retry/replay
    assert sorted(glob.glob(out + "/*")) == files1


def test_read_pages_warc_normalizes(ray_session, tmp_path):
    import ray.data as rd

    from pomp_ray.sources.corpus import read_pages
    out = str(tmp_path / "archive")
    write_warc(rd.from_arrow(_pages_table()), out)
    t = pa.concat_tables(
        b for b in read_pages(out, fmt="warc").iter_batches(
            batch_format="pyarrow"))
    assert t.schema.equals(schemas.PAGES)
    assert set(t["url"].to_pylist()) == {r["url"] for r in ROWS}


def test_warc_shard_stats_matches_direct(ray_session):
    """The driver query's numbers, recomputed straight from the parquet
    table (independent of the archive round-trip)."""
    import collections

    import pyarrow.parquet as pq

    from pomp_ray.pipelines.archive import N_SHARDS, warc_shard_stats
    from pomp_ray.pipelines.docs import _shard_ids

    sf = "/root/testdata/sf0.001"
    got = {r["shard"]: (r["n_docs"], r["n_bytes"])
           for r in warc_shard_stats(sf).take_all()}
    t = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text"])
    shards = _shard_ids(t["doc_id"].to_pylist(), N_SHARDS)
    want = collections.defaultdict(lambda: [0, 0])
    for s, txt in zip(shards, t["text"].to_pylist()):
        want[int(s)][0] += 1
        want[int(s)][1] += len(txt.encode("utf-8"))
    assert got == {s: (n, b) for s, (n, b) in want.items()}


def test_cdx_index_surt_order_and_digest(ray_session):
    """CDX rows come back in strict SURT order with a contiguous global
    idx; digest/url/ts recomputed independently per row."""
    import hashlib

    import pyarrow.parquet as pq

    from pomp_ray.pipelines.archive import cdx_index, surt_key

    sf = "/root/testdata/sf0.001"
    rows = sorted(cdx_index(sf).take_all(), key=lambda r: r["idx"])
    assert [r["idx"] for r in rows] == list(range(len(rows)))
    keys = [r["surt_key"] for r in rows]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)

    t = pq.read_table(sf + "/documents.parquet")
    assert len(rows) == t.num_rows
    by_id = {f"doc-{d}.html": i
             for i, d in enumerate(t["doc_id"].to_pylist())}
    for r in rows[:25]:
        name = r["url"].rsplit("/", 1)[1]
        i = by_id[name]
        d = t["doc_id"][i].as_py()
        src, lang = t["source"][i].as_py(), t["lang"][i].as_py()
        text = t["text"][i].as_py()
        host = f"{src}.example.com"
        path = f"/{lang}/doc-{d}.html"
        assert r["url"] == f"http://{host}{path}"
        assert r["surt_key"] == surt_key(host, path)
        assert r["digest"] == hashlib.md5(text.encode()).hexdigest()
        assert r["n_bytes"] == len(text.encode())


def test_publish_crawl_archive_roundtrip(ray_session, tmp_path):
    """Crawl -> WARC shards + CDX: reading the published shards back
    must reproduce every visited page's extracted text byte-for-byte,
    and the CDX index must cover the same pages in strict SURT order
    with matching digests."""
    import hashlib

    import pyarrow.parquet as pq
    import ray.data as rd

    from pomp_ray import crawl as crawl_mod
    from pomp_ray.crawl import CrawlConfig, CrawlEngine
    from pomp_ray.pipelines.archive import publish_crawl_archive
    from pomp_ray.sources import gen_corpus
    from pomp_ray.sources.warc import read_warc

    fix = gen_corpus.generate("/tmp/pomp_pub_corpus", gen_corpus.TINY)
    ckpt = str(tmp_path / "ckpt")
    cfg = CrawlConfig(corpus_path=fix.pages_path, ckpt_dir=ckpt,
                      robots_path=fix.robots_path, mode="bfs",
                      min_distributed_rows=16, n_seen_shards=2)
    eng = CrawlEngine(cfg)
    try:
        eng.run(seeds=pq.read_table(fix.seeds_path).to_pylist())
    finally:
        eng.close()

    out = str(tmp_path / "archive")
    stats = publish_crawl_archive(ckpt, out)
    items = crawl_mod.read_items(ckpt)
    want = {u: t for u, t in zip(items["url"].to_pylist(),
                                 items["text"].to_pylist())}
    assert stats["pages"] == len(want) == stats["cdx_rows"]

    got = {}
    for b in read_warc(out + "/warc").iter_batches(
            batch_format="pyarrow"):
        for u, h in zip(b["url"].to_pylist(), b["html"].to_pylist()):
            got[u] = h.decode("utf-8")
    assert got == want   # byte-identical extracted text per url

    cdx = pq.read_table(out + "/cdx").to_pandas().sort_values("idx")
    assert list(cdx["idx"]) == list(range(len(cdx)))
    keys = list(cdx["surt_key"])
    assert keys == sorted(keys)
    assert set(cdx["url"]) == set(want)
    for _, r in cdx.head(20).iterrows():
        assert r["digest"] == hashlib.md5(
            want[r["url"]].encode()).hexdigest()
