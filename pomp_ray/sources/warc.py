"""WARC-lite archive source/sink for Common-Crawl-style page corpora.

The reference crawls live HTTP and never touches archive formats; this
engine's corpora are stored tables (BASELINE.json input_hint: parquet of
Common-Crawl-style pages with a ``warc_ts`` column), and the archive
format those pages actually ship in on the open web is WARC.  This
module implements a deliberately simplified WARC ("WARC-lite"): real
WARC/1.0 record framing (header block, ``Content-Length``-delimited
payload, ``\\r\\n\\r\\n`` record separator) with the three headers the
PAGES schema round-trips (``WARC-Target-URI``, ``WARC-Date``,
``Content-Length``), and the Common-Crawl storage convention of one
gzip MEMBER per record concatenated into a ``.warc.gz`` file (a reader
can decompress the whole stream in one call; a range reader could unzip
a single record).  No external libs: stdlib ``gzip`` only.

Scale posture: the FILE is the parallelism unit, exactly like Common
Crawl's ~1 GiB warc.gz segments -- ``read_warc`` is
``read_binary_files`` + a per-file record parser in ``map_batches``
(workers each parse their own files; nothing global), and the writers
emit content-hash-named files (idempotent under task retry, the
``_write_frontier_part`` discipline from crawl.py).  Record framing is
``Content-Length``-driven, so payloads may contain the separator bytes.
The per-record header loop is O(records) Python over tiny header
strings; payload bytes are sliced, never scanned.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from datetime import datetime, timezone

import pyarrow as pa
import ray.data as rd

from pomp_ray import schemas

_NULL_DATE = "-"
_TS_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"


def _ts_to_str(us: int | None) -> str:
    if us is None:
        return _NULL_DATE
    dt = datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc)
    return dt.strftime(_TS_FMT)


def _ts_from_str(s: str) -> int | None:
    if s == _NULL_DATE:
        return None
    dt = datetime.strptime(s, _TS_FMT).replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def encode_record(url: str, ts_us: int | None, payload: bytes) -> bytes:
    """One WARC-lite record: WARC/1.0 header block + payload +
    record separator."""
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_ts_to_str(ts_us)}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return header + payload + b"\r\n\r\n"


def encode_warc(urls, ts_us_list, payloads, compress: bool = True) -> bytes:
    """A whole WARC-lite file: records in input order; ``compress=True``
    gzips each record as its OWN member (the Common Crawl convention),
    ``mtime=0`` so the bytes are deterministic."""
    recs = (encode_record(u, t, p if p is not None else b"")
            for u, t, p in zip(urls, ts_us_list, payloads))
    if compress:
        return b"".join(gzip.compress(r, mtime=0) for r in recs)
    return b"".join(recs)


def parse_warc(data: bytes, compressed: bool | None = None) -> pa.Table:
    """Parse one WARC-lite file's bytes into a PAGES-schema table
    (text/lang columns null -- archives carry raw payloads).  stdlib
    gzip transparently decompresses concatenated members; framing walks
    ``Content-Length``, so separator bytes inside payloads are safe."""
    if compressed or (compressed is None and data[:2] == b"\x1f\x8b"):
        data = gzip.decompress(data)
    urls: list[str] = []
    ts: list[int | None] = []
    payloads: list[bytes] = []
    i, n = 0, len(data)
    while i < n:
        j = data.find(b"\r\n\r\n", i)
        if j < 0:
            raise ValueError("truncated WARC record header")
        fields = {}
        for line in data[i:j].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(": ")
            fields[k] = v
        clen = int(fields["Content-Length"])
        body = data[j + 4:j + 4 + clen]
        if len(body) != clen:
            raise ValueError("truncated WARC record payload")
        urls.append(fields["WARC-Target-URI"])
        ts.append(_ts_from_str(fields["WARC-Date"]))
        payloads.append(bytes(body))
        i = j + 4 + clen + 4
    m = len(urls)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
        "text": pa.nulls(m, pa.string()),
        "lang": pa.nulls(m, pa.string()),
    }, schema=schemas.PAGES)


def _pages_cols(t: pa.Table):
    urls = t["url"].to_pylist()
    if "warc_ts" in t.column_names:
        ts_col = t["warc_ts"]
        if pa.types.is_timestamp(ts_col.type):
            ts_col = ts_col.cast(pa.timestamp("us"))
        ts = [v.value if v.is_valid else None
              for v in ts_col.combine_chunks()]
    else:
        ts = [None] * t.num_rows
    payloads = t["html"].to_pylist()
    return urls, ts, payloads


def write_warc_batch(t: pa.Table, out_dir: str,
                     compress: bool = True) -> pa.Table:
    """map_batches sink: one WARC-lite file per batch, content-hash
    filename (same bytes -> same name -> idempotent under task retry;
    distinct batches can never collide).  Returns a (path, n_records,
    n_payload_bytes) stats row -- the write ships no page bytes back."""
    if t.num_rows == 0:
        return pa.table({"path": pa.array([], pa.string()),
                         "n_records": pa.array([], pa.int64()),
                         "n_payload_bytes": pa.array([], pa.int64())})
    urls, ts, payloads = _pages_cols(t)
    blob = encode_warc(urls, ts, payloads, compress=compress)
    ext = "warc.gz" if compress else "warc"
    name = f"{hashlib.md5(blob).hexdigest()[:16]}.{ext}"
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    n_bytes = sum(len(p) for p in payloads if p is not None)
    return pa.table({"path": pa.array([path]),
                     "n_records": pa.array([t.num_rows], pa.int64()),
                     "n_payload_bytes": pa.array([n_bytes], pa.int64())})


def write_warc(ds: rd.Dataset, out_dir: str,
               compress: bool = True) -> list[dict]:
    """Materialize a PAGES-shaped Dataset as a WARC-lite archive dir,
    one file per block, streaming.  Returns the per-file stats rows."""
    return ds.map_batches(
        lambda t: write_warc_batch(t, out_dir, compress=compress),
        batch_format="pyarrow").take_all()


def _parse_file_batch(t: pa.Table) -> pa.Table:
    tables = [parse_warc(buf.as_py() if hasattr(buf, "as_py") else buf)
              for buf in t["bytes"]]
    if not tables:
        return schemas.PAGES.empty_table()
    return pa.concat_tables(tables)


def read_warc(path: str) -> rd.Dataset:
    """A WARC-lite archive (file or directory) as a PAGES-schema
    Dataset: whole files to workers, per-file parse in map_batches."""
    files = rd.read_binary_files(path)
    return files.map_batches(_parse_file_batch, batch_format="pyarrow")
