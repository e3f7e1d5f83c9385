"""Driver-checkable multimodal pipeline: documents' text bytes stand in
for opaque media payloads (deterministic, sf-derived -- no external
data), flowing through the REAL actor-pool featurizer stage
(stages/multimodal.py MediaFeaturizer: once-per-actor setup, small
batches, binary column kept in Arrow).

The feature VALUES are checked for determinism in pytest
(tests/test_multimodal_sources.py); the driver-facing query emits the
SQL-checkable plumbing columns (ids, kind routing, payload byte length,
feature dimensionality) so the multimodal path gets a DuckDB oracle too.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from pomp_ray.stages.multimodal import FEATURE_DIM, MediaFeaturizer

_KINDS = ["image", "audio", "video"]


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=columns)


def to_media_batch(t: pa.Table) -> pa.Table:
    """documents rows -> MEDIA_SCHEMA-shaped rows: payload = utf-8 text
    bytes, kind routed by doc_id % 3, geometry deterministic."""
    doc_ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    payloads = [(x or "").encode() for x in texts]
    return pa.table({
        "media_id": pa.array(doc_ids, pa.int64()),
        "kind": pa.array([_KINDS[d % 3] for d in doc_ids], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([256] * len(doc_ids), pa.int32()),
        "height": pa.array([256] * len(doc_ids), pa.int32()),
        "duration_ms": pa.array([0] * len(doc_ids), pa.int32()),
        "payload_bytes": pa.array([len(p) for p in payloads], pa.int64()),
    })


def media_features(sf_dir: str, batch_size: int = 128,
                   max_actors: int = 8) -> rd.Dataset:
    """Decode+featurize documents-as-media through the actor-pool stage;
    emit the SQL-checkable plumbing columns.  Feature vectors themselves
    are deterministic (seeded fake decoder) and pytest-verified.

    Actor-pool size derives from the INPUT size (parquet metadata row
    count, no read): a pool larger than the number of batches starves
    idle actors; tiny inputs run one actor."""
    import pyarrow.parquet as pq
    n_rows = pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    n_batches = max(1, -(-n_rows // batch_size))
    concurrency = max(1, min(max_actors, n_batches // 2))
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_media_batch, batch_format="pyarrow")
    feats = ds.map_batches(
        MediaFeaturizer, fn_constructor_kwargs={"decode": "fake"},
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")

    def project(t: pa.Table) -> pa.Table:
        dim = pa.array([FEATURE_DIM] * t.num_rows, pa.int64())
        return pa.table({
            "doc_id": t["media_id"],
            "kind": t["kind"],
            "payload_bytes": pc.cast(t["payload_bytes"], pa.int64()),
            "feat_dim": dim,
        })

    return feats.map_batches(project, batch_format="pyarrow")


def media_frame_stats(sf_dir: str, batch_size: int = 128,
                      max_actors: int = 8) -> rd.Dataset:
    """Frame-sampling plumbing proof: documents-as-media through the
    ``FrameSampler`` actor pool (row explosion inside the pool), then
    per-kind (n_media, n_frames, frame_bytes) -- all integers derived
    from payload sizes, so the DuckDB oracle mirrors the deterministic
    chunking formula exactly."""
    import pyarrow.parquet as _pq

    from pomp_ray.stages.multimodal import FrameSampler

    n_rows = _pq.ParquetFile(
        os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    n_batches = max(1, -(-n_rows // batch_size))
    concurrency = max(1, min(max_actors, n_batches // 2))
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_media_batch, batch_format="pyarrow")
    frames = ds.map_batches(
        FrameSampler, fn_constructor_kwargs={"decode": "fake"},
        concurrency=concurrency, batch_size=batch_size,
        batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "kind": t["kind"].to_pylist(),
            "first": pc.equal(t["frame_idx"], 0).to_numpy(
                zero_copy_only=False).astype("int64"),
            "fb": pc.binary_length(t["frame"]).to_numpy()
            .astype("int64"),
        })
        g = df.groupby("kind", as_index=False).agg(
            n_media=("first", "sum"), n_frames=("first", "size"),
            frame_bytes=("fb", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum as _Sum
    out = frames.map_batches(partial, batch_format="pyarrow") \
        .groupby("kind").aggregate(
        _Sum("n_media", alias_name="n_media"),
        _Sum("n_frames", alias_name="n_frames"),
        _Sum("frame_bytes", alias_name="frame_bytes"))
    return out.map_batches(
        lambda t: pa.table({
            "kind": t["kind"],
            "n_media": pc.cast(t["n_media"], pa.int64()),
            "n_frames": pc.cast(t["n_frames"], pa.int64()),
            "frame_bytes": pc.cast(t["frame_bytes"], pa.int64())}),
        batch_format="pyarrow")


def media_dedup_stats(sf_dir: str) -> rd.Dataset:
    """Exact media dedup by payload digest, per kind: the binary column
    never shuffles -- each worker digests its payloads to 16-byte md5
    keys inside map_batches (the ContentDedupGate discipline), and only
    (kind, digest) rows reach the two-stage distinct count.  Per kind:
    total payload count vs distinct payloads (the dedup opportunity a
    media ingest pipeline measures first)."""
    import hashlib

    import numpy as np
    from ray.data.aggregate import Count, Sum

    def digest(t: pa.Table) -> pa.Table:
        digs = [hashlib.md5(p).hexdigest()
                for p in t["payload"].to_pylist()]
        return pa.table({"kind": t["kind"],
                         "digest": pa.array(digs, pa.string())})

    keys = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        to_media_batch, batch_format="pyarrow").map_batches(
        digest, batch_format="pyarrow") \
        .groupby(["kind", "digest"]).aggregate(Count(alias_name="n"))
    out = keys.map_batches(
        lambda t: pa.table({"kind": t["kind"],
                            "n": pc.cast(t["n"], pa.int64()),
                            "u": pa.array(
                                np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow").groupby("kind").aggregate(
        Sum("n", alias_name="n_media"), Sum("u", alias_name="n_unique"))
    return out.map_batches(
        lambda t: pa.table({
            "kind": t["kind"],
            "n_media": pc.cast(t["n_media"], pa.int64()),
            "n_unique": pc.cast(t["n_unique"], pa.int64())}),
        batch_format="pyarrow").sort("kind")


def ppm_decode_check(sf_dir: str) -> rd.Dataset:
    """REAL image decode on the distributed path, with an exact DuckDB
    mirror: each doc's first 64 utf-8 bytes (zero-padded) become the
    raster of a synthesized 8x8 P5 netpbm payload; the stage decodes it
    through ``stages.multimodal.real_decode`` (the actual netpbm
    parser, not the fake) and emits the integer pixel sum recovered
    FROM THE DECODED FEATURES.  With 1-pixel blocks the 8x8 block-mean
    grid is px/255 exactly, so round(feat*255) round-trips the raster
    bytes and the oracle is a plain integer SUM over the same code
    points -- decoder correctness rides the hard external hash gate."""
    import numpy as np

    from pomp_ray.stages.multimodal import real_decode

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        sums = []
        for x in t["text"].to_pylist():
            raster = (x or "").encode("utf-8")[:64].ljust(64, b"\x00")
            payload = b"P5\n8 8\n255\n" + raster
            feats = real_decode(payload, "image")
            sums.append(int(np.rint(feats * 255.0).sum()))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "px_sum": pa.array(sums, pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow")
