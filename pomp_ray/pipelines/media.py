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
