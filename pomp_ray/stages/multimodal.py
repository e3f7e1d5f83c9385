"""Multimodal column stages: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by actor-pool
``map_batches`` stages.

The decode step itself is STUBBED (this container has no image/audio
libraries): ``decode=`` selects either the deterministic fake decoder
(seeded from the payload bytes -- stable across runs/workers) or a
clearly-marked ``NotImplementedError`` hook where Pillow/torchaudio/
ffmpeg would plug in.  Everything AROUND the decode is real and tested:
Arrow schema handling for binary columns, small-batch sizing for large
payloads, once-per-actor model/codec setup in ``__init__``, and the
fixed-size-list feature output layout.

Scale notes: binary payloads are large -- callers should pass a small
``batch_size`` (64-256) and keep ``batch_format="pyarrow"`` (binary
round-trips pandas as object dtype; Arrow keeps it zero-copy).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("width", pa.int32()),           # typed metadata (0 when unknown)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 64


def fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in for a real decoder+featurizer: a seeded
    pseudo-embedding derived from the payload digest.  Stable across
    processes (no Python hash randomization involved)."""
    digest = hashlib.md5(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM).astype(np.float32)


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Where a real decoder goes (Pillow / torchaudio / PyAV).  The
    sandbox image has none of these, so this is an explicit stub."""
    raise NotImplementedError(
        "real media decoding requires Pillow/torchaudio/ffmpeg, which are "
        "not available in this environment; use decode='fake'"
    )


class MediaFeaturizer:
    """Actor-pool stage: ``ds.map_batches(MediaFeaturizer,
    fn_constructor_kwargs={...}, concurrency=N, batch_size=128,
    batch_format="pyarrow")``.

    Model/codec setup happens ONCE per actor here in ``__init__`` (the
    stateful-stage contract, SURVEY.md T1); ``__call__`` decodes and
    featurizes a batch, appending a fixed-size-list<float32> column."""

    def __init__(self, decode: str = "fake", out_col: str = "features"):
        self.decode = fake_decode if decode == "fake" else real_decode
        self.out_col = out_col
        # stand-in for loading a model checkpoint once per actor
        self.projection = np.random.default_rng(42).standard_normal(
            (FEATURE_DIM, FEATURE_DIM)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack([
            self.projection @ self.decode(p, k)
            for p, k in zip(batch["payload"].to_pylist(),
                            batch["kind"].to_pylist())
        ])
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), FEATURE_DIM)
        return batch.drop_columns(["payload"]).append_column(self.out_col, col)


def resize_stub(batch: pa.Table, max_side: int = 256) -> pa.Table:
    """Image-resize-shaped transform: passes payloads through while
    recording the target geometry (the real kernel is a decode+resize
    inside the featurizer actor at production)."""
    import pyarrow.compute as pc
    w = pc.min_element_wise(batch["width"], max_side)
    h = pc.min_element_wise(batch["height"], max_side)
    batch = batch.set_column(batch.column_names.index("width"), "width",
                             pc.cast(w, pa.int32()))
    return batch.set_column(batch.column_names.index("height"), "height",
                            pc.cast(h, pa.int32()))


def synth_media_table(n: int = 256, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.integers(0, 256, size=int(rng.integers(64, 512)),
                                 dtype=np.uint8).tobytes() for _ in range(n)],
        "width": [int(rng.integers(16, 1920)) for _ in range(n)],
        "height": [int(rng.integers(16, 1080)) for _ in range(n)],
        "duration_ms": [int(rng.integers(0, 60_000)) for _ in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


class FrameSampler:
    """Actor-pool flat-map stage: one media row in, one row PER SAMPLED
    FRAME out -- the video frame-sample / audio window-split shape
    (images pass through as a single frame).  Sampling is
    deterministic from the payload size (fixed chunking: video 64-byte
    "frames" capped at 8, audio 32-byte windows capped at 16), so the
    row explosion is SQL-mirrorable; the real ffmpeg/torchaudio
    segmentation plugs into ``real_decode``'s slot (``decode="real"``
    raises the explicit stub error).  Once-per-actor setup holds the
    (stand-in) codec table; batches stay Arrow end to end."""

    CHUNK = {"video": (64, 8), "audio": (32, 16), "image": (None, 1)}

    def __init__(self, decode: str = "fake"):
        if decode == "real":
            real_decode(b"", "video")   # raises the explicit stub error
        self.codec = dict(self.CHUNK)   # per-actor "codec" state

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, idxs, frames = [], [], [], []
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            payload = payload or b""
            chunk, cap = self.codec.get(kind, (None, 1))
            if chunk is None:
                parts = [payload]
            else:
                parts = [payload[i * chunk:(i + 1) * chunk]
                         for i in range(min(cap, -(-len(payload) // chunk)
                                            if payload else 0))]
                parts = parts or [b""]
            for j, p in enumerate(parts):
                ids.append(mid)
                kinds.append(kind)
                idxs.append(j)
                frames.append(p)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })
