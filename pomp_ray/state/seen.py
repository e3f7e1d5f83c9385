"""Sharded URL-seen set held in an actor pool (north_rule: "sharded
Bloom/cuckoo-filter URL-seen set held in an actor pool keyed by
canonical-URL hash").

pomp itself has NO dedup -- it is left to user middleware (SURVEY.md
section 2.3 T3); but the north_rule simultaneously requires the final
seen set to EQUAL the reference crawl's, so a probabilistic-only filter
is not allowed (a Bloom false positive would silently drop a URL).
Design: each shard holds

* an EXACT set of 16-byte md5 digests of canonical URLs (the source of
  truth; 128-bit digests make collisions vanishingly improbable even at
  the 10^10-URL target scale: ~10^20 pairs x 2^-128 ~= 3e-19), and
* a Bloom bitmap as a fast-path negative check -- at production scale the
  exact set can spill/live on slower storage while the bloom answers the
  overwhelmingly common "never seen" case from RAM.

``check_and_add`` is atomic per shard (actor method = serialized), which
is what prevents double-fetch races without any cross-shard coordination:
a URL always routes to the same shard (digest % n_shards).

Checkpointing is incremental: ``snapshot`` writes only digests added
since the previous snapshot (one parquet delta per shard per round);
``restore`` replays all deltas.  This is the "resumes from Parquet
checkpoints of ... seen-set state" of the north_rule.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def url_digests(urls: list[str]) -> list[bytes]:
    """16-byte md5 digest per canonical url (the shard + membership key)."""
    return [hashlib.md5(u.encode("utf-8", "surrogateescape")).digest() for u in urls]


def shard_of(digest: bytes, n_shards: int) -> int:
    return int.from_bytes(digest[:8], "little") % n_shards


_BLOOM_BITS = 1 << 23  # 8 Mbit / shard default; sized up in prod deployments


@ray.remote(num_cpus=0.25)
class SeenShard:
    """One shard of the URL-seen set. num_cpus=0.25 so a 16-shard pool
    doesn't reserve half the cluster for (mostly idle) set lookups."""

    def __init__(self, shard_id: int, bloom_bits: int = _BLOOM_BITS):
        self.shard_id = shard_id
        self.exact: set[bytes] = set()
        self.bloom_bits = bloom_bits
        self.bloom = np.zeros(bloom_bits // 8, dtype=np.uint8)
        self.pending_snapshot: list[bytes] = []
        self.n_checks = 0

    def _bloom_pos(self, digest: bytes) -> tuple[int, int]:
        h1 = int.from_bytes(digest[4:12], "little") % self.bloom_bits
        h2 = int.from_bytes(digest[8:16], "little") % self.bloom_bits
        return h1, h2

    def _bloom_maybe(self, digest: bytes) -> bool:
        h1, h2 = self._bloom_pos(digest)
        return bool(
            self.bloom[h1 >> 3] & (1 << (h1 & 7))
            and self.bloom[h2 >> 3] & (1 << (h2 & 7))
        )

    def _bloom_add(self, digest: bytes) -> None:
        for h in self._bloom_pos(digest):
            self.bloom[h >> 3] |= 1 << (h & 7)

    def check_and_add(self, digests: list[bytes]) -> list[bool]:
        """For each digest (in order): True if NEW (now added), False if
        already seen.  Duplicates within the call: first wins."""
        out = []
        self.n_checks += len(digests)
        for d in digests:
            if self._bloom_maybe(d) and d in self.exact:
                out.append(False)
            else:
                self.exact.add(d)
                self._bloom_add(d)
                self.pending_snapshot.append(d)
                out.append(True)
        return out

    def contains(self, digests: list[bytes]) -> list[bool]:
        return [self._bloom_maybe(d) and d in self.exact for d in digests]

    def size(self) -> int:
        return len(self.exact)

    def stats(self) -> dict:
        return {"shard": self.shard_id, "size": len(self.exact),
                "checks": self.n_checks}

    def snapshot(self, ckpt_dir: str, rnd: int) -> int:
        """Write the delta since the last snapshot; returns rows written."""
        os.makedirs(ckpt_dir, exist_ok=True)
        delta = self.pending_snapshot
        path = os.path.join(ckpt_dir, f"seen-shard{self.shard_id:04d}-round{rnd:06d}.parquet")
        pq.write_table(
            pa.table({"digest": pa.array(delta, pa.binary(16))}), path
        )
        self.pending_snapshot = []
        return len(delta)

    def restore(self, ckpt_dir: str, upto_round: int) -> int:
        """Replay all snapshot deltas for this shard up to (incl.) a round."""
        self.exact.clear()
        self.bloom[:] = 0
        self.pending_snapshot = []
        if os.path.isdir(ckpt_dir):
            for name in sorted(os.listdir(ckpt_dir)):
                if not name.startswith(f"seen-shard{self.shard_id:04d}-"):
                    continue
                rnd = int(name.split("-round")[1].split(".")[0])
                if rnd > upto_round:
                    continue
                for d in pq.read_table(os.path.join(ckpt_dir, name))["digest"].to_pylist():
                    self.exact.add(d)
                    self._bloom_add(d)
        return len(self.exact)


class SeenSet:
    """Driver-side handle over the shard pool."""

    def __init__(self, n_shards: int = 8, bloom_bits: int = _BLOOM_BITS):
        self.n_shards = n_shards
        self.shards = [
            SeenShard.remote(i, bloom_bits) for i in range(n_shards)
        ]

    def check_and_add(self, urls: list[str]) -> list[bool]:
        """Batch check-and-add from the driver (stages use SeenFilter)."""
        return check_and_add_via(self.shards, urls)

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def snapshot(self, ckpt_dir: str, rnd: int) -> int:
        return sum(ray.get([s.snapshot.remote(ckpt_dir, rnd) for s in self.shards]))

    def restore(self, ckpt_dir: str, upto_round: int) -> int:
        return sum(ray.get([s.restore.remote(ckpt_dir, upto_round) for s in self.shards]))

    def stats(self) -> list[dict]:
        return ray.get([s.stats.remote() for s in self.shards])

    def kill(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


def check_and_add_via(shards: list, urls: list[str]) -> list[bool]:
    """Route a batch of canonical urls to their shards, run check_and_add
    on each shard in parallel, reassemble the per-url is-new mask in input
    order.  Called from inside map_batches workers (SeenFilter) and from
    the driver."""
    n = len(shards)
    digests = url_digests(urls)
    by_shard: dict[int, list[int]] = {}
    for idx, d in enumerate(digests):
        by_shard.setdefault(shard_of(d, n), []).append(idx)
    shard_ids = list(by_shard)
    results = ray.get(
        [shards[s].check_and_add.remote([digests[i] for i in by_shard[s]])
         for s in shard_ids]
    )
    mask = [False] * len(urls)
    for s, res in zip(shard_ids, results):
        for i, is_new in zip(by_shard[s], res):
            mask[i] = is_new
    return mask
