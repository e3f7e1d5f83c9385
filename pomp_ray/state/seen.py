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
* an approximate RAM filter maintained VECTORIZED -- Bloom bitmap by
  default, cuckoo filter via ``filter_kind="cuckoo"``
  (``pomp_ray/state/approx.py``; the cuckoo variant supports deletion,
  for recrawl policies that re-admit expired URLs).  At production
  scale the exact set can spill/live on slower storage while the
  filter answers the overwhelmingly common "never seen" case from RAM;
  in-memory the hot path is the plain set lookup.

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

from pomp_ray.state.approx import make_filter


def url_digests(urls: list[str]) -> list[bytes]:
    """16-byte md5 digest per canonical url (the shard + membership key)."""
    return [hashlib.md5(u.encode("utf-8", "surrogateescape")).digest() for u in urls]


def shard_of(digest: bytes, n_shards: int) -> int:
    return int.from_bytes(digest[:8], "little") % n_shards


_BLOOM_BITS = 1 << 23  # 8 Mbit / shard default; sized up in prod deployments


@ray.remote(num_cpus=0)
class SeenShard:
    """One shard of the URL-seen set.  num_cpus=0: the shards are mostly
    idle hash-set servers and must never consume scheduling slots the map
    stages need (a 0.25-cpu pool deadlocks a small `num_cpus=2` session:
    8 shards reserve everything and no map task can start).  On a real
    multi-node cluster you would pin them via a placement group instead."""

    def __init__(self, shard_id: int, bloom_bits: int = _BLOOM_BITS,
                 filter_kind: str = "bloom"):
        self.shard_id = shard_id
        self.exact: set[bytes] = set()
        self.filter_kind = filter_kind
        self.approx = (make_filter("bloom", bloom_bits=bloom_bits)
                       if filter_kind == "bloom"
                       else make_filter(filter_kind))
        self.pending_snapshot: list[bytes] = []
        # round-snapshot staging (content-dedup): digests checked via
        # contains_stage are buffered here and only become visible to
        # later contains_stage calls after commit_staged()
        self.staged: list[bytes] = []
        self.n_checks = 0

    def check_and_add(self, digests: list[bytes]) -> list[bool]:
        """For each digest (in order): True if NEW (now added), False if
        already seen.  Duplicates within the call: first wins.  Hot path
        is plain set ops; the approx filter is maintained in bulk."""
        self.n_checks += len(digests)
        exact = self.exact
        out = []
        new: list[bytes] = []
        for d in digests:
            if d in exact:
                out.append(False)
            else:
                exact.add(d)
                new.append(d)
                out.append(True)
        if new:
            self.approx.add_bulk(new)
            self.pending_snapshot.extend(new)
        return out

    def contains(self, digests: list[bytes]) -> list[bool]:
        """Membership check: vectorized approx-filter prefilter
        (definite-no fast path), exact set for the maybes."""
        maybe = self.approx.contains_bulk(digests)
        exact = self.exact
        return [bool(m) and d in exact for m, d in zip(maybe, digests)]

    def contains_stage(self, digests: list[bytes]) -> list[bool]:
        """Round-snapshot membership (content-dedup protocol): answer
        against the COMMITTED set only, and stage the digests for the
        round-end commit.  Two pages fetched in the same round thus
        never see each other's digest -- the only semantics a
        concurrent wave of fetches can honestly implement, and the one
        core.oracle mirrors."""
        self.n_checks += len(digests)
        out = self.contains(digests)
        self.staged.extend(digests)
        return out

    def commit_staged(self) -> int:
        """Merge the staged digests into the committed set (round
        barrier of the content-dedup protocol); returns how many were
        new.  New digests join the next snapshot delta."""
        new = [d for d in self.staged if d not in self.exact]
        # de-dup within the staged buffer itself (first occurrence wins)
        if new:
            fresh: list[bytes] = []
            seen_local: set[bytes] = set()
            for d in new:
                if d not in seen_local:
                    seen_local.add(d)
                    fresh.append(d)
            self.exact.update(fresh)
            self.approx.add_bulk(fresh)
            self.pending_snapshot.extend(fresh)
            new = fresh
        self.staged = []
        return len(new)

    def forget(self, digests: list[bytes]) -> int:
        """Remove digests from the shard (recrawl admission: an expired
        URL may be fetched again).  The approx filter drops them too when
        it supports deletion (cuckoo); a Bloom filter keeps the stale
        bits -- still correct, just a higher maybe rate."""
        removed = [d for d in digests if d in self.exact]
        self.exact.difference_update(removed)
        if removed and self.approx.supports_delete:
            # only digests actually present may be deleted (the cuckoo
            # contract: deleting a never-added item could strip another
            # item's colliding fingerprint)
            self.approx.delete_bulk(removed)
        return len(removed)

    def size(self) -> int:
        return len(self.exact)

    def reset(self) -> None:
        self.exact.clear()
        self.approx.reset()
        self.pending_snapshot = []
        self.staged = []
        self.n_checks = 0

    def stats(self) -> dict:
        return {"shard": self.shard_id, "size": len(self.exact),
                "checks": self.n_checks}

    def snapshot(self, ckpt_dir: str, rnd: int) -> int:
        """Write the delta since the last snapshot; returns rows written."""
        os.makedirs(ckpt_dir, exist_ok=True)
        delta = self.pending_snapshot
        path = os.path.join(
            ckpt_dir, f"seen-shard{self.shard_id:04d}-round{rnd:06d}.parquet")
        pq.write_table(
            pa.table({"digest": pa.array(delta, pa.binary(16))}), path
        )
        self.pending_snapshot = []
        return len(delta)

    def restore(self, ckpt_dir: str, upto_round: int) -> int:
        """Replay all snapshot deltas for this shard up to (incl.) a round."""
        self.exact.clear()
        self.approx.reset()
        self.pending_snapshot = []
        self.staged = []
        if os.path.isdir(ckpt_dir):
            for name in sorted(os.listdir(ckpt_dir)):
                if not name.startswith(f"seen-shard{self.shard_id:04d}-"):
                    continue
                rnd = int(name.split("-round")[1].split(".")[0])
                if rnd > upto_round:
                    continue
                ds = pq.read_table(os.path.join(ckpt_dir, name))["digest"]
                digs = ds.to_pylist()
                self.exact.update(digs)
                self.approx.add_bulk(digs)
        return len(self.exact)


class SeenSet:
    """Driver-side handle over the shard pool."""

    def __init__(self, n_shards: int = 8, bloom_bits: int = _BLOOM_BITS,
                 filter_kind: str = "bloom"):
        self.n_shards = n_shards
        self.shards = [
            SeenShard.remote(i, bloom_bits, filter_kind)
            for i in range(n_shards)
        ]

    def check_and_add(self, urls: list[str]) -> list[bool]:
        """Batch check-and-add from the driver (stages use SeenFilter)."""
        return check_and_add_via(self.shards, urls)

    def contains_stage(self, keys: list[str]) -> list[bool]:
        """Round-snapshot membership + staging from the driver (see
        SeenShard.contains_stage); keys are md5-digested like urls."""
        return contains_stage_via(self.shards, keys)

    def commit_staged(self) -> int:
        """Round-end commit of every shard's staged digests."""
        return sum(ray.get([s.commit_staged.remote() for s in self.shards]))

    def forget(self, urls: list[str]) -> int:
        """Remove canonical urls from the seen set (recrawl admission);
        returns how many were present.  Routed per shard like
        check_and_add."""
        if not urls:
            return 0
        digests = url_digests(urls)
        n = len(self.shards)
        raw = np.frombuffer(b"".join(digests), dtype=np.uint64).reshape(-1, 2)
        sid = (raw[:, 0] % n).astype(np.int64)
        futs = []
        for s in np.unique(sid):
            idxs = np.nonzero(sid == s)[0]
            futs.append(self.shards[int(s)].forget.remote(
                [digests[i] for i in idxs]))
        return sum(ray.get(futs))

    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def reset(self) -> None:
        ray.get([s.reset.remote() for s in self.shards])

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
    the driver.  Shard routing is vectorized on the digest uint64 view."""
    n = len(shards)
    if not urls:
        return []
    digests = url_digests(urls)
    raw = np.frombuffer(b"".join(digests), dtype=np.uint64).reshape(-1, 2)
    shard_ids_per_url = (raw[:, 0] % n).astype(np.int64)
    by_shard: dict[int, np.ndarray] = {
        int(s): np.nonzero(shard_ids_per_url == s)[0]
        for s in np.unique(shard_ids_per_url)
    }
    results = ray.get(
        [shards[s].check_and_add.remote([digests[i] for i in idxs])
         for s, idxs in by_shard.items()]
    )
    mask = [False] * len(urls)
    for (s, idxs), res in zip(by_shard.items(), results):
        for i, is_new in zip(idxs, res):
            mask[i] = is_new
    return mask


def contains_stage_via(shards: list, keys: list[str]) -> list[bool]:
    """Route a batch of keys (any strings -- content-dedup uses extracted
    text) to their shards, run the round-snapshot contains_stage on each,
    reassemble the per-key was-already-committed mask in input order.
    Same vectorized routing as check_and_add_via."""
    n = len(shards)
    if not keys:
        return []
    digests = url_digests(keys)
    raw = np.frombuffer(b"".join(digests), dtype=np.uint64).reshape(-1, 2)
    shard_ids = (raw[:, 0] % n).astype(np.int64)
    by_shard: dict[int, np.ndarray] = {
        int(s): np.nonzero(shard_ids == s)[0] for s in np.unique(shard_ids)
    }
    results = ray.get(
        [shards[s].contains_stage.remote([digests[i] for i in idxs])
         for s, idxs in by_shard.items()]
    )
    mask = [False] * len(keys)
    for (s, idxs), res in zip(by_shard.items(), results):
        for i, dup in zip(idxs, res):
            mask[i] = dup
    return mask
