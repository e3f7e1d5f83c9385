"""Approximate-membership filters for the sharded URL-seen set
(north_rule: "sharded Bloom/cuckoo-filter URL-seen set").

Both structures answer "definitely not seen" from RAM so the exact
digest set (which at 10^10-URL scale lives on slower storage) is only
consulted for the rare maybe.  Shared bulk API over 16-byte md5 digests
(``pomp_ray.state.seen.url_digests``):

* ``add_bulk(digests)``
* ``contains_bulk(digests) -> np.ndarray[bool]`` -- no false negatives
  for added items; false positives possible (the exact set resolves them)

``CuckooFilter`` additionally supports ``delete_bulk`` (the property
Bloom lacks): a recrawl policy that re-admits expired URLs can remove
them from the RAM filter instead of rebuilding it.  Standard design
(Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14):
4-slot buckets, 16-bit fingerprints, partial-key cuckoo hashing --
bucket2 = bucket1 XOR H(fingerprint) -- with a bounded eviction walk.

Vectorization: membership is a pure numpy gather-compare over both
candidate buckets (the hot path -- every frontier candidate is checked
every round); inserts walk a Python loop per NEW digest only (a URL is
inserted exactly once, and the loop is branchy by nature).  All hashing
derives from the md5 digest bytes -- never builtin hash(), which is
salted per process and would desynchronize filters across workers.
"""

from __future__ import annotations

import numpy as np

_FP_MIX = np.uint64(0x5BD1E995)          # murmur-ish odd multiplier


def _digest_words(digests: list[bytes]) -> np.ndarray:
    """(n, 2) uint64 view of 16-byte digests."""
    if not digests:
        return np.empty((0, 2), np.uint64)
    return np.frombuffer(b"".join(digests), dtype=np.uint64).reshape(-1, 2)


class BloomFilter:
    """Two-position Bloom bitmap, bulk-vectorized (extracted from the
    round-1 SeenShard implementation; same layout + semantics)."""

    supports_delete = False

    def __init__(self, bloom_bits: int = 1 << 23):
        self.bloom_bits = bloom_bits
        self.bits = np.zeros(bloom_bits // 8, dtype=np.uint8)

    def _positions(self, digests: list[bytes]) -> np.ndarray:
        raw = _digest_words(digests)
        m = self.bloom_bits
        return np.stack([raw[:, 0] % m, raw[:, 1] % m], axis=1).astype(np.int64)

    def add_bulk(self, digests: list[bytes]) -> None:
        pos = self._positions(digests).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_bulk(self, digests: list[bytes]) -> np.ndarray:
        pos = self._positions(digests)
        b = self.bits
        hit = ((b[pos[:, 0] >> 3] >> (pos[:, 0] & 7)) & 1) \
            & ((b[pos[:, 1] >> 3] >> (pos[:, 1] & 7)) & 1)
        return hit.astype(bool)

    def reset(self) -> None:
        self.bits[:] = 0


class CuckooFilter:
    """Partial-key cuckoo filter: ``n_buckets`` x ``slots`` uint16 table,
    fingerprint 0 = empty slot.  ``n_buckets`` must be a power of two
    (the XOR bucket trick requires it).  At ~95% load inserts start
    failing; failures land in a small exact ``overflow`` set so
    contains_bulk NEVER false-negatives regardless of load."""

    supports_delete = True

    def __init__(self, n_buckets: int = 1 << 18, slots: int = 4,
                 max_kicks: int = 500):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_buckets = n_buckets
        self.slots = slots
        self.max_kicks = max_kicks
        self.table = np.zeros((n_buckets, slots), dtype=np.uint16)
        self.overflow: set[bytes] = set()
        self.n_items = 0

    # -- hashing ----------------------------------------------------------
    def _fp_b1(self, digests: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
        raw = _digest_words(digests)
        # fingerprint from word 0 (range 1..65535: 0 means empty slot),
        # primary bucket from word 1 -- independent bits of the digest
        fp = (raw[:, 0] % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
        b1 = (raw[:, 1] & np.uint64(self.n_buckets - 1)).astype(np.int64)
        return fp, b1

    def _alt(self, b: np.ndarray | int, fp: np.ndarray | int):
        # partial-key hashing: alt = b XOR H(fp); involutory, so the same
        # formula maps either bucket to the other
        h = (np.uint64(fp) * _FP_MIX if np.isscalar(fp)
             else fp.astype(np.uint64) * _FP_MIX)
        return (np.int64(b) ^ (h & np.uint64(self.n_buckets - 1)).astype(np.int64))

    # -- bulk API ---------------------------------------------------------
    def contains_bulk(self, digests: list[bytes]) -> np.ndarray:
        fp, b1 = self._fp_b1(digests)
        b2 = self._alt(b1, fp)
        hit = ((self.table[b1] == fp[:, None]).any(axis=1)
               | (self.table[b2] == fp[:, None]).any(axis=1))
        if self.overflow:
            ov = np.fromiter((d in self.overflow for d in digests),
                             dtype=bool, count=len(digests))
            hit |= ov
        return hit

    def add_bulk(self, digests: list[bytes]) -> None:
        fp, b1 = self._fp_b1(digests)
        b2 = self._alt(b1, fp)
        for i, d in enumerate(digests):
            f = np.uint16(fp[i])
            if self._try_place(int(b1[i]), f) or self._try_place(int(b2[i]), f):
                self.n_items += 1
                continue
            # eviction walk: deterministic victim slot (derived from the
            # fingerprint, not random(): reproducible across workers).
            # The walk is RECORDED so a failed insert rolls every
            # displaced fingerprint back home -- otherwise the final
            # homeless victim would be some OTHER item's fingerprint and
            # contains_bulk would false-negative on it.
            b = int(b1[i]) if (fp[i] & 1) else int(b2[i])
            cur = f
            placed = False
            path: list[tuple[int, int, np.uint16]] = []
            for kick in range(self.max_kicks):
                slot = (int(cur) + kick) % self.slots
                victim = self.table[b, slot]
                self.table[b, slot] = cur
                path.append((b, slot, victim))
                cur = victim
                b = int(self._alt(b, int(cur)))
                if self._try_place(b, cur):
                    placed = True
                    break
            if placed:
                self.n_items += 1
            else:
                # reverse restore: each step's victim returns to its slot,
                # leaving exactly the new item homeless -> overflow set
                for b_, s_, v_ in reversed(path):
                    self.table[b_, s_] = v_
                self.overflow.add(d)

    def _try_place(self, bucket: int, fp: np.uint16) -> bool:
        row = self.table[bucket]
        empty = np.nonzero(row == 0)[0]
        if empty.size:
            row[empty[0]] = fp
            return True
        return False

    def delete_bulk(self, digests: list[bytes]) -> np.ndarray:
        """Remove one copy of each digest's fingerprint; returns per-item
        deleted flags.  Only valid for items previously added (the
        standard cuckoo-filter contract)."""
        fp, b1 = self._fp_b1(digests)
        b2 = self._alt(b1, fp)
        out = np.zeros(len(digests), dtype=bool)
        for i, d in enumerate(digests):
            if d in self.overflow:
                self.overflow.discard(d)
                out[i] = True
                continue
            done = False
            for b in (int(b1[i]), int(b2[i])):
                row = self.table[b]
                hit = np.nonzero(row == fp[i])[0]
                if hit.size:
                    row[hit[0]] = 0
                    self.n_items -= 1
                    out[i] = done = True
                    break
            if not done:
                out[i] = False
        return out

    def load_factor(self) -> float:
        return self.n_items / float(self.n_buckets * self.slots)

    def reset(self) -> None:
        self.table[:] = 0
        self.overflow.clear()
        self.n_items = 0


def make_filter(kind: str, **kw):
    """Factory for SeenShard: kind = "bloom" | "cuckoo"."""
    if kind == "bloom":
        return BloomFilter(**kw)
    if kind == "cuckoo":
        return CuckooFilter(**kw)
    raise ValueError(f"unknown filter kind: {kind!r}")
