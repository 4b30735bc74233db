"""Probabilistic membership filters for the sharded URL-seen state.

North rule: "sharded bloom/cuckoo URL-seen filters (one filter actor per
hash partition)". At 10^10 URLs a bloom filter at 1% FP costs ~1.2 GB per
10^9 keys (9.6 bits/key); sharded over K actors across the cluster that is
the only representation that fits. At conformance scale the shard actors
additionally keep an exact set so tests can assert exact seen-set equality
(and measure the bloom's FP rate instead of being subject to it).

Pure numpy bit-array implementation; no external deps.
"""

from __future__ import annotations

import numpy as np


class BloomFilter:
    """Classic k-hash bloom filter over 64-bit key hashes.

    Keys are the first 16 hex chars of the URL sha1 (uniform 64-bit values),
    so the k probe positions are derived by splitting/mixing that value —
    no re-hashing cost per probe.
    """

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        self.capacity = capacity
        self.fp_rate = fp_rate
        # m = -n ln p / (ln 2)^2 ; k = m/n ln 2
        m = max(64, int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.num_bits = 1 << int(np.ceil(np.log2(m)))     # power of two mask
        self.mask = self.num_bits - 1
        self.k = max(1, int(round(self.num_bits / capacity * np.log(2))))
        self.bits = np.zeros(self.num_bits // 8, dtype=np.uint8)
        self.count = 0

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(n, k) probe positions via double hashing h1 + i*h2."""
        h1 = keys & np.uint64(self.mask)
        h2 = ((keys >> np.uint64(17)) | np.uint64(1)) & np.uint64(self.mask)
        i = np.arange(self.k, dtype=np.uint64)
        return (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(self.mask)

    def add_many(self, keys: np.ndarray) -> None:
        pos = self._positions(keys.astype(np.uint64)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3,
                         np.uint8(1) << (pos & 7).astype(np.uint8))
        self.count += len(keys)

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys.astype(np.uint64))
        byte = self.bits[pos >> 3]
        bit = (byte >> (pos & 7).astype(np.uint8)) & 1
        return bit.all(axis=1).astype(bool)

    def nbytes(self) -> int:
        return self.bits.nbytes


class CuckooFilter:
    """Cuckoo filter (Fan et al. 2014, "Cuckoo Filter: Practically Better
    Than Bloom") over 64-bit key hashes — the north rule's second
    URL-seen representation. vs bloom: supports DELETION (retract a
    host's URLs when its robots.txt turns disallow-all mid-crawl, or
    roll back an uncommitted wave) and answers lookups from ≤2 cache
    lines instead of k scattered bit probes, at a similar ~1.5 bytes/key
    for a 16-bit fingerprint at 95% load.

    Layout: ``num_buckets × 4`` uint16 slots, fingerprint = top 16 key
    bits (0 reserved for empty → remapped to 1). Partial-key cuckoo
    hashing: i2 = i1 XOR h(fp), so relocation needs only the stored
    fingerprint — the property that makes the filter shardable (each
    actor's table is self-contained, same as the bloom shards).

    ``contains_many`` / ``delete_many`` are vectorized numpy;
    ``add_many`` walks keys in Python because each insert may kick a
    resident fingerprint (sequential dependency). At the engine's shard
    fan-out that is ~10^4 inserts per actor per wave — the admission RPC
    stays sub-second, and membership probes (the hot path) are bulk.
    """

    MAX_KICKS = 500

    def __init__(self, capacity: int, slots_per_bucket: int = 4,
                 load_factor: float = 0.95):
        need = max(64, int(capacity / (slots_per_bucket * load_factor)))
        self.num_buckets = 1 << int(np.ceil(np.log2(need)))
        self.mask = np.uint64(self.num_buckets - 1)
        self.slots = slots_per_bucket
        self.table = np.zeros((self.num_buckets, slots_per_bucket),
                              dtype=np.uint16)
        self.count = 0
        self.capacity = capacity

    @staticmethod
    def _fp(keys: np.ndarray) -> np.ndarray:
        f = (keys >> np.uint64(48)).astype(np.uint16)
        return np.where(f == 0, np.uint16(1), f)

    def _alt(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key hash of the fingerprint (odd multiplier mix)
        h = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        return (idx ^ h) & self.mask

    def add_many(self, keys: np.ndarray) -> None:
        keys = keys.astype(np.uint64)
        fps = self._fp(keys)
        i1s = keys & self.mask
        tbl = self.table
        for fp, i1 in zip(fps.tolist(), i1s.tolist()):
            placed = False
            for idx in (i1, int(self._alt(np.uint64(i1),
                                          np.uint16(fp)))):
                row = tbl[idx]
                empty = np.flatnonzero(row == 0)
                if empty.size:
                    row[empty[0]] = fp
                    placed = True
                    break
            if placed:
                self.count += 1
                continue
            # relocate: the victim slot is derived from the CURRENT walk
            # state (bucket, in-hand fp, kick number) — a sequence fixed
            # per insert and independent of the walk can cycle through
            # the same slots and report over-capacity while holes remain;
            # state-derived choice breaks cycles yet stays deterministic
            # (reproducible shards, no RNG state to checkpoint)
            idx, cur = i1, fp
            path: list[tuple[int, int]] = []   # swap log for unwind
            for kick in range(self.MAX_KICKS):
                mix = ((idx * 0x9E3779B97F4A7C15)
                       ^ (cur * 0xC2B2AE3D27D4EB4F)
                       ^ (kick * 0x165667B19E3779F9)) \
                    & 0xFFFFFFFFFFFFFFFF
                victim = int((mix >> 29) & 0xFFFF) % self.slots
                path.append((idx, victim))
                cur, tbl[idx][victim] = int(tbl[idx][victim]), cur
                idx = int(self._alt(np.uint64(idx), np.uint16(cur)))
                row = tbl[idx]
                empty = np.flatnonzero(row == 0)
                if empty.size:
                    row[empty[0]] = cur
                    cur = None
                    break
            if cur is not None:
                # unwind the kick path so every PREVIOUSLY admitted
                # fingerprint is back in the table (abandoning the
                # in-flight victim would silently turn an admitted key
                # into a false negative); only the NEW key fails
                for b, s in reversed(path):
                    cur, tbl[b][s] = int(tbl[b][s]), cur
                raise RuntimeError(
                    "cuckoo filter over capacity — size shards for "
                    f"{self.capacity} keys at 95% load")
            self.count += 1

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        keys = keys.astype(np.uint64)
        fps = self._fp(keys)
        i1 = keys & self.mask
        i2 = self._alt(i1, fps)
        hit1 = (self.table[i1] == fps[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def delete_many(self, keys: np.ndarray) -> np.ndarray:
        """Remove ONE stored copy per present key; returns a bool array
        (True = was present and removed). The bloom filter cannot do
        this at all."""
        keys = keys.astype(np.uint64)
        fps = self._fp(keys)
        i1s = keys & self.mask
        out = np.zeros(len(keys), dtype=bool)
        for n, (fp, i1) in enumerate(zip(fps.tolist(), i1s.tolist())):
            for idx in (i1, int(self._alt(np.uint64(i1),
                                          np.uint16(fp)))):
                row = self.table[idx]
                hit = np.flatnonzero(row == fp)
                if hit.size:
                    row[hit[0]] = 0
                    out[n] = True
                    self.count -= 1
                    break
        return out

    def nbytes(self) -> int:
        return self.table.nbytes


def sha1_to_u64(sha1_hex: str) -> int:
    return int(sha1_hex[:16], 16)


def sha1s_to_u64(sha1_hexes: list[str]) -> np.ndarray:
    return np.array([int(s[:16], 16) for s in sha1_hexes], dtype=np.uint64)
