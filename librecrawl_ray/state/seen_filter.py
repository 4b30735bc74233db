"""Sharded URL-seen filter actors (north rule; SURVEY.md §2.4 T1, §2.5 J8).

One ``SeenShard`` actor per hash partition of ``sha1(norm_url)``; admission
is the actor's atomic test-and-set so at-least-once delivery of a candidate
(task retries, duplicate discovery across waves) still yields exactly-once
admission. Replaces the reference's single shared ``visited``/``discovered``
sets (link_manager.py:10-25, :83-110).

Scale: each shard holds a BloomFilter (~1.2 bytes/key at 1% FP → a 10^10
frontier across 64 shards ≈ 190 MB/actor) plus, in ``exact`` mode (default
at conformance scale), an exact u64-key set for FP-free membership and
exact snapshot equality in tests.
"""

from __future__ import annotations

import numpy as np
import ray

from .filters import BloomFilter, sha1s_to_u64


@ray.remote(num_cpus=0)
class SeenShard:
    # num_cpus=0: shards are memory-resident index actors that answer short
    # membership RPCs; they must never reserve scheduler slots away from the
    # fetch/canonicalize pools (at cluster scale give them placement-group
    # spread instead).
    """One hash partition of the URL-seen state."""

    def __init__(self, shard_id: int, capacity: int = 1_000_000,
                 fp_rate: float = 0.01, exact: bool = True):
        self.shard_id = shard_id
        self.bloom = BloomFilter(capacity, fp_rate)
        self.exact_mode = exact
        self.exact: set[int] = set()

    def admit(self, sha1s: list[str]) -> list[bool]:
        """Atomic test-and-add; True = newly admitted (first sighting).
        Duplicate keys within one call: first occurrence wins."""
        keys = sha1s_to_u64(sha1s)
        out = []
        if self.exact_mode:
            for k in keys.tolist():
                if k in self.exact:
                    out.append(False)
                else:
                    self.exact.add(k)
                    out.append(True)
            self.bloom.add_many(keys[np.array(out, dtype=bool)]
                                if any(out) else keys[:0])
        else:
            present = self.bloom.contains_many(keys)
            batch_seen: set[int] = set()
            for k, p in zip(keys.tolist(), present.tolist()):
                if p or k in batch_seen:
                    out.append(False)
                else:
                    batch_seen.add(k)
                    out.append(True)
            self.bloom.add_many(keys[np.array(out, dtype=bool)]
                                if any(out) else keys[:0])
        return out

    def add_bulk(self, keys_u64: np.ndarray) -> int:
        """Resume path: re-insert previously committed keys."""
        arr = np.asarray(keys_u64, dtype=np.uint64)
        if self.exact_mode:
            self.exact.update(arr.tolist())
        self.bloom.add_many(arr)
        return len(arr)

    def contains(self, sha1s: list[str]) -> list[bool]:
        keys = sha1s_to_u64(sha1s)
        if self.exact_mode:
            return [int(k) in self.exact for k in keys]
        return self.bloom.contains_many(keys).tolist()

    def contains_u64(self, keys_u64: np.ndarray) -> np.ndarray:
        """Vectorized membership probe (bool array aligned to input)."""
        arr = np.asarray(keys_u64, dtype=np.uint64)
        if self.exact_mode:
            exact = self.exact
            return np.fromiter((int(k) in exact for k in arr),
                               dtype=bool, count=len(arr))
        return self.bloom.contains_many(arr)

    def stats(self) -> dict:
        return {"shard": self.shard_id,
                "exact_count": len(self.exact),
                "bloom_count": self.bloom.count,
                "bloom_bytes": self.bloom.nbytes()}

    def snapshot_keys(self) -> np.ndarray:
        """Exact-mode only: the full key set (tests / debugging)."""
        return np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))


def make_shards(num_shards: int, capacity_per_shard: int = 1_000_000,
                exact: bool = True) -> list:
    return [SeenShard.remote(i, capacity_per_shard, exact=exact)
            for i in range(num_shards)]
