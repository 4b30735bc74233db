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


def sha1_to_u64(sha1_hex: str) -> int:
    return int(sha1_hex[:16], 16)


def sha1s_to_u64(sha1_hexes: list[str]) -> np.ndarray:
    return np.array([int(s[:16], 16) for s in sha1_hexes], dtype=np.uint64)
