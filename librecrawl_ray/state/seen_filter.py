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
                 fp_rate: float = 0.01, exact: bool = True,
                 filter_kind: str = "bloom"):
        from .filters import CuckooFilter
        self.shard_id = shard_id
        # "bloom" (default) or "cuckoo" — same add/contains surface; the
        # cuckoo variant additionally supports deletion (north rule names
        # both; filters.CuckooFilter docstring has the trade-off)
        self.bloom = (BloomFilter(capacity, fp_rate)
                      if filter_kind == "bloom"
                      else CuckooFilter(capacity))
        self.exact_mode = exact
        self.exact: set[int] = set()
        # T4 trap-signature counts for signatures with
        # crc32(sig) % num_shards == shard_id (SURVEY §2.4 places the trap
        # state in the filter actors; VERDICT r2 #4 moved it out of the
        # driver). Persistent across waves; rebuilt by resume.
        self.trap: dict[str, int] = {}

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

    def retract(self, sha1s: list[str]) -> int:
        """Remove previously admitted keys — the mid-crawl policy flip
        (a host's robots.txt turns disallow-all; an uncommitted wave
        rolls back). Exact sets and cuckoo filters delete truly; a
        BLOOM filter cannot un-set bits, so in bloom-probabilistic mode
        retraction is refused (switch the shard to
        ``filter_kind="cuckoo"`` — the capability is the reason that
        representation exists). Returns the number of keys removed from
        the authoritative structure."""
        keys = sha1s_to_u64(sha1s)
        can_delete = hasattr(self.bloom, "delete_many")
        if not self.exact_mode and not can_delete:
            raise RuntimeError(
                "retract() needs an exact set or a cuckoo filter; "
                "bloom bits cannot be unset")
        n = 0
        if self.exact_mode:
            for k in keys.tolist():
                if k in self.exact:
                    self.exact.discard(k)
                    n += 1
        if can_delete:
            present = self.bloom.contains_many(keys)
            removed = self.bloom.delete_many(keys[present])
            if not self.exact_mode:
                n = int(removed.sum())
        return n

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

    # ------------------------------------------------- T4 trap signatures
    def trap_gate_mask(self, sigs: list[str], threshold: int) -> np.ndarray:
        """Ordered trap admission for this shard's signatures.

        ``sigs`` are the signatures of previously-unseen candidate rows in
        global (parent_seq, pos) order, restricted to this shard
        (crc32(sig) % num_shards == shard_id). Admit each row while its
        signature's running count < threshold; update the persistent
        counts with the admitted rows. Bulk numpy for signatures that
        cannot cross the threshold this call, ordered fallback only for
        the few that can — the exact semantics of the reference's
        link_manager trap gate (trap-rejected URLs never enter the seen
        set).

        ``sigs`` may arrive as an Arrow string array (the engine ships the
        per-shard signature slice zero-copy and the to-Python conversion
        happens HERE, parallel across the shard actors — a driver-side
        pylist + pickled list round measured 1.0 s vs 0.22 s at 560k
        candidates/wave)."""
        import pyarrow as _pa
        if isinstance(sigs, (_pa.Array, _pa.ChunkedArray)):
            sigs = sigs.to_pylist()
        n = len(sigs)
        if n == 0:
            return np.zeros(0, dtype=bool)
        uniq_index: dict[str, int] = {}
        codes = np.empty(n, dtype=np.int64)
        for i, s in enumerate(sigs):
            codes[i] = uniq_index.setdefault(s, len(uniq_index))
        uniq = list(uniq_index)
        prior = np.array([self.trap.get(s, 0) for s in uniq],
                         dtype=np.int64)
        per_sig = np.bincount(codes, minlength=len(uniq))
        crossing = (prior + per_sig) > threshold
        mask = ~crossing[codes]
        if crossing.any():
            running = {int(c): int(prior[c])
                       for c in np.flatnonzero(crossing)}
            for i in np.flatnonzero(crossing[codes]).tolist():
                c = int(codes[i])
                if running[c] < threshold:
                    running[c] += 1
                    mask[i] = True
        adm = np.bincount(codes[mask], minlength=len(uniq))
        for idx in np.flatnonzero(adm).tolist():
            self.trap[uniq[idx]] = int(prior[idx] + adm[idx])
        return mask

    def trap_gate(self, split_refs: list, threshold: int,
                  range_bounds: list[int]) -> tuple[list, tuple]:
        """Distributed trap gate (one call per signature shard per wave).

        ``split_refs``: this shard's candidate subtables, one ObjectRef
        per dedup task (rows already deduped, previously-unseen, with
        crc32(signature) % num_shards == shard_id). Concats them, restores
        global (parent_seq, pos) order, applies the ordered per-signature
        admission against the persistent counts, then splits the admitted
        rows by parent_seq range (``range_bounds``: R+1 ascending edges)
        for the seq-finalize tasks.

        Returns ([ObjectRef per range] — each range table ray.put
        separately so a finalize task fetches only its slice — and stats
        (n_in, n_trap_rejected, [admitted count per range]))."""
        import pyarrow as pa
        import ray
        tabs = []
        for r in split_refs:
            if r is None:
                continue
            t = ray.get(r)
            if t.num_rows:
                tabs.append(t)
        n_ranges = len(range_bounds) - 1
        if not tabs:
            return [None] * n_ranges, (0, 0, [0] * n_ranges)
        tbl = pa.concat_tables(tabs)
        ps = tbl.column("parent_seq").to_numpy()
        pos = tbl.column("pos").to_numpy()
        order = np.lexsort((pos, ps))
        tbl = tbl.take(pa.array(order))
        mask = self.trap_gate_mask(tbl.column("signature").to_pylist(),
                                   threshold)
        adm = tbl.filter(pa.array(mask))
        ps_adm = adm.column("parent_seq").to_numpy()
        out_refs: list = []
        counts: list[int] = []
        for r in range(n_ranges):
            lo = int(np.searchsorted(ps_adm, range_bounds[r], side="left"))
            hi = int(np.searchsorted(ps_adm, range_bounds[r + 1],
                                     side="left"))
            counts.append(hi - lo)
            out_refs.append(ray.put(adm.slice(lo, hi - lo))
                            if hi > lo else None)
        return out_refs, (int(tbl.num_rows),
                          int(tbl.num_rows - adm.num_rows), counts)

    def trap_rebuild(self, sigs: list[str], counts: list[int]) -> None:
        """Resume path: restore committed per-signature counts."""
        for s, c in zip(sigs, counts):
            self.trap[s] = self.trap.get(s, 0) + int(c)

    def trap_snapshot(self) -> dict:
        return dict(self.trap)

    def stats(self) -> dict:
        return {"shard": self.shard_id,
                "exact_count": len(self.exact),
                "bloom_count": self.bloom.count,
                "bloom_bytes": self.bloom.nbytes()}

    def snapshot_keys(self) -> np.ndarray:
        """Exact-mode only: the full key set (tests / debugging)."""
        return np.fromiter(self.exact, dtype=np.uint64, count=len(self.exact))


def make_shards(num_shards: int, capacity_per_shard: int = 1_000_000,
                exact: bool = True, filter_kind: str = "bloom") -> list:
    return [SeenShard.remote(i, capacity_per_shard, exact=exact,
                             filter_kind=filter_kind)
            for i in range(num_shards)]
