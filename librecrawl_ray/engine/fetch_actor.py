"""Fetch stage: partition-affine corpus lookup as an actor-pool map_batches.

The reference's HTTP fetcher (crawler.py:909-1120, S1) becomes a lookup join
of frontier URLs against the hash-partitioned corpus: frontier rows carry
``part = sha1(norm_url) % P`` and are sorted by ``part`` before the stage,
so each Arrow batch touches ~1 corpus partition; the actor lazily loads and
caches partition indexes (norm_url → row) in ``__init__``-owned state — the
map_batches actor-pool pattern (setup once per actor, work per batch).

Scale: at 10^10 docs each partition is a Lance/Parquet fragment sorted by
norm_url; an actor holds only the index column + open file handle and reads
row groups on demand (row-group pruning on the sorted key). At sandbox scale
partitions are loaded whole. Cross-partition redirect hops fall back to a
point lookup of the target's partition.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..canonical import norm_url, shard_of, url_sha1
from ..stages.fetch import FETCHED_SCHEMA, fetch_and_parse


class CorpusFetcher:
    """Callable class for ``map_batches(CorpusFetcher, concurrency=N, ...)``.

    Input batch: frontier rows (url, depth, seq, wave, part).
    Output batch: fetched+parsed pages rows with nested ``edges``.
    """

    def __init__(self, corpus_dir: str, base_domain: str, num_parts: int,
                 max_cached_parts: int = 64):
        self.corpus_dir = corpus_dir
        self.base_domain = base_domain
        self.num_parts = num_parts
        self.max_cached = max_cached_parts
        self._parts: dict[int, tuple[pa.Table, dict[str, int]]] = {}

    def _partition(self, part: int) -> tuple[pa.Table, dict[str, int]]:
        hit = self._parts.get(part)
        if hit is not None:
            return hit
        path = os.path.join(self.corpus_dir, "parts", f"part-{part:03d}.parquet")
        tbl = pq.read_table(path)
        index = {u: i for i, u in enumerate(tbl.column("norm_url").to_pylist())}
        if len(self._parts) >= self.max_cached:
            self._parts.pop(next(iter(self._parts)))
        self._parts[part] = (tbl, index)
        return tbl, index

    def lookup(self, url: str) -> dict | None:
        key = norm_url(url)
        part = shard_of(url_sha1(key), self.num_parts)
        tbl, index = self._partition(part)
        idx = index.get(key)
        if idx is None:
            return None
        return tbl.slice(idx, 1).to_pylist()[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        depths = batch.column("depth").to_pylist()
        seqs = batch.column("seq").to_pylist()
        waves = batch.column("wave").to_pylist()
        rows = [
            fetch_and_parse(u, d, s, w, self.lookup, self.base_domain)
            for u, d, s, w in zip(urls, depths, seqs, waves)
        ]
        if not rows:
            return FETCHED_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=FETCHED_SCHEMA)
