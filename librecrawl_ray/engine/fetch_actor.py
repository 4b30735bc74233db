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
import ray

from ..canonical import norm_url, shard_of, url_sha1
from ..stages.fetch import FETCHED_SCHEMA, fetch_and_parse
from ..stages.parse import EDGES_SCHEMA


class CorpusFetcher:
    """Callable class for ``map_batches(CorpusFetcher, concurrency=N, ...)``.

    Input batch: frontier rows (url, depth, seq, wave, part).
    Output batch: candidate rows (url, depth, parent_seq, pos) for frontier
    expansion. Pages and links rows are written to parquet directly from the
    actor (one file per batch, named by the batch's min seq — deterministic,
    so a retried task overwrites its own file instead of duplicating rows;
    the whole wave directory is discarded if the wave never commits).

    When ``pages_dir`` is None the actor instead returns the full
    fetched+parsed rows (FETCHED_SCHEMA) — the standalone parse-pipeline
    mode used by report queries.
    """

    def __init__(self, corpus_dir: str, base_domain: str, num_parts: int,
                 pages_dir: str | None = None, links_dir: str | None = None,
                 max_cached_parts: int = 64):
        self.corpus_dir = corpus_dir
        self.base_domain = base_domain
        self.num_parts = num_parts
        self.pages_dir = pages_dir
        self.links_dir = links_dir
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
            return (FETCHED_SCHEMA.empty_table() if self.pages_dir is None
                    else CANDIDATES_OUT_SCHEMA.empty_table())
        fetched = pa.Table.from_pylist(rows, schema=FETCHED_SCHEMA)
        if self.pages_dir is None:
            return fetched
        tag = f"b-{min(seqs):012d}.parquet"
        pq.write_table(fetched.drop_columns(["edges"]),
                       os.path.join(self.pages_dir, tag))
        links_rows = [e for r in rows for e in r["edges"]]
        if links_rows:
            pq.write_table(
                pa.Table.from_pylist(links_rows, schema=EDGES_SCHEMA),
                os.path.join(self.links_dir, tag))
        # candidate rows for frontier expansion, discovery order preserved
        c_urls, c_depth, c_pseq, c_pos = [], [], [], []
        for r in rows:
            for e in r["edges"]:
                c_urls.append(e["target_url"])
                c_depth.append(r["depth"] + 1)
                c_pseq.append(r["seq"])
                c_pos.append(e["pos"])
        return pa.table({
            "url": pa.array(c_urls, pa.string()),
            "depth": pa.array(c_depth, pa.int32()),
            "parent_seq": pa.array(c_pseq, pa.int64()),
            "pos": pa.array(c_pos, pa.int32()),
        })


CANDIDATES_OUT_SCHEMA = pa.schema([
    ("url", pa.string()), ("depth", pa.int32()),
    ("parent_seq", pa.int64()), ("pos", pa.int32()),
])


@ray.remote
class FetchWorker:
    """Persistent fetch+canonicalize worker for the wave loop.

    The same fetch/parse/canonicalize code as the map_batches stages, held
    in a long-lived actor so partition caches survive across waves and the
    per-wave cost is one RPC per chunk instead of an actor-pool cold start.
    Workers are partition-affine: the engine routes corpus partition p to
    worker p % pool_size, so each worker caches a stable subset of the
    corpus (the property that makes the lookup join scale — at 10^10 a
    worker holds only its partitions' key index).
    """

    def __init__(self, corpus_dir: str, base_domain: str, num_parts: int,
                 cfg, robots):
        # cfg/robots arrive as ObjectRefs from the engine; Ray resolves
        # top-level actor args automatically (ship once, not per call)
        self.fetcher = CorpusFetcher(corpus_dir, base_domain, num_parts)
        self.cfg = cfg
        self.robots = robots
        self.num_parts = num_parts

    def process(self, frontier_chunk: pa.Table, pages_dir: str,
                links_dir: str) -> pa.Table:
        """Fetch+parse a frontier chunk, write pages/links parquet parts,
        return canonicalized candidate rows."""
        from .crawl import canonicalize_candidates
        self.fetcher.pages_dir = pages_dir
        self.fetcher.links_dir = links_dir
        cand = self.fetcher(frontier_chunk)
        return canonicalize_candidates(cand, self.cfg, self.robots,
                                       self.num_parts)
