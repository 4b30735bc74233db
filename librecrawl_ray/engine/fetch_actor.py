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
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..canonical import norm_url, shard_of, url_sha1
from ..stages.fetch import FETCHED_SCHEMA, fetch_and_parse
from ..stages.parse import EDGES_SCHEMA

# the wave path's pages output: FETCHED minus the nested edges column
PAGES_ONLY_SCHEMA = pa.schema(
    [f for f in FETCHED_SCHEMA if f.name != "edges"])


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
                 max_cached_parts: int = 512,
                 max_file_size: int | None = None,
                 retries: int = 3, retry_base_delay: float = 1.0):
        self.corpus_dir = corpus_dir
        self.base_domain = base_domain
        self.num_parts = num_parts
        self.pages_dir = pages_dir
        self.links_dir = links_dir
        self.max_cached = max_cached_parts
        # S2 size precheck (reference crawler.py:917-931 HEAD content-length
        # skip): oversized docs are dropped entirely — no pages row, no
        # edges, no frontier candidates. None disables the check.
        self.max_file_size = max_file_size
        self.skipped_oversize = 0
        # S1 fault model (reference crawler.py:941-976): 429 retry loop.
        # Counters reset per wave via busy_reset (rate_limited pages DO
        # produce a pages row — only oversize skips don't)
        self.retries = retries
        self.retry_base_delay = retry_base_delay
        self.retries_total = 0
        self.rate_limited = 0
        self.retry_wait_s = 0.0
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
        """Fast path: batch lookups grouped per partition (one take per
        partition), wide corpus columns (spans, headers) passed through
        zero-copy Arrow — only parsed fields are Python-built. Rows that
        are missing or start a redirect chain take the row-wise slow path
        (fetch_and_parse) and are concatenated after."""
        from ..canonical import strip_www, url_host
        from ..policy import REDIRECT_STATUSES
        from ..stages.fetch import requires_js as _requires_js
        from ..stages.issues import soft404_hit
        from ..stages.parse import (_PARSE_FIELDS, extract_edges,
                                    extract_edges_flat, flatten_spans,
                                    parse_doc, parse_doc_flat)

        from ..policy import resolve_retry

        urls = batch.column("url").to_pylist()
        depths = batch.column("depth").to_pylist()
        seqs = batch.column("seq").to_pylist()
        waves = batch.column("wave").to_pylist()
        n = len(urls)
        keys = [norm_url(u) for u in urls]
        by_part: dict[int, list[int]] = {}
        for i, key in enumerate(keys):
            by_part.setdefault(shard_of(url_sha1(key), self.num_parts),
                               []).append(i)
        sub_tables: list[pa.Table] = []
        fast_pairs: list[tuple[int, int]] = []   # (global sub row, batch i)
        fast_waits: list[tuple[int, float]] = []  # (fast_pairs pos, wait ms)
        limited: list[tuple[int, float]] = []    # (batch i, response_time)
        slow_idx: list[int] = []
        offset = 0
        for part, idxs in by_part.items():
            tbl, index = self._partition(part)
            present, ids = [], []
            for i in idxs:
                rid = index.get(keys[i])
                if rid is None:
                    slow_idx.append(i)
                else:
                    present.append(i)
                    ids.append(rid)
            if not ids:
                continue
            sub = tbl.take(pa.array(ids, pa.int64()))
            status = sub.column("status_code").to_pylist()
            rto = sub.column("redirect_to").to_pylist()
            sizes = sub.column("size").to_pylist()
            limit = self.max_file_size
            # S1 faults: one vectorized max() gates the slow columns —
            # fault-free corpora (and fault-free partitions) pay nothing
            faults = ras = rts = None
            if ("fault_429" in sub.column_names
                    and pc.max(sub.column("fault_429")).as_py()):
                faults = sub.column("fault_429").to_pylist()
                ras = sub.column("retry_after").to_pylist()
                rts = sub.column("response_time_ms").to_pylist()
            for j, i in enumerate(present):
                # redirect check FIRST: the S2 size gate applies to the
                # redirect-resolved final document (slow path re-checks it
                # there), so an oversized 3xx row is still followed
                # (ADVICE r2 — paths previously disagreed). Entry faults on
                # 3xx rows are handled inside fetch_and_parse (none exist
                # by corpus construction).
                if status[j] in REDIRECT_STATUSES and rto[j]:
                    slow_idx.append(i)
                    continue
                wait_s = 0.0
                if faults is not None and faults[j]:
                    gave_up, rc, wait_s = resolve_retry(
                        faults[j], ras[j], self.retries,
                        self.retry_base_delay)
                    self.retries_total += rc
                    self.retry_wait_s += wait_s
                    if gave_up:
                        # attempts exhausted: the 429 response itself is
                        # recorded (reference crawler.py:950-953); no
                        # content, no outlinks
                        self.rate_limited += 1
                        limited.append(
                            (i, (rts[j] or 0.0) + wait_s * 1000.0))
                        continue
                if limit is not None and (sizes[j] or 0) > limit:
                    self.skipped_oversize += 1
                else:
                    fast_pairs.append((offset + j, i))
                    if wait_s:
                        fast_waits.append(
                            (len(fast_pairs) - 1, wait_s * 1000.0))
            sub_tables.append(sub)
            offset += sub.num_rows

        tables: list[pa.Table] = []
        all_edges: list[list[dict]] = []
        all_depth: list[int] = []
        all_seq: list[int] = []
        if fast_pairs:
            combined = (pa.concat_tables(sub_tables)
                        if len(sub_tables) > 1 else sub_tables[0])
            gsel = pa.array([g for g, _ in fast_pairs], pa.int64())
            bsel = [i for _, i in fast_pairs]
            csel = combined.take(gsel)
            rjs_docs = csel.select(["size", "raw_content_hash",
                                    "rendered_content_hash",
                                    "rendered_size"]).to_pylist()
            f_urls = [urls[i] for i in bsel]
            # column-major span access: flattened child-array conversion is
            # ~3× cheaper than list<struct>.to_pylist() dict building
            # (measured 113 → 36 µs/page on bench2 — the former #1 cost of
            # the whole fetch+parse worker)
            flat = flatten_spans(csel.column("spans"))
            if flat is None:
                spans_py = csel.column("spans").to_pylist()
                parsed = [parse_doc(u, sp or [], self.base_domain)
                          for u, sp in zip(f_urls, spans_py)]
                edges = [extract_edges(u, sp or [], self.base_domain)
                         for u, sp in zip(f_urls, spans_py)]
            else:
                kinds, texts, mrefs, offs, wcounts = flat
                parsed = [parse_doc_flat(u, kinds, texts, mrefs,
                                         offs[j], offs[j + 1],
                                         self.base_domain, wcounts)
                          for j, u in enumerate(f_urls)]
                memo: dict = {}   # shared per batch: nav links resolve once
                edges = [extract_edges_flat(u, kinds, texts, mrefs,
                                            offs[j], offs[j + 1],
                                            self.base_domain, memo=memo)
                         for j, u in enumerate(f_urls)]
            nf = len(f_urls)
            base_core = strip_www(self.base_domain.lower())
            status_py = csel.column("status_code").to_pylist()
            rt_col = csel.column("response_time_ms")
            if fast_waits:
                # retried-then-succeeded rows: backoff sleeps count into
                # response_time (the reference measures elapsed wall time)
                import numpy as np
                add = np.zeros(nf)
                for pos, ms in fast_waits:
                    add[pos] = ms
                rt_col = pc.add(rt_col, pa.array(add, pa.float64()))
            cols: dict[str, object] = {
                "url": pa.array(f_urls, pa.string()),
                "final_url": pa.array(f_urls, pa.string()),
                "status_code": csel.column("status_code"),
                "content_type": csel.column("content_type"),
                "size": csel.column("size"),
                "response_time": rt_col,
                "is_internal": pa.array(
                    [strip_www(url_host(u)) == base_core for u in f_urls],
                    pa.bool_()),
                "depth": pa.array([depths[i] for i in bsel], pa.int32()),
                "seq": pa.array([seqs[i] for i in bsel], pa.int64()),
                "wave": pa.array([waves[i] for i in bsel], pa.int32()),
                "response_headers": csel.column("headers"),
                "x_robots_tag": csel.column("x_robots_tag"),
                "redirect_chain": pa.array(
                    [[{"url": u, "status_code": sc, "hop": 0}]
                     for u, sc in zip(f_urls, status_py)],
                    FETCHED_SCHEMA.field("redirect_chain").type),
                "redirects": pa.array([[]] * nf,
                                      pa.list_(pa.string())),
                "redirect_count": pa.array([0] * nf, pa.int32()),
                "has_redirect_loop": pa.array([False] * nf, pa.bool_()),
                "requires_js": pa.array(
                    [_requires_js(dd) for dd in rjs_docs], pa.bool_()),
                "is_soft_404": pa.array(
                    [st == 200 and (soft404_hit(p["title"])
                                    or soft404_hit(p["h1"]))
                     for st, p in zip(status_py, parsed)], pa.bool_()),
                # fast path rows have redirect_count 0 by construction
                "has_long_redirect_chain": pa.array([False] * nf,
                                                    pa.bool_()),
                "spans": csel.column("spans"),
            }
            if self.pages_dir is None:
                # parse-pipeline mode keeps the nested edges column; the
                # wave path skips building it (pages parquet drops it and
                # links/candidates are built from the python edge lists)
                cols["edges"] = pa.array(
                    edges, FETCHED_SCHEMA.field("edges").type)
            for name, typ in _PARSE_FIELDS:
                cols[name] = pa.array([p[name] for p in parsed], typ)
            out_schema = (FETCHED_SCHEMA if self.pages_dir is None
                          else PAGES_ONLY_SCHEMA)
            fast_tbl = pa.table({f.name: cols[f.name] for f in out_schema})
            tables.append(fast_tbl)
            all_edges.extend(edges)
            all_depth.extend(depths[i] for i in bsel)
            all_seq.extend(seqs[i] for i in bsel)
        if limited:
            from ..stages.fetch import rate_limited_row
            lrows = [rate_limited_row(urls[i], depths[i], seqs[i], waves[i],
                                      self.base_domain, rt)
                     for i, rt in limited]
            all_depth.extend(depths[i] for i, _ in limited)
            all_seq.extend(seqs[i] for i, _ in limited)
            all_edges.extend([] for _ in lrows)
            if self.pages_dir is not None:
                for r in lrows:
                    r.pop("edges")
                tables.append(pa.Table.from_pylist(
                    lrows, schema=PAGES_ONLY_SCHEMA))
            else:
                tables.append(pa.Table.from_pylist(
                    lrows, schema=FETCHED_SCHEMA))
        if slow_idx:
            rows = [fetch_and_parse(urls[i], depths[i], seqs[i], waves[i],
                                    self.lookup, self.base_domain,
                                    retries=self.retries,
                                    retry_base_delay=self.retry_base_delay)
                    for i in slow_idx]
            if self.max_file_size is not None:
                kept = [(r, i) for r, i in zip(rows, slow_idx)
                        if (r.get("size") or 0) <= self.max_file_size]
                self.skipped_oversize += len(rows) - len(kept)
                rows = [r for r, _ in kept]
                slow_idx = [i for _, i in kept]
            all_depth.extend(depths[i] for i in slow_idx)
            all_seq.extend(seqs[i] for i in slow_idx)
            if self.pages_dir is not None:
                all_edges.extend(r.pop("edges") for r in rows)
                tables.append(pa.Table.from_pylist(
                    rows, schema=PAGES_ONLY_SCHEMA))
            else:
                all_edges.extend(r["edges"] for r in rows)
                tables.append(pa.Table.from_pylist(
                    rows, schema=FETCHED_SCHEMA))

        if not tables:
            return (FETCHED_SCHEMA.empty_table() if self.pages_dir is None
                    else CANDIDATES_OUT_SCHEMA.empty_table())
        fetched = (pa.concat_tables(tables) if len(tables) > 1
                   else tables[0])
        if self.pages_dir is None:
            return fetched
        tag = f"b-{min(seqs):012d}.parquet"
        pq.write_table(fetched, os.path.join(self.pages_dir, tag))
        links_rows = [e for es in all_edges for e in es]
        if links_rows:
            # columnar build: from_pylist re-probes every dict per field;
            # one comprehension per column is ~2× cheaper at this volume
            links_tbl = pa.table(
                {f.name: pa.array([e[f.name] for e in links_rows], f.type)
                 for f in EDGES_SCHEMA})
            pq.write_table(links_tbl, os.path.join(self.links_dir, tag))
        # candidate rows for frontier expansion, discovery order preserved
        c_urls, c_depth, c_pseq, c_pos = [], [], [], []
        for es, d, s in zip(all_edges, all_depth, all_seq):
            for e in es:
                c_urls.append(e["target_url"])
                c_depth.append(d + 1)
                c_pseq.append(s)
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
        # one Arrow compute thread per worker — the pool parallelizes
        # across actors; Arrow's default per-process pool (ncpu threads ×
        # pool size actors) oversubscribes the box and inflates tail
        # latency
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        self.fetcher = CorpusFetcher(
            corpus_dir, base_domain, num_parts,
            max_file_size=getattr(cfg, "max_file_size", None),
            retries=getattr(cfg, "retries", 3),
            retry_base_delay=getattr(cfg, "retry_base_delay", 1.0))
        self.cfg = cfg
        self.robots = robots
        self.num_parts = num_parts
        # cross-wave canonicalization memo (see canonicalize_candidates)
        self._canon_memo: dict = {}

    def process(self, frontier_chunk: pa.Table, pages_dir: str,
                links_dir: str) -> pa.Table:
        """Fetch+parse a frontier chunk, write pages/links parquet parts,
        return canonicalized candidate rows."""
        from .crawl import canonicalize_candidates
        self.fetcher.pages_dir = pages_dir
        self.fetcher.links_dir = links_dir
        cand = self.fetcher(frontier_chunk)
        return canonicalize_candidates(cand, self.cfg, self.robots,
                                       self.num_parts,
                                       memo=self._canon_memo)

    def process_sliced(self, frontier_tbl: pa.Table, start: int,
                       length: int, pages_dir: str,
                       links_dir: str) -> pa.Table:
        """Same as process(), but the full wave frontier is shipped ONCE
        via ray.put (zero-copy plasma read here) and each call slices its
        chunk — avoids per-chunk pickling on the driver."""
        import time
        t0 = time.perf_counter()
        out = self.process(frontier_tbl.slice(start, length),
                           pages_dir, links_dir)
        self._busy = getattr(self, "_busy", 0.0) + time.perf_counter() - t0
        return out

    def busy_reset(self) -> dict:
        """Per-wave counters: busy seconds + S2 oversize skips (both reset).
        Skips are aggregated into the wave summary so the exports invariant
        (pages rows == fetched_total) holds when max_file_size fires."""
        b = getattr(self, "_busy", 0.0)
        self._busy = 0.0
        f = self.fetcher
        out = {"busy": b, "skipped_oversize": f.skipped_oversize,
               "retries_total": f.retries_total,
               "rate_limited": f.rate_limited,
               "retry_wait_s": round(f.retry_wait_s, 3)}
        f.skipped_oversize = 0
        f.retries_total = 0
        f.rate_limited = 0
        f.retry_wait_s = 0.0
        return out

    def prefetch(self, parts: list[int]) -> int:
        """Warm this worker's partition caches (fired asynchronously at
        pool creation — overlaps the small early waves)."""
        for p in parts:
            self.fetcher._partition(p)
        return len(parts)
