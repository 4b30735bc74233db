"""The wave-structured distributed crawl engine (SURVEY.md §7.0).

Replaces the reference's single-threaded pull loop (crawler.py:757-899) with
a BFS level-synchronous dataflow that preserves the FIFO-BFS ordering
contract exactly (priority = (depth, discovery seq); politeness deferrals
carry seq forward):

    frontier_wave_k (parquet/in-memory, one ray.put per wave)
      → PolitenessScheduler gating (per-host crawl-delay token budgets)
      → persistent FetchWorker pool: partition-affine corpus lookup join,
        pull-based dispatch with work stealing (absorbs heterogeneous
        core/node throughput); each chunk fetches, parses (zero-copy span
        passthrough), writes pages/links parquet (deterministic file names
        → retry-idempotent), canonicalizes + SHA-1s candidates
      → within-wave dedup + seen-filter probe: first sighting per sha64 by
        (parent_seq, pos); driver-side Arrow sort below the candidate
        threshold, per-shard parallel tasks above it (the hash-partitioned
        groupby-aggregate against the filter shards of the north rule)
      → trap gating (T4 counts live signature-sharded in the SeenShard
        actors; ordered per-signature admission) → seq assignment
      → SeenShard.add_bulk + admitted checkpoint → frontier_wave_{k+1}

Two admission shapes share those semantics exactly (equality pinned in
tests/test_distributed_admission.py): below ``distributed_dedup_threshold``
the driver runs lexsort-dedup + actor trap RPCs + arange seqs; at or above
it the whole tail is distributed — per-seen-shard dedup-split tasks →
per-signature-shard trap-gate actor calls → per-parent_seq-range finalize
tasks that assign seq by block-offset cumsum, write the admitted parquet
parts and insert the seen keys, handing the next wave its frontier as
plasma cells. On the cells path politeness gating also runs in per-cell
tasks against driver-computed per-host prefix counts, so the driver holds
only per-cell/per-host/per-range summaries (VERDICT r2 #4).

Every wave commits atomically: outputs + admitted-keys file written first
(on a background thread, overlapping the next wave's fetch), the lineage
record last (tmp+rename, sealed by _flush_pending). Resume replays committed
waves' admitted files into the shard actors and continues from the last
committed frontier — the URL-seen set after kill+resume is identical to an
uninterrupted run (north rule; unlike the reference's lossy 1,000-entry
checkpoint queue, crawler.py:695). Uncommitted waves replay idempotently.

Driver-held state is O(frontier-wave + signature cardinality) only: the seen
set lives in the shard actors, pages/links stream to parquet. Scale notes
inline where the sandbox implementation chooses the small-scale variant.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..canonical import (norm_url, shard_of, url_host, url_sha1,
                         url_signature)
from ..policy import CrawlConfig, should_crawl
from ..sources.robots import RobotsRules, robots_map
from ..state.seen_filter import make_shards
from .fetch_actor import CorpusFetcher

CANDIDATE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("depth", pa.int32()),
    ("parent_seq", pa.int64()),
    ("pos", pa.int32()),
    ("host", pa.string()),
    ("sha64", pa.uint64()),
    ("part", pa.int32()),
    ("shard", pa.int32()),
    ("signature", pa.string()),
    ("sig_shard", pa.int32()),
])

FRONTIER_COLS = ["url", "depth", "seq", "wave", "host", "part"]


_CANON_MEMO_CAP = 500_000    # per-worker entries (~150 MB); generational


def canonicalize_candidates(batch: pa.Table, cfg: CrawlConfig,
                            robots: dict[str, RobotsRules] | None,
                            num_parts: int,
                            memo: dict | None = None) -> pa.Table:
    """Clean candidate URLs, apply the should-crawl predicate (M4) and
    compute sha1 / corpus part / seen shard / trap signature.

    ``memo`` (optional, owned by a persistent fetch worker) caches the
    per-URL result ACROSS chunks and waves: crawl candidates repeat
    heavily — wave k+1's edges mostly point at pages admitted in wave k
    (nav links, breadcrumbs), so the stringy URL work (urlsplit / sha1 /
    signature regex, ~15 µs) collapses to one dict hit per repeat. The
    memo is pure per-URL derivation (cfg/robots are fixed for a crawl),
    so results are identical with or without it; capacity-capped with a
    generational clear so a 10^10-URL crawl cannot grow it unboundedly.
    """
    urls = batch.column("url").to_pylist()
    depths = batch.column("depth").to_pylist()
    pseqs = batch.column("parent_seq").to_pylist()
    poss = batch.column("pos").to_pylist()
    # columnar build (no per-row dicts): the stringy URL work (urlsplit /
    # sha1 / signature regex) has no Arrow kernel, but the output arrays
    # are built column-wise and the batch runs inside the distributed
    # fetch workers
    from zlib import crc32
    c_url, c_depth, c_pseq, c_pos = [], [], [], []
    c_host, c_sha64, c_part, c_shard, c_sig, c_sigsh = [], [], [], [], [], []
    if memo is None:
        memo = {}
    elif len(memo) > _CANON_MEMO_CAP:
        memo.clear()
    for u, d, ps, po in zip(urls, depths, pseqs, poss):
        hit = memo.get(u, 0)
        if hit is None:                     # memoized reject
            continue
        if hit == 0:                        # miss: derive + memoize
            if not should_crawl(u, cfg, robots):
                memo[u] = None
                continue
            sha = url_sha1(u)
            sig = url_signature(u)
            hit = (url_host(u), int(sha[:16], 16),
                   shard_of(sha, num_parts),
                   shard_of(sha, cfg.num_shards), sig,
                   crc32(sig.encode()) % cfg.num_shards)
            memo[u] = hit
        c_url.append(u)
        c_depth.append(d)
        c_pseq.append(ps)
        c_pos.append(po)
        c_host.append(hit[0])
        c_sha64.append(hit[1])
        c_part.append(hit[2])
        c_shard.append(hit[3])
        c_sig.append(hit[4])
        c_sigsh.append(hit[5])
    if not c_url:
        return CANDIDATE_SCHEMA.empty_table()
    return pa.Table.from_arrays([
        pa.array(c_url, pa.string()), pa.array(c_depth, pa.int32()),
        pa.array(c_pseq, pa.int64()), pa.array(c_pos, pa.int32()),
        pa.array(c_host, pa.string()), pa.array(c_sha64, pa.uint64()),
        pa.array(c_part, pa.int32()), pa.array(c_shard, pa.int32()),
        pa.array(c_sig, pa.string()),
        pa.array(c_sigsh, pa.int32())], schema=CANDIDATE_SCHEMA)


class Canonicalizer:
    """North-rule canonicalization stage: actor-pool map_batches that cleans
    candidate URLs, applies the should-crawl predicate (domain policy,
    extensions, patterns, robots — robots rules broadcast via ray.put and
    materialized once per actor) and computes sha1 / shard / trap signature.
    """

    def __init__(self, cfg_ref, robots_ref, num_parts: int):
        self.cfg: CrawlConfig = ray.get(cfg_ref)
        self.robots: dict[str, RobotsRules] | None = ray.get(robots_ref)
        self.num_parts = num_parts
        self._memo: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return canonicalize_candidates(batch, self.cfg, self.robots,
                                       self.num_parts, memo=self._memo)


@ray.remote
def _presplit_task(chunk_refs: list, num_shards: int):
    """Combiner + pre-partitioner for distributed admission, run over a
    GROUP of completed fetch chunks WHILE the rest of the wave is still
    fetching (submitted from the gather loop's spare CPUs).

    Concats the group's candidate chunks, keeps the first sighting per
    sha64 (min (parent_seq, pos) — the per-shard merge re-deduplicates, so
    a per-group partial is a correct combiner), and pre-partitions by seen
    shard. Returns (per-shard table | None ... , n_candidates) via
    num_returns=num_shards+1 so each shard's dedup task fetches ONLY its
    own slice.

    This is the fix for two wave-tail pathologies measured at sf0.1
    (1.2M candidates / 703 chunks / 16 shards): every shard task
    re-scanning all 703 chunks (16x redundant deserialize ≈ 7 s/task),
    and popular duplicate URLs (every page's home/footer links — one
    sha64 each) all landing in one shard (581k of 1.2M rows in shard 15).
    The combiner caps that skew at one row per group per distinct URL."""
    import numpy as np
    tables = [t for t in ray.get(list(chunk_refs)) if t.num_rows]
    if not tables:
        return tuple([None] * num_shards + [0])
    tbl = pa.concat_tables(tables)
    n_cand = tbl.num_rows
    s64 = tbl.column("sha64").to_numpy()
    ps = tbl.column("parent_seq").to_numpy()
    pos = tbl.column("pos").to_numpy()
    order = np.lexsort((pos, ps, s64))
    s_sorted = s64[order]
    keep = np.empty(len(order), dtype=bool)
    keep[0] = True
    np.not_equal(s_sorted[1:], s_sorted[:-1], out=keep[1:])
    tbl = tbl.take(pa.array(order[keep]))
    shard_np = tbl.column("shard").to_numpy()
    out: list = []
    for s in range(num_shards):
        sub = tbl.filter(pa.array(shard_np == s))
        out.append(sub if sub.num_rows else None)
    out.append(int(n_cand))
    return tuple(out)


@ray.remote(num_returns=2)
def _dedup_split_task(shard_id: int, shard_refs: list, shard_actor,
                      num_sig_shards: int):
    """Per-seen-shard dedup + membership probe (north rule: the
    hash-partitioned groupby-aggregate against the filter shards), with
    the surviving candidates split by signature shard and each split
    ray.put separately — the trap-gate actors fetch only their own slice,
    and no candidate row touches the driver (VERDICT r2 #4).

    ``shard_refs``: this shard's pre-partitioned group partials from
    ``_presplit_task`` (one per chunk group, already group-deduped).
    Returns ([ref per sig shard], n_rows_in)."""
    import numpy as np
    tables = [t for t in ray.get([r for r in shard_refs if r is not None])
              if t is not None and t.num_rows]
    if not tables:
        return [None] * num_sig_shards, 0
    tbl = pa.concat_tables(tables)
    n_in = tbl.num_rows
    srt = tbl.sort_by([("sha64", "ascending"), ("parent_seq", "ascending"),
                       ("pos", "ascending")])
    s64 = srt.column("sha64").to_numpy()
    first = np.empty(len(s64), dtype=bool)
    first[0] = True
    np.not_equal(s64[1:], s64[:-1], out=first[1:])
    cand = srt.filter(pa.array(first))
    present = ray.get(shard_actor.contains_u64.remote(
        cand.column("sha64").to_numpy()))
    new = cand.filter(pa.array(~np.asarray(present, dtype=bool)))
    sig_np = new.column("sig_shard").to_numpy()
    refs = []
    for t in range(num_sig_shards):
        sub = new.filter(pa.array(sig_np == t))
        refs.append(ray.put(sub) if sub.num_rows else None)
    return refs, n_in


@ray.remote(num_returns=2)
def _finalize_range_task(range_refs: list, base_seq: int, wave: int,
                         admitted_path: str, shard_actors: list):
    """Seq assignment + checkpoint for one parent_seq range.

    Concats this range's admitted tables from every signature shard,
    restores global (parent_seq, pos) order, assigns
    ``seq = base_seq + arange`` (the block-offset cumsum — base_seq is the
    driver's cumsum over per-range counts, so seqs are globally dense in
    (parent_seq, pos) order without the rows ever visiting the driver),
    writes the admitted parquet part, inserts the keys into the seen
    shards, and returns the next-wave frontier piece sorted by
    (depth, seq) with per-depth offsets for the politeness cells."""
    import numpy as np
    tabs = []
    for r in range_refs:
        if r is None:
            continue
        t = ray.get(r) if isinstance(r, ray.ObjectRef) else r
        if t.num_rows:
            tabs.append(t)
    if not tabs:
        return None, []
    tbl = pa.concat_tables(tabs)
    ps = tbl.column("parent_seq").to_numpy()
    pos = tbl.column("pos").to_numpy()
    order = np.lexsort((pos, ps))
    tbl = tbl.take(pa.array(order))
    n = tbl.num_rows
    seqs = np.arange(base_seq, base_seq + n, dtype=np.int64)
    tbl = tbl.append_column("seq", pa.array(seqs))
    out = tbl.select(["url", "depth", "seq", "host", "sha64", "part",
                      "signature"]) \
        .append_column("wave", pa.array(np.full(n, wave, dtype=np.int32)))
    pq.write_table(out, admitted_path)
    sha = tbl.column("sha64").to_numpy()
    shard_np = tbl.column("shard").to_numpy()
    futs = [shard_actors[s].add_bulk.remote(sha[shard_np == s])
            for s in np.unique(shard_np).tolist()]
    ray.get(futs)
    # frontier piece: stable sort by depth keeps (depth, seq) order
    frontier = tbl.select(["url", "depth", "seq", "host", "part"])
    d = frontier.column("depth").to_numpy()
    dorder = np.argsort(d, kind="stable")
    frontier = frontier.take(pa.array(dorder))
    ds = d[dorder]
    bounds = np.flatnonzero(np.diff(ds)) + 1
    starts = np.concatenate(([0], bounds)).tolist()
    ends = np.concatenate((bounds, [len(ds)])).tolist()
    depth_slices = [(int(ds[s0]), int(s0), int(e0 - s0))
                    for s0, e0 in zip(starts, ends)]
    return frontier, depth_slices


@ray.remote
def _host_counts_task(ref, start: int, length: int) -> dict:
    """Politeness phase A: per-host row counts for one frontier cell."""
    from collections import Counter
    tbl = ref if isinstance(ref, pa.Table) else ray.get(ref)
    cell = tbl.slice(start, length)
    return dict(Counter(cell.column("host").to_pylist()))


@ray.remote(num_returns=3)
def _gate_cell_task(ref, start: int, length: int, wave: int,
                    caps: dict, prior: dict, grant_limit: int,
                    deferred_path: str | None):
    """Politeness phase B for one frontier cell (rows of ONE depth, one
    seq block — cells enumerate in global (depth, seq) order).

    Grants rows whose within-wave per-host rank (prior counts from all
    earlier cells + local occurrence index) is below the host's cap,
    truncated to ``grant_limit`` (max_urls budget). Granted rows are
    stamped with the wave id and sorted by corpus part for the
    partition-affine fetch dispatch; deferred rows keep (depth, seq)
    order, are written straight to the deferral checkpoint part, and are
    returned as the next wave's deferred cell. Returns
    (granted table, deferred piece, (part slices, n_granted, n_deferred))."""
    import numpy as np
    tbl = ref if isinstance(ref, pa.Table) else ray.get(ref)
    cell = tbl.slice(start, length)
    n = cell.num_rows
    if caps:
        h = np.asarray(cell.column("host").to_pylist(), dtype=object)
        uniq, inv = np.unique(h, return_inverse=True)
        cap_arr = np.fromiter((caps.get(u, 1 << 60) - prior.get(u, 0)
                               for u in uniq),
                              dtype=np.int64, count=len(uniq))
        order = np.argsort(inv, kind="stable")
        sorted_inv = inv[order]
        boundaries = np.flatnonzero(np.diff(sorted_inv)) + 1
        starts = np.concatenate(([0], boundaries))
        group_sizes = np.diff(np.concatenate((starts, [n])))
        ranks_sorted = np.arange(n) - np.repeat(starts, group_sizes)
        occ = np.empty(n, dtype=np.int64)
        occ[order] = ranks_sorted
        mask = occ < cap_arr[inv]
    else:
        mask = np.ones(n, dtype=bool)
    if grant_limit < int(mask.sum()):
        # max_urls cutoff: keep the first grant_limit granted rows in
        # (depth, seq) order
        keep_idx = np.flatnonzero(mask)[:grant_limit]
        mask = np.zeros(n, dtype=bool)
        mask[keep_idx] = True
    granted = cell.filter(pa.array(mask))
    deferred = cell.filter(pa.array(~mask))
    defer_piece = deferred.select(["url", "depth", "seq", "host", "part"])
    if deferred.num_rows and deferred_path is not None:
        dt = deferred.append_column(
            "wave", pa.array(np.full(deferred.num_rows, wave + 1,
                                     dtype=np.int32))).select(FRONTIER_COLS)
        pq.write_table(dt, deferred_path)
    g = granted.append_column(
        "wave", pa.array(np.full(granted.num_rows, wave, dtype=np.int32))) \
        .select(FRONTIER_COLS)
    g = g.sort_by("part")
    parts_np = g.column("part").to_numpy()
    if len(parts_np):
        b = np.flatnonzero(np.diff(parts_np)) + 1
        s0 = np.concatenate(([0], b))
        e0 = np.concatenate((b, [len(parts_np)]))
        part_slices = [(int(parts_np[a]), int(a), int(z - a))
                       for a, z in zip(s0.tolist(), e0.tolist())]
    else:
        part_slices = []
    return g, defer_piece, (part_slices, int(granted.num_rows),
                            int(deferred.num_rows))


class _StreamAdmit:
    """Streaming driver admission: within-wave first-sighting dedup and
    the seen-shard membership probe run DURING the fetch window instead
    of after it (the driver otherwise idles in ``ray.wait`` for the
    whole fetch). Safe because the seen set is frozen within a wave —
    shard inserts land only at wave end, so mid-fetch probes read the
    exact same state the post-fetch probe would.

    A background thread drains completed candidate-chunk refs in groups:
    per group it dedups to first sighting by (parent_seq, pos), then
    fires the per-shard ``contains_u64`` probes (futures collected, not
    waited). ``finalize`` merges the per-group NEW uniques into the
    global first-sighting set — identical output to the post-fetch
    lexsort path: a seen sha64 dies either way, and the global min
    (parent_seq, pos) over per-group minima is the global minimum.
    The dispatch loop stays hot: numpy sorts release the GIL and run
    off the submit path.
    """

    GROUP = 48          # chunks per dedup+probe group (~37k rows)

    def __init__(self, shards: list):
        import queue
        import threading
        self.shards = shards
        self._q: "queue.Queue" = queue.Queue()
        self._tbls: list[pa.Table] = []       # nonempty chunks, feed order
        self._groups: list[dict] = []
        self._buf: list[pa.Table] = []
        self._base = 0                        # rows fed so far (nonempty)
        self.probe_wait = 0.0                 # residual probe wait in finalize
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._drain, daemon=True)
        self._thread.start()

    def feed(self, ref) -> None:
        self._q.put(ref)

    def _drain(self) -> None:
        import numpy as np
        try:
            while True:
                ref = self._q.get()
                if ref is None:
                    if self._buf:
                        self._flush(np)
                    return
                tbl = ray.get(ref)
                if tbl.num_rows == 0:
                    continue
                self._tbls.append(tbl)
                self._buf.append(tbl)
                if len(self._buf) >= self.GROUP:
                    self._flush(np)
        except BaseException as e:   # surface in finalize — a silent
            self._err = e            # drain death would DROP candidates
            while self._q.get() is not None:
                pass                 # keep feed() non-blocking until seal

    def _flush(self, np) -> None:
        tbls, self._buf = self._buf, []
        g = pa.concat_tables(tbls) if len(tbls) > 1 else tbls[0]
        base = self._base
        self._base += g.num_rows
        s64 = g.column("sha64").to_numpy()
        ps = g.column("parent_seq").to_numpy()
        pos = g.column("pos").to_numpy()
        order = np.lexsort((pos, ps, s64))
        s_sorted = s64[order]
        first = np.empty(len(s_sorted), dtype=bool)
        first[:1] = True
        np.not_equal(s_sorted[1:], s_sorted[:-1], out=first[1:])
        kept = order[first]                    # group-local first sightings
        k64 = s64[kept]
        shard_np = g.column("shard").to_numpy()[kept]
        futs, masks = {}, {}
        for s in np.unique(shard_np).tolist():
            m = shard_np == s
            masks[s] = m
            futs[s] = self.shards[s].contains_u64.remote(k64[m])
        self._groups.append({
            "base": base, "kept": kept, "s64": k64,
            "ps": ps[kept], "pos": pos[kept], "futs": futs, "masks": masks,
        })

    def finalize(self) -> tuple[pa.Table, "object", int]:
        """Join the drain thread, resolve probes, merge groups. Returns
        (raw_tbl, keep, n_candidates) with ``keep`` the global indices of
        NEW first-sighting rows in (parent_seq, pos) admission order —
        the seen-filter probe is already applied (is_new ≡ True)."""
        import numpy as np
        self._q.put(None)
        self._thread.join()
        if self._err is not None:
            raise self._err
        raw_tbl = (pa.concat_tables(self._tbls) if self._tbls
                   else CANDIDATE_SCHEMA.empty_table())
        n_candidates = raw_tbl.num_rows
        t_w0 = time.perf_counter()
        idx_parts, s_parts, ps_parts, pos_parts = [], [], [], []
        for grp in self._groups:
            new = np.ones(len(grp["kept"]), dtype=bool)
            for s, m in grp["masks"].items():
                new[m] = ~np.asarray(ray.get(grp["futs"][s]), dtype=bool)
            idx_parts.append(grp["base"] + grp["kept"][new])
            s_parts.append(grp["s64"][new])
            ps_parts.append(grp["ps"][new])
            pos_parts.append(grp["pos"][new])
        self.probe_wait = time.perf_counter() - t_w0
        if not idx_parts:
            return raw_tbl, np.empty(0, dtype=np.int64), n_candidates
        idx = np.concatenate(idx_parts)
        s_all = np.concatenate(s_parts)
        ps_all = np.concatenate(ps_parts)
        pos_all = np.concatenate(pos_parts)
        order = np.lexsort((pos_all, ps_all, s_all))
        s_sorted = s_all[order]
        first = np.empty(len(s_sorted), dtype=bool)
        first[:1] = True
        np.not_equal(s_sorted[1:], s_sorted[:-1], out=first[1:])
        sel = order[first]
        sel = sel[np.lexsort((pos_all[sel], ps_all[sel]))]
        return raw_tbl, idx[sel], n_candidates


class WaveCrawler:
    """Drives the crawl; owns shard actors and the per-wave driver state."""

    def __init__(self, corpus_dir: str, out_dir: str, cfg: CrawlConfig,
                 fetch_concurrency: int = 4, fetch_batch_size: int = 768,
                 exact_seen: bool = True, small_wave_threshold: int = 512,
                 seen_filter_kind: str = "bloom"):
        self.corpus_dir = corpus_dir
        self.out_dir = out_dir
        self.cfg = cfg
        with open(os.path.join(corpus_dir, "config.json")) as f:
            self.num_parts = json.load(f)["num_parts"]
        self.fetch_concurrency = fetch_concurrency
        self.fetch_batch_size = fetch_batch_size
        self.exact_seen = exact_seen
        robots_tbl = pq.read_table(os.path.join(corpus_dir, "robots.parquet"))
        self.robots = robots_map(robots_tbl.to_pylist())
        self.shards = make_shards(cfg.num_shards, exact=exact_seen,
                                  filter_kind=seen_filter_kind)
        from ..state.politeness import PolitenessScheduler
        self.politeness = PolitenessScheduler(cfg, self.robots)
        self._cfg_ref = ray.put(cfg)
        self._robots_ref = ray.put(self.robots if cfg.respect_robots else None)
        # driver state
        self.small_wave_threshold = small_wave_threshold
        # waves with n_gated at or above this take the fully distributed
        # admission (dedup-split tasks → trap-gate actors → seq-finalize
        # tasks; frontier handed on as plasma cells). Crossover measured
        # with interleaved A/B at bench2 wave-3 (540k gated / 1.2M
        # candidates, 32 cpus): the driver lexsort admission costs 0.74 s
        # on the wave tail vs ~5.5 s for the distributed rounds (three
        # barriered task/actor rounds whose fixed scheduling latency
        # dominates at this volume) — crawl wall 19.8 s driver vs 28.4 s
        # distributed, min-of-3 each. The driver tail scales ~0.6 µs/row
        # (+8 bytes/row transient), so admission only becomes the wave
        # bottleneck in the several-million-rows-per-wave regime — there
        # the distributed tail amortizes its round latency across
        # shard-parallel work and, more importantly, keeps the candidate
        # table out of driver memory entirely (the only viable shape at
        # 10^10 URLs). Same two-path pattern as the J8 frontier dedup.
        self.distributed_dedup_threshold = int(os.environ.get(
            "GRAFT_DIST_ADMIT_THRESHOLD", "2000000"))
        # big corpora make the driver-local small-wave path pay full
        # partition loads (~the whole corpus through the driver for a
        # 100-URL wave) — route ALL waves through the actor pool instead,
        # and create the pool eagerly so partition prefetch overlaps the
        # small early waves
        try:
            ddir = os.path.join(corpus_dir, "documents")
            size = sum(os.path.getsize(os.path.join(ddir, f))
                       for f in os.listdir(ddir))
            self._big_corpus = size > 32 * 1024 * 1024
        except OSError:
            self._big_corpus = False
        self._local_fetcher: CorpusFetcher | None = None
        self._workers: list | None = None
        self._part_owner: dict[int, int] = {}
        self._pending: tuple | None = None       # (wave, metrics, joinable)
        self._frontier_cache: tuple | None = None  # (wave, table)
        # (wave, (new_refs, slices_futs, offsets, deferred_cells)) — the
        # distributed-admission frontier handoff: cell ROWS stay in plasma
        self._frontier_cells: tuple | None = None
        self.next_seq = 0
        self.fetched_total = 0
        self.wave = 0

    def _fetch_pool(self) -> list:
        if self._workers is None:
            from .fetch_actor import FetchWorker
            self._workers = [
                FetchWorker.remote(self.corpus_dir, self.cfg.base_domain,
                                   self.num_parts, self._cfg_ref,
                                   self._robots_ref)
                for _ in range(self.fetch_concurrency)]
            # async partition prefetch: worker i owns parts {p : p % pool
            # == i} (num_parts ≫ pool keeps hash-uniform loads balanced);
            # warming overlaps the small early waves
            pool = len(self._workers)
            for i, w in enumerate(self._workers):
                own = [p for p in range(self.num_parts) if p % pool == i]
                # chunked prefetch: actor tasks run FIFO, so one monolithic
                # prefetch would make an early small wave's lookup wait for
                # the worker's ENTIRE partition set to load; 2-part chunks
                # bound that head-of-line latency to one chunk
                for j in range(0, len(own), 2):
                    w.prefetch.remote(own[j:j + 2])
        return self._workers

    def warm_pool(self) -> None:
        """Create the fetch-worker pool and block until every actor is
        live (one no-op RPC each), and spawn the admission task workers
        with one empty dedup→trap→finalize round (no state mutated, no
        files written). A long-lived deployment keeps these processes
        standing across crawls; benchmarks call this before the timed
        window so the figure measures crawl work, not Ray process spawn —
        the first distributed-admission wave otherwise pays ~10-15 s of
        python worker startup on a 32-cpu box."""
        workers = self._fetch_pool()
        ray.get([w.busy_reset.remote() for w in workers])
        S = self.cfg.num_shards
        empty_ref = ray.put(CANDIDATE_SCHEMA.empty_table())
        pre = _presplit_task.options(num_returns=S + 1).remote(
            [empty_ref], S)
        pairs = [_dedup_split_task.remote(s, [pre[s]], self.shards[s], S)
                 for s in range(S)]
        splits = ray.get([p[0] for p in pairs])
        bounds = list(range(S + 1))
        tg = [self.shards[t].trap_gate.remote(
                  [splits[sd][t] for sd in range(S)], 1, bounds)
              for t in range(S)]
        ray.get(tg)
        fin = [_finalize_range_task.remote([None], 0, 0,
                                           "/tmp/graft-noop.parquet",
                                           self.shards)
               for _ in range(S)]
        ray.get([f[1] for f in fin])

    def release_workers(self) -> None:
        """Kill the fetch pool (frees its CPU reservations for post-crawl
        report pipelines). Seen shards stay alive (num_cpus=0 memory
        actors) so tests can still inspect the seen set."""
        if self._workers is not None:
            for w in self._workers:
                ray.kill(w)
            self._workers = None

    # ------------------------------------------------------------ paths
    def _p(self, *parts) -> str:
        return os.path.join(self.out_dir, *parts)

    def _lineage_path(self, wave) -> str:
        return self._p("lineage", f"wave-{wave}.json")

    # ------------------------------------------------------------ start
    def start(self, seeds: list[str]) -> None:
        for d in ("pages", "links", "admitted", "frontier", "lineage"):
            os.makedirs(self._p(d), exist_ok=True)
        with open(self._p("crawl_config.json"), "w") as f:
            json.dump({"base_domain": self.cfg.base_domain,
                       "max_depth": self.cfg.max_depth,
                       "max_urls": self.cfg.max_urls,
                       "num_shards": self.cfg.num_shards,
                       "trap_threshold": self.cfg.trap_threshold,
                       "per_host_wave_cap": self.cfg.per_host_wave_cap}, f)
        admit_urls = list(seeds)
        if self.cfg.use_sitemap:
            # S5 sitemap seeding: roots from robots Sitemap: lines → depth-0
            # frontier entries, same admission path as discovered links
            from ..sources.sitemap import (expand_sitemaps,
                                           sitemap_roots_from_robots)
            sm_path = os.path.join(self.corpus_dir, "sitemaps.parquet")
            if os.path.exists(sm_path):
                robots_rows = pq.read_table(
                    os.path.join(self.corpus_dir,
                                 "robots.parquet")).to_pylist()
                roots = sitemap_roots_from_robots(robots_rows)
                sm_rows = pq.read_table(sm_path).to_pylist()
                for u in expand_sitemaps(sm_rows, roots):
                    if should_crawl(u, self.cfg,
                                    self.robots if self.cfg.respect_robots
                                    else None):
                        admit_urls.append(u)
        # batched seed admission, exact-equivalent to the sequential
        # per-seed loop: (1) within-batch dedup by sha (first wins),
        # (2) seen-filter probe, (3) ordered trap gate per signature shard
        # (counts live in the SeenShard actors), (4) bulk insert of
        # survivors. Trap-rejected seeds never enter the seen set.
        import numpy as np
        from zlib import crc32
        shas = [url_sha1(u) for u in admit_urls]
        sigs = [url_signature(u) for u in admit_urls]
        batch_seen: set[str] = set()
        order = []
        for i, sha in enumerate(shas):
            if sha not in batch_seen:
                batch_seen.add(sha)
                order.append(i)
        by_shard: dict[int, list[int]] = {}
        for i in order:
            by_shard.setdefault(shard_of(shas[i], self.cfg.num_shards),
                                []).append(i)
        cfuts = {s: self.shards[s].contains.remote([shas[i] for i in idx])
                 for s, idx in by_shard.items()}
        unseen: set[int] = set()
        for s, idx in by_shard.items():
            for i, present in zip(idx, ray.get(cfuts[s])):
                if not present:
                    unseen.add(i)
        cand = [i for i in order if i in unseen]
        tby: dict[int, list[int]] = {}
        for i in cand:
            tby.setdefault(crc32(sigs[i].encode()) % self.cfg.num_shards,
                           []).append(i)
        tfuts = {t: self.shards[t].trap_gate_mask.remote(
                     [sigs[i] for i in idx], self.cfg.trap_threshold)
                 for t, idx in tby.items()}
        admit_ok: set[int] = set()
        for t, idx in tby.items():
            for i, ok in zip(idx, ray.get(tfuts[t])):
                if ok:
                    admit_ok.add(i)
        rows = []
        adm_by_shard: dict[int, list[int]] = {}
        for i in cand:
            if i not in admit_ok:
                continue
            u, sha, sig = admit_urls[i], shas[i], sigs[i]
            adm_by_shard.setdefault(
                shard_of(sha, self.cfg.num_shards),
                []).append(int(sha[:16], 16))
            rows.append({"url": u, "depth": 0, "seq": self.next_seq,
                         "wave": -1, "host": url_host(u),
                         "sha64": int(sha[:16], 16),
                         "part": shard_of(sha, self.num_parts),
                         "signature": sig})
            self.next_seq += 1
        if adm_by_shard:
            ray.get([self.shards[s].add_bulk.remote(
                         np.array(v, dtype=np.uint64))
                     for s, v in adm_by_shard.items()])
        init_schema = pa.schema([
            ("url", pa.string()), ("depth", pa.int32()),
            ("seq", pa.int64()), ("wave", pa.int32()),
            ("host", pa.string()), ("sha64", pa.uint64()),
            ("part", pa.int32()), ("signature", pa.string())])
        tbl = pa.Table.from_pylist(rows, schema=init_schema) if rows else None
        if tbl is not None:
            pq.write_table(tbl, self._p("admitted", "init.parquet"))
        self._commit("init", {"next_seq": self.next_seq, "fetched_total": 0,
                              "wave": 0})

    def _commit(self, tag, payload: dict) -> None:
        tmp = self._lineage_path(tag) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._lineage_path(tag))

    def _flush_pending(self) -> None:
        """Join the previous wave's checkpoint-write thread and commit its
        lineage. Called mid-next-wave so the parquet writes overlap the
        fetch; crash before commit ⇒ resume replays the wave (idempotent)."""
        if self._pending is not None:
            k, metrics, th = self._pending
            if th is not None:
                if isinstance(th, list):
                    ray.get(th)      # finalize-range completions (small
                                     # metadata returns; the admitted
                                     # parquet + seen inserts are durable
                                     # once these resolve)
                else:
                    th.join()
            self._commit(k, metrics)
            self._pending = None

    # ----------------------------------------------------------- resume
    def resume(self) -> int:
        """Restore from the last committed wave; returns the next wave id.
        Partial (uncommitted) wave outputs are discarded — admission inserts
        are idempotent so replaying the wave is exactly-once in effect."""
        if not os.path.exists(self._lineage_path("init")):
            raise FileNotFoundError("no committed init state in " + self.out_dir)
        waves = []
        for f in os.listdir(self._p("lineage")):
            if f.startswith("wave-") and f.endswith(".json"):
                tag = f[len("wave-"):-len(".json")]
                if tag.isdigit():
                    waves.append(int(tag))
        last = max(waves) if waves else -1
        state_file = (self._lineage_path(last) if last >= 0
                      else self._lineage_path("init"))
        with open(state_file) as f:
            st = json.load(f)
        self.next_seq = st["next_seq"]
        self.fetched_total = st["fetched_total"] if "fetched_total" in st else 0
        self.wave = last + 1
        self._frontier_cells = None
        self._frontier_cache = None
        # discard partial outputs beyond the last commit
        for k in range(self.wave, self.wave + 3):
            for d in (self._p("pages", f"wave={k}"),
                      self._p("links", f"wave={k}")):
                shutil.rmtree(d, ignore_errors=True)
            import glob as _g
            for fpath in (_g.glob(self._p("admitted",
                                          f"wave-{k:05d}*.parquet"))
                          + _g.glob(self._p(
                              "frontier",
                              f"deferred-{k + 1:05d}*.parquet"))):
                if os.path.exists(fpath):
                    os.remove(fpath)
        # replay admitted keys into shard actors + rebuild trap counts
        # (trap state is signature-sharded into the same actors)
        import glob as _glob
        from collections import Counter
        from zlib import crc32

        import numpy as np
        admitted_files = [self._p("admitted", "init.parquet")]
        for k in range(self.wave):
            admitted_files.extend(sorted(_glob.glob(
                self._p("admitted", f"wave-{k:05d}*.parquet"))))
        per_shard: dict[int, list] = {i: [] for i in range(self.cfg.num_shards)}
        trap_per_shard: dict[int, Counter] = {
            i: Counter() for i in range(self.cfg.num_shards)}
        for fpath in admitted_files:
            if not os.path.exists(fpath):
                continue
            tbl = pq.read_table(fpath, columns=["sha64", "signature"])
            s64 = tbl.column("sha64").to_numpy()
            shard_ids = (s64 >> np.uint64(32)) % self.cfg.num_shards
            for s in np.unique(shard_ids).tolist():
                per_shard[int(s)].append(s64[shard_ids == s])
            for sig in tbl.column("signature").to_pylist():
                trap_per_shard[crc32(sig.encode())
                               % self.cfg.num_shards][sig] += 1
        futs = [self.shards[i].add_bulk.remote(np.concatenate(v))
                for i, v in per_shard.items() if v]
        futs += [self.shards[t].trap_rebuild.remote(list(c.keys()),
                                                    list(c.values()))
                 for t, c in trap_per_shard.items() if c]
        if futs:
            ray.get(futs)
        return self.wave

    # ------------------------------------------------------------ waves
    def _load_frontier(self, wave: int) -> pa.Table | None:
        """Wave k's frontier = admitted rows of wave k-1 (the admitted
        checkpoint IS the frontier — no duplicate file) plus any politeness
        deferrals carried from wave k-1."""
        import numpy as np
        if self._frontier_cache is not None and \
                self._frontier_cache[0] == wave:
            tbl = self._frontier_cache[1]
            if tbl is None or tbl.num_rows == 0:
                return None
            return tbl
        parts = []
        import glob as _gd
        for dp in sorted(_gd.glob(self._p(
                "frontier", f"deferred-{wave:05d}*.parquet"))):
            parts.append(pq.read_table(dp).select(FRONTIER_COLS))
        import glob as _g
        aps = ([self._p("admitted", "init.parquet")] if wave == 0
               else sorted(_g.glob(self._p(
                   "admitted", f"wave-{wave - 1:05d}*.parquet"))))
        for ap in aps:
            if not os.path.exists(ap):
                continue
            t = pq.read_table(ap, columns=["url", "depth", "seq",
                                           "host", "part"])
            t = t.append_column("wave", pa.array(
                np.full(t.num_rows, wave, dtype=np.int32)))
            parts.append(t.select(FRONTIER_COLS))
        if not parts:
            return None
        return pa.concat_tables(parts)

    def run_wave(self) -> dict | None:
        """Execute one wave; returns wave metrics or None when done.

        Dispatch: when the previous wave's distributed admission left the
        frontier as plasma cells, run the fully distributed wave (cells
        path — politeness, fetch, dedup, trap, seq all in tasks/actors;
        driver holds only per-cell/per-host/per-range summaries). Small
        frontiers collapse to the driver-resident table path, which is
        exact and cheaper at low row counts.
        """
        k = self.wave
        if self._frontier_cells is not None and \
                self._frontier_cells[0] == k:
            cells = self._resolve_cells(self._frontier_cells[1])
            self._frontier_cells = None
            total = sum(c[2] for c in cells)
            if total == 0:
                return None
            if total < self.distributed_dedup_threshold:
                return self._run_wave_table(k, self._cells_to_table(
                    cells, k))
            return self._run_wave_cells(k, cells)
        frontier = self._load_frontier(k)
        if frontier is None or frontier.num_rows == 0:
            return None
        return self._run_wave_table(k, frontier)

    # ----------------------------------------------- frontier cell helpers
    def _resolve_cells(self, raw) -> list:
        """Materialize cell metadata (NOT cell rows): each cell is
        (table_or_ref, start, length, depth, seq_lo), ordered by
        (depth, seq block). ``raw`` carries finalize-range futures whose
        small metadata returns resolve here; deferred cells from the
        previous wave's gate phase order before new cells of the same
        depth (their seqs are strictly older)."""
        new_refs, slices_futs, offsets, deferred_cells = raw
        cells = []
        slices = ray.get(slices_futs) if slices_futs else []
        for (ref, off), depth_slices in zip(zip(new_refs, offsets), slices):
            for (d, s0, ln) in depth_slices:
                cells.append((ref, s0, ln, d, off))
        cells.extend(deferred_cells)
        cells.sort(key=lambda c: (c[3], c[4]))
        return cells

    def _cells_to_table(self, cells: list, wave: int) -> pa.Table:
        """Collapse plasma cells to a driver frontier table (small-wave
        path); restores FRONTIER_COLS incl. the wave stamp."""
        import numpy as np
        parts = []
        for ref, s0, ln, _d, _lo in cells:
            t = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            sub = t.slice(s0, ln)
            parts.append(sub.append_column("wave", pa.array(
                np.full(sub.num_rows, wave, dtype=np.int32)))
                .select(FRONTIER_COLS))
        return pa.concat_tables(parts) if parts else None

    # chunks per _presplit_task group: ~64 × 768-row chunks ≈ 100k-row
    # candidate partials — large enough that group overhead is noise,
    # small enough that groups complete well inside the fetch window.
    # (An eager smaller-group flush in the dispatch tail was tried and
    # measured WORSE — more partials per dedup-split task + more task
    # overhead outweigh shaving the final combiner off the critical path.)
    PRESPLIT_GROUP = 64

    def _dispatch_chunks(self, chunks: list, pages_dir: str,
                         links_dir: str, presplit: int | None = None,
                         stream: "_StreamAdmit | None" = None):
        """Pull-based fetch dispatch with affinity-preferred work stealing
        over (part, ref, off, len) chunks; returns candidate chunk refs.
        Cache affinity: part % pool (matches the prefetch); a worker that
        drains its queue steals from the longest queue — static balancing
        cannot absorb the ~1.6× per-core throughput spread this host shows
        under full load (same mechanism that handles straggler nodes).

        With ``presplit=S`` (distributed-admission waves), completed
        chunks are combined+pre-partitioned by ``_presplit_task`` in
        groups AS THEY FINISH, overlapping the admission combiner with the
        fetch itself; returns (groups, count_refs) where each group is the
        list of S per-shard partial refs."""
        workers = self._fetch_pool()
        pool = len(workers)
        queues: list[list] = [[] for _ in range(pool)]
        for part, ref, off, ln in chunks:
            queues[part % pool].append((ref, off, ln))
        inflight: dict = {}

        def submit(w_idx: int) -> None:
            if queues[w_idx]:
                ref, off, ln = queues[w_idx].pop(0)
            else:
                victim = max(range(pool), key=lambda j: len(queues[j]))
                if not queues[victim]:
                    return
                ref, off, ln = queues[victim].pop()
            fut = workers[w_idx].process_sliced.remote(
                ref, off, ln, pages_dir, links_dir)
            inflight[fut] = w_idx

        groups: list[list] = []
        count_refs: list = []

        def flush_group(buf: list) -> None:
            refs = _presplit_task.options(
                num_returns=presplit + 1).remote(buf, presplit)
            groups.append(list(refs[:presplit]))
            count_refs.append(refs[presplit])

        t_s0 = time.perf_counter()
        for w_idx in range(pool):
            submit(w_idx)   # 1 in flight: a queued chunk on a slow core
                            # can't be stolen, so don't buffer (2-in-flight
                            # double-buffering A/B'd slower, BASELINE.md r5)
        chunk_refs: list = []
        pending: list = []
        while inflight:
            done, _ = ray.wait(list(inflight), num_returns=1)
            w_idx = inflight.pop(done[0])
            if presplit is None:
                if stream is not None:
                    stream.feed(done[0])     # dedup+probe off-thread
                else:
                    chunk_refs.append(done[0])   # candidates stay in plasma
            else:
                pending.append(done[0])
                if len(pending) >= self.PRESPLIT_GROUP:
                    flush_group(pending)
                    pending = []
            submit(w_idx)
        if presplit is not None and pending:
            flush_group(pending)
        self._t_gather = time.perf_counter() - t_s0
        counters = ray.get([w.busy_reset.remote() for w in workers])
        busy = [c["busy"] for c in counters]
        self._busy_max = max(busy)
        self._busy_sum = sum(busy)
        self._busy_all = [round(b, 3) for b in busy]
        self._skipped_oversize = sum(c["skipped_oversize"]
                                     for c in counters)
        self._rate_limited = sum(c.get("rate_limited", 0) for c in counters)
        self._retries_total = sum(c.get("retries_total", 0)
                                  for c in counters)
        self._retry_wait_s = sum(c.get("retry_wait_s", 0.0)
                                 for c in counters)
        if presplit is not None:
            return groups, count_refs
        return chunk_refs

    def _run_wave_table(self, k: int, frontier: pa.Table) -> dict | None:
        """Driver-frontier wave (small/medium waves; exact semantics)."""
        import numpy as np

        t0 = time.perf_counter()
        self._t_probe = self._t_trap = self._t_take = self._t_addfut = 0.0
        frontier = frontier.sort_by([("depth", "ascending"),
                                     ("seq", "ascending")])
        fetchable_tbl = frontier.filter(
            pc.less_equal(frontier.column("depth"), self.cfg.max_depth))
        # politeness gating (T2/T3): per-host wave budget, robots crawl-delay
        gated_tbl, deferred_tbl = self.politeness.gate_table(fetchable_tbl)
        remaining = self.cfg.max_urls - self.fetched_total
        stopped = False
        if remaining <= 0:
            return None
        if gated_tbl.num_rows > remaining:
            gated_tbl, stopped = gated_tbl.slice(0, remaining), True
            deferred_tbl = None
        if gated_tbl.num_rows == 0:
            # everything deferred (pathological cap); avoid a livelock by
            # promoting one row
            if deferred_tbl is not None and deferred_tbl.num_rows:
                gated_tbl = deferred_tbl.slice(0, 1)
                deferred_tbl = deferred_tbl.slice(1)
            else:
                return None
        gated_tbl = gated_tbl.set_column(
            gated_tbl.schema.get_field_index("wave"), "wave",
            pa.array(np.full(gated_tbl.num_rows, k, dtype=np.int32)))

        # --------- fetch + parse + sink + canonicalize: ONE streaming
        # execution per wave. The fetch actors (partition-affine corpus
        # lookup) write pages/links parquet as they go (deterministic batch
        # file names → retry-idempotent) and emit candidate edges; the
        # canonicalize stage cleans/filters/hashes them.
        pages_dir = self._p("pages", f"wave={k}")
        links_dir = self._p("links", f"wave={k}")
        os.makedirs(pages_dir, exist_ok=True)
        os.makedirs(links_dir, exist_ok=True)
        frontier_tbl = gated_tbl.sort_by("part")
        n_gated = frontier_tbl.num_rows
        stream: _StreamAdmit | None = None
        if n_gated < self.small_wave_threshold and not self._big_corpus:
            # small-wave fast path: identical pure functions, driver-local —
            # skips per-wave executor + actor-pool startup (a few seconds)
            # that would dominate a wave of a few hundred lookups. Large
            # waves (the 10^10 regime, and bench) take the distributed path.
            if self._local_fetcher is None:
                self._local_fetcher = CorpusFetcher(
                    self.corpus_dir, self.cfg.base_domain, self.num_parts,
                    pages_dir, links_dir,
                    max_file_size=self.cfg.max_file_size,
                    retries=self.cfg.retries,
                    retry_base_delay=self.cfg.retry_base_delay)
            else:
                self._local_fetcher.pages_dir = pages_dir
                self._local_fetcher.links_dir = links_dir
            lf = self._local_fetcher
            skip0, rl0 = lf.skipped_oversize, lf.rate_limited
            rt0, rw0 = lf.retries_total, lf.retry_wait_s
            cand = self._local_fetcher(frontier_tbl)
            self._skipped_oversize = lf.skipped_oversize - skip0
            self._rate_limited = lf.rate_limited - rl0
            self._retries_total = lf.retries_total - rt0
            self._retry_wait_s = lf.retry_wait_s - rw0
            raw_tbl = canonicalize_candidates(
                cand, self.cfg,
                self.robots if self.cfg.respect_robots else None,
                self.num_parts)
            t_fetch = time.perf_counter() - t0
        else:
            # distributed path: persistent partition-affine actor pool
            # (created once per crawl; partition caches survive waves).
            # frontier_tbl is sorted by part → partition runs are contiguous
            # zero-copy slices; the whole frontier ships once via ray.put
            # and each chunk is (part, ref, off, len) against it. Large
            # partitions sub-split to fetch_batch_size for pipelining.
            parts_np = frontier_tbl.column("part").to_numpy()
            bounds = np.flatnonzero(np.diff(parts_np)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(parts_np)]))
            t_p0 = time.perf_counter()
            frontier_ref = ray.put(frontier_tbl)
            self._t_put = time.perf_counter() - t_p0
            chunks = []
            for s0, e0 in zip(starts.tolist(), ends.tolist()):
                part = int(parts_np[s0])
                for off in range(s0, e0, self.fetch_batch_size):
                    chunks.append((part, frontier_ref, off,
                                   min(self.fetch_batch_size, e0 - off)))
            distributed = n_gated >= self.distributed_dedup_threshold
            stream = None if distributed else _StreamAdmit(self.shards)
            dispatched = self._dispatch_chunks(
                chunks, pages_dir, links_dir,
                presplit=self.cfg.num_shards if distributed else None,
                stream=stream)
            if distributed:
                raw_tbl = None   # dedup + admission distributed below
                presplit_out = dispatched
            else:
                raw_tbl = None   # resolved by stream.finalize() post-seal
                del dispatched, frontier_ref
        t_fetch = time.perf_counter() - t0
        # previous wave's checkpoint IO overlapped this fetch; seal it now
        t_s = time.perf_counter()
        self._flush_pending()
        self._t_seal = time.perf_counter() - t_s
        if raw_tbl is None and stream is None:
            # fully distributed admission: candidates never visit the
            # driver. Deferred rows (driver-resident on this path) ride
            # along as next-wave cells.
            by_part_np = np.unique(parts_np, return_counts=True)
            by_part = dict(zip(by_part_np[0].tolist(),
                               by_part_np[1].tolist()))
            parent_lo = int(pc.min(frontier_tbl.column("seq")).as_py())
            return self._finish_wave_distributed(
                k, presplit_out, t0, t_fetch, n_gated, by_part,
                ("table", deferred_tbl), stopped, parent_lo)
        # within-wave dedup + membership probe: first sighting per sha64 by
        # (parent_seq, pos), then the shard filter. Three shapes share the
        # semantics: STREAMED driver admission (actor-pool waves below the
        # distributed threshold — per-group dedup + seen probes already ran
        # inside the fetch window, _StreamAdmit), post-hoc driver lexsort
        # (small local waves), and the fully distributed tail above (the
        # hash-partitioned groupby-aggregate against the filter shards of
        # the north rule — the only viable shape at 10^10).
        pre_probed = stream is not None
        if pre_probed:
            raw_tbl, keep, n_candidates = stream.finalize()
            if n_candidates:
                s64 = raw_tbl.column("sha64").to_numpy()
        elif raw_tbl.num_rows:
            n_candidates = raw_tbl.num_rows
            # first sighting per sha64 by (parent_seq, pos) via ONE numpy
            # lexsort over int columns; the kept-row index array (`keep`,
            # in global admission order) carries through the whole
            # admission instead of materializing a kept-row table — the
            # wide Arrow take (url/host/signature string gathers for
            # every kept candidate) is DEFERRED to the admitted subset
            # only, which on seen-saturated waves is orders of magnitude
            # smaller (bench2 wave 3: 1.2M candidates → 4 admitted;
            # serial driver time hurts the N→4N scaling ratio twice)
            s64 = raw_tbl.column("sha64").to_numpy()
            ps_np = raw_tbl.column("parent_seq").to_numpy()
            pos_np = raw_tbl.column("pos").to_numpy()
            order = np.lexsort((pos_np, ps_np, s64))
            s_sorted = s64[order]
            first_mask = np.empty(len(s_sorted), dtype=bool)
            first_mask[0] = True
            np.not_equal(s_sorted[1:], s_sorted[:-1], out=first_mask[1:])
            keep = order[first_mask]
            keep = keep[np.lexsort((pos_np[keep], ps_np[keep]))]
        else:
            keep = np.empty(0, dtype=np.int64)
            n_candidates = 0
        t_dedup = time.perf_counter() - t0 - t_fetch

        # two-phase admission, vectorized: (1) membership probe against
        # shard actors (u64 key arrays, parallel across shards), (2) trap
        # gate — bulk numpy for signatures that cannot cross the threshold
        # this wave, ordered fallback only for the few that can (trap-
        # rejected URLs must NOT enter the seen set, link_manager.py:87-107),
        # (3) bulk insert of survivors. The driver is the sole writer
        # within a wave so the phases compose atomically; replay after a
        # crash re-runs all three idempotently.
        n = len(keep)
        t_a0 = time.perf_counter()
        if n:
            sha64 = s64[keep]
            shard_np = raw_tbl.column("shard").to_numpy()[keep]
            if pre_probed:
                # seen-membership already probed inside the fetch window
                # (per-group, seen set frozen within the wave); keep holds
                # NEW first sightings only
                is_new = np.ones(n, dtype=bool)
                self._t_probe = round(stream.probe_wait, 3)
            else:
                is_new = np.zeros(n, dtype=bool)
                shard_masks = {}
                futs = {}
                for s in np.unique(shard_np).tolist():
                    m = shard_np == s
                    shard_masks[s] = m
                    futs[s] = self.shards[s].contains_u64.remote(sha64[m])
                for s, m in shard_masks.items():
                    is_new[m] = ~np.asarray(ray.get(futs[s]), dtype=bool)
                self._t_probe = time.perf_counter() - t_a0

            # trap gating (T4 running signature counts, sharded into the
            # SeenShard actors by crc32(signature) % num_shards — one
            # parallel ordered-mask RPC per signature shard; `keep` is in
            # (parent_seq, pos) order so each shard's subset preserves the
            # global admission order for its signatures). Signature
            # strings are gathered ONLY for the is_new rows (the seen
            # majority never touches a string gather).
            sig_shard_np = raw_tbl.column("sig_shard").to_numpy()[keep]
            sig_col = raw_tbl.column("signature")
            admitted_mask = np.zeros(n, dtype=bool)
            new_rows = np.flatnonzero(is_new)
            tfuts, tidx = {}, {}
            if new_rows.size:
                # ONE signature string gather for all new rows (stable
                # argsort by sig shard → per-shard runs are contiguous
                # zero-copy slices of it, each still in global admission
                # order); the old per-shard take loop was 32 separate
                # driver-serial string gathers. The actor converts to
                # Python strings in parallel (driver pylist + pickled
                # list cost ~1.0 s/wave at 560k candidates).
                sgord = np.argsort(sig_shard_np[new_rows], kind="stable")
                sorted_rows = new_rows[sgord]
                sig_all = sig_col.take(
                    pa.array(keep[sorted_rows])).combine_chunks()
                sg_sorted = sig_shard_np[sorted_rows]
                sb = np.flatnonzero(np.diff(sg_sorted)) + 1
                s0s = np.concatenate(([0], sb))
                e0s = np.concatenate((sb, [len(sg_sorted)]))
                for a, z in zip(s0s.tolist(), e0s.tolist()):
                    t = int(sg_sorted[a])
                    tidx[t] = sorted_rows[a:z]
                    tfuts[t] = self.shards[t].trap_gate_mask.remote(
                        sig_all.slice(a, z - a), self.cfg.trap_threshold)
            for t, idx in tidx.items():
                admitted_mask[idx] = ray.get(tfuts[t])
            trap_rejected = int(is_new.sum() - admitted_mask.sum())
            self._t_trap = time.perf_counter() - t_a0 - (
                0.0 if pre_probed else self._t_probe)

            # the one wide row gather of the wave: admitted rows only,
            # checkpoint/frontier columns only (parent_seq/pos/shard/
            # sig_shard never leave the candidate table)
            t_tk0 = time.perf_counter()
            adm_tbl = raw_tbl.select(
                ["url", "depth", "host", "sha64", "part", "signature"]
            ).take(pa.array(keep[admitted_mask]))
            n_adm = adm_tbl.num_rows
            seqs = np.arange(self.next_seq, self.next_seq + n_adm,
                             dtype=np.int64)
            self.next_seq += n_adm
            adm_tbl = adm_tbl.append_column("seq", pa.array(seqs))
            adm_shards = shard_np[admitted_mask]
            adm_sha64 = sha64[admitted_mask]
            add_futs = [self.shards[s].add_bulk.remote(
                            adm_sha64[adm_shards == s])
                        for s in np.unique(adm_shards).tolist()]
            self._t_take = time.perf_counter() - t_tk0
        else:
            adm_tbl = None
            n_adm = 0
            trap_rejected = 0
            add_futs = []

        # --------- checkpoint: admitted keys + deferred file written by a
        # background thread; lineage commit deferred to _flush_pending()
        # (joins the thread first) so the parquet IO overlaps the next
        # wave's fetch. The in-memory frontier cache hands the next wave
        # its input without re-reading the file.
        import threading

        out_adm = None
        if adm_tbl is not None and n_adm:
            out_adm = adm_tbl.select(["url", "depth", "seq", "host",
                                      "sha64", "part", "signature"]) \
                .append_column("wave", pa.array(
                    np.full(n_adm, k, dtype=np.int32)))
        n_deferred = deferred_tbl.num_rows if deferred_tbl is not None else 0
        d_tbl = None
        if not stopped and n_deferred:
            d_tbl = deferred_tbl.set_column(
                deferred_tbl.schema.get_field_index("wave"), "wave",
                pa.array(np.full(n_deferred, k + 1, dtype=np.int32))) \
                .select(FRONTIER_COLS)

        def _write_checkpoint(adm=out_adm, dt=d_tbl, wave_k=k):
            if adm is not None:
                pq.write_table(adm, self._p("admitted",
                                            f"wave-{wave_k:05d}.parquet"))
            if dt is not None:
                pq.write_table(dt, self._p(
                    "frontier", f"deferred-{wave_k + 1:05d}.parquet"))

        write_thread = threading.Thread(target=_write_checkpoint,
                                        daemon=True)
        write_thread.start()
        # next wave's frontier, in memory
        if not stopped:
            nparts = []
            if d_tbl is not None:
                nparts.append(d_tbl)
            if adm_tbl is not None and n_adm:
                nparts.append(adm_tbl.append_column(
                    "wave", pa.array(np.full(n_adm, k + 1, dtype=np.int32))
                ).select(FRONTIER_COLS))
            self._frontier_cache = (
                k + 1, pa.concat_tables(nparts) if nparts else None)
        if add_futs:
            # shard inserts must land before this wave's lineage commit —
            # _flush_pending joins the write thread; inserts land here
            t_af0 = time.perf_counter()
            ray.get(add_futs)
            self._t_addfut = time.perf_counter() - t_af0
        n_skipped = getattr(self, "_skipped_oversize", 0)
        # S2 skips produce no pages row: exclude them from the crawled
        # count so exports (csv rows) == fetched_total (ADVICE r2)
        self.fetched_total += n_gated - n_skipped
        elapsed = time.perf_counter() - t0
        parts_u, parts_c = np.unique(
            frontier_tbl.column("part").to_numpy(), return_counts=True)
        by_part = dict(zip(parts_u.tolist(), parts_c.tolist()))
        metrics = {
            "wave": k, "fetched": n_gated - n_skipped,
            "skipped_oversize": n_skipped, "candidates": n_candidates,
            "rate_limited": getattr(self, "_rate_limited", 0),
            "retries_total": getattr(self, "_retries_total", 0),
            "retry_wait_s": round(getattr(self, "_retry_wait_s", 0.0), 3),
            "admitted": n_adm, "deferred": n_deferred,
            "trap_rejected": trap_rejected, "elapsed_s": round(elapsed, 3),
            "t_fetch": round(t_fetch, 3), "t_dedup": round(t_dedup, 3),
            "t_admit": round(elapsed - t_fetch - t_dedup, 3),
            "t_put": round(getattr(self, "_t_put", 0.0), 3),
            "t_gather": round(getattr(self, "_t_gather", 0.0), 3),
            "t_probe": round(getattr(self, "_t_probe", 0.0), 3),
            "t_trap": round(getattr(self, "_t_trap", 0.0), 3),
            "t_take": round(getattr(self, "_t_take", 0.0), 3),
            "t_addfut": round(getattr(self, "_t_addfut", 0.0), 3),
            "busy_max": round(getattr(self, "_busy_max", 0.0), 3),
            "busy_sum": round(getattr(self, "_busy_sum", 0.0), 3),
            "busy_all": getattr(self, "_busy_all", []),
            "next_seq": self.next_seq, "fetched_total": self.fetched_total,
            "by_part": {str(p): int(c) for p, c in sorted(by_part.items())},
            "stopped": stopped,
        }
        self._pending = (k, metrics, write_thread)
        self.wave += 1
        if stopped:
            return dict(metrics, done=True)
        return metrics


    def _finish_wave_distributed(self, k: int, presplit_out: tuple,
                                 t0: float,
                                 t_fetch: float, n_gated: int,
                                 by_part: dict, deferred_info: tuple,
                                 stopped: bool, parent_lo: int) -> dict:
        """Distributed admission tail: group combiners (already running —
        overlapped with the fetch by _dispatch_chunks) → per-seen-shard
        dedup-split tasks → per-signature-shard trap-gate actor calls →
        per-parent_seq-range seq-finalize tasks (block-offset cumsum).
        The driver sees only refs and per-shard/per-range counts;
        candidate and admitted rows stay in plasma (VERDICT r2 #4). The
        next wave's frontier is handed over as plasma cells; lineage
        commit waits on the finalize completions in _flush_pending,
        overlapping the next wave's politeness + fetch."""
        import numpy as np
        S = self.cfg.num_shards
        groups, count_refs = presplit_out
        # round 1: per-seen-shard merge of the group partials + membership
        # probe + sig-shard split. Each task reads only its own shard's
        # ~len(groups) partials (the group combiners already deduped and
        # pre-partitioned during the fetch window).
        split_pairs = [
            _dedup_split_task.remote(s, [g[s] for g in groups],
                                     self.shards[s], S)
            for s in range(S)]
        split_ref_lists = ray.get([pr[0] for pr in split_pairs])
        n_candidates = int(sum(ray.get(count_refs)))
        del groups, presplit_out
        t_split = time.perf_counter() - t0 - t_fetch
        # round 2: ordered trap gate per signature shard, split by
        # parent_seq range (equal-width over the gated seq span; parent
        # seqs are dense integers so ranges stay balanced)
        R = S
        span = max(1, self.next_seq - parent_lo)
        bounds = [parent_lo + (span * i) // R for i in range(R)]
        bounds.append(self.next_seq)
        for i in range(1, len(bounds)):
            bounds[i] = max(bounds[i], bounds[i - 1])
        tg = ray.get([self.shards[t].trap_gate.remote(
                          [split_ref_lists[sd][t] for sd in range(S)],
                          self.cfg.trap_threshold, bounds)
                      for t in range(S)])
        range_counts = np.zeros(R, dtype=np.int64)
        trap_rejected = 0
        for _refs, (_n_in, n_rej, counts) in tg:
            trap_rejected += n_rej
            range_counts += np.asarray(counts, dtype=np.int64)
        n_adm = int(range_counts.sum())
        offsets = self.next_seq + np.concatenate(
            ([0], np.cumsum(range_counts)[:-1]))
        self.next_seq += n_adm
        t_dedup = time.perf_counter() - t0 - t_fetch
        # round 3: block-offset seq assignment + admitted checkpoint +
        # seen-filter insert, one task per nonempty range
        new_refs, slices_futs, cell_offsets, fin_waits = [], [], [], []
        for r in range(R):
            if range_counts[r] == 0:
                continue
            path = self._p("admitted", f"wave-{k:05d}-r{r:02d}.parquet")
            f_ref, sl_ref = _finalize_range_task.remote(
                [tg[t][0][r] for t in range(S)], int(offsets[r]), k,
                path, self.shards)
            new_refs.append(f_ref)
            slices_futs.append(sl_ref)
            cell_offsets.append(int(offsets[r]))
            fin_waits.append(sl_ref)
        # deferred rows ride into the next wave's cells
        deferred_cells: list = []
        n_deferred = 0
        if not stopped:
            if deferred_info[0] == "table":
                d_tbl = deferred_info[1]
                if d_tbl is not None and d_tbl.num_rows:
                    n_deferred = d_tbl.num_rows
                    dt = d_tbl.set_column(
                        d_tbl.schema.get_field_index("wave"), "wave",
                        pa.array(np.full(n_deferred, k + 1,
                                         dtype=np.int32)))                         .select(FRONTIER_COLS)
                    pq.write_table(dt, self._p(
                        "frontier", f"deferred-{k + 1:05d}.parquet"))
                    piece = d_tbl.select(["url", "depth", "seq", "host",
                                          "part"])
                    d = piece.column("depth").to_numpy()
                    dorder = np.argsort(d, kind="stable")
                    piece = piece.take(pa.array(dorder))
                    ds_sorted = d[dorder]
                    b = np.flatnonzero(np.diff(ds_sorted)) + 1
                    s0s = np.concatenate(([0], b)).tolist()
                    e0s = np.concatenate((b, [len(ds_sorted)])).tolist()
                    seqs_np = piece.column("seq").to_numpy()
                    for s0, e0 in zip(s0s, e0s):
                        deferred_cells.append(
                            (piece, int(s0), int(e0 - s0),
                             int(ds_sorted[s0]), int(seqs_np[s0])))
            else:
                deferred_cells = deferred_info[1]
                n_deferred = sum(c[2] for c in deferred_cells)
            self._frontier_cells = (
                k + 1, (new_refs, slices_futs, cell_offsets,
                        deferred_cells))
            self._frontier_cache = None
        n_skipped = getattr(self, "_skipped_oversize", 0)
        self.fetched_total += n_gated - n_skipped
        elapsed = time.perf_counter() - t0
        metrics = {
            "wave": k, "fetched": n_gated - n_skipped,
            "skipped_oversize": n_skipped, "candidates": n_candidates,
            "rate_limited": getattr(self, "_rate_limited", 0),
            "retries_total": getattr(self, "_retries_total", 0),
            "retry_wait_s": round(getattr(self, "_retry_wait_s", 0.0), 3),
            "admitted": n_adm, "deferred": n_deferred,
            "trap_rejected": trap_rejected, "elapsed_s": round(elapsed, 3),
            "t_fetch": round(t_fetch, 3), "t_dedup": round(t_dedup, 3),
            "t_split": round(t_split, 3),
            "t_seal": round(getattr(self, "_t_seal", 0.0), 3),
            "t_admit": round(elapsed - t_fetch - t_dedup, 3),
            "t_put": round(getattr(self, "_t_put", 0.0), 3),
            "t_gather": round(getattr(self, "_t_gather", 0.0), 3),
            "busy_max": round(getattr(self, "_busy_max", 0.0), 3),
            "busy_sum": round(getattr(self, "_busy_sum", 0.0), 3),
            "busy_all": getattr(self, "_busy_all", []),
            "next_seq": self.next_seq, "fetched_total": self.fetched_total,
            "by_part": {str(p): int(c) for p, c in sorted(by_part.items())},
            "stopped": stopped, "admission": "distributed",
        }
        self._pending = (k, metrics, fin_waits)
        self.wave += 1
        if stopped:
            return dict(metrics, done=True)
        return metrics

    def _run_wave_cells(self, k: int, cells: list) -> dict | None:
        """Fully distributed wave over plasma frontier cells: politeness
        gating runs inside per-cell tasks against driver-computed per-host
        prefix counts (metadata-sized — SURVEY §7.3's broadcast budget
        table), fetch chunks slice the granted cell tables, and admission
        is the distributed tail. Driver memory: O(cells + hosts + shards).
        """
        import numpy as np
        t0 = time.perf_counter()
        cells = [c for c in cells if c[3] <= self.cfg.max_depth]
        if not cells:
            return None
        remaining = self.cfg.max_urls - self.fetched_total
        if remaining <= 0:
            return None
        use_caps = self.cfg.per_host_wave_cap > 0
        caps: dict[str, int] = {}
        if use_caps:
            cfuts = [_host_counts_task.remote(c[0], c[1], c[2])
                     for c in cells]
            counts_per_cell = ray.get(cfuts)
            prior: dict[str, int] = {}
            planned = []
            for c, cnts in zip(cells, counts_per_cell):
                for h in cnts:
                    if h not in caps:
                        caps[h] = self.politeness.cap_for(h)
                granted = sum(min(max(caps[h] - prior.get(h, 0), 0), cnt)
                              for h, cnt in cnts.items())
                planned.append((c, dict(prior), int(granted)))
                for h, cnt in cnts.items():
                    prior[h] = prior.get(h, 0) + cnt
        else:
            planned = [(c, {}, c[2]) for c in cells]
        total_planned = sum(g for _, _, g in planned)
        if total_planned == 0:
            # pathological caps — the exact driver gate handles the
            # one-row livelock promotion
            return self._run_wave_table(k, self._cells_to_table(cells, k))
        stopped = False
        plans = []
        cum = 0
        for c, prior_c, granted in planned:
            if cum + granted >= remaining:
                plans.append((c, prior_c, int(remaining - cum)))
                stopped = True
                break
            plans.append((c, prior_c, int(granted)))
            cum += granted
        pages_dir = self._p("pages", f"wave={k}")
        links_dir = self._p("links", f"wave={k}")
        os.makedirs(pages_dir, exist_ok=True)
        os.makedirs(links_dir, exist_ok=True)
        gfuts = []
        for i, (c, prior_c, limit) in enumerate(plans):
            dpath = (None if stopped else self._p(
                "frontier", f"deferred-{k + 1:05d}-c{i:03d}.parquet"))
            gfuts.append(_gate_cell_task.remote(
                c[0], c[1], c[2], k, caps if use_caps else {}, prior_c,
                limit, dpath))
        granted_refs = [f[0] for f in gfuts]
        deferred_refs = [f[1] for f in gfuts]
        stats = ray.get([f[2] for f in gfuts])
        n_gated = sum(st[1] for st in stats)
        if n_gated == 0:
            return None
        by_part: dict[int, int] = {}
        chunks = []
        for gref, (part_slices, _ng, _nd) in zip(granted_refs, stats):
            for part, off, ln in part_slices:
                by_part[part] = by_part.get(part, 0) + ln
                for o2 in range(off, off + ln, self.fetch_batch_size):
                    chunks.append(
                        (part, gref, o2,
                         min(self.fetch_batch_size, off + ln - o2)))
        self._t_put = 0.0
        presplit_out = self._dispatch_chunks(
            chunks, pages_dir, links_dir, presplit=self.cfg.num_shards)
        t_fetch = time.perf_counter() - t0
        t_s = time.perf_counter()
        self._flush_pending()
        self._t_seal = time.perf_counter() - t_s
        deferred_cells: list = []
        if not stopped:
            for (c, _p, _l), dref, (_psl, _ng, n_d) in zip(
                    plans, deferred_refs, stats):
                if n_d:
                    deferred_cells.append((dref, 0, n_d, c[3], c[4]))
        parent_lo = min(c[4] for c, _, _ in plans)
        return self._finish_wave_distributed(
            k, presplit_out, t0, t_fetch, n_gated, by_part,
            ("cells", deferred_cells), stopped, parent_lo)

    def run(self, seeds: list[str] | None = None,
            resume: bool = False, max_waves: int = 10_000) -> dict:
        if resume:
            self.resume()
        else:
            if os.path.exists(self.out_dir):
                shutil.rmtree(self.out_dir)
            self.start(seeds or [])
        t0 = time.perf_counter()
        waves = []
        for _ in range(max_waves):
            m = self.run_wave()
            if m is None:
                break
            waves.append(m)
            if m.get("done"):
                break
        self._flush_pending()
        self.release_workers()
        # terminal lineage marker: lets report pipelines reuse a completed
        # crawl instead of re-running it (VERDICT r1 #9)
        self._commit("final", {
            "fetched_total": self.fetched_total,
            "num_waves": len(waves),
            "corpus_dir": self.corpus_dir,
        })
        return {
            "fetched_total": self.fetched_total,
            "waves": waves,
            "num_waves": len(waves),
            "rate_limited": sum(w.get("rate_limited", 0) for w in waves),
            "retries_total": sum(w.get("retries_total", 0) for w in waves),
            "retry_wait_s": round(
                sum(w.get("retry_wait_s", 0.0) for w in waves), 3),
            "elapsed_s": round(time.perf_counter() - t0, 3),
            "out_dir": self.out_dir,
        }

    # -------------------------------------------------------- inspection
    def trap_counts(self) -> dict[str, int]:
        """Merged per-signature trap counts from the shard actors
        (inspection/tests only — the live state is actor-sharded)."""
        snaps = ray.get([s.trap_snapshot.remote() for s in self.shards])
        out: dict[str, int] = {}
        for sn in snaps:
            out.update(sn)
        return out

    def retract_urls(self, urls: list[str]) -> int:
        """Remove URLs from the seen state (mid-crawl policy flip — a
        host's robots.txt turned disallow-all, or an operator withdraws
        a section): routes each url's sha1 to its shard (same ``shard_of``
        partitioning as admission) and deletes there. The URLs become
        re-admittable on the next wave. Requires exact or cuckoo shards
        (bloom bits cannot be unset — SeenShard.retract raises).
        Returns the number of keys actually removed."""
        from ..canonical import shard_of, url_sha1

        per_shard: dict[int, list[str]] = {}
        for u in urls:
            sha = url_sha1(u)
            per_shard.setdefault(shard_of(sha, self.cfg.num_shards),
                                 []).append(sha)
        counts = ray.get([self.shards[s].retract.remote(sh)
                          for s, sh in per_shard.items()])
        return int(sum(counts))

    def seen_sha1s(self) -> set[int]:
        """Union of all shard key sets (exact mode; tests only)."""
        parts = ray.get([s.snapshot_keys.remote() for s in self.shards])
        out: set[int] = set()
        for p in parts:
            out.update(p.tolist())
        return out


def crawl_paths(out_dir: str) -> dict[str, str]:
    return {"pages": os.path.join(out_dir, "pages"),
            "links": os.path.join(out_dir, "links"),
            "admitted": os.path.join(out_dir, "admitted"),
            "frontier": os.path.join(out_dir, "frontier"),
            "lineage": os.path.join(out_dir, "lineage")}
