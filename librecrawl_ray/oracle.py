"""Reference-faithful sequential crawl oracle (SURVEY.md §5.2).

A small pure-Python simulator of the reference's BFS crawl loop
(/root/reference/src/core/link_manager.py:43-118 deque+sets,
src/crawler.py:757-899 worker loop, :1425-1492 predicates), used as the
golden model the distributed wave engine must match exactly: crawl order
(wave, depth, seq), URL-seen set, trap rejections, politeness deferrals,
links and pages outputs.

Wave semantics (shared spec with engine/crawl.py):
- wave k fetches every frontier entry admitted before it, in (depth, seq)
  order, subject to the per-host politeness cap (over-cap entries defer to
  wave k+1 keeping their seq) and the global max_urls budget;
- candidates admit in (parent_seq, link_pos) order: first occurrence wins
  the seen-set slot, trap-signature counts increment per admission and a
  candidate whose signature already reached trap_threshold is rejected;
- entries with depth > max_depth are admitted to the seen set (reference
  queues them, then skips at pop: crawler.py:788-790) but never fetched.

This module deliberately has no Ray dependency and no sharding — it is the
sequential specification.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from .canonical import norm_url, url_host, url_signature
from .policy import CrawlConfig, host_cap, should_crawl
from .sources.robots import RobotsRules, robots_map
from .stages.fetch import fetch_and_parse


@dataclass
class OracleResult:
    crawl_order: list = field(default_factory=list)   # dicts: url, depth, seq, wave
    pages: list = field(default_factory=list)
    links: list = field(default_factory=list)
    seen: set = field(default_factory=set)            # norm urls
    trap_rejected: list = field(default_factory=list)
    deferred_events: list = field(default_factory=list)  # (wave, url) politeness
    trap_counts: dict = field(default_factory=dict)


def build_lookup(documents_table) -> dict[str, dict]:
    """norm_url(doc_id) → corpus row dict."""
    rows = documents_table.to_pylist()
    return {norm_url(r["doc_id"]): r for r in rows}


def simulate(documents_table, robots_table, seeds: list[str],
             cfg: CrawlConfig, sitemaps_table=None) -> OracleResult:
    lookup_map = build_lookup(documents_table)
    robots: dict[str, RobotsRules] = robots_map(robots_table.to_pylist())

    def lookup(url: str):
        return lookup_map.get(norm_url(url))

    res = OracleResult()
    seen: set[str] = set()
    trap_counts: dict[str, int] = defaultdict(int)
    next_seq = 0
    frontier: list[tuple[int, int, str]] = []   # (depth, seq, url)

    def admit(url: str, depth: int) -> bool:
        nonlocal next_seq
        key = norm_url(url)
        if key in seen:
            return False
        sig = url_signature(url)
        if trap_counts[sig] >= cfg.trap_threshold:
            res.trap_rejected.append(url)
            return False
        seen.add(key)
        trap_counts[sig] += 1
        frontier.append((depth, next_seq, url))
        next_seq += 1
        return True

    for s in seeds:
        admit(s, 0)
    if cfg.use_sitemap and sitemaps_table is not None:
        # S5: sitemap discovery — roots from robots Sitemap: lines, URLs
        # enter the frontier at depth 0 (crawler.py:362-380)
        from .sources.sitemap import (expand_sitemaps,
                                      sitemap_roots_from_robots)
        roots = sitemap_roots_from_robots(robots_table.to_pylist())
        for u in expand_sitemaps(sitemaps_table.to_pylist(), roots):
            if should_crawl(u, cfg, robots if cfg.respect_robots else None):
                admit(u, 0)

    fetched = 0
    wave = 0
    stopped = False
    while frontier and not stopped:
        frontier.sort(key=lambda e: (e[0], e[1]))
        fetchable = [e for e in frontier if e[0] <= cfg.max_depth]
        skipped_depth = [e for e in frontier if e[0] > cfg.max_depth]
        # politeness gating: first cap entries per host in (depth, seq) order
        gated, deferred = [], []
        if cfg.per_host_wave_cap > 0:
            per_host: dict[str, int] = defaultdict(int)
            caps: dict[str, int] = {}
            for e in fetchable:
                h = url_host(e[2])
                if h not in caps:
                    caps[h] = host_cap(h, cfg, robots)
                if per_host[h] < caps[h]:
                    per_host[h] += 1
                    gated.append(e)
                else:
                    deferred.append(e)
                    res.deferred_events.append((wave, e[2]))
        else:
            gated = fetchable
        # global budget
        remaining = cfg.max_urls - fetched
        if remaining <= 0:
            break
        if len(gated) > remaining:
            gated = gated[:remaining]
            stopped = True
        frontier = deferred if not stopped else []
        # over-depth entries are dropped permanently (never fetched) but
        # remain in the seen set — matching reference pop-skip semantics
        del skipped_depth

        discoveries: list[tuple[int, int, str, int]] = []  # parent_seq,pos,url,depth
        for depth, seq, url in gated:
            row = fetch_and_parse(url, depth, seq, wave, lookup,
                                  cfg.base_domain, retries=cfg.retries,
                                  retry_base_delay=cfg.retry_base_delay)
            fetched += 1
            res.crawl_order.append(
                {"url": url, "depth": depth, "seq": seq, "wave": wave})
            edges = row.pop("edges")
            res.pages.append(row)
            res.links.extend(edges)
            for e in edges:
                discoveries.append((seq, e["pos"], e["target_url"], depth + 1))

        # within-wave dedup by normalized URL, first (parent_seq, pos) wins —
        # the engine's groupby(sha1).first() semantics; a duplicate of a
        # trap-rejected URL therefore counts once per wave, not per sighting
        discoveries.sort(key=lambda d: (d[0], d[1]))
        wave_seen: set[str] = set()
        for parent_seq, pos, target, cdepth in discoveries:
            if not should_crawl(target, cfg,
                                robots if cfg.respect_robots else None):
                continue
            key = norm_url(target)
            if key in wave_seen:
                continue
            wave_seen.add(key)
            admit(target, cdepth)
        wave += 1

    res.seen = seen
    res.trap_counts = dict(trap_counts)
    return res
