"""Per-host politeness scheduler (north rule; SURVEY.md §2.4 T2/T3).

Owns the robots cache and per-host crawl-delay token budgets and gates each
wave's frontier: a host gets ``base_cap`` fetch tokens per wave (a wave
models one fixed scheduling window), divided by its robots Crawl-delay;
over-budget entries defer to the next wave keeping their (depth, seq)
priority, so politeness changes only *when* a URL is fetched, never
whether/ordering-within — the property the conformance tests pin.

Deterministic by construction (token accounting over the (depth, seq)
sorted frontier), unlike wall-clock rate limiters. The reference's global
min-interval limiter (rate_limiter.py:24-38, effectively per-host because
crawls are single-site) maps to ``base_cap``; its 429/Retry-After backoff
is a corpus-level fault model handled in the fetch stage.

At cluster scale this state shards into P scheduler actors keyed by
``hash(host) % P`` (hot hosts salted into subqueues sharing one bucket —
SURVEY.md §7.3); at sandbox scale one driver-resident scheduler is exact
and cheap because gating touches only frontier-sized data.
"""

from __future__ import annotations

from ..policy import CrawlConfig, host_cap
from ..sources.robots import RobotsRules


class PolitenessScheduler:
    """Robots cache + per-host wave token buckets."""

    def __init__(self, cfg: CrawlConfig,
                 robots: dict[str, RobotsRules] | None):
        self.cfg = cfg
        self.robots = robots
        self._caps: dict[str, int] = {}          # robots-derived, cached
        self.deferred_total = 0

    def cap_for(self, host: str) -> int:
        cap = self._caps.get(host)
        if cap is None:
            cap = host_cap(host, self.cfg, self.robots)
            self._caps[host] = cap
        return cap

    def crawl_delay(self, host: str) -> float:
        if self.robots is None:
            return 0.0
        rules = self.robots.get(host)
        return rules.crawl_delay if rules else 0.0

    def gate_table(self, tbl):
        """Vectorized twin of ``gate`` over an Arrow frontier table already
        in (depth, seq) order: per-row host occurrence rank via stable
        argsort, grant where rank < cap(host). No per-row Python objects —
        the cap lookup touches only DISTINCT hosts (VERDICT r1 #3; at
        cluster scale this runs inside each frontier shard task against a
        broadcast per-host budget table, same math).

        Returns (granted_tbl, deferred_tbl|None).
        """
        import numpy as np
        if self.cfg.per_host_wave_cap <= 0 or tbl.num_rows == 0:
            return tbl, None
        h = np.asarray(tbl.column("host").to_pylist(), dtype=object)
        uniq, inv = np.unique(h, return_inverse=True)
        caps = np.fromiter((self.cap_for(u) for u in uniq),
                           dtype=np.int64, count=len(uniq))
        order = np.argsort(inv, kind="stable")
        sorted_inv = inv[order]
        boundaries = np.flatnonzero(np.diff(sorted_inv)) + 1
        starts = np.concatenate(([0], boundaries))
        group_sizes = np.diff(np.concatenate((starts, [len(inv)])))
        ranks_sorted = np.arange(len(inv)) - np.repeat(starts, group_sizes)
        occ = np.empty(len(inv), dtype=np.int64)
        occ[order] = ranks_sorted
        mask = occ < caps[inv]
        n_def = int(len(mask) - mask.sum())
        self.deferred_total += n_def
        import pyarrow as pa
        granted = tbl.filter(pa.array(mask))
        deferred = tbl.filter(pa.array(~mask)) if n_def else None
        return granted, deferred

    def gate(self, rows: list[dict]) -> tuple[list[dict], list[dict]]:
        """Split a (depth, seq)-ordered frontier into (granted, deferred)
        under this wave's per-host budgets."""
        if self.cfg.per_host_wave_cap <= 0:
            return rows, []
        used: dict[str, int] = {}
        granted, deferred = [], []
        for r in rows:
            h = r["host"]
            if used.get(h, 0) < self.cap_for(h):
                used[h] = used.get(h, 0) + 1
                granted.append(r)
            else:
                deferred.append(r)
        self.deferred_total += len(deferred)
        return granted, deferred
