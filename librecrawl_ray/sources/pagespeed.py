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
