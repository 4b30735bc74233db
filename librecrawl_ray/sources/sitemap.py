"""Sitemap discovery and expansion (S5, sitemap_parser.py:15-148).

The corpus stores sitemaps as structured rows (url, content_kind ∈
{'index','urlset'}, entries) — the already-parsed equivalent of the
reference's XML handling. Expansion recurses index → urlset up to depth 10
(reference cap), deduplicating page URLs first-wins in document order.
"""

from __future__ import annotations

MAX_SITEMAP_DEPTH = 10


def expand_sitemaps(sitemap_rows: list[dict], roots: list[str]) -> list[str]:
    """Expand sitemap roots to the flat, deduped page-URL list."""
    by_url = {r["url"]: r for r in sitemap_rows}
    seen_maps: set[str] = set()
    pages: list[str] = []
    seen_pages: set[str] = set()

    def walk(url: str, depth: int) -> None:
        if depth > MAX_SITEMAP_DEPTH or url in seen_maps:
            return
        seen_maps.add(url)
        row = by_url.get(url)
        if row is None:
            return
        if row["content_kind"] == "index":
            for child in row["entries"] or []:
                walk(child, depth + 1)
        else:
            for p in row["entries"] or []:
                if p not in seen_pages:
                    seen_pages.add(p)
                    pages.append(p)

    for r in roots:
        walk(r, 0)
    return pages


def sitemap_roots_from_robots(robots_rows: list[dict]) -> list[str]:
    """Collect Sitemap: lines across hosts (discovery path S5/S6)."""
    out: list[str] = []
    from .robots import parse_robots
    for r in robots_rows:
        out.extend(parse_robots(r["content"]).sitemaps)
    return out
