"""Fetch semantics shared by the oracle and the distributed engine.

``fetch_and_parse`` is the spec for one URL: resolve the corpus redirect
chain (policy.resolve_fetch), parse the final document's spans (parse stage)
and assemble the full pages row (reference row template crawler.py:982-1031)
plus its edge rows.
"""

from __future__ import annotations

import pyarrow as pa

from ..canonical import strip_www, url_host
from ..policy import FetchOutcome, resolve_fetch
from ..schema import PAGES_SCHEMA
from .issues import soft404_hit
from .parse import EDGES_SCHEMA, extract_edges, parse_doc

# nested edges column carried on fetched rows until the links explode stage
EDGE_ITEM = pa.struct([(f.name, f.type) for f in EDGES_SCHEMA])
FETCHED_SCHEMA = pa.schema(list(PAGES_SCHEMA) + [
    pa.field("edges", pa.list_(EDGE_ITEM)),
])


def requires_js(doc: dict | None) -> bool:
    """S4 JS-diff rule (reference crawler.py:1175-1186): hashes differ AND
    (raw empty OR rendered more than 10% larger)."""
    if not doc:
        return False
    rh = doc.get("rendered_content_hash")
    if not rh or rh == doc.get("raw_content_hash"):
        return False
    raw_s = doc.get("size") or 0
    if raw_s == 0:
        return True
    return (doc.get("rendered_size") or 0) / raw_s > 1.1


def fetch_and_parse(url: str, depth: int, seq: int, wave: int,
                    lookup, base_domain: str, doc0: dict | None = None,
                    have_doc0: bool = False, retries: int = 3,
                    retry_base_delay: float = 1.0) -> dict:
    """Fetch one frontier URL against the corpus → full pages row dict with
    nested ``edges``. ``lookup(url) -> row dict | None`` by normalized URL;
    ``doc0``/``have_doc0`` short-circuit the first lookup (batched fetch).

    S1 fault model: a ``fault_429`` on the ENTRY row is retried per
    resolve_retry (the reference's retry loop wraps one requests.get with
    allow_redirects — rate limiting happens before any redirect is seen);
    exhausted retries record the 429 response itself."""
    entry = doc0 if have_doc0 else lookup(url)
    extra_ms = 0.0
    if entry is not None and entry.get("fault_429"):
        from ..policy import resolve_retry
        gave_up, _rc, wait_s = resolve_retry(
            entry["fault_429"], entry.get("retry_after") or "",
            retries, retry_base_delay)
        extra_ms = wait_s * 1000.0
        if gave_up:
            return rate_limited_row(
                url, depth, seq, wave, base_domain,
                float(entry.get("response_time_ms") or 0.0) + extra_ms)
    out: FetchOutcome = resolve_fetch(url, lookup, entry, True)
    doc = out.doc
    spans = (doc.get("spans") or []) if doc else []
    parsed = parse_doc(url, spans, base_domain)
    edges = extract_edges(url, spans, base_domain)
    return {
        "url": url,
        "final_url": out.final_url,
        "status_code": out.status_code,
        "content_type": (doc.get("content_type") if doc else "") or "",
        "size": int(doc.get("size") or 0) if doc else 0,
        "response_time": (float(doc.get("response_time_ms") or 0.0)
                          if doc else 0.0) + extra_ms,
        "is_internal": strip_www(url_host(url)) == strip_www(base_domain.lower()),
        "depth": depth, "seq": seq, "wave": wave,
        "redirect_chain": out.redirect_chain,
        "redirects": out.redirects,
        "redirect_count": out.redirect_count,
        "has_redirect_loop": out.has_redirect_loop,
        # issue-flag write-backs (reference issue_detector.py:451,:493)
        "requires_js": requires_js(doc),
        "is_soft_404": out.status_code == 200 and (
            soft404_hit(parsed["title"]) or soft404_hit(parsed["h1"])),
        "has_long_redirect_chain": out.redirect_count > 3,
        "response_headers": (list(doc.get("headers") or []) if doc else []),
        "x_robots_tag": (doc.get("x_robots_tag") if doc else "") or "",
        "spans": spans,
        "edges": edges,
        **parsed,
    }


def rate_limited_row(url: str, depth: int, seq: int, wave: int,
                     base_domain: str, response_time: float) -> dict:
    """Pages row for a fetch that exhausted its 429 retries (S1 fault
    model, reference crawler.py:950-953): the final 429 response itself is
    recorded — empty content, no outlinks, so the issue detector surfaces
    it as a 4xx page. ``response_time`` already includes the backoff waits
    (the reference measures elapsed wall time, sleeps included)."""
    parsed = parse_doc(url, [], base_domain)
    return {
        "url": url, "final_url": url, "status_code": 429,
        "content_type": "text/html", "size": 0,
        "response_time": float(response_time),
        "is_internal": strip_www(url_host(url))
        == strip_www(base_domain.lower()),
        "depth": depth, "seq": seq, "wave": wave,
        "redirect_chain": [{"url": url, "status_code": 429, "hop": 0}],
        "redirects": [], "redirect_count": 0, "has_redirect_loop": False,
        "requires_js": False, "is_soft_404": False,
        "has_long_redirect_chain": False,
        "response_headers": [], "x_robots_tag": "",
        "spans": [], "edges": [],
        **parsed,
    }
