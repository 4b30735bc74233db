"""Crawl policy: the admission predicate and fetch/redirect semantics.

These are the *spec* functions shared by the sequential oracle simulator
(oracle.py) and the distributed wave engine (engine/crawl.py) — what the
tests verify is the distributed machinery around them (wave ordering, seq
assignment, sharded dedup, trap counting, politeness deferral, resume), not
these pure functions, which are separately unit-tested against hand-written
expectations.

Reference semantics:
- ``should_crawl``   — crawler.py:1425-1492 (M4): scheme, domain policy
  (internal / subdomain / external), extension include/exclude lists, regex
  include/exclude patterns, robots rules.
- ``resolve_fetch``  — crawler.py:1033-1052 + requests redirect following
  (M20): chain building, loop detection, final status/url.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .canonical import (classify_scope, norm_url, url_extension, url_host)
from .sources.robots import RobotsRules

REDIRECT_STATUSES = {301, 302, 303, 307, 308}
MAX_REDIRECT_HOPS = 10


@dataclass
class CrawlConfig:
    base_domain: str
    max_depth: int = 3
    max_urls: int = 1_000_000
    crawl_external: bool = False
    crawl_subdomains: bool = True
    respect_robots: bool = True
    trap_threshold: int = 100
    exclude_extensions: tuple = ()
    include_patterns: tuple = ()
    exclude_patterns: tuple = ()
    per_host_wave_cap: int = 0          # 0 = politeness off
    num_shards: int = 8
    duplication_threshold: float = 0.85
    max_file_size: int = 50 * 1024 * 1024
    use_sitemap: bool = False
    retries: int = 3                    # S1: attempts = retries + 1
    retry_base_delay: float = 1.0       # backoff base (reference 'delay')
    _inc_re: list = field(default_factory=list, repr=False)
    _exc_re: list = field(default_factory=list, repr=False)

    def __post_init__(self):
        self._inc_re = [re.compile(p) for p in self.include_patterns]
        self._exc_re = [re.compile(p) for p in self.exclude_patterns]

    @classmethod
    def from_fixture(cls, cfg: dict, base_domain: str) -> "CrawlConfig":
        return cls(
            base_domain=base_domain,
            max_depth=cfg.get("max_depth", 3),
            max_urls=cfg.get("max_urls", 1_000_000),
            crawl_external=cfg.get("crawl_external", False),
            crawl_subdomains=cfg.get("crawl_subdomains", True),
            respect_robots=cfg.get("respect_robots", True),
            trap_threshold=cfg.get("trap_threshold", 100),
            exclude_extensions=tuple(cfg.get("exclude_extensions", ())),
            include_patterns=tuple(cfg.get("include_patterns", ())),
            exclude_patterns=tuple(cfg.get("exclude_patterns", ())),
            per_host_wave_cap=cfg.get("per_host_wave_cap", 0),
            num_shards=cfg.get("num_shards", 8),
            duplication_threshold=cfg.get("duplication_threshold", 0.85),
            max_file_size=cfg.get("max_file_size", 50 * 1024 * 1024),
            use_sitemap=cfg.get("use_sitemap", False),
            retries=cfg.get("retries", 3),
            retry_base_delay=cfg.get("retry_base_delay", 1.0),
        )


def host_cap(host: str, cfg: CrawlConfig,
             robots: dict[str, RobotsRules] | None) -> int:
    """Per-host fetches allowed per wave (politeness budget, T2/T3).

    0 = unlimited (politeness off). A robots Crawl-delay divides the base
    cap (a wave models a fixed scheduling window; delay d ⇒ 1/d of the
    base token rate), floored at 1 so progress is always possible."""
    base = cfg.per_host_wave_cap
    if base <= 0:
        return 0
    delay = 0.0
    if robots is not None:
        rules = robots.get(host)
        if rules is not None:
            delay = rules.crawl_delay
    if delay and delay > 1:
        return max(1, int(base / delay))
    return base


def should_crawl(url: str, cfg: CrawlConfig,
                 robots: dict[str, RobotsRules] | None) -> bool:
    """Admission predicate for a cleaned candidate URL (M4)."""
    if not (url.startswith("http://") or url.startswith("https://")):
        return False
    scope = classify_scope(url, cfg.base_domain)
    if scope == "external" and not cfg.crawl_external:
        return False
    if scope == "sub" and not cfg.crawl_subdomains:
        return False
    ext = url_extension(url)
    if ext and ext in cfg.exclude_extensions:
        return False
    if cfg._inc_re and not any(r.search(url) for r in cfg._inc_re):
        return False
    if any(r.search(url) for r in cfg._exc_re):
        return False
    if cfg.respect_robots and robots is not None:
        rules = robots.get(url_host(url))
        if rules is not None and not rules.is_allowed(url):
            return False
    return True


def resolve_retry(n429: int, retry_after: str, retries: int,
                  base_delay: float) -> tuple[bool, int, float]:
    """S1 retry/backoff spec (reference crawler.py:941-976).

    A corpus document that serves ``n429`` consecutive 429 responses
    before its real one, with an optional ``retry_after`` header value.
    Returns ``(gave_up, retry_count, wait_seconds)``:

    - each 429 seen with attempts remaining waits ``int(Retry-After)``
      when the header parses, else ``base_delay * 2^attempt``
      (1s, 2s, 4s, ...), every wait capped at 30 s, then retries;
    - after ``retries`` retries (attempts = retries + 1) the 429 response
      itself is recorded (``gave_up`` — the reference breaks out of the
      loop and stores the 429 row so it surfaces as an issue).

    The corpus engine doesn't sleep: the accumulated wait is added to the
    page's ``response_time`` (the reference measures elapsed wall time,
    sleeps included) and counted in the wave metrics.
    """
    n429 = int(n429 or 0)
    if n429 <= 0:
        return False, 0, 0.0
    served = min(n429, retries)
    total = 0.0
    for attempt in range(served):
        wait = None
        if retry_after:
            try:
                wait = float(int(retry_after))
            except ValueError:
                wait = None                 # malformed header → backoff
        if wait is None:
            wait = base_delay * (2 ** attempt)
        total += min(wait, 30.0)
    return n429 > retries, served, total


@dataclass
class FetchOutcome:
    url: str
    final_url: str
    status_code: int
    redirect_chain: list          # [{url, status_code, hop}]
    redirects: list               # plain URL strings after the first hop
    redirect_count: int
    has_redirect_loop: bool
    doc: dict | None              # final corpus row (None when unreachable)


def resolve_fetch(url: str, lookup, doc0: dict | None = None,
                  have_doc0: bool = False) -> FetchOutcome:
    """Follow the corpus's redirect chain for ``url``.

    ``lookup(url) -> dict | None`` resolves a URL to its corpus row by
    normalized equality; ``doc0`` (with have_doc0=True) short-circuits the
    first lookup when the caller already batch-fetched the row. Semantics:
    3xx rows with ``redirect_to`` are hops; a revisited normalized URL is a
    loop (status 0, like the reference's requests.TooManyRedirects →
    connection-failed row); a missing row is status 0; otherwise the final
    row's status/content win."""
    hops: list[dict] = []
    seen_norms = {norm_url(url)}
    cur = url
    doc = doc0 if have_doc0 else lookup(cur)
    loop = False
    while (doc is not None and doc["status_code"] in REDIRECT_STATUSES
           and doc.get("redirect_to")):
        hops.append({"url": cur, "status_code": int(doc["status_code"]),
                     "hop": len(hops)})
        nxt = doc["redirect_to"]
        if norm_url(nxt) in seen_norms or len(hops) >= MAX_REDIRECT_HOPS:
            loop = True
            cur = nxt
            doc = None
            break
        seen_norms.add(norm_url(nxt))
        cur = nxt
        doc = lookup(cur)

    if loop:
        return FetchOutcome(url=url, final_url="", status_code=0,
                            redirect_chain=hops, redirects=[],
                            redirect_count=len(hops),
                            has_redirect_loop=True, doc=None)
    if doc is None:
        return FetchOutcome(url=url, final_url=cur if hops else "",
                            status_code=0, redirect_chain=hops, redirects=[],
                            redirect_count=len(hops),
                            has_redirect_loop=False, doc=None)
    chain = list(hops)
    chain.append({"url": cur, "status_code": int(doc["status_code"]),
                  "hop": len(hops)})
    redirects = [h["url"] for h in hops[1:]] + ([cur] if hops else [])
    return FetchOutcome(url=url, final_url=cur if hops else url,
                        status_code=int(doc["status_code"]),
                        redirect_chain=chain, redirects=redirects,
                        redirect_count=len(hops), has_redirect_loop=False,
                        doc=doc)
