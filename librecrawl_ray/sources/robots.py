"""robots.txt parsing, matching and validation.

Mirrors the reference's robots handling (crawler.py:1494-1606): a per-host
rule cache with prefix Disallow matching for the ``*`` user-agent, a
Crawl-delay extraction feeding the politeness budget, Sitemap: discovery
lines, and the syntax validator (M5, crawler.py:1562-1606)."""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import urlsplit

_KNOWN_DIRECTIVES = {
    "user-agent", "disallow", "allow", "crawl-delay", "sitemap", "host",
    "clean-param", "request-rate", "visit-time", "noindex",
}


@dataclass
class RobotsRules:
    disallow: list[str] = field(default_factory=list)
    allow: list[str] = field(default_factory=list)
    crawl_delay: float = 0.0
    sitemaps: list[str] = field(default_factory=list)

    def is_allowed(self, url: str) -> bool:
        path = urlsplit(url).path or "/"
        # longest-match wins between allow and disallow (Google semantics,
        # degenerates to simple prefix Disallow for the fixture corpus)
        best_len, allowed = -1, True
        for p in self.disallow:
            if p and path.startswith(p) and len(p) > best_len:
                best_len, allowed = len(p), False
        for p in self.allow:
            if p and path.startswith(p) and len(p) >= best_len:
                best_len, allowed = len(p), True
        return allowed


def parse_robots(content: str) -> RobotsRules:
    """Parse rules applying to User-agent: * (the engine's UA group)."""
    rules = RobotsRules()
    in_star_group = False
    seen_any_group = False
    for raw in (content or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "sitemap":
            rules.sitemaps.append(val)
        elif key == "user-agent":
            in_star_group = val == "*"
            seen_any_group = True
        elif in_star_group or not seen_any_group:
            if key == "disallow":
                if val:
                    rules.disallow.append(val)
            elif key == "allow":
                if val:
                    rules.allow.append(val)
            elif key == "crawl-delay":
                try:
                    rules.crawl_delay = float(val)
                except ValueError:
                    pass
    return rules


def validate_robots(content: str) -> list[dict]:
    """Syntax checks per the reference validator (crawler.py:1562-1606):
    unknown directives, missing colon on directive-looking lines, empty
    user-agent values. Returns issue dicts (line, problem)."""
    problems = []
    for n, raw in enumerate((content or "").splitlines(), start=1):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            first = line.split()[0].lower() if line.split() else ""
            problems.append({"line": n, "problem": "missing_colon",
                             "text": raw.strip(), "directive": first})
            continue
        key, _, val = line.partition(":")
        key_l = key.strip().lower()
        if key_l not in _KNOWN_DIRECTIVES:
            problems.append({"line": n, "problem": "unknown_directive",
                             "text": raw.strip(), "directive": key_l})
        elif key_l == "user-agent" and not val.strip():
            problems.append({"line": n, "problem": "empty_user_agent",
                             "text": raw.strip(), "directive": key_l})
    return problems


def robots_map(robots_rows: list[dict]) -> dict[str, RobotsRules]:
    """host → parsed rules, from the robots side table."""
    return {r["host"]: parse_robots(r["content"]) for r in robots_rows}
