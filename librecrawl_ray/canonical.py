"""URL canonicalization, hashing, signatures and scope classification.

Pure functions (no Ray). Semantics follow the reference crawler
(/root/reference):

- ``clean_url``        — link_manager.py:62-68 (urljoin, strip fragment,
                         rebuild scheme://netloc/path?query)
- ``norm_url``         — issue_detector.py:61-86 (lowercase, strip trailing
                         slash except root, drop fragment, keep query); this
                         is THE comparison/join key for all link-graph passes
- ``url_sha1``         — north-rule hash for the sharded seen filters
- ``url_signature``    — link_manager.py:27-41 (digit runs → ``\\d+``,
                         UUIDs → ``\\uuid``) for crawl-trap detection
- ``is_internal``      — link_manager.py:234-239 (www-stripped equality)
- ``classify_scope``   — link_manager.py:297-314 (root / sub / external)

Vectorized batch variants operate on python lists and return lists; the hot
path wraps them in map_batches over Arrow columns (string ops like urlsplit
have no pyarrow kernel, but these run at ~1M urls/s/core which is fetch-bound
territory anyway).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin, urlsplit, urlunsplit

_UUID_RE = re.compile(
    r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
)
_DIGITS_RE = re.compile(r"\d+")


from functools import lru_cache


@lru_cache(maxsize=4096)
def _base_parts(base: str) -> tuple[str, str]:
    p = urlsplit(base)
    return p.scheme, p.netloc


def clean_url(href: str, base: str = "") -> str:
    """Absolutize ``href`` against ``base``, drop fragment, keep query.

    Fast paths for the dominant href forms (absolute, protocol-relative,
    root-relative) — urljoin/urlsplit are the crawl's hottest calls; the
    general form falls back to the reference-equivalent slow path."""
    h = href.strip()
    if "#" in h:
        h = h.split("#", 1)[0]
    if h.startswith("https://") or h.startswith("http://"):
        return h
    if base and "/." not in h:    # dot segments need urljoin normalization
        if h.startswith("//") and len(h) > 2 and h[2] != "/":
            return _base_parts(base)[0] + ":" + h
        if h.startswith("/") and not h.startswith("//"):
            scheme, netloc = _base_parts(base)
            return f"{scheme}://{netloc}{h}"
    absu = urljoin(base, h) if base else h
    parts = urlsplit(absu)
    return urlunsplit((parts.scheme, parts.netloc, parts.path, parts.query, ""))


def norm_url(url: str) -> str:
    """Comparison-normalized URL: lowercase, no fragment, no trailing slash
    (except a bare root path). Join key for link-graph passes.

    Fast path for fragment/query-free absolute URLs; slow path is the
    reference semantics (issue_detector.py:61-86)."""
    u = url.strip().lower()
    if ("#" not in u and "?" not in u and not u.endswith("//")
            and (u.startswith("https://") or u.startswith("http://"))):
        sep = u.index("://") + 3
        if "/" not in u[sep:]:
            return u + "/"
        if u.endswith("/") and u.index("/", sep) != len(u) - 1:
            return u.rstrip("/")
        return u
    parts = urlsplit(u)
    path = parts.path
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")
    if path == "":
        path = "/"
    return urlunsplit((parts.scheme, parts.netloc, path, parts.query, ""))


def url_sha1(url: str) -> str:
    """SHA-1 hex of the comparison-normalized URL (seen-filter key)."""
    return hashlib.sha1(norm_url(url).encode("utf-8")).hexdigest()


def url_host(url: str) -> str:
    # fast path for absolute http(s): netloc runs from after '//' to the
    # next '/', '?' or '#' — identical to urlsplit().netloc for these
    # shapes, ~10× cheaper (hottest call of the edge-extraction path)
    if url.startswith("https://"):
        s = 8
    elif url.startswith("http://"):
        s = 7
    else:
        return urlsplit(url).netloc.lower()
    end = len(url)
    for ch in ("/", "?", "#"):
        j = url.find(ch, s)
        if j != -1 and j < end:
            end = j
    return url[s:end].lower()


def strip_www(host: str) -> str:
    return host[4:] if host.startswith("www.") else host


def _host_path(url: str) -> tuple[str, str]:
    """(netloc.lower(), path) — fast manual split for absolute http(s)
    URLs (identical to urlsplit for these shapes, ~5× cheaper; urlsplit
    is the hottest call of the candidate-canonicalization path). Falls
    back to urlsplit for anything else."""
    if url.startswith("https://"):
        s = 8
    elif url.startswith("http://"):
        s = 7
    else:
        p = urlsplit(url)
        return p.netloc.lower(), p.path
    end = len(url)
    q = url.find("?", s)
    if q != -1:
        end = q
    f = url.find("#", s)
    if f != -1 and f < end:
        end = f
    sl = url.find("/", s)
    if sl == -1 or sl >= end:
        return url[s:end].lower(), ""
    return url[s:sl].lower(), url[sl:end]


def url_signature(url: str) -> str:
    """Trap signature: host + path with digit runs and UUIDs collapsed."""
    host, path = _host_path(url)
    path = _UUID_RE.sub(r"\\uuid", path)
    path = _DIGITS_RE.sub(r"\\d+", path)
    return f"{strip_www(host)}{path}"


def is_internal(url: str, base_domain: str) -> bool:
    """www-stripped exact host equality with the crawl's base domain."""
    return strip_www(url_host(url)) == strip_www(base_domain.lower())


def classify_scope(url: str, base_domain: str) -> str:
    """'root' (same domain), 'sub' (subdomain of base), or 'external'."""
    host = strip_www(url_host(url))
    base = strip_www(base_domain.lower())
    if host == base:
        return "root"
    if host.endswith("." + base):
        return "sub"
    return "external"


def url_extension(url: str) -> str:
    """Lowercased file extension of the path ('' if none)."""
    path = _host_path(url)[1]
    last = path.rsplit("/", 1)[-1]
    if "." in last:
        return "." + last.rsplit(".", 1)[-1].lower()
    return ""


def shard_of(sha1_hex: str, num_shards: int) -> int:
    """Seen-filter shard for a url sha1 (north rule: sha1 % K)."""
    return int(sha1_hex[:8], 16) % num_shards


def shard_of_u64(sha64: int, num_shards: int) -> int:
    """Same shard function from the 64-bit key (top 32 bits == hex[:8])."""
    return (int(sha64) >> 32) % num_shards


# ---------------------------------------------------------------- batch forms

def clean_urls(hrefs: list[str], bases: list[str]) -> list[str]:
    return [clean_url(h, b) for h, b in zip(hrefs, bases)]


def norm_urls(urls: list[str]) -> list[str]:
    return [norm_url(u) for u in urls]


def url_sha1s(urls: list[str]) -> list[str]:
    return [url_sha1(u) for u in urls]
