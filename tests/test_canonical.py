"""URL canonicalization: fast paths must equal the reference slow paths."""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

from librecrawl_ray.canonical import (classify_scope, clean_url, is_internal,
                                      norm_url, url_extension, url_signature)

TRICKY = [
    "https://site.example/",
    "https://site.example",
    "https://site.example//",
    "https://Site.Example/Page/A",
    "https://site.example/page/a/",
    "https://site.example/page/a//",
    "https://site.example/a/?q=1",
    "https://site.example/a?q=1#frag",
    "https://site.example/a#frag",
    "http://site.example/mixed",
    "https://sub0.site.example/s/a",
    "https://site.example/under_scored/x",
    "https://site.example/deep/" + "x" * 110,
]


def slow_norm(url: str) -> str:
    parts = urlsplit(url.strip().lower())
    path = parts.path
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")
    if path == "":
        path = "/"
    return urlunsplit((parts.scheme, parts.netloc, path, parts.query, ""))


def slow_clean(href: str, base: str = "") -> str:
    absu = urljoin(base, href.strip()) if base else href.strip()
    p = urlsplit(absu)
    return urlunsplit((p.scheme, p.netloc, p.path, p.query, ""))


def test_norm_fast_equals_slow():
    for u in TRICKY:
        assert norm_url(u) == slow_norm(u), u


def test_clean_fast_equals_slow():
    base = "https://site.example/section/page"
    hrefs = ["/x", "/x/y?q=1", "//cdn.example/i.png", "rel/path",
             "../up", "https://other.example/abs#frag", "?q=2",
             "https://other.example/abs", "#only-frag", "/x#f"]
    for h in hrefs:
        assert clean_url(h, base) == slow_clean(h, base), h


def test_signature_and_scope():
    assert url_signature("https://site.example/calendar/123") == \
        "site.example/calendar/\\d+"
    assert url_signature(
        "https://www.site.example/a/0f0f0f0f-1111-2222-3333-444444444444/x"
    ) == "site.example/a/\\uuid/x"
    assert classify_scope("https://sub0.site.example/x",
                          "site.example") == "sub"
    assert classify_scope("https://www.site.example/x",
                          "site.example") == "root"
    assert classify_scope("https://other.example/x",
                          "site.example") == "external"
    assert is_internal("https://www.site.example/x", "site.example")
    assert url_extension("https://x.example/a/logo.PNG") == ".png"
    assert url_extension("https://x.example/a/page") == ""
