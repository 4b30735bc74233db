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


def test_extract_edges_scope_and_scheme_filter():
    """ADVICE r1: edge is_internal is scope-based (root OR sub, matching
    reference link_manager collect_all_links); non-http(s) targets are
    skipped at discovery."""
    from librecrawl_ray.stages.parse import extract_edges
    spans = [
        {"kind": "link", "text": "root", "media_ref": "/a", "offset": 0},
        {"kind": "link", "text": "sub",
         "media_ref": "https://blog.site.example/p", "offset": 1},
        {"kind": "link", "text": "ext",
         "media_ref": "https://other.example/x", "offset": 2},
        {"kind": "link", "text": "mail", "media_ref": "mailto:a@b.c",
         "offset": 3},
        {"kind": "link", "text": "tel", "media_ref": "tel:+123", "offset": 4},
        {"kind": "link", "text": "js", "media_ref": "javascript:void(0)",
         "offset": 5},
    ]
    edges = extract_edges("https://site.example/", spans, "site.example")
    by_text = {e["anchor_text"]: e for e in edges}
    assert set(by_text) == {"root", "sub", "ext"}
    assert by_text["root"]["is_internal"] and by_text["root"]["scope"] == "root"
    assert by_text["sub"]["is_internal"] and by_text["sub"]["scope"] == "sub"
    assert not by_text["ext"]["is_internal"]
    assert by_text["ext"]["scope"] == "external"


def test_max_file_size_skips_oversized(ray_session, t1_fixture, tmp_path):
    """S2 size precheck: with a tiny limit every corpus doc is skipped —
    no pages rows, no candidates; with the default limit rows flow."""
    import pyarrow as pa
    from librecrawl_ray.corpus import write_corpus
    from librecrawl_ray.engine.fetch_actor import CorpusFetcher
    cdir = write_corpus("t1")
    import json
    meta = json.load(open(f"{cdir}/config.json"))
    frontier = pa.table({
        "url": pa.array(["https://site.example/"], pa.string()),
        "depth": pa.array([0], pa.int32()),
        "seq": pa.array([0], pa.int64()),
        "wave": pa.array([0], pa.int32()),
        "part": pa.array([0], pa.int32()),
    })
    f_small = CorpusFetcher(cdir, "site.example", meta["num_parts"],
                            max_file_size=1)
    out = f_small(frontier)
    assert out.num_rows == 0
    assert f_small.skipped_oversize == 1
    f_none = CorpusFetcher(cdir, "site.example", meta["num_parts"])
    out2 = f_none(frontier)
    assert out2.num_rows >= 1
