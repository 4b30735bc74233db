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

from ..canonical import norm_url, url_host
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
# AI-ready schema catalog (issue_detector.py:682-701): type → display name
# and the rich-result surface it unlocks.
_AI_READY_SCHEMAS = {
    "FAQPage": ("FAQ", "FAQ Accordion"),
    "HowTo": ("How-To", "Step-by-step Guide"),
    "Recipe": ("Recipe", "Recipe Card"),
    "Product": ("Product", "Product Snippet"),
    "Review": ("Review", "Review Stars"),
    "AggregateRating": ("Rating", "Star Rating"),
    "LocalBusiness": ("Local Business", "Knowledge Panel"),
    "Organization": ("Organization", "Knowledge Panel"),
    "Person": ("Person", "Knowledge Panel"),
    "Article": ("Article", "Article Preview"),
    "NewsArticle": ("News Article", "News Carousel"),
    "BlogPosting": ("Blog Post", "Article Preview"),
    "Event": ("Event", "Event Listing"),
    "JobPosting": ("Job Posting", "Job Listing"),
    "Course": ("Course", "Course Card"),
    "SoftwareApplication": ("Software App", "App Info"),
    "VideoObject": ("Video", "Video Preview"),
    "BreadcrumbList": ("Breadcrumbs", "Breadcrumb Trail"),
}
_ORG_SCHEMAS = ("Organization", "LocalBusiness", "Corporation")
# generic anchor texts (issue_detector.py:1102)
GENERIC_ANCHORS = ("click here", "read more", "more", "here", "link",
                   "this", "go")


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


def soft404_hit(text: str) -> bool:
    """True if a title/H1 matches the soft-404 phrase battery (I6; shared
    with the pages-row ``is_soft_404`` write-back)."""
    tl = (text or "").lower()
    return any(p in tl for p in _SOFT404_PATTERNS)


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


def _count_faq_questions(obj, depth=0) -> int:
    """Questions under FAQPage mainEntity: @type == 'Question' with a
    non-empty name (issue_detector.py:739-748), recursive like the
    reference's extract_type walk."""
    if depth > 10:
        return 0
    n = 0
    if isinstance(obj, dict):
        t = obj.get("@type")
        if t == "FAQPage" or (isinstance(t, list) and "FAQPage" in t):
            main = obj.get("mainEntity", [])
            if isinstance(main, list):
                n += sum(1 for it in main
                         if isinstance(it, dict)
                         and it.get("@type") == "Question" and it.get("name"))
        for v in obj.values():
            if isinstance(v, (dict, list)):
                n += _count_faq_questions(v, depth + 1)
    elif isinstance(obj, list):
        for v in obj:
            n += _count_faq_questions(v, depth + 1)
    return n


def analyze_structured_data(json_ld_blobs, microdata_blobs=None) -> dict:
    """I12 schema analysis (issue_detector.py:675-847): detected @types in
    first-appearance order (deterministic, unlike the reference's
    list(set)), FAQ Question count, Organization/WebSite/Breadcrumb
    presence, AI-ready catalog hits, Article completeness. Microdata blobs
    (M19, JSON-encoded {type, properties}) contribute their type tail —
    reference splits the schema.org URL on '/' (:779-786)."""
    types: list[str] = []
    seen: set[str] = set()
    faq_questions = 0
    article_complete = False
    for blob in json_ld_blobs or []:
        try:
            obj = json.loads(blob)
        except (ValueError, TypeError):
            continue
        for t in _extract_schema_types(obj):
            if t not in seen:
                seen.add(t)
                types.append(t)
        faq_questions += _count_faq_questions(obj)
        # top-level Article completeness — the reference checks only the
        # top-level json_ld objects (:836-841); passes if ANY is complete
        if isinstance(obj, dict) and obj.get("@type") in (
                "Article", "NewsArticle", "BlogPosting") \
                and obj.get("headline") and obj.get("datePublished"):
            article_complete = True
    for blob in microdata_blobs or []:
        try:
            obj = json.loads(blob)
        except (ValueError, TypeError):
            continue
        t = obj.get("type", "") if isinstance(obj, dict) else ""
        if t:
            t = t.split("/")[-1]
            if t not in seen:
                seen.add(t)
                types.append(t)
    return {
        "types": types,
        "faq_questions": faq_questions,
        "has_organization": any(t in _ORG_SCHEMAS for t in types),
        "has_website": "WebSite" in types,
        "has_breadcrumbs": "BreadcrumbList" in types,
        "article_present": any(t in ("Article", "NewsArticle", "BlogPosting")
                               for t in types),
        "article_complete": article_complete,
        "ai_ready": [{"name": _AI_READY_SCHEMAS[t][0],
                      "rich_result": _AI_READY_SCHEMAS[t][1]}
                     for t in types if t in _AI_READY_SCHEMAS],
    }


def page_issues(row: dict, base_domain: str | None = None) -> list[dict]:
    """All per-page issue rows for one pages-table row. ``base_domain``
    scopes the I16 link-hygiene internal/external split; defaults to the
    page's own host (standalone parsing)."""
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
    err_t = soft404_hit(title)
    err_h = soft404_hit(h1)
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

    # I12 — structured data (issue_detector.py:675-847)
    json_ld = row.get("json_ld") or []
    schema_org = row.get("schema_org") or []
    sd = analyze_structured_data(json_ld, schema_org)
    if not json_ld and not schema_org:
        issues.append(_iss(url, "warning", "Structured Data",
                           "No Structured Data",
                           "Page has no JSON-LD or Schema.org markup"))
    else:
        if (ptype == "important" and not sd["has_organization"]
                and not sd["has_website"]
                and not any(t in ("Article", "BlogPosting", "Product")
                            for t in sd["types"])):
            issues.append(_iss(url, "info", "Structured Data",
                               "Schema: Missing Organization/WebSite",
                               "Consider adding Organization or WebSite "
                               "schema for brand visibility"))
        if "FAQPage" in sd["types"]:
            if sd["faq_questions"] == 0:
                issues.append(_iss(url, "warning", "Structured Data",
                                   "Schema: FAQPage has no questions",
                                   "FAQPage schema found but no Question "
                                   "items detected"))
            elif sd["faq_questions"] < 3:
                issues.append(_iss(url, "info", "Structured Data",
                                   "Schema: FAQPage has few questions",
                                   f"Only {sd['faq_questions']} FAQ items "
                                   "found (3+ recommended)"))
        if sd["article_present"] and not sd["article_complete"]:
            issues.append(_iss(url, "warning", "Structured Data",
                               "Schema: Article missing required fields",
                               "Article schema should have headline and "
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

    # I16 — per-page link hygiene (issue_detector.py:1081-1184), computed
    # over the page's deduped edge rows (the links-table contract; the
    # site-wide unsafe-cross-origin half lives in pipelines/reports.py)
    spans = row.get("spans")
    if spans is not None:
        from .parse import extract_edges
        edges = extract_edges(url, spans or [],
                              base_domain or url_host(url))
        n_external = sum(1 for e in edges if e["scope"] == "external")
        if n_external > 50:
            issues.append(_iss(url, "info", "Links",
                               "Links: Pages With High External Outlinks",
                               f"Page has {n_external} external links"))
        nofollow_int = sum(1 for e in edges
                           if e["is_internal"] and e["nofollow"])
        if nofollow_int:
            issues.append(_iss(url, "info", "Links",
                               "Links: Internal Nofollow Outlinks",
                               f"{nofollow_int} internal links are marked "
                               "nofollow"))
        # the reference counts empty anchors over ALL links despite the
        # issue name (issue_detector.py:1115-1117)
        empty_anchor = sum(1 for e in edges if not e["anchor_text"].strip())
        if empty_anchor:
            issues.append(_iss(url, "warning", "Links",
                               "Links: Internal Outlinks With No Anchor "
                               "Text",
                               f"{empty_anchor} links have no anchor text"))
        generic = sum(1 for e in edges if e["is_internal"]
                      and e["anchor_text"].lower().strip()
                      in GENERIC_ANCHORS)
        if generic:
            issues.append(_iss(url, "warning", "Links",
                               "Links: Non-Descriptive Anchor Text",
                               f"{generic} links use generic text like "
                               '"click here"'))

    # I17 (per-page halves) — mixed content / protocol-relative resources
    # on https pages (issue_detector.py:1251-1297)
    if url.startswith("https://"):
        mixed = [im["src"] for im in images
                 if (im.get("src") or "").startswith("http://")]
        if mixed:
            issues.append(_iss(url, "error", "Security",
                               "Security: Mixed Content",
                               f"{len(mixed)} http:// assets on https page: "
                               f"{', '.join(mixed[:5])}"))
        if spans is not None:
            proto_rel = sum(
                1 for s in spans or []
                if (s["kind"] == "image" or s["kind"].startswith("link"))
                and (s["media_ref"] or "").startswith("//"))
            if proto_rel:
                issues.append(_iss(
                    url, "warning", "Security",
                    "Security: Protocol-Relative Resource Links",
                    f"{proto_rel} resources use protocol-relative URLs "
                    "(//). Use explicit HTTPS instead."))

    return issues


# excluded-by-default URL patterns for issue emission (M22) — the full
# reference default list, crawler.py:151-223.
DEFAULT_ISSUE_EXCLUSIONS = (
    # WordPress admin & system paths
    "/wp-admin/*", "/wp-content/plugins/*", "/wp-content/themes/*",
    "/wp-content/uploads/*", "/wp-includes/*", "/wp-login.php",
    "/wp-cron.php", "/xmlrpc.php", "/wp-json/*", "/wp-activate.php",
    "/wp-signup.php", "/wp-trackback.php",
    # Auth & user management pages
    "/login*", "/signin*", "/sign-in*", "/log-in*", "/auth/*",
    "/authenticate/*", "/register*", "/signup*", "/sign-up*",
    "/registration/*", "/logout*", "/signout*", "/sign-out*", "/log-out*",
    "/forgot-password*", "/reset-password*", "/password-reset*",
    "/recover-password*", "/change-password*", "/account/password/*",
    "/user/password/*", "/activate/*", "/verification/*", "/verify/*",
    "/confirm/*",
    # Admin panels & dashboards
    "/admin/*", "/administrator/*", "/_admin/*", "/backend/*",
    "/dashboard/*", "/cpanel/*", "/phpmyadmin/*", "/pma/*", "/webmail/*",
    "/plesk/*", "/control-panel/*", "/manage/*", "/manager/*",
    # E-commerce checkout & cart
    "/checkout/*", "/cart/*", "/basket/*", "/payment/*", "/billing/*",
    "/order/*", "/orders/*", "/purchase/*",
    # User account pages
    "/account/*", "/profile/*", "/settings/*", "/preferences/*",
    "/my-account/*", "/user/*", "/member/*", "/members/*",
    # CGI & server scripts
    "/cgi-bin/*", "/cgi/*", "/fcgi-bin/*",
    # Version control & config
    "/.git/*", "/.svn/*", "/.hg/*", "/.bzr/*", "/.cvs/*",
    "/.env", "/.env.*", "/.htaccess", "/.htpasswd",
    "/web.config", "/app.config", "/composer.json", "/package.json",
    # Development & build artifacts
    "/node_modules/*", "/vendor/*", "/bower_components/*",
    "/jspm_packages/*", "/includes/*", "/lib/*", "/libs/*", "/src/*",
    "/dist/*", "/build/*", "/builds/*", "/_next/*", "/.next/*", "/out/*",
    "/_nuxt/*", "/.nuxt/*",
    # Testing & development
    "/test/*", "/tests/*", "/spec/*", "/specs/*", "/__tests__/*",
    "/debug/*", "/dev/*", "/development/*", "/staging/*",
    # API internal endpoints
    "/api/internal/*", "/api/admin/*", "/api/private/*",
    # System & internal
    "/private/*", "/system/*", "/core/*", "/internal/*",
    "/tmp/*", "/temp/*", "/cache/*", "/logs/*", "/log/*",
    "/backup/*", "/backups/*", "/old/*", "/archive/*", "/archives/*",
    "/config/*", "/configs/*", "/configuration/*",
    # Media upload forms
    "/upload/*", "/uploads/*", "/uploader/*", "/file-upload/*",
    # Search & filtering (often noisy for SEO)
    "/search*", "*/search/*", "?s=*", "?search=*",
    "*/filter/*", "?filter=*", "*/sort/*", "?sort=*",
    # Printer-friendly & special views
    "/print/*", "?print=*", "/preview/*", "?preview=*",
    "/embed/*", "?embed=*", "/amp/*", "/amp",
    # Feed URLs
    "/feed/*", "/feeds/*", "/rss/*", "*.rss", "/atom/*", "*.atom",
    # Common file types to exclude from issues
    "*.json", "*.xml", "*.yaml", "*.yml", "*.toml", "*.ini", "*.conf",
    "*.log", "*.txt", "*.csv", "*.sql", "*.db",
    "*.bak", "*.backup", "*.old", "*.orig", "*.tmp", "*.swp",
    "*.map", "*.min.js", "*.min.css",
)


_EXCL_CACHE: dict = {}


def _compiled_exclusions(exclusions: tuple):
    """(combined '*'-glob regex, prefix tuple) — one alternation regex
    replaces ~150 fnmatch calls per URL (79µs → ~3µs measured)."""
    hit = _EXCL_CACHE.get(exclusions)
    if hit is not None:
        return hit
    import fnmatch
    globs = [p for p in exclusions if "*" in p]
    prefixes = tuple(p.rstrip("*") for p in exclusions if "*" not in p)
    rx = re.compile("|".join(
        f"(?:{fnmatch.translate(g)})" for g in globs)) if globs else None
    _EXCL_CACHE[exclusions] = (rx, prefixes)
    return rx, prefixes


def is_excluded(url: str,
                exclusions: tuple = DEFAULT_ISSUE_EXCLUSIONS) -> bool:
    """M22 issue-exclusion filter, reference-exact matching semantics
    (issue_detector.py:1457-1469): '*'-patterns fnmatch against the PATH
    only (query-string patterns like '?s=*' therefore never fire — a
    reference quirk kept for parity); patterns without '*' match by path
    equality or prefix."""
    rx, prefixes = _compiled_exclusions(exclusions)
    path = urlsplit(url).path
    if rx is not None and rx.match(path):
        return True
    return path.startswith(prefixes) if prefixes else False


# the pages columns page_issues actually reads — callers can project to
# these before the detect stage so the batch→python conversion doesn't pay
# for the wide unused columns (headers, redirect chains, meta maps)
ISSUE_INPUT_COLUMNS = [
    "url", "status_code", "is_internal", "redirect_count",
    "has_redirect_loop", "title", "meta_description", "h1", "h1_list",
    "word_count", "headings_structure", "canonical_url", "robots",
    "x_robots_tag", "viewport", "lang", "images", "og_tags",
    "twitter_tags", "json_ld", "schema_org", "response_time", "size",
    "spans",
]


def make_issue_detector(exclusions: tuple = DEFAULT_ISSUE_EXCLUSIONS,
                        base_domain: str | None = None):
    """Returns a map_batches body: pages batch → issues table (I1–I17
    per-page rules)."""

    def excluded(url: str) -> bool:
        return is_excluded(url, exclusions)

    def detect(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out: list[dict] = []
        for r in rows:
            if excluded(r["url"]):
                continue
            out.extend(page_issues(r, base_domain))
        if not out:
            return ISSUES_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=ISSUES_SCHEMA)

    return detect
