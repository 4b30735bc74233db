"""Parse stage: span sequences → the LibreCrawl SEO extraction surface.

Re-expresses the reference's BeautifulSoup extractors
(/root/reference/src/core/seo_extractor.py:10-301, M10–M19 in SURVEY.md §2.2)
as batch functions over the corpus span model. Each function takes/returns a
``pyarrow.Table`` so it can run as ``ds.map_batches(parse_documents_batch,
batch_format="pyarrow")`` or be fused into the fetch task.

The unit of vectorization is the *document*: span scanning is a Python loop
per doc (the same per-document CPU cost the reference pays in BeautifulSoup,
minus the HTML tokenizer), parallelized across batches/cores by Ray Data.
All limits mirror the reference: h2/h3 ≤ 10 (seo_extractor.py:36-39),
images ≤ 20 (:197), anchor text ≤ 100 chars (link_manager.py:130).
"""

from __future__ import annotations

import json
import re

import numpy as np
import pyarrow as pa

from ..canonical import (_base_parts, classify_scope, clean_url,
                         is_internal, strip_www, url_host)
from .issues import analyze_structured_data

_WORD_RE = re.compile(r"\w+")
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
_GA4_RE = re.compile(r"\bG-[A-Z0-9]{10}\b")
_GTM_RE = re.compile(r"\bGTM-[A-Z0-9]+\b")
# M15 analytics battery (seo_extractor.py:151-190). Every reference
# pattern is a pure literal, so case-insensitive matching reduces to
# substring checks over the lowercased span — 4 IGNORECASE regex scans
# per text span cost 2.5x the whole parse (379µs vs 150µs per doc).
_GA_ANY_LITS = ("gtag(", "ga(", "googleanalyticsobject",
                "google-analytics.com", "googletagmanager.com")
_FBQ_LITS = ("fbq(", "facebook.com/tr")
_HOTJAR_LITS = ("hotjar.com", "hj(")
_MIXPANEL_LITS = ("mixpanel.com", "mixpanel.track")
_HEADING_KINDS = {f"h{i}": i for i in range(1, 7)}

# meta names promoted to dedicated columns (seo_extractor.py:95-113)
_PROMOTED_META = ("viewport", "author", "keywords", "generator",
                  "theme_color", "charset", "lang")


def _split_kv(text: str) -> tuple[str, str]:
    k, _, v = text.partition("=")
    return k, v


def absolutize_image_src(src: str, page_url: str) -> str:
    """Reference image-src absolutization (seo_extractor.py:203-209):
    ``//`` → https, ``/`` → host-join, else urljoin."""
    if src.startswith("//"):
        return "https:" + src
    if src.startswith("/"):
        return f"https://{url_host(page_url)}{src}"
    return clean_url(src, page_url) if not src.startswith("http") else src


def parse_doc(url: str, spans: list[dict],
              base_domain: str | None = None) -> dict:
    """Parse one document's span list into the pages-row field dict.

    ``base_domain`` is the crawl's base domain for internal/external link
    counting (crawler.py base_domain semantics); defaults to the page's own
    host for standalone parsing."""
    return parse_doc_flat(
        url, [s["kind"] for s in spans], [s["text"] for s in spans],
        [s["media_ref"] for s in spans], 0, len(spans), base_domain)


def parse_doc_flat(url: str, kinds: list[str], texts: list[str],
                   mrefs: list[str], lo: int, hi: int,
                   base_domain: str | None = None,
                   wcounts=None) -> dict:
    """parse_doc over column-major span storage: ``kinds/texts/mrefs`` are
    the flattened child arrays of a whole batch's ``spans`` column and
    ``[lo, hi)`` is this document's slice. The hot path — converting the
    Arrow list<struct> to per-span Python dicts costs ~3× the flattened
    child-array conversion (measured 113 vs 36 µs/page on bench2), so the
    fetch workers parse from the flat lists and only tests/small paths go
    through the dict adapter above."""
    title = None
    meta_description = None
    h1_list: list[str] = []
    h2: list[str] = []
    h3: list[str] = []
    headings: list[dict] = []
    word_count = 0
    canonical_url = ""
    meta_tags: dict[str, str] = {}
    og: dict[str, str] = {}
    tw: dict[str, str] = {}
    robots_meta = ""
    hreflang: list[dict] = []
    images: list[dict] = []
    json_ld: list[str] = []
    schema_org: list[str] = []
    internal_links = 0
    external_links = 0
    ga4 = ""
    gtm = ""
    ga_any = fbq = hotjar = mixpanel = False
    if base_domain is None:
        base_domain = url_host(url)
    base_core = strip_www(base_domain.lower())
    page_host = strip_www(url_host(url))

    def link_is_internal(mref: str) -> bool:
        # host-only fast path (counting needs the host, not the full join)
        if mref.startswith("https://") or mref.startswith("http://"):
            sep = mref.index("://") + 3
            end = mref.find("/", sep)
            host = (mref[sep:] if end < 0 else mref[sep:end]).lower()
        elif mref.startswith("//"):
            end = mref.find("/", 2)
            host = (mref[2:] if end < 0 else mref[2:end]).lower()
        else:
            return page_host == base_core
        return strip_www(host.split("@")[-1].split(":")[0]) == base_core

    for i in range(lo, hi):
        kind = kinds[i]
        text = texts[i]
        mref = mrefs[i]
        if kind in _HEADING_KINDS:
            lvl = _HEADING_KINDS[kind]
            headings.append({"level": lvl, "text": text})
            if lvl == 1:
                h1_list.append(text)
            elif lvl == 2 and len(h2) < 10:
                h2.append(text)
            elif lvl == 3 and len(h3) < 10:
                h3.append(text)
        elif kind == "text":
            word_count += (len(_WORD_RE.findall(text))
                           if wcounts is None else int(wcounts[i]))
            # literal-substring gates before the anchored regex scans:
            # "G-"/"GTM-" are absent from almost all text spans, and a
            # memchr `in` is ~15× cheaper than re.search (measured
            # 25.7 → 1.7 µs/span on 240-word spans)
            if not ga4 and "G-" in text:
                m = _GA4_RE.search(text)
                if m:
                    ga4 = m.group(0)
            if not gtm and "GTM-" in text:
                m = _GTM_RE.search(text)
                if m:
                    gtm = m.group(0)
            if not (ga_any and fbq and hotjar and mixpanel):
                tl = text.lower()
                if not ga_any and any(m in tl for m in _GA_ANY_LITS):
                    ga_any = True
                if not fbq and any(m in tl for m in _FBQ_LITS):
                    fbq = True
                if not hotjar and any(m in tl for m in _HOTJAR_LITS):
                    hotjar = True
                if not mixpanel and any(m in tl for m in _MIXPANEL_LITS):
                    mixpanel = True
        elif kind.startswith("link"):
            # Mirror extract_edges / link_manager discovery: a link counts
            # only if it resolves (clean_url) to an http(s):// target; any
            # explicit non-http(s) scheme (mailto:, TEL:, ftp:, data:, …)
            # counts neither side. Scheme-qualified hrefs are normalized to
            # a lowercase prefix before host classification.
            h = mref.strip()
            sm = _SCHEME_RE.match(h)
            if sm is not None:
                low = h.lower()
                if not (low.startswith("http://")
                        or low.startswith("https://")):
                    continue
                h = low[:sm.end()] + h[sm.end():]
            if link_is_internal(h):
                internal_links += 1
            else:
                external_links += 1
        elif kind == "title":
            if title is None:
                title = text
        elif kind == "meta_description":
            if meta_description is None:
                meta_description = text
        elif kind == "canonical":
            if not canonical_url:
                canonical_url = mref
        elif kind == "meta":
            k, v = _split_kv(text)
            if k not in meta_tags:
                meta_tags[k] = v
        elif kind == "meta_robots":
            if not robots_meta:
                robots_meta = text
        elif kind == "og":
            k, v = _split_kv(text)
            og[k] = v
        elif kind == "twitter":
            k, v = _split_kv(text)
            tw[k] = v
        elif kind == "hreflang":
            hreflang.append({"lang": text, "url": mref})
        elif kind == "image":
            if len(images) < 20:
                images.append({
                    "src": absolutize_image_src(mref, url),
                    "alt": text,
                    # fixture spans carry no dimensions; empty = missing (I10)
                    "width": "", "height": "",
                })
        elif kind == "json_ld":
            try:
                json.loads(text)
                json_ld.append(text)
            except (ValueError, TypeError):
                pass  # reference skips invalid JSON-LD (seo_extractor.py:146-148)
        elif kind == "microdata":
            # M19 Schema.org microdata (seo_extractor.py:264-301): JSON
            # {type, properties} per itemscope element
            try:
                json.loads(text)
                schema_org.append(text)
            except (ValueError, TypeError):
                pass

    return {
        "title": title or "",
        "meta_description": meta_description or "",
        "h1": h1_list[0] if h1_list else "",
        "h1_list": h1_list,
        "h2": h2,
        "h3": h3,
        "headings_structure": headings,
        "word_count": word_count,
        "canonical_url": canonical_url,
        "lang": meta_tags.get("lang", ""),
        "viewport": meta_tags.get("viewport", ""),
        "robots": robots_meta,
        "author": meta_tags.get("author", ""),
        "keywords": meta_tags.get("keywords", ""),
        "generator": meta_tags.get("generator", ""),
        "theme_color": meta_tags.get("theme_color", ""),
        "charset": meta_tags.get("charset", ""),
        "meta_tags": list(meta_tags.items()),
        "og_tags": list(og.items()),
        "twitter_tags": list(tw.items()),
        "hreflang": hreflang,
        "images": images,
        "internal_links": internal_links,
        "external_links": external_links,
        "json_ld": json_ld,
        "schema_org": schema_org,
        # I12 write-back columns (reference issue_detector.py:788-799 stores
        # schema_types / ai_ready_schemas on the result row for exports)
        "schema_types": (sd := analyze_structured_data(json_ld,
                                                       schema_org))["types"],
        "ai_ready_schemas": sd["ai_ready"],
        # flattened schema_analysis (issue_detector.py:717-724 dict)
        "schema_has_organization": sd["has_organization"],
        "schema_has_website": sd["has_website"],
        "schema_has_breadcrumbs": sd["has_breadcrumbs"],
        "schema_faq_count": sd["faq_questions"],
        "analytics_ga4_id": ga4,
        "analytics_gtm_id": gtm,
        # reference sets gtag=True whenever a GA4 id is present
        "analytics_google": ga_any or bool(ga4),
        "analytics_facebook_pixel": fbq,
        "analytics_hotjar": hotjar,
        "analytics_mixpanel": mixpanel,
    }


_PARSE_FIELDS = [
    ("title", pa.string()), ("meta_description", pa.string()),
    ("h1", pa.string()), ("h1_list", pa.list_(pa.string())),
    ("h2", pa.list_(pa.string())), ("h3", pa.list_(pa.string())),
    ("headings_structure",
     pa.list_(pa.struct([("level", pa.int32()), ("text", pa.string())]))),
    ("word_count", pa.int64()), ("canonical_url", pa.string()),
    ("lang", pa.string()), ("viewport", pa.string()), ("robots", pa.string()),
    ("author", pa.string()), ("keywords", pa.string()),
    ("generator", pa.string()), ("theme_color", pa.string()),
    ("charset", pa.string()),
    ("meta_tags", pa.map_(pa.string(), pa.string())),
    ("og_tags", pa.map_(pa.string(), pa.string())),
    ("twitter_tags", pa.map_(pa.string(), pa.string())),
    ("hreflang",
     pa.list_(pa.struct([("lang", pa.string()), ("url", pa.string())]))),
    ("images",
     pa.list_(pa.struct([("src", pa.string()), ("alt", pa.string()),
                         ("width", pa.string()), ("height", pa.string())]))),
    ("internal_links", pa.int64()), ("external_links", pa.int64()),
    ("json_ld", pa.list_(pa.string())),
    ("schema_org", pa.list_(pa.string())),
    ("schema_types", pa.list_(pa.string())),
    ("ai_ready_schemas",
     pa.list_(pa.struct([("name", pa.string()),
                         ("rich_result", pa.string())]))),
    ("schema_has_organization", pa.bool_()),
    ("schema_has_website", pa.bool_()),
    ("schema_has_breadcrumbs", pa.bool_()),
    ("schema_faq_count", pa.int64()),
    ("analytics_ga4_id", pa.string()), ("analytics_gtm_id", pa.string()),
    ("analytics_google", pa.bool_()),
    ("analytics_facebook_pixel", pa.bool_()),
    ("analytics_hotjar", pa.bool_()), ("analytics_mixpanel", pa.bool_()),
]
PARSE_SCHEMA = pa.schema(_PARSE_FIELDS)


def parse_documents_batch(batch: pa.Table,
                          base_domain: str | None = None) -> pa.Table:
    """map_batches body: documents batch (doc_id, spans, …) → parsed columns
    appended. Keeps every input column (incl. the spans passthrough needed
    for the per-row span-sequence invariant)."""
    urls = batch.column("doc_id").to_pylist()
    flat = flatten_spans(batch.column("spans"))
    if flat is None:
        spans_col = batch.column("spans").to_pylist()
        parsed = [parse_doc(u, s or [], base_domain)
                  for u, s in zip(urls, spans_col)]
    else:
        kinds, texts, mrefs, offs, wcounts = flat
        parsed = [parse_doc_flat(u, kinds, texts, mrefs, offs[i],
                                 offs[i + 1], base_domain, wcounts)
                  for i, u in enumerate(urls)]
    out = batch
    for name, typ in _PARSE_FIELDS:
        out = out.append_column(
            name, pa.array([p[name] for p in parsed], type=typ))
    return out


# ------------------------------------------------------------------- edges

# bytes python's ASCII \w matches — the LUT word-run counter below is
# exact for pure-ASCII buffers; spans containing non-ASCII bytes are
# recomputed with re.findall (python \w is unicode-aware there)
_WORD_BYTE_LUT = np.zeros(256, dtype=bool)
_WORD_BYTE_LUT[np.frombuffer(
    b"0123456789_abcdefghijklmnopqrstuvwxyz"
    b"ABCDEFGHIJKLMNOPQRSTUVWXYZ", np.uint8)] = True


def word_run_counts(arr: pa.Array) -> "np.ndarray | None":
    """Per-string ``len(re.findall(r'\\w+', s))`` computed vectorized over
    the Arrow string buffer: LUT-classify every byte, count word-run
    starts with one diff, read per-string totals off the offsets — ~100×
    the throughput of per-string findall (1.9 ms vs 239 ms on a 54k-span
    bench2 block, the former #1 cost of the parse worker). Exact: strings
    containing non-ASCII bytes fall back to findall individually; returns
    None (caller falls back wholesale) only when the array has nulls."""
    if arr.null_count:
        return None
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.int64)
    bufs = arr.buffers()
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    o = arr.offset
    offs = np.frombuffer(bufs[1], odt)[o:o + n + 1].astype(np.int64)
    base = int(offs[0])
    buf = np.frombuffer(bufs[2], np.uint8)[base:int(offs[-1])]
    rel = offs - base
    isw = _WORD_BYTE_LUT[buf]
    starts = isw.copy()
    starts[1:] &= ~isw[:-1]
    if buf.size == 0:
        counts = np.zeros(n, np.int64)
    else:
        # per-span run-start sums via reduceat — the earlier full-buffer
        # int64 cumsum + concatenate wrote ~16 bytes per TEXT BYTE of
        # temporaries (≈190 MB per 4k-page batch), a memory-bus tax paid
        # by every concurrent worker; reduceat reads `starts` once and
        # writes only n span sums. Two reduceat quirks handled: indices
        # must be < buf.size (trailing empty spans start AT buf.size —
        # excluded, left 0), and an empty segment (idx[i] == idx[i+1])
        # yields a[idx[i]], not 0 — zeroed by the empty-span mask below.
        first = rel[:-1]
        valid = first < buf.size
        counts = np.zeros(n, np.int64)
        if valid.any():
            counts[valid] = np.add.reduceat(starts, first[valid],
                                            dtype=np.int64)
        counts[rel[1:] == first] = 0
    # a string beginning mid-run (its first byte AND the previous buffer
    # byte are both word bytes) owns a run start the global diff missed
    first = rel[:-1]
    inner = (first > 0) & (rel[1:] > first)  # non-empty, not buffer-first
    if inner.any():
        fi = first[inner]
        counts[inner] += (isw[fi] & isw[fi - 1]).astype(np.int64)
    nonascii = np.nonzero(buf >= 0x80)[0]
    if nonascii.size:
        hit = np.unique(np.searchsorted(rel, nonascii, side="right") - 1)
        for i in hit:
            counts[i] = len(_WORD_RE.findall(arr[int(i)].as_py()))
    return counts


def flatten_spans(col) \
        -> "tuple[list, list, list, object, object] | None":
    """spans column → (kinds, texts, mrefs, offsets, word_counts) flat
    child lists for the *_flat parsers, or None when the column has null
    rows (caller falls back to the dict path — offsets under nulls are
    unspecified). ``word_counts[i]`` is the \\w+-token count of span i's
    text (vectorized; None when the child array has nulls)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        return None
    vals = col.values
    txt = vals.field("text")
    return (vals.field("kind").to_pylist(),
            txt.to_pylist(),
            vals.field("media_ref").to_pylist(),
            col.offsets.to_numpy(),
            word_run_counts(txt))


def extract_edges(url: str, spans: list[dict], base_domain: str,
                  dedup: set | None = None) -> list[dict]:
    """Link spans → edge rows (link_manager.py:120-195 semantics):
    anchor text truncated to 100 chars, (source,target) exact-deduped with
    first-wins, placement/nofollow from the span kind flags."""
    return extract_edges_flat(
        url, [s["kind"] for s in spans], [s["text"] for s in spans],
        [s["media_ref"] for s in spans], 0, len(spans), base_domain, dedup)


def extract_edges_flat(url: str, kinds: list[str], texts: list[str],
                       mrefs: list[str], lo: int, hi: int,
                       base_domain: str, dedup: set | None = None,
                       memo: dict | None = None) -> list[dict]:
    """extract_edges over column-major span storage (same flat layout as
    parse_doc_flat; ``pos`` stays document-relative).

    ``memo`` (optional, shared across a batch's calls) caches the resolved
    (target, scope, is_internal, domain) per href: absolute hrefs resolve
    identically everywhere and root-relative hrefs depend only on the
    page's scheme+host, so site-wide nav links (the dominant href class)
    resolve once per batch instead of once per page. Path-relative and
    dot-segment hrefs bypass the memo (their resolution needs the full
    base path). A memo must not be shared across different
    ``base_domain`` values (scope classification is cached in it)."""
    out = []
    seen = dedup if dedup is not None else set()
    base_sh = None  # lazy scheme://host of this page, for memo keys
    for i in range(lo, hi):
        kind = kinds[i]
        if not kind.startswith("link"):
            continue
        pos = i - lo
        flags = kind.split("|")
        mref = mrefs[i]
        mk = None
        hit = None
        if memo is not None:
            if mref.startswith(("http://", "https://")):
                mk = mref
            elif (mref.startswith("/") and not mref.startswith("//")
                  and "/." not in mref):
                if base_sh is None:
                    s, n = _base_parts(url)
                    base_sh = s + "://" + n
                mk = base_sh + "\x00" + mref
            if mk is not None:
                hit = memo.get(mk)
        if hit is None:
            target = clean_url(mref, url)
            # Reference (link_manager.py collect_all_links) skips
            # non-http(s) targets (mailto:, tel:, javascript:) at
            # discovery time.
            if not target.startswith(("http://", "https://")):
                res = None
            else:
                scope = classify_scope(target, base_domain)
                res = (target, scope, scope in ("root", "sub"),
                       strip_www(url_host(target)))
            hit = (res,)
            if mk is not None:
                memo[mk] = hit
        res = hit[0]
        if res is None:
            continue
        target, scope, scope_internal, target_dom = res
        key = (url, target)
        if key in seen:
            continue
        seen.add(key)
        out.append({
            "source_url": url,
            "target_url": target,
            "anchor_text": texts[i][:100],
            # Reference sets link is_internal from scope (root OR
            # subdomain) — link_manager.py collect_all_links; the pages-row
            # is_internal stays root-only (issue_detector.py semantics).
            "is_internal": scope_internal,
            "target_domain": target_dom,
            "target_status": None,
            "placement": flags[1] if len(flags) > 1 else "body",
            "nofollow": "nofollow" in flags,
            "blank": "blank" in flags,
            "noopener": "noopener" in flags,
            "scope": scope,
            "pos": pos,
        })
    return out


EDGES_SCHEMA = pa.schema(
    [
        ("source_url", pa.string()), ("target_url", pa.string()),
        ("anchor_text", pa.string()), ("is_internal", pa.bool_()),
        ("target_domain", pa.string()), ("target_status", pa.int32()),
        ("placement", pa.string()), ("nofollow", pa.bool_()),
        ("blank", pa.bool_()), ("noopener", pa.bool_()),
        ("scope", pa.string()), ("pos", pa.int32()),
    ]
)


def make_edge_extractor(base_domain: str):
    """Returns a map_batches body (documents batch → edge rows table)."""
    def extract_edges_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column("doc_id").to_pylist()
        rows: list[dict] = []
        flat = flatten_spans(batch.column("spans"))
        if flat is None:
            spans_col = batch.column("spans").to_pylist()
            for u, s in zip(urls, spans_col):
                rows.extend(extract_edges(u, s or [], base_domain))
        else:
            kinds, texts, mrefs, offs, _ = flat
            memo: dict = {}
            for i, u in enumerate(urls):
                rows.extend(extract_edges_flat(
                    u, kinds, texts, mrefs, offs[i], offs[i + 1],
                    base_domain, memo=memo))
        if not rows:
            return EDGES_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=EDGES_SCHEMA)
    return extract_edges_batch
