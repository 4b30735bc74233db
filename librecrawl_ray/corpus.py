"""Deterministic synthetic corpus generator (FIXTURES.md).

Produces the engine's input in the authoritative BASELINE.json input_hint
shape: a ``documents`` table of ``(doc_id:string, spans:list<struct<kind,
text, media_ref, offset>>)`` plus fetch-simulation metadata columns, and the
side tables ``robots``, ``sitemaps``, ``seeds``.

The corpus encodes a synthetic web graph whose features exercise cited
reference behaviors (FIXTURES.md §3): BFS tree with exact depth structure,
crawl traps (`/calendar/\\d+`), redirect chains and loops, broken links,
near-duplicate clusters, hreflang clusters, robots-disallowed subtrees,
noindex pages, archive/utility paths, the full I1–I17 issue smorgasbord,
and a skewed-host distribution across subdomains.

Everything is a pure function of (tier, seed) — no RNG state leaks, no
wall-clock, no network. Span ``kind`` grammar (parsed by stages/parse.py):

    title | meta_description | h1..h6 | text | canonical | hreflang
    | meta  (text = "name=value")
    | og / twitter (text = "key=value")
    | json_ld (text = JSON)
    | image (text = alt, media_ref = src; empty alt = missing)
    | link[|placement][|nofollow][|blank][|noopener]
        placement ∈ {body, nav, footer}; media_ref = href as written
        (may be relative / carry fragments — the canonicalization stage
        cleans it), text = anchor text.

Tree topology: ``S`` section roots (depth 1 under the seed), each node has
``K`` children: children(i) = [S + i*K + j for j in range(K)], injective, so
depth(node m) = 1 + depth((m - S) // K). n_tree = S·(1 + K + K²) keeps the
whole tree within max_depth=3.
"""

from __future__ import annotations

import hashlib
import json
import os
import zlib
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .canonical import norm_url, shard_of, url_sha1
from .schema import DOCUMENTS_SCHEMA

BASE = "https://site.example"
ALPHA = "abcdefghijklmnopqrstuvwxyz"

_VOCAB = [
    w + s
    for s in ("", "s", "ing", "ed")
    for w in (
        "data ray arrow crawl page link index spider fetch parse token "
        "stream batch shard actor wave depth queue graph node edge host "
        "robot delay filter bloom hash span text media image title meta "
        "issue audit report export schema table column row block part "
        "market value search engine rank score count word content site"
    ).split()
]


def b26(i: int) -> str:
    """Deterministic letters-only page slug (no digit runs → no accidental
    trap-signature collisions with the /calendar/<digits> family)."""
    if i == 0:
        return "a"
    out = []
    while i > 0:
        out.append(ALPHA[i % 26])
        i //= 26
    return "".join(reversed(out))


_VOCAB2 = _VOCAB * 2


def words_for(i: int, n: int) -> str:
    """n words starting at a deterministic vocab offset (fast path: slice of
    a doubled vocab list, wrapping whole-vocab repeats for long texts)."""
    v = len(_VOCAB)
    start = (i * 31) % v
    if n <= v:
        return " ".join(_VOCAB2[start:start + n])
    reps, rem = divmod(n, v)
    body = " ".join(_VOCAB2[start:start + v])
    parts = [body] * reps
    if rem:
        parts.append(" ".join(_VOCAB2[start:start + rem]))
    return " ".join(parts)


@dataclass
class CorpusTier:
    name: str
    sections: int
    fanout: int
    subdomains: int = 2

    @property
    def n_tree(self) -> int:
        return self.sections * (1 + self.fanout + self.fanout * self.fanout)


TIERS = {
    "t1": CorpusTier("t1", sections=8, fanout=5),
    "t2": CorpusTier("t2", sections=25, fanout=26),
    # bench tiers — larger trees, same structure
    "bench1": CorpusTier("bench1", sections=60, fanout=40, subdomains=4),
    "bench2": CorpusTier("bench2", sections=150, fanout=60, subdomains=4),
    # ~4.9M pages: the tier where the final BFS wave's gated rows (~4.8M)
    # organically cross the measured 2M distributed-admission crossover,
    # so `bench.py --bench3` exercises _run_wave_cells without forcing
    "bench3": CorpusTier("bench3", sections=160, fanout=175, subdomains=4),
}

DEFAULT_CONFIG = {
    "max_depth": 3,
    "max_urls": 1_000_000,
    "crawl_external": False,
    "crawl_subdomains": True,
    "respect_robots": True,
    "trap_threshold": 100,
    "exclude_extensions": [".jpg", ".jpeg", ".png", ".gif", ".css", ".js",
                           ".pdf", ".zip", ".ico", ".svg"],
    "include_patterns": [],
    "exclude_patterns": [],
    "duplication_threshold": 0.85,
    "max_file_size": 50 * 1024 * 1024,
    "per_host_wave_cap": 0,          # 0 = politeness off (no deferrals)
    "num_shards": 16,                # seen-filter shards
    "num_parts": 128,                # corpus hash partitions (≫ worker pool → balanced greedy assignment)
    "use_sitemap": False,
    "retries": 3,
}


@dataclass
class Doc:
    url: str
    spans: list[tuple[str, str, str]] = field(default_factory=list)
    status_code: int = 200
    redirect_to: str = ""
    content_type: str = "text/html"
    response_time_ms: float = 0.0
    headers: dict[str, str] = field(default_factory=dict)
    x_robots_tag: str = ""
    # S4: ("same"|"changed", growth_factor) — None = no JS-rendered variant
    rendered: tuple | None = None
    # S1 fault model: consecutive 429s served before the real response,
    # plus the 429's Retry-After header value ("" = absent)
    fault_429: int = 0
    retry_after: str = ""

    def add(self, kind: str, text: str = "", media_ref: str = "") -> None:
        self.spans.append((kind, text, media_ref))

    def link(self, href: str, anchor: str, placement: str = "body",
             nofollow: bool = False, blank: bool = False,
             noopener: bool = False) -> None:
        kind = f"link|{placement}"
        if nofollow:
            kind += "|nofollow"
        if blank:
            kind += "|blank"
        if noopener:
            kind += "|noopener"
        self.add(kind, anchor, href)


def _page_url(i: int) -> str:
    return f"{BASE}/page/{b26(i)}"


def generate_corpus(tier: str = "t1", seed: int = 42,
                    faults: bool = False) -> dict:
    """Build the full fixture: returns dict with arrow tables
    ``documents``, ``robots``, ``sitemaps``, ``seeds`` and dict ``config``.

    ``faults=True`` deterministically injects S1 rate-limit faults
    (reference crawler.py:941-976): ~1/13 of eligible docs serve 1-3
    429s before succeeding (cycling absent / numeric / malformed
    Retry-After headers), ~1/127 serve retries+2 429s and are recorded
    as 429 pages. The homepage seed, 3xx rows and redirect targets are
    never faulted (faults apply at the entry URL of a fetch; chain
    resolution models one requests.get with allow_redirects)."""
    t = TIERS[tier]
    S, K, n = t.sections, t.fanout, TIERS[tier].n_tree
    docs: list[Doc] = []

    def std_meta(d: Doc, i: int) -> None:
        if i % 11 != 5:
            d.add("meta", "viewport=width=device-width, initial-scale=1")
        if i % 13 != 6:
            d.add("meta", "lang=en")
        d.add("meta", "charset=utf-8")
        if i % 7 == 0:
            d.add("meta", f"author=Author {b26(i % 50)}")
        if i % 17 == 0:
            d.add("meta", f"keywords={words_for(i, 4).replace(' ', ',')}")
        if i % 101 == 17:
            d.add("meta_robots", "noindex,follow")
        if i % 103 == 11:
            d.add("meta_robots", "index,nofollow")

    def social(d: Doc, i: int, title: str) -> None:
        if i % 5 != 2:
            d.add("og", f"og:title={title}")
            d.add("og", f"og:type=article")
        if i % 6 != 3:
            d.add("twitter", f"twitter:card=summary")
            d.add("twitter", f"twitter:title={title}")

    # ------------------------------------------------------------- home page
    home = Doc(f"{BASE}/")
    home.add("title", "Site Example — Home of Synthetic Crawling")
    home.add("meta_description",
             "A deterministic synthetic web graph for crawl-engine conformance "
             "testing with sections, traps, redirects and more signals.")
    home.add("h1", "Site Example")
    home.add("meta", "viewport=width=device-width, initial-scale=1")
    home.add("meta", "lang=en")
    home.add("meta", "charset=utf-8")
    home.add("meta", "generator=librecrawl-ray-fixture")
    home.add("meta", "theme_color=#123456")
    home.add("canonical", "", f"{BASE}/")
    home.add("og", "og:title=Site Example")
    home.add("og", "og:type=website")
    home.add("twitter", "twitter:card=summary_large_image")
    home.add("json_ld", json.dumps({"@context": "https://schema.org",
                                    "@type": "Organization",
                                    "name": "Site Example"}))
    home.add("json_ld", json.dumps({"@context": "https://schema.org",
                                    "@type": "WebSite",
                                    "url": BASE}))
    home.add("text", "ga G-ABC1234567 analytics loaded gtm GTM-ABCD123 " +
             words_for(0, 120))
    for s in range(S):
        home.link(f"/page/{b26(s)}", f"Section {b26(s)}", placement="nav")
    # special-family entry points (depth 1)
    home.link("/calendar-hub", "Events calendar", placement="nav")
    home.link("/r/a0", "Start redirect tour")
    home.link("/rloop/a", "Loop door")
    home.link("/dup-hub", "Catalog duplicates")
    home.link("/l/en/guide", "Language guide")
    home.link("/tag/widgets", "widgets tag")
    home.link("/2024/01/archive", "January archive")
    home.link("/login", "Log in")
    home.link("/cart", "Cart")
    home.link("/private/secret-plans", "Private area")
    home.link("/hub-external", "Partners")
    home.link("/deep/" + "x" * 110, "A very long URL page")
    home.link("/under_scored_path/page", "Underscored")
    home.link("/search?q=widgets&page=2", "Search results")
    home.link("/products/widget?color=blue", "Blue widget")
    home.link("mailto:info@site.example", "Email us")       # skipped scheme
    home.link("tel:+15551234567", "Call us")                # skipped scheme
    home.link("javascript:void(0)", "JS no-op")             # skipped scheme
    home.link("MAILTO:caps@site.example", "Email caps")     # skipped (case)
    home.link("ftp://files.site.example/pub", "FTP mirror") # skipped scheme
    home.link("data:text/plain;base64,aGk=", "Data URI")    # skipped scheme
    home.link("/soft404/gone", "Maybe gone")
    home.link("/missing/front", "Broken front link")
    home.link("/big", "Huge page")
    home.link("/slow", "Slow page")
    home.link("/seg/seg/seg/page", "Repeated segments")
    home.link("/llms.txt", "LLMs policy")
    home.link(f"https://sub0.{BASE.removeprefix('https://')}/s/a", "Sub zero")
    home.link(f"https://sub1.{BASE.removeprefix('https://')}/s/a", "Sub one")
    home.link("https://www.site.example/page/a", "WWW variant of section a")
    home.link("https://offsite-a.example/partner", "Partner A")
    home.link("/assets/logo.png", "Logo")        # excluded by extension
    home.link("/about", "About", placement="footer")
    docs.append(home)

    # ------------------------------------------------------------ tree pages
    for i in range(n):
        u = _page_url(i)
        d = Doc(u)
        wc = 40 + (i * 37) % 600                    # some pages < 300 → thin
        title_words = words_for(i * 3 + 1, 5)
        if i % 97 == 13:
            pass                                    # missing title (I1)
        elif i % 89 == 21:
            d.add("title", "Very long page title " + words_for(i, 14))
        elif i % 91 == 7:
            d.add("title", "Tiny")                  # < 30 chars
        else:
            d.add("title", f"Page {b26(i)} — {title_words}")
        if i % 95 != 31:
            if i % 87 == 19:
                d.add("meta_description",
                      "An exceedingly long meta description " + words_for(i, 30))
            else:
                d.add("meta_description",
                      f"All about page {b26(i)}: {words_for(i * 5 + 2, 12)}")
        if i % 83 == 11:
            d.add("h1", f"First heading {b26(i)}")
            d.add("h1", f"Second heading {b26(i)}")   # multiple H1 (I3)
        elif i % 93 == 5:
            pass                                      # missing H1
        else:
            d.add("h1", f"Page {b26(i)} heading")
        if i % 79 == 3:
            d.add("h3", "Skipped level detail")       # non-sequential (I3)
        else:
            d.add("h2", f"About {words_for(i + 7, 3)}")
            d.add("h2", f"More on {words_for(i + 11, 3)}")
            if i % 4 == 0:
                d.add("h3", f"Detail {words_for(i + 13, 2)}")
        std_meta(d, i)
        if i % 73 == 9:
            # canonicalised elsewhere (I8)
            d.add("canonical", "", _page_url((i * 7 + 1) % n))
        elif i % 71 != 3:                             # some missing canonical
            d.add("canonical", "", u)
        social(d, i, f"Page {b26(i)}")
        if i % 61 == 8:
            d.add("json_ld", json.dumps({
                "@context": "https://schema.org", "@type": "Article",
                "headline": f"Page {b26(i)}"}))       # missing datePublished
        if i % 67 == 9:
            d.add("json_ld", json.dumps({
                "@context": "https://schema.org", "@type": "FAQPage",
                "mainEntity": [
                    {"@type": "Question", "name": "Q1",
                     "acceptedAnswer": {"@type": "Answer", "text": "A1"}},
                    {"@type": "Question", "name": "Q2",
                     "acceptedAnswer": {"@type": "Answer", "text": "A2"}},
                ]}))                                  # FAQ with < 3 questions
        d.add("text", words_for(i * 13 + 3, wc))
        if i % 3 == 0:
            alt1 = "" if i % 9 == 0 else f"photo of {b26(i)}"
            d.add("image", alt1, f"{BASE}/assets/img-{b26(i)}.jpg")
            if i % 6 == 0:
                d.add("image", f"diagram {b26(i)}",
                      f"//cdn.site.example/d-{b26(i)}.png")  # protocol-relative
        if i % 113 == 44:
            d.add("image", "insecure", f"http://site.example/mix-{b26(i)}.png")
        # children links (the BFS tree)
        for j in range(K):
            c = S + i * K + j
            if c < n:
                anchor = ("click here" if (i + j) % 41 == 0
                          else "" if (i + j) % 43 == 0
                          else f"Page {b26(c)}")
                d.link(f"/page/{b26(c)}", anchor)
        # cross links: duplicates of already-discovered URLs + variants
        d.link(_page_url((i * 7 + 3) % n), f"Related {b26((i * 7 + 3) % n)}")
        if i % 5 == 0:
            d.link(_page_url((i * 11 + 1) % n) + "#section-2", "Deep anchor")
        if i % 29 == 2:
            d.link(f"https://offsite-{b26(i % 7)}.example/ref", "Partner link",
                   blank=True, noopener=(i % 2 == 0))
        if i % 31 == 4:
            d.link(_page_url((i + 1) % n), "internal nofollow", nofollow=True)
        d.link("/about", "About", placement="footer")
        d.response_time_ms = 40.0 + (i * 17) % 240
        # M19 microdata fixtures: Product microdata; i%59==23 pages have
        # microdata but NO json_ld (No-Structured-Data must not fire)
        if i % 59 == 23:
            d.add("microdata", json.dumps({
                "type": "https://schema.org/Product",
                "properties": {"name": f"Widget {b26(i)}",
                               "sku": f"SKU-{i}"}}))
        # M15 analytics-battery fixtures (case variety is deliberate)
        if i % 41 == 9:
            d.add("text", "window.fbq('init','123'); via Facebook.com/tr px")
        if i % 43 == 11:
            d.add("text", "loaded static.hotjar.com/h.js then hj('event')")
        if i % 47 == 13:
            d.add("text", "cdn.mxpnl.example Mixpanel.track('signup') done")
        if i % 53 == 17:
            d.add("text", "var q = GoogleAnalyticsObject; gtag('config')")
        # S4 JS-diff fixtures: changed+grown (requires_js), changed but
        # under the 10% growth bar, and rendered-identical
        if i % 23 == 7:
            d.rendered = ("changed", 1.25)
        elif i % 23 == 15:
            d.rendered = ("changed", 1.04)
        elif i % 23 == 3:
            d.rendered = ("same", 1.0)
        docs.append(d)

    # ----------------------------------------------------- special families
    about = Doc(f"{BASE}/about")
    about.add("title", "About Site Example and this synthetic corpus")
    about.add("meta_description", "About page for the fixture web graph.")
    about.add("h1", "About")
    std_meta(about, 1)
    about.add("canonical", "", f"{BASE}/about")
    about.add("text", words_for(9999, 400))
    about.link("/", "Home", placement="nav")
    docs.append(about)

    # trap family: hub links >threshold distinct /calendar/<digits> pages
    trap_n = 160
    hub = Doc(f"{BASE}/calendar-hub")
    hub.add("title", "Calendar hub listing every synthetic event day")
    hub.add("meta_description", "Hub page that fans out into a crawl trap.")
    hub.add("h1", "Calendar")
    std_meta(hub, 2)
    hub.add("text", words_for(5000, 350))
    for c in range(trap_n):
        hub.link(f"/calendar/{c}", f"Day {c}")
    docs.append(hub)
    for c in range(trap_n + 4):
        cd = Doc(f"{BASE}/calendar/{c}")
        cd.add("title", f"Calendar day {c} of the synthetic events feed")
        cd.add("h1", f"Day {c}")
        std_meta(cd, c)
        cd.add("text", words_for(6000 + c, 320))
        cd.link(f"/calendar/{c + 1}", "Next day")
        cd.link(f"/calendar/{c + 2}", "Day after")
        docs.append(cd)

    # redirect chains: /r/a0 → 301 → /r/a1 (1 hop, ok)
    #                  /r/b0 → b1 → b2 → target (3 hops, info)
    #                  /r/c0 → … → c4 → target (5 hops, warning)
    def chain(prefix: str, hops: int) -> None:
        for h in range(hops):
            r = Doc(f"{BASE}/r/{prefix}{h}")
            r.status_code = 301
            r.redirect_to = (f"{BASE}/r/{prefix}{h + 1}" if h + 1 < hops
                             else f"{BASE}/r/{prefix}-final")
            docs.append(r)
        fin = Doc(f"{BASE}/r/{prefix}-final")
        fin.add("title", f"Redirect {prefix} landing page title here")
        fin.add("meta_description", f"Final landing page for chain {prefix}.")
        fin.add("h1", f"Landing {prefix}")
        std_meta(fin, 3)
        fin.add("canonical", "", fin.url)
        fin.add("text", words_for(7000 + hops, 330))
        if prefix == "a":
            fin.link("/r/b0", "Next chain")
            fin.link("/r/c0", "Long chain")
        docs.append(fin)

    chain("a", 1)
    chain("b", 3)
    chain("c", 5)
    la = Doc(f"{BASE}/rloop/a"); la.status_code = 302
    la.redirect_to = f"{BASE}/rloop/b"; docs.append(la)
    lb = Doc(f"{BASE}/rloop/b"); lb.status_code = 302
    lb.redirect_to = f"{BASE}/rloop/a"; docs.append(lb)

    # broken targets — linked from several tree pages
    for m in range(6):
        err = Doc(f"{BASE}/missing/m{m}")
        err.status_code = 404
        err.add("title", "404 Not Found")
        docs.append(err)
        boom = Doc(f"{BASE}/err/e{m}")
        boom.status_code = 500
        docs.append(boom)
    err_front = Doc(f"{BASE}/missing/front"); err_front.status_code = 404
    docs.append(err_front)
    # attach broken links to deterministic tree pages
    for i in range(0, min(n, 60), 10):
        docs[1 + i].link(f"/missing/m{i % 6}", "broken ref")
        docs[1 + i].link(f"/err/e{i % 6}", "server boom")

    soft = Doc(f"{BASE}/soft404/gone")
    soft.add("title", "Page Not Found — Site Example")
    soft.add("h1", "404 Error")
    soft.add("text", words_for(123, 40))
    docs.append(soft)

    # near-duplicate cluster (D3): pairs straddling the 0.85 threshold
    dup_hub = Doc(f"{BASE}/dup-hub")
    dup_hub.add("title", "Catalog of very similar widget pages for dedup")
    dup_hub.add("h1", "Duplicates")
    std_meta(dup_hub, 4)
    dup_hub.add("text", words_for(8000, 320))
    for v in range(6):
        dup_hub.link(f"/dup/{b26(v)}", f"Widget variant {v}")
    docs.append(dup_hub)
    dup_bases = [
        ("Blue Widget Catalog Premium Edition",
         "Our finest blue widgets, hand picked for discerning collectors.",
         "Blue Widget Catalog"),
        ("Blue Widget Catalog Premium Editions",           # near-dup of ^
         "Our finest blue widgets, hand picked for discerning collector.",
         "Blue Widget Catalog"),
        ("Blue Widget Catalog Premium Edition Vol 2",      # near-dup of ^
         "Our finest blue widgets, hand picked for discerning collectors.",
         "Blue Widget Catalogs"),
        ("Red Gadget Overview Completely Different",
         "Red gadgets differ from widgets in every imaginable way indeed.",
         "Red Gadget Overview"),
        ("Green Gizmo Digest Summer Collection",
         "Green gizmos for the summer, a seasonal digest of novelties.",
         "Green Gizmo Digest"),
        ("Green Gizmo Digest Winter Collection",           # borderline pair
         "Green gizmos for the winter, a seasonal digest of novelties.",
         "Green Gizmo Digest"),
    ]
    for v, (ti, de, h1) in enumerate(dup_bases):
        dd = Doc(f"{BASE}/dup/{b26(v)}")
        dd.add("title", ti)
        dd.add("meta_description", de)
        dd.add("h1", h1)
        std_meta(dd, v)
        dd.add("text", words_for(8100, 300 + (v % 2) * 8))
        docs.append(dd)

    # hreflang cluster (J6)
    lang_urls = {c: f"{BASE}/l/{c}/guide" for c in ("en", "fr", "de", "es", "bad")}
    recip = ("en", "fr", "de")
    for c in recip:
        ld = Doc(lang_urls[c])
        ld.add("title", f"Guide in {c} language for the synthetic site")
        ld.add("meta_description", f"The {c} guide.")
        ld.add("h1", f"Guide ({c})")
        std_meta(ld, 5)
        for o in recip:
            if c == "fr" and o == "fr":
                continue                    # fr omits itself → J6 self-ref
            ld.add("hreflang", o, lang_urls[o])
        ld.add("hreflang", "xx", lang_urls["bad"])         # unknown code
        ld.add("hreflang", "pt", f"{BASE}/missing/m0")     # → 404 target
        ld.add("text", words_for(9000, 320))
        if c == "en":
            for o in ("fr", "de", "es", "bad"):
                ld.link(lang_urls[o], f"{o} version")
        docs.append(ld)
    es = Doc(lang_urls["es"])
    es.add("title", "Guia en espanol para el sitio sintetico aqui")
    es.add("h1", "Guia (es)")
    std_meta(es, 6)
    es.add("hreflang", "en", lang_urls["en"])   # es → en but en ↛ es
    es.add("hreflang", "es", lang_urls["es"])
    es.add("text", words_for(9100, 310))
    docs.append(es)
    bad = Doc(lang_urls["bad"])
    bad.add("title", "Guide with an invalid hreflang code on purpose")
    bad.add("h1", "Guide (bad)")
    std_meta(bad, 7)
    bad.add("text", words_for(9200, 305))
    docs.append(bad)

    # archive / utility pages (M21 severity classifier)
    for u, ttl in ((f"{BASE}/tag/widgets", "Widgets tag archive"),
                   (f"{BASE}/2024/01/archive", "January 2024 archive"),
                   (f"{BASE}/login", "Log in"),
                   (f"{BASE}/cart", "Shopping cart")):
        ad = Doc(u)
        ad.add("title", ttl)
        ad.add("h1", ttl)
        ad.add("text", words_for(zlib.crc32(u.encode()) % 1000, 120))
        if "/tag/" in u or "/2024/" in u:
            ad.x_robots_tag = "noindex"
        docs.append(ad)

    # robots-disallowed subtree — exists but must never be fetched
    priv = Doc(f"{BASE}/private/secret-plans")
    priv.add("title", "SECRET — if you can read this the robots filter failed")
    priv.add("text", words_for(4242, 100))
    priv.link("/private/deeper", "deeper")
    docs.append(priv)
    docs.append(Doc(f"{BASE}/private/deeper"))

    # external hub: > 50 external outlinks (I16)
    hubx = Doc(f"{BASE}/hub-external")
    hubx.add("title", "Partner directory with a great many external links")
    hubx.add("h1", "Partners")
    std_meta(hubx, 8)
    hubx.add("text", words_for(3000, 330))
    for x in range(55):
        hubx.link(f"https://partner-{b26(x)}.example/home", f"Partner {x}",
                  blank=(x % 3 == 0), noopener=(x % 6 == 0))
    docs.append(hubx)

    # URL-shape pages (I15)
    for u in (f"{BASE}/deep/" + "x" * 110,
              f"{BASE}/under_scored_path/page",
              f"{BASE}/search?q=widgets&page=2",
              f"{BASE}/products/widget?color=blue",
              f"{BASE}/seg/seg/seg/page"):
        sd = Doc(u)
        sd.add("title", f"Shape test {u[-12:]} page with regular title")
        sd.add("h1", "Shape test")
        std_meta(sd, 9)
        sd.add("text", words_for(zlib.crc32(u.encode()) % 997, 310))
        docs.append(sd)

    # perf pages (I13)
    big = Doc(f"{BASE}/big")
    big.add("title", "A very large page used for the size threshold")
    big.add("h1", "Big")
    big.add("text", words_for(1234, 320))
    big_size = 4 * 1024 * 1024
    docs.append(big)
    slow = Doc(f"{BASE}/slow")
    slow.add("title", "A slow page used for the response time threshold")
    slow.add("h1", "Slow")
    slow.add("text", words_for(4321, 320))
    slow.response_time_ms = 3500.0
    docs.append(slow)

    # llms.txt (S7)
    llms = Doc(f"{BASE}/llms.txt")
    llms.content_type = "text/plain"
    llms.add("h1", "Site Example")
    llms.add("text", "A synthetic corpus for crawl-engine conformance.")
    docs.append(llms)

    # www-alias page (canonicalised elsewhere, I8)
    www = Doc("https://www.site.example/page/a")
    www.add("title", "Page a — www alias variant of the first section")
    www.add("h1", "Page a heading")
    std_meta(www, 10)
    www.add("canonical", "", _page_url(0))
    www.add("text", words_for(555, 310))
    docs.append(www)

    # subdomain pages (skewed-host + politeness fixtures)
    host_root = BASE.removeprefix("https://")
    for sdx in range(t.subdomains):
        sub = f"https://sub{sdx}.{host_root}"
        n_sub = 12 + sdx * 6
        for p in range(n_sub):
            su = Doc(f"{sub}/s/{b26(p)}")
            su.add("title", f"Subdomain {sdx} page {b26(p)} standard title")
            su.add("meta_description", f"Sub {sdx} page {b26(p)}.")
            su.add("h1", f"Sub {sdx} / {b26(p)}")
            std_meta(su, p)
            su.add("text", words_for(sdx * 1000 + p, 310))
            if p + 1 < n_sub:
                su.link(f"/s/{b26(p + 1)}", "next")
            if p + 2 < n_sub:
                su.link(f"/s/{b26(p + 2)}", "skip ahead")
            su.headers = {"Content-Security-Policy": "default-src 'self'",
                          "Strict-Transport-Security": "max-age=63072000",
                          "X-Frame-Options": "DENY"} if sdx == 1 else {}
            docs.append(su)

    # orphans: only reachable via the sitemap
    orph = Doc(f"{BASE}/orphan/a")
    orph.add("title", "Orphan page only listed in the sitemap file")
    orph.add("h1", "Orphan")
    std_meta(orph, 12)
    orph.add("text", words_for(777, 320))
    docs.append(orph)

    # ---------------------------------------------------------- faults
    if faults:
        from .canonical import norm_url as _nu
        redirect_targets = {_nu(d.redirect_to) for d in docs
                            if d.redirect_to}
        give_up_429 = DEFAULT_CONFIG["retries"] + 2
        for d in docs:
            if (d.url == f"{BASE}/" or d.redirect_to
                    or _nu(d.url) in redirect_targets):
                continue
            h = int(hashlib.md5(d.url.encode()).hexdigest()[:8], 16)
            if h % 13 == 3:
                d.fault_429 = 1 + h % 3
                d.retry_after = ("", "2", "soon")[h % 3]
            elif h % 127 == 5:
                d.fault_429 = give_up_429
                d.retry_after = "1"

    # ---------------------------------------------------------- assemble
    seen_ids: set[str] = set()
    rows = []
    for d in docs:
        if d.url in seen_ids:
            raise ValueError(f"duplicate doc_id in fixture: {d.url}")
        seen_ids.add(d.url)
        spans = [
            {"kind": k, "text": tx, "media_ref": mr, "offset": off}
            for off, (k, tx, mr) in enumerate(d.spans)
        ]
        size = sum(len(s["text"]) + len(s["media_ref"]) for s in spans) + 512
        if d.url.endswith("/big"):
            size = big_size
        raw_hash = hashlib.md5(f"{d.url}|{size}".encode()).hexdigest()
        if d.rendered is not None:
            mode, factor = d.rendered
            rendered_hash = (raw_hash if mode == "same" else
                             hashlib.md5(f"{d.url}|{size}|js".encode())
                             .hexdigest())
            rendered_size = int(size * factor)
        else:
            rendered_hash = None
            rendered_size = None
        rows.append({
            "doc_id": d.url,
            "spans": spans,
            "status_code": d.status_code,
            "redirect_to": d.redirect_to,
            "content_type": d.content_type,
            "size": size,
            "response_time_ms": d.response_time_ms or 40.0 + len(d.url) % 200,
            "headers": list(d.headers.items()),
            "host": d.url.split("/")[2].lower(),
            "x_robots_tag": d.x_robots_tag,
            "raw_content_hash": raw_hash,
            "rendered_content_hash": rendered_hash,
            "rendered_size": rendered_size,
            "fault_429": d.fault_429,
            "retry_after": d.retry_after,
        })
    documents = pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)

    robots_rows = [
        {"host": "site.example",
         "content": ("User-agent: *\n"
                     "Disallow: /private/\n"
                     "Crawl-delay: 0\n"
                     f"Sitemap: {BASE}/sitemap_index.xml\n")},
        {"host": "www.site.example",
         "content": "User-agent: *\nDisallow: /private/\n"},
    ]
    for sdx in range(t.subdomains):
        delay = 2 if sdx == 0 else 0
        robots_rows.append({
            "host": f"sub{sdx}.{host_root}",
            "content": f"User-agent: *\nCrawl-delay: {delay}\n"})
    # deliberately malformed robots for the validator (M5)
    robots_rows.append({"host": "broken-robots.example",
                        "content": "User-agent *\nDisalow: /x\n\nDisallow: /ok\n"})
    robots = pa.Table.from_pylist(robots_rows, schema=pa.schema(
        [("host", pa.string()), ("content", pa.string())]))

    sitemap_rows = [
        {"url": f"{BASE}/sitemap_index.xml", "content_kind": "index",
         "entries": [f"{BASE}/sitemap_a.xml", f"{BASE}/sitemap_b.xml"]},
        {"url": f"{BASE}/sitemap_a.xml", "content_kind": "urlset",
         "entries": [f"{BASE}/", _page_url(0), _page_url(1),
                     f"{BASE}/missing/m0", f"{BASE}/r/b0",
                     f"{BASE}/tag/widgets"]},
        {"url": f"{BASE}/sitemap_b.xml", "content_kind": "urlset",
         "entries": [_page_url(2), f"{BASE}/orphan/a",
                     f"{BASE}/never-crawled/x",
                     _page_url((7 * 73 + 1) % n) if n > 2 else _page_url(0)]},
    ]
    sitemaps = pa.Table.from_pylist(sitemap_rows, schema=pa.schema(
        [("url", pa.string()), ("content_kind", pa.string()),
         ("entries", pa.list_(pa.string()))]))

    seeds = pa.Table.from_pylist(
        [{"url": f"{BASE}/", "seq": 0}],
        schema=pa.schema([("url", pa.string()), ("seq", pa.int32())]))

    return {"documents": documents, "robots": robots, "sitemaps": sitemaps,
            "seeds": seeds, "config": dict(DEFAULT_CONFIG)}


# ------------------------------------------------------------------ writing

# bump when generator output changes: the on-disk cache key includes it, so
# stale fixtures from an older generator can never leak into tests/oracles
FIXTURE_VERSION = 13


def corpus_dir(tier: str, root: str = "/tmp/graft_corpus") -> str:
    return os.path.join(root, f"v{FIXTURE_VERSION}", tier)


def write_corpus(tier: str = "t1", root: str = "/tmp/graft_corpus",
                 num_parts: int | None = None, force: bool = False,
                 faults: bool = False) -> str:
    """Write the fixture to ``root/tier``: documents/ (16k-row parquet
    files — one Ray read task each; DuckDB oracles read the same files via
    glob), hash-partitioned parts/part-NNN.parquet sorted by norm url
    (the fetch-lookup layout — at 10^10 scale these are the Lance fragments
    the partition-affine fetch stage reads with row-group pruning), plus
    robots/sitemaps/seeds parquet and config.json. Idempotent via a _DONE
    marker; safe to call from queries() and oracle_sql() concurrently."""
    out = corpus_dir(tier + "-faults" if faults else tier, root)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done) and not force:
        return out
    fix = generate_corpus(tier, faults=faults)
    nparts = num_parts or fix["config"]["num_parts"]
    tmp = out + ".tmp"
    os.makedirs(os.path.join(tmp, "parts"), exist_ok=True)
    docs: pa.Table = fix["documents"]
    # multi-FILE documents dir: Ray Data assigns one read task per file, so
    # a single 549k-row file serializes the scan (SplitBlocks only splits
    # AFTER the read); 16k-row files parallelize both Ray and DuckDB
    # (read_parquet glob) scans
    ddir = os.path.join(tmp, "documents")
    os.makedirs(ddir, exist_ok=True)
    chunk = 16384
    for fi, off in enumerate(range(0, docs.num_rows, chunk)):
        pq.write_table(docs.slice(off, chunk),
                       os.path.join(ddir, f"part-{fi:04d}.parquet"))
    norm_ids = [norm_url(u) for u in docs.column("doc_id").to_pylist()]
    sha1s = [url_sha1(u) for u in norm_ids]
    parts = [shard_of(s, nparts) for s in sha1s]
    docs2 = docs.append_column("norm_url", pa.array(norm_ids)) \
                .append_column("part", pa.array(parts, pa.int32()))
    for p in range(nparts):
        mask = pc.equal(docs2.column("part"), p)
        sub = docs2.filter(mask).sort_by("norm_url")
        pq.write_table(sub, os.path.join(tmp, "parts", f"part-{p:03d}.parquet"))
    pq.write_table(fix["robots"], os.path.join(tmp, "robots.parquet"))
    pq.write_table(fix["sitemaps"], os.path.join(tmp, "sitemaps.parquet"))
    pq.write_table(fix["seeds"], os.path.join(tmp, "seeds.parquet"))
    cfg = dict(fix["config"], num_parts=nparts)
    with open(os.path.join(tmp, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write("ok")
    import shutil
    if os.path.exists(done):            # concurrent writer won the race
        shutil.rmtree(tmp, ignore_errors=True)
        return out
    if os.path.exists(out):             # stale partial dir from a dead run
        shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out
