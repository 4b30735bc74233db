"""Crawl-engine queries exposed through the driver contract.

The crawl engine's input corpus is this repo's own deterministic fixture in
the BASELINE.json input_hint shape (the driver's ``documents`` table has a
different schema — FIXTURES.md §5 note). Each query here (a) ensures the
corpus for the requested scale exists on disk (idempotent, seeded), then
(b) runs a Ray Data pipeline over it. The matching oracle SQL strings run
DuckDB over the same parquet file via read_parquet('<path>'), so the driver
verifies Ray vs SQL on identical inputs.

Scale mapping: sf0.001 → t1 (~500 docs), sf0.01 → t2 (~18k), sf0.1 →
bench2 (~549k).
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..canonical import clean_url, norm_url
from ..corpus import corpus_dir, write_corpus
from ..stages.parse import make_edge_extractor, parse_documents_batch

TIER_BY_SF = {"sf0.001": "t1", "sf0.01": "t2", "sf0.1": "bench2"}
BASE_DOMAIN = "site.example"

# SQL twin of the engine's link-keep rule (parse_doc / extract_edges): a
# link span counts only when its href resolves to an http(s):// target —
# any explicit non-http(s) scheme (mailto:, TEL:, ftp:, data:, …) is
# dropped, case-insensitively (ADVICE r2: literal-prefix matching let
# uppercase/other schemes through).
LINK_KEEP_SQL = ("(NOT regexp_matches(trim(s.media_ref), "
                 "'^[A-Za-z][A-Za-z0-9+.-]*:') "
                 "OR lower(s.media_ref) LIKE 'http://%' "
                 "OR lower(s.media_ref) LIKE 'https://%')")


def tier_for(sf_dir: str) -> str:
    return TIER_BY_SF.get(os.path.basename(os.path.normpath(sf_dir)), "t1")


def ensure_corpus(sf_dir: str) -> str:
    return write_corpus(tier_for(sf_dir))


def corpus_parquet(sf_dir: str) -> str:
    """Glob over the multi-file documents dir — valid for both DuckDB
    read_parquet() and ray.data.read_parquet."""
    return os.path.join(corpus_dir(tier_for(sf_dir)),
                        "documents", "*.parquet")


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    path = os.path.join(ensure_corpus(sf_dir), "documents")
    return rd.read_parquet(path, columns=columns)


# ------------------------------------------------------------- parse query

def crawl_parse(sf_dir: str) -> pd.DataFrame:
    """Span parse surface: title / meta / h1 / word_count / link counts per
    doc — the M10 parse stage as a standalone streaming pipeline."""
    ds = _docs(sf_dir, ["doc_id", "spans"])
    out = (ds.map_batches(
               lambda b: parse_documents_batch(b, BASE_DOMAIN),
               batch_format="pyarrow")
           .select_columns(["doc_id", "title", "meta_description", "h1",
                            "word_count", "internal_links",
                            "external_links"])
           .to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def crawl_parse_sql(path: str) -> str:
    return f"""
SELECT doc_id,
  coalesce(list_filter(spans, s -> s.kind = 'title')[1].text, '')
      AS title,
  coalesce(list_filter(spans, s -> s.kind = 'meta_description')[1].text, '')
      AS meta_description,
  coalesce(list_filter(spans, s -> s.kind = 'h1')[1].text, '') AS h1,
  coalesce(list_sum(list_transform(
      list_filter(spans, s -> s.kind = 'text'),
      s -> len(regexp_extract_all(s.text, '\\w+')))), 0)::BIGINT
      AS word_count,
  coalesce(len(list_filter(spans, s -> s.kind LIKE 'link%' AND
      {LINK_KEEP_SQL} AND
      (CASE WHEN lower(s.media_ref) LIKE 'http://%'
                 OR lower(s.media_ref) LIKE 'https://%'
            THEN split_part(split_part(lower(s.media_ref), '://', 2),
                            '/', 1)
            WHEN s.media_ref LIKE '//%'
            THEN split_part(substr(lower(s.media_ref), 3), '/', 1)
            ELSE host END)
      IN ('site.example', 'www.site.example'))), 0)::BIGINT
      AS internal_links,
  coalesce(len(list_filter(spans, s -> s.kind LIKE 'link%' AND
      {LINK_KEEP_SQL} AND
      (CASE WHEN lower(s.media_ref) LIKE 'http://%'
                 OR lower(s.media_ref) LIKE 'https://%'
            THEN split_part(split_part(lower(s.media_ref), '://', 2),
                            '/', 1)
            WHEN s.media_ref LIKE '//%'
            THEN split_part(substr(lower(s.media_ref), 3), '/', 1)
            ELSE host END)
      NOT IN ('site.example', 'www.site.example'))), 0)::BIGINT
      AS external_links
FROM read_parquet('{path}')
ORDER BY doc_id
"""


# ------------------------------------------------------------- edge query

def _edge_sql_target(alias_media: str = "u.media_ref",
                     alias_host: str = "host") -> str:
    """SQL equivalent of clean_url for the corpus's href forms (absolute,
    protocol-relative, root-relative; strip fragments)."""
    return f"""
split_part(CASE WHEN {alias_media} LIKE 'http%' THEN {alias_media}
                WHEN {alias_media} LIKE '//%' THEN 'https:' || {alias_media}
                ELSE 'https://' || {alias_host} || {alias_media} END,
           '#', 1)"""


def crawl_edges(sf_dir: str) -> pd.DataFrame:
    """Edge extraction (M17/D2): one row per deduped (source, target)."""
    ds = _docs(sf_dir, ["doc_id", "spans"])
    extractor = make_edge_extractor(BASE_DOMAIN)
    out = (ds.map_batches(extractor, batch_format="pyarrow")
           .select_columns(["source_url", "target_url"])
           .to_pandas())
    return out.sort_values(["source_url", "target_url"]) \
              .reset_index(drop=True)


def crawl_edges_sql(path: str) -> str:
    return f"""
SELECT DISTINCT doc_id AS source_url,
       {_edge_sql_target()} AS target_url
FROM (SELECT doc_id, host,
             unnest(list_filter(spans, s -> s.kind LIKE 'link%' AND {LINK_KEEP_SQL})) AS u
      FROM read_parquet('{path}'))
ORDER BY source_url, target_url
"""


def crawl_inlinks(sf_dir: str) -> pd.DataFrame:
    """A8 inlink counts over extracted edges (groupby-count shuffle)."""
    ds = _docs(sf_dir, ["doc_id", "spans"])
    extractor = make_edge_extractor(BASE_DOMAIN)

    from .reports import bucketed_url_counts
    out = bucketed_url_counts(
        ds.map_batches(extractor, batch_format="pyarrow"),
        "target_url", "norm_target", count_col="inlinks").to_pandas()
    return out.sort_values("norm_target").reset_index(drop=True)


def crawl_inlinks_sql(path: str) -> str:
    # norm_url equivalent for the corpus's URL forms: lowercase, strip
    # fragment, strip trailing slash except a bare root (re-append '/')
    norm = """
CASE WHEN strpos(split_part(rtrim(lower(tgt), '/'), '://', 2), '/') = 0
     THEN rtrim(lower(tgt), '/') || '/'
     ELSE rtrim(lower(tgt), '/') END"""
    return f"""
WITH edges AS (
  SELECT doc_id, {_edge_sql_target()} AS tgt,
         row_number() OVER (PARTITION BY doc_id, {_edge_sql_target()}) AS rn
  FROM (SELECT doc_id, host,
               unnest(list_filter(spans, s -> s.kind LIKE 'link%' AND {LINK_KEEP_SQL})) AS u
        FROM read_parquet('{path}')))
SELECT {norm} AS norm_target, count(*) AS inlinks
FROM edges WHERE rn = 1
GROUP BY 1 ORDER BY 1
"""


def crawl_analytics(sf_dir: str) -> pd.DataFrame:
    """M15 analytics battery per doc: GA4/GTM ids + detector flags
    (seo_extractor.py:151-190)."""
    ds = _docs(sf_dir, ["doc_id", "spans"])
    cols = ["doc_id", "analytics_ga4_id", "analytics_gtm_id",
            "analytics_google", "analytics_facebook_pixel",
            "analytics_hotjar", "analytics_mixpanel"]
    out = (ds.map_batches(
               lambda b: parse_documents_batch(b, BASE_DOMAIN),
               batch_format="pyarrow")
           .select_columns(cols).to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def crawl_analytics_sql(path: str) -> str:
    def flag(pat: str) -> str:
        return (f"len(list_filter(spans, s -> s.kind = 'text' AND "
                f"regexp_matches(s.text, '{pat}', 'i'))) > 0")

    def first(pat: str) -> str:
        return (f"coalesce(list_filter(list_transform("
                f"list_filter(spans, s -> s.kind = 'text'), "
                f"s -> regexp_extract(s.text, '{pat}')), "
                f"x -> x <> '')[1], '')")

    ga4 = first("\\bG-[A-Z0-9]{10}\\b")
    gtm = first("\\bGTM-[A-Z0-9]+\\b")
    ga_any = flag("gtag\\(|ga\\(|GoogleAnalyticsObject|"
                  "google-analytics\\.com|googletagmanager\\.com")
    fbq = flag("fbq\\(|facebook\\.com/tr")
    hotjar = flag("hotjar\\.com|hj\\(")
    mixpanel = flag("mixpanel\\.com|mixpanel\\.track")
    return f"""
SELECT doc_id,
       {ga4} AS analytics_ga4_id,
       {gtm} AS analytics_gtm_id,
       ({ga_any} OR {ga4} <> '') AS analytics_google,
       {fbq} AS analytics_facebook_pixel,
       {hotjar} AS analytics_hotjar,
       {mixpanel} AS analytics_mixpanel
FROM read_parquet('{path}')
ORDER BY doc_id
"""


def crawl_jsdiff(sf_dir: str) -> pd.DataFrame:
    """S4 JS-diff detector over the corpus variant columns: requires_js per
    doc (reference crawler.py:1142-1188 raw-vs-rendered hash + >10% growth
    rule), plus the summary-friendly rendered flag."""
    from ..stages.fetch import requires_js as _rjs
    ds = _docs(sf_dir, ["doc_id", "size", "raw_content_hash",
                        "rendered_content_hash", "rendered_size"])

    def detect(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        return pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "requires_js": pa.array([_rjs(r) for r in rows], pa.bool_())})

    out = ds.map_batches(detect, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def crawl_jsdiff_sql(path: str) -> str:
    return f"""
SELECT doc_id,
  CASE WHEN rendered_content_hash IS NULL THEN FALSE
       WHEN rendered_content_hash = raw_content_hash THEN FALSE
       WHEN size = 0 THEN TRUE
       ELSE rendered_size / size > 1.1 END AS requires_js
FROM read_parquet('{path}')
ORDER BY doc_id
"""


def crawl_status_counts(sf_dir: str) -> pd.DataFrame:
    ds = _docs(sf_dir, ["status_code"])
    out = (ds.groupby("status_code").aggregate(Count(alias_name="n_docs"))
           .to_pandas())
    return out.sort_values("status_code").reset_index(drop=True)


def crawl_status_counts_sql(path: str) -> str:
    return (f"SELECT status_code, count(*) AS n_docs FROM "
            f"read_parquet('{path}') GROUP BY status_code "
            f"ORDER BY status_code")


def crawl_host_sizes(sf_dir: str) -> pd.DataFrame:
    """Per-host doc count + byte volume (politeness-planning aggregate)."""
    from .reports import bucketed_agg

    ds = _docs(sf_dir, ["host", "size"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("host", as_index=False).agg(
            n_docs=("size", "size"), bytes=("size", "sum"))

    out = bucketed_agg(
        ds.map_batches(partial, batch_format="pandas"),
        "host", {"n_docs": ("n_docs", "sum"),
                 "bytes": ("bytes", "sum")}).to_pandas()
    return out.sort_values("host").reset_index(drop=True)


def crawl_host_sizes_sql(path: str) -> str:
    return (f"SELECT host, count(*) AS n_docs, sum(size)::BIGINT AS bytes "
            f"FROM read_parquet('{path}') GROUP BY host ORDER BY host")


def crawl_trap_signatures(sf_dir: str, min_urls: int = 2) -> pd.DataFrame:
    """Trap-signature frequency report (T4's observable face): collapse
    every corpus URL to its trap signature (host + path with digit runs
    and UUIDs collapsed — canonical.url_signature) and count URLs per
    signature. The signatures crossing the engine's trap threshold are
    exactly the ones the gate starts rejecting; this query is the audit
    view an operator reads to see WHICH url families tripped it.

    Shape: per-batch signature Counter partials → bucketed sum (the
    shuffle ships (signature, count), never URLs)."""
    from ..canonical import url_signature
    from .reports import bucketed_agg

    ds = _docs(sf_dir, ["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        c = Counter(url_signature(u)
                    for u in batch.column("doc_id").to_pylist())
        return pa.table({
            "signature": pa.array(list(c.keys()), pa.string()),
            "n_urls": pa.array(list(c.values()), pa.int64())})

    out = bucketed_agg(ds.map_batches(partial, batch_format="pyarrow"),
                       "signature",
                       {"n_urls": ("n_urls", "sum")}).to_pandas()
    out = out[out["n_urls"] >= min_urls]
    return out.sort_values("signature").reset_index(drop=True)


def crawl_trap_signatures_sql(path: str, min_urls: int = 2) -> str:
    """DuckDB twin of url_signature: netloc lowercased + www-stripped,
    path query/fragment-free, UUIDs then digit runs collapsed to the
    same literal replacement tokens."""
    return f"""
WITH parts AS (
  SELECT split_part(doc_id, '//', 2) AS rest FROM read_parquet('{path}')
),
split AS (
  SELECT lower(split_part(rest, '/', 1)) AS netloc,
         CASE WHEN strpos(rest, '/') = 0 THEN ''
              ELSE split_part(split_part(
                     substr(rest, strpos(rest, '/')), '?', 1), '#', 1)
         END AS path
  FROM parts
),
sigs AS (
  SELECT (CASE WHEN netloc LIKE 'www.%' THEN substr(netloc, 5)
               ELSE netloc END) ||
         regexp_replace(regexp_replace(path,
             '[0-9a-fA-F]{{8}}-[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{4}}-[0-9a-fA-F]{{12}}',
             '\\\\uuid', 'g'), '\\d+', '\\\\d+', 'g') AS signature
  FROM split
)
SELECT signature, COUNT(*)::BIGINT AS n_urls
FROM sigs GROUP BY signature HAVING COUNT(*) >= {min_urls}
ORDER BY signature
"""


def _section_of(url: str) -> str:
    """host/first-path-segment node key (query-stripped), mirroring the
    SQL split_part chain exactly: '' segment for the root."""
    rest = url.split("//", 1)[1] if "//" in url else url
    parts = rest.split("/")
    host = parts[0].lower()
    seg = (parts[1] if len(parts) > 1 else "").split("?", 1)[0]
    return host + "/" + seg


def crawl_section_components(sf_dir: str,
                             distributed: bool = False) -> pd.DataFrame:
    """Site-structure clustering: weakly-connected components over the
    SECTION-contracted link graph (section = host + first path segment —
    the granularity SEO audits reason about; the reference's viz graph
    is the per-URL uncontracted version of the same structure).

    Scale shape: the URL-level edge set is corpus-sized, but the
    contraction happens inside ``map_batches`` (each batch emits its
    DISTINCT section pairs only), so what reaches the driver is bounded
    by #sections² — metadata-sized for any real site (sections are
    path taxonomy, not pages). Two identical-output labeling paths:
    union-find over that tiny graph on the driver (default — a host
    taxonomy never needs more), or ``distributed=True``: iterative
    min-label propagation with pointer jumping over bucketed shuffles
    (``functions.graph.connected_components_ds``) with the node set
    broadcast once for the edge semijoin — the shape that holds if the
    node universe were pages instead of sections.

    Output: (section, component, n_sections), component = min section
    key in the cluster (deterministic label).
    """
    ds = _docs(sf_dir, ["doc_id", "spans"])
    extractor = make_edge_extractor(BASE_DOMAIN)

    def pair_partial(batch: pa.Table) -> pa.Table:
        edges = extractor(batch)
        pairs = set()
        for s, t in zip(edges.column("source_url").to_pylist(),
                        edges.column("target_url").to_pylist()):
            a, b = _section_of(s), _section_of(t)
            if a != b:
                pairs.add((a, b))
        aa, bb = zip(*sorted(pairs)) if pairs else ((), ())
        return pa.table({"src": pa.array(list(aa), pa.string()),
                         "dst": pa.array(list(bb), pa.string())})

    def node_partial(batch: pa.Table) -> pa.Table:
        secs = sorted({_section_of(u)
                       for u in batch.column("doc_id").to_pylist()})
        return pa.table({"section": pa.array(secs, pa.string())})

    pair_ds = ds.map_batches(pair_partial, batch_format="pyarrow")
    nodes = sorted(set(ds.map_batches(
        node_partial, batch_format="pyarrow").to_pandas()["section"]))
    node_set = set(nodes)

    if distributed:
        from ..functions.graph import connected_components_ds
        nodes_ref = ray.put(node_set)

        def in_scope(batch: pa.Table) -> pa.Table:
            ns = ray.get(nodes_ref)
            keep = [s in ns and d in ns for s, d in
                    zip(batch.column("src").to_pylist(),
                        batch.column("dst").to_pylist())]
            return batch.filter(pa.array(keep, pa.bool_()))

        lab = connected_components_ds(
            pair_ds.map_batches(in_scope, batch_format="pyarrow")
        ).to_pandas()
        comp = dict(zip(lab["node"], lab["component"]))
        comp = {n: comp.get(n, n) for n in nodes}   # singleton sections
        sizes: dict = {}
        for c in comp.values():
            sizes[c] = sizes.get(c, 0) + 1
        out = pd.DataFrame({
            "section": nodes,
            "component": [comp[n] for n in nodes],
            "n_sections": [sizes[comp[n]] for n in nodes]})
        return out.sort_values("section").reset_index(drop=True)

    pair_df = pair_ds.to_pandas().drop_duplicates()

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pair_df["src"], pair_df["dst"]):
        if a in node_set and b in node_set:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    comp = {n: find(n) for n in nodes}
    sizes: dict = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    out = pd.DataFrame({
        "section": nodes,
        "component": [comp[n] for n in nodes],
        "n_sections": [sizes[comp[n]] for n in nodes]})
    return out.sort_values("section").reset_index(drop=True)


def crawl_section_components_sql(path: str) -> str:
    """Recursive-CTE twin: min-label reachability over the contracted
    section graph (tiny, so the closure is cheap in DuckDB)."""
    sec_src = ("lower(split_part(split_part(doc_id, '//', 2), '/', 1)) "
               "|| '/' || split_part(split_part(split_part(doc_id, "
               "'//', 2), '/', 2), '?', 1)")
    tgt = _edge_sql_target()
    sec_dst = (f"lower(split_part(split_part({tgt}, '//', 2), '/', 1)) "
               f"|| '/' || split_part(split_part(split_part({tgt}, "
               f"'//', 2), '/', 2), '?', 1)")
    return f"""
WITH RECURSIVE
nodes AS MATERIALIZED (SELECT DISTINCT {sec_src} AS section
          FROM read_parquet('{path}')),
raw AS MATERIALIZED (SELECT DISTINCT {sec_src} AS src, {sec_dst} AS dst
        FROM (SELECT doc_id, host,
                     unnest(list_filter(spans,
                        s -> s.kind LIKE 'link%' AND {LINK_KEEP_SQL})) AS u
              FROM read_parquet('{path}'))),
uedges AS MATERIALIZED (
  SELECT src, dst FROM raw
  WHERE src <> dst AND dst IN (SELECT section FROM nodes)
  UNION
  SELECT dst, src FROM raw
  WHERE src <> dst AND dst IN (SELECT section FROM nodes)
),
reach(a, b) AS (
  SELECT section, section FROM nodes
  UNION
  SELECT r.a, e.dst FROM reach r JOIN uedges e ON e.src = r.b
),
comp AS (SELECT a AS section, MIN(b) AS component FROM reach GROUP BY a),
sizes AS (SELECT component, COUNT(*)::BIGINT AS n_sections
          FROM comp GROUP BY component)
SELECT comp.section, comp.component, sizes.n_sections
FROM comp JOIN sizes USING (component)
ORDER BY comp.section
"""


# ------------------------------------------------- full crawl (rows-only)

def full_crawl_pages(sf_dir: str, out_root: str = "/tmp/graft_crawl") -> \
        pd.DataFrame:
    """Run the complete wave engine on the corpus; returns crawl order
    (url, depth, seq, wave, status_code). Not SQL-expressible (stateful BFS
    + sharded dedup + trap gating) → rows-only driver check; full
    conformance lives in pytest vs the sequential oracle."""
    import json

    from ..engine.crawl import WaveCrawler
    from ..policy import CrawlConfig

    cdir = ensure_corpus(sf_dir)
    with open(os.path.join(cdir, "config.json")) as f:
        cfg = CrawlConfig.from_fixture(json.load(f), BASE_DOMAIN)
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    final = os.path.join(out_dir, "lineage", "wave-final.json")
    complete = False
    if os.path.exists(final):
        with open(final) as f:
            complete = json.load(f).get("corpus_dir") == cdir
    if not complete:
        eng = WaveCrawler(cdir, out_dir, cfg, fetch_concurrency=4)
        eng.run(["https://site.example/"])
    from . import reports
    pages = reports.load_pages(
        out_dir, columns=["url", "depth", "seq", "wave", "status_code"])
    return pages.to_pandas().sort_values("seq").reset_index(drop=True)


# ------------------------------------------------- issue-layer (I*) queries

_SQL_ISSUE_NAMES = ("Missing OpenGraph Tags", "Missing Viewport Meta Tag",
                    "Thin Content",
                    "Links: Internal Outlinks With No Anchor Text",
                    "Links: Internal Nofollow Outlinks")


def crawl_issue_counts(sf_dir: str) -> pd.DataFrame:
    """Issue counts for the SQL-expressible per-page rules, computed by the
    REAL issue detector over the parsed corpus (the others are covered by
    pytest goldens; this query pins the shared slice to a DuckDB oracle)."""
    from ..stages.issues import is_excluded, page_issues

    ds = _docs(sf_dir, ["doc_id", "spans", "status_code", "size",
                        "response_time_ms", "x_robots_tag"])

    def detect(batch: pa.Table) -> pa.Table:
        out: dict[str, int] = {}
        parsed = parse_documents_batch(
            batch.select(["doc_id", "spans"]), BASE_DOMAIN).to_pylist()
        metas = batch.select(["status_code", "size", "response_time_ms",
                              "x_robots_tag"]).to_pylist()
        for p, m in zip(parsed, metas):
            url = p["doc_id"]
            if is_excluded(url):
                continue
            row = {**p, "url": url, "status_code": m["status_code"],
                   "size": m["size"],
                   "response_time": m["response_time_ms"],
                   "x_robots_tag": m["x_robots_tag"],
                   "is_internal": True, "redirect_count": 0,
                   "has_redirect_loop": False}
            for iss in page_issues(row, BASE_DOMAIN):
                if iss["issue"] in _SQL_ISSUE_NAMES:
                    out[iss["issue"]] = out.get(iss["issue"], 0) + 1
        return pa.table({
            "issue": pa.array(list(out.keys()), pa.string()),
            "n": pa.array(list(out.values()), pa.int64())})

    from ray.data.aggregate import Sum
    agg = (ds.map_batches(detect, batch_format="pyarrow")
           .groupby("issue").aggregate(Sum("n", alias_name="n_pages"))
           .to_pandas())
    return agg.sort_values("issue").reset_index(drop=True)


def crawl_issue_counts_sql(path: str) -> str:
    wc = ("coalesce(list_sum(list_transform(list_filter(spans, "
          "s -> s.kind = 'text'), "
          "s -> len(regexp_extract_all(s.text, '\\w+')))), 0)")
    return f"""
WITH base AS (
  SELECT doc_id, host, spans, status_code, {wc} AS wc
  FROM read_parquet('{path}')
  WHERE status_code < 400
    -- M22 exclusion families that fire on this corpus (parity asserted in
    -- tests/test_reports.py::test_exclusion_sql_parity)
    AND doc_id NOT LIKE '%.txt' AND doc_id NOT LIKE '%.xml'
    AND doc_id NOT LIKE 'https://site.example/login%'
    AND doc_id NOT LIKE 'https://site.example/private/%'
    AND doc_id NOT LIKE 'https://site.example/search%'),
kept_links AS (
  SELECT doc_id, anchor, kind, tgt FROM (
    SELECT doc_id, {_edge_sql_target()} AS tgt, u.text AS anchor,
           u.kind AS kind,
           row_number() OVER (PARTITION BY doc_id, {_edge_sql_target()}
                              ORDER BY u."offset") AS rn
    FROM (SELECT doc_id, host,
                 unnest(list_filter(spans, s -> s.kind LIKE 'link%' AND
                     {LINK_KEEP_SQL})) AS u
          FROM base))
  WHERE rn = 1)
SELECT issue, n_pages FROM (
  SELECT 'Missing OpenGraph Tags' AS issue, count(*) AS n_pages
  FROM base WHERE len(list_filter(spans, s -> s.kind = 'og')) = 0
  UNION ALL
  SELECT 'Missing Viewport Meta Tag', count(*)
  FROM base WHERE len(list_filter(spans,
      s -> s.kind = 'meta' AND s.text LIKE 'viewport=%')) = 0
  UNION ALL
  SELECT 'Thin Content', count(*)
  FROM base WHERE wc > 0 AND wc < 300
  UNION ALL
  SELECT 'Links: Internal Outlinks With No Anchor Text',
         count(DISTINCT doc_id)
  FROM kept_links WHERE trim(anchor) = ''
  UNION ALL
  SELECT 'Links: Internal Nofollow Outlinks', count(DISTINCT doc_id)
  FROM kept_links
  WHERE kind LIKE '%|nofollow%'
    AND (split_part(split_part(tgt, '://', 2), '/', 1)
           IN ('site.example', 'www.site.example')
         OR split_part(split_part(tgt, '://', 2), '/', 1)
           LIKE '%.site.example'))
ORDER BY issue
"""


def crawl_neardup(sf_dir: str, sample: int = 1200) -> pd.DataFrame:
    """D3 near-duplicate pairs over the parsed corpus (blocked mode) —
    rows-only driver check; blocked==exact equality covered in pytest.
    Deterministic sample (lexicographically first ``sample`` doc_ids) keeps
    the gate bounded on template-heavy corpora where the reference's 0.85
    metric legitimately matches huge page families."""
    from ..stages.neardup import near_duplicate_pairs

    # cutoff-id selection instead of sort().limit(): sorting would range-
    # shuffle the full spans payload just to keep the first ``sample``
    # rows. Prune the id column per batch to its smallest ``sample`` ids,
    # sort only the pruned stream, and filter the full table by the
    # resulting cutoff — the spans column never moves.
    import pyarrow.compute as _pc

    def _prune_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows > sample:
            idx = _pc.sort_indices(batch, sort_keys=[("doc_id",
                                                      "ascending")])
            batch = batch.take(idx[:sample])
        return batch

    sampled_ids = _docs(sf_dir, ["doc_id"]) \
        .map_batches(_prune_ids, batch_format="pyarrow") \
        .sort("doc_id").limit(sample).to_pandas()["doc_id"]
    cutoff = sampled_ids.max()
    ds = _docs(sf_dir, ["doc_id", "spans"]) \
        .filter(expr=f"doc_id <= {cutoff!r}")
    parsed = ds.map_batches(
        lambda b: parse_documents_batch(b, BASE_DOMAIN),
        batch_format="pyarrow").map_batches(
        lambda b: b.select(["doc_id", "title", "meta_description", "h1",
                            "word_count"]).rename_columns(
            ["url", "title", "meta_description", "h1", "word_count"]),
        batch_format="pyarrow")
    return near_duplicate_pairs(parsed).to_pandas()


def crawl_pagerank(sf_dir: str, out_root: str = "/tmp/graft_crawl") -> \
        pd.DataFrame:
    """PageRank-lite over the crawl output's link graph — top 50 by rank.
    SQL twin unrolls the damped power iteration as a CTE chain
    (``crawl_pagerank_sql``); pytest additionally verifies against an
    independent power-iteration reference."""
    full_crawl_pages(sf_dir, out_root)   # no-op if lineage says complete
    from . import reports
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(out_dir, columns=["url"])
    links = reports.load_links(out_dir)
    pr = reports.pagerank_lite(pages, links).to_pandas()
    return (pr.sort_values(["rank", "url"], ascending=[False, True])
            .head(50).reset_index(drop=True))


def crawl_pagerank_sql(out_dir: str, iterations: int = 5,
                       damping: float = 0.85) -> str:
    """DuckDB twin of ``crawl_pagerank``: the damped power iteration
    unrolled as a CTE chain over the crawl's own pages/links parquet
    (side-table oracle pattern, like the simhash sketches — the crawl
    itself is pinned by the conformance suite; this verifies the PageRank
    transform end-to-end in SQL). Matches pagerank_lite exactly: internal
    edges, normalized + deduped, both endpoints semi-joined to crawled
    nodes, dangling mass redistributed, ranks rounded to 10 dp, top 50 by
    (rank desc, url). Iteration CTEs are MATERIALIZED — each __r{k} is
    referenced twice (dangling mass + contributions), and DuckDB's
    default inlining re-evaluates the whole chain per reference
    (measured 126 s → ~2 s at t2 scale)."""
    pages_glob = os.path.join(out_dir, "pages", "*", "*.parquet")
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")

    def norm(col: str) -> str:
        return (f"CASE WHEN strpos(split_part(rtrim(lower({col}), '/'), "
                f"'://', 2), '/') = 0 "
                f"THEN rtrim(lower({col}), '/') || '/' "
                f"ELSE rtrim(lower({col}), '/') END")

    parts = [f"""
__p AS (SELECT url FROM read_parquet('{pages_glob}')),
__nodes AS MATERIALIZED (SELECT DISTINCT {norm('url')} AS n FROM __p),
__nn AS (SELECT count(*)::DOUBLE AS cnt FROM __nodes),
__e0 AS MATERIALIZED (SELECT DISTINCT {norm('source_url')} AS src,
                {norm('target_url')} AS dst
         FROM read_parquet('{links_glob}') WHERE is_internal),
__edges AS MATERIALIZED (SELECT e.src, e.dst FROM __e0 e
            JOIN __nodes a ON e.src = a.n
            JOIN __nodes b ON e.dst = b.n),
__outdeg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS d FROM __edges GROUP BY src),
__r0 AS MATERIALIZED (SELECT n, 1.0 / (SELECT cnt FROM __nn) AS rank
         FROM __nodes)"""]
    prev = "__r0"
    for k in range(1, iterations + 1):
        parts.append(f""",
__d{k} AS (SELECT coalesce(sum(r.rank), 0.0) AS mass FROM {prev} r
           WHERE r.n NOT IN (SELECT src FROM __outdeg)),
__s{k} AS (SELECT e.dst AS n, sum(r.rank / o.d) AS contrib
           FROM __edges e JOIN {prev} r ON e.src = r.n
           JOIN __outdeg o ON e.src = o.src GROUP BY e.dst),
__r{k} AS MATERIALIZED (SELECT nd.n,
                  (1.0 - {damping}) / (SELECT cnt FROM __nn)
                + {damping} * (SELECT mass FROM __d{k})
                      / (SELECT cnt FROM __nn)
                + {damping} * coalesce(s.contrib, 0.0) AS rank
           FROM __nodes nd LEFT JOIN __s{k} s USING (n))""")
        prev = f"__r{k}"
    parts.append(f"""
SELECT p.url, round(r.rank, 10) AS rank
FROM (SELECT DISTINCT url, {norm('url')} AS n FROM __p) p
JOIN {prev} r USING (n)
ORDER BY rank DESC, url LIMIT 50""")
    return "WITH " + "".join(parts)


def crawl_recrawl_priority(sf_dir: str,
                           out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """Recrawl-priority scoring — the north rule's "priority queue
    ordered by depth/PageRank-lite score" as a report: priority =
    rank/(1+depth), rewarding authoritative shallow pages; top 50 by
    (priority desc, url). The fetch order itself stays (depth, seq)
    BFS-equivalent (conformance contract); this is the scheduler input
    a continuous crawler would feed its next-cycle frontier.

    Shape: pagerank_lite's rank vector (one float per crawled page,
    driver-resident at sandbox scale, Dataset-resident at 10^10 via
    pagerank_distributed) merged with the page depth column; the merge
    is node-sized — the same order of driver state the rank vector
    already is; at 10^10 it becomes one bucketed hash join."""
    full_crawl_pages(sf_dir, out_root)
    from . import reports
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(out_dir, columns=["url", "depth"])
    links = reports.load_links(out_dir)
    pr = reports.pagerank_lite(
        pages.select_columns(["url"]), links).to_pandas()
    m = pr.merge(pages.to_pandas(), on="url", how="inner")
    m["depth"] = m["depth"].astype("int64")
    m["priority"] = (m["rank"] / (1 + m["depth"])).map(
        lambda x: math.floor(x * 1e10 + 0.5) / 1e10)
    return (m[["url", "depth", "rank", "priority"]]
            .sort_values(["priority", "url"], ascending=[False, True])
            .head(50).reset_index(drop=True))


def crawl_recrawl_priority_sql(out_dir: str, iterations: int = 5,
                               damping: float = 0.85) -> str:
    """DuckDB twin of ``crawl_recrawl_priority``: the pagerank CTE chain
    with a priority tail — both sides divide the 10-dp-rounded rank by
    (1+depth) and half-away-round to 10 dp."""
    base = crawl_pagerank_sql(out_dir, iterations, damping)
    chain, _tail = base.rsplit("\nSELECT p.url, round(r.rank, 10)", 1)
    prev = f"__r{iterations}"
    pages_glob = os.path.join(out_dir, "pages", "*", "*.parquet")
    norm = ("CASE WHEN strpos(split_part(rtrim(lower(url), '/'), "
            "'://', 2), '/') = 0 "
            "THEN rtrim(lower(url), '/') || '/' "
            "ELSE rtrim(lower(url), '/') END")
    return f"""{chain}
SELECT p.url, p.depth::BIGINT AS depth, round(r.rank, 10) AS rank,
       round(round(r.rank, 10) / (1 + p.depth), 10) AS priority
FROM (SELECT DISTINCT url, depth, {norm} AS n
      FROM read_parquet('{pages_glob}')) p
JOIN {prev} r USING (n)
ORDER BY priority DESC, url LIMIT 50"""


def crawl_span_kinds(sf_dir: str) -> pd.DataFrame:
    """Per-host span-kind histogram over the interleaved text+media
    payload (host, kind, n_spans, total_text_chars): the corpus-shape
    profiling pass a mixed-media pipeline runs before sizing its decode /
    parse stages. Zero-copy shape: each batch reads the spans child
    arrays directly (no list<struct> → python dicts), reduces itself to
    a (host, kind) Counter partial, and the partials sum through one
    small groupby — spans never leave their block."""
    from collections import Counter

    import pyarrow as pa

    ds = _docs(sf_dir, ["host", "spans"])

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column("spans")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.values
        kinds = vals.field("kind").to_pylist()
        # chars of each span's text, vectorized
        import pyarrow.compute as pc
        chars = pc.utf8_length(vals.field("text")).to_pylist()
        offs = col.offsets.to_numpy()
        hosts = batch.column("host").to_pylist()
        n_c: Counter = Counter()
        ch_c: Counter = Counter()
        for j, h in enumerate(hosts):
            for i in range(int(offs[j]), int(offs[j + 1])):
                k = (h, kinds[i])
                n_c[k] += 1
                ch_c[k] += chars[i]
        keys = list(n_c.keys())
        return pa.table({
            "host": pa.array([k[0] for k in keys], pa.string()),
            "kind": pa.array([k[1] for k in keys], pa.string()),
            "n_spans": pa.array([n_c[k] for k in keys], pa.int64()),
            "total_text_chars": pa.array([ch_c[k] for k in keys],
                                         pa.int64()),
        })

    out = (_sum_host_kind_partials(ds.map_batches(partial, batch_format="pyarrow"))
           .to_pandas())
    return out.sort_values(["host", "kind"]).reset_index(drop=True)


def _sum_host_kind_partials(ds):
    """Sum partials per (host, kind): Ray Data groupby is single-key, so
    the composite key packs into one string for the (small) reduce."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def pack(batch: pa.Table) -> pa.Table:
        keys = [h + "\x1f" + k
                for h, k in zip(batch.column("host").to_pylist(),
                                batch.column("kind").to_pylist())]
        return pa.table({
            "__hk": pa.array(keys, pa.string()),
            "n_spans": batch.column("n_spans"),
            "total_text_chars": batch.column("total_text_chars")})

    def unpack(batch: pa.Table) -> pa.Table:
        hk = [s.split("\x1f") for s in batch.column("__hk").to_pylist()]
        return pa.table({
            "host": pa.array([x[0] for x in hk], pa.string()),
            "kind": pa.array([x[1] for x in hk], pa.string()),
            "n_spans": batch.column("sum(n_spans)"),
            "total_text_chars": batch.column("sum(total_text_chars)")})

    return (ds.map_batches(pack, batch_format="pyarrow")
            .groupby("__hk")
            .aggregate(Sum("n_spans"), Sum("total_text_chars"))
            .map_batches(unpack, batch_format="pyarrow"))


def crawl_span_kinds_sql(path: str) -> str:
    return f"""
SELECT host, s.kind AS kind, count(*) AS n_spans,
       sum(length(s.text))::BIGINT AS total_text_chars
FROM (SELECT host, unnest(spans) AS s FROM read_parquet('{path}'))
GROUP BY host, s.kind ORDER BY host, kind"""


def crawl_anchor_texts(sf_dir: str, k: int = 3,
                       out_root: str = "/tmp/graft_crawl") -> pd.DataFrame:
    """Top-``k`` anchor texts per internal link target over the crawl
    output (the reference UI's per-URL inlink anchor view, as a
    corpus-scale aggregate): (target_url, rank, anchor_text, n_links).
    Two-stage shuffle-lean shape: per-batch (target, anchor) Counter
    partials, then one bucketed reduce that sums counts and rank-trims
    per target — raw link rows never cross the shuffle twice."""
    from collections import Counter

    import pyarrow as pa

    from . import reports
    from .reports import bucketed_groups

    full_crawl_pages(sf_dir, out_root)   # no-op if lineage says complete
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    links = reports.load_links(out_dir)

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(batch.column("is_internal"))
        c = Counter(zip(b.column("target_url").to_pylist(),
                        b.column("anchor_text").to_pylist()))
        keys = list(c.keys())
        return pa.table({
            "target_url": pa.array([t for t, _ in keys], pa.string()),
            "anchor_text": pa.array([a for _, a in keys], pa.string()),
            "n_links": pa.array([c[x] for x in keys], pa.int64())})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        agg = (df.groupby(["target_url", "anchor_text"], sort=False)
               ["n_links"].sum().reset_index())
        agg = agg.sort_values(["target_url", "n_links", "anchor_text"],
                              ascending=[True, False, True])
        out = agg.groupby("target_url", sort=False).head(k).copy()
        out["rank"] = out.groupby("target_url", sort=False) \
            .cumcount().astype("int64") + 1
        return out[["target_url", "rank", "anchor_text", "n_links"]]

    res = bucketed_groups(
        links.select_columns(["target_url", "anchor_text",
                              "is_internal"])
        .map_batches(partial, batch_format="pyarrow"),
        "target_url", per_bucket).to_pandas()
    return (res.sort_values(["target_url", "rank"])
            .reset_index(drop=True))


def crawl_anchor_texts_sql(out_dir: str, k: int = 3) -> str:
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")
    return f"""
SELECT target_url, rank, anchor_text, n_links FROM (
  SELECT target_url, anchor_text, count(*) AS n_links,
         row_number() OVER (PARTITION BY target_url
                            ORDER BY count(*) DESC, anchor_text) AS rank
  FROM read_parquet('{links_glob}') WHERE is_internal
  GROUP BY target_url, anchor_text)
WHERE rank <= {k} ORDER BY target_url, rank"""


def crawl_slow_hosts(sf_dir: str, q: float = 0.95,
                     out_root: str = "/tmp/graft_crawl") -> pd.DataFrame:
    """Per-host p95 response time + count of pages above it over the crawl
    output — the latency-outlier report a recrawl scheduler consumes.

    Exact quantile without a per-host sort: per-batch (host, rt) Counter
    partials compress each block to its distinct timings, the shuffle
    ships (host, rt, count) histogram rows, and one walk per host reads
    the quantile off the cumulative histogram (quantile_disc semantics:
    sorted value at index max(ceil(q·n)−1, 0) — same convention as
    functions/stats.length_quantiles). At 100 TB the timing column
    quantizes to ms buckets, keeping the histogram bounded per host."""
    from collections import Counter
    import math

    from ..canonical import url_host
    from . import reports

    full_crawl_pages(sf_dir, out_root)     # no-op if lineage complete
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(out_dir, columns=["url", "response_time"])

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter(zip((url_host(u).lower()
                         for u in batch.column("url").to_pylist()),
                        batch.column("response_time").to_pylist()))
        hs, rs, ns = [], [], []
        for (h, r), n in c.items():
            hs.append(h)
            rs.append(float(r))
            ns.append(n)
        return pa.table({"host": pa.array(hs, pa.string()),
                         "rt": pa.array(rs, pa.float64()),
                         "cnt": pa.array(ns, pa.int64())})

    from .reports import bucketed_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # bucket holds ALL histogram rows of its hosts → the quantile
        # walk is global-per-host but runs distributed (the old version
        # walked every host in one driver loop)
        g = df.groupby(["host", "rt"], as_index=False)["cnt"].sum()
        rows = []
        for h, sub in g.groupby("host", sort=False):
            sub = sub.sort_values("rt")
            cum = sub["cnt"].cumsum().to_numpy()
            n = int(cum[-1])
            idx = max(math.ceil(q * n) - 1, 0)
            pos = int((cum <= idx).sum())
            p95 = float(sub["rt"].iloc[pos])
            over = int(sub.loc[sub["rt"] > p95, "cnt"].sum())
            rows.append((h, n, round(p95, 3), over))
        return pd.DataFrame(rows, columns=["host", "n_pages",
                                           "p95_response_time",
                                           "n_over_p95"])

    out = bucketed_groups(
        pages.map_batches(partial, batch_format="pyarrow"),
        "host", per_bucket).to_pandas()
    return out.sort_values("host").reset_index(drop=True)


def crawl_slow_hosts_sql(out_dir: str, q: float = 0.95) -> str:
    glob_ = os.path.join(out_dir, "pages", "wave=*", "*.parquet")
    return f"""
WITH p AS (
  SELECT lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS host,
         response_time AS rt
  FROM read_parquet('{glob_}')
),
qt AS (
  SELECT host, count(*)::BIGINT AS n_pages,
         quantile_disc(rt, {q}) AS p95
  FROM p GROUP BY host
)
SELECT qt.host, qt.n_pages,
       ROUND(qt.p95, 3) AS p95_response_time,
       SUM(CASE WHEN p.rt > qt.p95 THEN 1 ELSE 0 END)::BIGINT AS n_over_p95
FROM p JOIN qt USING (host)
GROUP BY qt.host, qt.n_pages, qt.p95
ORDER BY qt.host
"""


def crawl_boilerplate(sf_dir: str, min_pages: int = 5) -> pd.DataFrame:
    """Cross-page boilerplate-span removal — the RefinedWeb/CCNet
    line-dedup step expressed over the interleaved text+media payload: a
    span TEXT that occurs on >= ``min_pages`` DISTINCT pages is template
    boilerplate (nav labels, footer strings, repeated meta values); per
    page, emit the de-boilerplated reading text plus removal counts
    (doc_id, n_spans, n_boiler, clean_text).

    Scale shape (100 TB): pass 1 ships only (fp63(text), n_pages)
    Counter partials through the bucketed int shuffle — each page is one
    row, so a per-row set() yields exact distinct-page counts with no
    extra distinct pass, and raw span texts never cross the wire. The
    surviving boilerplate fingerprint set is bounded above by
    total_spans / min_pages and broadcasts once via ``ray.put``; at
    10^10 pages swap the broadcast for a fp-bucketed anti-join (the
    same trade documented at functions/dedup.incremental_dedup). Pass 2
    is stateless per batch: drop countable spans whose fingerprint is in
    the set, join the kept texts in span order.

    Fingerprints are 63-bit md5 prefixes (collision P ~ n^2/2^64 —
    ~1e-9 at 10^5 distinct span texts); the SQL twin groups on the exact
    text, so the driver's hash-compare doubles as a collision audit.
    """
    import hashlib

    import numpy as np

    from .reports import bucketed_agg

    ds = _docs(sf_dir, ["doc_id", "spans"])

    M63 = (1 << 63) - 1

    def _fp(text: str, memo: dict) -> int:
        v = memo.get(text)
        if v is None:
            v = int(hashlib.md5(text.encode("utf-8"))
                    .hexdigest()[:16], 16) & M63
            memo[text] = v
        return v

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter
        col = batch.column("spans")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.values
        texts = vals.field("text").to_pylist()
        offs = col.offsets.to_numpy()
        memo: dict = {}
        c: Counter = Counter()
        for j in range(batch.num_rows):
            row_fps = {_fp(t, memo)
                       for t in texts[int(offs[j]):int(offs[j + 1])]
                       if t}
            for f in row_fps:
                c[f] += 1
        return pa.table({
            "fp": pa.array(list(c.keys()), pa.int64()),
            "n_pages": pa.array(list(c.values()), pa.int64())})

    counts = bucketed_agg(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        "fp", {"n_pages": ("n_pages", "sum")})
    boiler_df = counts.filter(
        expr=f"n_pages >= {int(min_pages)}").to_pandas()
    boiler = np.sort(boiler_df["fp"].to_numpy(dtype=np.int64))
    boiler_ref = ray.put(boiler)

    def strip(batch: pa.Table) -> pa.Table:
        bset = ray.get(boiler_ref)          # plasma-cached per worker
        col = batch.column("spans")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.values
        texts = vals.field("text").to_pylist()
        offs = col.offsets.to_numpy()
        memo: dict = {}
        n_spans, n_boiler, cleans = [], [], []
        for j in range(batch.num_rows):
            row = [t for t in texts[int(offs[j]):int(offs[j + 1])] if t]
            if row:
                fps = np.fromiter((_fp(t, memo) for t in row),
                                  dtype=np.int64, count=len(row))
                drop = np.zeros(len(row), dtype=bool)
                if bset.size:
                    idx = np.searchsorted(bset, fps)
                    idx[idx == bset.size] = 0
                    drop = bset[idx] == fps
                kept = [t for t, d in zip(row, drop.tolist()) if not d]
            else:
                kept = []
            n_spans.append(len(row))
            n_boiler.append(len(row) - len(kept))
            cleans.append("\n".join(kept))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_spans": pa.array(n_spans, pa.int64()),
            "n_boiler": pa.array(n_boiler, pa.int64()),
            "clean_text": pa.array(cleans, pa.string())})

    out = ds.map_batches(strip, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def crawl_boilerplate_sql(path: str, min_pages: int = 5) -> str:
    return f"""
WITH raw AS (
  SELECT doc_id, generate_subscripts(spans, 1) AS i, unnest(spans) AS sp
  FROM read_parquet('{path}')),
t AS (
  SELECT doc_id, i, sp.text AS txt FROM raw
  WHERE sp.text IS NOT NULL AND sp.text <> ''),
boiler AS (
  SELECT txt FROM t GROUP BY txt
  HAVING count(DISTINCT doc_id) >= {int(min_pages)}),
cnt AS (
  SELECT doc_id, count(*) AS n_spans,
         sum(CASE WHEN txt IN (SELECT txt FROM boiler)
             THEN 1 ELSE 0 END)::BIGINT AS n_boiler
  FROM t GROUP BY doc_id),
clean AS (
  SELECT doc_id, string_agg(txt, chr(10) ORDER BY i) AS clean_text
  FROM t WHERE txt NOT IN (SELECT txt FROM boiler)
  GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(cnt.n_spans, 0)::BIGINT AS n_spans,
       coalesce(cnt.n_boiler, 0)::BIGINT AS n_boiler,
       coalesce(clean.clean_text, '') AS clean_text
FROM (SELECT DISTINCT doc_id FROM read_parquet('{path}')) d
LEFT JOIN cnt USING (doc_id) LEFT JOIN clean USING (doc_id)
ORDER BY doc_id"""


def ensure_media_decode(sf_dir: str,
                        root: str = "/tmp/graft_media") -> str:
    """Build-or-reuse the decoded-media side table for this corpus: image
    spans → synthesized payload rows → ImageDecoder actor pool →
    (media_id, doc_id, media_type, width, height) parquet. Content-keyed
    cache + atomic rename (same recipe as the search index) so a corpus
    regenerated in place never reuses a stale decode and concurrent
    drivers never read a half-built directory.

    This is the multimodal plumbing of stages/multimodal.py run at query
    scale: payloads are opaque binary columns, the decoder is a stateful
    actor-pool stage (small batches — binary rows are wide), and the
    decode output lands as partitioned parquet (the resume unit)."""
    import hashlib
    import shutil

    from ..stages.multimodal import ImageDecoder, synthesize_media_table

    cdir = ensure_corpus(sf_dir)
    sig_parts = []
    pdir = os.path.join(cdir, "documents")
    for f in sorted(os.listdir(pdir)):
        st = os.stat(os.path.join(pdir, f))
        sig_parts.append(f"{f}|{st.st_size}|{st.st_mtime_ns}")
    sig = "media-v1|" + "|".join(sig_parts)
    tag = hashlib.md5(sig.encode()).hexdigest()[:10]
    out = os.path.join(root, tag)
    if os.path.isdir(out):
        return out
    tmp = f"{out}.build.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    decoded = (rd.read_parquet(pdir, columns=["doc_id", "spans"])
               .map_batches(synthesize_media_table,
                            batch_format="pyarrow")
               .map_batches(ImageDecoder, concurrency=(1, 4),
                            batch_size=256, batch_format="pyarrow")
               .map_batches(lambda b: b.select(
                   ["media_id", "doc_id", "media_type",
                    "width", "height"]), batch_format="pyarrow"))
    decoded.write_parquet(tmp)
    try:
        os.rename(tmp, out)
    except OSError:            # lost the build race; another driver won
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def crawl_media_decode(sf_dir: str) -> pd.DataFrame:
    """Per-media-type decode summary joining BOTH sides of the multimodal
    pipeline: n_media / n_docs / sum_width / sum_height come from the
    engine's own persisted decode parquet (written by the actor-pool
    stage), while n_spans is recounted from the CORPUS image spans via
    the extension rule. The SQL twin computes the same two halves from
    the same two inputs, so a green driver row proves the decode stage
    produced exactly one row per corpus image span with the
    extension-correct media type AND that the persisted parquet matches
    the in-memory aggregate. Sums are exact int64 (no float rounding
    seam). Decode values themselves are pinned by the multimodal pytest
    (deterministic fake decoder; real decoders inject via decode_fn)."""
    mdir = ensure_media_decode(sf_dir)

    dec = rd.read_parquet(mdir)

    def dec_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd_
        df = batch.select(["media_type", "doc_id", "width",
                           "height"]).to_pandas()
        g = df.groupby("media_type").agg(
            n_media=("doc_id", "size"),
            sum_width=("width", "sum"), sum_height=("height", "sum"))
        g["docs"] = df.groupby("media_type")["doc_id"] \
            .agg(lambda s: set(s))
        return pa.table({
            "media_type": pa.array(g.index.tolist(), pa.string()),
            "n_media": pa.array(g["n_media"].tolist(), pa.int64()),
            "sum_width": pa.array([int(x) for x in g["sum_width"]],
                                  pa.int64()),
            "sum_height": pa.array([int(x) for x in g["sum_height"]],
                                   pa.int64()),
            "docs": pa.array([sorted(d) for d in g["docs"]],
                             pa.list_(pa.string()))})

    # two media types → the reduce is tiny; distinct docs merge as sets
    parts = dec.map_batches(dec_partial,
                            batch_format="pyarrow").take_all()
    agg: dict = {}
    for r in parts:
        a = agg.setdefault(r["media_type"],
                           {"n_media": 0, "sum_width": 0,
                            "sum_height": 0, "docs": set()})
        a["n_media"] += r["n_media"]
        a["sum_width"] += r["sum_width"]
        a["sum_height"] += r["sum_height"]
        a["docs"].update(r["docs"])

    # corpus half: image-span counts per extension-derived type
    ds = _docs(sf_dir, ["spans"])

    def span_partial(batch: pa.Table) -> pa.Table:
        col = batch.column("spans")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.values
        kinds = vals.field("kind").to_pylist()
        refs = vals.field("media_ref").to_pylist()
        png = jpeg = 0
        for k, ref in zip(kinds, refs):
            if k == "image":
                if ref.endswith(".png"):
                    png += 1
                else:
                    jpeg += 1
        return pa.table({"media_type": pa.array(
            ["image/png", "image/jpeg"], pa.string()),
            "n_spans": pa.array([png, jpeg], pa.int64())})

    span_counts: dict = {}
    for r in ds.map_batches(span_partial,
                            batch_format="pyarrow").take_all():
        span_counts[r["media_type"]] = \
            span_counts.get(r["media_type"], 0) + r["n_spans"]

    rows = [(mt, a["n_media"], len(a["docs"]),
             span_counts.get(mt, 0), a["sum_width"], a["sum_height"])
            for mt, a in agg.items()]
    out = pd.DataFrame(rows, columns=["media_type", "n_media", "n_docs",
                                      "n_spans", "sum_width",
                                      "sum_height"])
    return out.sort_values("media_type").reset_index(drop=True)


def crawl_media_decode_sql(media_dir: str, corpus_path: str) -> str:
    media_glob = os.path.join(media_dir, "*.parquet")
    return f"""
WITH m AS (
  SELECT media_type, doc_id, width, height
  FROM read_parquet('{media_glob}')),
s AS (
  SELECT CASE WHEN sp.media_ref LIKE '%.png' THEN 'image/png'
              ELSE 'image/jpeg' END AS media_type
  FROM (SELECT unnest(spans) AS sp FROM read_parquet('{corpus_path}'))
  WHERE sp.kind = 'image'),
sc AS (SELECT media_type, count(*)::BIGINT AS n_spans
       FROM s GROUP BY media_type)
SELECT m.media_type,
       count(*)::BIGINT AS n_media,
       count(DISTINCT m.doc_id)::BIGINT AS n_docs,
       coalesce(sc.n_spans, 0)::BIGINT AS n_spans,
       sum(m.width)::BIGINT AS sum_width,
       sum(m.height)::BIGINT AS sum_height
FROM m LEFT JOIN sc USING (media_type)
GROUP BY m.media_type, sc.n_spans
ORDER BY m.media_type"""


def crawl_redirect_chains(sf_dir: str, max_hops: int = 16) -> pd.DataFrame:
    """Corpus-wide redirect-chain resolution (the reference's redirect
    report as a distributed query) over the corpus documents table —
    the thin wrapper around resolve_redirect_chains below."""
    return resolve_redirect_chains(
        _docs(sf_dir, ["doc_id", "redirect_to"]), max_hops=max_hops)


def resolve_redirect_chains(docs: rd.Dataset,
                            max_hops: int = 16) -> pd.DataFrame:
    """For every redirecting URL (``doc_id`` with non-empty
    ``redirect_to``), follow redirect edges until the target is not
    itself a redirect source, capping at ``max_hops`` edges; emit (url,
    final_url, hops, disposition) with disposition ``capped`` (still
    pointing at a redirect source at the cap — a loop or an over-long
    chain), ``ok`` (final target exists among doc_ids) or ``dangling``
    (it doesn't).

    Scale shape: the chain state (one row per redirect SOURCE — a small
    fraction of any real corpus, but itself 10^8+ at 10^10 pages) stays
    a Dataset end to end; each round is one adaptive hash join of the
    state against the redirect edge table (broadcast at fixture scale,
    bucketed at 10^10) plus a vectorized advance, with an early exit as
    soon as a round advances nothing — chains are short in practice, so
    the loop runs ~max-chain-length rounds, not max_hops. Exact single
    -hop semantics are kept (rather than pointer doubling) so the hop
    cap counts edges precisely — the recursive-CTE oracle's contract.
    Final classification is two more joins (source-set membership, then
    corpus membership)."""
    import pyarrow.compute as pc_

    from .reports import hash_join

    def to_edges(b: pa.Table) -> pa.Table:
        m = pc_.and_kleene(pc_.is_valid(b.column("redirect_to")),
                           pc_.not_equal(b.column("redirect_to"), ""))
        kept = b.filter(pc_.fill_null(m, False))
        return pa.table({"u": kept.column("doc_id"),
                         "t": kept.column("redirect_to")})

    # materialize once: the chain loop joins against `edges` every
    # round, and a lazy dataset would re-run the parquet read + filter
    # per round (16x at the hop cap)
    edges = docs.map_batches(to_edges,
                             batch_format="pyarrow").materialize()

    def seed(b: pa.Table) -> pa.Table:
        import numpy as np
        return pa.table({
            "url": b.column("u"), "cur": b.column("t"),
            "hops": pa.array(np.ones(b.num_rows, dtype=np.int64))})

    state = edges.map_batches(seed, batch_format="pyarrow").materialize()
    if state.count() == 0:
        return pd.DataFrame(columns=["url", "final_url", "hops",
                                     "disposition"])

    for _ in range(max_hops - 1):
        joined = hash_join(state, edges, key="cur", right_key="u",
                           how="left")

        def step(b: pa.Table) -> pa.Table:
            nxt = b.column("t")
            hops = b.column("hops")
            can = pc_.fill_null(pc_.and_kleene(
                pc_.is_valid(nxt),
                pc_.less(hops, pa.scalar(max_hops, pa.int64()))), False)
            return pa.table({
                "url": b.column("url"),
                "cur": pc_.if_else(can, nxt, b.column("cur")),
                "hops": pc_.if_else(can, pc_.add(hops, 1), hops),
                "adv": pc_.cast(can, pa.int64())})

        state = joined.map_batches(step,
                                   batch_format="pyarrow").materialize()
        if not state.sum("adv"):
            break
        state = state.drop_columns(["adv"])

    if "adv" in state.schema().names:
        state = state.drop_columns(["adv"])

    # classification joins: is the final target still a redirect source
    # (capped), else does it exist in the corpus (ok vs dangling)?
    srcs = edges.map_batches(
        lambda b: pa.table({"u": b.column("u"),
                            "is_src": pa.array([1] * b.num_rows,
                                               pa.int64())}),
        batch_format="pyarrow")
    exists = docs.map_batches(
        lambda b: pa.table({"u": b.column("doc_id"),
                            "is_doc": pa.array([1] * b.num_rows,
                                               pa.int64())}),
        batch_format="pyarrow")
    out = hash_join(hash_join(state, srcs, key="cur", right_key="u",
                              how="left"),
                    exists, key="cur", right_key="u", how="left")

    def classify(b: pa.Table) -> pa.Table:
        is_src = pc_.fill_null(b.column("is_src"), 0)
        is_doc = pc_.fill_null(b.column("is_doc"), 0)
        disp = pc_.if_else(
            pc_.equal(is_src, 1), pa.scalar("capped"),
            pc_.if_else(pc_.equal(is_doc, 1), pa.scalar("ok"),
                        pa.scalar("dangling")))
        return pa.table({"url": b.column("url"),
                         "final_url": b.column("cur"),
                         "hops": b.column("hops"),
                         "disposition": disp})

    res = out.map_batches(classify, batch_format="pyarrow").to_pandas()
    return res.sort_values("url").reset_index(drop=True)


def crawl_redirect_chains_sql(path: str, max_hops: int = 16) -> str:
    return f"""
WITH RECURSIVE m AS (
  SELECT doc_id AS u, redirect_to AS t FROM read_parquet('{path}')
  WHERE redirect_to IS NOT NULL AND redirect_to <> ''),
r(start, cur, n) AS (
  SELECT u, t, 1 FROM m
  UNION ALL
  SELECT r.start, m.t, r.n + 1 FROM r JOIN m ON m.u = r.cur
  WHERE r.n < {int(max_hops)}),
last AS (
  SELECT start, cur, n FROM (
    SELECT r.*, row_number() OVER (PARTITION BY start
                                   ORDER BY n DESC) AS rn FROM r)
  WHERE rn = 1)
SELECT start AS url, cur AS final_url, n::BIGINT AS hops,
       CASE WHEN EXISTS (SELECT 1 FROM m WHERE m.u = last.cur)
              THEN 'capped'
            WHEN EXISTS (SELECT 1 FROM read_parquet('{path}') d
                         WHERE d.doc_id = last.cur) THEN 'ok'
            ELSE 'dangling' END AS disposition
FROM last ORDER BY url"""


def crawl_sitemap_health(sf_dir: str,
                         out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """J5 sitemap health as a driver query: robots.txt Sitemap: lines →
    recursive index expansion (≤10 deep, S5) → per-URL classification
    against the crawl's own pages output (valid / broken / redirect /
    noindexed / non_canonical / not_crawled, with the reference's issue
    type+message strings).

    Scale shape: the index STRUCTURE (which sitemap lists which) is
    small metadata and expands driver-side; the page-URL entries — the
    big side — stream through ``reports.sitemap_health``'s dataset join
    (broadcast at sandbox scale, bucketed above threshold; VERDICT r2
    #3). The SQL twin re-derives the same URL set with a recursive CTE
    over sitemaps.parquet and re-classifies against the same pages
    parquet, so a green driver row covers discovery, expansion, the
    join, and the classification precedence order."""
    import pyarrow.parquet as pq

    from ..sources.sitemap import (expand_sitemaps,
                                   sitemap_roots_from_robots)
    from . import reports

    full_crawl_pages(sf_dir, out_root)   # no-op if lineage complete
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    cdir = ensure_corpus(sf_dir)
    robots_rows = pq.read_table(
        os.path.join(cdir, "robots.parquet")).to_pylist()
    sm_rows = pq.read_table(
        os.path.join(cdir, "sitemaps.parquet")).to_pylist()
    roots = sitemap_roots_from_robots(robots_rows)
    urls = expand_sitemaps(sm_rows, roots)
    pages = reports.load_pages(
        out_dir, columns=["url", "status_code", "redirect_count",
                          "robots", "x_robots_tag", "canonical_url"])
    return reports.sitemap_health(pages, urls).to_pandas()


def crawl_sitemap_health_sql(corpus_dir_: str, out_dir: str) -> str:
    robots_p = os.path.join(corpus_dir_, "robots.parquet")
    sm_p = os.path.join(corpus_dir_, "sitemaps.parquet")
    pages_glob = os.path.join(out_dir, "pages", "wave=*", "*.parquet")

    def norm(col: str) -> str:
        return f"""
CASE WHEN strpos(split_part(rtrim(lower({col}), '/'), '://', 2), '/') = 0
     THEN rtrim(lower({col}), '/') || '/'
     ELSE rtrim(lower({col}), '/') END"""

    return f"""
WITH RECURSIVE roots AS (
  SELECT unnest(regexp_extract_all(content,
                'sitemap:\\s*([^\\s#]+)', 1, 'i')) AS url
  FROM read_parquet('{robots_p}')),
sm AS (SELECT url, content_kind, entries
       FROM read_parquet('{sm_p}')),
walk(url, depth) AS (
  SELECT url, 0 FROM roots
  UNION
  SELECT t.ent, w.depth + 1
  FROM walk w
  JOIN sm ON sm.url = w.url AND sm.content_kind = 'index'
  CROSS JOIN (SELECT unnest(sm.entries) AS ent) t
  WHERE w.depth < 10),
su AS (
  SELECT DISTINCT t.ent AS sitemap_url
  FROM walk w
  JOIN sm ON sm.url = w.url AND sm.content_kind = 'urlset'
  CROSS JOIN (SELECT unnest(sm.entries) AS ent) t),
p AS (
  SELECT url, status_code, redirect_count, robots, x_robots_tag,
         canonical_url, {norm('url')} AS __n
  FROM read_parquet('{pages_glob}')),
j AS (
  SELECT su.sitemap_url, p.url, p.status_code, p.redirect_count,
         p.robots, p.x_robots_tag, p.canonical_url
  FROM su LEFT JOIN p ON {norm('su.sitemap_url')} = p.__n),
c AS (
  SELECT sitemap_url,
         CASE WHEN status_code IS NULL THEN 'not_crawled'
              WHEN status_code = 0 OR status_code >= 400 THEN 'broken'
              WHEN coalesce(redirect_count, 0) > 0 THEN 'redirect'
              WHEN contains(lower(coalesce(robots, '')), 'noindex')
                OR contains(lower(coalesce(x_robots_tag, '')),
                            'noindex') THEN 'noindexed'
              WHEN canonical_url IS NOT NULL AND canonical_url <> ''
                AND {norm('canonical_url')} <> {norm('url')}
                THEN 'non_canonical'
              ELSE 'valid' END AS bucket,
         status_code, redirect_count, canonical_url
  FROM j)
SELECT sitemap_url, bucket,
       CASE bucket WHEN 'broken' THEN 'error'
                   WHEN 'redirect' THEN 'warning'
                   WHEN 'noindexed' THEN 'warning'
                   WHEN 'non_canonical' THEN 'info'
                   ELSE '' END AS type,
       CASE bucket WHEN 'broken' THEN 'Sitemap: Broken URL'
                   WHEN 'redirect' THEN 'Sitemap: Redirecting URL'
                   WHEN 'noindexed' THEN 'Sitemap: Noindexed URL'
                   WHEN 'non_canonical' THEN 'Sitemap: Non-Canonical URL'
                   ELSE '' END AS issue,
       CASE bucket
         WHEN 'broken' THEN 'Status ' || status_code::BIGINT
         WHEN 'redirect' THEN redirect_count::BIGINT || ' hop(s)'
         WHEN 'noindexed' THEN 'Sitemap lists a noindexed page'
         WHEN 'non_canonical' THEN 'Canonical: ' || canonical_url
         ELSE '' END AS details
FROM c ORDER BY sitemap_url"""


def crawl_hreflang_issues(sf_dir: str,
                          out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """J6 hreflang reciprocity as a driver query over the crawl's own
    pages output: code validation (invalid vs unknown), reciprocity
    (A→B needs any B→A), target status, and per-page self-reference —
    the reference's International issue family with its exact message
    strings. The heavy shapes live in reports.hreflang_issues (edge
    explode, globally-deduped reverse-pair join, bucketed self-ref
    groupby)."""
    from . import reports

    full_crawl_pages(sf_dir, out_root)   # no-op if lineage complete
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(
        out_dir, columns=["url", "hreflang", "status_code"])
    out = reports.hreflang_issues(pages).to_pandas()
    return out.sort_values(["url", "issue", "details"]) \
              .reset_index(drop=True)


def crawl_hreflang_issues_sql(out_dir: str) -> str:
    from .reports import _KNOWN_LANGS
    pages_glob = os.path.join(out_dir, "pages", "wave=*", "*.parquet")
    known = ", ".join(
        f"'{k}'" for k in sorted(_KNOWN_LANGS) if k != "x-default")

    def norm(col: str) -> str:
        return f"""
CASE WHEN strpos(split_part(rtrim(lower({col}), '/'), '://', 2), '/') = 0
     THEN rtrim(lower({col}), '/') || '/'
     ELSE rtrim(lower({col}), '/') END"""

    return f"""
WITH e AS (
  SELECT url AS source, h.lang AS lang, h.url AS target,
         {norm('url')} AS ns, {norm('h.url')} AS nt
  FROM (SELECT url, unnest(hreflang) AS h
        FROM read_parquet('{pages_glob}') WHERE len(hreflang) > 0)),
p AS (
  SELECT {norm('url')} AS n2, status_code
  FROM read_parquet('{pages_glob}')),
codes AS (
  SELECT source AS url,
         CASE WHEN NOT ok THEN 'error' ELSE 'warning' END AS type,
         'International' AS category,
         CASE WHEN NOT ok THEN 'Hreflang: Invalid Language Code'
              ELSE 'Hreflang: Unknown Language Code' END AS issue,
         'Code "' || coalesce(lang, 'None') || '" for ' || target
           AS details
  FROM (SELECT *, regexp_full_match(coalesce(lang, ''),
                 '[a-z]{{2,3}}(-[A-Za-z]{{2,4}})?') AS ok FROM e)
  WHERE coalesce(lang, '') <> 'x-default'
    AND (NOT ok OR split_part(coalesce(lang, ''), '-', 1)
                   NOT IN ({known}))),
recip AS (
  SELECT source AS url, 'warning' AS type, 'International' AS category,
         'Hreflang: Missing Reciprocal Link' AS issue,
         target || ' does not link back' AS details
  FROM e a
  WHERE a.ns <> a.nt AND NOT EXISTS
        (SELECT 1 FROM e b WHERE b.ns = a.nt AND b.nt = a.ns)),
non200 AS (
  SELECT source AS url, 'error' AS type, 'International' AS category,
         'Hreflang: Points to Non-200 Page' AS issue,
         target || ' returned ' || status_code::BIGINT AS details
  FROM e LEFT JOIN p ON p.n2 = e.nt
  WHERE status_code IS NOT NULL AND status_code <> 200),
selfs AS (
  SELECT min(source) AS url, 'warning' AS type,
         'International' AS category,
         'Hreflang: Missing Self-Reference' AS issue,
         'Page''s hreflang set does not include itself' AS details
  FROM e GROUP BY ns
  HAVING sum(CASE WHEN ns = nt THEN 1 ELSE 0 END) = 0)
SELECT * FROM codes
UNION ALL SELECT * FROM recip
UNION ALL SELECT * FROM non200
UNION ALL SELECT * FROM selfs
ORDER BY url, issue, details"""


def _norm_sql(col: str) -> str:
    """SQL twin of canonical.norm_url for the corpus's URL forms:
    lowercase, strip trailing slash except a bare root."""
    return f"""
CASE WHEN strpos(split_part(rtrim(lower({col}), '/'), '://', 2), '/') = 0
     THEN rtrim(lower({col}), '/') || '/'
     ELSE rtrim(lower({col}), '/') END"""


def crawl_links_to_redirects(sf_dir: str,
                             out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """J3 as a driver query: internal links whose targets redirect — one
    issue per source page with the reference's count + first-5 message
    (reports.links_to_redirects_issues: normalized join + bucketed
    per-source aggregation)."""
    from . import reports

    full_crawl_pages(sf_dir, out_root)
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    out = reports.links_to_redirects_issues(
        reports.load_pages(out_dir, columns=["url", "redirect_count"]),
        reports.load_links(out_dir)).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def crawl_links_to_redirects_sql(out_dir: str) -> str:
    pages_glob = os.path.join(out_dir, "pages", "wave=*", "*.parquet")
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")
    return f"""
WITH red AS (
  SELECT DISTINCT {_norm_sql('url')} AS nt
  FROM read_parquet('{pages_glob}') WHERE redirect_count >= 1),
hits AS (
  SELECT l.source_url, l.target_url
  FROM read_parquet('{links_glob}') l
  JOIN red ON {_norm_sql('l.target_url')} = red.nt
  WHERE l.is_internal),
g AS (
  SELECT source_url AS url,
         list_sort(list_distinct(list(target_url))) AS ts
  FROM hits GROUP BY source_url)
SELECT url, 'info' AS type, 'Links' AS category,
       'Links: Internal Links to Redirects' AS issue,
       len(ts) || ' internal link(s) point to redirecting URLs: ' ||
         array_to_string(ts[1:5], ', ') AS details
FROM g ORDER BY url"""


def crawl_broken_links(sf_dir: str,
                       out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """J4 as a driver query: broken link targets (status 0 / ≥400) with
    the reference's per-target source-list message
    (reports.broken_link_issues)."""
    from . import reports

    full_crawl_pages(sf_dir, out_root)
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    out = reports.broken_link_issues(
        reports.load_pages(out_dir, columns=["url", "status_code"]),
        reports.load_links(out_dir)).to_pandas()
    return out.sort_values(["url", "issue"]).reset_index(drop=True)


def crawl_broken_links_sql(out_dir: str) -> str:
    pages_glob = os.path.join(out_dir, "pages", "wave=*", "*.parquet")
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")
    return f"""
WITH broken AS (
  SELECT {_norm_sql('url')} AS nt, status_code
  FROM read_parquet('{pages_glob}')
  WHERE status_code = 0 OR status_code >= 400),
hits AS (
  SELECT l.source_url, l.target_url, b.status_code,
         {_norm_sql('l.target_url')} AS nt
  FROM read_parquet('{links_glob}') l
  JOIN broken b ON {_norm_sql('l.target_url')} = b.nt),
g AS (
  SELECT nt, min(target_url) AS url, min(status_code) AS st,
         list_sort(list_distinct(list(source_url))) AS srcs
  FROM hits GROUP BY nt)
SELECT url, 'error' AS type, 'Links' AS category,
       'Broken Link (' ||
         CASE WHEN st = 0 THEN 'No Response' ELSE st::VARCHAR END ||
         ')' AS issue,
       'Linked from ' || len(srcs) || ' page(s): ' ||
         array_to_string(srcs[1:5], ', ') AS details
FROM g ORDER BY url, issue"""


def crawl_linked_from(sf_dir: str,
                      out_root: str = "/tmp/graft_crawl") -> pd.DataFrame:
    """J1 as a driver query: per crawled page, the sorted distinct list
    of pages linking to it (reports.linked_from — the reference's
    post-crawl _update_all_linked_from final state), flattened to a
    count + unit-separator-joined string so the value-hash compare stays
    dtype-exact across engines."""
    from . import reports

    full_crawl_pages(sf_dir, out_root)
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(out_dir, columns=["url"])
    out = reports.linked_from(pages, reports.load_links(out_dir)) \
        .to_pandas()
    out["n_sources"] = out["linked_from"].map(len).astype("int64")
    out["sources"] = out["linked_from"].map("\x1f".join)
    out = out[["url", "n_sources", "sources"]]
    return out.sort_values("url").reset_index(drop=True)


def crawl_linked_from_sql(out_dir: str) -> str:
    pages_glob = os.path.join(out_dir, "pages", "wave=*", "*.parquet")
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")
    return f"""
WITH agg AS (
  SELECT {_norm_sql('target_url')} AS nt,
         array_to_string(list_sort(list_distinct(list(source_url))),
                         chr(31)) AS sources,
         len(list_distinct(list(source_url)))::BIGINT AS n_sources
  FROM read_parquet('{links_glob}') GROUP BY 1)
SELECT p.url, coalesce(agg.n_sources, 0) AS n_sources,
       coalesce(agg.sources, '') AS sources
FROM read_parquet('{pages_glob}') p
LEFT JOIN agg ON {_norm_sql('p.url')} = agg.nt
ORDER BY p.url"""


# --------------------------------------------------- HITS link analysis

def crawl_hits(sf_dir: str, out_root: str = "/tmp/graft_crawl") -> \
        pd.DataFrame:
    """HITS hubs & authorities over the crawl output's link graph — top
    50 pages by authority (with their hub scores). The second classic
    link-analysis score next to ``crawl_pagerank``; driver-gated via an
    unrolled-CTE SQL twin over the crawl's own pages/links parquet."""
    full_crawl_pages(sf_dir, out_root)
    from . import reports
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(out_dir, columns=["url"])
    links = reports.load_links(out_dir)
    df = reports.hits_scores(pages, links)
    return (df.sort_values(["authority", "url"], ascending=[False, True])
            .head(50).reset_index(drop=True))


def crawl_hits_sql(out_dir: str, iterations: int = 5) -> str:
    """DuckDB twin of ``crawl_hits``: the L1-normalized HITS iteration
    unrolled as a MATERIALIZED CTE chain over the crawl's own output
    (side-table oracle pattern, same as ``crawl_pagerank_sql`` — the
    crawl itself is pinned by the conformance suite; this verifies the
    HITS transform end-to-end in SQL). Mirrors hits_scores exactly:
    internal edges, normalized + deduped, endpoints semi-joined to
    crawled nodes, hub_0 = 1/|V|, per-iteration division by the global
    raw sum (coalesce(raw/t, 0) == the engine's reindex-then-divide),
    scores rounded to 10 dp, top 50 by (authority desc, url)."""
    pages_glob = os.path.join(out_dir, "pages", "*", "*.parquet")
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")
    parts = [f"""
__p AS (SELECT url FROM read_parquet('{pages_glob}')),
__nodes AS MATERIALIZED (SELECT DISTINCT {_norm_sql('url')} AS n
                         FROM __p),
__nn AS (SELECT count(*)::DOUBLE AS cnt FROM __nodes),
__e0 AS MATERIALIZED (SELECT DISTINCT {_norm_sql('source_url')} AS src,
                {_norm_sql('target_url')} AS dst
         FROM read_parquet('{links_glob}') WHERE is_internal),
__edges AS MATERIALIZED (SELECT e.src, e.dst FROM __e0 e
            JOIN __nodes a ON e.src = a.n
            JOIN __nodes b ON e.dst = b.n),
__h0 AS MATERIALIZED (SELECT n, 1.0 / (SELECT cnt FROM __nn) AS s
                      FROM __nodes)"""]
    for k in range(1, iterations + 1):
        parts.append(f""",
__ar{k} AS MATERIALIZED (SELECT e.dst AS n, sum(h.s) AS raw
           FROM __edges e JOIN __h{k - 1} h ON e.src = h.n
           GROUP BY e.dst),
__as{k} AS (SELECT sum(raw) AS t FROM __ar{k}),
__a{k} AS MATERIALIZED (SELECT nd.n,
           coalesce(r.raw / nullif((SELECT t FROM __as{k}), 0), 0.0) AS s
           FROM __nodes nd LEFT JOIN __ar{k} r USING (n)),
__hr{k} AS MATERIALIZED (SELECT e.src AS n, sum(a.s) AS raw
           FROM __edges e JOIN __a{k} a ON e.dst = a.n
           GROUP BY e.src),
__hs{k} AS (SELECT sum(raw) AS t FROM __hr{k}),
__h{k} AS MATERIALIZED (SELECT nd.n,
           coalesce(r.raw / nullif((SELECT t FROM __hs{k}), 0), 0.0) AS s
           FROM __nodes nd LEFT JOIN __hr{k} r USING (n))""")
    parts.append(f"""
SELECT p.url, round(a.s, 10) AS authority, round(h.s, 10) AS hub
FROM (SELECT DISTINCT url, {_norm_sql('url')} AS n FROM __p) p
JOIN __a{iterations} a USING (n)
JOIN __h{iterations} h USING (n)
ORDER BY authority DESC, p.url LIMIT 50""")
    return "WITH " + "".join(parts)


# ------------------------------------------------ degree-shape diagnostic

def crawl_degree_stats(sf_dir: str, out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """Log2-bucketed in/out-degree histogram of the crawl's internal link
    graph — the skew diagnostic a link-analysis run consults before
    choosing shuffle salting. (direction, k, n_nodes) with k =
    floor(log2 degree), -1 for crawled pages with no edges in that
    direction."""
    full_crawl_pages(sf_dir, out_root)
    from . import reports
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(out_dir, columns=["url"])
    links = reports.load_links(out_dir)
    return reports.degree_histogram(pages, links)


def crawl_degree_stats_sql(out_dir: str) -> str:
    """DuckDB twin of ``crawl_degree_stats``: same edge semantics as the
    pagerank/HITS twins; the log2 bucket is integer-exact on both sides
    (engine: frexp exponent; SQL: binary-format length)."""
    pages_glob = os.path.join(out_dir, "pages", "*", "*.parquet")
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")
    return f"""
WITH __p AS (SELECT url FROM read_parquet('{pages_glob}')),
__nodes AS MATERIALIZED (SELECT DISTINCT {_norm_sql('url')} AS n
                         FROM __p),
__e0 AS (SELECT DISTINCT {_norm_sql('source_url')} AS src,
                {_norm_sql('target_url')} AS dst
         FROM read_parquet('{links_glob}') WHERE is_internal),
__edges AS MATERIALIZED (SELECT e.src, e.dst FROM __e0 e
            JOIN __nodes a ON e.src = a.n
            JOIN __nodes b ON e.dst = b.n),
__out AS (SELECT src AS n, count(*) AS d FROM __edges GROUP BY src),
__in AS (SELECT dst AS n, count(*) AS d FROM __edges GROUP BY dst),
__buckets AS (
  SELECT 'out' AS direction,
         (length(format('{{:b}}', d)) - 1)::BIGINT AS k,
         count(*)::BIGINT AS n_nodes
  FROM __out GROUP BY 2
  UNION ALL
  SELECT 'in', (length(format('{{:b}}', d)) - 1)::BIGINT, count(*)::BIGINT
  FROM __in GROUP BY 2
  UNION ALL
  SELECT 'out', -1::BIGINT,
         (SELECT count(*) FROM __nodes) - (SELECT count(*) FROM __out)
  UNION ALL
  SELECT 'in', -1::BIGINT,
         (SELECT count(*) FROM __nodes) - (SELECT count(*) FROM __in))
SELECT direction, k, n_nodes FROM __buckets
WHERE n_nodes > 0 ORDER BY direction, k"""


# ------------------------------------------------------ host-level graph

def crawl_host_graph(sf_dir: str, out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """Domain-level link graph over the crawl output: (source_host,
    target_host, n_links, n_targets) for every host pair, internal AND
    external. At 100 TB the page graph has 10^10 nodes but the host
    graph is merely millions of rows — scheduling, politeness planning
    and link-spam triage all aggregate here first, so this is the
    report a crawl operator actually opens.

    Shape: (1) per-batch (sh, th) Counter partials → bucketed exact
    sums for n_links; (2) per-batch DISTINCT (sh, th, lowered target)
    triples → bucketed-by-sh global dedup (a duplicate triple always
    lands in its sh bucket) → exact per-pair distinct-target counts.
    Only host-pair-sized partials cross either shuffle; the two small
    tables merge on the driver."""
    from . import reports
    from .reports import bucketed_agg, bucketed_groups

    full_crawl_pages(sf_dir, out_root)
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    links = reports.load_links(out_dir) \
        .select_columns(["source_url", "target_url"])

    def hosts(df: pd.DataFrame) -> pd.DataFrame:
        # mirror split_part(split_part(lower(u),'://',2),'/',1)
        out = pd.DataFrame(index=df.index)
        for col, name in (("source_url", "sh"), ("target_url", "th")):
            rest = df[col].str.lower().str.split("://", n=1).str[1] \
                .fillna("")
            out[name] = rest.str.split("/", n=1).str[0]
        out["lt"] = df["target_url"].str.lower()
        return out

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = hosts(df)
        return h.groupby(["sh", "th"], as_index=False).agg(
            n_links=("lt", "size"))

    n_links = bucketed_agg(
        links.map_batches(count_partial, batch_format="pandas"),
        ["sh", "th"], {"n_links": ("n_links", "sum")}).to_pandas()

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return hosts(df).drop_duplicates(["sh", "th", "lt"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["sh", "th", "lt"])
        return d.groupby(["sh", "th"], as_index=False).agg(
            n_targets=("lt", "size"))

    n_targets = bucketed_groups(
        links.map_batches(distinct_partial, batch_format="pandas"),
        "sh", per_bucket).to_pandas()

    out = n_links.merge(n_targets, on=["sh", "th"], how="inner")
    out = out.rename(columns={"sh": "source_host", "th": "target_host"})
    out["n_links"] = out["n_links"].astype("int64")
    out["n_targets"] = out["n_targets"].astype("int64")
    return (out[["source_host", "target_host", "n_links", "n_targets"]]
            .sort_values(["source_host", "target_host"])
            .reset_index(drop=True))


def crawl_host_graph_sql(out_dir: str) -> str:
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")
    return f"""
SELECT split_part(split_part(lower(source_url), '://', 2), '/', 1)
           AS source_host,
       split_part(split_part(lower(target_url), '://', 2), '/', 1)
           AS target_host,
       count(*)::BIGINT AS n_links,
       count(DISTINCT lower(target_url))::BIGINT AS n_targets
FROM read_parquet('{links_glob}')
GROUP BY 1, 2 ORDER BY 1, 2"""


# ---------------------------------------------------- triangle counting

def crawl_triangles(sf_dir: str, out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """Triangle counts + local clustering coefficients over the crawl's
    undirected internal link graph (reports.triangle_counts: the
    degree-oriented compact-forward algorithm, wedges closed by a hash
    join against the oriented edge set). The mirror/nav-template density
    diagnostic next to crawl_degree_stats' skew histogram."""
    full_crawl_pages(sf_dir, out_root)
    from . import reports
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(out_dir, columns=["url"])
    links = reports.load_links(out_dir)
    return reports.triangle_counts(pages, links)


def crawl_triangles_sql(out_dir: str) -> str:
    """DuckDB twin of ``crawl_triangles``: same edge semantics as the
    pagerank/HITS/degree twins (normalized, deduped, endpoint semi-join,
    self-loops dropped); each triangle enumerated exactly once via the
    canonical u<v<w three-way self-join, per-node counts via a 3-way
    UNION ALL, lcc with the repo's half-away 6 dp idiom and the engine's
    float-op order ((2*tri) / (d*(d-1)), then *1e6)."""
    pages_glob = os.path.join(out_dir, "pages", "*", "*.parquet")
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")
    return f"""
WITH __p AS (SELECT url FROM read_parquet('{pages_glob}')),
__nodes AS MATERIALIZED (SELECT DISTINCT {_norm_sql('url')} AS n
                         FROM __p),
__u0 AS (
  SELECT DISTINCT least({_norm_sql('source_url')},
                        {_norm_sql('target_url')}) AS u,
         greatest({_norm_sql('source_url')},
                  {_norm_sql('target_url')}) AS v
  FROM read_parquet('{links_glob}') WHERE is_internal),
__und AS MATERIALIZED (
  SELECT e.u, e.v FROM __u0 e
  JOIN __nodes a ON e.u = a.n JOIN __nodes b ON e.v = b.n
  WHERE e.u <> e.v),
__deg AS MATERIALIZED (
  SELECT n, count(*)::BIGINT AS d
  FROM (SELECT u AS n FROM __und UNION ALL SELECT v AS n FROM __und)
  GROUP BY n),
__tri AS MATERIALIZED (
  SELECT a.u AS x, a.v AS y, b.v AS z
  FROM __und a JOIN __und b ON b.u = a.v
  JOIN __und c ON c.u = a.u AND c.v = b.v),
__cnt AS (
  SELECT n, count(*)::BIGINT AS triangles
  FROM (SELECT x AS n FROM __tri UNION ALL SELECT y FROM __tri
        UNION ALL SELECT z FROM __tri)
  GROUP BY n)
SELECT p.url, d.d AS degree, c.triangles,
       floor((2.0 * c.triangles) / (d.d * (d.d - 1)) * 1e6 + 0.5) / 1e6
           AS lcc
FROM (SELECT DISTINCT url, {_norm_sql('url')} AS n FROM __p) p
JOIN __cnt c ON p.n = c.n
JOIN __deg d ON p.n = d.n
ORDER BY p.url"""


# -------------------------------------------------- co-citation analysis

def crawl_cocitation(sf_dir: str, out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """Top co-cited page pairs over the crawl output
    (reports.cocitation_pairs): the link-level mirror/duplicate-cluster
    signal — URLs consistently cited together from the same sources."""
    full_crawl_pages(sf_dir, out_root)
    from . import reports
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(out_dir, columns=["url"])
    links = reports.load_links(out_dir)
    return reports.cocitation_pairs(pages, links)


def crawl_cocitation_sql(out_dir: str, min_common: int = 2,
                         top: int = 200) -> str:
    """DuckDB twin of ``crawl_cocitation``: same directed deduped
    node-filtered edges as the pagerank/HITS twins; pair counts via a
    self-join on the shared source, ordered (n_common DESC, a, b)."""
    pages_glob = os.path.join(out_dir, "pages", "*", "*.parquet")
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")
    return f"""
WITH __p AS (SELECT url FROM read_parquet('{pages_glob}')),
__nodes AS MATERIALIZED (SELECT DISTINCT {_norm_sql('url')} AS n
                         FROM __p),
__e0 AS (SELECT DISTINCT {_norm_sql('source_url')} AS src,
                {_norm_sql('target_url')} AS dst
         FROM read_parquet('{links_glob}') WHERE is_internal),
__edges AS MATERIALIZED (SELECT e.src, e.dst FROM __e0 e
            JOIN __nodes a ON e.src = a.n
            JOIN __nodes b ON e.dst = b.n)
SELECT a.dst AS url_a, b.dst AS url_b, count(*)::BIGINT AS n_common
FROM __edges a JOIN __edges b ON a.src = b.src AND a.dst < b.dst
GROUP BY 1, 2
HAVING count(*) >= {min_common}
ORDER BY n_common DESC, url_a, url_b LIMIT {top}"""


# -------------------------------------------- J2 link-status distribution

def crawl_link_status_counts(sf_dir: str,
                             out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """J2 as a corpus-scale aggregate: internal links counted by their
    target's crawl status ('not crawled' when the target was never
    fetched) — the link-health summary the reference recomputes at
    export time (main.py's target_status refill).

    Scale shape: the crawled-target membership test runs through
    ``reports.bloom_semi_join`` — the page-key set collapses to an
    OR-merged bloom broadcast once, non-members drop BEFORE the status
    join, and the exact-verify pass removes the ~1% false positives, so
    the result is exact while the join shuffle only carries genuinely
    crawled targets. Status attach + counts are per-batch partials."""
    from collections import Counter

    from . import reports
    from .reports import bloom_semi_join, bucketed_agg, hash_join

    full_crawl_pages(sf_dir, out_root)
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    links = reports.load_links(out_dir) \
        .filter(expr="is_internal == True") \
        .select_columns(["target_url"])
    links = reports._add_norm(links, "target_url", "nt") \
        .select_columns(["nt"]).materialize()
    total = links.count()

    pages = reports.load_pages(out_dir, columns=["url", "status_code"])
    pages = reports._add_norm(pages, "url", "n") \
        .select_columns(["n", "status_code"]).materialize()

    survivors = bloom_semi_join(links, "nt",
                                pages.select_columns(["n"]), "n")
    with_status = hash_join(survivors, pages, key="nt", right_key="n")

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter(batch.column("status_code").to_pylist())
        return pa.table({
            "status": pa.array([str(k) for k in c.keys()], pa.string()),
            "n": pa.array(list(c.values()), pa.int64())})

    counts = with_status.map_batches(partial, batch_format="pyarrow") \
        .to_pandas().groupby("status", as_index=False)["n"].sum()
    n_crawled = int(counts["n"].sum())
    rows = list(zip(counts["status"], counts["n"].astype("int64")))
    if total - n_crawled > 0:
        rows.append(("not crawled", total - n_crawled))
    out = pd.DataFrame(rows, columns=["target_status", "n_links"])
    out["n_links"] = out["n_links"].astype("int64")
    return out.sort_values("target_status").reset_index(drop=True)


def crawl_link_status_counts_sql(out_dir: str) -> str:
    pages_glob = os.path.join(out_dir, "pages", "*", "*.parquet")
    links_glob = os.path.join(out_dir, "links", "*", "*.parquet")
    return f"""
WITH __l AS (
  SELECT {_norm_sql('target_url')} AS nt
  FROM read_parquet('{links_glob}') WHERE is_internal),
__p AS (
  SELECT DISTINCT {_norm_sql('url')} AS n, status_code
  FROM read_parquet('{pages_glob}'))
SELECT coalesce(CAST(p.status_code AS VARCHAR), 'not crawled')
           AS target_status,
       count(*)::BIGINT AS n_links
FROM __l l LEFT JOIN __p p ON l.nt = p.n
GROUP BY 1 ORDER BY target_status"""


def crawl_depth_histogram(sf_dir: str,
                          out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """BFS-shape report over the crawl's own output: pages per (wave,
    depth) plus each cell's min/max fetch sequence — the frontier-growth
    profile an operator reads to size wave budgets (and the direct
    observable of the reference's BFS-with-depth-limit ordering
    contract, crawler.py's depth bookkeeping). Per-batch (wave, depth)
    partials with local min/max seq; one small keyed merge."""
    from .reports import bucketed_agg

    from . import reports

    full_crawl_pages(sf_dir, out_root)
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(out_dir, columns=["wave", "depth", "seq"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["wave", "depth"], as_index=False).agg(
            n_pages=("seq", "size"), min_seq=("seq", "min"),
            max_seq=("seq", "max"))
        return g

    out = bucketed_agg(
        pages.map_batches(partial, batch_format="pandas"),
        ["wave", "depth"],
        {"n_pages": ("n_pages", "sum"), "min_seq": ("min_seq", "min"),
         "max_seq": ("max_seq", "max")}, bucket_on="depth").to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return (out[["wave", "depth", "n_pages", "min_seq", "max_seq"]]
            .sort_values(["wave", "depth"]).reset_index(drop=True))


def crawl_depth_histogram_sql(out_dir: str) -> str:
    pages_glob = os.path.join(out_dir, "pages", "*", "*.parquet")
    return f"""
SELECT wave::BIGINT AS wave, depth::BIGINT AS depth,
       count(*)::BIGINT AS n_pages,
       min(seq)::BIGINT AS min_seq, max(seq)::BIGINT AS max_seq
FROM read_parquet('{pages_glob}')
GROUP BY wave, depth ORDER BY wave, depth"""


def crawl_politeness_report(sf_dir: str,
                            out_root: str = "/tmp/graft_crawl") \
        -> pd.DataFrame:
    """Per-host fetch profile over the crawl's own output — the
    politeness scheduler's observable (T2/T3: state/politeness.py gates
    each wave at host_cap tokens/host): for every host, total pages,
    number of active waves, the largest single-wave burst (the number a
    cap audit compares against host_cap), and the first/last fetch
    sequence. At 10^10 URLs this is the table a crawl operator reads to
    spot hosts that monopolise waves or straggle across them.

    Shape: per-batch (host, wave) partials (count + seq min/max) →
    bucketed exact merge keyed by host → host-level collapse on the
    driver over a (#hosts × #waves)-bounded table."""
    from . import reports
    from .reports import bucketed_agg

    full_crawl_pages(sf_dir, out_root)
    out_dir = os.path.join(out_root, tier_for(sf_dir))
    pages = reports.load_pages(out_dir, columns=["url", "wave", "seq"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rest = df["url"].str.lower().str.split("://", n=1).str[1] \
            .fillna("")
        host = rest.str.split("/", n=1).str[0]
        g = pd.DataFrame({"host": host, "wave": df["wave"],
                          "seq": df["seq"]})
        return g.groupby(["host", "wave"], as_index=False).agg(
            n=("seq", "size"), mn=("seq", "min"), mx=("seq", "max"))

    cells = bucketed_agg(
        pages.map_batches(partial, batch_format="pandas"),
        ["host", "wave"],
        {"n": ("n", "sum"), "mn": ("mn", "min"), "mx": ("mx", "max")},
        bucket_on="host").to_pandas()
    out = cells.groupby("host", as_index=False).agg(
        n_pages=("n", "sum"), n_waves=("wave", "nunique"),
        max_wave_pages=("n", "max"), first_seq=("mn", "min"),
        last_seq=("mx", "max"))
    for c in ("n_pages", "n_waves", "max_wave_pages", "first_seq",
              "last_seq"):
        out[c] = out[c].astype("int64")
    return out.sort_values("host").reset_index(drop=True)


def crawl_politeness_report_sql(out_dir: str) -> str:
    pages_glob = os.path.join(out_dir, "pages", "*", "*.parquet")
    return f"""
WITH __cells AS (
  SELECT split_part(split_part(lower(url), '://', 2), '/', 1) AS host,
         wave, count(*)::BIGINT AS n,
         min(seq)::BIGINT AS mn, max(seq)::BIGINT AS mx
  FROM read_parquet('{pages_glob}') GROUP BY 1, 2)
SELECT host, sum(n)::BIGINT AS n_pages,
       count(DISTINCT wave)::BIGINT AS n_waves,
       max(n)::BIGINT AS max_wave_pages,
       min(mn)::BIGINT AS first_seq, max(mx)::BIGINT AS last_seq
FROM __cells GROUP BY host ORDER BY host"""


def crawl_robots_audit(sf_dir: str) -> pd.DataFrame:
    """Per-host robots.txt audit over the corpus' robots side table:
    parsed star-group rule counts, the effective Crawl-delay feeding the
    politeness budget, Sitemap discovery lines, and the syntax
    validator's problem count (S6/M5 — sources/robots.py mirrors the
    reference's crawler.py:1494-1606 handling). The SQL twin re-derives
    the PARSER itself line-by-line (comment strip, first-colon split,
    user-agent group scoping, last-parsable-delay-wins), so a green row
    pins the parsing semantics, not just the counts.

    Shape: robots tables are host-sized (millions of rows at web scale,
    never page-sized); one stateless ``map_batches`` parse over the
    Dataset is the whole job."""
    from ..sources.robots import parse_robots, validate_robots

    cdir = ensure_corpus(sf_dir)
    rob = rd.read_parquet(os.path.join(cdir, "robots.parquet"))

    def audit(batch: pa.Table) -> pa.Table:
        hosts, cds, nd, na, ns, npr = [], [], [], [], [], []
        for h, c in zip(batch.column("host").to_pylist(),
                        batch.column("content").to_pylist()):
            r = parse_robots(c)
            hosts.append(h)
            cds.append(float(r.crawl_delay))
            nd.append(len(r.disallow))
            na.append(len(r.allow))
            ns.append(len(r.sitemaps))
            npr.append(len(validate_robots(c)))
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "crawl_delay": pa.array(cds, pa.float64()),
            "n_disallow": pa.array(nd, pa.int64()),
            "n_allow": pa.array(na, pa.int64()),
            "n_sitemaps": pa.array(ns, pa.int64()),
            "n_problems": pa.array(npr, pa.int64())})

    out = rob.map_batches(audit, batch_format="pyarrow").to_pandas()
    return out.sort_values("host").reset_index(drop=True)


def crawl_robots_audit_sql(robots_parquet: str) -> str:
    """DuckDB twin of ``crawl_robots_audit``: the parser unrolled in
    SQL. Lines split positionally (unnest/generate_series idiom),
    comments stripped at the first '#', directives split at the first
    ':', rule lines scoped to the star group via the LAST preceding
    user-agent line (none-yet ⇒ in scope, matching the parser), delay =
    the last parsable in-scope value. Whitespace note: SQL trim strips
    spaces where Python strip also strips tabs — the fixture uses
    space-and-newline formatting only."""
    known = ("'user-agent', 'disallow', 'allow', 'crawl-delay', "
             "'sitemap', 'host', 'clean-param', 'request-rate', "
             "'visit-time', 'noindex'")
    return f"""
WITH __raw AS (
  SELECT host, string_split(content, chr(10)) AS ls
  FROM read_parquet('{robots_parquet}')),
__ln AS (
  SELECT host, i, trim(split_part(ls[i], '#', 1)) AS line
  FROM (SELECT host, ls, unnest(generate_series(1, len(ls))) AS i
        FROM __raw)),
__d AS (
  SELECT host, i, line,
         CASE WHEN strpos(line, ':') > 0
              THEN lower(trim(split_part(line, ':', 1))) END AS key,
         CASE WHEN strpos(line, ':') > 0
              THEN trim(substr(line, strpos(line, ':') + 1)) END AS val
  FROM __ln WHERE line <> ''),
__ua AS (SELECT host, i, val FROM __d WHERE key = 'user-agent'),
__scoped AS (
  SELECT d.*,
         coalesce((SELECT u.val FROM __ua u
                   WHERE u.host = d.host AND u.i =
                         (SELECT max(u2.i) FROM __ua u2
                          WHERE u2.host = d.host AND u2.i < d.i)),
                  '*') = '*' AS in_scope
  FROM __d d),
__counts AS (
  SELECT host,
         sum(CASE WHEN key = 'disallow' AND val <> '' AND in_scope
                  THEN 1 ELSE 0 END) AS n_disallow,
         sum(CASE WHEN key = 'allow' AND val <> '' AND in_scope
                  THEN 1 ELSE 0 END) AS n_allow,
         sum(CASE WHEN key = 'sitemap' THEN 1 ELSE 0 END) AS n_sitemaps,
         sum(CASE WHEN key IS NULL THEN 1
                  WHEN key NOT IN ({known}) THEN 1
                  WHEN key = 'user-agent' AND val = '' THEN 1
                  ELSE 0 END) AS n_problems
  FROM __scoped GROUP BY host)
SELECT r.host,
       coalesce((SELECT TRY_CAST(s.val AS DOUBLE) FROM __scoped s
                 WHERE s.host = r.host AND s.key = 'crawl-delay'
                   AND s.in_scope
                   AND TRY_CAST(s.val AS DOUBLE) IS NOT NULL
                 ORDER BY s.i DESC LIMIT 1), 0.0) AS crawl_delay,
       coalesce(c.n_disallow, 0)::BIGINT AS n_disallow,
       coalesce(c.n_allow, 0)::BIGINT AS n_allow,
       coalesce(c.n_sitemaps, 0)::BIGINT AS n_sitemaps,
       coalesce(c.n_problems, 0)::BIGINT AS n_problems
FROM __raw r LEFT JOIN __counts c USING (host)
ORDER BY host"""
