"""Arrow schemas for the engine's logical tables.

Derived from the reference data model (SURVEY.md §1):

- ``documents``: the input corpus per BASELINE.json input_hint —
  (doc_id:string, spans:list<struct<kind,text,media_ref,offset>>) plus
  fetch-simulation metadata columns (status_code, redirect_to, headers, ...).
- ``pages``: the crawl-result row (reference dict template crawler.py:982-1031
  re-expressed columnar; nested lists/structs kept as Arrow nested types).
- ``links``: the edge list (link_manager.py:170-180).
- ``issues``: issue rows (crawl_db.py:145-158).
- ``frontier``: wave frontier rows (url, depth, seq, host, sha1, part).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SPANS_TYPE = pa.list_(SPAN_STRUCT)

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", SPANS_TYPE),
        ("status_code", pa.int32()),
        ("redirect_to", pa.string()),
        ("content_type", pa.string()),
        ("size", pa.int64()),
        ("response_time_ms", pa.float64()),
        ("headers", pa.map_(pa.string(), pa.string())),
        ("host", pa.string()),
        ("x_robots_tag", pa.string()),
        # S4 JS-diff fixture columns (reference crawler.py:1142-1188): the
        # corpus carries the raw-fetch hash and, for docs with a JS-rendered
        # variant, the rendered hash + size (null = no variant)
        ("raw_content_hash", pa.string()),
        ("rendered_content_hash", pa.string()),
        ("rendered_size", pa.int64()),
        # S1 fault model (reference crawler.py:941-976): the document
        # serves fault_429 consecutive 429 responses before the real one;
        # retry_after carries the 429's Retry-After header ("" = absent,
        # non-numeric values exercise the int() ValueError fallback)
        ("fault_429", pa.int32()),
        ("retry_after", pa.string()),
    ]
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
        ("host", pa.string()),
        ("sha1", pa.string()),
        ("part", pa.int32()),
    ]
)

HEADING_STRUCT = pa.struct([("level", pa.int32()), ("text", pa.string())])
IMAGE_STRUCT = pa.struct(
    [
        ("src", pa.string()),
        ("alt", pa.string()),
        ("width", pa.string()),
        ("height", pa.string()),
    ]
)
HREFLANG_STRUCT = pa.struct([("lang", pa.string()), ("url", pa.string())])
REDIRECT_HOP_STRUCT = pa.struct(
    [("url", pa.string()), ("status_code", pa.int32()), ("hop", pa.int32())]
)

AI_READY_STRUCT = pa.struct([("name", pa.string()),
                             ("rich_result", pa.string())])

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("final_url", pa.string()),
        ("status_code", pa.int32()),
        ("content_type", pa.string()),
        ("size", pa.int64()),
        ("response_time", pa.float64()),
        ("is_internal", pa.bool_()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
        ("wave", pa.int32()),
        ("title", pa.string()),
        ("meta_description", pa.string()),
        ("h1", pa.string()),
        ("h1_list", pa.list_(pa.string())),
        ("h2", pa.list_(pa.string())),
        ("h3", pa.list_(pa.string())),
        ("headings_structure", pa.list_(HEADING_STRUCT)),
        ("word_count", pa.int64()),
        ("canonical_url", pa.string()),
        ("lang", pa.string()),
        ("viewport", pa.string()),
        ("robots", pa.string()),
        ("author", pa.string()),
        ("keywords", pa.string()),
        ("generator", pa.string()),
        ("theme_color", pa.string()),
        ("charset", pa.string()),
        ("meta_tags", pa.map_(pa.string(), pa.string())),
        ("og_tags", pa.map_(pa.string(), pa.string())),
        ("twitter_tags", pa.map_(pa.string(), pa.string())),
        ("response_headers", pa.map_(pa.string(), pa.string())),
        ("x_robots_tag", pa.string()),
        ("hreflang", pa.list_(HREFLANG_STRUCT)),
        ("images", pa.list_(IMAGE_STRUCT)),
        ("internal_links", pa.int64()),
        ("external_links", pa.int64()),
        ("json_ld", pa.list_(pa.string())),
        ("schema_org", pa.list_(pa.string())),
        ("schema_types", pa.list_(pa.string())),
        ("ai_ready_schemas", pa.list_(AI_READY_STRUCT)),
        ("schema_has_organization", pa.bool_()),
        ("schema_has_website", pa.bool_()),
        ("schema_has_breadcrumbs", pa.bool_()),
        ("schema_faq_count", pa.int64()),
        ("is_soft_404", pa.bool_()),
        ("has_long_redirect_chain", pa.bool_()),
        ("redirect_chain", pa.list_(REDIRECT_HOP_STRUCT)),
        ("redirects", pa.list_(pa.string())),
        ("redirect_count", pa.int32()),
        ("has_redirect_loop", pa.bool_()),
        ("analytics_ga4_id", pa.string()),
        ("analytics_gtm_id", pa.string()),
        ("analytics_google", pa.bool_()),
        ("analytics_facebook_pixel", pa.bool_()),
        ("analytics_hotjar", pa.bool_()),
        ("analytics_mixpanel", pa.bool_()),
        ("requires_js", pa.bool_()),
        ("spans", SPANS_TYPE),
    ]
)

LINKS_SCHEMA = pa.schema(
    [
        ("source_url", pa.string()),
        ("target_url", pa.string()),
        ("anchor_text", pa.string()),
        ("is_internal", pa.bool_()),
        ("target_domain", pa.string()),
        ("target_status", pa.int32()),
        ("placement", pa.string()),
        ("nofollow", pa.bool_()),
        ("scope", pa.string()),
        ("pos", pa.int32()),
    ]
)

ISSUES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("type", pa.string()),
        ("category", pa.string()),
        ("issue", pa.string()),
        ("details", pa.string()),
    ]
)

LINEAGE_SCHEMA = pa.schema(
    [
        ("wave", pa.int32()),
        ("partition", pa.int32()),
        ("fetched", pa.int64()),
        ("candidates", pa.int64()),
        ("admitted", pa.int64()),
        ("deferred", pa.int64()),
        ("trap_rejected", pa.int64()),
        ("elapsed_s", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
