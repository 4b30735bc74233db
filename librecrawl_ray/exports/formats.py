"""Report exports S12–S16 (reference main.py:304-483).

Reproduces the reference's CSV / JSON / XML export shapes over the engine's
tables, including the exact nested-field summarization strings ("N tags",
"N images", first-3 h2s + "...", "Yes"/"No" booleans, "Not crawled"
statuses) so a consumer of the reference tool's exports can switch engines
without changing parsers.

The row-formatting is a map_batches projection (streaming); the final
serialization writes one file on the driver (exports are report-sized).
``export_date`` is injectable for deterministic tests.
"""

from __future__ import annotations

import csv
import io
import json
import time
import xml.etree.ElementTree as ET

import pyarrow as pa

DEFAULT_PAGE_FIELDS = [
    "url", "status_code", "title", "meta_description", "h1", "word_count",
    "depth", "internal_links", "external_links", "canonical_url",
    "response_time", "size", "og_tags", "twitter_tags", "json_ld",
    "images", "h2", "h3", "schema_types", "ai_ready_schemas",
    "is_soft_404", "has_long_redirect_chain", "requires_js",
]

LINKS_FIELDS = ["source_url", "target_url", "anchor_text", "is_internal",
                "target_domain", "target_status", "placement"]
ISSUES_FIELDS = ["url", "type", "category", "issue", "details"]


def _seq_len(value) -> int:
    """len() for list / numpy array / None (pandas rows surface Arrow list
    columns as numpy object arrays, whose truthiness raises)."""
    if value is None:
        return 0
    try:
        return len(value)
    except TypeError:
        return 0


def _fmt_page_value(field: str, value) -> str:
    """Reference CSV summarization rules (main.py:315-343)."""
    if value is None:
        return ""
    if field in ("og_tags", "twitter_tags"):
        n = _seq_len(value)
        return f"{n} tags" if n else ""
    if field == "json_ld":
        n = _seq_len(value)
        return f"{n} scripts" if n else ""
    if field == "images":
        n = _seq_len(value)
        return f"{n} images" if n else ""
    if field == "internal_links":
        return f"{int(value)} internal links" if value else "0 internal links"
    if field == "external_links":
        return f"{int(value)} external links" if value else "0 external links"
    if field == "schema_types":
        v = [str(x) for x in (value if value is not None else [])]
        return ", ".join(v)
    if field == "ai_ready_schemas":
        n = _seq_len(value)
        return f"{n} AI-ready" if n else ""
    if field in ("is_soft_404", "has_long_redirect_chain",
                 "requires_js"):
        return "Yes" if value else "No"
    if field in ("h2", "h3"):
        v = [str(x) for x in (value if value is not None else [])]
        return ", ".join(v[:3]) + ("..." if len(v) > 3 else "")
    if isinstance(value, (dict, list)):
        return str(value)
    return value if isinstance(value, str) else value


def pages_csv(rows: list[dict], fields: list[str] | None = None) -> str:
    fields = fields or DEFAULT_PAGE_FIELDS
    out = io.StringIO()
    w = csv.DictWriter(out, fieldnames=fields)
    w.writeheader()
    for r in rows:
        w.writerow({f: _fmt_page_value(f, r.get(f, "")) for f in fields})
    return out.getvalue()


def pages_json(rows: list[dict], fields: list[str] | None = None,
               export_date: str | None = None) -> str:
    fields = fields or DEFAULT_PAGE_FIELDS
    data = [{f: r.get(f, "") for f in fields} for r in rows]
    return json.dumps({
        "export_date": export_date or time.strftime("%Y-%m-%d %H:%M:%S"),
        "total_urls": len(data),
        "fields": fields,
        "data": data,
    }, indent=2, default=str)


def pages_xml(rows: list[dict], fields: list[str] | None = None,
              export_date: str | None = None) -> str:
    fields = fields or DEFAULT_PAGE_FIELDS
    root = ET.Element("librecrawl_export")
    root.set("export_date",
             export_date or time.strftime("%Y-%m-%d %H:%M:%S"))
    root.set("total_urls", str(len(rows)))
    urls_el = ET.SubElement(root, "urls")
    for r in rows:
        url_el = ET.SubElement(urls_el, "url")
        for f in fields:
            fe = ET.SubElement(url_el, f)
            fe.text = str(r.get(f, ""))
    return ET.tostring(root, encoding="unicode")


def links_csv(rows: list[dict]) -> str:
    out = io.StringIO()
    w = csv.DictWriter(out, fieldnames=LINKS_FIELDS)
    w.writeheader()
    for r in rows:
        ts = r.get("target_status")
        w.writerow({
            "source_url": r.get("source_url", ""),
            "target_url": r.get("target_url", ""),
            "anchor_text": r.get("anchor_text", ""),
            "is_internal": "Yes" if r.get("is_internal") else "No",
            "target_domain": r.get("target_domain", ""),
            "target_status": "Not crawled" if ts is None
                             or (isinstance(ts, float) and ts != ts)
                             else int(ts),
            "placement": r.get("placement", "body"),
        })
    return out.getvalue()


def links_json(rows: list[dict]) -> str:
    return json.dumps(rows, indent=2, default=str)


def issues_csv(rows: list[dict]) -> str:
    out = io.StringIO()
    w = csv.DictWriter(out, fieldnames=ISSUES_FIELDS)
    w.writeheader()
    for r in rows:
        w.writerow({f: r.get(f, "") for f in ISSUES_FIELDS})
    return out.getvalue()


def issues_json(rows: list[dict], export_date: str | None = None) -> str:
    by_url: dict[str, list] = {}
    for r in rows:
        by_url.setdefault(r.get("url", ""), []).append(
            {f: r.get(f, "") for f in ("type", "category", "issue",
                                       "details")})
    return json.dumps({
        "export_date": export_date or time.strftime("%Y-%m-%d %H:%M:%S"),
        "total_issues": len(rows),
        "total_urls_with_issues": len(by_url),
        "issues_by_url": by_url,
        "all_issues": rows,
    }, indent=2)


# ----------------------------------------------------- S17 visualization

def visualization_graph(pages_rows: list[dict], links_rows: list[dict],
                        max_nodes: int = 500) -> dict:
    """S17 (main.py:987-1081): first-N pages as nodes (status-coded),
    deduped internal edges between included nodes."""
    nodes, node_ids = [], {}
    for r in pages_rows[:max_nodes]:
        nid = len(nodes)
        node_ids[r["url"]] = nid
        status = r.get("status_code") or 0
        color = ("green" if 200 <= status < 300 else
                 "yellow" if 300 <= status < 400 else
                 "red" if status >= 400 else "gray")
        nodes.append({"id": nid, "url": r["url"], "status": status,
                      "color": color})
    edges, seen = [], set()
    for l in links_rows:
        if not l.get("is_internal"):
            continue
        s = node_ids.get(l["source_url"])
        t = node_ids.get(l["target_url"])
        if s is None or t is None or s == t:
            continue
        key = (s, t)
        if key in seen:
            continue
        seen.add(key)
        edges.append({"source": s, "target": t})
    return {"nodes": nodes, "edges": edges}


def export_pages_ds(pages_ds, fmt: str, fields: list[str] | None = None,
                    export_date: str | None = None,
                    sort_by: tuple = ("wave", "depth", "seq")) -> str:
    """Dataset → export string; rows ordered by crawl order so exports are
    deterministic (the reference's row order is thread-completion order)."""
    rows = pages_ds.to_pandas().sort_values(list(sort_by)).to_dict("records")
    if fmt == "csv":
        return pages_csv(rows, fields)
    if fmt == "json":
        return pages_json(rows, fields, export_date)
    if fmt == "xml":
        return pages_xml(rows, fields, export_date)
    raise ValueError(f"unknown format {fmt}")
